"""Smoke test for the multi-chip scaling harness (eval/scaling.py): every
sharded path executes on a multi-device mesh and matches its local twin."""

from rivslam_tpu.eval import scaling


def test_scaling_harness_runs_and_matches():
    out = scaling.run_scaling(
        [1, 2], frames=4, capacity=64, graph_k=64, repeats=1,
        gn_iters=3, imu_capacity=8,
    )
    assert out["device_counts"] == [1, 2]
    assert out["local"]["schur_blocks"] >= 2
    rows = out["scaling"]
    assert len(rows) == 2
    for row in rows:
        assert row["fleet"]["aggregate_fps"] > 0
        assert row["sharded_register"]["ms"] > 0
        # distributed solvers must reproduce the local optimum
        assert row["dist_pcg"]["chi2_matches_local"]
        assert row["dist_schur"]["chi2_matches_local"]
    # weak scaling: n sequences through an n-device fleet mesh all complete
    assert rows[1]["fleet"]["sequences"] == 2
