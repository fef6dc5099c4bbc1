"""Smoke test for the multi-chip scaling harness (eval/scaling.py): every
sharded path executes on a multi-device mesh and matches its local twin.

The harness runs in a SUBPROCESS (scaling_probe.py) retried on signal
exits: XLA:CPU intermittently segfaults compiling/serializing these large
multi-device programs (observed inside backend_compile_and_load and
compilation_cache.put_executable_and_time), and in-process that flake
crashes the xdist worker and hangs the whole suite. A clean retry always
succeeds; a real harness failure (assertion, exception) exits non-zero
WITHOUT a signal and is reported immediately.
"""

import json
import os
import subprocess
import sys

_PROBE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "scaling_probe.py")


def _run_probe(retries: int = 2, **kwargs) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(_PROBE))]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    last = None
    for _ in range(retries + 1):
        p = subprocess.run(
            [sys.executable, _PROBE, json.dumps(kwargs)],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        if p.returncode == 0:
            return json.loads(p.stdout.strip().splitlines()[-1])
        last = p
        if p.returncode >= 0:  # real failure, not a signal — don't retry
            break
    raise AssertionError(
        f"scaling probe failed rc={last.returncode}\nstdout:\n{last.stdout[-2000:]}"
        f"\nstderr:\n{last.stderr[-4000:]}"
    )


def test_scaling_harness_runs_and_matches():
    # pin_fleet=False: the per-core subprocess probes are the REAL
    # harness's protocol (SCALING_r*.json); the test validates harness
    # logic to keep CI off the ~30 s/probe jax-import cost
    out = _run_probe(
        device_counts=[1, 2], pin_fleet=False, frames=4, capacity=64,
        graph_k=64, repeats=1, gn_iters=3, imu_capacity=8,
    )
    assert out["device_counts"] == [1, 2]
    assert out["local"]["schur_blocks"] >= 2
    rows = out["scaling"]
    assert len(rows) == 2
    for row in rows:
        assert row["fleet"]["aggregate_fps"] > 0
        assert row["sharded_register"]["ms"] > 0
        # distributed solvers must reproduce the local optimum; a mismatch
        # is surfaced both here and by run_scaling's loud WARNING + the
        # chi2_mismatches list (nonzero exit from main)
        assert row["dist_pcg"]["chi2_matches_local"]
        assert "skipped" not in row["dist_schur"], row["dist_schur"]
        assert row["dist_schur"]["chi2_matches_local"]
    assert out["chi2_mismatches"] == []
    # weak scaling: n sequences through an n-device fleet mesh all complete
    assert rows[1]["fleet"]["sequences"] == 2


def test_schur_blocks_fallback_for_non_dividing_counts():
    """ADVICE r2: device counts that don't divide the default submap count
    must still pick a valid partition (largest divisor of graph_k that is a
    multiple of n), not silently skip or crash."""
    out = _run_probe(
        device_counts=[3], pin_fleet=False, frames=4, capacity=60,
        graph_k=60, repeats=1, gn_iters=2, imu_capacity=8,
    )
    row = out["scaling"][0]
    ds = row["dist_schur"]
    assert "skipped" not in ds, ds
    assert ds["blocks"] % 3 == 0 and 60 % ds["blocks"] == 0
