"""Barometer altitude prior (VERDICT r2 item #6): EdgeSE3PriorZ parity —
z-only translation priors anchor global-graph altitude drift while leaving
x/y untouched, wired from `process_frame(altitude=...)` behind
LoopConfig.baro_z_prior. Reference: include/g2o/edge_se3_priorz.hpp:1-76.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rivslam_tpu import pipeline
from rivslam_tpu.core.config import EngineConfig, LoopConfig
from rivslam_tpu.factors import residuals
from rivslam_tpu.loop import global_graph


def test_prior_z_residual():
    p = jnp.asarray([1.0, -2.0, 3.5])
    r = residuals.prior_z(p, jnp.asarray(3.0))
    np.testing.assert_allclose(np.asarray(r), [0.5])


def test_z_only_prior_corrects_altitude_drift_leaves_xy_free():
    """A straight odometry chain with linear z drift + z-only priors at the
    true altitude: the solve must flatten z to the prior while x stays at
    the (drifted) odometry solution — zero x/y information means the prior
    cannot drag the horizontal estimate."""
    K, L = 16, 4
    g = global_graph.PoseGraph.create(K, L, dtype=jnp.float64)
    # odometry measurements: 1 m steps in +x, spurious +0.05 m z per step
    rel_p = np.zeros((K, 3))
    rel_p[1:, 0] = 1.0
    rel_p[1:, 2] = 0.05
    est_p = np.cumsum(rel_p, axis=0)
    g = dataclasses.replace(
        g,
        p=jnp.asarray(est_p),
        node_mask=jnp.ones(K, bool),
        odom_rel_p=jnp.asarray(rel_p),
        # z-only priors at true altitude 0 on every 4th node
        gps_xyz=jnp.zeros((K, 3), jnp.float64),
        gps_info=jnp.asarray(
            np.tile([0.0, 0.0, 400.0], (K, 1)), jnp.float64
        ),
        gps_mask=jnp.asarray(np.arange(K) % 4 == 0),
    )
    g2, chi2 = global_graph.solve_pose_graph(g, gn_iters=10)
    p2 = np.asarray(g2.p)
    # z pulled flat (priors at 0 every 4 nodes, odometry z-steps absorbed)
    assert np.abs(p2[::4, 2]).max() < 0.02, p2[:, 2]
    # x essentially untouched (zero x/y prior information): the solver may
    # tilt poses slightly to reconcile the z conflict with the odometry
    # edges (a real DOF of the graph), but the horizontal chain must stay
    # within ~2 mm/step of raw odometry — not dragged toward the prior's
    # x=0
    np.testing.assert_allclose(p2[:, 0], est_p[:, 0], atol=0.05)
    assert p2[-1, 0] > 14.5  # 15 m chain not collapsed toward prior x=0


def test_engine_wires_baro_prior_and_checkpoints_origin(tmp_path):
    """process_frame(altitude=...) must install z-only prior rows relative
    to the first reading, skip keyframes without a reading, and round-trip
    baro_zero through the checkpoint."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_datasets import make_sequence

    from rivslam_tpu.core.pointcloud import RadarCloud
    from rivslam_tpu.io import checkpoint

    seq, _ = make_sequence()
    cfg = dataclasses.replace(
        EngineConfig(), loop=LoopConfig(baro_z_prior=True, baro_z_stddev=0.5)
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float32)
    alts = [100.0, 100.2, None, 99.9, 100.1]
    prev_t = None
    for i in range(seq.num_frames):
        f = seq.frame(i)
        cloud = RadarCloud.from_numpy(
            f["xyz"], 256, doppler=f["doppler"], intensity=f["intensity"],
            dtype=eng.dtype,
        )
        t0 = prev_t if prev_t is not None else f["stamp"] - 0.1
        dts, acc, gyr, m = seq.imu_between(t0, f["stamp"], 16)
        eng.process_frame(
            cloud, f["stamp"], dts, acc, gyr, m, altitude=alts[i % len(alts)]
        )
        prev_t = f["stamp"]
    st = eng.state
    assert st.baro_zero == 100.0
    mask = np.asarray(st.graph.gps_mask)[: st.kf_count]
    info = np.asarray(st.graph.gps_info)[: st.kf_count]
    xyz = np.asarray(st.graph.gps_xyz)[: st.kf_count]
    alt_known = ~np.isnan(np.asarray(st.kf_alt))
    np.testing.assert_array_equal(mask, alt_known)
    assert mask.any()
    # z-only: zero x/y information, z info = 1/0.5^2
    np.testing.assert_allclose(info[mask][:, :2], 0.0)
    np.testing.assert_allclose(info[mask][:, 2], 4.0)
    # measurement = altitude - first reading
    np.testing.assert_allclose(
        xyz[mask][:, 2], np.asarray(st.kf_alt)[alt_known] - 100.0, atol=1e-6
    )
    ckpt = tmp_path / "ckpt"
    checkpoint.dump(eng, str(ckpt))
    eng2 = pipeline.Engine(cfg, dtype=jnp.float32)
    checkpoint.load(eng2, str(ckpt))
    assert eng2.state.baro_zero == 100.0
