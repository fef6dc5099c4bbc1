"""Graph compaction at keyframe capacity (global_graph.compact + engine hook)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import (
    BackendConfig,
    EngineConfig,
    LoopConfig,
    OdometryConfig,
    PreprocessConfig,
    RegistrationConfig,
)
from rivslam_tpu.io import synthetic
from rivslam_tpu.loop import global_graph, scancontext


def _chain_graph(rng, n=10, K=16, L=4):
    g = global_graph.PoseGraph.create(K, L, dtype=jnp.float64)
    rels = []
    T = np.eye(4)
    poses = [T.copy()]
    for i in range(1, n):
        d = np.eye(4)
        d[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray(0.05 * rng.standard_normal(3))))
        d[:3, 3] = [1.0, 0.1 * rng.standard_normal(), 0.0]
        rels.append(d)
        T = T @ d
        poses.append(T.copy())
    g = dataclasses.replace(
        g,
        node_mask=g.node_mask.at[:n].set(True),
        R=g.R.at[:n].set(jnp.asarray(np.stack([P[:3, :3] for P in poses]))),
        p=g.p.at[:n].set(jnp.asarray(np.stack([P[:3, 3] for P in poses]))),
        odom_rel_R=g.odom_rel_R.at[1:n].set(jnp.asarray(np.stack([d[:3, :3] for d in rels]))),
        odom_rel_p=g.odom_rel_p.at[1:n].set(jnp.asarray(np.stack([d[:3, 3] for d in rels]))),
        loop_i=g.loop_i.at[0].set(2),
        loop_j=g.loop_j.at[0].set(7),
        loop_rel_R=g.loop_rel_R.at[0].set(
            jnp.asarray((np.linalg.inv(poses[2]) @ poses[7])[:3, :3])
        ),
        loop_rel_p=g.loop_rel_p.at[0].set(
            jnp.asarray((np.linalg.inv(poses[2]) @ poses[7])[:3, 3])
        ),
        loop_mask=g.loop_mask.at[0].set(True),
    )
    return g, rels, poses


def test_compact_composes_odometry(rng):
    n = 10
    g, rels, poses = _chain_graph(rng, n=n)
    keep = [0, 2, 4, 6, 7, 9]
    g2, old2new = global_graph.compact(g, keep, n)
    assert int(jnp.sum(g2.node_mask)) == len(keep)
    # node estimates carried over
    np.testing.assert_allclose(np.asarray(g2.p[: len(keep)]),
                               np.stack([poses[i][:3, 3] for i in keep]))
    # composed odometry measurement for each kept edge equals the product of
    # the original per-step measurements over the segment
    for m in range(1, len(keep)):
        a, b = keep[m - 1], keep[m]
        T = np.eye(4)
        for t in range(a, b):
            T = T @ rels[t]
        np.testing.assert_allclose(np.asarray(g2.odom_rel_R[m]), T[:3, :3], atol=1e-12)
        np.testing.assert_allclose(np.asarray(g2.odom_rel_p[m]), T[:3, 3], atol=1e-12)
    # loop endpoints remapped (2 -> 1, 7 -> 4 in keep order)
    assert int(g2.loop_i[0]) == keep.index(2)
    assert int(g2.loop_j[0]) == keep.index(7)
    assert old2new[7] == keep.index(7)


def test_compact_graph_still_solves(rng):
    n = 10
    g, rels, poses = _chain_graph(rng, n=n)
    keep = [0, 2, 4, 6, 7, 9]
    g2, _ = global_graph.compact(g, keep, n)
    g_opt, chi2 = global_graph.solve_pose_graph(g2, gn_iters=4, cg_iters=32)
    assert np.isfinite(float(chi2))
    # consistent chain: estimates already satisfy composed measurements, so
    # the solve should not move nodes materially
    np.testing.assert_allclose(
        np.asarray(g_opt.p[: len(keep)]),
        np.stack([poses[i][:3, 3] for i in keep]),
        atol=1e-2,
    )


def test_scancontext_compact(rng):
    cfg = LoopConfig(keyframe_capacity=16)
    db = scancontext.ScanContextDB.create(cfg, dtype=jnp.float64)
    descs = []
    for i in range(8):
        d = jnp.asarray(rng.random((cfg.num_ring, cfg.num_sector)))
        descs.append(d)
        db, _ = scancontext.insert(db, d)
    keep = [0, 3, 5, 7]
    db2 = scancontext.compact(db, keep)
    assert int(db2.count) == 4
    for m, i in enumerate(keep):
        np.testing.assert_allclose(np.asarray(db2.desc[m]), np.asarray(descs[i]))


def test_engine_compacts_at_capacity(rng):
    cap = 10
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False,
            outlier_removal_method="NONE",
            enable_deskew=False,
        ),
        odometry=OdometryConfig(keyframe_delta_trans=0.4, keyframe_min_size=10),
        registration=RegistrationConfig(method="FAST_GICP", max_iterations=8),
        backend=BackendConfig(max_solver_iterations=4),
        loop=LoopConfig(keyframe_capacity=cap, enable=False),
    )
    from rivslam_tpu import pipeline

    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    world = synthetic.make_world(rng, n_points=8000)
    IMU_CAP = 64
    zeros = (
        np.zeros(IMU_CAP),
        np.zeros((IMU_CAP, 3)),
        np.zeros((IMU_CAP, 3)),
        np.zeros(IMU_CAP, bool),
    )
    n_frames = 28
    for i in range(n_frames):
        T = np.eye(4)
        T[:3, 3] = [0.5 * i, 0.0, 2.0]
        cl = synthetic.observe(world, T, rng, capacity=256, noise=0.005, dtype=jnp.float64)
        eng.process_frame(cl, 0.25 * i, *zeros)
    st = eng.state
    # compaction kept the engine at/under capacity and still inserting
    assert st.kf_count <= cap
    # insertion continued past the point the graph first filled: the newest
    # keyframe is from the end of the run, not frame ~cap
    assert st.kf_stamps[-1] > 0.25 * (n_frames - 3)
    assert len(st.kf_clouds) == st.kf_count
    assert len(st.kf_stamps) == st.kf_count
    assert int(np.asarray(jnp.sum(st.graph.node_mask))) == st.kf_count
    # kept-node estimates still track the ground-truth straight line loosely
    kf = eng.optimized_keyframe_poses()
    assert np.all(np.isfinite(kf))
