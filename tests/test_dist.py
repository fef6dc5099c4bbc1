"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.dist import dist_gn, mesh as mesh_mod
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.io import synthetic

CFG = RegistrationConfig(transformation_epsilon=5e-4)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=6000)
    from rivslam_tpu.core import lie

    T0 = np.eye(4)
    T0[:3, 3] = [0, 0, 2.0]
    xi = np.array([0.0, 0.0, 0.04, 0.3, -0.2, 0.02])
    T_rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    tgt = synthetic.observe(world, T0, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    src = synthetic.observe(world, T0 @ T_rel, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    s = apdgicp.estimate_covariances(src.xyz, src.mask, CFG)
    t = apdgicp.estimate_covariances(tgt.xyz, tgt.mask, CFG)
    return s, t, T_rel


def test_mesh_construction():
    m = mesh_mod.make_mesh(4, 2)
    assert m.shape == {"data": 4, "model": 2}


def test_sharded_register_matches_local(scene):
    src, tgt, T_rel = scene
    m = mesh_mod.make_mesh(1, 8)
    local = apdgicp.register(src, tgt, jnp.eye(4, dtype=jnp.float64), CFG)
    dist = dist_gn.sharded_register(src, tgt, jnp.eye(4, dtype=jnp.float64), CFG, m)
    np.testing.assert_allclose(np.asarray(dist.T), np.asarray(local.T), atol=1e-9)
    assert int(dist.num_correspondences) == int(local.num_correspondences)


def test_batched_register_data_parallel(scene):
    src, tgt, T_rel = scene
    m = mesh_mod.make_mesh(4, 2)
    B = 8
    stack = lambda t: jax.tree.map(lambda x: jnp.stack([x] * B), t)
    res = dist_gn.batched_register(
        stack(src), stack(tgt), jnp.stack([jnp.eye(4, dtype=jnp.float64)] * B), CFG, m
    )
    local = apdgicp.register(src, tgt, jnp.eye(4, dtype=jnp.float64), CFG)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(res.T[i]), np.asarray(local.T), atol=1e-9)


def test_sharded_pose_graph_matches_local():
    """Distributed (edge-sharded, psum-reduced) pose-graph GN matches the
    single-chip solver on a drifted loop problem."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_loop import test_global_graph_loop_closure_pulls_drift  # noqa
    from rivslam_tpu.core import lie
    from rivslam_tpu.loop import global_graph
    from rivslam_tpu.dist import dist_graph

    dtype = jnp.float64
    K, L = 64, 8
    g = global_graph.PoseGraph.create(K, L, dtype=dtype)
    n = 40
    rng = np.random.default_rng(0)
    gt = [np.eye(4)]
    for k in range(1, n):
        T = np.eye(4)
        T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 2 * np.pi / n])))
        T[0, 3] = 1.0
        gt.append(gt[-1] @ T)
    gt = np.stack(gt)
    est = [np.eye(4)]
    rels = [np.eye(4)]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        rel = rel @ np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.01)))
        rels.append(rel)
        est.append(est[-1] @ rel)
    est = np.stack(est)
    g = dataclasses.replace(
        g,
        R=g.R.at[:n].set(jnp.asarray(est[:, :3, :3])),
        p=g.p.at[:n].set(jnp.asarray(est[:, :3, 3])),
        node_mask=g.node_mask.at[:n].set(True),
        odom_rel_R=g.odom_rel_R.at[:n].set(jnp.asarray(np.stack(rels)[:, :3, :3])),
        odom_rel_p=g.odom_rel_p.at[:n].set(jnp.asarray(np.stack(rels)[:, :3, 3])),
        odom_info=g.odom_info.at[:n].set(jnp.eye(6, dtype=dtype) * 100.0),
    )
    true_rel = np.linalg.inv(gt[0]) @ gt[n - 1]
    g = dataclasses.replace(
        g,
        loop_i=g.loop_i.at[0].set(0),
        loop_j=g.loop_j.at[0].set(n - 1),
        loop_rel_R=g.loop_rel_R.at[0].set(jnp.asarray(true_rel[:3, :3])),
        loop_rel_p=g.loop_rel_p.at[0].set(jnp.asarray(true_rel[:3, 3])),
        loop_info=g.loop_info.at[0].set(jnp.eye(6, dtype=dtype) * 400.0),
        loop_mask=g.loop_mask.at[0].set(True),
    )
    g_local, chi2_local = global_graph.solve_pose_graph(g, gn_iters=6)
    m = mesh_mod.make_mesh(1, 8)
    g_dist, chi2_dist = dist_graph.solve_pose_graph_sharded(g, m, gn_iters=6)
    np.testing.assert_allclose(
        np.asarray(g_dist.p[:40]), np.asarray(g_local.p[:40]), atol=1e-6
    )
    np.testing.assert_allclose(float(chi2_dist), float(chi2_local), rtol=1e-6)


def test_batched_replay_odometry_sharded():
    """S sequences sharded over the data axis replay identically to the
    single-sequence device replay."""
    from rivslam_tpu.core.config import OdometryConfig
    from rivslam_tpu.frontend import replay_device
    from rivslam_tpu.io import synthetic

    reg = RegistrationConfig(method="FAST_GICP", transformation_epsilon=5e-4)
    odo = OdometryConfig(use_ego_vel=True)
    rng = np.random.default_rng(2)
    world = synthetic.make_world(rng, n_points=6000)
    n = 5
    times, poses, vels = synthetic.circular_trajectory(n, radius=10.0, dt=0.25, omega=0.3)
    clouds = [
        synthetic.observe(world, poses[i], rng, capacity=256, noise=0.01,
                          sensor_vel_world=vels[i], dtype=jnp.float64)
        for i in range(n)
    ]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    ego = jnp.stack([jnp.asarray(poses[i][:3, :3].T @ vels[i]) for i in range(n)])
    ts = jnp.asarray(times)

    single, _, _ = jax.jit(
        lambda a, b, c, d: replay_device.replay_odometry(a, b, c, d, odo, reg)
    )(xyz, mask, ego, ts)

    S = 4
    m = mesh_mod.make_mesh(4, 2)
    stack = lambda x: jnp.stack([x] * S)
    batched, kf, conv = dist_gn.batched_replay_odometry(
        stack(xyz), stack(mask), stack(ego), stack(ts), odo, reg, m
    )
    for s in range(S):
        np.testing.assert_allclose(np.asarray(batched[s]), np.asarray(single), atol=1e-9)


def test_sharded_pcg_program_cache_not_stale():
    """dist_graph memoizes one jitted program per (mesh, capacity) signature;
    two different graphs through the same cached program must each match
    their local solve (guards against the graph leaking in as a constant)."""
    from rivslam_tpu.dist import dist_graph
    from rivslam_tpu.loop import global_graph
    import sys
    sys.path.insert(0, "tests")
    from test_block_schur import drifted_graph

    m = mesh_mod.make_mesh(1, 8)
    for seed in (0, 3):
        g, *_ = drifted_graph(seed=seed)
        g_l, chi2_l = global_graph.solve_pose_graph(g, gn_iters=6)
        g_d, chi2_d = dist_graph.solve_pose_graph_sharded(g, m, gn_iters=6)
        np.testing.assert_allclose(
            np.asarray(g_d.p), np.asarray(g_l.p), atol=1e-6
        )
        np.testing.assert_allclose(float(chi2_d), float(chi2_l), rtol=1e-6)
