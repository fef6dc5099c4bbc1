import dataclasses

import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core import lie
from rivslam_tpu import tools
from rivslam_tpu.loop import global_graph


def drifted_loop_trajectory(n=32, seed=0):
    rng = np.random.default_rng(seed)
    gt = [np.eye(4)]
    for k in range(1, n):
        T = np.eye(4)
        T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 2 * np.pi / n])))
        T[0, 3] = 1.0
        gt.append(gt[-1] @ T)
    gt = np.stack(gt)
    est = [np.eye(4)]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        rel = rel @ np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.02)))
        est.append(est[-1] @ rel)
    return np.stack(est), gt


def test_adjust_trajectory_with_manual_loop():
    est, gt = drifted_loop_trajectory()
    n = len(est)
    true_rel = np.linalg.inv(gt[0]) @ gt[n - 1]
    adj = tools.adjust_trajectory(est, [(0, n - 1, true_rel)])
    err_before = np.linalg.norm(est[n - 1][:3, 3] - gt[n - 1][:3, 3])
    err_after = np.linalg.norm(adj[n - 1][:3, 3] - gt[n - 1][:3, 3])
    assert err_after < 0.5 * err_before


def test_align_gps_trajectory():
    rng = np.random.default_rng(3)
    n = 40
    stamps = np.arange(n) * 0.5
    world = rng.normal(size=(n, 3)) * 20
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.7])))
    t_true = np.array([1000.0, -2000.0, 5.0])
    # utm = R_true^T (world - t_true)  <=>  world = R_true utm + t_true
    utm = (world - t_true) @ R_true
    gps_stamps = stamps + rng.normal(size=n) * 0.01
    R, t, pairs = tools.align_gps_trajectory(stamps, world, gps_stamps, utm)
    assert len(pairs) > 30
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_gps_priors_in_pose_graph():
    """GPS position priors pull a drifted graph toward the GPS fixes."""
    est, gt = drifted_loop_trajectory(seed=4)
    n = len(est)
    dtype = jnp.float64
    g = global_graph.PoseGraph.create(64, 8, dtype=dtype)
    rels = [np.eye(4)] + [np.linalg.inv(est[i - 1]) @ est[i] for i in range(1, n)]
    rels = np.stack(rels)
    g = dataclasses.replace(
        g,
        R=g.R.at[:n].set(jnp.asarray(est[:, :3, :3])),
        p=g.p.at[:n].set(jnp.asarray(est[:, :3, 3])),
        node_mask=g.node_mask.at[:n].set(True),
        odom_rel_R=g.odom_rel_R.at[:n].set(jnp.asarray(rels[:, :3, :3])),
        odom_rel_p=g.odom_rel_p.at[:n].set(jnp.asarray(rels[:, :3, 3])),
        odom_info=g.odom_info.at[:n].set(jnp.eye(6, dtype=dtype) * 100.0),
        # GPS fixes at every 4th node, true positions
        gps_xyz=g.gps_xyz.at[:n].set(jnp.asarray(gt[:, :3, 3])),
        gps_info=g.gps_info.at[:n].set(50.0),
        gps_mask=g.gps_mask.at[:n].set(jnp.asarray(np.arange(n) % 4 == 0)),
    )
    g_opt, chi2 = global_graph.solve_pose_graph(g)
    p_opt = np.asarray(g_opt.p[:n])
    err_before = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    err_after = np.linalg.norm(p_opt - gt[:, :3, 3], axis=1).mean()
    assert err_after < 0.5 * err_before, (err_before, err_after)
