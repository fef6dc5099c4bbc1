"""Offline trajectory tools — gt_adjust / gps_traj_align parity.

- `adjust_trajectory`: build an SE3 chain pose graph from a trajectory, add
  manual loop edges, optimize, return the adjusted trajectory
  (reference src/gt_adjust.cpp:54-99).
- `align_gps_trajectory`: associate trajectory<->GPS by stamp and estimate
  the UTM->world transform (reference src/gps_traj_align.cpp:226-250, which
  optimizes a single SE3 node over EdgeSE3GtUTM edges — equivalent to the
  closed-form least-squares alignment used here).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from rivslam_tpu.eval.ate import umeyama_alignment
from rivslam_tpu.loop import global_graph


def adjust_trajectory(
    poses: np.ndarray,  # [F,4,4]
    loop_edges: list[tuple[int, int, np.ndarray]],  # (i, j, T_i^-1 T_j meas)
    odom_info: float = 100.0,
    loop_info: float = 400.0,
    dtype=jnp.float64,
) -> np.ndarray:
    """Chain graph + manual loop edges -> optimized trajectory."""
    n = len(poses)
    K = 1 << max(3, (n - 1).bit_length())
    L = max(8, len(loop_edges))
    g = global_graph.PoseGraph.create(K, L, dtype=dtype)
    rels = [np.eye(4)] + [np.linalg.inv(poses[i - 1]) @ poses[i] for i in range(1, n)]
    rels = np.stack(rels)
    g = dataclasses.replace(
        g,
        R=g.R.at[:n].set(jnp.asarray(poses[:, :3, :3])),
        p=g.p.at[:n].set(jnp.asarray(poses[:, :3, 3])),
        node_mask=g.node_mask.at[:n].set(True),
        odom_rel_R=g.odom_rel_R.at[:n].set(jnp.asarray(rels[:, :3, :3])),
        odom_rel_p=g.odom_rel_p.at[:n].set(jnp.asarray(rels[:, :3, 3])),
        odom_info=g.odom_info.at[:n].set(jnp.eye(6, dtype=dtype) * odom_info),
    )
    for k, (i, j, T) in enumerate(loop_edges):
        g = dataclasses.replace(
            g,
            loop_i=g.loop_i.at[k].set(i),
            loop_j=g.loop_j.at[k].set(j),
            loop_rel_R=g.loop_rel_R.at[k].set(jnp.asarray(T[:3, :3])),
            loop_rel_p=g.loop_rel_p.at[k].set(jnp.asarray(T[:3, 3])),
            loop_info=g.loop_info.at[k].set(jnp.eye(6, dtype=dtype) * loop_info),
            loop_mask=g.loop_mask.at[k].set(True),
        )
    g_opt, _ = global_graph.solve_pose_graph(g)
    out = np.tile(np.eye(4), (n, 1, 1))
    out[:, :3, :3] = np.asarray(g_opt.R[:n])
    out[:, :3, 3] = np.asarray(g_opt.p[:n])
    return out


def associate_by_stamp(
    stamps_a: np.ndarray, stamps_b: np.ndarray, max_dt: float = 0.05
) -> list[tuple[int, int]]:
    """Nearest-stamp association (gps_traj_align.cpp `associate`)."""
    pairs = []
    j = 0
    for i, t in enumerate(stamps_a):
        while j + 1 < len(stamps_b) and abs(stamps_b[j + 1] - t) <= abs(stamps_b[j] - t):
            j += 1
        if abs(stamps_b[j] - t) <= max_dt:
            pairs.append((i, j))
    return pairs


def align_gps_trajectory(
    traj_stamps: np.ndarray,
    traj_pos: np.ndarray,  # [F,3] world positions
    gps_stamps: np.ndarray,
    gps_utm: np.ndarray,  # [G,3] UTM positions
    max_dt: float = 0.05,
) -> tuple[np.ndarray, np.ndarray, list[tuple[int, int]]]:
    """Estimate world_T_utm = (R, t) minimizing ||world - (R utm + t)||."""
    pairs = associate_by_stamp(traj_stamps, gps_stamps, max_dt)
    if len(pairs) < 3:
        raise ValueError(f"only {len(pairs)} stamp associations")
    a = np.stack([gps_utm[j] for _, j in pairs])
    b = np.stack([traj_pos[i] for i, _ in pairs])
    s, R, t = umeyama_alignment(a, b, with_scale=False)
    return R, t, pairs
