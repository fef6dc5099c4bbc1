"""TUM-format trajectory export/import.

Format parity with the reference's `/command "output_aftmapped"` export
(radar_graph_slam_nodelet.cpp:1272-1293): one line per pose,
`timestamp tx ty tz qx qy qz qw`, consumable by rpg_trajectory_evaluation.
"""

from __future__ import annotations

import numpy as np

from rivslam_tpu.core import lie
import jax.numpy as jnp


def save_tum(path: str, times: np.ndarray, poses: np.ndarray) -> None:
    """times [F], poses [F,4,4] -> TUM text file."""
    q = np.asarray(lie.rot_to_quat(jnp.asarray(poses[:, :3, :3])))  # [F,4] wxyz
    t = poses[:, :3, 3]
    with open(path, "w") as f:
        for i in range(len(times)):
            f.write(
                f"{times[i]:.9f} {t[i,0]:.9f} {t[i,1]:.9f} {t[i,2]:.9f} "
                f"{q[i,1]:.9f} {q[i,2]:.9f} {q[i,3]:.9f} {q[i,0]:.9f}\n"
            )


def load_tum(path: str) -> tuple[np.ndarray, np.ndarray]:
    """TUM text file -> (times [F], poses [F,4,4])."""
    data = np.loadtxt(path).reshape(-1, 8)
    times = data[:, 0]
    t = data[:, 1:4]
    qxyzw = data[:, 4:8]
    q_wxyz = np.concatenate([qxyzw[:, 3:4], qxyzw[:, :3]], axis=1)
    R = np.asarray(lie.quat_to_rot(jnp.asarray(q_wxyz)))
    poses = np.tile(np.eye(4), (len(times), 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = t
    return times, poses
