"""Rotational deskew of a radar scan using gyro rate.

Parity with reference preprocessing_nodelet.cpp:914-975: each point i gets a
small-angle correction q = (1, -dt_i/2 * omega) applied as q^-1 * p, with
dt_i = scan_period * i / N and omega the IMU angular velocity at scan start
(sign-flipped into the radar frame by the reference; we take omega already in
the radar frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.pointcloud import RadarCloud


def deskew(cloud: RadarCloud, ang_vel: jax.Array, scan_period: float = 0.1) -> RadarCloud:
    """Apply per-point small-rotation correction.

    ang_vel: [3] angular velocity (rad/s) in the sensor frame at scan start.
    The reference flips sign (ang_v *= -1) and rotates by delta_q.inverse();
    net effect: rotate point i by exp(-dt_i * (-omega)) = exp(+dt_i * omega)
    to first order. We implement exactly the reference's quaternion algebra
    with a normalized small-angle quaternion, vectorized over points.
    """
    n = cloud.capacity
    dt = scan_period * jnp.arange(n, dtype=cloud.xyz.dtype) / n
    w = -ang_vel  # reference: ang_v *= -1
    # delta_q = (1, dt/2 * w), then p' = delta_q^{-1} * p  == rotate by -dt*w
    # (to first order). Use exact Rodrigues on the equivalent axis-angle.
    rotvec = -dt[:, None] * w[None, :]
    R = lie.so3_exp(rotvec)  # [N, 3, 3]
    xyz = jnp.einsum("nij,nj->ni", R, cloud.xyz)
    return cloud.replace(xyz=jnp.where(cloud.mask[:, None], xyz, cloud.xyz))
