"""Synthetic radar world generator for tests and benchmarks.

Replaces the role of the reference's bundled PCD pair + rosbag replay for
kernel-level validation (SURVEY.md §4): a structured scene (planes + scatter)
observed from known poses gives ground-truth relative transforms, dopplers
and floor planes, so registration/REVE/e2e accuracy is checkable to
tolerance without dataset downloads.
"""

from __future__ import annotations

import numpy as np

from rivslam_tpu.core import lie
import jax.numpy as jnp

from rivslam_tpu.core.pointcloud import RadarCloud


def make_world(rng: np.random.Generator, n_points: int = 4000, extent: float = 40.0):
    """A structured world: ground plane, a few walls, and volumetric scatter."""
    n_ground = n_points // 3
    n_wall = n_points // 3
    n_scatter = n_points - n_ground - n_wall
    ground = np.stack(
        [
            rng.uniform(-extent, extent, n_ground),
            rng.uniform(-extent, extent, n_ground),
            np.zeros(n_ground),
        ],
        axis=1,
    )
    walls = []
    for _ in range(4):
        c = rng.uniform(-extent, extent, 2)
        yaw = rng.uniform(0, np.pi)
        length = rng.uniform(8, 25)
        u = rng.uniform(-length / 2, length / 2, n_wall // 4)
        z = rng.uniform(0, 4.0, n_wall // 4)
        x = c[0] + np.cos(yaw) * u
        y = c[1] + np.sin(yaw) * u
        walls.append(np.stack([x, y, z], axis=1))
    walls = np.concatenate(walls)
    scatter = np.stack(
        [
            rng.uniform(-extent, extent, n_scatter),
            rng.uniform(-extent, extent, n_scatter),
            rng.uniform(0, 5.0, n_scatter),
        ],
        axis=1,
    )
    return np.concatenate([ground, walls, scatter])


def observe(
    world: np.ndarray,
    T_world_sensor: np.ndarray,
    rng: np.random.Generator,
    max_range: float = 60.0,
    capacity: int = 1024,
    noise: float = 0.02,
    sensor_vel_world: np.ndarray | None = None,
    doppler_noise: float = 0.02,
    fov_deg: float | None = None,
    dtype=jnp.float32,
) -> RadarCloud:
    """Observe the world from a sensor pose: range-gate, optional forward
    field-of-view (radar-like, e.g. Oculii Eagle ~ +-60 deg), add noise,
    compute doppler from the sensor velocity (static world)."""
    R = T_world_sensor[:3, :3]
    t = T_world_sensor[:3, 3]
    local = (world - t) @ R  # R^T (p - t)
    r = np.linalg.norm(local, axis=1)
    vis = (r > 1.0) & (r < max_range)
    if fov_deg is not None:
        az = np.arctan2(local[:, 1], local[:, 0])
        vis &= np.abs(az) < np.radians(fov_deg)
    idx = np.where(vis)[0]
    if len(idx) > capacity:
        # radar detects the strongest reflectors consistently: keep the
        # top-capacity by (deterministic) world intensity + detection noise,
        # so repeated observations of a place see mostly the same targets
        w = world[idx]
        strength = 10.0 + 20.0 * (
            0.5 + 0.5 * np.sin(w[:, 0] * 12.9898 + w[:, 1] * 78.233 + w[:, 2] * 37.719)
        )
        strength = strength + rng.normal(size=len(idx)) * 1.0
        idx = idx[np.argsort(-strength)[:capacity]]
    pts = local[idx] + rng.normal(size=(len(idx), 3)) * noise
    if sensor_vel_world is not None:
        v_sensor = R.T @ sensor_vel_world
        dirs = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        dop = dirs @ v_sensor + rng.normal(size=len(idx)) * doppler_noise
    else:
        dop = np.zeros(len(idx))
    # intensity is a deterministic property of the WORLD point (like real
    # radar RCS), so scan-context descriptors of the same place correlate
    w = world[idx]
    intensity = 10.0 + 20.0 * (
        0.5 + 0.5 * np.sin(w[:, 0] * 12.9898 + w[:, 1] * 78.233 + w[:, 2] * 37.719)
    )
    intensity += rng.normal(size=len(idx)) * 0.5
    return RadarCloud.from_numpy(pts, capacity, doppler=dop, intensity=intensity, dtype=dtype)


def circular_imu_samples(
    t0: float,
    t1: float,
    rate: float = 200.0,
    radius: float = 15.0,
    omega: float = 0.2,
    gravity: float = 9.80511,
    rng: np.random.Generator | None = None,
    gyro_noise: float = 0.0,
    acc_noise: float = 0.0,
):
    """Analytic IMU samples along the circular trajectory between two frame
    times. Returns (dts [K], acc [K,3] specific force, gyr [K,3])."""
    n = max(int(round((t1 - t0) * rate)), 1)
    ts = t0 + (np.arange(n) + 1) / rate
    dts = np.full(n, 1.0 / rate)
    G = np.array([0.0, 0.0, gravity])
    accs = np.zeros((n, 3))
    gyrs = np.tile(np.array([0.0, 0.0, omega]), (n, 1))
    for i, tt in enumerate(ts):
        a = omega * tt
        a_w = np.array(
            [-radius * omega**2 * np.cos(a), -radius * omega**2 * np.sin(a), 0.0]
        )
        yaw = a + np.pi / 2
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, yaw], dtype=jnp.float64)))
        accs[i] = R.T @ (a_w + G)
    if rng is not None:
        accs += rng.normal(size=accs.shape) * acc_noise
        gyrs += rng.normal(size=gyrs.shape) * gyro_noise
    return dts, accs, gyrs


def circular_trajectory(
    n_frames: int,
    radius: float = 15.0,
    height: float = 2.0,
    dt: float = 0.1,
    omega: float = 0.2,
):
    """Known trajectory: constant-speed circle with heading tangent to it.

    Returns (times [F], poses [F,4,4] world_T_sensor, velocities [F,3] world).
    """
    times = np.arange(n_frames) * dt
    poses = np.zeros((n_frames, 4, 4))
    vels = np.zeros((n_frames, 3))
    for i, tt in enumerate(times):
        a = omega * tt
        p = np.array([radius * np.cos(a), radius * np.sin(a), height])
        yaw = a + np.pi / 2
        R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, yaw], dtype=jnp.float64)))
        poses[i, :3, :3] = R
        poses[i, :3, 3] = p
        poses[i, 3, 3] = 1.0
        vels[i] = np.array([-radius * omega * np.sin(a), radius * omega * np.cos(a), 0.0])
    return times, poses, vels
