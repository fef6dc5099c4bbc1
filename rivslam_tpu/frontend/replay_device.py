"""Device-resident sequential odometry replay — a whole sequence in ONE jit.

The odometry is inherently serial (each frame registers against the rolling
keyframe), so the host-per-frame driver pays a dispatch round-trip per frame.
This module runs the entire front end (covariance prep + registration +
keyframe machinery) as a `lax.scan` over the stacked frame arrays: one
dispatch, zero host involvement, the true sequential-throughput number for
real-time-factor claims (SURVEY.md §7 'sequential pipeline with feedback').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rivslam_tpu.core.config import OdometryConfig, RegistrationConfig
from rivslam_tpu.frontend import apdgicp, odometry


def replay_odometry(
    xyz: jax.Array,  # [F, N, 3] stacked frames
    mask: jax.Array,  # [F, N]
    ego_vel: jax.Array,  # [F, 3]
    times: jax.Array,  # [F]
    odo_cfg: OdometryConfig,
    reg_cfg: RegistrationConfig,
):
    """Run frames 1..F-1 through the odometry; frame 0 initializes.

    Returns (poses [F,4,4], is_keyframe [F], converged [F]).
    """
    dtype = xyz.dtype
    first = apdgicp.prepare(xyz[0], mask[0], reg_cfg)
    state0 = odometry.init_state(first, times[0], dtype=dtype)

    def step(state, frame):
        x, m, v, t = frame
        prepared = apdgicp.prepare(x, m, reg_cfg)
        state, out = odometry.step(state, prepared, v, t, odo_cfg, reg_cfg)
        return state, (out.odom, out.is_keyframe, out.reg.converged)

    _, (poses, kf, conv) = jax.lax.scan(
        step, state0, (xyz[1:], mask[1:], ego_vel[1:], times[1:])
    )
    eye = jnp.eye(4, dtype=dtype)[None]
    return (
        jnp.concatenate([eye, poses]),
        jnp.concatenate([jnp.asarray([True]), kf]),
        jnp.concatenate([jnp.asarray([True]), conv]),
    )
