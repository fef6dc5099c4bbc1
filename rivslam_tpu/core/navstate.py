"""Navigation state pytree: {t, R, p, v, bg, ba}.

Capability parity with the reference's 15-dim NavState
(radar_graph_slam/include/radar_graph_slam/nav_state.hpp:20-47), re-expressed
as a registered JAX dataclass so whole windows of states stack/vmap naturally
([W, ...] leading axes) instead of living in std::deque<NavState>.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie

GRAVITY = 9.80511  # reference: imu_preintegration.hpp:69, params.yaml imuGravity


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NavState:
    """Single (or stacked, via leading batch dims) navigation state."""

    t: jax.Array  # [] timestamp, seconds
    R: jax.Array  # [3,3] attitude (body->world)
    p: jax.Array  # [3] position, world
    v: jax.Array  # [3] velocity, world
    bg: jax.Array  # [3] gyro bias
    ba: jax.Array  # [3] accel bias

    @staticmethod
    def identity(dtype=jnp.float32, t: float = 0.0) -> "NavState":
        return NavState(
            t=jnp.asarray(t, dtype=dtype),
            R=jnp.eye(3, dtype=dtype),
            p=jnp.zeros(3, dtype=dtype),
            v=jnp.zeros(3, dtype=dtype),
            bg=jnp.zeros(3, dtype=dtype),
            ba=jnp.zeros(3, dtype=dtype),
        )

    def pose(self) -> jax.Array:
        """4x4 SE(3) world_T_body."""
        return lie.se3_matrix(self.R, self.p)

    def with_pose(self, T: jax.Array) -> "NavState":
        return dataclasses.replace(self, R=T[..., :3, :3], p=T[..., :3, 3])


def stack_states(states: list[NavState]) -> NavState:
    """Stack python list of states into one batched NavState [W, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def index_state(states: NavState, i) -> NavState:
    """Select state i from a stacked NavState."""
    return jax.tree.map(lambda x: x[i], states)
