"""Distributed registration and batched solves over a device mesh.

The reference's parallelism is OpenMP point loops + a 4-nodelet pipeline on
one machine (SURVEY.md §2.5). Here the same math scales over TPU chips:

- `batched_register`: DATA parallelism — independent frame pairs sharded on
  the leading axis; XLA partitions the whole LM solve per device with zero
  communication.
- `sharded_register`: MODEL parallelism — ONE registration problem with its
  source points sharded over the `model` axis; correspondences are computed
  locally against the replicated target and the 6x6 H / 6x1 b / error
  partials are psum'd over ICI each LM iteration (the OpenMP
  reduction(+:...) re-expressed as a collective).
- `batched_window_solve`: DATA-parallel sliding-window optimizations.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rivslam_tpu.core.config import BackendConfig, RegistrationConfig
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.solver import window as win

# Every entry point below memoizes its jitted program on the hashable
# statics (config dataclasses + Mesh). Building the `@jax.jit` closure
# inside the call body — the original form — created a NEW jit cache entry
# per invocation, so repeated calls re-traced (and re-loaded from the
# persistent compile cache) every time; the round-3 scaling report timed
# exactly that overhead instead of execution (SCALING_r3_cpu.json's
# sharded_register at 1 device: 326 ms vs 4.2 ms local for identical math).


@lru_cache(maxsize=None)
def _batched_register_fn(cfg: RegistrationConfig, mesh: Mesh):
    @jax.jit
    def run(s, t, g):
        return jax.vmap(lambda a, b, c: apdgicp.register(a, b, c, cfg))(s, t, g)

    return run


def batched_register(
    sources: apdgicp.PreparedCloud,
    targets: apdgicp.PreparedCloud,
    guesses: jax.Array,
    cfg: RegistrationConfig,
    mesh: Mesh,
):
    """Register B independent frame pairs, B sharded over the `data` axis."""
    dsh = NamedSharding(mesh, P("data"))
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, dsh), t)
    sources, targets, guesses = put(sources), put(targets), put(guesses)
    return _batched_register_fn(cfg, mesh)(sources, targets, guesses)


@lru_cache(maxsize=None)
def _sharded_register_fn(cfg: RegistrationConfig, mesh: Mesh, axis: str):
    spec_src = apdgicp.PreparedCloud(
        xyz=P(axis, None), mask=P(axis), cov=P(axis, None, None)
    )
    spec_tgt = apdgicp.PreparedCloud(xyz=P(), mask=P(), cov=P())
    out_spec = jax.tree.map(
        lambda _: P(), apdgicp.RegistrationResult(
            T=0, H=0, error=0, converged=0, iterations=0, num_correspondences=0, fitness=0
        )
    )

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(spec_src, spec_tgt, P()),
        out_specs=out_spec,
        check_vma=False,
    )
    def run(s, t, g):
        return apdgicp.register(s, t, g, cfg, axis_name=axis)

    return run


def sharded_register(
    source: apdgicp.PreparedCloud,
    target: apdgicp.PreparedCloud,
    guess: jax.Array,
    cfg: RegistrationConfig,
    mesh: Mesh,
    axis: str = "model",
):
    """One registration, source points sharded over `axis`; H/b via psum.

    Point count must be divisible by the axis size.
    """
    return _sharded_register_fn(cfg, mesh, axis)(source, target, guess)


@lru_cache(maxsize=None)
def _batched_window_solve_fn(
    cfg: BackendConfig, bias_info: tuple[float, float], mesh: Mesh
):
    @jax.jit
    def run(x, f):
        return jax.vmap(lambda a, b: win.solve_window(a, b, cfg, bias_info))(x, f)

    return run


def batched_window_solve(
    states: win.WindowState,
    factors: win.WindowFactors,
    cfg: BackendConfig,
    bias_info: tuple[float, float],
    mesh: Mesh,
):
    """Solve B independent sliding windows, B sharded over `data`."""
    dsh = NamedSharding(mesh, P("data"))
    put = lambda t: jax.tree.map(lambda x: jax.device_put(x, dsh), t)
    states, factors = put(states), put(factors)
    return _batched_window_solve_fn(cfg, tuple(bias_info), mesh)(states, factors)


@lru_cache(maxsize=None)
def _batched_replay_odometry_fn(odo_cfg, reg_cfg: RegistrationConfig, mesh: Mesh):
    from rivslam_tpu.frontend import replay_device

    @jax.jit
    def run(x, m, v, t):
        return jax.vmap(
            lambda a, b, c, d: replay_device.replay_odometry(a, b, c, d, odo_cfg, reg_cfg)
        )(x, m, v, t)

    return run


def batched_replay_odometry(
    xyz: jax.Array,  # [S, F, N, 3] S independent sequences
    mask: jax.Array,  # [S, F, N]
    ego_vel: jax.Array,  # [S, F, 3]
    times: jax.Array,  # [S, F]
    odo_cfg,
    reg_cfg: RegistrationConfig,
    mesh: Mesh,
):
    """Production serving form: S independent sequences sharded over `data`,
    each replayed sequentially on its device (frontend/replay_device.py) —
    throughput scales with chips while per-sequence latency stays fixed."""
    dsh = NamedSharding(mesh, P("data"))
    put = lambda x: jax.device_put(x, dsh)
    xyz, mask, ego_vel, times = put(xyz), put(mask), put(ego_vel), put(times)
    return _batched_replay_odometry_fn(odo_cfg, reg_cfg, mesh)(xyz, mask, ego_vel, times)
