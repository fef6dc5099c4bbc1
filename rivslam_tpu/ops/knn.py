"""Masked nearest-neighbor searches — the TPU-native kd-tree replacement.

The reference uses exact pcl/nanoflann kd-trees (fast_apdgicp_impl.hpp:151,
Scancontext ring-key search, information_matrix_calculator.cpp:55-86). Radar
scans are 10^2..10^4 points, so an exact brute-force distance matrix is cheap
and maps perfectly onto the MXU: ||a-b||^2 = |a|^2 + |b|^2 - 2 a.b with the
cross term a single matmul. Results are bit-exact NN (better than kd-tree
approximations), fully batched, no host control flow.

For big maps (fitness scoring over whole keyframe clouds) use the tiled
variant which keeps the [N, M] matrix in chunks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = jnp.inf


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """[..., N, 3] x [..., M, 3] -> [..., N, M] squared distances (MXU path)."""
    # Cross term on the MXU; norms on the VPU. f32 accumulation.
    cross = jnp.einsum("...nd,...md->...nm", a, b, preferred_element_type=a.dtype)
    na = jnp.sum(a * a, axis=-1)
    nb = jnp.sum(b * b, axis=-1)
    d2 = na[..., :, None] + nb[..., None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def nearest_neighbor(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """For each query point, exact nearest valid ref point.

    Returns (idx [..., N] int32, sqdist [..., N]). Invalid refs never win
    (their distance is +inf); if no valid ref exists idx is arbitrary and
    sqdist inf — callers gate on their own masks.
    """
    d2 = pairwise_sqdist(query, ref)
    d2 = jnp.where(ref_mask[..., None, :], d2, BIG)
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    best = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
    return idx, best


def knn(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact k nearest valid refs per query.

    Returns (idx [..., N, k], sqdist [..., N, k]); padded with the closest
    valid index repeated if fewer than k valid refs exist (dist=inf marks
    padding). Matches kd-tree nearestKSearch semantics used for GICP
    covariance estimation (k=20, fast_apdgicp_impl.hpp:316).
    """
    d2 = pairwise_sqdist(query, ref)
    d2 = jnp.where(ref_mask[..., None, :], d2, BIG)
    neg, idx = jax.lax.top_k(-d2, k)
    return idx.astype(jnp.int32), -neg


def radius_count(
    points: jax.Array,
    mask: jax.Array,
    radius: float,
) -> jax.Array:
    """Number of OTHER valid points within `radius` of each point.

    Used for radius outlier removal (reference launch: radius 0.5 min 1) and
    dynamic-object clustering.
    """
    d2 = pairwise_sqdist(points, points)
    n = points.shape[-2]
    within = (d2 <= radius * radius) & mask[..., None, :]
    eye = jnp.eye(n, dtype=bool)
    within = within & ~eye
    return jnp.sum(within, axis=-1)


def nearest_neighbor_tiled(
    query: jax.Array,
    ref: jax.Array,
    ref_mask: jax.Array,
    tile: int = 2048,
) -> tuple[jax.Array, jax.Array]:
    """NN against a large ref set, scanning ref in tiles to bound memory.

    ref [M, 3] with M static; streams [N, tile] distance blocks. Used for
    fitness scoring against whole submaps/keyframe maps
    (information_matrix_calculator.cpp:55-86 analogue).
    """
    m = ref.shape[-2]
    num_tiles = -(-m // tile)
    pad = num_tiles * tile - m
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    mask_p = jnp.pad(ref_mask, ((0, pad),))
    ref_t = ref_p.reshape(num_tiles, tile, 3)
    mask_t = mask_p.reshape(num_tiles, tile)

    def body(carry, rt):
        best_d2, best_idx = carry
        r, rm, base = rt
        d2 = pairwise_sqdist(query, r)
        d2 = jnp.where(rm[None, :], d2, BIG)
        idx = jnp.argmin(d2, axis=-1)
        d = jnp.take_along_axis(d2, idx[..., None], axis=-1)[..., 0]
        upd = d < best_d2
        return (
            jnp.where(upd, d, best_d2),
            jnp.where(upd, (idx + base).astype(jnp.int32), best_idx),
        ), None

    n = query.shape[-2]
    init = (jnp.full((n,), BIG, dtype=query.dtype), jnp.zeros((n,), dtype=jnp.int32))
    bases = jnp.arange(num_tiles, dtype=jnp.int32) * tile
    (best_d2, best_idx), _ = jax.lax.scan(body, init, (ref_t, mask_t, bases))
    return best_idx, best_d2
