"""Voxel-grid ops with static shapes: downsampling and Gaussian voxel maps.

Replaces pcl::VoxelGrid (reference preprocessing downsample, launch:57-59)
and the FastVGICP Gaussian voxel map (fast_vgicp_voxel.hpp:57-130). The TPU
formulation: quantize points to integer voxel coords, lexicographically sort
(one multi-key `lax.sort`), then segment-reduce runs of equal coords. All
shapes static; the variable number of occupied voxels becomes a mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rivslam_tpu.core.pointcloud import RadarCloud

_COORD_OFFSET = 1 << 20  # voxel coords assumed within +-2^20

# Packed-key bound for O(log V) DIRECT-neighborhood lookups: coords in
# [-512, 512) pack order-preservingly into one int32 (10 bits/axis). At the
# 1 m default voxel resolution that is a +-512 m scene — far beyond radar
# range; out-of-range coords (including the sort sentinel) saturate to
# INT32_MAX so they can never produce a false hit.
_PACK_BOUND = 512
_PACK_MISS = jnp.int32(2**31 - 1)


def pack_voxel_coords(coords: jax.Array) -> jax.Array:
    """Pack int32 voxel coords [..., 3] into one order-preserving int32 key.

    Lexicographic (x, y, z) order of in-range coords equals ascending order
    of the packed keys, so the voxel table emitted by gaussian_voxel_map
    (lex-sorted valid rows first) packs to an ascending key array — ready
    for jnp.searchsorted hash-free DIRECT7 lookups (the TPU replacement for
    fast_vgicp_voxel.hpp's std::unordered_map voxel hash)."""
    in_range = jnp.all((coords >= -_PACK_BOUND) & (coords < _PACK_BOUND), axis=-1)
    off = coords + _PACK_BOUND
    key = (off[..., 0] << 20) | (off[..., 1] << 10) | off[..., 2]
    return jnp.where(in_range, key, _PACK_MISS)


def voxel_keys(xyz: jax.Array, mask: jax.Array, resolution: float) -> jax.Array:
    """Integer voxel coords [N, 3]; invalid points get a sentinel max coord."""
    c = jnp.floor(xyz / resolution).astype(jnp.int32)
    return jnp.where(mask[..., None], c, jnp.int32(_COORD_OFFSET))


def _sort_by_voxel(keys3, values):
    """Lexicographic sort by (kx, ky, kz); returns sorted keys and values."""
    ops = (keys3[:, 0], keys3[:, 1], keys3[:, 2]) + tuple(values)
    out = jax.lax.sort(ops, num_keys=3)
    skeys = jnp.stack(out[:3], axis=1)
    return skeys, out[3:]


def voxel_downsample(cloud: RadarCloud, resolution: float, out_capacity: int) -> RadarCloud:
    """Centroid-per-voxel downsample, pcl::VoxelGrid semantics.

    Output has static capacity `out_capacity`; if more voxels are occupied,
    the excess (in voxel-coord lexicographic order) is dropped — pick the
    capacity from dataset statistics (see SURVEY.md §7 'hard parts').
    """
    keys = voxel_keys(cloud.xyz, cloud.mask, resolution)
    vals = (
        cloud.xyz[:, 0],
        cloud.xyz[:, 1],
        cloud.xyz[:, 2],
        cloud.doppler,
        cloud.intensity,
        cloud.mask.astype(cloud.xyz.dtype),
    )
    skeys, svals = _sort_by_voxel(keys, vals)
    sx, sy, sz, sdop, sint, smask = svals

    # run starts: first element or coord differs from previous
    diff = jnp.any(skeys != jnp.roll(skeys, 1, axis=0), axis=1)
    is_start = diff.at[0].set(True) & (smask > 0)
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # [-1 .. nseg-1]
    seg_id = jnp.where(smask > 0, seg_id, out_capacity)  # invalid -> dropped
    seg_id = jnp.minimum(seg_id, out_capacity)  # overflow -> dropped bucket

    def seg_sum(v):
        return jnp.zeros(out_capacity + 1, dtype=v.dtype).at[seg_id].add(v)[:-1]

    cnt = seg_sum(smask)
    safe = jnp.maximum(cnt, 1.0)
    out = RadarCloud(
        xyz=jnp.stack([seg_sum(sx), seg_sum(sy), seg_sum(sz)], axis=-1) / safe[:, None],
        doppler=seg_sum(sdop) / safe,
        intensity=seg_sum(sint) / safe,
        mask=cnt > 0,
    )
    return out


def gaussian_voxel_map(
    xyz: jax.Array,
    mask: jax.Array,
    resolution: float,
    capacity: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-voxel (mean, covariance, count) — FastVGICP's additive voxel map
    (fast_vgicp_voxel.hpp:57-130) built by one sort + segment reductions.

    Returns (coords [V,3] int32, means [V,3], covs [V,3,3], counts [V]).
    """
    keys = voxel_keys(xyz, mask, resolution)
    m = mask.astype(xyz.dtype)
    vals = (xyz[:, 0], xyz[:, 1], xyz[:, 2], m)
    skeys, (sx, sy, sz, sm) = _sort_by_voxel(keys, vals)
    diff = jnp.any(skeys != jnp.roll(skeys, 1, axis=0), axis=1)
    is_start = diff.at[0].set(True) & (sm > 0)
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg_id = jnp.where(sm > 0, seg_id, capacity)
    seg_id = jnp.minimum(seg_id, capacity)

    def seg_sum(v):
        return jnp.zeros(capacity + 1, dtype=v.dtype).at[seg_id].add(v)[:-1]

    cnt = seg_sum(sm)
    safe = jnp.maximum(cnt, 1.0)
    mean = jnp.stack([seg_sum(sx), seg_sum(sy), seg_sum(sz)], axis=-1) / safe[:, None]
    p = jnp.stack([sx, sy, sz], axis=-1)
    outer = p[:, :, None] * p[:, None, :]
    sum_outer = jnp.zeros((capacity + 1, 3, 3), dtype=xyz.dtype).at[seg_id].add(
        outer * sm[:, None, None]
    )[:-1]
    cov = sum_outer / safe[:, None, None] - mean[:, :, None] * mean[:, None, :]
    coords = jnp.full((capacity + 1, 3), -_COORD_OFFSET, dtype=jnp.int32).at[seg_id].max(
        jnp.where((sm > 0)[:, None], skeys, -_COORD_OFFSET)
    )[:-1]
    return coords, mean, cov, cnt
