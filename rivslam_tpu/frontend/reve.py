"""Radar ego-velocity estimation (REVE) — vectorized RANSAC + LSQ.

Capability parity with the reference estimator
(src/radar_ego_velocity_estimator.cpp:60-303, christopherdoer/reve lineage),
re-designed for TPU: the sequential RANSAC loop (cpp:192-235) becomes one
batched solve — all `ransac_iter` 5-point hypotheses are sampled at once,
solved by batched 3x3 normal equations, scored against all targets with a
single [iters, N] residual matrix, and the best hypothesis selected by argmax.
The model: doppler_i = d_i . v  with d_i the unit direction to target i, so
H v = y with H = unit directions, y = doppler.

Reference quirks reproduced deliberately:
- the 70th-percentile |doppler| "median" zero-velocity gate (cpp:101-117),
- "regard outliers as inliers" when outlier ratio > 5% (cpp:216-221),
- sigma gating on the final solve (cpp:278-294).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rivslam_tpu.core.config import ReveConfig
from rivslam_tpu.core.pointcloud import RadarCloud


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EgoVelocityResult:
    v: jax.Array  # [3] estimated sensor-frame velocity
    sigma: jax.Array  # [3] per-axis std dev
    success: jax.Array  # [] bool
    zero_velocity: jax.Array  # [] bool
    inlier_mask: jax.Array  # [N] bool — static targets (outliers ~ dynamic objects)


def _masked_lsq(dirs: jax.Array, dop: jax.Array, w: jax.Array):
    """Weighted (0/1 masked) normal-equation solve of dirs @ v = dop.

    Returns (v [...,3], HtH [...,3,3], n [...]).
    """
    wd = dirs * w[..., None]
    HtH = jnp.einsum("...ni,...nj->...ij", wd, dirs)
    Hty = jnp.einsum("...ni,...n->...i", wd, dop)
    # Tikhonov epsilon keeps degenerate hypothesis solves finite; inlier
    # scoring then discards them naturally.
    eye = jnp.eye(3, dtype=dirs.dtype) * 1e-9
    v = jnp.linalg.solve(HtH + eye, Hty[..., None])[..., 0]
    return v, HtH, jnp.sum(w, axis=-1)


def estimate_ego_velocity(
    cloud: RadarCloud,
    cfg: ReveConfig,
    key: jax.Array,
) -> EgoVelocityResult:
    """Single-scan ego velocity. Fully jittable; `key` drives RANSAC sampling."""
    xyz = cloud.xyz
    dtype = xyz.dtype
    n = cloud.capacity

    r = jnp.linalg.norm(xyz, axis=-1)
    azimuth = jnp.arctan2(xyz[..., 1], xyz[..., 0])
    elevation = jnp.arctan2(jnp.sqrt(xyz[..., 0] ** 2 + xyz[..., 1] ** 2), xyz[..., 2]) - jnp.pi / 2
    valid = (
        cloud.mask
        & (r > cfg.min_dist)
        & (r < cfg.max_dist)
        & (cloud.intensity > cfg.min_db)
        & (jnp.abs(azimuth) < math.radians(cfg.azimuth_thresh_deg))
        & (jnp.abs(elevation) < math.radians(cfg.elevation_thresh_deg))
    )
    safe_r = jnp.maximum(r, 1e-9)
    dirs = xyz / safe_r[..., None]
    # reference ingest negates doppler twice (toRadarPointCloudType + v_pt
    # build): net doppler used in H v = y is the raw radial speed.
    dop = cloud.doppler * cfg.doppler_velocity_correction_factor
    n_valid = jnp.sum(valid)

    # ---- zero-velocity gate: q-th smallest |doppler| with q = N*(1-outlier%)
    abs_dop = jnp.where(valid, jnp.abs(dop), jnp.inf)
    sorted_dop = jnp.sort(abs_dop)
    q = jnp.floor(n_valid.astype(dtype) * (1.0 - cfg.allowed_outlier_percentage)).astype(jnp.int32)
    q = jnp.clip(q, 0, n - 1)
    median = sorted_dop[q]
    is_zero = median < cfg.thresh_zero_velocity

    zero_v = jnp.zeros(3, dtype=dtype)
    zero_sigma = jnp.asarray(
        [cfg.sigma_zero_velocity_x, cfg.sigma_zero_velocity_y, cfg.sigma_zero_velocity_z],
        dtype=dtype,
    )
    zero_inliers = valid & (jnp.abs(dop) < cfg.thresh_zero_velocity)

    # ---- RANSAC over all hypotheses at once
    iters = max(cfg.ransac_iter, 1)
    k = cfg.n_ransac_points
    # sample k distinct valid indices per iteration: random keys, invalid -> -inf
    gumbel = jax.random.uniform(key, (iters, n))
    scores = jnp.where(valid[None, :], gumbel, -jnp.inf)
    _, samp_idx = jax.lax.top_k(scores, k)  # [iters, k]
    samp_dirs = dirs[samp_idx]  # [iters, k, 3]
    samp_dop = dop[samp_idx]  # [iters, k]
    samp_w = valid[samp_idx].astype(dtype)
    v_hyp, _, _ = _masked_lsq(samp_dirs, samp_dop, samp_w)  # [iters, 3]

    # score every hypothesis against all valid targets
    err = jnp.abs(dop[None, :] - jnp.einsum("nd,id->in", dirs, v_hyp))  # [iters, N]
    inl = valid[None, :] & (err < cfg.inlier_thresh)
    n_inl = jnp.sum(inl, axis=-1)
    n_out = n_valid - n_inl
    # reference cpp:216-221: outlier ratio > 5% -> regard outliers as inliers
    ratio = n_out.astype(dtype) / jnp.maximum(n_valid, 1).astype(dtype)
    inl = jnp.where((ratio > 0.05)[:, None], valid[None, :], inl)
    n_inl = jnp.sum(inl, axis=-1)

    best = jnp.argmax(n_inl)
    best_inl = inl[best]

    # ---- final masked solve with sigma estimation (cpp:252-303)
    w = best_inl.astype(dtype)
    v_fin, HtH, n_in = _masked_lsq(dirs, dop, w)
    e = (jnp.einsum("nd,d->n", dirs, v_fin) - dop) * w
    ete = jnp.sum(e * e)
    HtH_inv = jnp.linalg.inv(HtH + jnp.eye(3, dtype=dtype) * 1e-9)
    denom = jnp.maximum(n_in - 3.0, 1.0)
    C = ete * HtH_inv / denom
    var = jnp.stack([C[0, 0], C[1, 1], C[2, 2]])
    var_ok = jnp.all(var >= 0.0)
    sigma = jnp.sqrt(jnp.maximum(var, 0.0)) + jnp.asarray(
        [cfg.sigma_offset_radar_x, cfg.sigma_offset_radar_y, cfg.sigma_offset_radar_z], dtype=dtype
    )
    sigma_ok = (
        (sigma[0] < cfg.max_sigma_x) & (sigma[1] < cfg.max_sigma_y) & (sigma[2] < cfg.max_sigma_z)
    )
    ransac_ok = var_ok & sigma_ok & (n_valid > 2) & (jnp.max(n_inl) > 0)

    v = jnp.where(is_zero, zero_v, v_fin)
    sigma_out = jnp.where(is_zero, zero_sigma, sigma)
    inlier_mask = jnp.where(is_zero, zero_inliers, best_inl)
    success = jnp.where(is_zero, n_valid > 2, ransac_ok)
    return EgoVelocityResult(
        v=v,
        sigma=sigma_out,
        success=success,
        zero_velocity=is_zero & (n_valid > 2),
        inlier_mask=inlier_mask,
    )
