"""Mask-updating scan filters (reference preprocessing_nodelet.cpp).

Each filter is pure: RadarCloud -> RadarCloud with a tighter mask. No
reallocation, no dynamic shapes — composition of filters is one fused XLA
program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rivslam_tpu.core.config import PreprocessConfig
from rivslam_tpu.core.pointcloud import RadarCloud
from rivslam_tpu.ops import knn


def nan_filter(cloud: RadarCloud) -> RadarCloud:
    """Drop non-finite points (reference: removeNaNFromPointCloud)."""
    finite = jnp.all(jnp.isfinite(cloud.xyz), axis=-1)
    return cloud.and_mask(finite)


def power_filter(cloud: RadarCloud, threshold: float) -> RadarCloud:
    """Power/SNR gate (preprocessing_nodelet.cpp:667-700, power_threshold)."""
    return cloud.and_mask(cloud.intensity > threshold)


def distance_filter(cloud: RadarCloud, cfg: PreprocessConfig) -> RadarCloud:
    """Range annulus + z band (preprocessing_nodelet.cpp:881-905)."""
    d = jnp.linalg.norm(cloud.xyz, axis=-1)
    keep = (
        (d > cfg.distance_near_thresh)
        & (d < cfg.distance_far_thresh)
        & (cloud.xyz[..., 2] < cfg.z_high_thresh)
        & (cloud.xyz[..., 2] > cfg.z_low_thresh)
    )
    return cloud.and_mask(keep)


def radius_outlier_removal(cloud: RadarCloud, radius: float, min_neighbors: int) -> RadarCloud:
    """pcl::RadiusOutlierRemoval semantics (launch: RADIUS 0.5 / 1)."""
    from rivslam_tpu.core.pointcloud import masked_xyz

    counts = knn.radius_count(masked_xyz(cloud), cloud.mask, radius)
    return cloud.and_mask(counts >= min_neighbors)


def statistical_outlier_removal(cloud: RadarCloud, mean_k: int, stddev_mult: float) -> RadarCloud:
    """pcl::StatisticalOutlierRemoval semantics (launch: 30 / 1.2).

    Mean distance to k nearest neighbors; drop points whose mean distance
    exceeds global_mean + stddev_mult * global_std over valid points.
    """
    from rivslam_tpu.core.pointcloud import masked_xyz

    xyz = masked_xyz(cloud)
    _, d2 = knn.knn(xyz, xyz, cloud.mask, mean_k + 1)  # includes self at d=0
    d = jnp.sqrt(jnp.maximum(d2[..., 1:], 0.0))
    valid_nb = jnp.isfinite(d)
    mean_d = jnp.sum(jnp.where(valid_nb, d, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(valid_nb, axis=-1), 1
    )
    m = cloud.mask
    n = jnp.maximum(jnp.sum(m), 1)
    mu = jnp.sum(jnp.where(m, mean_d, 0.0)) / n
    var = jnp.sum(jnp.where(m, (mean_d - mu) ** 2, 0.0)) / n
    thresh = mu + stddev_mult * jnp.sqrt(var)
    return cloud.and_mask(mean_d <= thresh)


def bilateral_filter(cloud: RadarCloud, sigma_s: float, sigma_r: float) -> RadarCloud:
    """pcl::BilateralFilter semantics (launch BILATERAL option, sigma_s=5,
    sigma_r=0.03): smooth each point's INTENSITY by a spatial x range
    (intensity-difference) Gaussian over its neighborhood. Geometry is
    untouched. One masked [N, N] pass instead of per-point kd-tree queries."""
    from rivslam_tpu.core.pointcloud import masked_xyz

    xyz = masked_xyz(cloud)
    d2 = knn.pairwise_sqdist(xyz, xyz)
    w_s = jnp.exp(-d2 / (2.0 * sigma_s * sigma_s))
    di = cloud.intensity[..., :, None] - cloud.intensity[..., None, :]
    w_r = jnp.exp(-(di * di) / (2.0 * sigma_r * sigma_r))
    w = w_s * w_r * cloud.mask[..., None, :]
    num = jnp.einsum("...nm,...m->...n", w, cloud.intensity)
    den = jnp.maximum(jnp.sum(w, axis=-1), 1e-12)
    smoothed = num / den
    return cloud.replace(
        intensity=jnp.where(cloud.mask, smoothed, cloud.intensity)
    )


def z_filter(cloud: RadarCloud, z_min: float) -> RadarCloud:
    """Under-floor removal (preprocessing_nodelet.cpp underfloor_filter)."""
    return cloud.and_mask(cloud.xyz[..., 2] > z_min)


def distance_histogram(cloud: RadarCloud, max_dist: int = 100) -> jax.Array:
    """Per-meter point-count histogram (preprocessing_nodelet.cpp:818-828) —
    the density diagnostic used to pick fixed capacities."""
    d = jnp.linalg.norm(cloud.xyz, axis=-1)
    bins = jnp.clip(jnp.floor(d).astype(jnp.int32), 0, max_dist)
    return jnp.zeros(max_dist + 1, dtype=jnp.int32).at[bins].add(
        cloud.mask.astype(jnp.int32)
    )[:max_dist]


def spherical_to_cartesian(r, azimuth, elevation):
    """Radar polar target -> xyz, matching the reference ingest convention
    (preprocessing_nodelet.cpp:333-335: elevation measured from +z axis is
    converted with standard spherical formulas)."""
    x = r * jnp.cos(elevation) * jnp.cos(azimuth)
    y = r * jnp.cos(elevation) * jnp.sin(azimuth)
    z = r * jnp.sin(elevation)
    return jnp.stack([x, y, z], axis=-1)
