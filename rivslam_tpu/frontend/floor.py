"""Ground-plane (floor) detection — batched-hypothesis RANSAC plane fit.

Capability parity with reference floor_detection_nodelet.cpp: tilt
compensation + height clipping (:156-169, 258-273), normal filtering
(:280-307), RANSAC plane (:182-195), verticality check (:197-208), fallback
handled by the caller (backend substitutes the previous/default plane).

TPU-first: instead of pcl's sequential SAC, we draw all `ransac_iterations`
3-point hypotheses at once, score them with one [H, N] distance matrix, pick
the best, then refine with a masked least-squares (PCA) plane fit over the
inliers.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import FloorConfig
from rivslam_tpu.ops import knn


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FloorResult:
    coeffs: jax.Array  # [4] plane (a,b,c,d): a x + b y + c z + d = 0, |n|=1
    found: jax.Array  # [] bool
    num_inliers: jax.Array  # [] int32


def detect_floor(
    xyz: jax.Array,
    mask: jax.Array,
    cfg: FloorConfig,
    key: jax.Array,
) -> FloorResult:
    dtype = xyz.dtype
    n = xyz.shape[0]

    # tilt compensation (floor_detection_nodelet.cpp:156-160)
    tilt = math.radians(cfg.tilt_deg)
    R_tilt = lie.so3_exp(jnp.asarray([0.0, tilt, 0.0], dtype=dtype))
    pts = xyz @ R_tilt.T

    # height clip around z = -sensor_height (:160-163)
    z = pts[:, 2]
    m = mask & (z > -(cfg.sensor_height + cfg.height_clip_range))
    m = m & (z < -(cfg.sensor_height - cfg.height_clip_range))

    # normal filtering (:280-307): kNN normals, keep near-vertical
    if cfg.use_normal_filtering:
        from rivslam_tpu.core.pointcloud import SENTINEL

        spts = jnp.where(m[:, None], pts, SENTINEL)
        idx, d2 = knn.knn(spts, spts, m, 10)
        nb = pts[idx]
        w = jnp.isfinite(d2).astype(dtype)
        wn = jnp.maximum(w.sum(-1, keepdims=True), 1.0)
        mean = (nb * w[..., None]).sum(-2) / wn
        cent = (nb - mean[:, None, :]) * w[..., None]
        cov = jnp.einsum("nki,nkj->nij", cent, cent) / wn[..., None]
        from rivslam_tpu.ops import eig3

        normal = eig3.smallest_eigenvector_sym3(cov)
        vert = jnp.abs(normal[:, 2])
        m = m & (vert > math.cos(math.radians(cfg.normal_filter_thresh_deg)))

    n_valid = jnp.sum(m)

    # batched 3-point RANSAC hypotheses
    h = cfg.ransac_iterations
    gumbel = jax.random.uniform(key, (h, n))
    scores = jnp.where(m[None, :], gumbel, -jnp.inf)
    _, samp = jax.lax.top_k(scores, 3)  # [h, 3]
    p = pts[samp]  # [h, 3, 3]
    nrm = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    d0 = -jnp.einsum("hi,hi->h", nrm, p[:, 0])
    dist = jnp.abs(jnp.einsum("hi,ni->hn", nrm, pts) + d0[:, None])  # [h, N]
    inl = m[None, :] & (dist < cfg.ransac_distance_thresh)
    n_inl = inl.sum(-1)
    best = jnp.argmax(n_inl)
    best_inl = inl[best]

    # refine: masked PCA plane through inlier centroid
    w = best_inl.astype(dtype)
    wn = jnp.maximum(w.sum(), 1.0)
    centroid = (pts * w[:, None]).sum(0) / wn
    cent = (pts - centroid) * w[:, None]
    C = cent.T @ cent / wn
    _, vecs = jnp.linalg.eigh(C)
    normal = vecs[:, 0]
    normal = jnp.where(normal[2] < 0, -normal, normal)  # point +z like reference
    d = -jnp.dot(normal, centroid)
    coeffs = jnp.concatenate([normal, d[None]])

    # verticality check (:197-208): normal within floor_normal_thresh of +z
    dot = normal[2]
    vertical_ok = jnp.abs(dot) > math.cos(math.radians(cfg.floor_normal_thresh_deg))
    found = (n_inl[best] >= cfg.floor_pts_thresh) & vertical_ok & (n_valid > 3)

    # un-tilt the plane back to sensor frame
    normal_s = R_tilt.T @ coeffs[:3]
    coeffs_s = jnp.concatenate([normal_s, coeffs[3:]])
    return FloorResult(coeffs=coeffs_s, found=found, num_inliers=n_inl[best].astype(jnp.int32))
