"""Voxelized GICP (VGICP) — registration against a Gaussian voxel map.

Capability parity with FastVGICP / FastVGICPCuda (fast_vgicp.hpp + impl,
fast_vgicp_voxel.hpp:57-130, cuda/*.cu): the target becomes a voxel map of
per-voxel (mean, covariance, count) in additive mode; each source point is
matched to its nearby voxels (the DIRECT1/7 neighborhood) and contributes a
point-to-distribution Mahalanobis term.

TPU-first: the voxel map is built by one sort + segment-reduce
(ops/voxel.gaussian_voxel_map); the voxel-hash neighbor lookup becomes
packed-key exact matching on the MXU (`_voxel_correspondences_direct`:
one [N, V] int difference matrix answers all DIRECT7 neighborhoods, and
the payload gather is 7 one-hot matmuls — no hash tables, no binary
search, no device-unfriendly pointer chasing; this replaces the CUDA
find_voxel_correspondences kernel). A nearest-center top-k mode covers the
KDTREE search option. The LM driver matches LsqRegistration exactly like
frontend/apdgicp.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.ops import voxel as voxel_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelMap:
    coords: jax.Array  # [V,3] int32 voxel coords
    mean: jax.Array  # [V,3]
    cov: jax.Array  # [V,3,3] regularized
    count: jax.Array  # [V]

    @property
    def valid(self):
        return self.count > 0


def build_voxel_map(
    xyz: jax.Array,
    mask: jax.Array,
    cfg: RegistrationConfig,
    capacity: int = 2048,
) -> VoxelMap:
    coords, mean, cov, cnt = voxel_mod.gaussian_voxel_map(
        jnp.where(mask[:, None], xyz, 1e6), mask, cfg.voxel_resolution, capacity
    )
    # PLANE-style regularization like the point covariances
    vals, vecs = jnp.linalg.eigh(cov + 1e-9 * jnp.eye(3, dtype=xyz.dtype))
    new_vals = jnp.maximum(vals, 1e-3)
    cov_reg = jnp.einsum("vij,vj,vkj->vik", vecs, new_vals, vecs)
    return VoxelMap(coords=coords, mean=mean, cov=cov_reg, count=cnt)


# DIRECT7 neighborhood: the point's own voxel + 6 face neighbors
# (fast_vgicp_voxel.hpp neighbor_offsets, DIRECT7 case)
_DIRECT7_OFFSETS = (
    (0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1),
    (0, 0, -1),
)


def _mahalanobis_from(cov_B, cov_A_rot, corr):
    mah = apdgicp._inv3(cov_B + cov_A_rot[:, None, :, :])
    return jnp.where(corr[..., None, None], mah, 0.0)


def _rotated_src_cov(T, src):
    R = T[:3, :3]
    return jnp.einsum("ij,njk,lk->nil", R, src.cov, R)  # [N,3,3]


def _voxel_correspondences_nearest(
    T, src: apdgicp.PreparedCloud, vm: VoxelMap, cfg, k_neighbors=7
):
    """Nearest voxels by center distance via an [N, V] MXU distance matrix —
    the KDTREE-search analogue (reg_nn_search_method "KDTREE",
    registrations.cpp:126).

    Compatibility mode: its `vm.mean[idx]` / `vm.cov[idx]` top-k gathers are
    the vmapped dynamic-gather pattern measured at ~13 ms/frame on v5e
    (register_KDTREE 813 ms/64 frames, round-5 profile) — prefer the
    DIRECT7/DIRECT1 packed-key matmul form for anything hot."""
    pt = lie.transform_points(T, src.xyz)  # [N,3]
    centers = (vm.coords.astype(pt.dtype) + 0.5) * cfg.voxel_resolution
    centers = jnp.where(vm.valid[:, None], centers, 1e6)
    d2 = (
        jnp.sum(pt * pt, axis=-1)[:, None]
        + jnp.sum(centers * centers, axis=-1)[None, :]
        - 2.0 * pt @ centers.T
    )
    neg, idx = jax.lax.top_k(-d2, k_neighbors)  # [N,k]
    # a voxel participates if its center is within one voxel diagonal
    radius = cfg.voxel_resolution * 0.87 * 2.0  # ~ sqrt(3)/2 * 2
    corr = (-neg < radius * radius) & src.mask[:, None] & (vm.count[idx] > 0)
    mean_B = vm.mean[idx]
    cov_B = vm.cov[idx]
    return mean_B, corr, _mahalanobis_from(cov_B, _rotated_src_cov(T, src), corr)


def _voxel_correspondences_direct(
    T, src: apdgicp.PreparedCloud, vm: VoxelMap, cfg, n_offsets: int
):
    """DIRECT7/DIRECT1 voxel-hash lookup, MXU formulation (VERDICT r4 #4).

    The reference looks each point's voxel (+6 face neighbors) up in a
    std::unordered_map (fast_vgicp_voxel.hpp:57-130,
    find_voxel_correspondences.cu:114). Pointer-chasing equivalents
    (vmapped gathers / searchsorted binary search) run at ~1.5 ms/frame on
    TPU — random gathers don't vectorize. Instead: pack voxel coords into
    one order-preserving int32 key (ops/voxel.pack_voxel_coords); a face
    neighbor's key is then the center key plus a CONSTANT delta (+-2^20 /
    +-2^10 / +-1 — no field carries, because keys within 1 cell of the
    packing bound are masked out). One [N, V] int difference matrix
    `table - center_key` therefore answers all 7 neighborhoods:
    `diff == delta_k` is the exact-match one-hot for neighbor k, and
    multiplying it against the [V, 13] payload (mean, cov, validity) is an
    MXU matmul — the gather becomes 7 small matmuls with no sort, no
    binary search, no dynamic indexing. Exactness is asserted against
    brute-force coord membership in tests/test_vgicp.py."""
    pt = lie.transform_points(T, src.xyz)  # [N,3]
    dtype = pt.dtype
    V = vm.coords.shape[0]
    table = voxel_mod.pack_voxel_coords(
        jnp.where(vm.valid[:, None], vm.coords, voxel_mod._COORD_OFFSET)
    )  # [V]; invalid rows saturate to the MISS key
    c = jnp.floor(pt / cfg.voxel_resolution).astype(jnp.int32)  # [N,3]
    # margin of one cell from the packing bound so every neighbor delta is
    # carry-free; beyond +-511 voxels (+-511 m at the 1 m default) a point
    # simply gets no correspondences, like any out-of-map point
    B_ = voxel_mod._PACK_BOUND
    in_rng = jnp.all((c >= -(B_ - 1)) & (c <= B_ - 2), axis=-1)
    qk0 = jnp.where(
        in_rng & src.mask, voxel_mod.pack_voxel_coords(c), voxel_mod._PACK_MISS
    )  # [N]
    diff = table[None, :] - qk0[:, None]  # [N,V] int32
    deltas = (0, 1 << 20, -(1 << 20), 1 << 10, -(1 << 10), 1, -1)[:n_offsets]
    payload = jnp.concatenate(
        [vm.mean, vm.cov.reshape(V, 9), jnp.ones((V, 1), dtype)], axis=1
    )
    payload = jnp.where(vm.valid[:, None], payload, 0.0)  # [V,13]
    gathered = jnp.stack(
        [(diff == d).astype(dtype) @ payload for d in deltas], axis=1
    )  # [N,k,13]
    corr = (gathered[..., 12] > 0.5) & (qk0 != voxel_mod._PACK_MISS)[:, None]
    mean_B = gathered[..., :3]
    cov_B = gathered[..., 3:12].reshape(pt.shape[0], n_offsets, 3, 3)
    return mean_B, corr, _mahalanobis_from(cov_B, _rotated_src_cov(T, src), corr)


def _voxel_correspondences(
    T, src: apdgicp.PreparedCloud, vm: VoxelMap, cfg, method: str | None = None
):
    """Neighborhood-method dispatch (NeighborSearchMethod /
    reg_nn_search_method, fast_vgicp.hpp:74 + registrations.cpp:117-131)."""
    method = method or cfg.vgicp_neighborhood
    if method == "DIRECT7":
        return _voxel_correspondences_direct(T, src, vm, cfg, 7)
    if method == "DIRECT1":
        return _voxel_correspondences_direct(T, src, vm, cfg, 1)
    if method == "KDTREE":
        return _voxel_correspondences_nearest(T, src, vm, cfg)
    raise ValueError(f"unknown voxel neighborhood {method!r}")


def _linearize_vgicp(T, src, mean_B, corr, mah):
    pt = lie.transform_points(T, src.xyz)  # [N,3]
    e = mean_B - pt[:, None, :]  # [N,k,3]
    me = jnp.einsum("nkij,nkj->nki", mah, e)
    err = jnp.sum(jnp.where(corr, jnp.einsum("nki,nki->nk", e, me), 0.0))
    J = jnp.concatenate(
        [lie.hat(pt), jnp.broadcast_to(-jnp.eye(3, dtype=pt.dtype), pt.shape + (3,))],
        axis=-1,
    )  # [N,3,6]
    MJ = jnp.einsum("nkij,njl->nkil", mah, J)
    H = jnp.einsum("nji,nkjl->il", J, MJ)
    b = jnp.einsum("nji,nkj->i", J, me)
    return H, b, err


def _error_vgicp(T, src, mean_B, corr, mah):
    pt = lie.transform_points(T, src.xyz)
    e = mean_B - pt[:, None, :]
    return jnp.sum(jnp.where(corr, jnp.einsum("nkij,nki,nkj->nk", mah, e, e), 0.0))


def register_ndt(
    src_xyz: jax.Array,
    src_mask: jax.Array,
    vm: VoxelMap,
    guess: jax.Array,
    cfg: RegistrationConfig,
    mode: str = "P2D",
    src_capacity: int = 2048,
) -> apdgicp.RegistrationResult:
    """NDT via Gaussian voxels — parity with fast_gicp's NDTCuda
    (ndt/ndt_cuda.hpp, ndt_compute_derivatives.cu), which scores point/voxel
    pairs by the Mahalanobis distance of the per-voxel normal distributions
    (no exponential score):

    - P2D: each source POINT against the target voxel distributions
      (source covariance = 0),
    - D2D: each source VOXEL distribution against the target's.
    """
    if mode == "P2D":
        src = apdgicp.PreparedCloud(
            xyz=src_xyz,
            mask=src_mask,
            cov=jnp.zeros(src_xyz.shape[:-1] + (3, 3), dtype=src_xyz.dtype),
        )
    elif mode == "D2D":
        svm = build_voxel_map(src_xyz, src_mask, cfg, capacity=src_capacity)
        src = apdgicp.PreparedCloud(xyz=svm.mean, mask=svm.valid, cov=svm.cov)
    else:
        raise ValueError(mode)
    return register_vgicp(src, vm, guess, cfg, neighborhood=cfg.ndt_neighborhood)


def register_vgicp(
    src: apdgicp.PreparedCloud,
    vm: VoxelMap,
    guess: jax.Array,
    cfg: RegistrationConfig,
    neighborhood: str | None = None,
) -> apdgicp.RegistrationResult:
    """LsqRegistration LM driver over voxel correspondences."""
    nb = neighborhood or cfg.vgicp_neighborhood
    dtype = src.xyz.dtype
    T0 = guess.astype(dtype)

    def outer_cond(c):
        T, lam, converged, failed, it, Hf, errf = c
        return (~converged) & (~failed) & (it < cfg.max_iterations)

    def outer_body(c):
        T, lam, converged, failed, it, Hf, errf = c
        mean_B, corr, mah = _voxel_correspondences(T, src, vm, cfg, nb)
        H, b, y0 = _linearize_vgicp(T, src, mean_B, corr, mah)
        lam = jnp.where(lam < 0, cfg.lm_init_lambda_factor * jnp.max(jnp.abs(jnp.diagonal(H))), lam)

        def inner_cond(ic):
            T_i, lam_i, nu, j, done, success, conv_i, dlast = ic
            return (~done) & (j < cfg.lm_max_iterations)

        def inner_body(ic):
            T_i, lam_i, nu, j, done, success, conv_i, dlast = ic
            d = jnp.linalg.solve(H + lam_i * jnp.eye(6, dtype=dtype), -b[:, None])[:, 0]
            delta = lie.se3_matrix(lie.so3_exp(d[:3]), d[3:])
            T_new = delta @ T
            yi = _error_vgicp(T_new, src, mean_B, corr, mah)
            denom = jnp.dot(d, lam_i * d - b)
            rho = (y0 - yi) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            accept = rho >= 0.0
            conv_rej = apdgicp._is_converged(delta, cfg)
            return (
                jnp.where(accept, T_new, T_i),
                jnp.where(accept, lam_i * jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3), nu * lam_i),
                jnp.where(accept, nu, 2 * nu),
                j + 1,
                accept | conv_rej,
                accept,
                conv_rej & ~accept,
                jnp.where(accept, delta, dlast),
            )

        init = (T, lam, jnp.asarray(2.0, dtype), 0, jnp.asarray(False), jnp.asarray(False), jnp.asarray(False), jnp.eye(4, dtype=dtype))
        T_i, lam_i, nu, j, done, success, conv_i, delta = jax.lax.while_loop(inner_cond, inner_body, init)
        return (
            T_i,
            lam_i,
            jnp.where(success, apdgicp._is_converged(delta, cfg), conv_i),
            (~success) & (~conv_i),
            it + 1,
            jnp.where(success, H, Hf),
            jnp.where(success, y0, errf),
        )

    init = (T0, jnp.asarray(-1.0, dtype), jnp.asarray(False), jnp.asarray(False),
            jnp.asarray(0, jnp.int32), jnp.eye(6, dtype=dtype), jnp.asarray(jnp.inf, dtype))
    T, lam, converged, failed, it, Hf, errf = jax.lax.while_loop(outer_cond, outer_body, init)
    mean_B, corr, mah = _voxel_correspondences(T, src, vm, cfg, nb)
    ncorr = jnp.sum(corr)
    pt = lie.transform_points(T, src.xyz)
    d2 = jnp.sum((mean_B - pt[:, None, :]) ** 2, axis=-1)
    fitness = jnp.sum(jnp.where(corr, d2, 0.0)) / jnp.maximum(ncorr, 1)
    _, _, final_err = _linearize_vgicp(T, src, mean_B, corr, mah)
    return apdgicp.RegistrationResult(
        T=T, H=Hf, error=final_err, converged=converged, iterations=it,
        num_correspondences=ncorr.astype(jnp.int32), fitness=fitness,
    )
