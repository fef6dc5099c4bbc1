"""APDGICP scan registration — batched Gauss-Newton/LM entirely under jit.

Capability parity with the reference's compute-dominant layer:
- covariance estimation with PLANE regularization
  (fast_apdgicp_impl.hpp:300-363),
- per-point NN correspondences + adaptive probability-distribution (range /
  azimuth / elevation dependent) covariance and Mahalanobis weighting
  (fast_apdgicp_impl.hpp:133-193),
- H/b accumulation with the [skew(T a), -I] Jacobian
  (fast_apdgicp_impl.hpp:198-272),
- the exact LM lambda schedule and convergence tests of LsqRegistration
  (lsq_registration_impl.hpp:55-173).

TPU-first design: the kd-tree NN becomes one [N, M] distance matrix on the
MXU (see ops/knn.py); per-point 3x3/4x6 Eigen blocks become batched einsums;
the OpenMP H/b reduction becomes a masked einsum-reduction; the sequential
LM driver becomes nested `lax.while_loop`s with static bounds so the whole
solve is one XLA program. Everything vmaps over a leading frame axis for
throughput benchmarking (independent frame pairs).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.ops import knn


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PreparedCloud:
    """A cloud with precomputed regularized GICP covariances."""

    xyz: jax.Array  # [N, 3]
    mask: jax.Array  # [N]
    cov: jax.Array  # [N, 3, 3]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RegistrationResult:
    T: jax.Array  # [4, 4] final source->target transform
    H: jax.Array  # [6, 6] final Hessian (information of the estimate)
    error: jax.Array  # [] final weighted error
    converged: jax.Array  # [] bool
    iterations: jax.Array  # [] int32 outer iterations used
    num_correspondences: jax.Array  # [] int32 at the final linearization
    fitness: jax.Array  # [] mean NN sq distance over matched points


def _sym3_eigh(C: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Batched symmetric 3x3 eigendecomposition (ascending)."""
    return jnp.linalg.eigh(C)


def estimate_covariances(
    xyz: jax.Array, mask: jax.Array, cfg: RegistrationConfig
) -> PreparedCloud:
    """k-NN covariance + PLANE regularization (fast_apdgicp_impl.hpp:300-363).

    PLANE: replace eigenvalues with (1, 1, 1e-3) keeping eigenvectors — every
    surface patch becomes a disc; GICP's plane-to-plane metric follows.
    """
    from rivslam_tpu.core.pointcloud import SENTINEL

    if cfg.covariance_method == "RBF":
        # GPU_RBF_KERNEL parity (covariance_estimation_rbf.cu:78-160):
        # Gaussian-weighted moments over ALL points, w = exp(-kw * d2),
        # zeroed beyond max_dist; cov = E_w[xx^T] - mean mean^T (cu:46-53).
        # HIGHEST matmul precision throughout: the expanded-form d2
        # (n2_i + n2_j - 2 x.x^T) cancels catastrophically for points far
        # from the origin under the TPU's default bf16 matmul passes,
        # corrupting the exp weights — the fast path (apdgicp_fast) already
        # guards this with _bulk_precision, and this exact path is the
        # parity reference it is validated against (ADVICE r4).
        hp = jax.lax.Precision.HIGHEST
        sxyz = jnp.where(mask[..., None], xyz, SENTINEL)
        n2 = jnp.sum(sxyz * sxyz, axis=-1)
        d2 = jnp.maximum(
            n2[..., :, None] + n2[..., None, :]
            - 2.0 * jnp.matmul(sxyz, jnp.swapaxes(sxyz, -1, -2), precision=hp),
            0.0,
        )
        w = jnp.exp(-cfg.rbf_kernel_width * d2)
        w = jnp.where(
            (d2 <= cfg.rbf_max_dist**2) & mask[..., None, :], w, 0.0
        ).astype(xyz.dtype)  # [N, M]
        sw = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-6)
        mean = jnp.matmul(w, xyz, precision=hp) / sw
        exx = (
            jnp.einsum("...nm,...mi,...mj->...nij", w, xyz, xyz, precision=hp)
            / sw[..., None]
        )
        cov = exx - mean[..., :, None] * mean[..., None, :]
    else:
        sxyz = jnp.where(mask[..., None], xyz, SENTINEL)
        idx, d2 = knn.knn(sxyz, sxyz, mask, cfg.k_correspondences)
        nb = jnp.take(xyz, idx, axis=-2)  # [N, k, 3]
        w = jnp.isfinite(d2).astype(xyz.dtype)  # valid neighbor flags
        wn = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
        mean = jnp.sum(nb * w[..., None], axis=-2) / wn
        cent = (nb - mean[..., None, :]) * w[..., None]
        # NOTE reference divides by k (not n_valid); with full scans they agree.
        cov = jnp.einsum("...ki,...kj->...ij", cent, cent) / wn[..., None]

    if cfg.regularization == "NONE":
        cov_reg = cov
    elif cfg.regularization == "PLANE":
        # closed-form: U diag(1,1,1e-3) U^T needs only the smallest
        # eigenvector (ops/eig3.py) — batched eigh is ~100x slower on TPU
        from rivslam_tpu.ops import eig3

        cov_reg = eig3.plane_regularize(cov, 1e-3)
    elif cfg.regularization == "MIN_EIG":
        vals, vecs = _sym3_eigh(cov)
        new_vals = jnp.maximum(vals, 1e-3)
        cov_reg = jnp.einsum("...ij,...j,...kj->...ik", vecs, new_vals, vecs)
    elif cfg.regularization == "NORMALIZED_MIN_EIG":
        vals, vecs = _sym3_eigh(cov)
        new_vals = jnp.maximum(vals / jnp.maximum(vals[..., -1:], 1e-12), 1e-3)
        cov_reg = jnp.einsum("...ij,...j,...kj->...ik", vecs, new_vals, vecs)
    else:
        raise ValueError(f"unknown regularization {cfg.regularization}")
    return PreparedCloud(xyz=xyz, mask=mask, cov=cov_reg)


def _inv3(M: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    adj = jnp.stack(
        [
            jnp.stack([A, D, G], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([C, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def adaptive_cov(pt: jax.Array, cfg: RegistrationConfig) -> jax.Array:
    """Per-point APD covariance C_dist = R diag(s) diag(s) R^T
    (fast_apdgicp_impl.hpp:163-184). `pt` is the TRANSFORMED source point —
    matches the reference, which evaluates it on trans * a."""
    x, y, z = pt[..., 0], pt[..., 1], pt[..., 2]
    dist = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-12))
    aoa = jnp.arctan2(x, jnp.sqrt(y * y + z * z))
    cos_aoa = jnp.cos(aoa)
    safe_cos = jnp.where(jnp.abs(cos_aoa) < 1e-6, 1e-6, cos_aoa)
    s_x = dist * cfg.dist_var / 400.0
    s_y = dist * math.sin(math.radians(cfg.azimuth_var)) / safe_cos
    s_z = dist * math.sin(math.radians(cfg.elevation_var)) / safe_cos
    elevation = jnp.arctan2(jnp.sqrt(x * x + y * y), z)
    azimuth = jnp.arctan2(y, x)
    # R = Rz(azimuth) @ Ry(elevation)
    ca, sa = jnp.cos(azimuth), jnp.sin(azimuth)
    ce, se = jnp.cos(elevation), jnp.sin(elevation)
    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    Rz = jnp.stack(
        [
            jnp.stack([ca, -sa, zeros], axis=-1),
            jnp.stack([sa, ca, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([ce, zeros, se], axis=-1),
            jnp.stack([zeros, ones, zeros], axis=-1),
            jnp.stack([-se, zeros, ce], axis=-1),
        ],
        axis=-2,
    )
    R = Rz @ Ry
    s2 = jnp.stack([s_x * s_x, s_y * s_y, s_z * s_z], axis=-1)
    return jnp.einsum("...ij,...j,...kj->...ik", R, s2, R)


def _correspondences(T, source: PreparedCloud, target: PreparedCloud, cfg: RegistrationConfig):
    """NN correspondences + Mahalanobis (fast_apdgicp_impl.hpp:133-193).

    Returns (tgt_idx [N], corr_mask [N], mahalanobis [N,3,3]).
    """
    from rivslam_tpu.core.pointcloud import SENTINEL

    pt = lie.transform_points(T, source.xyz)
    tgt_xyz = jnp.where(target.mask[..., None], target.xyz, SENTINEL)
    idx, d2 = knn.nearest_neighbor(pt, tgt_xyz, target.mask)
    corr = source.mask & (d2 < cfg.max_correspondence_distance**2)

    cov_A = source.cov
    cov_B = jnp.take(target.cov, idx, axis=-3)
    if cfg.method == "FAST_APDGICP":
        cd = adaptive_cov(pt, cfg)
    else:  # FAST_GICP: no adaptive term
        cd = jnp.zeros_like(cov_A)
    R = T[..., :3, :3]
    rcr = (cov_B + cd) + jnp.einsum("ij,...jk,lk->...il", R, cov_A + cd, R)
    mah = _inv3(rcr)
    if cfg.method == "ICP":
        # plain point-to-point ICP (registrations.cpp:52 pcl::ICP): identity
        # weighting instead of the Mahalanobis metric
        mah = jnp.broadcast_to(jnp.eye(3, dtype=mah.dtype), mah.shape)
    mah = jnp.where(corr[..., None, None], mah, 0.0)
    return idx, corr, mah, d2


def _linearize(T, source, target, idx, corr, mah):
    """H, b, error from fixed correspondences (fast_apdgicp_impl.hpp:221-260)."""
    pt = lie.transform_points(T, source.xyz)
    tgt = jnp.take(target.xyz, idx, axis=-2)
    e = tgt - pt  # [N, 3]
    me = jnp.einsum("...nij,...nj->...ni", mah, e)
    err = jnp.sum(jnp.where(corr, jnp.einsum("...ni,...ni->...n", e, me), 0.0), axis=-1)
    # J = d e / d [w, t] = [skew(pt), -I]   (3x6)
    J = jnp.concatenate(
        [lie.hat(pt), jnp.broadcast_to(-jnp.eye(3, dtype=pt.dtype), pt.shape + (3,))], axis=-1
    )  # [N, 3, 6]
    MJ = jnp.einsum("...nij,...njk->...nik", mah, J)
    H = jnp.einsum("...nji,...njk->...ik", J, MJ)
    b = jnp.einsum("...nji,...nj->...i", J, me)
    return H, b, err


def _compute_error(T, source, target, idx, corr, mah):
    """Error at T under FIXED correspondences — reference compute_error
    (fast_apdgicp_impl.hpp:275-298) reuses the x0 linearization's matches."""
    pt = lie.transform_points(T, source.xyz)
    tgt = jnp.take(target.xyz, idx, axis=-2)
    e = tgt - pt
    return jnp.sum(
        jnp.where(corr, jnp.einsum("...nij,...ni,...nj->...n", mah, e, e), 0.0), axis=-1
    )


def _is_converged(delta_T, cfg: RegistrationConfig):
    """lsq_registration_impl.hpp:83-92."""
    R = delta_T[..., :3, :3] - jnp.eye(3, dtype=delta_T.dtype)
    t = delta_T[..., :3, 3]
    r_delta = jnp.max(jnp.abs(R), axis=(-2, -1)) / cfg.rotation_epsilon
    t_delta = jnp.max(jnp.abs(t), axis=-1) / cfg.transformation_epsilon
    return jnp.maximum(r_delta, t_delta) < 1.0


def _se3_from_rt(d):
    """6-vector [w(3), t(3)] -> 4x4 with R=exp(w), trans=t (NOT se3_exp's
    coupled translation — matches the reference's step parameterization,
    lsq_registration_impl.hpp:140-143)."""
    return lie.se3_matrix(lie.so3_exp(d[..., :3]), d[..., 3:])


def register(
    source: PreparedCloud,
    target: PreparedCloud,
    guess: jax.Array,
    cfg: RegistrationConfig,
    axis_name: str | None = None,
) -> RegistrationResult:
    """LM-iterated APDGICP alignment of source onto target.

    Faithful port of the LsqRegistration LM driver
    (lsq_registration_impl.hpp:55-173) as nested bounded `lax.while_loop`s.

    `axis_name`: when called inside shard_map with SOURCE points sharded over
    that mesh axis (target replicated), H/b/error partials are psum-combined
    over ICI — the TPU-native form of the reference's OpenMP H/b reduction
    (fast_apdgicp_impl.hpp:221-260).
    """
    dtype = source.xyz.dtype
    T0 = guess.astype(dtype)

    def _reduce(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def solve_step(H, b, lam):
        A = H + lam * jnp.eye(6, dtype=dtype)
        d = jnp.linalg.solve(A, -b[..., None])[..., 0]
        return d

    def outer_cond(carry):
        T, lam, converged, failed, it, Hf, errf = carry
        return (~converged) & (~failed) & (it < cfg.max_iterations)

    def outer_body_gn(carry):
        """step_gn (lsq_registration_impl.hpp:107-123): one undamped solve."""
        T, lam, converged, failed, it, Hf, errf = carry
        idx, corr, mah, d2 = _correspondences(T, source, target, cfg)
        H, b, y0 = _linearize(T, source, target, idx, corr, mah)
        H, b, y0 = _reduce(H), _reduce(b), _reduce(y0)
        d = jnp.linalg.solve(H, -b[..., None])[..., 0]
        delta = _se3_from_rt(d)
        T_new = delta @ T
        return (T_new, lam, _is_converged(delta, cfg), failed, it + 1, H, y0)

    def outer_body(carry):
        T, lam, converged, failed, it, Hf, errf = carry
        idx, corr, mah, d2 = _correspondences(T, source, target, cfg)
        H, b, y0 = _linearize(T, source, target, idx, corr, mah)
        H, b, y0 = _reduce(H), _reduce(b), _reduce(y0)
        lam = jnp.where(
            lam < 0.0, cfg.lm_init_lambda_factor * jnp.max(jnp.abs(jnp.diagonal(H))), lam
        )

        # inner LM lambda search (lsq_registration_impl.hpp:136-170)
        def inner_cond(ic):
            T_i, lam_i, nu, j, done, success, conv_i, delta_last = ic
            return (~done) & (j < cfg.lm_max_iterations)

        def inner_body(ic):
            T_i, lam_i, nu, j, done, success, conv_i, delta_last = ic
            d = solve_step(H, b, lam_i)
            delta = _se3_from_rt(d)
            T_new = delta @ T
            yi = _reduce(_compute_error(T_new, source, target, idx, corr, mah))
            denom = jnp.dot(d, lam_i * d - b)
            rho = (y0 - yi) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)

            accept = rho >= 0.0
            conv_on_reject = _is_converged(delta, cfg)
            # accept: update T, shrink lambda, stop inner successfully
            lam_accept = lam_i * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            # reject: grow lambda, continue (or stop if delta already tiny)
            lam_reject = nu * lam_i
            stop = accept | conv_on_reject
            return (
                jnp.where(accept, T_new, T_i),
                jnp.where(accept, lam_accept, lam_reject),
                jnp.where(accept, nu, 2.0 * nu),
                j + 1,
                stop,
                accept,
                conv_on_reject & ~accept,
                jnp.where(accept, delta, delta_last),
            )

        init_inner = (
            T,
            lam,
            jnp.asarray(2.0, dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.eye(4, dtype=dtype),
        )
        T_i, lam_i, nu, j, done, success, conv_inner, delta = jax.lax.while_loop(
            inner_cond, inner_body, init_inner
        )
        # inner exhausted without accept and without convergence -> LM failure
        failed_now = (~success) & (~conv_inner)
        converged_now = jnp.where(success, _is_converged(delta, cfg), conv_inner)
        return (
            T_i,
            lam_i,
            converged_now,
            failed_now,
            it + 1,
            jnp.where(success, H, Hf),
            jnp.where(success, y0, errf),
        )

    init = (
        T0,
        jnp.asarray(-1.0, dtype),
        jnp.asarray(False),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        jnp.eye(6, dtype=dtype),
        jnp.asarray(jnp.inf, dtype),
    )
    body = outer_body_gn if cfg.optimizer == "GN" else outer_body
    T, lam, converged, failed, it, Hf, errf = jax.lax.while_loop(outer_cond, body, init)

    # final correspondence stats at the solution
    idx, corr, mah, d2 = _correspondences(T, source, target, cfg)
    ncorr = _reduce(jnp.sum(corr))
    fitness = _reduce(jnp.sum(jnp.where(corr, d2, 0.0))) / jnp.maximum(ncorr, 1)
    _, _, final_err = _linearize(T, source, target, idx, corr, mah)
    final_err = _reduce(final_err)
    return RegistrationResult(
        T=T,
        H=Hf,
        error=final_err,
        converged=converged,
        iterations=it,
        num_correspondences=ncorr.astype(jnp.int32),
        fitness=fitness,
    )


def prepare(xyz, mask, cfg: RegistrationConfig) -> PreparedCloud:
    """Covariance estimation honoring cfg.use_fast_path and
    cfg.covariance_method (KNN | RBF)."""
    if cfg.use_fast_path and cfg.regularization == "PLANE":
        from rivslam_tpu.frontend import apdgicp_fast

        if cfg.covariance_method == "RBF":
            return apdgicp_fast.estimate_covariances_rbf_fast(xyz, mask, cfg)
        return apdgicp_fast.estimate_covariances_fast(xyz, mask, cfg)
    return estimate_covariances(xyz, mask, cfg)


def register_dispatch(
    source: PreparedCloud, target: PreparedCloud, guess, cfg: RegistrationConfig
) -> RegistrationResult:
    """Method factory — select_registration_method parity
    (registrations.cpp:38-140). FAST_APDGICP/FAST_GICP take the SoA fast
    path; GICP/GICP_OMP are the same math as FAST_GICP here (the _OMP split
    is a CPU threading detail); ICP drops the Mahalanobis metric; VGICP/NDT
    voxelize the target."""
    m = cfg.method
    if m in ("VGICP", "FAST_VGICP", "FAST_VGICP_CUDA", "NDT", "NDT_OMP", "NDT_CUDA"):
        from rivslam_tpu.frontend import vgicp

        vm = vgicp.build_voxel_map(target.xyz, target.mask, cfg)
        if m.endswith("VGICP") or m == "FAST_VGICP_CUDA":
            return vgicp.register_vgicp(source, vm, guess, cfg)
        return vgicp.register_ndt(
            source.xyz, source.mask, vm, guess, cfg,
            src_capacity=source.xyz.shape[-2],
        )
    if cfg.use_fast_path and m in ("FAST_APDGICP", "FAST_GICP", "GICP", "GICP_OMP"):
        from rivslam_tpu.frontend import apdgicp_fast

        return apdgicp_fast.register_fast(source, target, guess, cfg)
    return register(source, target, guess, cfg)


def prepare_and_register(
    src_xyz, src_mask, tgt_xyz, tgt_mask, guess, cfg: RegistrationConfig
) -> RegistrationResult:
    """Convenience: covariance estimation + registration in one jittable call."""
    source = prepare(src_xyz, src_mask, cfg)
    target = prepare(tgt_xyz, tgt_mask, cfg)
    return register_dispatch(source, target, guess, cfg)
