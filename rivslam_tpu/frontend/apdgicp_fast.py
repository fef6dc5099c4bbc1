"""APDGICP registration — TPU-layout-optimized (structure-of-arrays) path.

Semantically identical to frontend/apdgicp.py's register() (validated
against it in tests), but every per-point quantity lives in component arrays
of shape [N] instead of [N,3]/[N,3,3]: on TPU, trailing dims of 3 are padded
to the (8,128) tile, wasting ~40x of the VPU; component arrays are perfectly
lane-packed. The 3x3 algebra (transform, adaptive covariance, R C R^T,
adjugate inverse, J^T M J accumulation via cross-product identities) is
expanded into explicit scalar-channel formulas.

H = J^T M J with J = [skew(p) | -I] uses:
    C[:,j] = p x m_j          (m_j = columns of M)
    H_rr[:,j] = p x C[j,:],  H_rt = C,  H_tt = M
    b_rot = -(p x (M e)),    b_trans = -(M e)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.frontend import apdgicp


def _bulk_precision(cfg: RegistrationConfig) -> jax.lax.Precision:
    """Precision for the big [N,M]-shaped matmuls (see
    RegistrationConfig.fast_matmul_precision). Pose algebra never goes
    through this — chained products need the f32 6-pass form."""
    return jax.lax.Precision[cfg.fast_matmul_precision.upper()]


def estimate_covariances_fast(
    xyz: jax.Array, mask: jax.Array, cfg: RegistrationConfig
) -> apdgicp.PreparedCloud:
    """Layout-optimized GICP covariance estimation (PLANE only).

    Replaces the exact top_k(k) + neighbor gathers with:
    - `lax.approx_min_k` for the k-th neighbor distance (TPU-accelerated;
      kd-trees are approximate too),
    - a 0/1 selection matrix W = (d2 <= kth) so neighbor sums ride the MXU:
      counts = W 1, sum_x = W X, sum_xx = W feats6,
    - component-form covariance + closed-form PLANE regularization.
    """
    from rivslam_tpu.core.pointcloud import SENTINEL

    dtype = xyz.dtype
    prec = _bulk_precision(cfg)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    sent = jnp.where(mask[:, None], xyz, SENTINEL)
    n2 = jnp.sum(sent * sent, axis=1)
    d2 = n2[:, None] + n2[None, :] - 2.0 * jnp.matmul(sent, sent.T, precision=prec)
    k = cfg.k_correspondences
    vals, _ = jax.lax.approx_min_k(d2, k, recall_target=cfg.approx_knn_recall)
    kth = vals[:, -1]
    W = ((d2 <= kth[:, None]) & mask[None, :]).astype(dtype)  # [N, M]
    return _weighted_moments_to_prepared(xyz, mask, W, prec)


def estimate_covariances_rbf_fast(
    xyz: jax.Array, mask: jax.Array, cfg: RegistrationConfig
) -> apdgicp.PreparedCloud:
    """RBF-kernel covariance estimation (PLANE only) — GPU_RBF_KERNEL parity
    (covariance_estimation_rbf.cu:78-160).

    Every point's neighborhood is ALL points weighted by
    w = exp(-kernel_width * d2), zeroed beyond max_dist
    (covariance_estimation_rbf.cu:76-81) — so the whole prepare is the
    distance matrix + one exp + one [N,M]@[M,10] moment matmul. No top-k:
    this removes the approx_min_k pass that dominates the KNN prepare.
    """
    from rivslam_tpu.core.pointcloud import SENTINEL

    dtype = xyz.dtype
    prec = _bulk_precision(cfg)
    sent = jnp.where(mask[:, None], xyz, SENTINEL)
    n2 = jnp.sum(sent * sent, axis=1)
    d2 = n2[:, None] + n2[None, :] - 2.0 * jnp.matmul(sent, sent.T, precision=prec)
    d2 = jnp.maximum(d2, 0.0)
    md2 = cfg.rbf_max_dist * cfg.rbf_max_dist
    # reference quirk: kernel_width is the exponent factor itself (cu:80)
    W = jnp.exp(-cfg.rbf_kernel_width * d2)
    W = jnp.where((d2 <= md2) & mask[None, :], W, 0.0).astype(dtype)
    return _weighted_moments_to_prepared(xyz, mask, W, prec)


def _weighted_moments_to_prepared(
    xyz: jax.Array, mask: jax.Array, W: jax.Array, prec
) -> apdgicp.PreparedCloud:
    """Shared tail: weighted neighbor moments -> covariance -> closed-form
    PLANE regularization (NormalDistribution::finalize,
    covariance_estimation_rbf.cu:46-53: cov = E_w[xx^T] - mean mean^T)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    feats = jnp.stack(
        [jnp.ones_like(x), x, y, z, x * x, x * y, x * z, y * y, y * z, z * z],
        axis=1,
    )  # [M, 10]
    acc = jnp.matmul(W, feats, precision=prec)  # [N, 10] — one MXU pass
    cnt = jnp.maximum(acc[:, 0], 1e-6)
    mx, my, mz = acc[:, 1] / cnt, acc[:, 2] / cnt, acc[:, 3] / cnt
    c00 = acc[:, 4] / cnt - mx * mx
    c01 = acc[:, 5] / cnt - mx * my
    c02 = acc[:, 6] / cnt - mx * mz
    c11 = acc[:, 7] / cnt - my * my
    c12 = acc[:, 8] / cnt - my * mz
    c22 = acc[:, 9] / cnt - mz * mz
    from rivslam_tpu.ops import eig3

    r = eig3.plane_regularize_soa(c00, c01, c02, c11, c12, c22, 1e-3)
    cov = jnp.stack(
        [
            jnp.stack([r[0], r[1], r[2]], axis=-1),
            jnp.stack([r[1], r[3], r[4]], axis=-1),
            jnp.stack([r[2], r[4], r[5]], axis=-1),
        ],
        axis=-2,
    )
    return apdgicp.PreparedCloud(xyz=xyz, mask=mask, cov=cov)


def _soa_cov(cov):
    """[N,3,3] -> 6 component arrays (symmetric)."""
    return (
        cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
        cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2],
    )


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _sym_inv3(m00, m01, m02, m11, m12, m22):
    """Adjugate inverse of a symmetric 3x3 in component form."""
    A = m11 * m22 - m12 * m12
    B = m02 * m12 - m01 * m22
    C = m01 * m12 - m02 * m11
    det = m00 * A + m01 * B + m02 * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    i00 = A * inv_det
    i01 = B * inv_det
    i02 = C * inv_det
    i11 = (m00 * m22 - m02 * m02) * inv_det
    i12 = (m02 * m01 - m00 * m12) * inv_det
    i22 = (m00 * m11 - m01 * m01) * inv_det
    return i00, i01, i02, i11, i12, i22


def _rot_sym_rot_t(R, c00, c01, c02, c11, c12, c22):
    """R C R^T for one traced 3x3 R and symmetric C in component arrays."""
    # row k of R applied to C: (C R^T)_{ij} = sum_l C_il R_jl
    # compute y_k = C @ R[k,:]^T as 3 component arrays, then output
    out = {}
    rows = []
    for k in range(3):
        rk0, rk1, rk2 = R[k, 0], R[k, 1], R[k, 2]
        yk0 = c00 * rk0 + c01 * rk1 + c02 * rk2
        yk1 = c01 * rk0 + c11 * rk1 + c12 * rk2
        yk2 = c02 * rk0 + c12 * rk1 + c22 * rk2
        rows.append((yk0, yk1, yk2))
    # (R C R^T)_{kj} = R[j,:] . y_k
    def dot_row(j, y):
        return R[j, 0] * y[0] + R[j, 1] * y[1] + R[j, 2] * y[2]

    o00 = dot_row(0, rows[0])
    o01 = dot_row(1, rows[0])
    o02 = dot_row(2, rows[0])
    o11 = dot_row(1, rows[1])
    o12 = dot_row(2, rows[1])
    o22 = dot_row(2, rows[2])
    return o00, o01, o02, o11, o12, o22


def _adaptive_cov_soa(px, py, pz, cfg: RegistrationConfig):
    """APD covariance components (fast_apdgicp_impl.hpp:163-184), SoA form.

    C_dist = R diag(s^2) R^T with R = Rz(az) Ry(el); expanded via the basis
    vectors of R: col0 = (ce*ca, ce*sa, -se), col1 = (-sa, ca, 0),
    col2 = (se*ca, se*sa, ce) — where el is measured from +z so
    Ry(el) e_x = (cos el, 0, -sin el).
    """
    d2 = px * px + py * py + pz * pz
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
    rho = jnp.sqrt(jnp.maximum(py * py + pz * pz, 1e-24))
    # cos(AoA) with AoA = atan2(px, sqrt(py^2+pz^2)) -> cos = rho / dist
    cos_aoa = rho / dist
    safe_cos = jnp.maximum(cos_aoa, 1e-6)
    s_x = dist * (cfg.dist_var / 400.0)
    s_y = dist * (math.sin(math.radians(cfg.azimuth_var))) / safe_cos
    s_z = dist * (math.sin(math.radians(cfg.elevation_var))) / safe_cos
    sx2, sy2, sz2 = s_x * s_x, s_y * s_y, s_z * s_z
    # azimuth/elevation direction cosines without trig:
    rxy = jnp.sqrt(jnp.maximum(px * px + py * py, 1e-24))
    ca = px / rxy
    sa = py / rxy
    # elevation = atan2(rxy, pz): sin(el) = rxy/dist, cos(el) = pz/dist
    se = rxy / dist
    ce = pz / dist
    # columns of R
    u0x, u0y, u0z = ce * ca, ce * sa, -se
    u1x, u1y, u1z = -sa, ca, jnp.zeros_like(sa)
    u2x, u2y, u2z = se * ca, se * sa, ce
    c00 = sx2 * u0x * u0x + sy2 * u1x * u1x + sz2 * u2x * u2x
    c01 = sx2 * u0x * u0y + sy2 * u1x * u1y + sz2 * u2x * u2y
    c02 = sx2 * u0x * u0z + sy2 * u1x * u1z + sz2 * u2x * u2z
    c11 = sx2 * u0y * u0y + sy2 * u1y * u1y + sz2 * u2y * u2y
    c12 = sx2 * u0y * u0z + sy2 * u1y * u1z + sz2 * u2y * u2z
    c22 = sx2 * u0z * u0z + sy2 * u1z * u1z + sz2 * u2z * u2z
    return c00, c01, c02, c11, c12, c22


def _masked_sum(x, w):
    return jnp.sum(x * w)


def register_fast(
    source: apdgicp.PreparedCloud,
    target: apdgicp.PreparedCloud,
    guess: jax.Array,
    cfg: RegistrationConfig,
) -> apdgicp.RegistrationResult:
    """Drop-in replacement for apdgicp.register (single problem; vmap for
    batches)."""
    dtype = source.xyz.dtype
    prec = _bulk_precision(cfg)
    T0 = guess.astype(dtype)
    N = source.xyz.shape[0]

    sx0, sy0, sz0 = source.xyz[:, 0], source.xyz[:, 1], source.xyz[:, 2]
    s_c = _soa_cov(source.cov)
    t_c = _soa_cov(target.cov)
    tx_, ty_, tz_ = target.xyz[:, 0], target.xyz[:, 1], target.xyz[:, 2]
    from rivslam_tpu.core.pointcloud import SENTINEL

    tgt_sent = jnp.where(target.mask[:, None], target.xyz, SENTINEL)
    tn2 = jnp.sum(tgt_sent * tgt_sent, axis=1)
    smask_f = source.mask.astype(dtype)

    # target features packed [M, 9] for the one-hot gather matmul:
    # gathers are slow on TPU; selecting the matched target's coordinates and
    # covariance components via onehot @ features rides the MXU instead.
    # (Round-4 A/B on the real v5e: STANDALONE, `jnp.take` rows / top_k are
    # 3-4x faster than the one-hot matmul (0.285 -> 0.071 ms/batch) — but
    # INSIDE the vmapped LM while_loop the same swap collapses the whole
    # bench 4838 -> 3489 fps (take) / 326 fps (top_k): in-loop gathers and
    # sorts break XLA's loop-body fusion on TPU where the 0/1 matmul fuses
    # clean. Keep the matmul; the measurement lives in BENCHMARKS.md.)
    tgt_feats = jnp.stack([tx_, ty_, tz_] + list(t_c), axis=1)  # [M, 9]
    # transposed [9, M] layout for the fused Pallas kernel (lane dim = points)
    tgt_feats_t = jnp.stack([tx_, ty_, tz_] + list(t_c), axis=0)
    m_idx = jnp.arange(target.xyz.shape[0], dtype=jnp.int32)

    # the fused Pallas kernel is compiled for real TPUs; everywhere else
    # (CPU tests, virtual meshes) it runs interpreted for bit-level parity
    pallas_interpret = jax.default_backend() != "tpu"

    def correspondences(T):
        R, t = T[:3, :3], T[:3, 3]
        px = R[0, 0] * sx0 + R[0, 1] * sy0 + R[0, 2] * sz0 + t[0]
        py = R[1, 0] * sx0 + R[1, 1] * sy0 + R[1, 2] * sz0 + t[1]
        pz = R[2, 0] * sx0 + R[2, 1] * sy0 + R[2, 2] * sz0 + t[2]
        p = jnp.stack([px, py, pz], axis=1)
        if cfg.use_pallas_correspondence:
            from rivslam_tpu.ops import pallas_nn

            best, g_t = pallas_nn.fused_gather_pallas(
                p, tgt_sent, target.mask, tgt_feats_t,
                interpret=pallas_interpret,
            )
            idx = jnp.zeros((N,), jnp.int32)  # not needed downstream
            best = best.astype(dtype)
            gathered = g_t.T.astype(dtype)
            corr = source.mask & (best < cfg.max_correspondence_distance**2)
            w = corr.astype(dtype)
        else:
            # NN: cross term on MXU ([N,3]x[3,M]); norms via components
            cross = jnp.matmul(p, tgt_sent.T, precision=prec)
            d2 = (px * px + py * py + pz * pz)[:, None] + tn2[None, :] - 2.0 * cross
            idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
            best = jnp.min(d2, axis=1)
            corr = source.mask & (best < cfg.max_correspondence_distance**2)
            w = corr.astype(dtype)

            # gather target components via one-hot matmul (MXU)
            onehot = (m_idx[None, :] == idx[:, None]).astype(dtype)
            gathered = jnp.matmul(onehot, tgt_feats, precision=prec)  # [N, 9]
        gx, gy, gz = gathered[:, 0], gathered[:, 1], gathered[:, 2]
        b00, b01, b02 = gathered[:, 3], gathered[:, 4], gathered[:, 5]
        b11, b12, b22 = gathered[:, 6], gathered[:, 7], gathered[:, 8]
        # source cov rotated: R A R^T
        a00, a01, a02, a11, a12, a22 = _rot_sym_rot_t(R, *s_c)
        if cfg.method == "FAST_APDGICP":
            d00, d01, d02, d11, d12, d22 = _adaptive_cov_soa(px, py, pz, cfg)
            # (cov_B + cd) + R (cov_A + cd') R^T with cd evaluated at the
            # transformed point both times (reference semantics: same cd)
            e00, e01, e02, e11, e12, e22 = _rot_sym_rot_t(R, d00, d01, d02, d11, d12, d22)
            r00 = b00 + d00 + a00 + e00
            r01 = b01 + d01 + a01 + e01
            r02 = b02 + d02 + a02 + e02
            r11 = b11 + d11 + a11 + e11
            r12 = b12 + d12 + a12 + e12
            r22 = b22 + d22 + a22 + e22
        else:
            r00, r01, r02 = b00 + a00, b01 + a01, b02 + a02
            r11, r12, r22 = b11 + a11, b12 + a12, b22 + a22
        m = _sym_inv3(r00, r01, r02, r11, r12, r22)
        m = tuple(mi * w for mi in m)
        return idx, w, m, (gx, gy, gz), best

    def linearize(T, w, m, g):
        R, t = T[:3, :3], T[:3, 3]
        px = R[0, 0] * sx0 + R[0, 1] * sy0 + R[0, 2] * sz0 + t[0]
        py = R[1, 0] * sx0 + R[1, 1] * sy0 + R[1, 2] * sz0 + t[1]
        pz = R[2, 0] * sx0 + R[2, 1] * sy0 + R[2, 2] * sz0 + t[2]
        gx, gy, gz = g
        ex, ey, ez = gx - px, gy - py, gz - pz
        m00, m01, m02, m11, m12, m22 = m
        # Me
        qx = m00 * ex + m01 * ey + m02 * ez
        qy = m01 * ex + m11 * ey + m12 * ez
        qz = m02 * ex + m12 * ey + m22 * ez
        err = jnp.sum(ex * qx + ey * qy + ez * qz)
        # b: rot = -(p x q), trans = -q
        bx_r, by_r, bz_r = _cross(px, py, pz, qx, qy, qz)
        b = jnp.stack(
            [-jnp.sum(bx_r), -jnp.sum(by_r), -jnp.sum(bz_r),
             -jnp.sum(qx), -jnp.sum(qy), -jnp.sum(qz)]
        )
        # C columns: C[:,j] = p x m_j  (m_j = column j of M)
        c0 = _cross(px, py, pz, m00, m01, m02)
        c1 = _cross(px, py, pz, m01, m11, m12)
        c2 = _cross(px, py, pz, m02, m12, m22)
        # H_rr[:,j] = p x (row j of C); row j of C = (c0[j], c1[j], c2[j])
        h_rr = []
        for j in range(3):
            rj = (c0[j], c1[j], c2[j])
            h_rr.append(_cross(px, py, pz, *rj))
        # assemble 6x6 via masked sums (m already includes w)
        S = lambda x: jnp.sum(x)
        H = jnp.zeros((6, 6), dtype=dtype)
        for j in range(3):
            for i in range(3):
                H = H.at[i, j].set(S(h_rr[j][i]))
        # H_rt = C
        Cm = [[S(c0[0]), S(c1[0]), S(c2[0])],
              [S(c0[1]), S(c1[1]), S(c2[1])],
              [S(c0[2]), S(c1[2]), S(c2[2])]]
        for i in range(3):
            for j in range(3):
                H = H.at[i, 3 + j].set(Cm[i][j])
                H = H.at[3 + j, i].set(Cm[i][j])
        H = H.at[3, 3].set(S(m00)).at[3, 4].set(S(m01)).at[3, 5].set(S(m02))
        H = H.at[4, 3].set(S(m01)).at[4, 4].set(S(m11)).at[4, 5].set(S(m12))
        H = H.at[5, 3].set(S(m02)).at[5, 4].set(S(m12)).at[5, 5].set(S(m22))
        return H, b, err

    def compute_error(T, w, m, g):
        R, t = T[:3, :3], T[:3, 3]
        px = R[0, 0] * sx0 + R[0, 1] * sy0 + R[0, 2] * sz0 + t[0]
        py = R[1, 0] * sx0 + R[1, 1] * sy0 + R[1, 2] * sz0 + t[1]
        pz = R[2, 0] * sx0 + R[2, 1] * sy0 + R[2, 2] * sz0 + t[2]
        gx, gy, gz = g
        ex, ey, ez = gx - px, gy - py, gz - pz
        m00, m01, m02, m11, m12, m22 = m
        return jnp.sum(
            ex * (m00 * ex + m01 * ey + m02 * ez)
            + ey * (m01 * ex + m11 * ey + m12 * ez)
            + ez * (m02 * ex + m12 * ey + m22 * ez)
        )

    # ---- LM driver (identical control flow to apdgicp.register)
    def outer_cond(c):
        T, lam, converged, failed, it, Hf, errf = c
        return (~converged) & (~failed) & (it < cfg.max_iterations)

    def outer_body_gn(c):
        """step_gn (lsq_registration_impl.hpp:107-123): one undamped solve."""
        T, lam, converged, failed, it, Hf, errf = c
        idx, w, m, g, best = correspondences(T)
        H, b, y0 = linearize(T, w, m, g)
        d = jnp.linalg.solve(H, -b[:, None])[:, 0]
        delta = lie.se3_matrix(lie.so3_exp(d[:3]), d[3:])
        T_new = delta @ T
        return (
            T_new, lam, apdgicp._is_converged(delta, cfg), failed, it + 1, H, y0,
        )

    def outer_body(c):
        T, lam, converged, failed, it, Hf, errf = c
        idx, w, m, g, best = correspondences(T)
        H, b, y0 = linearize(T, w, m, g)
        lam = jnp.where(lam < 0, cfg.lm_init_lambda_factor * jnp.max(jnp.abs(jnp.diagonal(H))), lam)

        def inner_cond(ic):
            T_i, lam_i, nu, j, done, success, conv_i, dlast = ic
            return (~done) & (j < cfg.lm_max_iterations)

        def inner_body(ic):
            T_i, lam_i, nu, j, done, success, conv_i, dlast = ic
            d = jnp.linalg.solve(H + lam_i * jnp.eye(6, dtype=dtype), -b[:, None])[:, 0]
            delta = lie.se3_matrix(lie.so3_exp(d[:3]), d[3:])
            T_new = delta @ T
            yi = compute_error(T_new, w, m, g)
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

        init = (T, lam, jnp.asarray(2.0, dtype), 0, jnp.asarray(False),
                jnp.asarray(False), jnp.asarray(False), jnp.eye(4, dtype=dtype))
        T_i, lam_i, nu, j, done, success, conv_i, delta = jax.lax.while_loop(
            inner_cond, inner_body, init
        )
        return (
            T_i, lam_i,
            jnp.where(success, apdgicp._is_converged(delta, cfg), conv_i),
            (~success) & (~conv_i),
            it + 1,
            jnp.where(success, H, Hf),
            jnp.where(success, y0, errf),
        )

    init = (T0, jnp.asarray(-1.0, dtype), jnp.asarray(False), jnp.asarray(False),
            jnp.asarray(0, jnp.int32), jnp.eye(6, dtype=dtype), jnp.asarray(jnp.inf, dtype))
    body = outer_body_gn if cfg.optimizer == "GN" else outer_body
    T, lam, converged, failed, it, Hf, errf = jax.lax.while_loop(outer_cond, body, init)

    idx, w, m, g, best = correspondences(T)
    ncorr = jnp.sum(w)
    fitness = jnp.sum(jnp.where(w > 0, best, 0.0)) / jnp.maximum(ncorr, 1)
    _, _, final_err = linearize(T, w, m, g)
    return apdgicp.RegistrationResult(
        T=T, H=Hf, error=final_err, converged=converged, iterations=it,
        num_correspondences=ncorr.astype(jnp.int32), fitness=fitness,
    )
