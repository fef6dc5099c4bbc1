"""Sliding-window factor-graph optimizer — dense LM on the stacked window.

Re-design of the reference back end's per-frame g2o solve
(radar_graph_slam_nodelet.cpp:389-472: rebuild a 6-frame window graph of
{SE3, velocity, gyro-bias, acc-bias} vertices with bias-RW / relative-SE3 /
unary-pose / IMU-preintegration / velocity / ground edges, then
lm_var_cholmod for up to 512 iterations).

TPU-first formulation: the window is W*(6+3+3+3)=W*15 tangent dims — tiny —
so the sparse block solver becomes ONE dense LM whose Jacobian comes from
jacfwd through the retraction (exact, consistent, no hand-derived blocks;
the reference's hand Jacobians are inconsistent with g2o's VertexSE3 tangent
convention anyway — see factors/residuals.py). Robust kernels are IRLS
weights recomputed per linearization exactly as g2o scales by rho'.
All of it jits; per-edge terms batch over the window axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import BackendConfig
from rivslam_tpu.factors import preintegration as pre
from rivslam_tpu.factors import residuals, robust


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowState:
    """Stacked window of W navigation states."""

    R: jax.Array  # [W,3,3]
    p: jax.Array  # [W,3]
    v: jax.Array  # [W,3]
    bg: jax.Array  # [W,3]
    ba: jax.Array  # [W,3]

    @property
    def window(self) -> int:
        return self.R.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowFactors:
    """All measurements for one window solve. Index i couples frames (i-1, i);
    entries at i=0 or masked frames are ignored."""

    frame_mask: jax.Array  # [W] valid frames
    rel_R: jax.Array  # [W,3,3] measurement R of T_i^-1 T_{i-1}
    rel_p: jax.Array  # [W,3]
    rel_info: jax.Array  # [W,6,6]
    prior_R: jax.Array  # [W,3,3] unary scan-match pose prior (odometry)
    prior_p: jax.Array  # [W,3]
    prior_info: jax.Array  # [W,6,6]
    preint: pre.Preintegration  # stacked [W,...]; entry i integrates (i-1,i)
    preint_info: jax.Array  # [W,9,9]
    vel_meas: jax.Array  # [W,3] world-frame ego velocity
    vel_info: jax.Array  # [W,3] diagonal
    plane_node: jax.Array  # [W,4] fixed world plane coeffs
    plane_meas: jax.Array  # [W,4] measured local plane
    plane_info: jax.Array  # [W] scalar info (1/floor_edge_stddev)
    plane_valid: jax.Array  # [W] ground edge present


def _whiten(r: jax.Array, info: jax.Array) -> tuple[jax.Array, jax.Array]:
    """residual, info -> (whitened residual, chi2). info symmetric PSD."""
    if info.ndim == r.ndim:  # diagonal info
        w = jnp.sqrt(jnp.maximum(info, 0.0)) * r
        return w, jnp.sum(w * w, axis=-1)
    L = jnp.linalg.cholesky(info + 1e-12 * jnp.eye(info.shape[-1], dtype=info.dtype))
    w = jnp.einsum("...ji,...j->...i", L, r)
    return w, jnp.sum(w * w, axis=-1)


def retract(x: WindowState, delta: jax.Array) -> WindowState:
    """delta [W,15] = (theta, dp, dv, dbg, dba); right-multiplicative on R."""
    return WindowState(
        R=x.R @ lie.so3_exp(delta[:, 0:3]),
        p=x.p + delta[:, 3:6],
        v=x.v + delta[:, 6:9],
        bg=x.bg + delta[:, 9:12],
        ba=x.ba + delta[:, 12:15],
    )


def _edge_residuals(x: WindowState, f: WindowFactors, cfg: BackendConfig):
    """All whitened (but not robust-weighted) residual blocks + masks.

    Returns list of (residual [W,d], chi2 [W], mask [W], kernel name, size).
    """
    W = x.window
    prev = lambda a: jnp.roll(a, 1, axis=0)  # index i-1 at slot i
    edge_mask = f.frame_mask & prev(f.frame_mask)
    edge_mask = edge_mask.at[0].set(False)

    # bias random walk (info = I/noise^2 — nodelet:188-191)
    rw_bg = jax.vmap(residuals.bias_rw)(prev(x.bg), x.bg)
    rw_ba = jax.vmap(residuals.bias_rw)(prev(x.ba), x.ba)

    # relative SE3 (measurement T_i^-1 T_{i-1}: "this to prev", nodelet:418)
    rel = jax.vmap(residuals.relative_se3)(x.R, x.p, prev(x.R), prev(x.p), f.rel_R, f.rel_p)

    # unary pose prior
    prior = jax.vmap(residuals.pose_prior)(x.R, x.p, f.prior_R, f.prior_p)

    # IMU preintegration between (i-1, i)
    imu = jax.vmap(residuals.imu_preintegration)(
        prev(x.R), prev(x.p), prev(x.v), prev(x.bg), prev(x.ba), x.R, x.p, x.v, f.preint
    )

    # world-frame velocity prior
    vel = jax.vmap(residuals.velocity_prior)(x.v, f.vel_meas)

    # ground plane
    plane = jax.vmap(residuals.se3_plane)(x.R, x.p, f.plane_node, f.plane_meas)

    return [
        (rw_bg, None, edge_mask, "NONE", 1.0),
        (rw_ba, None, edge_mask, "NONE", 1.0),
        (rel, f.rel_info, edge_mask, cfg.odometry_edge_robust_kernel, cfg.odometry_edge_robust_kernel_size),
        (prior, f.prior_info, edge_mask, cfg.scan_match_prior_robust_kernel, cfg.scan_match_prior_robust_kernel_size),
        (imu, f.preint_info, edge_mask, cfg.integ_edge_robust_kernel, cfg.integ_edge_robust_kernel_size),
        (vel, f.vel_info, edge_mask, "NONE", 1.0),
        (plane, f.plane_info[:, None] * jnp.ones(3, dtype=plane.dtype), edge_mask & f.plane_valid, cfg.floor_edge_robust_kernel, cfg.floor_edge_robust_kernel_size),
    ]


def whiten_cache(f: WindowFactors, bias_info, window: int, dtype):
    """Per-block whitening factors — sqrt for diagonal infos, Cholesky L for
    matrix infos (so whitened r = L^T r, matching _whiten). The infos are
    STATE-INDEPENDENT, but the solver's residual path used to re-factor them
    on every evaluation (3W choleskys x ~13 evals per window solve — pure
    per-iteration latency on tiny serial TPU ops). Build once per solve."""
    bg_info, ba_info = bias_info

    def chol(info):
        return jnp.linalg.cholesky(
            info + 1e-12 * jnp.eye(info.shape[-1], dtype=info.dtype)
        )

    return (
        jnp.full((window, 3), jnp.sqrt(jnp.maximum(bg_info, 0.0)), dtype=dtype),
        jnp.full((window, 3), jnp.sqrt(jnp.maximum(ba_info, 0.0)), dtype=dtype),
        chol(f.rel_info),
        chol(f.prior_info),
        chol(f.preint_info),
        jnp.sqrt(jnp.maximum(f.vel_info, 0.0)),
        jnp.sqrt(jnp.maximum(f.plane_info, 0.0))[:, None]
        * jnp.ones(3, dtype=dtype),
    )


def _apply_whiten(r: jax.Array, c: jax.Array) -> jax.Array:
    """Whiten with a cached factor: elementwise for diag-sqrt entries,
    L^T r for Cholesky entries."""
    if c.ndim == r.ndim:
        return c * r
    return jnp.einsum("...ji,...j->...i", c, r)


def residual_vector(
    x: WindowState,
    f: WindowFactors,
    cfg: BackendConfig,
    bias_info: tuple[float, float],
    kernel_weights: list | None = None,
    cache=None,
) -> tuple[jax.Array, list]:
    """Flat whitened robust-weighted residual vector, plus the kernel weights
    used (so a linearization can freeze them, IRLS-style)."""
    blocks = _edge_residuals(x, f, cfg)
    if cache is None:
        cache = whiten_cache(f, bias_info, x.window, x.p.dtype)
    flat = []
    weights_out = []
    for k, (r, _info, mask, kname, ksize) in enumerate(blocks):
        w = _apply_whiten(r, cache[k])
        chi2 = jnp.sum(w * w, axis=-1)
        if kernel_weights is not None:
            kw = kernel_weights[k]
        else:
            kw = robust.kernel_weight(kname, ksize, chi2)
        weights_out.append(jax.lax.stop_gradient(kw))
        w = w * (jnp.sqrt(kw) * mask.astype(w.dtype))[:, None]
        flat.append(w.reshape(-1))
    return jnp.concatenate(flat), weights_out


def _retract_one(xs, d):
    """Single-frame retraction; xs = (R, p, v, bg, ba), d [15]."""
    R, p, v, bg, ba = xs
    return (
        R @ lie.so3_exp(d[0:3]),
        p + d[3:6],
        v + d[6:9],
        bg + d[9:12],
        ba + d[12:15],
    )


def _slot_blocks(xp, xc, fs):
    """All factor residuals (raw, unwhitened) of ONE window slot i, coupling
    frames (i-1, i).

    Single-slot twin of _edge_residuals (same factor order, same math —
    asserted equal in tests/test_window_solver.py); exists so the Jacobian
    can be taken per 30-dim frame pair instead of the full W*15 retraction.
    """
    (rel_R, rel_p, prior_R, prior_p, preint, vel_meas, plane_node,
     plane_meas) = fs
    Rp, pp, vp, bgp, bap = xp
    Rc, pc, vc, bgc, bac = xc
    return [
        residuals.bias_rw(bgp, bgc),
        residuals.bias_rw(bap, bac),
        residuals.relative_se3(Rc, pc, Rp, pp, rel_R, rel_p),
        residuals.pose_prior(Rc, pc, prior_R, prior_p),
        residuals.imu_preintegration(Rp, pp, vp, bgp, bap, Rc, pc, vc, preint),
        residuals.velocity_prior(vc, vel_meas),
        residuals.se3_plane(Rc, pc, plane_node, plane_meas),
    ]


def linearize_blocks(x: WindowState, f: WindowFactors, cfg: BackendConfig,
                     bias_info, kernel_weights, cache=None):
    """Block-structured linearization of the window problem.

    Every factor couples at most the frame pair (i-1, i), so the Jacobian of
    slot i's 33-dim residual stack lives in a [33, 30] block — jacfwd runs
    over 30 tangent dims per slot (vmapped over W) instead of the full W*15
    retraction, and H assembles as a block-tridiagonal of 15x15 blocks.
    Versus jacfwd over the whole stacked residual (round-2 implementation):
    ~3x fewer residual evaluations at W=6 (31 vs 91 seeds) and each seed
    costs one slot, not the whole window — the window solve was the dominant
    term of the per-frame latency (~12 LM iterations x jacfwd each).

    Returns (H [W15, W15], g [W15], chi2) with IRLS kernel weights FROZEN to
    `kernel_weights` (computed by residual_vector at the linearization
    point), exactly like the previous dense path.
    """
    W = x.window
    dtype = x.p.dtype
    if cache is None:
        cache = whiten_cache(f, bias_info, W, dtype)
    prev = lambda a: jnp.roll(a, 1, axis=0)
    edge_mask = (f.frame_mask & prev(f.frame_mask)).at[0].set(False)
    masks = jnp.stack(
        [edge_mask] * 6 + [edge_mask & f.plane_valid], axis=1
    ).astype(dtype)  # [W, 7]
    kws = jnp.stack(kernel_weights, axis=1)  # [W, 7]
    xp = (prev(x.R), prev(x.p), prev(x.v), prev(x.bg), prev(x.ba))
    xc = (x.R, x.p, x.v, x.bg, x.ba)
    fs = (f.rel_R, f.rel_p, f.prior_R, f.prior_p, f.preint, f.vel_meas,
          f.plane_node, f.plane_meas)

    def slot_r(d, xp1, xc1, fs1, c1, kw1, m1):
        blocks = _slot_blocks(
            _retract_one(xp1, d[:15]), _retract_one(xc1, d[15:]), fs1
        )
        out = []
        for k, r in enumerate(blocks):
            out.append(_apply_whiten(r, c1[k]) * (jnp.sqrt(kw1[k]) * m1[k]))
        return jnp.concatenate(out)

    def slot_rj(xp1, xc1, fs1, c1, kw1, m1):
        z = jnp.zeros(30, dtype=dtype)
        r0 = slot_r(z, xp1, xc1, fs1, c1, kw1, m1)
        J = jax.jacfwd(slot_r)(z, xp1, xc1, fs1, c1, kw1, m1)  # [33, 30]
        return r0, J

    r0, J = jax.vmap(slot_rj)(xp, xc, fs, cache, kws, masks)
    Jp, Jc = J[:, :, :15], J[:, :, 15:]

    # per-pair 15x15 blocks and 15-dim gradients
    Hpp = jnp.einsum("wri,wrj->wij", Jp, Jp)
    Hcc = jnp.einsum("wri,wrj->wij", Jc, Jc)
    Hpc = jnp.einsum("wri,wrj->wij", Jp, Jc)
    gp = jnp.einsum("wri,wr->wi", Jp, r0)
    gc = jnp.einsum("wri,wr->wi", Jc, r0)
    # assemble the block-tridiagonal H by one-hot projection (TPU scatters
    # serialize; these are tiny MXU matmuls): Ec[w] selects column-block w,
    # Ep[w] selects column-block w-1 (slot 0's pair is fully masked upstream
    # so its wrap-around block is zero)
    idx = jnp.arange(W)
    Ec = jnp.eye(W, dtype=dtype)
    Ep = Ec[(idx - 1) % W]  # row w is one-hot at w-1
    H = (
        jnp.einsum("wij,wa,wb->aibj", Hcc, Ec, Ec)
        + jnp.einsum("wij,wa,wb->aibj", Hpp, Ep, Ep)
        + jnp.einsum("wij,wa,wb->aibj", Hpc, Ep, Ec)
        + jnp.einsum("wji,wa,wb->aibj", Hpc, Ec, Ep)
    ).reshape(W * 15, W * 15)
    g = (
        jnp.einsum("wi,wa->ai", gc, Ec) + jnp.einsum("wi,wa->ai", gp, Ep)
    ).reshape(W * 15)
    return H, g, jnp.sum(r0 * r0)


def _damped_solve(A, rhs):
    """Equilibrated Cholesky solve for the damped window system A = H + lam*I
    (SPD: H = J^T J plus a positive diagonal). jnp.linalg.solve lowers to
    row-pivoted LU whose serial pivoting dominated the window solve on TPU
    (profiled: lu + 2 triangular_solves = 0.32 ms/frame at 8 LM iterations);
    the pivot-free Cholesky + 2 triangular solves cuts that ~2x. Jacobi
    equilibration keeps the factorization scale-free across the ~1e6 dynamic
    range between pose and bias blocks. A failed factorization (NaN) flows
    into the LM accept test, which rejects the step and escalates lambda —
    the same recovery path as a rejected finite step."""
    d = jnp.diagonal(A)
    floor = 1e-12 * jnp.max(jnp.abs(d)) + 1e-30
    s = jax.lax.rsqrt(jnp.maximum(jnp.abs(d), floor))
    As = A * s[:, None] * s[None, :]
    L = jnp.linalg.cholesky(As)
    y = jax.lax.linalg.triangular_solve(
        L, (rhs * s)[:, None], left_side=True, lower=True
    )
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[:, 0] * s


def _schur_solve(H, g, lam, W, dtype):
    """Damped solve via Schur elimination of the velocity/bias blocks.

    Tangent order is [W, 15] flattened with per-frame layout
    (theta 3, p 3 | v 3, bg 3, ba 3): eliminate the 9*W "motion" dims, solve
    the 6*W pose system, back-substitute — the reference's
    pose/landmark-style sparse reduction (BASELINE north star) expressed
    densely on the window. Identical solution to the full damped solve.
    """
    idx = jnp.arange(W * 15).reshape(W, 15)
    p_idx = idx[:, :6].reshape(-1)
    r_idx = idx[:, 6:].reshape(-1)
    A = H + lam * jnp.eye(W * 15, dtype=dtype)
    App = A[jnp.ix_(p_idx, p_idx)]
    Apr = A[jnp.ix_(p_idx, r_idx)]
    Arr = A[jnp.ix_(r_idx, r_idx)]
    gp = g[p_idx]
    gr = g[r_idx]
    Arr_inv_gr = jnp.linalg.solve(Arr, gr[:, None])[:, 0]
    Arr_inv_Arp = jnp.linalg.solve(Arr, Apr.T)
    S = App - Apr @ Arr_inv_Arp
    dp = jnp.linalg.solve(S, -(gp - Apr @ Arr_inv_gr)[:, None])[:, 0]
    dr = -Arr_inv_gr - Arr_inv_Arp @ dp
    d = jnp.zeros(W * 15, dtype=dtype).at[p_idx].set(dp).at[r_idx].set(dr)
    return d


def solve_window(
    x0: WindowState,
    f: WindowFactors,
    cfg: BackendConfig,
    bias_info: tuple[float, float],
    use_schur: bool = False,
) -> tuple[WindowState, jax.Array, jax.Array]:
    """LM to convergence (bounded iterations). Returns (state, chi2, iters)."""
    W = x0.window
    dim = W * 15
    dtype = x0.p.dtype

    cache = whiten_cache(f, bias_info, W, dtype)

    def chi2_of(x, kw=None):
        r, _ = residual_vector(x, f, cfg, bias_info, kw, cache=cache)
        return jnp.sum(r * r)

    def linearize(x):
        _, kw = residual_vector(x, f, cfg, bias_info, cache=cache)
        H, g, y0 = linearize_blocks(x, f, cfg, bias_info, kw, cache=cache)
        return H, g, y0, kw

    def cond(carry):
        x, lam, it, done = carry
        return (~done) & (it < cfg.max_solver_iterations)

    def body(carry):
        x, lam, it, done = carry
        H, g, y0, kw = linearize(x)
        lam = jnp.where(lam < 0, 1e-5 * jnp.max(jnp.abs(jnp.diagonal(H))), lam)

        def inner_cond(ic):
            x_i, lam_i, nu, j, idone, success, dmax, y_acc = ic
            return (~idone) & (j < 8)

        def inner_body(ic):
            x_i, lam_i, nu, j, idone, success, dmax, y_acc = ic
            if use_schur:
                d = _schur_solve(H, g, lam_i, W, dtype)
            else:
                A = H + lam_i * jnp.eye(dim, dtype=dtype)
                d = _damped_solve(A, -g)
            x_new = retract(x, d.reshape(W, 15))
            y1 = chi2_of(x_new, kw)
            denom = jnp.dot(d, lam_i * d - g)
            rho = (y0 - y1) / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            accept = (rho > 0) & (y1 < y0)
            lam_new = jnp.where(
                accept,
                lam_i * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                lam_i * nu,
            )
            small = jnp.linalg.norm(d) < 1e-8
            return (
                jax.tree.map(lambda a, b: jnp.where(accept, a, b), x_new, x_i),
                lam_new,
                jnp.where(accept, nu, 2.0 * nu),
                j + 1,
                accept | small,
                accept,
                jnp.where(accept, jnp.max(jnp.abs(d)), dmax),
                jnp.where(accept, y1, y_acc),
            )

        x_i, lam_i, nu, j, idone, success, dmax, y_new = jax.lax.while_loop(
            inner_cond, inner_body,
            (x, lam, jnp.asarray(2.0, dtype), 0, jnp.asarray(False),
             jnp.asarray(False), jnp.asarray(jnp.inf, dtype), y0),
        )
        # y_new is the accepted step's chi2 straight from the inner loop (the
        # previous re-evaluation of the full residual stack here was 8 evals
        # per frame of pure duplicate work)
        # converged on relative chi2 gain OR an accepted step too small to
        # move the f32 state (same STEP_TOL rule the GN path applies) — the
        # LM path previously lacked the step test and pegged at the
        # iteration cap on warm windows whose poses were already fixed
        # (mean_solver_iterations 8.0/8 measured on the TPU latency course)
        converged = success & (
            (jnp.abs(y0 - y_new) < REL_TOL * jnp.maximum(y0, 1.0))
            | (dmax < STEP_TOL)
        )
        return (x_i, lam_i, it + 1, converged | (~success))

    # convergence: relative chi2 gain below _REL_TOL, or an update so small
    # it cannot move the f32 state (max |d| below _STEP_TOL — poses live at
    # ~1-100 m scale, so 1e-6 is below f32 resolution of the state itself).
    # 1e-6 relative chi2 alone is too strict in f32: IRLS reweighting jitters
    # chi2 above it for dozens of no-op iterations (measured live windows:
    # LM 20-45 iters/frame, GN pegged at the 64 cap, with poses identical to
    # a tight 8-iteration cap).
    REL_TOL = 1e-5 if dtype == jnp.float32 else 1e-9
    STEP_TOL = 1e-6

    if cfg.optimizer == "GN":
        # Gauss-Newton: one (near-)undamped step per linearization, no inner
        # lambda search — fewer sequential device steps per window solve. A
        # rejected step (undamped GN can overshoot on a cold or
        # post-failure-reset window) does NOT terminate the solve: damping
        # escalates 100x and the next iteration retries from the same state;
        # it only gives up once damping saturates. Warm per-frame windows
        # accept the first step, so the escalation path costs nothing there.
        LAM_MAX = 1e6

        def gn_body(carry):
            x, lam, it, done = carry
            H, g, y0, kw = linearize(x)
            eps = jnp.maximum(lam, 1e-8) * jnp.maximum(
                jnp.max(jnp.abs(jnp.diagonal(H))), 1.0
            )
            if use_schur:
                d = _schur_solve(H, g, eps, W, dtype)
            else:
                d = _damped_solve(H + eps * jnp.eye(dim, dtype=dtype), -g)
            x_new = retract(x, d.reshape(W, 15))
            y1 = chi2_of(x_new, kw)
            accept = y1 < y0
            x_next = jax.tree.map(lambda a, b: jnp.where(accept, a, b), x_new, x)
            lam_next = jnp.where(accept, jnp.maximum(lam / 10.0, 0.0), jnp.maximum(lam, 1e-8) * 100.0)
            converged = (
                accept & (jnp.abs(y0 - y1) < REL_TOL * jnp.maximum(y0, 1.0))
            ) | (accept & (jnp.max(jnp.abs(d)) < STEP_TOL)) | (
                (~accept) & (lam >= LAM_MAX)
            )
            return (x_next, lam_next, it + 1, converged)

        x_fin, _, iters, _ = jax.lax.while_loop(
            cond, gn_body,
            (x0, jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32), jnp.asarray(False)),
        )
        return x_fin, chi2_of(x_fin), iters

    x_fin, lam, iters, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(-1.0, dtype), jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    return x_fin, chi2_of(x_fin), iters
