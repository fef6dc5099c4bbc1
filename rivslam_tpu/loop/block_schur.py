"""Block-Schur global pose-graph solver — submap-partitioned Schur
complement reduction (BASELINE north star: "sparse Schur-complement
reduction" / "submap-partitioned distributed BA").

Structure:
- keyframes are partitioned into S contiguous blocks (submaps) of size B;
- block-boundary nodes and loop-edge endpoints are SEPARATORS; everything
  else is interior. All cross-block odometry edges land on boundary
  separators by construction; loop edges touch separators only;
- each block eliminates its interior via a masked Schur complement
  (H_II' = D H D + (I - D) keeps shapes static while acting as H_II on
  interior dims and identity on the rest), producing a small contribution to
  the reduced separator system;
- the reduced system (<= (2S + 2L) nodes) is solved densely; interiors
  back-substitute per block.

Outer loop is a **dogleg trust region with accept/reject** — NOT pure
Gauss-Newton. This is load-bearing: on capacity-scale cold graphs (K=512+)
the exact Newton step is a huge rotation overshoot and pure GN
oscillates/diverges (measured: chi2 0.05 at 8 iters -> 2e4 at 12, NaN
later), while lambda-LM creeps (gain ratio ~0.5 pins lambda). Dogleg pays
one elimination per linearization, retries radii cheaply, and recovers the
exact-Newton endgame. Accepted-only steps are monotone by construction, so
the local and sharded paths agree at any scale (the reference's g2o offers
the same LM/dogleg algorithm choices over its solvers, graph_slam.cpp:75-96).

The per-block elimination vmaps over blocks — the same axis maps to devices
with shard_map for multi-host submap partitioning; contributions then
combine by psum exactly like dist/dist_graph.py.

Cross-checked against the PCG solver (loop/global_graph.py) in tests.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.factors import robust
from rivslam_tpu.loop import global_graph as gg


def _equilibrate(A, rhs):
    """Jacobi scaling s = diag(A)^-1/2: solve (sAs)(x/s) = s·rhs. Makes the
    factorization scale-free across the ~1e6+ dynamic range between
    well-constrained blocks and Tikhonov-only slots. The floor is RELATIVE
    to the matrix's own diagonal scale: an absolute floor (1e-30) turns a
    roundoff-negative diagonal entry into s~1e15 and a catastrophically
    mis-scaled row; abs+relative degrades those entries to ~unit scaling."""
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    floor = 1e-12 * jnp.max(jnp.abs(d), axis=-1, keepdims=True) + 1e-30
    s = jax.lax.rsqrt(jnp.maximum(jnp.abs(d), floor))
    As = A * s[..., :, None] * s[..., None, :]
    return As, rhs * s[..., :, None], s


def _spd_solve(A, rhs):
    """Equilibrated Cholesky solve for the batched INTERIOR systems (H_II'
    is a sum of PSD per-edge terms plus Tikhonov + LM damping — no
    cancellation, so it stays comfortably SPD in f32). jnp.linalg.solve
    lowers to row-pivoted LU, which is serial and ~2.5x slower on the TPU's
    MXU than the pivot-free Cholesky + two triangular solves."""
    As, rs, s = _equilibrate(A, rhs)
    L = jnp.linalg.cholesky(As)
    y = jax.lax.linalg.triangular_solve(
        L, rs, left_side=True, lower=True, transpose_a=False
    )
    x = jax.lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x * s[..., :, None]


def _sep_solve(A, rhs):
    """Equilibrated row-pivoted solve for the REDUCED separator system.

    H_sep is assembled from per-block f32 Schur complements
    (H_SS - H_IS^T H_II'^-1 H_IS) whose subtraction roundoff leaves it
    slightly INDEFINITE at scale (measured min eig -1.7e-4 at K=512,
    -4e-4 at K=2048, growing with block size) — an unpivoted Cholesky
    produces NaN there. Pivoted LU is indefinite-safe and solves the
    nearly-PSD system exactly; this is ONE small [6(2S+2L+1)]^2 matrix per
    LM iteration, so the serial pivoting cost is immaterial next to the
    batched interior eliminations (which stay on the fast Cholesky path)."""
    As, rs, s = _equilibrate(A, rhs)
    return jnp.linalg.solve(As, rs) * s[..., :, None]


def _slot_of(node, B, S, num_loop_slots):
    """Global separator slot for a node that IS a separator by the boundary
    rule; -1 if not a boundary node (loop endpoints get their own slots)."""
    blk = node // B
    lo = node % B == 0
    hi = node % B == B - 1
    return jnp.where(lo, 2 * blk, jnp.where(hi, 2 * blk + 1, -1))


def effective_blocks(capacity: int, requested: int) -> int:
    """Largest divisor of ``capacity`` that is <= ``requested``.

    The submap partition needs K % S == 0; a user capacity that the default
    S doesn't divide (e.g. 48 with S=32) must degrade to a coarser valid
    partition, not crash the first global solve mid-run."""
    s = max(1, min(int(requested), int(capacity)))
    while capacity % s:
        s -= 1
    return s


def _graph_chi2(g: gg.PoseGraph, R, p, huber_delta):
    """Full LM objective: robust-weighted edge chi2 + GPS priors + anchor.

    This is the quantity the accept/reject decision must be monotone in —
    it includes every term the step's H/g assembly includes (the edge-only
    chi2 the solvers REPORT omits priors, matching solve_pose_graph)."""
    gcur = dataclasses.replace(g, R=R, p=p)
    ei, ej, Rm, pm, info, mask, is_loop = gg._gather_edges(gcur)
    r = jax.vmap(gg._edge_residual)(R[ei], p[ei], R[ej], p[ej], Rm, pm)
    chi2_e = jnp.einsum("eij,ei,ej->e", info, r, r)
    w = jnp.where(is_loop, robust.kernel_weight("Huber", huber_delta, chi2_e), 1.0)
    w = w * mask.astype(p.dtype)
    chi2 = jnp.sum(chi2_e * w)
    gps_r = (p - g.gps_xyz) * g.gps_mask[:, None].astype(p.dtype)
    chi2 = chi2 + jnp.sum(g.gps_info * gps_r * gps_r)
    anchor_r = jnp.concatenate([lie.so3_log(R[0]), p[0]])
    chi2 = chi2 + anchor_r @ g.anchor_info @ anchor_r
    return chi2


def _linearize_assemble(g: gg.PoseGraph, R, p, S, B, huber_delta):
    """One LM iteration's lambda-INDEPENDENT work: linearize all edges,
    scatter per-block Hessians/gradients, compute separator bookkeeping and
    the full gradient (for the LM gain ratio). Shared verbatim by the local
    and sharded solvers so their math is identical."""
    K = g.R.shape[0]
    L = g.loop_i.shape[0]
    dtype = p.dtype
    P = 2 * S + 2 * L
    node_ids = jnp.arange(K)
    blk_of = node_ids // B

    gcur = dataclasses.replace(g, R=R, p=p)
    ei, ej, Rm, pm, info, mask, is_loop = gg._gather_edges(gcur)
    r, Ji, Jj = jax.vmap(gg._edge_res_and_jac)(R[ei], p[ei], R[ej], p[ej], Rm, pm)
    chi2_e = jnp.einsum("eij,ei,ej->e", info, r, r)
    w = jnp.where(is_loop, robust.kernel_weight("Huber", huber_delta, chi2_e), 1.0)
    w = w * mask.astype(dtype)
    W = info * w[:, None, None]
    chi2_edges = jnp.sum(chi2_e * w)

    # per-edge H blocks and gradients
    Wr = jnp.einsum("eij,ej->ei", W, r)
    g_i = jnp.einsum("eji,ej->ei", Ji, Wr)  # [E,6]
    g_j = jnp.einsum("eji,ej->ei", Jj, Wr)
    H_ii = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Ji)
    H_ij = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Jj)
    H_jj = jnp.einsum("eji,ejk,ekl->eil", Jj, W, Jj)

    # ---- separator bookkeeping
    sep_mask = (node_ids % B == 0) | (node_ids % B == B - 1)
    sep_mask = sep_mask.at[g.loop_i].set(
        sep_mask[g.loop_i] | g.loop_mask
    ).at[g.loop_j].set(sep_mask[g.loop_j] | g.loop_mask)
    slot = _slot_of(node_ids, B, S, 2 * L)
    li_slot = jnp.where(
        _slot_of(g.loop_i, B, S, 2 * L) >= 0,
        _slot_of(g.loop_i, B, S, 2 * L),
        2 * S + 2 * jnp.arange(L),
    )
    lj_slot = jnp.where(
        _slot_of(g.loop_j, B, S, 2 * L) >= 0,
        _slot_of(g.loop_j, B, S, 2 * L),
        2 * S + 2 * jnp.arange(L) + 1,
    )
    slot = slot.at[g.loop_i].set(jnp.where(g.loop_mask, li_slot, slot[g.loop_i]))
    slot = slot.at[g.loop_j].set(jnp.where(g.loop_mask, lj_slot, slot[g.loop_j]))
    slot = jnp.where(sep_mask, jnp.where(slot >= 0, slot, P), P)  # P = dump

    # ---- classify edges: intra-block vs separator-only
    same_block = blk_of[ei] == blk_of[ej]
    intra = same_block & ~is_loop & mask
    sep_edge = mask & ~intra  # cross-block odometry + loop edges

    edge_blk = jnp.where(intra, blk_of[ej], S)  # invalid -> dump block
    loc_i = (ei % B).astype(jnp.int32)
    loc_j = (ej % B).astype(jnp.int32)

    def scatter_block(vals, rows, cols, blkid):
        out = jnp.zeros((S + 1, 6 * B, 6 * B), dtype=dtype)
        ri = (rows * 6)[:, None] + jnp.arange(6)[None, :]
        ci = (cols * 6)[:, None] + jnp.arange(6)[None, :]
        return out.at[
            blkid[:, None, None], ri[:, :, None], ci[:, None, :]
        ].add(vals)[:-1]

    Hb = scatter_block(H_ii, loc_i, loc_i, edge_blk)
    Hb = Hb + scatter_block(H_ij, loc_i, loc_j, edge_blk)
    Hb = Hb + scatter_block(jnp.swapaxes(H_ij, 1, 2), loc_j, loc_i, edge_blk)
    Hb = Hb + scatter_block(H_jj, loc_j, loc_j, edge_blk)
    gb = jnp.zeros((S + 1, 6 * B), dtype=dtype)
    gi_idx = (loc_i * 6)[:, None] + jnp.arange(6)[None, :]
    gj_idx = (loc_j * 6)[:, None] + jnp.arange(6)[None, :]
    gb = gb.at[edge_blk[:, None], gi_idx].add(g_i)
    gb = gb.at[edge_blk[:, None], gj_idx].add(g_j)
    gb = gb[:-1]

    # GPS priors (unary, may be interior): into local blocks
    w_gps = g.gps_info * g.gps_mask[:, None].astype(dtype)  # [K,3]
    gps_r = (p - g.gps_xyz) * g.gps_mask[:, None].astype(dtype)
    loc_n = (node_ids % B).astype(jnp.int32)
    diag_idx = (loc_n * 6)[:, None] + jnp.arange(3)[None, :] + 3  # trans dims
    Hb_flatdiag = jnp.zeros((S, 6 * B), dtype=dtype)
    Hb_flatdiag = Hb_flatdiag.at[blk_of[:, None], diag_idx].add(w_gps)
    Hb = Hb + jax.vmap(jnp.diag)(Hb_flatdiag)
    gb = gb.at[blk_of[:, None], diag_idx].add(w_gps * gps_r)

    # Tikhonov keeps unconstrained dims inert
    Hb = Hb + jnp.eye(6 * B, dtype=dtype) * 1e-6

    sep_local = sep_mask.reshape(S, B)
    D = jnp.repeat(~sep_local, 6, axis=1).astype(dtype)  # [S, 6B]
    slot_local = slot.reshape(S, B)
    sdim = ((slot_local * 6)[:, :, None] + jnp.arange(6)[None, None, :]).reshape(
        S, 6 * B
    )

    # static separator-edge candidates: the S-1 block-crossing chain edges
    # k = B, 2B, ... plus the L loop edges (chain edges occupy [0, K))
    cross_idx = jnp.arange(1, S, dtype=jnp.int32) * B
    loop_idx = K + jnp.arange(L, dtype=jnp.int32)
    cand = jnp.concatenate([cross_idx, loop_idx])
    se_w = sep_edge[cand].astype(dtype)
    si = jnp.where(sep_edge[cand], slot[ei[cand]], P)
    sj = jnp.where(sep_edge[cand], slot[ej[cand]], P)
    sep_terms = dict(
        se_w=se_w,
        di=(si * 6)[:, None] + jnp.arange(6)[None, :],
        dj=(sj * 6)[:, None] + jnp.arange(6)[None, :],
        H_ii=H_ii[cand],
        H_ij=H_ij[cand],
        H_jj=H_jj[cand],
        g_i=g_i[cand],
        g_j=g_j[cand],
    )

    # full gradient in node layout [K,6] (for the LM gain ratio denominator)
    anchor_r = jnp.concatenate([lie.so3_log(R[0]), p[0]])
    g_full = jnp.zeros((K, 6), dtype=dtype).at[ei].add(g_i).at[ej].add(g_j)
    g_full = g_full.at[:, 3:].add(w_gps * gps_r)
    g_full = g_full.at[0].add(g.anchor_info @ anchor_r)

    # full objective = edge chi2 + GPS + anchor (see _graph_chi2)
    chi2_full = (
        chi2_edges
        + jnp.sum(g.gps_info * gps_r * gps_r)
        + anchor_r @ g.anchor_info @ anchor_r
    )

    return dict(
        Hb=Hb, gb=gb, D=D, sdim=sdim, sep=sep_terms,
        anchor_r=anchor_r, g_full=g_full, chi2=chi2_full,
        # per-edge linearization products for the trust-region model's cheap
        # Hessian-vector products (gg._hvp form)
        ei=ei, ej=ej, Ji=Ji, Jj=Jj, W=W,
    )


def _finish_sep_system(g, lin, H_sep, g_sep, Pdim, dtype):
    """Add separator-only edge terms and the anchor prior to the reduced
    system. LM damping does NOT reappear here: every real dim lives in
    exactly one block's Hb (separator dims flow through H_SS), so damping
    Hb's diagonal already damped the full system; this adds only the tiny
    Tikhonov that keeps the dump/unused slots inert."""
    s = lin["sep"]
    di, dj, se_w = s["di"], s["dj"], s["se_w"]
    H_sep = H_sep.at[di[:, :, None], di[:, None, :]].add(s["H_ii"] * se_w[:, None, None])
    H_sep = H_sep.at[di[:, :, None], dj[:, None, :]].add(s["H_ij"] * se_w[:, None, None])
    H_sep = H_sep.at[dj[:, :, None], di[:, None, :]].add(
        jnp.swapaxes(s["H_ij"], 1, 2) * se_w[:, None, None]
    )
    H_sep = H_sep.at[dj[:, :, None], dj[:, None, :]].add(s["H_jj"] * se_w[:, None, None])
    g_sep = g_sep.at[di].add(s["g_i"] * se_w[:, None]).at[dj].add(s["g_j"] * se_w[:, None])
    # anchor on node 0 (slot 0 — node 0 is a boundary separator)
    H_sep = H_sep.at[:6, :6].add(g.anchor_info)
    g_sep = g_sep.at[:6].add(g.anchor_info @ lin["anchor_r"])
    # inert dump slot + unused slots
    H_sep = H_sep + jnp.eye(Pdim, dtype=dtype) * 1e-6
    return H_sep, g_sep


def _eliminate_local(Hb_d, gb, D, sdim, Pdim, dtype):
    """Masked interior elimination over all blocks (vmapped einsums)."""
    Dm = D[:, :, None] * D[:, None, :]
    H_II = Hb_d * Dm + jax.vmap(jnp.diag)(1.0 - D)
    H_IS = Hb_d * (D[:, :, None] * (1.0 - D)[:, None, :])
    H_SS = Hb_d * ((1.0 - D)[:, :, None] * (1.0 - D)[:, None, :])
    g_I = gb * D
    g_S = gb * (1.0 - D)
    X = _spd_solve(H_II, jnp.concatenate([H_IS, g_I[:, :, None]], axis=2))
    HII_inv_HIS = X[:, :, :-1]
    HII_inv_gI = X[:, :, -1]
    S_blk = H_SS - jnp.einsum("sij,sik->sjk", H_IS, HII_inv_HIS)
    g_blk = g_S - jnp.einsum("sij,si->sj", H_IS, HII_inv_gI)
    # one-hot projection instead of colliding scatter-add: every interior
    # dim of every block would collide at the dump slot and serialize XLA's
    # scatter (~700 ms of the round-1 837 ms solve); Q^T S Q rides the MXU.
    # Round-5 re-audit: a COLLISION-FREE scatter (unique per-(block,dim)
    # dump columns past Pdim, exploiting that S_blk is nonzero only on
    # separator x separator dims) was built and measured — no better on
    # XLA:CPU (80 vs 87 ms of a 184 ms x6 elimination) and 5x WORSE on the
    # v5e (1500-kf solve 531 vs 104 ms): TPU scatters stay serial even
    # with unique_indices. The MXU projection stands.
    Q = (sdim[:, :, None] == jnp.arange(Pdim)[None, None, :]).astype(dtype)
    H_sep = jnp.einsum("sla,slm,smb->ab", Q, S_blk, Q)
    g_sep = jnp.einsum("sla,sl->a", Q, g_blk)
    return H_sep, g_sep, HII_inv_HIS, HII_inv_gI


def _back_substitute(HII_inv_HIS, HII_inv_gI, d_sep, sdim, D):
    d_S_local = d_sep[sdim]
    d_I = -HII_inv_gI - jnp.einsum("sij,sj->si", HII_inv_HIS, d_S_local)
    return d_I * D + d_S_local * (1.0 - D)


def _dogleg_combine(d_n, d_sd, delta):
    """Powell dogleg point for trust radius delta: full Newton if it fits,
    scaled steepest descent if even the Cauchy point doesn't, else the
    boundary intersection of the Cauchy->Newton segment."""
    nn = jnp.linalg.norm(d_n)
    ns = jnp.linalg.norm(d_sd)
    d_capped_sd = d_sd * (delta / jnp.maximum(ns, 1e-30))
    diff = d_n - d_sd
    a = jnp.dot(diff, diff)
    b = 2.0 * jnp.dot(d_sd, diff)
    c = jnp.dot(d_sd, d_sd) - delta * delta
    disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
    beta = (-b + jnp.sqrt(disc)) / jnp.maximum(2.0 * a, 1e-30)
    d_interp = d_sd + jnp.clip(beta, 0.0, 1.0) * diff
    return jnp.where(nn <= delta, d_n, jnp.where(ns >= delta, d_capped_sd, d_interp))


def _make_tr_step(g, S, B, P, Pdim, dtype, huber_delta, newton_fn):
    """One dogleg trust-region iteration, shared by the local and sharded
    solvers (only `newton_fn` — the block elimination — differs).

    Why trust region and not plain GN or lambda-LM: on capacity-scale cold
    graphs (K=512 drifted loop) the exact Newton step is a ~22 rad rotation
    overshoot — pure GN oscillates/diverges (measured chi2 0.05 -> 2e4
    between iterations 8 and 12), and lambda-LM creeps because the gain
    ratio hovers ~0.5 so lambda never decays (measured: chi2 256 after 12
    iterations vs PCG's 2.5). Dogleg pays ONE elimination per linearization,
    rejected radii reuse the Newton direction (only a cheap chi2 eval +
    edge-wise Hvp per retry), and the full Newton step — which polishes the
    basin to grad ~1e-8 in 2 iterations — is taken automatically as soon as
    it fits the radius. Matches g2o's OptimizationAlgorithmDogleg option for
    the same solver family the reference builds on."""
    K = g.R.shape[0]

    def tr_step(carry, _):
        R, p, delta = carry
        lin = _linearize_assemble(g, R, p, S, B, huber_delta)
        chi2_cur = lin["chi2"]
        gflat = lin["g_full"].reshape(-1)
        d_n = newton_fn(lin).reshape(-1)
        d_n = jnp.where(jnp.all(jnp.isfinite(d_n)), d_n, -gflat)
        gcur = dataclasses.replace(g, R=R, p=p)

        def hvp(v):
            return gg._hvp(
                gcur, lin["ei"], lin["ej"], lin["Ji"], lin["Jj"], lin["W"],
                v.reshape(K, 6),
            ).reshape(-1)

        Hg = hvp(gflat)
        alpha = jnp.dot(gflat, gflat) / jnp.maximum(jnp.dot(gflat, Hg), 1e-30)
        d_sd = -alpha * gflat

        def cond(st):
            _, acc, _, _, _, tries = st
            return (~acc) & (tries < 8)

        def body(st):
            delta_i, acc, d_acc, chi2_acc, rho_acc, tries = st
            d = _dogleg_combine(d_n, d_sd, delta_i)
            pred = -(jnp.dot(gflat, d) + 0.5 * jnp.dot(d, hvp(d)))
            dm = d.reshape(K, 6)
            chi2_new = _graph_chi2(
                g, R @ lie.so3_exp(dm[:, :3]), p + dm[:, 3:], huber_delta
            )
            rho = (chi2_cur - chi2_new) / jnp.maximum(pred, 1e-30)
            ok = (chi2_new < chi2_cur) & (pred > 0) & jnp.isfinite(chi2_new)
            return (
                jnp.where(ok, delta_i, delta_i * 0.25),
                ok,
                jnp.where(ok, d, d_acc),
                jnp.where(ok, chi2_new, chi2_acc),
                jnp.where(ok, rho, rho_acc),
                tries + 1,
            )

        init = (
            delta,
            jnp.asarray(False),
            jnp.zeros_like(gflat),
            chi2_cur,
            jnp.asarray(0.0, dtype),
            jnp.asarray(0, jnp.int32),
        )
        delta_f, acc, d_acc, _, rho, _ = jax.lax.while_loop(cond, body, init)
        dnorm = jnp.linalg.norm(d_acc)
        delta_out = jnp.where(
            acc & (rho > 0.75), jnp.maximum(delta_f, 3.0 * dnorm), delta_f
        )
        dm = d_acc.reshape(K, 6)
        R_next = jnp.where(acc, R @ lie.so3_exp(dm[:, :3]), R)
        p_next = jnp.where(acc, p + dm[:, 3:], p)
        return (R_next, p_next, delta_out), chi2_cur

    return tr_step


@partial(jax.jit, static_argnames=("num_blocks", "gn_iters", "huber_delta"))
def solve_pose_graph_schur(
    g: gg.PoseGraph,
    num_blocks: int = 8,
    gn_iters: int = 8,
    huber_delta: float = 1.0,
):
    """Dogleg trust-region with per-iteration block-Schur elimination
    (see _make_tr_step for why trust region, not pure GN or lambda-LM).

    Forces float32 matmul precision: TPU default (bfloat16 passes) makes the
    interior-block inverse H_II^-1 and the reduced separator system blow up
    to NaN on real graphs — elimination chains condition numbers in a way
    the iterative PCG path tolerates but direct factorization does not.
    """
    num_blocks = effective_blocks(g.R.shape[0], num_blocks)
    with jax.default_matmul_precision("float32"):
        return _schur_impl(g, num_blocks, gn_iters, huber_delta)


def _schur_impl(g, num_blocks, gn_iters, huber_delta):
    K = g.R.shape[0]
    L = g.loop_i.shape[0]
    S = num_blocks
    assert K % S == 0, "keyframe capacity must divide into blocks"
    B = K // S
    dtype = g.p.dtype
    P = 2 * S + 2 * L
    Pdim = 6 * (P + 1)

    def newton_local(lin):
        H_sep, g_sep, HII_inv_HIS, HII_inv_gI = _eliminate_local(
            lin["Hb"], lin["gb"], lin["D"], lin["sdim"], Pdim, dtype
        )
        H_sep, g_sep = _finish_sep_system(g, lin, H_sep, g_sep, Pdim, dtype)
        d_sep = _sep_solve(H_sep, -g_sep[:, None])[:, 0]
        d_sep = d_sep.at[6 * P:].set(0.0)  # dump slot contributes nothing
        return _back_substitute(
            HII_inv_HIS, HII_inv_gI, d_sep, lin["sdim"], lin["D"]
        ).reshape(K, 6)

    tr_step = _make_tr_step(g, S, B, P, Pdim, dtype, huber_delta, newton_local)
    (R_fin, p_fin, _), chi2s = jax.lax.scan(
        tr_step, (g.R, g.p, jnp.asarray(1.0, dtype)), None, length=gn_iters
    )
    g_out = dataclasses.replace(g, R=R_fin, p=p_fin)
    _, _, _, _, _, _, chi2_fin = gg.linearize(g_out, huber_delta)
    return g_out, chi2_fin


def solve_pose_graph_schur_sharded(
    g: gg.PoseGraph,
    mesh,
    axis: str = "model",
    num_blocks: int = 16,
    gn_iters: int = 8,
    huber_delta: float = 1.0,
):
    """Distributed block-Schur BA — the WHOLE solve runs as one SPMD program
    (a single shard_map over `axis`), not a replicated outer loop calling a
    sharded elimination.

    Partitioning: device d owns the contiguous submap blocks
    [d·S/n, (d+1)·S/n) — i.e. a contiguous keyframe range and the contiguous
    slice of chain edges ending in it. Per device and per dogleg iteration,
    ONLY the owned shard is computed: edge linearization, per-block Hessian
    assembly, interior Schur elimination (the dominant cost), the
    accept/reject chi2 re-evaluations, and back-substitution all scale 1/n.
    Replicated leftovers are tiny by construction: loop-edge linearization
    (L edges), the reduced separator solve ([6(2S+2L+1)]^2), and the dogleg
    bookkeeping. Communication per iteration: one psum of the reduced system
    (the dominant payload, measured in eval/scaling.py), one [K,6] gradient
    psum, one [K,6] step all_gather, and a handful of scalar psums for the
    trust-region chi2/curvature tests — all ICI-friendly.

    The round-4 form kept linearization/assembly/chi2 retries replicated in
    the outer jit (so per-device work never shrank) and computed the final
    chi2 EAGERLY outside the jit (op-by-op dispatch on mesh-committed
    arrays: measured ~260-400 ms of the 488-1023 ms round-4 solve times).
    Both are gone: one program, everything inside.

    float32 matmul precision is forced for the same conditioning reason as
    solve_pose_graph_schur. Math matches the local solver step-for-step
    (same residuals, same dogleg rules, same damping); sums are reassociated
    across devices, so the two agree to f32 reduction-order noise — asserted
    at convergence in tests/test_block_schur.py.
    """
    K = g.R.shape[0]
    L = g.loop_i.shape[0]
    S = num_blocks
    n_dev = mesh.shape[axis]
    if K % S != 0 or S % n_dev != 0:
        raise ValueError(
            f"sharded block-Schur needs keyframe_capacity ({K}) divisible by "
            f"num_blocks ({S}) and num_blocks divisible by the mesh axis "
            f"({n_dev}); pick num_blocks with block_schur.effective_blocks"
        )
    run = _sharded_schur_fn(
        mesh, axis, K, L, S, gn_iters, huber_delta, jnp.dtype(g.p.dtype).name
    )
    with jax.default_matmul_precision("float32"):
        R_fin, p_fin, chi2_fin = run(
            g.R, g.p, g.node_mask, g.odom_rel_R, g.odom_rel_p, g.odom_info,
            g.loop_i, g.loop_j, g.loop_rel_R, g.loop_rel_p, g.loop_info,
            g.loop_mask, g.anchor_info, g.gps_xyz, g.gps_info, g.gps_mask,
        )
    return dataclasses.replace(g, R=R_fin, p=p_fin), chi2_fin


def _edge_terms(R, p, ei, ej, Rm, pm, info, mask, is_loop, huber_delta):
    """Per-edge linearization products for one edge set: residual, Jacobians,
    robust-weighted info, gradient and Hessian blocks, weighted chi2 sum.
    Shared by the SPMD solver's chain-shard and loop-edge paths so both use
    exactly the local solver's math."""
    dtype = p.dtype
    r, Ji, Jj = jax.vmap(gg._edge_res_and_jac)(R[ei], p[ei], R[ej], p[ej], Rm, pm)
    chi2_e = jnp.einsum("eij,ei,ej->e", info, r, r)
    w = jnp.where(is_loop, robust.kernel_weight("Huber", huber_delta, chi2_e), 1.0)
    w = w * mask.astype(dtype)
    W = info * w[:, None, None]
    Wr = jnp.einsum("eij,ej->ei", W, r)
    return dict(
        r=r, Ji=Ji, Jj=Jj, W=W,
        chi2=jnp.sum(chi2_e * w),
        gi=jnp.einsum("eji,ej->ei", Ji, Wr),
        gj=jnp.einsum("eji,ej->ei", Jj, Wr),
        Hii=jnp.einsum("eji,ejk,ekl->eil", Ji, W, Ji),
        Hij=jnp.einsum("eji,ejk,ekl->eil", Ji, W, Jj),
        Hjj=jnp.einsum("eji,ejk,ekl->eil", Jj, W, Jj),
    )


def _edge_chi2(R, p, ei, ej, Rm, pm, info, mask, is_loop, huber_delta):
    """Robust-weighted chi2 of one edge set (no Jacobians — the cheap form
    the dogleg retry loop evaluates)."""
    r = jax.vmap(gg._edge_residual)(R[ei], p[ei], R[ej], p[ej], Rm, pm)
    chi2_e = jnp.einsum("eij,ei,ej->e", info, r, r)
    w = jnp.where(is_loop, robust.kernel_weight("Huber", huber_delta, chi2_e), 1.0)
    return jnp.sum(chi2_e * w * mask.astype(p.dtype))


def _edge_quad(Ji, Jj, W, vi, vj):
    """sum_e (J_i v_i + J_j v_j)^T W (J_i v_i + J_j v_j) — the per-edge-set
    contribution to v^T H v for the dogleg model decrease."""
    Jv = jnp.einsum("eij,ej->ei", Ji, vi) + jnp.einsum("eij,ej->ei", Jj, vj)
    return jnp.sum(Jv * jnp.einsum("eij,ej->ei", W, Jv))


def _assemble_chain_blocks(ch, loc_i, loc_j, edge_blk, Sn, B, dtype):
    """Scatter per-edge Hessian/gradient blocks into [Sn, 6B, 6B] / [Sn, 6B]
    submap blocks (edge_blk == Sn is the dump slot for non-intra edges).
    Module-level so eval/scaling.py can microbench the per-device assembly
    phase at each shard size."""

    def scatter_block(vals, rows, cols, blkid):
        out = jnp.zeros((Sn + 1, 6 * B, 6 * B), dtype=dtype)
        ri = (rows * 6)[:, None] + jnp.arange(6)[None, :]
        ci = (cols * 6)[:, None] + jnp.arange(6)[None, :]
        return out.at[
            blkid[:, None, None], ri[:, :, None], ci[:, None, :]
        ].add(vals)[:-1]

    Hb = scatter_block(ch["Hii"], loc_i, loc_i, edge_blk)
    Hb = Hb + scatter_block(ch["Hij"], loc_i, loc_j, edge_blk)
    Hb = Hb + scatter_block(jnp.swapaxes(ch["Hij"], 1, 2), loc_j, loc_i, edge_blk)
    Hb = Hb + scatter_block(ch["Hjj"], loc_j, loc_j, edge_blk)
    gb = jnp.zeros((Sn + 1, 6 * B), dtype=dtype)
    gi_idx = (loc_i * 6)[:, None] + jnp.arange(6)[None, :]
    gj_idx = (loc_j * 6)[:, None] + jnp.arange(6)[None, :]
    gb = gb.at[edge_blk[:, None], gi_idx].add(ch["gi"])
    gb = gb.at[edge_blk[:, None], gj_idx].add(ch["gj"])
    return Hb, gb[:-1]


@lru_cache(maxsize=None)
def _sharded_schur_fn(
    mesh, axis: str, K: int, L: int, S: int, gn_iters: int,
    huber_delta: float, dtype_name: str,
):
    """Memoized jitted SPMD program for the sharded solve (graph fields are
    traced arguments, so one compiled program serves every graph of this
    capacity). See solve_pose_graph_schur_sharded for the partitioning."""
    from jax.sharding import PartitionSpec as P_

    dtype = jnp.dtype(dtype_name)
    n = mesh.shape[axis]
    B = K // S          # nodes per block
    Sn = S // n         # blocks per device
    Kn = K // n         # nodes (and chain-edge slots) per device
    P = 2 * S + 2 * L
    Pdim = 6 * (P + 1)

    sharded = P_(axis)
    repl = P_()

    @jax.jit
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            repl, repl, repl,                 # R0, p0, node_mask
            sharded, sharded, sharded,        # odom_rel_R/p, odom_info
            repl, repl, repl, repl, repl, repl,  # loop_i/j, loop_rel_R/p, loop_info, loop_mask
            repl,                             # anchor_info
            sharded, sharded, sharded,        # gps_xyz, gps_info, gps_mask
        ),
        out_specs=(repl, repl, repl),
        check_vma=False,
    )
    def run(R0, p0, node_mask, rel_R_s, rel_p_s, info_s,
            loop_i, loop_j, loop_rel_R, loop_rel_p, loop_info, loop_mask,
            anchor_info, gps_xyz_s, gps_info_s, gps_mask_s):
        dev = jax.lax.axis_index(axis)
        base = dev * Kn  # first global node / chain-edge index of this shard

        # ---- static-per-solve bookkeeping (scan-invariant) --------------
        # local chain-edge slice: global edge j connects (j-1, j)
        jl = jnp.arange(Kn)
        jg = base + jl
        ei_g = jnp.maximum(jg - 1, 0).astype(jnp.int32)
        ej_g = jg.astype(jnp.int32)
        emask = node_mask[ei_g] & node_mask[ej_g] & (jg > 0)
        cross = jg % B == 0  # block-crossing chain edge (j=0 is the dummy)
        intra = emask & ~cross
        edge_blk = jnp.where(intra, jg // B - dev * Sn, Sn)  # dump slot = Sn
        loc_i = (ei_g % B).astype(jnp.int32)
        loc_j = (ej_g % B).astype(jnp.int32)
        zeros_e = jnp.zeros(Kn, bool)
        zeros_l = jnp.zeros(L, bool)

        # separator classification / slots (global, replicated int work)
        node_ids = jnp.arange(K)
        sep_mask = (node_ids % B == 0) | (node_ids % B == B - 1)
        sep_mask = sep_mask.at[loop_i].set(
            sep_mask[loop_i] | loop_mask
        ).at[loop_j].set(sep_mask[loop_j] | loop_mask)
        slot = _slot_of(node_ids, B, S, 2 * L)
        li_slot = jnp.where(
            _slot_of(loop_i, B, S, 2 * L) >= 0,
            _slot_of(loop_i, B, S, 2 * L),
            2 * S + 2 * jnp.arange(L),
        )
        lj_slot = jnp.where(
            _slot_of(loop_j, B, S, 2 * L) >= 0,
            _slot_of(loop_j, B, S, 2 * L),
            2 * S + 2 * jnp.arange(L) + 1,
        )
        slot = slot.at[loop_i].set(jnp.where(loop_mask, li_slot, slot[loop_i]))
        slot = slot.at[loop_j].set(jnp.where(loop_mask, lj_slot, slot[loop_j]))
        slot = jnp.where(sep_mask, jnp.where(slot >= 0, slot, P), P)

        # local views of the separator structure (device's Sn blocks)
        sep_local = jax.lax.dynamic_slice_in_dim(sep_mask, base, Kn).reshape(Sn, B)
        D = jnp.repeat(~sep_local, 6, axis=1).astype(dtype)  # [Sn, 6B]
        slot_local = jax.lax.dynamic_slice_in_dim(slot, base, Kn).reshape(Sn, B)
        sdim = (
            (slot_local * 6)[:, :, None] + jnp.arange(6)[None, None, :]
        ).reshape(Sn, 6 * B)

        # local separator-edge candidates: the device's block-crossing chain
        # edges (each lives in exactly ONE device's slice, so scattering them
        # pre-psum counts each once); loop edges are added replicated later.
        cre = jnp.arange(Sn) * B  # local indices of cross candidates
        cross_w = (emask[cre] & cross[cre]).astype(dtype)
        cross_si = jnp.where(cross_w > 0, slot[ei_g[cre]], P)
        cross_sj = jnp.where(cross_w > 0, slot[ej_g[cre]], P)
        cross_di = (cross_si * 6)[:, None] + jnp.arange(6)[None, :]
        cross_dj = (cross_sj * 6)[:, None] + jnp.arange(6)[None, :]

        # GPS prior locals
        gps_rows = base + jnp.arange(Kn)  # global rows of this device's nodes
        gps_blk = jl // B
        gps_diag_idx = ((jl % B) * 6)[:, None] + jnp.arange(3)[None, :] + 3

        li_slot6 = jnp.where(loop_mask, li_slot, P)
        lj_slot6 = jnp.where(loop_mask, lj_slot, P)
        loop_di = (li_slot6 * 6)[:, None] + jnp.arange(6)[None, :]
        loop_dj = (lj_slot6 * 6)[:, None] + jnp.arange(6)[None, :]

        def w_gps():
            return gps_info_s * gps_mask_s[:, None].astype(dtype)

        def chi2_full(R, p):
            """Full accept/reject objective: edges + GPS + anchor (matches
            the local _graph_chi2 term-for-term)."""
            c_loc = _edge_chi2(
                R, p, ei_g, ej_g, rel_R_s, rel_p_s, info_s, emask, zeros_e,
                huber_delta,
            )
            p_loc = jax.lax.dynamic_slice_in_dim(p, base, Kn)
            gps_r = (p_loc - gps_xyz_s) * gps_mask_s[:, None].astype(dtype)
            c_loc = c_loc + jnp.sum(gps_info_s * gps_r * gps_r)
            c = jax.lax.psum(c_loc, axis)
            c = c + _edge_chi2(
                R, p, loop_i, loop_j, loop_rel_R, loop_rel_p, loop_info,
                loop_mask, ~zeros_l, huber_delta,
            )
            anchor_r = jnp.concatenate([lie.so3_log(R[0]), p[0]])
            return c + anchor_r @ anchor_info @ anchor_r

        def quad(ch, lp, v):
            """v^T H v over the full damped system (for pred/alpha)."""
            t_loc = _edge_quad(ch["Ji"], ch["Jj"], ch["W"], v[ei_g], v[ej_g])
            v_loc = jax.lax.dynamic_slice_in_dim(v, base, Kn)
            t_loc = t_loc + jnp.sum(w_gps() * v_loc[:, 3:] * v_loc[:, 3:])
            t = jax.lax.psum(t_loc, axis)
            t = t + _edge_quad(lp["Ji"], lp["Jj"], lp["W"], v[loop_i], v[loop_j])
            return t + v[0] @ anchor_info @ v[0] + 1e-6 * jnp.sum(v * v)

        def tr_step(carry, _):
            R, p, delta = carry

            # ---- linearize: local chain shard + replicated loop edges ----
            ch = _edge_terms(
                R, p, ei_g, ej_g, rel_R_s, rel_p_s, info_s, emask, zeros_e,
                huber_delta,
            )
            lp = _edge_terms(
                R, p, loop_i, loop_j, loop_rel_R, loop_rel_p, loop_info,
                loop_mask, ~zeros_l, huber_delta,
            )
            p_loc = jax.lax.dynamic_slice_in_dim(p, base, Kn)
            gps_r = (p_loc - gps_xyz_s) * gps_mask_s[:, None].astype(dtype)
            anchor_r = jnp.concatenate([lie.so3_log(R[0]), p[0]])
            chi2_cur = (
                jax.lax.psum(ch["chi2"] + jnp.sum(gps_info_s * gps_r * gps_r), axis)
                + lp["chi2"]
                + anchor_r @ anchor_info @ anchor_r
            )

            # ---- full gradient (replicated after psum) -------------------
            g_full = (
                jnp.zeros((K, 6), dtype=dtype)
                .at[ei_g].add(ch["gi"]).at[ej_g].add(ch["gj"])
                .at[gps_rows, 3:].add(w_gps() * gps_r)
            )
            g_full = jax.lax.psum(g_full, axis)
            g_full = g_full.at[loop_i].add(lp["gi"]).at[loop_j].add(lp["gj"])
            g_full = g_full.at[0].add(anchor_info @ anchor_r)
            gflat = g_full.reshape(-1)

            # ---- per-device block assembly ------------------------------
            Hb, gb = _assemble_chain_blocks(
                ch, loc_i, loc_j, edge_blk, Sn, B, dtype
            )
            Hb_flatdiag = jnp.zeros((Sn, 6 * B), dtype=dtype)
            Hb_flatdiag = Hb_flatdiag.at[gps_blk[:, None], gps_diag_idx].add(w_gps())
            Hb = Hb + jax.vmap(jnp.diag)(Hb_flatdiag)
            gb = gb.at[gps_blk[:, None], gps_diag_idx].add(w_gps() * gps_r)
            Hb = Hb + jnp.eye(6 * B, dtype=dtype) * 1e-6

            # ---- Newton step: eliminate local blocks, psum, solve, back --
            H_sep, g_sep, HII_inv_HIS, HII_inv_gI = _eliminate_local(
                Hb, gb, D, sdim, Pdim, dtype
            )
            # local cross-block chain edges into the reduced system (pre-psum
            # — each lives in exactly one shard)
            cw = cross_w[:, None, None]
            H_sep = H_sep.at[cross_di[:, :, None], cross_di[:, None, :]].add(
                ch["Hii"][cre] * cw
            )
            H_sep = H_sep.at[cross_di[:, :, None], cross_dj[:, None, :]].add(
                ch["Hij"][cre] * cw
            )
            H_sep = H_sep.at[cross_dj[:, :, None], cross_di[:, None, :]].add(
                jnp.swapaxes(ch["Hij"][cre], 1, 2) * cw
            )
            H_sep = H_sep.at[cross_dj[:, :, None], cross_dj[:, None, :]].add(
                ch["Hjj"][cre] * cw
            )
            g_sep = g_sep.at[cross_di].add(ch["gi"][cre] * cross_w[:, None])
            g_sep = g_sep.at[cross_dj].add(ch["gj"][cre] * cross_w[:, None])
            H_sep = jax.lax.psum(H_sep, axis)
            g_sep = jax.lax.psum(g_sep, axis)
            # replicated finish: loop edges + anchor + inert-slot Tikhonov
            lw = loop_mask.astype(dtype)[:, None, None]
            H_sep = H_sep.at[loop_di[:, :, None], loop_di[:, None, :]].add(
                lp["Hii"] * lw
            )
            H_sep = H_sep.at[loop_di[:, :, None], loop_dj[:, None, :]].add(
                lp["Hij"] * lw
            )
            H_sep = H_sep.at[loop_dj[:, :, None], loop_di[:, None, :]].add(
                jnp.swapaxes(lp["Hij"], 1, 2) * lw
            )
            H_sep = H_sep.at[loop_dj[:, :, None], loop_dj[:, None, :]].add(
                lp["Hjj"] * lw
            )
            g_sep = g_sep.at[loop_di].add(lp["gi"] * lw[:, :, 0])
            g_sep = g_sep.at[loop_dj].add(lp["gj"] * lw[:, :, 0])
            H_sep = H_sep.at[:6, :6].add(anchor_info)
            g_sep = g_sep.at[:6].add(anchor_info @ anchor_r)
            H_sep = H_sep + jnp.eye(Pdim, dtype=dtype) * 1e-6

            d_sep = _sep_solve(H_sep, -g_sep[:, None])[:, 0]
            d_sep = d_sep.at[6 * P:].set(0.0)
            d_loc = _back_substitute(HII_inv_HIS, HII_inv_gI, d_sep, sdim, D)
            d_n = jax.lax.all_gather(d_loc, axis, tiled=True).reshape(-1)
            d_n = jnp.where(jnp.all(jnp.isfinite(d_n)), d_n, -gflat)

            # ---- dogleg trust region (replicated control, psum'd scalars) -
            Hg = quad(ch, lp, g_full)
            alpha = jnp.dot(gflat, gflat) / jnp.maximum(Hg, 1e-30)
            d_sd = -alpha * gflat

            def cond(st):
                _, acc, _, _, _, tries = st
                return (~acc) & (tries < 8)

            def body(st):
                delta_i, acc, d_acc, chi2_acc, rho_acc, tries = st
                d = _dogleg_combine(d_n, d_sd, delta_i)
                dm = d.reshape(K, 6)
                pred = -(jnp.dot(gflat, d) + 0.5 * quad(ch, lp, dm))
                chi2_new = chi2_full(R @ lie.so3_exp(dm[:, :3]), p + dm[:, 3:])
                rho = (chi2_cur - chi2_new) / jnp.maximum(pred, 1e-30)
                ok = (chi2_new < chi2_cur) & (pred > 0) & jnp.isfinite(chi2_new)
                return (
                    jnp.where(ok, delta_i, delta_i * 0.25),
                    ok,
                    jnp.where(ok, d, d_acc),
                    jnp.where(ok, chi2_new, chi2_acc),
                    jnp.where(ok, rho, rho_acc),
                    tries + 1,
                )

            init = (
                delta,
                jnp.asarray(False),
                jnp.zeros_like(gflat),
                chi2_cur,
                jnp.asarray(0.0, dtype),
                jnp.asarray(0, jnp.int32),
            )
            delta_f, acc, d_acc, _, rho, _ = jax.lax.while_loop(cond, body, init)
            dnorm = jnp.linalg.norm(d_acc)
            delta_out = jnp.where(
                acc & (rho > 0.75), jnp.maximum(delta_f, 3.0 * dnorm), delta_f
            )
            dm = d_acc.reshape(K, 6)
            R_next = jnp.where(acc, R @ lie.so3_exp(dm[:, :3]), R)
            p_next = jnp.where(acc, p + dm[:, 3:], p)
            return (R_next, p_next, delta_out), None

        (R_fin, p_fin, _), _ = jax.lax.scan(
            tr_step, (R0, p0, jnp.asarray(1.0, dtype)), None, length=gn_iters
        )
        # edge-only chi2 (matching gg.linearize, which the local twin reports)
        chi2_fin = jax.lax.psum(
            _edge_chi2(
                R_fin, p_fin, ei_g, ej_g, rel_R_s, rel_p_s, info_s, emask,
                zeros_e, huber_delta,
            ),
            axis,
        ) + _edge_chi2(
            R_fin, p_fin, loop_i, loop_j, loop_rel_R, loop_rel_p, loop_info,
            loop_mask, ~zeros_l, huber_delta,
        )
        return R_fin, p_fin, chi2_fin

    return run
