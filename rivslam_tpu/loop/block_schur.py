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

The per-block elimination vmaps over blocks — the same axis maps to devices
with shard_map for multi-host submap partitioning (TODO.md); contributions
then combine by psum exactly like dist/dist_graph.py.

Cross-checked against the PCG solver (loop/global_graph.py) in tests.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.factors import robust
from rivslam_tpu.loop import global_graph as gg


def _equilibrate(A, rhs):
    """Jacobi scaling s = diag(A)^-1/2: solve (sAs)(x/s) = s·rhs. Makes the
    factorization scale-free across the ~1e6+ dynamic range between
    well-constrained blocks and Tikhonov-only slots."""
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    As = A * s[..., :, None] * s[..., None, :]
    return As, rhs * s[..., :, None], s


def _spd_solve(A, rhs):
    """Equilibrated Cholesky solve for the batched INTERIOR systems (H_II'
    is a sum of PSD per-edge terms plus Tikhonov — no cancellation, so it
    stays comfortably SPD in f32). jnp.linalg.solve lowers to row-pivoted
    LU, which is serial and ~2.5x slower on the TPU's MXU than the
    pivot-free Cholesky + two triangular solves."""
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
    produces NaN there, and covering the roundoff with a relative diagonal
    shift is damping that measurably slows GN convergence. Pivoted LU is
    indefinite-safe and solves the nearly-PSD system exactly; this is ONE
    small [6(2S+2L+1)]^2 matrix per GN iteration, so the serial pivoting
    cost is immaterial next to the batched interior eliminations (which
    stay on the fast Cholesky path above)."""
    As, rs, s = _equilibrate(A, rhs)
    return jnp.linalg.solve(As, rs) * s[..., :, None]


def _slot_of(node, B, S, num_loop_slots):
    """Global separator slot for a node that IS a separator by the boundary
    rule; -1 if not a boundary node (loop endpoints get their own slots)."""
    blk = node // B
    lo = node % B == 0
    hi = node % B == B - 1
    return jnp.where(lo, 2 * blk, jnp.where(hi, 2 * blk + 1, -1))


@partial(jax.jit, static_argnames=("num_blocks", "gn_iters", "huber_delta"))
def solve_pose_graph_schur(
    g: gg.PoseGraph,
    num_blocks: int = 8,
    gn_iters: int = 8,
    huber_delta: float = 1.0,
):
    """Gauss-Newton with per-iteration block-Schur elimination.

    Forces float32 matmul precision: TPU default (bfloat16 passes) makes the
    interior-block inverse H_II^-1 and the reduced separator system blow up
    to NaN on real graphs — elimination chains condition numbers in a way
    the iterative PCG path tolerates but direct factorization does not.
    """
    num_blocks = effective_blocks(g.R.shape[0], num_blocks)
    with jax.default_matmul_precision("float32"):
        return _schur_impl(g, num_blocks, gn_iters, huber_delta)


def effective_blocks(capacity: int, requested: int) -> int:
    """Largest divisor of ``capacity`` that is <= ``requested``.

    The submap partition needs K % S == 0; a user capacity that the default
    S doesn't divide (e.g. 48 with S=32) must degrade to a coarser valid
    partition, not crash the first global solve mid-run."""
    s = max(1, min(int(requested), int(capacity)))
    while capacity % s:
        s -= 1
    return s


def _schur_impl(g, num_blocks, gn_iters, huber_delta):
    K = g.R.shape[0]
    L = g.loop_i.shape[0]
    S = num_blocks
    assert K % S == 0, "keyframe capacity must divide into blocks"
    B = K // S
    dtype = g.p.dtype
    P = 2 * S + 2 * L  # separator slot capacity (+1 dump slot appended)

    node_ids = jnp.arange(K)
    blk_of = node_ids // B

    def gn_step(carry, _):
        R, p = carry
        gcur = dataclasses.replace(g, R=R, p=p)

        # ---- linearize ALL edges once (odometry chain + loops)
        ei, ej, Rm, pm, info, mask, is_loop = gg._gather_edges(gcur)
        r, Ji, Jj = jax.vmap(gg._edge_res_and_jac)(
            R[ei], p[ei], R[ej], p[ej], Rm, pm
        )
        chi2_e = jnp.einsum("eij,ei,ej->e", info, r, r)
        w = jnp.where(is_loop, robust.kernel_weight("Huber", huber_delta, chi2_e), 1.0)
        w = w * mask.astype(dtype)
        W = info * w[:, None, None]
        chi2 = jnp.sum(chi2_e * w)

        # per-edge H blocks and gradients
        Wr = jnp.einsum("eij,ej->ei", W, r)
        g_i = jnp.einsum("eji,ej->ei", Ji, Wr)  # [E,6]
        g_j = jnp.einsum("eji,ej->ei", Jj, Wr)
        H_ii = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Ji)
        H_ij = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Jj)
        H_jj = jnp.einsum("eji,ejk,ekl->eil", Jj, W, Jj)

        # ---- separator bookkeeping
        # separator nodes: block boundaries + active loop endpoints
        sep_mask = (node_ids % B == 0) | (node_ids % B == B - 1)
        sep_mask = sep_mask.at[g.loop_i].set(
            sep_mask[g.loop_i] | g.loop_mask
        ).at[g.loop_j].set(sep_mask[g.loop_j] | g.loop_mask)
        # slot per node: boundary slot, else loop slot (first match), else -1
        slot = _slot_of(node_ids, B, S, 2 * L)
        # assign loop-endpoint slots where not boundary (later loops override
        # earlier identical endpoints harmlessly: one node -> one slot)
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

        # ---- classify edges: intra-block (handled in block elimination) vs
        # separator-only (both endpoints separators AND (cross-block or loop))
        same_block = blk_of[ei] == blk_of[ej]
        intra = same_block & ~is_loop & mask
        sep_edge = mask & ~intra  # cross-block odometry + loop edges

        # ---- per-block local assembly from intra edges
        # edge k of the odometry chain belongs to block blk_of[ej] (= j=k)
        E = ei.shape[0]
        edge_blk = jnp.where(intra, blk_of[ej], S)  # invalid -> dump block
        # local indices of endpoints within the block
        loc_i = (ei % B).astype(jnp.int32)
        loc_j = (ej % B).astype(jnp.int32)

        # build [S, 6B, 6B] local Hessians and [S, 6B] gradients by scatter
        def scatter_block(vals, rows, cols, blkid):
            out = jnp.zeros((S + 1, 6 * B, 6 * B), dtype=dtype)
            r0 = rows * 6
            c0 = cols * 6
            ri = r0[:, None] + jnp.arange(6)[None, :]
            ci = c0[:, None] + jnp.arange(6)[None, :]
            return out.at[
                blkid[:, None, None],
                ri[:, :, None],
                ci[:, None, :],
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
        # (diagonal add, element-wise form)
        Hb_flatdiag = jnp.zeros((S, 6 * B), dtype=dtype)
        Hb_flatdiag = Hb_flatdiag.at[blk_of[:, None], diag_idx].add(w_gps)
        Hb = Hb + jax.vmap(jnp.diag)(Hb_flatdiag)
        gb = gb.at[blk_of[:, None], diag_idx].add(w_gps * gps_r)

        # Tikhonov keeps unconstrained dims inert
        Hb = Hb + jnp.eye(6 * B, dtype=dtype) * 1e-6

        # ---- masked interior elimination per block
        # D: interior indicator per local dim
        sep_local = sep_mask.reshape(S, B)  # [S,B]
        D = jnp.repeat(~sep_local, 6, axis=1).astype(dtype)  # [S, 6B]
        Dm = D[:, :, None] * D[:, None, :]
        # H_II' = D H D + diag(1-D): acts as H_II on interior dims, identity
        # elsewhere — static shapes, no permutations
        H_II = Hb * Dm + jax.vmap(jnp.diag)(1.0 - D)
        H_IS = Hb * (D[:, :, None] * (1.0 - D)[:, None, :])  # interior rows, sep cols
        H_SS = Hb * ((1.0 - D)[:, :, None] * (1.0 - D)[:, None, :])
        g_I = gb * D
        g_S = gb * (1.0 - D)

        X = _spd_solve(H_II, jnp.concatenate([H_IS, g_I[:, :, None]], axis=2))
        HII_inv_HIS = X[:, :, :-1]
        HII_inv_gI = X[:, :, -1]
        S_blk = H_SS - jnp.einsum("sij,sik->sjk", H_IS, HII_inv_HIS)
        g_blk = g_S - jnp.einsum("sij,si->sj", H_IS, HII_inv_gI)

        # ---- assemble the reduced separator system [6(P+1)] (last = dump)
        slot_local = slot.reshape(S, B)  # [S,B] (P for non-separators)
        sdim = (slot_local * 6)[:, :, None] + jnp.arange(6)[None, None, :]
        sdim = sdim.reshape(S, 6 * B)  # slot dim per local dim
        Pdim = 6 * (P + 1)
        # one-hot projection Q[s] in [6B, Pdim]: scatter-adding S_blk by sdim
        # serializes on the millions of colliding dump-slot indices (every
        # interior dim of every block collides at dim 6P) — XLA scatter-add
        # was ~700 ms of the round-1 837 ms solve. The projection form
        # Q^T S Q rides the MXU instead.
        Q = (sdim[:, :, None] == jnp.arange(Pdim)[None, None, :]).astype(dtype)
        H_sep = jnp.einsum("sla,slm,smb->ab", Q, S_blk, Q)
        g_sep = jnp.einsum("sla,sl->a", Q, g_blk)

        # separator-only edges (cross-block odometry + loops). The candidate
        # set is STATIC: the S-1 block-crossing chain edges k = B, 2B, ...
        # plus the L loop edges — gather those few, scatter without the
        # all-edges collision pile-up.
        K_edges = K  # chain edges occupy [0, K) of the flat edge arrays
        cross_idx = jnp.arange(1, S, dtype=jnp.int32) * B
        loop_idx = K_edges + jnp.arange(L, dtype=jnp.int32)
        cand = jnp.concatenate([cross_idx, loop_idx])  # [S-1+L]
        se_w = sep_edge[cand].astype(dtype)
        si = jnp.where(sep_edge[cand], slot[ei[cand]], P)
        sj = jnp.where(sep_edge[cand], slot[ej[cand]], P)
        cH_ii, cH_ij, cH_jj = H_ii[cand], H_ij[cand], H_jj[cand]
        cg_i, cg_j = g_i[cand], g_j[cand]
        di = (si * 6)[:, None] + jnp.arange(6)[None, :]
        dj = (sj * 6)[:, None] + jnp.arange(6)[None, :]
        H_sep = H_sep.at[di[:, :, None], di[:, None, :]].add(cH_ii * se_w[:, None, None])
        H_sep = H_sep.at[di[:, :, None], dj[:, None, :]].add(cH_ij * se_w[:, None, None])
        H_sep = H_sep.at[dj[:, :, None], di[:, None, :]].add(
            jnp.swapaxes(cH_ij, 1, 2) * se_w[:, None, None]
        )
        H_sep = H_sep.at[dj[:, :, None], dj[:, None, :]].add(cH_jj * se_w[:, None, None])
        g_sep = g_sep.at[di].add(cg_i * se_w[:, None]).at[dj].add(cg_j * se_w[:, None])

        # anchor on node 0 (slot 0 — node 0 is a boundary separator)
        anchor_r = jnp.concatenate([lie.so3_log(R[0]), p[0]])
        H_sep = H_sep.at[:6, :6].add(g.anchor_info)
        g_sep = g_sep.at[:6].add(g.anchor_info @ anchor_r)

        # inert dump slot + unused slots
        H_sep = H_sep + jnp.eye(Pdim, dtype=dtype) * 1e-6
        d_sep = _sep_solve(H_sep, -g_sep[:, None])[:, 0]  # [6(P+1)]
        d_sep = d_sep.at[6 * P :].set(0.0)  # dump slot contributes nothing

        # ---- back-substitution per block
        d_S_local = d_sep[sdim]  # [S, 6B] separator deltas in local layout
        d_I = -HII_inv_gI - jnp.einsum("sij,sj->si", HII_inv_HIS, d_S_local)
        d_local = d_I * D + d_S_local * (1.0 - D)  # [S, 6B]
        d = d_local.reshape(K, 6)

        R_new = R @ lie.so3_exp(d[:, :3])
        p_new = p + d[:, 3:]
        return (R_new, p_new), chi2

    (R_fin, p_fin), chi2s = jax.lax.scan(gn_step, (g.R, g.p), None, length=gn_iters)
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
    """Distributed block-Schur BA: the per-submap interior eliminations (the
    dominant cost) are sharded over `axis`; each device contributes its
    blocks' reduced-system terms which combine by psum over ICI; the tiny
    separator solve is replicated (float32 matmul precision is forced for
    the same conditioning reason as solve_pose_graph_schur); back-substitution runs on each block's
    owner. Identical math to solve_pose_graph_schur (cross-checked in tests).
    """
    from jax.sharding import PartitionSpec as P

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
    B = K // S
    dtype = g.p.dtype
    Pslots = 2 * S + 2 * L
    Pdim = 6 * (Pslots + 1)
    node_ids = jnp.arange(K)
    blk_of = node_ids // B

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(axis), P(axis)),
        check_vma=False,
    )
    def eliminate(Hb, gb, D, sdim):
        """Per-device: Schur-eliminate local blocks; psum reduced system."""
        Dm = D[:, :, None] * D[:, None, :]
        H_II = Hb * Dm + jax.vmap(jnp.diag)(1.0 - D)
        H_IS = Hb * (D[:, :, None] * (1.0 - D)[:, None, :])
        H_SS = Hb * ((1.0 - D)[:, :, None] * (1.0 - D)[:, None, :])
        g_I = gb * D
        g_S = gb * (1.0 - D)
        X = _spd_solve(H_II, jnp.concatenate([H_IS, g_I[:, :, None]], axis=2))
        HII_inv_HIS = X[:, :, :-1]
        HII_inv_gI = X[:, :, -1]
        S_blk = H_SS - jnp.einsum("sij,sik->sjk", H_IS, HII_inv_HIS)
        g_blk = g_S - jnp.einsum("sij,si->sj", H_IS, HII_inv_gI)
        # one-hot projection instead of colliding scatter-add (see
        # _schur_impl): each device projects its local blocks on the MXU
        Q = (sdim[:, :, None] == jnp.arange(Pdim)[None, None, :]).astype(dtype)
        H_sep = jnp.einsum("sla,slm,smb->ab", Q, S_blk, Q)
        g_sep = jnp.einsum("sla,sl->a", Q, g_blk)
        # combine submap contributions over the interconnect
        H_sep = jax.lax.psum(H_sep, axis)
        g_sep = jax.lax.psum(g_sep, axis)
        return H_sep, g_sep, HII_inv_HIS, HII_inv_gI

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def back_substitute(HII_inv_HIS, HII_inv_gI, d_sep, sdim, D):
        d_S_local = d_sep[sdim]
        d_I = -HII_inv_gI - jnp.einsum("sij,sj->si", HII_inv_HIS, d_S_local)
        return d_I * D + d_S_local * (1.0 - D)

    @jax.jit
    def run(R0, p0):
        def gn_step(carry, _):
            R, p = carry
            gcur = dataclasses.replace(g, R=R, p=p)
            ei, ej, Rm, pm, info, mask, is_loop = gg._gather_edges(gcur)
            r, Ji, Jj = jax.vmap(gg._edge_res_and_jac)(R[ei], p[ei], R[ej], p[ej], Rm, pm)
            chi2_e = jnp.einsum("eij,ei,ej->e", info, r, r)
            w = jnp.where(is_loop, robust.kernel_weight("Huber", huber_delta, chi2_e), 1.0)
            w = w * mask.astype(dtype)
            W = info * w[:, None, None]
            chi2 = jnp.sum(chi2_e * w)
            Wr = jnp.einsum("eij,ej->ei", W, r)
            g_i = jnp.einsum("eji,ej->ei", Ji, Wr)
            g_j = jnp.einsum("eji,ej->ei", Jj, Wr)
            H_ii = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Ji)
            H_ij = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Jj)
            H_jj = jnp.einsum("eji,ejk,ekl->eil", Jj, W, Jj)

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
            slot = jnp.where(sep_mask, jnp.where(slot >= 0, slot, Pslots), Pslots)

            same_block = blk_of[ei] == blk_of[ej]
            intra = same_block & ~is_loop & mask
            sep_edge = mask & ~intra
            edge_blk = jnp.where(intra, blk_of[ej], S)
            loc_i = (ei % B).astype(jnp.int32)
            loc_j = (ej % B).astype(jnp.int32)

            def scatter_block(vals, rows, cols, blkid):
                out = jnp.zeros((S + 1, 6 * B, 6 * B), dtype=dtype)
                ri = (rows * 6)[:, None] + jnp.arange(6)[None, :]
                ci = (cols * 6)[:, None] + jnp.arange(6)[None, :]
                return out.at[blkid[:, None, None], ri[:, :, None], ci[:, None, :]].add(vals)[:-1]

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

            w_gps = g.gps_info * g.gps_mask[:, None].astype(dtype)
            gps_r = (p - g.gps_xyz) * g.gps_mask[:, None].astype(dtype)
            loc_n = (node_ids % B).astype(jnp.int32)
            diag_idx = (loc_n * 6)[:, None] + jnp.arange(3)[None, :] + 3
            Hb_flatdiag = jnp.zeros((S, 6 * B), dtype=dtype)
            Hb_flatdiag = Hb_flatdiag.at[blk_of[:, None], diag_idx].add(w_gps)
            Hb = Hb + jax.vmap(jnp.diag)(Hb_flatdiag)
            gb = gb.at[blk_of[:, None], diag_idx].add(w_gps * gps_r)
            Hb = Hb + jnp.eye(6 * B, dtype=dtype) * 1e-6

            sep_local = sep_mask.reshape(S, B)
            D = jnp.repeat(~sep_local, 6, axis=1).astype(dtype)
            slot_local = slot.reshape(S, B)
            sdim = ((slot_local * 6)[:, :, None] + jnp.arange(6)[None, None, :]).reshape(S, 6 * B)

            # ---- sharded elimination + psum-reduced separator system
            H_sep, g_sep, HII_inv_HIS, HII_inv_gI = eliminate(Hb, gb, D, sdim)

            # static separator-edge candidates (see _schur_impl)
            cross_idx = jnp.arange(1, S, dtype=jnp.int32) * B
            loop_idx = K + jnp.arange(L, dtype=jnp.int32)
            cand = jnp.concatenate([cross_idx, loop_idx])
            se_w = sep_edge[cand].astype(dtype)
            si = jnp.where(sep_edge[cand], slot[ei[cand]], Pslots)
            sj = jnp.where(sep_edge[cand], slot[ej[cand]], Pslots)
            cH_ii, cH_ij, cH_jj = H_ii[cand], H_ij[cand], H_jj[cand]
            cg_i, cg_j = g_i[cand], g_j[cand]
            di = (si * 6)[:, None] + jnp.arange(6)[None, :]
            dj = (sj * 6)[:, None] + jnp.arange(6)[None, :]
            H_sep = H_sep.at[di[:, :, None], di[:, None, :]].add(cH_ii * se_w[:, None, None])
            H_sep = H_sep.at[di[:, :, None], dj[:, None, :]].add(cH_ij * se_w[:, None, None])
            H_sep = H_sep.at[dj[:, :, None], di[:, None, :]].add(
                jnp.swapaxes(cH_ij, 1, 2) * se_w[:, None, None]
            )
            H_sep = H_sep.at[dj[:, :, None], dj[:, None, :]].add(cH_jj * se_w[:, None, None])
            g_sep = g_sep.at[di].add(cg_i * se_w[:, None]).at[dj].add(cg_j * se_w[:, None])
            anchor_r = jnp.concatenate([lie.so3_log(R[0]), p[0]])
            H_sep = H_sep.at[:6, :6].add(g.anchor_info)
            g_sep = g_sep.at[:6].add(g.anchor_info @ anchor_r)
            H_sep = H_sep + jnp.eye(Pdim, dtype=dtype) * 1e-6
            d_sep = _sep_solve(H_sep, -g_sep[:, None])[:, 0]
            d_sep = d_sep.at[6 * Pslots :].set(0.0)

            d_local = back_substitute(HII_inv_HIS, HII_inv_gI, d_sep, sdim, D)
            d = d_local.reshape(K, 6)
            return (R @ lie.so3_exp(d[:, :3]), p + d[:, 3:]), chi2

        (R_fin, p_fin), chi2s = jax.lax.scan(gn_step, (R0, p0), None, length=gn_iters)
        return R_fin, p_fin

    with jax.default_matmul_precision("float32"):
        R_fin, p_fin = run(g.R, g.p)
    g_out = dataclasses.replace(g, R=R_fin, p=p_fin)
    _, _, _, _, _, _, chi2_fin = gg.linearize(g_out, huber_delta)
    return g_out, chi2_fin
