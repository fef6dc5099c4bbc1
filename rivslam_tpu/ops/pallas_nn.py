"""Pallas TPU kernel: fused masked nearest-neighbor search.

The correspondence step of every GICP iteration is a [N, M] distance matrix
+ argmin (ops/knn.py). XLA materializes the matrix in HBM between the matmul
and the reduction at larger sizes; this kernel keeps each distance TILE in
VMEM and fuses cross-term (MXU) + row norms + masked argmin in one pass, so
HBM traffic is O(N+M) instead of O(N*M).

Layout: coordinates come in transposed [3, N] so the lane (last) dimension
is the point axis — [N, 3] arrays are hostile to the (8,128) f32 tile.
Queries are processed in TILE_Q row blocks; the reference set is scanned in
TILE_M column blocks with a running (min, argmin) carried in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 256
TILE_M = 512
BIG = 1e30


def _nn_kernel(q_ref, r_ref, rmask_ref, idx_ref, d2_ref):
    # q_ref: [3, TILE_Q] block; r_ref: [3, M]; rmask_ref: [1, M] (f32 0/1)
    q = q_ref[:]  # [3, TQ]
    qn = jnp.sum(q * q, axis=0)  # [TQ]
    m_total = r_ref.shape[1]
    num_m = m_total // TILE_M

    def body(j, carry):
        best_d2, best_idx = carry  # [TQ], [TQ] int32
        r = r_ref[:, pl.ds(j * TILE_M, TILE_M)]  # [3, TM]
        rmask = rmask_ref[0, pl.ds(j * TILE_M, TILE_M)]  # [TM]
        rn = jnp.sum(r * r, axis=0)  # [TM]
        cross = jax.lax.dot_general(
            q, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, TM]
        d2 = qn[:, None] + rn[None, :] - 2.0 * cross
        d2 = jnp.where(rmask[None, :] > 0.5, d2, BIG)
        loc = jnp.argmin(d2, axis=1).astype(jnp.int32)  # [TQ]
        loc_d2 = jnp.min(d2, axis=1)
        upd = loc_d2 < best_d2
        return (
            jnp.where(upd, loc_d2, best_d2),
            jnp.where(upd, loc + j * TILE_M, best_idx),
        )

    init = (
        jnp.full((q.shape[1],), BIG, dtype=jnp.float32),
        jnp.zeros((q.shape[1],), dtype=jnp.int32),
    )
    best_d2, best_idx = jax.lax.fori_loop(0, num_m, body, init)
    idx_ref[0, :] = best_idx
    d2_ref[0, :] = best_d2


def _pad_to(x, mult, axis, value=0.0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _corr_kernel(q_ref, r_ref, rmask_ref, feats_ref, idx_ref, d2_ref, g_ref):
    """Fused correspondence: NN argmin + in-pass gather of the best match's
    feature row. The per-tile gather is a [TQ, TM] one-hot x [TM, F] matmul
    (MXU) carried under the running-min mask, so neither the [N, M] distance
    matrix nor a full [N, M] one-hot ever exists — HBM traffic is O(N+M).

    Pallas re-design of the CUDA correspondence+covariance pipeline
    (fast_apdgicp/src/fast_gicp/cuda/find_voxel_correspondences.cu:114,
    brute_force_knn.cu:15-111): the GPU kd-tree/brute-force pass maps to a
    tiled MXU scan with VMEM-resident running state.
    """
    q = q_ref[:]  # [3, TQ]
    qn = jnp.sum(q * q, axis=0)  # [TQ]
    m_total = r_ref.shape[1]
    num_m = m_total // TILE_M
    F = feats_ref.shape[1]
    TQ = q.shape[1]

    def body(j, carry):
        best_d2, best_idx, best_g = carry  # [TQ], [TQ] i32, [TQ, F]
        r = r_ref[:, pl.ds(j * TILE_M, TILE_M)]  # [3, TM]
        rmask = rmask_ref[0, pl.ds(j * TILE_M, TILE_M)]  # [TM]
        feats = feats_ref[pl.ds(j * TILE_M, TILE_M), :]  # [TM, F]
        rn = jnp.sum(r * r, axis=0)  # [TM]
        cross = jax.lax.dot_general(
            q, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, TM]
        d2 = qn[:, None] + rn[None, :] - 2.0 * cross
        d2 = jnp.where(rmask[None, :] > 0.5, d2, BIG)
        loc_d2 = jnp.min(d2, axis=1)  # [TQ]
        loc = jnp.argmin(d2, axis=1).astype(jnp.int32)  # [TQ]
        # gather the local winner's features: exact one-hot on the min value
        cols = jax.lax.broadcasted_iota(jnp.int32, (TQ, TILE_M), 1)
        onehot = (cols == loc[:, None]).astype(jnp.float32)
        loc_g = jax.lax.dot_general(
            onehot, feats, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, F]
        upd = loc_d2 < best_d2
        return (
            jnp.where(upd, loc_d2, best_d2),
            jnp.where(upd, loc + j * TILE_M, best_idx),
            jnp.where(upd[:, None], loc_g, best_g),
        )

    init = (
        jnp.full((TQ,), BIG, dtype=jnp.float32),
        jnp.zeros((TQ,), dtype=jnp.int32),
        jnp.zeros((TQ, F), dtype=jnp.float32),
    )
    best_d2, best_idx, best_g = jax.lax.fori_loop(0, num_m, body, init)
    idx_ref[0, :] = best_idx
    d2_ref[0, :] = best_d2
    g_ref[:] = best_g


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_correspondence_pallas(
    query: jax.Array,  # [N, 3] f32 (already transformed source points)
    ref: jax.Array,  # [M, 3] f32
    ref_mask: jax.Array,  # [M] bool
    ref_feats: jax.Array,  # [M, F] per-target features to gather (F <= 128)
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Exact masked 1-NN returning (idx [N], d2 [N], gathered [N, F])."""
    n = query.shape[0]
    f = ref_feats.shape[1]
    q_t = _pad_to(query.astype(jnp.float32).T, TILE_Q, axis=1)  # [3, Np]
    r_t = _pad_to(ref.astype(jnp.float32).T, TILE_M, axis=1)  # [3, Mp]
    rm = _pad_to(ref_mask.astype(jnp.float32)[None, :], TILE_M, axis=1)
    # feature lanes padded to the f32 tile width
    fp = _pad_to(_pad_to(ref_feats.astype(jnp.float32), 128, axis=1), TILE_M, axis=0)
    npad = q_t.shape[1]
    mpad = r_t.shape[1]
    fpad = fp.shape[1]

    grid = (npad // TILE_Q,)
    idx, d2, g = pl.pallas_call(
        _corr_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mpad, fpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, fpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((npad, fpad), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, r_t, rm, fp)
    return idx[0, :n], d2[0, :n], g[:n, :f]


TILE_M_GATHER = 1024


def _gather_kernel(q_ref, r_ref, rmask_ref, featsT_ref, d2_ref, g_ref):
    """v2 fused correspondence: running-min NN + equality-matmul gather.

    Redesign of _corr_kernel driven by a hardware A/B (BENCHMARKS.md): the
    in-kernel `argmin` (a cross-lane iota/select tree per tile) and the
    128-lane-padded [M, F] feature operand made v1 LOSE to XLA at production
    sizes. v2 instead:
      - reduces only `min` per tile (single cheap tree),
      - gathers via an equality mask (d2 == rowmin) contracted with features
        kept TRANSPOSED [F, M] — lane dim = point axis, so the DMA moves F
        sublanes instead of 128 padded lanes (~14x less feature traffic),
      - emits gathered features transposed [F, N] straight out of the MXU
        (dot_general contracting both operands' lane dims), which is also
        the layout the SoA consumer wants.
    Ties (several targets at the exact same f32 distance) are AVERAGED via
    the count normalization instead of argmin's first-index pick; the
    reference's kd-tree pick among exact ties is arbitrary anyway.
    """
    q = q_ref[:]  # [3, TQ]
    qn = jnp.sum(q * q, axis=0)  # [TQ]
    m_total = r_ref.shape[1]
    num_m = m_total // TILE_M_GATHER
    F = featsT_ref.shape[0]
    TQ = q.shape[1]

    def body(j, carry):
        best, g, cnt = carry  # [TQ], [F, TQ], [TQ]
        r = r_ref[:, pl.ds(j * TILE_M_GATHER, TILE_M_GATHER)]  # [3, TM]
        rmask = rmask_ref[0, pl.ds(j * TILE_M_GATHER, TILE_M_GATHER)]  # [TM]
        featsT = featsT_ref[:, pl.ds(j * TILE_M_GATHER, TILE_M_GATHER)]  # [F, TM]
        rn = jnp.sum(r * r, axis=0)  # [TM]
        cross = jax.lax.dot_general(
            q, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TQ, TM]
        d2 = qn[:, None] + rn[None, :] - 2.0 * cross
        d2 = jnp.where(rmask[None, :] > 0.5, d2, BIG)
        tmin = jnp.min(d2, axis=1)  # [TQ]
        valid = tmin < 0.5 * BIG
        eq = (
            (d2 <= tmin[:, None]) & (rmask[None, :] > 0.5) & valid[:, None]
        ).astype(jnp.float32)  # [TQ, TM]
        gt = jax.lax.dot_general(
            featsT, eq, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [F, TQ]
        ct = jnp.sum(eq, axis=1)  # [TQ]
        lt = tmin < best
        tie = (tmin == best) & valid
        g = jnp.where(lt[None, :], gt, g + jnp.where(tie[None, :], gt, 0.0))
        cnt = jnp.where(lt, ct, cnt + jnp.where(tie, ct, 0.0))
        best = jnp.minimum(best, tmin)
        return best, g, cnt

    init = (
        jnp.full((TQ,), BIG, dtype=jnp.float32),
        jnp.zeros((F, TQ), dtype=jnp.float32),
        jnp.zeros((TQ,), dtype=jnp.float32),
    )
    best, g, cnt = jax.lax.fori_loop(0, num_m, body, init)
    d2_ref[0, :] = best
    g_ref[:, :] = g / jnp.maximum(cnt, 1.0)[None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_gather_pallas(
    query: jax.Array,  # [N, 3] f32 (already transformed source points)
    ref: jax.Array,  # [M, 3] f32
    ref_mask: jax.Array,  # [M] bool
    ref_feats_t: jax.Array,  # [F, M] per-target features, TRANSPOSED
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact masked 1-NN distance + tie-averaged feature gather.

    Returns (d2 [N], gathered [F, N]). Rows with no valid reference get
    d2 >= BIG and zero features (callers gate on the correspondence-distance
    threshold, so both conventions are inert downstream).
    """
    n = query.shape[0]
    f = ref_feats_t.shape[0]
    q_t = _pad_to(query.astype(jnp.float32).T, TILE_Q, axis=1)  # [3, Np]
    r_t = _pad_to(ref.astype(jnp.float32).T, TILE_M_GATHER, axis=1)  # [3, Mp]
    rm = _pad_to(ref_mask.astype(jnp.float32)[None, :], TILE_M_GATHER, axis=1)
    fp = _pad_to(ref_feats_t.astype(jnp.float32), TILE_M_GATHER, axis=1)  # [F, Mp]
    npad = q_t.shape[1]
    mpad = r_t.shape[1]

    grid = (npad // TILE_Q,)
    d2, g = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
            jax.ShapeDtypeStruct((f, npad), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, r_t, rm, fp)
    return d2[0, :n], g[:, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbor_pallas(
    query: jax.Array,  # [N, 3] f32
    ref: jax.Array,  # [M, 3] f32
    ref_mask: jax.Array,  # [M] bool
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact masked 1-NN; same contract as ops.knn.nearest_neighbor."""
    n = query.shape[0]
    m = ref.shape[0]
    q_t = _pad_to(query.astype(jnp.float32).T, TILE_Q, axis=1)  # [3, Np]
    r_t = _pad_to(ref.astype(jnp.float32).T, TILE_M, axis=1)  # [3, Mp]
    rm = _pad_to(ref_mask.astype(jnp.float32)[None, :], TILE_M, axis=1)  # [1, Mp]
    npad = q_t.shape[1]
    mpad = r_t.shape[1]

    grid = (npad // TILE_Q,)
    idx, d2 = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
            jax.ShapeDtypeStruct((1, npad), jnp.float32),
        ],
        interpret=interpret,
    )(q_t, r_t, rm)
    return idx[0, :n], d2[0, :n]
