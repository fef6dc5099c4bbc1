"""Global pose-graph optimization over all keyframes.

Re-design of the reference's `loop_optimizer` path (radar_graph_slam_nodelet
:652-778: anchor node + consecutive odometry EdgeSE3s + loop EdgeSE3s,
solved by g2o sparse LM/cholmod). TPU-first formulation: the graph lives in
fixed-capacity arrays (poses [K], consecutive edges implicit, loop edges
[L]); one Gauss-Newton step solves the normal equations by preconditioned
conjugate gradients whose matvec is assembled edge-wise with gather/scatter
— no sparse factorization, O(edges) per iteration, and the edge loop
batches perfectly (and shards over devices for the distributed BA of
BASELINE.json config #5).

Per-edge Jacobians come from vmapped jacfwd of the 2-pose residual — exact
and consistent with the right-multiplicative retraction.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.factors import residuals, robust


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Fixed-capacity pose graph.

    Consecutive odometry edges connect (i-1, i) for every valid i>0 with
    measurement rel_T[i] = T_{i-1}^-1 T_i (NOTE: forward convention here,
    unlike the window's backward one). Loop edges connect arbitrary pairs.
    """

    R: jax.Array  # [K,3,3] pose estimates
    p: jax.Array  # [K,3]
    node_mask: jax.Array  # [K]
    odom_rel_R: jax.Array  # [K,3,3] measurement for edge (i-1, i)
    odom_rel_p: jax.Array  # [K,3]
    odom_info: jax.Array  # [K,6,6]
    loop_i: jax.Array  # [L] int32 source (older) node
    loop_j: jax.Array  # [L] int32 target (newer) node
    loop_rel_R: jax.Array  # [L,3,3] measurement T_i^-1 T_j
    loop_rel_p: jax.Array  # [L,3]
    loop_info: jax.Array  # [L,6,6]
    loop_mask: jax.Array  # [L]
    anchor_info: jax.Array  # [6,6] prior on node 0 (reference anchor_edge)
    gps_xyz: jax.Array  # [K,3] GPS/UTM position priors (EdgeSE3PriorXYZ)
    gps_info: jax.Array  # [K,3] diagonal information
    gps_mask: jax.Array  # [K]

    @staticmethod
    def create(capacity: int, loop_capacity: int, dtype=jnp.float32) -> "PoseGraph":
        K, L = capacity, loop_capacity
        eyeK = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (K, 3, 3))
        eyeL = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (L, 3, 3))
        return PoseGraph(
            R=eyeK,
            p=jnp.zeros((K, 3), dtype=dtype),
            node_mask=jnp.zeros(K, dtype=bool),
            odom_rel_R=eyeK,
            odom_rel_p=jnp.zeros((K, 3), dtype=dtype),
            odom_info=jnp.broadcast_to(jnp.eye(6, dtype=dtype), (K, 6, 6)),
            loop_i=jnp.zeros(L, dtype=jnp.int32),
            loop_j=jnp.zeros(L, dtype=jnp.int32),
            loop_rel_R=eyeL,
            loop_rel_p=jnp.zeros((L, 3), dtype=dtype),
            loop_info=jnp.broadcast_to(jnp.eye(6, dtype=dtype), (L, 6, 6)),
            loop_mask=jnp.zeros(L, dtype=bool),
            # reference fix_first_node_stddev "10 10 10 1 1 1" -> info diag
            anchor_info=jnp.diag(
                jnp.asarray([1.0, 1.0, 1.0, 0.1, 0.1, 0.1], dtype=dtype)
            ),
            gps_xyz=jnp.zeros((K, 3), dtype=dtype),
            gps_info=jnp.ones((K, 3), dtype=dtype),
            gps_mask=jnp.zeros(K, dtype=bool),
        )


def _edge_residual(Ri, pi, Rj, pj, Rm, pm):
    """r = [log(Rm^T Ri^T Rj); Ri^T (pj - pi) - pm]."""
    return residuals.relative_se3(Ri, pi, Rj, pj, Rm, pm)


def _edge_res_and_jac(Ri, pi, Rj, pj, Rm, pm):
    """Residual + Jacobians [6,6] w.r.t. right-mult tangents of poses i, j."""

    def f(di, dj):
        Ri2 = Ri @ lie.so3_exp(di[:3])
        pi2 = pi + di[3:]
        Rj2 = Rj @ lie.so3_exp(dj[:3])
        pj2 = pj + dj[3:]
        return _edge_residual(Ri2, pi2, Rj2, pj2, Rm, pm)

    z = jnp.zeros(6, dtype=pi.dtype)
    r = f(z, z)
    Ji = jax.jacfwd(f, argnums=0)(z, z)
    Jj = jax.jacfwd(f, argnums=1)(z, z)
    return r, Ji, Jj


def _gather_edges(g: PoseGraph):
    """All edges as flat (i, j, Rm, pm, info, mask) arrays: odometry edges
    for i>=1 plus loop edges."""
    K = g.R.shape[0]
    prev_idx = jnp.maximum(jnp.arange(K) - 1, 0)
    odom_i = prev_idx.astype(jnp.int32)
    odom_j = jnp.arange(K, dtype=jnp.int32)
    odom_mask = g.node_mask & jnp.roll(g.node_mask, 1) & (jnp.arange(K) > 0)
    ei = jnp.concatenate([odom_i, g.loop_i])
    ej = jnp.concatenate([odom_j, g.loop_j])
    Rm = jnp.concatenate([g.odom_rel_R, g.loop_rel_R])
    pm = jnp.concatenate([g.odom_rel_p, g.loop_rel_p])
    info = jnp.concatenate([g.odom_info, g.loop_info])
    mask = jnp.concatenate([odom_mask, g.loop_mask])
    # robust kernel flag: loop edges get Huber 1.0 (launch:163-164)
    is_loop = jnp.concatenate([jnp.zeros(K, bool), jnp.ones(g.loop_i.shape[0], bool)])
    return ei, ej, Rm, pm, info, mask, is_loop


def linearize(g: PoseGraph, huber_delta: float = 1.0):
    """Per-edge residuals, Jacobians, IRLS-weighted infos; plus chi2."""
    ei, ej, Rm, pm, info, mask, is_loop = _gather_edges(g)
    Ri, pi = g.R[ei], g.p[ei]
    Rj, pj = g.R[ej], g.p[ej]
    r, Ji, Jj = jax.vmap(_edge_res_and_jac)(Ri, pi, Rj, pj, Rm, pm)
    chi2_e = jnp.einsum("eij,ei,ej->e", info, r, r)
    w = jnp.where(is_loop, robust.kernel_weight("Huber", huber_delta, chi2_e), 1.0)
    w = w * mask.astype(r.dtype)
    W = info * w[:, None, None]
    chi2 = jnp.sum(chi2_e * w)
    return ei, ej, r, Ji, Jj, W, chi2


def _build_rhs_and_diag(g: PoseGraph, ei, ej, r, Ji, Jj, W):
    """gradient g = sum J^T W r scattered per node; block-diagonal of H."""
    K = g.R.shape[0]
    Wr = jnp.einsum("eij,ej->ei", W, r)
    gi = jnp.einsum("eji,ej->ei", Ji, Wr)
    gj = jnp.einsum("eji,ej->ei", Jj, Wr)
    grad = jnp.zeros((K, 6), dtype=r.dtype).at[ei].add(gi).at[ej].add(gj)
    Hii = jnp.einsum("eji,ejk,ekl->eil", Ji, W, Ji)
    Hjj = jnp.einsum("eji,ejk,ekl->eil", Jj, W, Jj)
    diag = jnp.zeros((K, 6, 6), dtype=r.dtype).at[ei].add(Hii).at[ej].add(Hjj)
    # anchor prior on node 0 (identity-measurement EdgeSE3 to a fixed node,
    # nodelet:689-691) + tiny Tikhonov so unconstrained nodes stay put
    diag = diag.at[0].add(g.anchor_info)
    anchor_r = jnp.concatenate([lie.so3_log(g.R[0]), g.p[0]])
    grad = grad.at[0].add(g.anchor_info @ anchor_r)
    # GPS/UTM position priors (EdgeSE3PriorXYZ, unary on translation: the
    # residual p - gps has Jacobian [0 | I] in the (theta, p) tangent)
    w_gps = g.gps_info * g.gps_mask[:, None].astype(r.dtype)
    grad = grad.at[:, 3:].add(w_gps * (g.p - g.gps_xyz))
    diag = diag.at[:, 3, 3].add(w_gps[:, 0]).at[:, 4, 4].add(w_gps[:, 1]).at[:, 5, 5].add(w_gps[:, 2])
    diag = diag + jnp.eye(6, dtype=r.dtype) * 1e-6
    return grad, diag


def _hvp(g: PoseGraph, ei, ej, Ji, Jj, W, v):
    """H v with H = sum_e J_e^T W_e J_e (+ anchor), v [K,6]."""
    K = g.R.shape[0]
    vi = v[ei]
    vj = v[ej]
    Jv = jnp.einsum("eij,ej->ei", Ji, vi) + jnp.einsum("eij,ej->ei", Jj, vj)
    WJv = jnp.einsum("eij,ej->ei", W, Jv)
    out = (
        jnp.zeros((K, 6), dtype=v.dtype)
        .at[ei]
        .add(jnp.einsum("eji,ej->ei", Ji, WJv))
        .at[ej]
        .add(jnp.einsum("eji,ej->ei", Jj, WJv))
    )
    out = out.at[0].add(g.anchor_info @ v[0])
    w_gps = g.gps_info * g.gps_mask[:, None].astype(v.dtype)
    out = out.at[:, 3:].add(w_gps * v[:, 3:])
    return out + 1e-6 * v


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "huber_delta"))
def solve_pose_graph(
    g: PoseGraph,
    gn_iters: int = 10,
    cg_iters: int = 64,
    huber_delta: float = 1.0,
) -> tuple[PoseGraph, jax.Array]:
    """Gauss-Newton with block-Jacobi-preconditioned CG. Returns (graph, chi2).

    Jitted at module scope so repeat solves (engine loop closures, the
    scaling harness) reuse one compiled program instead of re-tracing the
    scan body per call."""
    dtype = g.p.dtype

    def gn_step(carry, _):
        gg = carry
        ei, ej, r, Ji, Jj, W, chi2 = linearize(gg, huber_delta)
        gps_r = (gg.p - gg.gps_xyz) * gg.gps_mask[:, None].astype(gg.p.dtype)
        chi2 = chi2 + jnp.sum(gg.gps_info * gps_r * gps_r)
        grad, diag = _build_rhs_and_diag(gg, ei, ej, r, Ji, Jj, W)
        Minv = jnp.linalg.inv(diag)

        def precond(x):
            return jnp.einsum("kij,kj->ki", Minv, x)

        b = -grad

        def cg_body(state, _):
            x, rr, z, pdir, rz = state
            Ap = _hvp(gg, ei, ej, Ji, Jj, W, pdir)
            alpha = rz / jnp.maximum(jnp.sum(pdir * Ap), 1e-30)
            x = x + alpha * pdir
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            pdir = z + beta * pdir
            return (x, rr, z, pdir, rz_new), None

        x0 = jnp.zeros_like(grad)
        z0 = precond(b)
        (x, *_), _ = jax.lax.scan(
            cg_body, (x0, b, z0, z0, jnp.sum(b * z0)), None, length=cg_iters
        )
        new = dataclasses.replace(
            gg,
            R=gg.R @ lie.so3_exp(x[:, :3]),
            p=gg.p + x[:, 3:],
        )
        return new, chi2

    g_fin, chi2s = jax.lax.scan(gn_step, g, None, length=gn_iters)
    _, _, _, _, _, _, chi2_fin = linearize(g_fin, huber_delta)
    return g_fin, chi2_fin


def compact(g: PoseGraph, keep, kf_count: int):
    """Compact the graph to the `keep` subset of nodes (capacity-overflow
    policy — a new capability: the reference's g2o graph grows unbounded,
    radar_graph_slam_nodelet.cpp keeps every keyframe forever).

    keep must be sorted, include node 0 and kf_count-1, and include every
    active loop endpoint (so loop measurements carry over exactly). Odometry
    edges across dropped nodes are composed: T_ab = prod_{t=a+1..b} rel_t,
    with the segment information approximated as mean(info_t)/len(segment)
    (covariances add along a chain; exact composition would need adjoint
    transport of each step's covariance).

    Runs on the host in numpy — compaction is a rare O(capacity) event, not
    a per-frame op. Returns (new_graph, old->new index map as a dict).
    """
    import numpy as onp

    keep = onp.asarray(keep, dtype=onp.int64)
    n = int(kf_count)
    assert keep[0] == 0 and keep[-1] == n - 1
    dtype = onp.asarray(g.p).dtype
    K = g.R.shape[0]
    m = len(keep)
    old2new = {int(o): i for i, o in enumerate(keep)}

    R = onp.asarray(g.R)
    p = onp.asarray(g.p)
    rel_R = onp.asarray(g.odom_rel_R)
    rel_p = onp.asarray(g.odom_rel_p)
    info = onp.asarray(g.odom_info)

    eyeK = onp.broadcast_to(onp.eye(3, dtype=dtype), (K, 3, 3)).copy()
    new_R = eyeK.copy()
    new_p = onp.zeros((K, 3), dtype=dtype)
    new_rel_R = eyeK.copy()
    new_rel_p = onp.zeros((K, 3), dtype=dtype)
    new_info = onp.broadcast_to(onp.eye(6, dtype=dtype), (K, 6, 6)).copy()
    new_mask = onp.zeros(K, dtype=bool)

    new_R[:m] = R[keep]
    new_p[:m] = p[keep]
    new_mask[:m] = True
    for i in range(1, m):
        a, b = int(keep[i - 1]), int(keep[i])
        T = onp.eye(4, dtype=dtype)
        for t in range(a + 1, b + 1):
            Tt = onp.eye(4, dtype=dtype)
            Tt[:3, :3] = rel_R[t]
            Tt[:3, 3] = rel_p[t]
            T = T @ Tt
        new_rel_R[i] = T[:3, :3]
        new_rel_p[i] = T[:3, 3]
        seg = info[a + 1 : b + 1]
        new_info[i] = seg.mean(axis=0) / len(seg)

    loop_i = onp.asarray(g.loop_i).copy()
    loop_j = onp.asarray(g.loop_j).copy()
    lmask = onp.asarray(g.loop_mask)
    for e in range(len(loop_i)):
        if lmask[e]:
            loop_i[e] = old2new[int(loop_i[e])]
            loop_j[e] = old2new[int(loop_j[e])]

    gps_xyz = onp.zeros_like(onp.asarray(g.gps_xyz))
    gps_info = onp.ones_like(onp.asarray(g.gps_info))
    gps_mask = onp.zeros(K, dtype=bool)
    gps_xyz[:m] = onp.asarray(g.gps_xyz)[keep]
    gps_info[:m] = onp.asarray(g.gps_info)[keep]
    gps_mask[:m] = onp.asarray(g.gps_mask)[keep]

    new_g = dataclasses.replace(
        g,
        R=jnp.asarray(new_R),
        p=jnp.asarray(new_p),
        node_mask=jnp.asarray(new_mask),
        odom_rel_R=jnp.asarray(new_rel_R),
        odom_rel_p=jnp.asarray(new_rel_p),
        odom_info=jnp.asarray(new_info),
        loop_i=jnp.asarray(loop_i, jnp.int32),
        loop_j=jnp.asarray(loop_j, jnp.int32),
        gps_xyz=jnp.asarray(gps_xyz),
        gps_info=jnp.asarray(gps_info),
        gps_mask=jnp.asarray(gps_mask),
    )
    return new_g, old2new
