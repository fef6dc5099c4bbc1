"""Intensity Scan Context — scatter-built polar descriptors + batched
shift-search matching.

Capability parity with the reference SCManager (Scancontext.cpp / .h,
iscloam lineage, limited-FoV variant): 40 rings x 20 sectors over azimuth
+-56.5 deg and 80 m, bin value = max intensity (Scancontext.cpp:160-212);
ring key = row means, sector key = column means (:217-244); matching =
sector-key circshift alignment then cosine column distance over a +-10%
shift window (:80-159); candidate screening by ring-key distance
(:294-328).

TPU-first: descriptor construction is one scatter-max; the ring-key kd-tree
becomes a masked top-k over one distance matrix; the shift search evaluates
its window as a batched [candidates, shifts] masked einsum. The descriptor
database is a fixed-capacity array in device memory.

NOTE the reference computes descriptors but never inserts them
(makeAndSaveScancontextAndKeys has zero call sites) so its loop path is
inert; here insertion is wired into keyframe creation (SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rivslam_tpu.core.config import LoopConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ScanContextDB:
    """Fixed-capacity descriptor database."""

    desc: jax.Array  # [K, R, S]
    ring_key: jax.Array  # [K, R]
    sector_key: jax.Array  # [K, S]
    count: jax.Array  # [] int32 number of inserted descriptors

    @staticmethod
    def create(cfg: LoopConfig, dtype=jnp.float32) -> "ScanContextDB":
        K = cfg.keyframe_capacity
        return ScanContextDB(
            desc=jnp.zeros((K, cfg.num_ring, cfg.num_sector), dtype=dtype),
            ring_key=jnp.zeros((K, cfg.num_ring), dtype=dtype),
            sector_key=jnp.zeros((K, cfg.num_sector), dtype=dtype),
            count=jnp.asarray(0, jnp.int32),
        )


def make_descriptor(
    xyz: jax.Array, intensity: jax.Array, mask: jax.Array, cfg: LoopConfig
) -> jax.Array:
    """Polar max-intensity descriptor [R, S] (Scancontext.cpp:160-212)."""
    x, y = xyz[:, 0], xyz[:, 1]
    azim_range = jnp.sqrt(x * x + y * y)
    azim_angle = (jnp.arctan2(x, y) - jnp.pi / 2) * 180.0 / jnp.pi
    az_max = cfg.sc_azimuth_range_deg
    az_min = -az_max - 0.1  # reference PC_AZIMUTH_ANGLE_MIN = -56.6 vs max 56.5
    valid = mask & (jnp.abs(azim_angle) <= az_max) & (azim_range <= cfg.max_radius)
    R, S = cfg.num_ring, cfg.num_sector
    ring = jnp.clip(
        jnp.ceil(azim_range / cfg.max_radius * R).astype(jnp.int32), 1, R
    ) - 1
    sector = jnp.clip(
        jnp.ceil((azim_angle - az_min) / (az_max - az_min) * S).astype(jnp.int32), 1, S
    ) - 1
    flat = jnp.where(valid, ring * S + sector, R * S)  # invalid -> overflow bin
    desc = (
        jnp.zeros(R * S + 1, dtype=xyz.dtype)
        .at[flat]
        .max(jnp.where(valid, intensity, 0.0))[: R * S]
        .reshape(R, S)
    )
    return desc


def ring_key_of(desc: jax.Array) -> jax.Array:
    return jnp.mean(desc, axis=-1)


def sector_key_of(desc: jax.Array) -> jax.Array:
    return jnp.mean(desc, axis=-2)


def insert(db: ScanContextDB, desc: jax.Array) -> tuple[ScanContextDB, jax.Array]:
    """Append a descriptor. Returns (db', dropped).

    At capacity the insert is a NO-OP (count stays clamped at K): silently
    overwriting slot K-1 would corrupt the last descriptor for standalone
    users. The engine compacts the DB before it ever fills
    (pipeline._compact_keyframes), so `dropped` is always False there; a
    standalone caller that outgrows the capacity gets the drop as an
    explicit bool scalar instead of a silent no-op (VERDICT r4 weak #7)."""
    K = db.desc.shape[0]
    full = db.count >= K
    i = jnp.minimum(db.count, K - 1)

    def sel(new, old):
        return jnp.where(full, old, new)

    return ScanContextDB(
        desc=db.desc.at[i].set(sel(desc, db.desc[i])),
        ring_key=db.ring_key.at[i].set(sel(ring_key_of(desc), db.ring_key[i])),
        sector_key=db.sector_key.at[i].set(sel(sector_key_of(desc), db.sector_key[i])),
        count=jnp.minimum(db.count + 1, K),
    ), full


def _all_shift_distances(query: jax.Array, cand: jax.Array) -> jax.Array:
    """Cosine column distance of query vs cand circshifted by every shift.

    query [R,S], cand [C,R,S] -> [C,S] distances (distDirectSC semantics:
    mean over columns where BOTH have nonzero norm).
    """
    S = query.shape[-1]
    shifts = jnp.arange(S)
    # cand shifted by s: column j of shifted = column (j - s) mod S
    idx = (shifts[:, None] * 0 + jnp.arange(S)[None, :] - shifts[:, None]) % S  # [S,S]
    cand_sh = cand[:, :, idx]  # [C, R, S(shift), S(col)] via fancy indexing
    cand_sh = jnp.moveaxis(cand_sh, 2, 1)  # [C, S(shift), R, S(col)]
    qn = jnp.linalg.norm(query, axis=0)  # [S]
    cn = jnp.linalg.norm(cand_sh, axis=2)  # [C, S(shift), S]
    dot = jnp.einsum("rs,cwrs->cws", query, cand_sh)
    both = (qn[None, None, :] > 0) & (cn > 0)
    sim = jnp.where(both, dot / jnp.maximum(qn[None, None, :] * cn, 1e-12), 0.0)
    n_eff = jnp.maximum(jnp.sum(both, axis=-1), 1)
    return 1.0 - jnp.sum(sim, axis=-1) / n_eff  # [C, S]


def _screened_shift_dists(db, desc, query_index, cand_mask, cfg):
    """Shared screening for match/match_topk: ring-key top-C preselect, then
    windowed shift-search distances. Returns (dists [C,S] with jnp.inf at
    excluded shifts/candidates, cand_idx [C] db rows)."""
    K = db.desc.shape[0]
    ids = jnp.arange(K)
    allowed = (
        cand_mask
        & (ids < db.count)
        & (ids <= query_index - cfg.num_exclude_recent)
    )

    # ring-key screening: top NUM_CANDIDATES by L2 distance
    qkey = ring_key_of(desc)
    d2 = jnp.sum((db.ring_key - qkey[None, :]) ** 2, axis=-1)
    d2 = jnp.where(allowed, d2, jnp.inf)
    neg, cand_idx = jax.lax.top_k(-d2, cfg.num_candidates)
    cand_ok = jnp.isfinite(-neg)

    # shift search: sector-key alignment picks a center, +-10% window
    cand_desc = db.desc[cand_idx]  # [C, R, S]
    S = cfg.num_sector
    qvkey = sector_key_of(desc)
    cvkey = db.sector_key[cand_idx]  # [C, S]
    # vkey diff norm for every shift (circshift of candidate's key)
    idx = (jnp.arange(S)[None, :] - jnp.arange(S)[:, None]) % S  # [S(shift),S]
    cvkey_sh = cvkey[:, idx]  # [C, S(shift), S]
    vkey_dist = jnp.linalg.norm(qvkey[None, None, :] - cvkey_sh, axis=-1)  # [C,S]
    center = jnp.argmin(vkey_dist, axis=-1)  # [C]
    radius = round(0.5 * cfg.search_ratio * S)
    shift_ids = jnp.arange(S)
    diff = jnp.abs((shift_ids[None, :] - center[:, None] + S // 2) % S - S // 2)
    in_window = diff <= radius  # [C, S]

    dists = _all_shift_distances(desc, cand_desc)  # [C, S]
    dists = jnp.where(in_window, dists, jnp.inf)
    dists = jnp.where(cand_ok[:, None], dists, jnp.inf)
    return dists, cand_idx


def match(
    db: ScanContextDB,
    desc: jax.Array,
    query_index: jax.Array,
    cand_mask: jax.Array,
    cfg: LoopConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """detectLoopClosureID (Scancontext.cpp:272-379).

    cand_mask [K]: externally allowed candidates (the detector's prefilter);
    recent keyframes are additionally excluded here. Returns
    (loop_idx int32 [-1 if none], yaw_diff_rad, min_dist)."""
    dists, cand_idx = _screened_shift_dists(db, desc, query_index, cand_mask, cfg)
    S = cfg.num_sector
    dtype = desc.dtype
    best_flat = jnp.argmin(dists.reshape(-1))
    best_c = best_flat // S
    best_shift = best_flat % S
    min_dist = dists.reshape(-1)[best_flat]

    unit_sector = (2 * cfg.sc_azimuth_range_deg + 0.1) / S  # PC_UNIT_SECTOR_ANGLE
    yaw_diff = jnp.deg2rad(best_shift.astype(dtype) * unit_sector)
    found = min_dist < cfg.sc_dist_thresh
    loop_idx = jnp.where(found, cand_idx[best_c], -1).astype(jnp.int32)
    return loop_idx, yaw_diff, min_dist


def match_topk(
    db: ScanContextDB,
    desc: jax.Array,
    query_index: jax.Array,
    cand_mask: jax.Array,
    cfg: LoopConfig,
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Top-k variant of :func:`match` for batched loop verification (a new
    capability: loop_detector.cpp:219 verifies only the single best match).

    Returns (idx int32 [k] with -1 padding, yaw_rad [k], dist [k],
    valid bool [k]): the k screened candidates ranked by best-shift
    scan-context distance, each gated on sc_dist_thresh."""
    dists, cand_idx = _screened_shift_dists(db, desc, query_index, cand_mask, cfg)
    S = cfg.num_sector
    dtype = desc.dtype
    per_cand = jnp.min(dists, axis=-1)  # [C]
    per_shift = jnp.argmin(dists, axis=-1)  # [C]
    k = min(k, cfg.num_candidates)
    neg, order = jax.lax.top_k(-per_cand, k)
    min_dist = -neg
    shift = per_shift[order]
    unit_sector = (2 * cfg.sc_azimuth_range_deg + 0.1) / S
    yaw = jnp.deg2rad(shift.astype(dtype) * unit_sector)
    valid = jnp.isfinite(min_dist) & (min_dist < cfg.sc_dist_thresh)
    idx = jnp.where(valid, cand_idx[order], -1).astype(jnp.int32)
    return idx, yaw, min_dist, valid


def compact(db: ScanContextDB, keep) -> ScanContextDB:
    """Move the `keep` subset of descriptor rows to the front (graph
    compaction companion of :func:`global_graph.compact`); host-side numpy,
    rare event."""
    import numpy as onp

    keep = onp.asarray(keep, dtype=onp.int64)
    m = len(keep)
    desc = onp.zeros_like(onp.asarray(db.desc))
    rk = onp.zeros_like(onp.asarray(db.ring_key))
    sk = onp.zeros_like(onp.asarray(db.sector_key))
    desc[:m] = onp.asarray(db.desc)[keep]
    rk[:m] = onp.asarray(db.ring_key)[keep]
    sk[:m] = onp.asarray(db.sector_key)[keep]
    return ScanContextDB(
        desc=jnp.asarray(desc),
        ring_key=jnp.asarray(rk),
        sector_key=jnp.asarray(sk),
        count=jnp.asarray(m, jnp.int32),
    )
