"""Loop detection pipeline — prefilter, scan-context retrieval, registration
verification, odometry and pairwise consistency checks.

Parity with the reference LoopDetector (src/radar_graph_slam/loop_detector
.cpp:100-332) — and, unlike the reference (whose driving timer is commented
out and whose SC database is never populated, SURVEY.md §3.3), actually wired
up: descriptors are inserted at keyframe creation and `detect` runs on a
cadence.

The per-keyframe gates (accum-distance, yaw difference, drift-scaled
ellipses, loop-interval) are evaluated for ALL keyframes at once as one
masked vectorized pass; SC retrieval and ICP verification are jitted kernels.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import LoopConfig, RegistrationConfig
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.loop import scancontext

# reference loop_detector.hpp drift model constants (find_candidates).
# These are the DEFAULTS for LoopConfig.odom_drift_xy / drift_scale_xy —
# the reference hardcodes them; here they are config so high-drift
# platforms (e.g. the garden cart course) can widen the candidate ellipse
# instead of silently never attempting a loop.
ODOM_DRIFT_XY = 0.05
ODOM_DRIFT_Z = 0.05
DRIFT_SCALE_XY = 1.0
DRIFT_SCALE_Z = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Loop:
    """A verified loop closure between keyframes (i=old, j=new)."""

    i: jax.Array  # [] int32
    j: jax.Array  # [] int32
    rel_R: jax.Array  # [3,3] T_i^-1 T_j measurement... stored as j->i reg
    rel_p: jax.Array  # [3]
    fitness: jax.Array  # []
    valid: jax.Array  # [] bool


def prefilter_candidates(
    accum_dist: jax.Array,  # [K] accumulated travel distance per keyframe
    est_R: jax.Array,  # [K,3,3] current pose estimates
    est_p: jax.Array,  # [K,3]
    node_mask: jax.Array,  # [K]
    new_idx: jax.Array,  # [] index of the query keyframe
    last_loop_accum: jax.Array,  # [] accum distance at the last loop edge
    cfg: LoopConfig,
    altitude: jax.Array | None = None,  # [K] barometer altitude per keyframe
    altitude_valid: jax.Array | None = None,  # [K]
) -> jax.Array:
    """find_candidates (loop_detector.cpp:139-189) as one masked pass,
    including the optional barometer altitude gate (:157-161)."""
    new_accum = accum_dist[new_idx]
    dist_btn_last = new_accum - last_loop_accum
    interval_ok = dist_btn_last >= cfg.min_loop_interval_dist

    accum_ok = (new_accum - accum_dist) >= cfg.accum_distance_thresh

    Rn = est_R[new_idx]
    pn = est_p[new_idx]
    rel_R = jnp.einsum("kji,jl->kil", est_R, Rn)  # R_k^T R_new
    rel_p = jnp.einsum("kji,kj->ki", est_R, pn - est_p)
    yaw = jnp.arctan2(rel_R[:, 1, 0], rel_R[:, 0, 0])
    yaw_ok = jnp.abs(jnp.degrees(yaw)) <= cfg.max_yaw_difference_deg

    x, y = rel_p[:, 0], rel_p[:, 1]
    drift = cfg.odom_drift_xy * cfg.drift_scale_xy
    rad_lle = 3.0 + dist_btn_last * drift
    aa_lle = (x / rad_lle) ** 2 + (y / rad_lle) ** 2
    rad_xy = 10.0 + drift * (new_accum - accum_dist)
    aa = (x / rad_xy) ** 2 + (y / rad_xy) ** 2
    ellipse_ok = (aa_lle <= 1.0) & (aa <= 1.0)

    ok = node_mask & interval_ok & accum_ok & yaw_ok & ellipse_ok
    if altitude is not None:
        baro_ok = jnp.abs(altitude - altitude[new_idx]) <= cfg.max_baro_difference
        # only gate pairs where BOTH have barometer data (reference checks
        # is_initialized on the candidate)
        both = altitude_valid & altitude_valid[new_idx]
        ok = ok & (baro_ok | ~both)
    return ok


def verify_loop(
    new_xyz, new_mask, cand_xyz, cand_mask, reg_cfg: RegistrationConfig,
    cfg: LoopConfig, yaw_guess=None,
):
    """ICP/GICP verification (loop_detector.cpp:219-233): align new keyframe
    cloud onto the candidate, gate on fitness (mean sq NN distance, pcl
    getFitnessScore semantics). With cfg.use_sc_yaw_guess the scan-context
    alignment yaw seeds the solve — the reference computes that yaw but never
    uses it ("pcl icp with initial something wrong", loop_detector.cpp:212)."""
    dtype = new_xyz.dtype
    if yaw_guess is not None and cfg.use_sc_yaw_guess:
        from rivslam_tpu.core import lie

        zeros = jnp.zeros((), dtype=dtype)
        guess = lie.se3_matrix(
            lie.so3_exp(jnp.stack([zeros, zeros, yaw_guess.astype(dtype)])),
            jnp.zeros(3, dtype=dtype),
        )
    else:
        guess = jnp.eye(4, dtype=dtype)
    res = apdgicp.prepare_and_register(
        new_xyz, new_mask, cand_xyz, cand_mask, guess, reg_cfg
    )
    ok = res.converged & (res.fitness <= cfg.history_fitness_score)
    return res, ok


def verify_loops_batch(
    new_xyz, new_mask, cand_xyz, cand_masks, yaws, valid,
    reg_cfg: RegistrationConfig, cfg: LoopConfig,
):
    """Registration-verify B loop candidates in ONE vmapped dispatch (new
    capability vs loop_detector.cpp:219-233, which aligns only the single
    best scan-context match; the TPU batches the B solves on the MXU).

    cand_xyz [B,N,3], cand_masks [B,N], yaws [B], valid [B]. Returns
    (res with leading dim B, ok [B], best) where best = argmin fitness over
    passing candidates (B if none pass — index arrays on host after gating).
    """
    def one(cx, cm, yaw):
        return verify_loop(new_xyz, new_mask, cx, cm, reg_cfg, cfg, yaw_guess=yaw)

    res, ok = jax.vmap(one)(cand_xyz, cand_masks, yaws)
    ok = ok & valid
    fit = jnp.where(ok, res.fitness, jnp.inf)
    best = jnp.argmin(fit)
    return res, ok, best


def odometry_check(
    T_lc_ij: jax.Array,  # correction: new (j) -> cand (i) registration result
    odom_i: jax.Array,  # [4,4] odometry pose of candidate
    odom_j: jax.Array,  # [4,4] odometry pose of new keyframe
    num_between: jax.Array,
    cfg: LoopConfig,
):
    """LAMP-style odometry check (loop_detector.cpp:249-267):
    T_err = T_lc_ij * (T_odom_j^-1 T_odom_i); per-edge error thresholds."""
    T_odom_ji = lie.se3_inverse(odom_j) @ odom_i
    T_err = T_lc_ij @ T_odom_ji
    nb = jnp.maximum(num_between, 1).astype(T_err.dtype)
    err_trans = jnp.linalg.norm(T_err[:3, 3]) / nb
    err_rot = lie.rotation_angle(T_err[:3, :3]) / nb
    return (err_trans <= cfg.odom_check_trans_thresh) & (
        err_rot <= cfg.odom_check_rot_thresh
    )


def pairwise_check(
    T_lc_ij: jax.Array,
    odom_i: jax.Array,
    odom_j: jax.Array,
    prev_loop_old_odom: jax.Array,
    prev_loop_new_odom: jax.Array,
    prev_T_lc: jax.Array,
    have_prev: jax.Array,
    cfg: LoopConfig,
):
    """Pairwise consistency vs the previous loop (loop_detector.cpp:281-286).

    Frames: the new candidate closes j (new keyframe) against i (old
    keyframe); the previous accepted loop closed k (its new keyframe)
    against l (its old keyframe). The consistency cycle
        T_err = T(j<-i)_lc . T_odom(i<-l) . T_lc(l<-k) . T_odom(k<-j)
    telescopes to identity when both loop measurements agree with the
    odometry chained between their endpoints.

    Conventions here vs the reference: `T_lc_ij` is T(j<-i) (the caller
    passes se3_inverse of the verify-registration result, which maps the
    new cloud into the candidate frame); `prev_T_lc` is the STORED previous
    measurement T(l<-k) and is used directly — the reference stores the
    opposite direction and therefore inverts (loopPoseQueue.at(i).inverse(),
    cpp:282). Round-4 fix: this function previously swapped the previous
    loop's endpoints (using k where l belongs and vice versa) AND inverted
    prev_T_lc, so after the first accepted loop T_err carried ~2x the
    per-lap drift instead of ~0 and every later loop was rejected
    (88/88 pairwise rejections, median 7.4 m / 0.85 rad T_err on the 3-lap
    course; correct composition: median 0.4 m — see test_loop.py's cycle
    tests).
    """
    T_odom_il = lie.se3_inverse(odom_i) @ prev_loop_old_odom
    T_odom_kj = lie.se3_inverse(prev_loop_new_odom) @ odom_j
    T_err = T_lc_ij @ T_odom_il @ prev_T_lc @ T_odom_kj
    ok = (jnp.linalg.norm(T_err[:3, 3]) <= cfg.pairwise_check_trans_thresh) & (
        lie.rotation_angle(T_err[:3, :3]) <= cfg.pairwise_check_rot_thresh
    )
    return ok | ~have_prev
