"""Scan-matching odometry front end — pure-function re-design of the
reference ScanMatchingOdometryNodelet (apps/scan_matching_odometry_nodelet.cpp).

State is an explicit pytree carried frame to frame: `state' , out = step(state,
frame)`; the whole step (guess composition, APDGICP LM solve, transform
thresholding, keyframe gating and target swap) is one jitted XLA program.
Reference quirks reproduced deliberately:
- ego-velocity translation prior keeps its previous value when the new delta
  exceeds max_egovel_cum (the empty-if at :369-371),
- max_acceptable_angle is compared in radians against a degrees-valued param
  (:513-515) — i.e. the rotation gate almost never fires,
- the thresholded fallback composes keyframe_pose * trans * radar_delta
  (:561-568).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import OdometryConfig, RegistrationConfig
from rivslam_tpu.frontend import apdgicp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OdometryState:
    target: apdgicp.PreparedCloud  # current keyframe cloud (+covs)
    keyframe_pose: jax.Array  # [4,4] odom pose of the keyframe
    prev_trans: jax.Array  # [4,4] keyframe -> last frame
    egovel_trans: jax.Array  # [3] last accepted const-vel translation prior
    last_time: jax.Array  # [] seconds
    accum_distance: jax.Array  # [] total travel (keyframe_updater accumulator)
    keyframe_index: jax.Array  # [] int32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class OdometryOutput:
    odom: jax.Array  # [4,4] odometry pose of this frame
    trans_delta: jax.Array  # [4,4] incremental odom vs previous frame
    is_keyframe: jax.Array  # [] bool
    thresholded: jax.Array  # [] bool
    reg: apdgicp.RegistrationResult
    accum_distance: jax.Array  # [] travel distance at this frame
    pred_error: jax.Array  # [4,4] inv(registration) @ motion-prediction guess
    # (ScanMatchingStatus prediction_errors, scan_matching_odometry_nodelet
    # .cpp:717-724 — there against the msf/imu delta, here the ego-velocity
    # or constant-velocity guess actually used to seed the solve)


def init_state(
    cloud: apdgicp.PreparedCloud, t: jax.Array, dtype=jnp.float32
) -> OdometryState:
    """First frame: becomes the keyframe, odometry = identity
    (scan_matching_odometry_nodelet.cpp:431-445)."""
    return OdometryState(
        target=cloud,
        keyframe_pose=jnp.eye(4, dtype=dtype),
        prev_trans=jnp.eye(4, dtype=dtype),
        egovel_trans=jnp.zeros(3, dtype=dtype),
        last_time=jnp.asarray(t, dtype=dtype),
        accum_distance=jnp.asarray(0.0, dtype=dtype),
        keyframe_index=jnp.asarray(0, jnp.int32),
    )


def transform_update(
    odom: jax.Array, imu_roll: jax.Array, imu_pitch: jax.Array, fusion_ratio: float
) -> jax.Array:
    """Loose IMU roll/pitch complementary fusion — transformUpdate parity
    (scan_matching_odometry_nodelet.cpp:294-348, enable_imu_fusion; disabled
    by default upstream): keep the odometry yaw, blend roll/pitch with the
    IMU's by `imu_fusion_ratio`."""
    ypr = lie.ypr_from_rot(odom[:3, :3])
    roll_f = (1.0 - fusion_ratio) * ypr[2] + fusion_ratio * imu_roll
    pitch_f = (1.0 - fusion_ratio) * ypr[1] + fusion_ratio * imu_pitch
    Rz = lie.so3_exp(jnp.stack([jnp.zeros_like(ypr[0]), jnp.zeros_like(ypr[0]), ypr[0]]))
    Ry = lie.so3_exp(jnp.stack([jnp.zeros_like(pitch_f), pitch_f, jnp.zeros_like(pitch_f)]))
    Rx = lie.so3_exp(jnp.stack([roll_f, jnp.zeros_like(roll_f), jnp.zeros_like(roll_f)]))
    return odom.at[:3, :3].set(Rz @ Ry @ Rx)


def roll_pitch_from_gravity(acc_mean: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Roll/pitch from a (quasi-static) accelerometer gravity direction."""
    ax, ay, az = acc_mean[0], acc_mean[1], acc_mean[2]
    roll = jnp.arctan2(ay, az)
    pitch = jnp.arctan2(-ax, jnp.sqrt(ay * ay + az * az))
    return roll, pitch


def step(
    state: OdometryState,
    source: apdgicp.PreparedCloud,
    ego_vel: jax.Array,  # [3] m/s from REVE (zeros if disabled)
    t: jax.Array,  # [] frame time, seconds
    odo_cfg: OdometryConfig,
    reg_cfg: RegistrationConfig,
    imu_roll: jax.Array | None = None,  # [] rad, gravity-derived (fusion)
    imu_pitch: jax.Array | None = None,
    imu_valid: jax.Array | None = None,  # [] bool
) -> tuple[OdometryState, OdometryOutput]:
    dtype = state.keyframe_pose.dtype
    eye4 = jnp.eye(4, dtype=dtype)

    # --- constant-velocity translation prior (:361-374)
    dt = t - state.last_time
    ego_delta = ego_vel * dt
    too_big = jnp.sum(ego_delta**2) > odo_cfg.max_egovel_cum**2
    egovel_trans = jnp.where(too_big, state.egovel_trans, ego_delta)
    egovel_cum = eye4.at[:3, 3].set(egovel_trans)

    # --- guess and registration (:461-468)
    if odo_cfg.use_ego_vel:
        guess = state.prev_trans @ egovel_cum
    else:
        guess = state.prev_trans
    reg = apdgicp.register_dispatch(source, state.target, guess, reg_cfg)

    # non-convergence -> reuse previous transform (:476-481)
    trans = jnp.where(reg.converged, reg.T, state.prev_trans)
    odom_now = state.keyframe_pose @ trans

    # --- transform thresholding (:502-576, non-IMU branch)
    radar_delta = lie.se3_inverse(state.prev_trans) @ trans
    dx = jnp.linalg.norm(radar_delta[:3, 3])
    da = lie.rotation_angle(radar_delta[:3, :3])  # radians, vs degree param
    too_large = (dx > odo_cfg.max_acceptable_trans) | (da > odo_cfg.max_acceptable_angle_deg)
    thresholded = jnp.asarray(odo_cfg.enable_transform_thresholding) & too_large & reg.converged
    if odo_cfg.thresholding_fallback == "EGOVEL":
        # substitute ego-velocity dead reckoning for the rejected delta
        fallback_trans = state.prev_trans @ egovel_cum
        odom_now = jnp.where(thresholded, state.keyframe_pose @ fallback_trans, odom_now)
        prev_trans_new = jnp.where(thresholded, fallback_trans, trans)
    else:  # QUIRK: reference parity (doubles the rejected delta)
        odom_now = jnp.where(thresholded, state.keyframe_pose @ trans @ radar_delta, odom_now)
        prev_trans_new = trans  # both branches store trans (:561-568, :581-584)

    trans_delta = lie.se3_inverse(state.keyframe_pose @ state.prev_trans) @ odom_now

    # --- keyframe gating (keyframe_updater.hpp:38-71)
    rel = lie.se3_inverse(state.keyframe_pose) @ odom_now
    kf_dx = jnp.linalg.norm(rel[:3, 3])
    kf_da = lie.rotation_angle(rel[:3, :3])
    is_kf = (kf_dx > odo_cfg.keyframe_delta_trans) | (kf_da > odo_cfg.keyframe_delta_angle)
    accum = state.accum_distance + jnp.where(is_kf, kf_dx, 0.0)

    # --- loose IMU roll/pitch fusion, applied only at keyframe acceptance
    # AFTER the keyframe decision, matching the reference order
    # (scan_matching_odometry_nodelet.cpp:584-596: decide() on the unfused
    # pose, then transformUpdate mutates odom_s2s_now which becomes the new
    # keyframe_pose). Roll/pitch come from the frame's accelerometer batch
    # (gravity direction) rather than the reference's external IMU
    # orientation filter — the redesign has no VectorNav AHRS stream.
    if odo_cfg.enable_imu_fusion:
        assert imu_roll is not None and imu_pitch is not None and imu_valid is not None
        fused = transform_update(
            odom_now, imu_roll, imu_pitch, odo_cfg.imu_fusion_ratio
        )
        odom_now = jnp.where(is_kf & imu_valid, fused, odom_now)

    # keyframe swap: target <- current cloud, prev_trans <- I (:590-601)
    def sel(a, b):
        return jnp.where(is_kf, a, b)

    new_target = jax.tree.map(sel, source, state.target)
    new_state = OdometryState(
        target=new_target,
        keyframe_pose=sel(odom_now, state.keyframe_pose),
        prev_trans=sel(eye4, prev_trans_new),
        egovel_trans=egovel_trans,
        last_time=jnp.asarray(t, dtype=dtype),
        accum_distance=accum,
        keyframe_index=state.keyframe_index + is_kf.astype(jnp.int32),
    )
    out = OdometryOutput(
        odom=odom_now,
        trans_delta=trans_delta,
        is_keyframe=is_kf,
        thresholded=thresholded,
        reg=reg,
        accum_distance=accum,
        pred_error=lie.se3_inverse(trans) @ guess,
    )
    return new_state, out
