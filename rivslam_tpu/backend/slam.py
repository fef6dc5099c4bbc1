"""Sliding-window SLAM back end — the RadarGraphSlamNodelet re-design.

Parity with apps/radar_graph_slam_nodelet.cpp:207-587: every synced frame
becomes a window "keyframe" (the reference computes but never uses the
keyframe gate here, nodelet:267-279); the 6-frame window of
{pose, velocity, biases} is rebuilt and re-optimized from scratch each frame
(graph reset at :586); failure detection resets biases/velocity (:489-522,
1351-1371).

TPU-first: the window lives in rolled [W, ...] arrays inside one
BackendState pytree; `backend_step` (roll + preintegrate + rebuild factors +
window LM + failure handling) is a single jitted program. Reference quirks
kept: initial biases set to the noise densities with bg/ba swapped
(nodelet:180-186), the ego-velocity measurement rotated by the PRE-optimize
attitude each rebuild (:432), the previous keyframe's sensor-frame floor
coefficients reused as the fixed world plane node (:448-459).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import BackendConfig, ImuConfig
from rivslam_tpu.factors import infomat
from rivslam_tpu.factors import preintegration as pre
from rivslam_tpu.solver import window as win

DEFAULT_PLANE = (0.0, 0.0, 1.0, 0.5)  # nodelet:453
FLOOR_EDGE_STDDEV = 1.0e-6  # nodelet:128


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BackendFrame:
    """One synced (odom, cloud, floor, twist, imu-batch) input frame."""

    stamp: jax.Array  # []
    odom_R: jax.Array  # [3,3] scan-matching odometry pose
    odom_p: jax.Array  # [3]
    xyz: jax.Array  # [N,3]
    mask: jax.Array  # [N]
    ego_vel: jax.Array  # [3] body-frame ego velocity (REVE)
    ego_vel_cov: jax.Array  # [3] diagonal covariance of the twist
    imu_dts: jax.Array  # [K]
    imu_acc: jax.Array  # [K,3]
    imu_gyr: jax.Array  # [K,3]
    imu_mask: jax.Array  # [K]
    floor: jax.Array  # [4] sensor-frame plane coeffs
    floor_valid: jax.Array  # []


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BackendState:
    frame_mask: jax.Array  # [W]
    stamps: jax.Array  # [W]
    odom_R: jax.Array  # [W,3,3]
    odom_p: jax.Array  # [W,3]
    xyz: jax.Array  # [W,N,3]
    cloud_mask: jax.Array  # [W,N]
    nav: win.WindowState  # optimized states
    preint: pre.Preintegration  # [W] slot i integrates (i-1, i)
    preint_info: jax.Array  # [W,9,9]
    rel_R: jax.Array  # [W,3,3] cached odom relative measurement
    rel_p: jax.Array  # [W,3]
    rel_info: jax.Array  # [W,6,6] cached fitness-based info
    ego_vel: jax.Array  # [W,3] body-frame twist
    vel_info: jax.Array  # [W,3]
    floor: jax.Array  # [W,4]
    floor_valid: jax.Array  # [W]
    trans_aftmapped: jax.Array  # [4,4] latest optimized map pose


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BackendOutput:
    pose: jax.Array  # [4,4] optimized pose of the newest frame (map frame)
    pose_incremental: jax.Array  # [4,4] delta vs previous aftmapped
    trans_odom2map: jax.Array  # [4,4] correction odom->map
    chi2: jax.Array
    iterations: jax.Array
    failure: jax.Array  # [] bool (failure detection fired on newest frame)


def _initial_biases(imu_cfg: ImuConfig, dtype):
    # nodelet:180-186 — note the swapped assignment quirk
    b_a_in = jnp.full(3, imu_cfg.acc_bias_noise, dtype=dtype)
    b_g_in = jnp.full(3, imu_cfg.gyr_bias_noise, dtype=dtype)
    return b_g_in, b_a_in


def init_state(
    cfg: BackendConfig,
    imu_cfg: ImuConfig,
    cloud_capacity: int,
    dtype=jnp.float32,
) -> BackendState:
    W = cfg.window_size
    N = cloud_capacity
    b_g_in, b_a_in = _initial_biases(imu_cfg, dtype)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (W, 3, 3))
    return BackendState(
        frame_mask=jnp.zeros(W, dtype=bool),
        stamps=jnp.zeros(W, dtype=dtype),
        odom_R=eye,
        odom_p=jnp.zeros((W, 3), dtype=dtype),
        xyz=jnp.zeros((W, N, 3), dtype=dtype),
        cloud_mask=jnp.zeros((W, N), dtype=bool),
        nav=win.WindowState(
            R=eye,
            p=jnp.zeros((W, 3), dtype=dtype),
            v=jnp.zeros((W, 3), dtype=dtype),
            bg=jnp.broadcast_to(b_g_in, (W, 3)),
            ba=jnp.broadcast_to(b_a_in, (W, 3)),
        ),
        preint=jax.tree.map(
            lambda x: jnp.broadcast_to(x, (W,) + x.shape), pre.Preintegration.identity(dtype)
        ),
        preint_info=jnp.broadcast_to(jnp.eye(9, dtype=dtype), (W, 9, 9)),
        rel_R=eye,
        rel_p=jnp.zeros((W, 3), dtype=dtype),
        rel_info=jnp.broadcast_to(jnp.eye(6, dtype=dtype), (W, 6, 6)),
        ego_vel=jnp.zeros((W, 3), dtype=dtype),
        vel_info=jnp.full((W, 3), 10.0, dtype=dtype),
        floor=jnp.broadcast_to(jnp.asarray(DEFAULT_PLANE, dtype=dtype), (W, 4)),
        floor_valid=jnp.zeros(W, dtype=bool),
        trans_aftmapped=jnp.eye(4, dtype=dtype),
    )


def _roll(x):
    return jnp.roll(x, -1, axis=0)


def backend_step(
    state: BackendState,
    frame: BackendFrame,
    cfg: BackendConfig,
    imu_cfg: ImuConfig,
) -> tuple[BackendState, BackendOutput]:
    dtype = state.odom_p.dtype
    W = cfg.window_size
    is_first = ~jnp.any(state.frame_mask)

    # --- preintegrate with the last optimized biases (nodelet:347-372)
    last_nav = jax.tree.map(lambda a: a[-1], state.nav)
    p_int = pre.preintegrate(
        frame.imu_dts, frame.imu_acc, frame.imu_gyr, frame.imu_mask,
        last_nav.bg, last_nav.ba, imu_cfg.gyr_noise, imu_cfg.acc_noise,
    )
    preint_info = jnp.linalg.inv(
        p_int.cov + 1e-10 * jnp.eye(9, dtype=dtype)
    ) * cfg.inertial_weight

    # --- predicted navstate for the new frame (nodelet:375-378)
    from rivslam_tpu.core.navstate import NavState

    pred = pre.predict(
        NavState(t=state.stamps[-1], R=last_nav.R, p=last_nav.p, v=last_nav.v,
                 bg=last_nav.bg, ba=last_nav.ba),
        p_int, imu_cfg.gravity,
    )
    b_g_in, b_a_in = _initial_biases(imu_cfg, dtype)
    # first frame: seed from odometry (nodelet:300-312)
    new_R = jnp.where(is_first, frame.odom_R, pred.R)
    new_p = jnp.where(is_first, frame.odom_p, pred.p)
    new_v = jnp.where(is_first, jnp.zeros(3, dtype=dtype), pred.v)
    new_bg = jnp.where(is_first, b_g_in, pred.bg)
    new_ba = jnp.where(is_first, b_a_in, pred.ba)

    # --- cached relative odometry measurement + fitness info for the new pair
    prev_odom_R = state.odom_R[-1]
    prev_odom_p = state.odom_p[-1]
    rel_R_new = frame.odom_R.T @ prev_odom_R  # T_this^-1 T_prev (nodelet:418)
    rel_p_new = frame.odom_R.T @ (prev_odom_p - frame.odom_p)
    rel_T = lie.se3_matrix(rel_R_new, rel_p_new)
    rel_info_new = infomat.calc_information_matrix(
        frame.xyz, frame.mask, state.xyz[-1], state.cloud_mask[-1], rel_T, cfg
    )

    # --- velocity info from twist covariance (nodelet:434-444)
    cov_ok = jnp.all(frame.ego_vel_cov > 0)
    vel_info_new = jnp.where(cov_ok, 0.01 / jnp.maximum(frame.ego_vel_cov, 1e-12), 10.0)

    # --- roll the window and insert the new frame at slot W-1
    nav = win.WindowState(
        R=_roll(state.nav.R).at[-1].set(new_R),
        p=_roll(state.nav.p).at[-1].set(new_p),
        v=_roll(state.nav.v).at[-1].set(new_v),
        bg=_roll(state.nav.bg).at[-1].set(new_bg),
        ba=_roll(state.nav.ba).at[-1].set(new_ba),
    )
    st = BackendState(
        frame_mask=_roll(state.frame_mask).at[-1].set(True),
        stamps=_roll(state.stamps).at[-1].set(frame.stamp.astype(dtype)),
        odom_R=_roll(state.odom_R).at[-1].set(frame.odom_R),
        odom_p=_roll(state.odom_p).at[-1].set(frame.odom_p),
        xyz=_roll(state.xyz).at[-1].set(frame.xyz),
        cloud_mask=_roll(state.cloud_mask).at[-1].set(frame.mask),
        nav=nav,
        preint=jax.tree.map(lambda a, b: _roll(a).at[-1].set(b), state.preint, p_int),
        preint_info=_roll(state.preint_info).at[-1].set(preint_info),
        rel_R=_roll(state.rel_R).at[-1].set(rel_R_new),
        rel_p=_roll(state.rel_p).at[-1].set(rel_p_new),
        rel_info=_roll(state.rel_info).at[-1].set(rel_info_new),
        ego_vel=_roll(state.ego_vel).at[-1].set(frame.ego_vel),
        vel_info=_roll(state.vel_info).at[-1].set(vel_info_new),
        floor=_roll(state.floor).at[-1].set(
            jnp.where(frame.floor_valid, frame.floor, jnp.asarray(DEFAULT_PLANE, dtype=dtype))
        ),
        floor_valid=_roll(state.floor_valid).at[-1].set(True),
        trans_aftmapped=state.trans_aftmapped,
    )

    # --- build factors (nodelet:389-462)
    prev_floor = jnp.roll(st.floor, 1, axis=0)  # prev keyframe's coeffs as node
    vel_meas_world = jnp.einsum("wij,wj->wi", st.nav.R, st.ego_vel)  # pre-opt R
    factors = win.WindowFactors(
        frame_mask=st.frame_mask,
        rel_R=st.rel_R,
        rel_p=st.rel_p,
        rel_info=st.rel_info,
        prior_R=st.odom_R,
        prior_p=st.odom_p,
        prior_info=st.rel_info,  # same info for EdgePose (nodelet:422-424)
        preint=st.preint,
        preint_info=st.preint_info,
        vel_meas=vel_meas_world,
        vel_info=st.vel_info,
        plane_node=prev_floor,
        plane_meas=st.floor,
        plane_info=jnp.full((W,), 1.0 / FLOOR_EDGE_STDDEV, dtype=dtype),
        plane_valid=st.floor_valid,
    )
    bias_info = (1.0 / imu_cfg.gyr_noise**2, 1.0 / imu_cfg.acc_noise**2)

    nav_opt, chi2, iters = win.solve_window(
        st.nav, factors, cfg, bias_info, use_schur=cfg.use_schur
    )

    # --- failure detection + resets (nodelet:489-522, 1351-1371)
    bad = (
        (jnp.linalg.norm(nav_opt.v, axis=-1) > cfg.max_velocity)
        | (jnp.linalg.norm(nav_opt.ba, axis=-1) > cfg.max_bias)
        | (jnp.linalg.norm(nav_opt.bg, axis=-1) > cfg.max_bias)
    )
    ego_world = jnp.einsum("wij,wj->wi", st.nav.R, st.ego_vel)  # pre-opt R (quirk)
    nav_fixed = win.WindowState(
        R=nav_opt.R,
        p=jnp.where(bad[:, None], st.odom_p, nav_opt.p),
        v=jnp.where(bad[:, None], ego_world, nav_opt.v),
        bg=jnp.where(bad[:, None], b_g_in[None, :], nav_opt.bg),
        ba=jnp.where(bad[:, None], b_a_in[None, :], nav_opt.ba),
    )

    st = dataclasses.replace(st, nav=nav_fixed)
    pose = lie.se3_matrix(nav_fixed.R[-1], nav_fixed.p[-1])
    odom_T = lie.se3_matrix(st.odom_R[-1], st.odom_p[-1])
    trans_odom2map = pose @ lie.se3_inverse(odom_T)
    pose_inc = lie.se3_inverse(state.trans_aftmapped) @ pose
    st = dataclasses.replace(st, trans_aftmapped=pose)

    out = BackendOutput(
        pose=pose,
        pose_incremental=pose_inc,
        trans_odom2map=trans_odom2map,
        chi2=chi2,
        iterations=iters,
        failure=bad[-1],
    )
    return st, out
