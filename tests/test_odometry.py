import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import OdometryConfig, RegistrationConfig
from rivslam_tpu.frontend import apdgicp, odometry
from rivslam_tpu.io import synthetic

REG = RegistrationConfig(transformation_epsilon=5e-4)
ODO = OdometryConfig(use_ego_vel=True)


def run_sequence(n_frames=10, capacity=768):
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=8000)
    times, poses, vels = synthetic.circular_trajectory(n_frames, dt=0.25)
    clouds = [
        synthetic.observe(
            world, poses[i], rng, capacity=capacity, noise=0.01,
            sensor_vel_world=vels[i], dtype=jnp.float64,
        )
        for i in range(n_frames)
    ]
    prepared = [apdgicp.estimate_covariances(c.xyz, c.mask, REG) for c in clouds]
    ego = [jnp.asarray(poses[i][:3, :3].T @ vels[i]) for i in range(n_frames)]

    step = jax.jit(
        lambda s, cl, v, t: odometry.step(s, cl, v, t, ODO, REG)
    )
    state = odometry.init_state(prepared[0], times[0], dtype=jnp.float64)
    outs = []
    for i in range(1, n_frames):
        state, out = step(state, prepared[i], ego[i], times[i])
        outs.append(out)
    return times, poses, outs


def test_odometry_tracks_trajectory():
    times, poses, outs = run_sequence()
    # odometry pose i is relative to the first frame
    T0 = poses[0]
    for i, out in enumerate(outs, start=1):
        gt_rel = np.linalg.inv(T0) @ poses[i]
        est = np.asarray(out.odom)
        delta = np.linalg.inv(est) @ gt_rel
        dt_err = np.linalg.norm(delta[:3, 3])
        dr_err = float(lie.rotation_angle(jnp.asarray(delta[:3, :3]))) * 180 / np.pi
        assert dt_err < 0.5, f"frame {i}: drift {dt_err:.3f} m"
        assert dr_err < 3.0, f"frame {i}: rot drift {dr_err:.2f} deg"


def test_keyframes_created():
    times, poses, outs = run_sequence()
    kf = [bool(o.is_keyframe) for o in outs]
    # the trajectory moves ~0.75 m/frame with 0.5 m keyframe gate -> several
    assert sum(kf) >= len(outs) // 2


def test_incremental_odometry_consistency():
    times, poses, outs = run_sequence(n_frames=6)
    # trans_delta composes to odom
    acc = np.asarray(outs[0].odom)
    for out in outs[1:]:
        acc = acc @ np.asarray(out.trans_delta)
        np.testing.assert_allclose(acc, np.asarray(out.odom), atol=1e-8)


def test_transform_threshold_quirk():
    """The reference's too-large-transform fallback composes
    keyframe_pose @ trans @ radar_delta (double-applying the delta,
    scan_matching_odometry_nodelet.cpp:561-568) — reproduced exactly."""
    import dataclasses

    rng = np.random.default_rng(3)
    # craft a state where registration will report a large jump:
    # target = cloud shifted by 2 m, so reg.T ~ [2,0,0] while prev_trans = I
    pts = rng.normal(size=(200, 3)) * 5
    src = apdgicp.prepare(jnp.asarray(pts), jnp.ones(200, bool), REG)
    shifted = pts + np.array([2.0, 0, 0])
    tgt = apdgicp.prepare(jnp.asarray(shifted), jnp.ones(200, bool), REG)
    st = odometry.init_state(tgt, 0.0, dtype=jnp.float64)
    st2, out = odometry.step(st, src, jnp.zeros(3), jnp.asarray(0.1), OdometryConfig(), REG)
    assert bool(out.thresholded)
    # odom = keyframe_pose @ trans @ radar_delta = trans @ trans (prev = I)
    T = np.asarray(out.reg.T)
    np.testing.assert_allclose(np.asarray(out.odom), T @ T, atol=1e-9)


def test_transform_update_imu_fusion():
    """enable_imu_fusion path: yaw preserved, roll/pitch blended."""
    odom = np.eye(4)
    R = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.03, 0.7])))  # some pose
    odom[:3, :3] = R
    ypr0 = np.asarray(lie.ypr_from_rot(jnp.asarray(R)))
    out = odometry.transform_update(
        jnp.asarray(odom), jnp.asarray(0.1), jnp.asarray(-0.05), fusion_ratio=1.0
    )
    ypr1 = np.asarray(lie.ypr_from_rot(out[:3, :3]))
    np.testing.assert_allclose(ypr1[0], ypr0[0], atol=1e-9)  # yaw unchanged
    np.testing.assert_allclose(ypr1[2], 0.1, atol=1e-9)  # roll = imu
    np.testing.assert_allclose(ypr1[1], -0.05, atol=1e-9)  # pitch = imu
    # ratio 0: unchanged
    out0 = odometry.transform_update(
        jnp.asarray(odom), jnp.asarray(0.1), jnp.asarray(-0.05), fusion_ratio=0.0
    )
    np.testing.assert_allclose(np.asarray(out0), odom, atol=1e-9)
    # gravity-based roll/pitch: level sensor -> zeros
    r, p = odometry.roll_pitch_from_gravity(jnp.asarray([0.0, 0.0, 9.8]))
    np.testing.assert_allclose([float(r), float(p)], 0.0, atol=1e-9)


def test_imu_fusion_corrects_tilted_keyframe():
    """End-to-end step path (VERDICT round-1 item #4): with
    enable_imu_fusion, a roll-drifted odometry is pulled toward the
    gravity-derived (level) attitude at keyframe acceptance, by
    imu_fusion_ratio; without the flag the drift persists untouched."""
    rng = np.random.default_rng(11)
    world = synthetic.make_world(rng, n_points=8000)
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = [1.0, 0.0, 0.0]  # 1 m > 0.5 m keyframe gate
    c0 = synthetic.observe(world, T0, rng, capacity=768, noise=0.01, dtype=jnp.float64)
    c1 = synthetic.observe(world, T1, rng, capacity=768, noise=0.01, dtype=jnp.float64)
    p0 = apdgicp.estimate_covariances(c0.xyz, c0.mask, REG)
    p1 = apdgicp.estimate_covariances(c1.xyz, c1.mask, REG)

    roll_err = 0.1  # rad of accumulated roll drift in the keyframe pose
    state = odometry.init_state(p0, 0.0, dtype=jnp.float64)
    tilted = jnp.asarray(
        np.block(
            [
                [np.asarray(lie.so3_exp(jnp.asarray([roll_err, 0.0, 0.0], jnp.float64))),
                 np.zeros((3, 1))],
                [np.zeros((1, 3)), np.ones((1, 1))],
            ]
        )
    )
    state = odometry.OdometryState(
        target=state.target, keyframe_pose=tilted, prev_trans=state.prev_trans,
        egovel_trans=state.egovel_trans, last_time=state.last_time,
        accum_distance=state.accum_distance, keyframe_index=state.keyframe_index,
    )
    ratio = 0.5
    cfg_on = OdometryConfig(enable_imu_fusion=True, imu_fusion_ratio=ratio)
    imu_kw = dict(
        imu_roll=jnp.asarray(0.0, jnp.float64),
        imu_pitch=jnp.asarray(0.0, jnp.float64),
        imu_valid=jnp.asarray(True),
    )
    new_state, out = odometry.step(
        state, p1, jnp.zeros(3, jnp.float64), jnp.asarray(0.25, jnp.float64),
        cfg_on, REG, **imu_kw,
    )
    assert bool(out.is_keyframe)
    ypr = np.asarray(lie.ypr_from_rot(new_state.keyframe_pose[:3, :3]))
    np.testing.assert_allclose(ypr[2], (1 - ratio) * roll_err, atol=0.02)

    # control: fusion off leaves the full drift in place
    new_state0, out0 = odometry.step(
        state, p1, jnp.zeros(3, jnp.float64), jnp.asarray(0.25, jnp.float64),
        OdometryConfig(), REG,
    )
    ypr0 = np.asarray(lie.ypr_from_rot(new_state0.keyframe_pose[:3, :3]))
    np.testing.assert_allclose(ypr0[2], roll_err, atol=0.02)


def test_thresholding_fallback_egovel_vs_quirk():
    """A too-large scan-match delta (> max_acceptable_trans) is replaced by
    ego-velocity dead reckoning under thresholding_fallback="EGOVEL"; the
    default "QUIRK" branch reproduces the reference's amplification
    (keyframe_pose @ trans @ radar_delta, nodelet:561-568)."""
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=8000)
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, 3] = [1.8, 0.0, 0.0]  # true jump 1.8 m > 1.0 m gate
    c0 = synthetic.observe(world, T0, rng, capacity=768, noise=0.01, dtype=jnp.float64)
    c1 = synthetic.observe(world, T1, rng, capacity=768, noise=0.01, dtype=jnp.float64)
    p0 = apdgicp.estimate_covariances(c0.xyz, c0.mask, REG)
    p1 = apdgicp.estimate_covariances(c1.xyz, c1.mask, REG)
    state = odometry.init_state(p0, 0.0, dtype=jnp.float64)
    ego_v = jnp.asarray([0.9, 0.0, 0.0], jnp.float64)  # 0.9 m over dt=1

    cfg_ego = OdometryConfig(thresholding_fallback="EGOVEL", use_ego_vel=True)
    _, out = odometry.step(state, p1, ego_v, jnp.asarray(1.0, jnp.float64), cfg_ego, REG)
    assert bool(out.thresholded)
    np.testing.assert_allclose(
        np.asarray(out.odom[:3, 3]), [0.9, 0.0, 0.0], atol=0.05
    )

    cfg_q = OdometryConfig(thresholding_fallback="QUIRK", use_ego_vel=True)
    _, outq = odometry.step(state, p1, ego_v, jnp.asarray(1.0, jnp.float64), cfg_q, REG)
    assert bool(outq.thresholded)
    # quirk: delta applied twice -> ~3.6 m
    assert float(jnp.linalg.norm(outq.odom[:3, 3])) > 3.0
