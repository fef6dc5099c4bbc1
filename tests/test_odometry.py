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
