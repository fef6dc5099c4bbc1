"""Back-end sliding-window SLAM on the synthetic circular trajectory:
frontend odometry + analytic IMU + ego velocity + floor -> optimized poses."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.backend import slam
from rivslam_tpu.core import lie
from rivslam_tpu.core.config import BackendConfig, ImuConfig, OdometryConfig, RegistrationConfig
from rivslam_tpu.eval import ate as ate_mod
from rivslam_tpu.frontend import apdgicp, odometry
from rivslam_tpu.io import synthetic

REG = RegistrationConfig(transformation_epsilon=5e-4)
ODO = OdometryConfig(use_ego_vel=True)
BK = BackendConfig(max_solver_iterations=16)
IMU = ImuConfig()
IMU_CAP = 64
N_FRAMES = 8
FRAME_DT = 0.25


def run_pipeline(n_frames=N_FRAMES, fail_frame=None):
    rng = np.random.default_rng(11)
    world = synthetic.make_world(rng, n_points=8000)
    times, poses, vels = synthetic.circular_trajectory(n_frames, dt=FRAME_DT, height=2.0)
    clouds = [
        synthetic.observe(
            world, poses[i], rng, capacity=640, noise=0.01,
            sensor_vel_world=vels[i], dtype=jnp.float64,
        )
        for i in range(n_frames)
    ]
    prepared = [apdgicp.estimate_covariances(c.xyz, c.mask, REG) for c in clouds]
    ego = [jnp.asarray(poses[i][:3, :3].T @ vels[i]) for i in range(n_frames)]

    odo_step = jax.jit(lambda s, cl, v, t: odometry.step(s, cl, v, t, ODO, REG))
    bk_step = jax.jit(lambda s, f: slam.backend_step(s, f, BK, IMU))

    odo_state = odometry.init_state(prepared[0], times[0], dtype=jnp.float64)
    bk_state = slam.init_state(BK, IMU, cloud_capacity=640, dtype=jnp.float64)

    # world ground plane z=0 seen from pose i
    def floor_of(i):
        from rivslam_tpu.factors import residuals

        return np.asarray(
            residuals.transform_plane(
                jnp.asarray(poses[i][:3, :3]), jnp.asarray(poses[i][:3, 3]),
                jnp.asarray([0.0, 0.0, 1.0, 0.0]),
            )
        )

    def imu_batch(i):
        if i == 0:
            dts = np.zeros(IMU_CAP)
            acc = np.zeros((IMU_CAP, 3))
            gyr = np.zeros((IMU_CAP, 3))
            m = np.zeros(IMU_CAP, dtype=bool)
        else:
            d, a, g = synthetic.circular_imu_samples(times[i - 1], times[i], rate=200.0)
            k = len(d)
            dts = np.zeros(IMU_CAP)
            acc = np.zeros((IMU_CAP, 3))
            gyr = np.zeros((IMU_CAP, 3))
            m = np.zeros(IMU_CAP, dtype=bool)
            dts[:k], acc[:k], gyr[:k], m[:k] = d, a, g, True
        return dts, acc, gyr, m

    est_poses = []
    outs = []
    odom_pose = jnp.eye(4, dtype=jnp.float64)
    T0 = poses[0]
    for i in range(n_frames):
        if i > 0:
            odo_state, oout = odo_step(odo_state, prepared[i], ego[i], times[i])
            odom_pose = oout.odom
        dts, acc, gyr, m = imu_batch(i)
        ego_i = np.asarray(ego[i])
        cov_i = np.full(3, 1e-3)
        if fail_frame is not None and i == fail_frame:
            ego_i = ego_i * 0 + 500.0  # absurd ego velocity (forces failure path)
        f = slam.BackendFrame(
            stamp=jnp.asarray(times[i], jnp.float64),
            odom_R=odom_pose[:3, :3],
            odom_p=odom_pose[:3, 3],
            xyz=clouds[i].xyz,
            mask=clouds[i].mask,
            ego_vel=jnp.asarray(ego_i),
            ego_vel_cov=jnp.asarray(cov_i),
            imu_dts=jnp.asarray(dts),
            imu_acc=jnp.asarray(acc),
            imu_gyr=jnp.asarray(gyr),
            imu_mask=jnp.asarray(m),
            floor=jnp.asarray(floor_of(i)),
            floor_valid=jnp.asarray(True),
        )
        bk_state, bout = bk_step(bk_state, f)
        est_poses.append(np.asarray(bout.pose))
        outs.append(bout)
    gt_rel = np.stack([np.linalg.inv(T0) @ poses[i] for i in range(n_frames)])
    return np.stack(est_poses), gt_rel, outs, bk_state


def test_backend_tracks_trajectory():
    est, gt, outs, _ = run_pipeline()
    stats = ate_mod.ate(est[:, :3, 3], gt[:, :3, 3], align=False)
    # the reference's information weighting makes the scan-matching priors
    # dominate, so the backend should track the front-end odometry quality
    # (~1 m drift over 8 sparse synthetic frames), never diverge
    assert stats["rmse"] < 1.6, stats
    # chi2 finite, solver ran
    for o in outs[1:]:
        assert np.isfinite(float(o.chi2))


def test_backend_failure_detection_resets():
    est, gt, outs, st = run_pipeline(fail_frame=5)
    # velocity reset keeps states bounded
    assert np.isfinite(est).all()
    v = np.asarray(st.nav.v)
    assert np.linalg.norm(v, axis=1).max() < 1000.0


def test_trans_odom2map_consistency():
    est, gt, outs, _ = run_pipeline(n_frames=5)
    o = outs[-1]
    # pose = trans_odom2map @ odom must hold by construction
    # (checked via the reported incremental pose chain)
    acc = np.asarray(outs[0].pose)
    for out in outs[1:]:
        acc = acc @ np.asarray(out.pose_incremental)
        np.testing.assert_allclose(acc, np.asarray(out.pose), atol=1e-6)


def test_backend_with_schur():
    """Schur-complement window solve produces the same backend trajectory."""
    import dataclasses

    global BK
    orig = BK
    try:
        BK = dataclasses.replace(BK, use_schur=True)
        est, gt, outs, _ = run_pipeline(n_frames=5)
        assert np.isfinite(est).all()
    finally:
        BK = orig
