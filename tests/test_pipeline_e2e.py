"""End-to-end engine test: full pipeline on a synthetic loop trajectory —
the replay-driver analogue of the reference's bag_player system test
(SURVEY.md §4), with the loop-closure path ACTIVE.

Scan-to-scan radar odometry on sparse synthetic scans drifts by design
(~5-10% of distance at this density); the contract under test is that the
activated loop pipeline detects the revisit and the global graph solve pulls
keyframe ATE far below raw odometry ATE.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu import pipeline
from rivslam_tpu.core.config import (
    BackendConfig,
    EngineConfig,
    LoopConfig,
    OdometryConfig,
    PreprocessConfig,
    RegistrationConfig,
)
from rivslam_tpu.eval import ate as ate_mod
from rivslam_tpu.io import synthetic

IMU_CAP = 64


@pytest.fixture(scope="module")
def run():
    rng = np.random.default_rng(21)
    world = synthetic.make_world(rng, n_points=20000)
    # one full lap + overlap: radius 10 m at 0.3 rad/s (3 m/s, 4.3 deg/frame
    # at 4 Hz — inside the registration's convergence basin)
    n_frames = 92
    radius, omega, dt = 10.0, 0.3, 0.25
    times, poses, vels = synthetic.circular_trajectory(
        n_frames, radius=radius, dt=dt, omega=omega
    )
    cfg = EngineConfig(
        # synthetic scans are instantaneous (no skew) and sparser than real
        # radar close-range returns (no 0.5 m radius filtering)
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False,
            outlier_removal_method="NONE",
            enable_deskew=False,
        ),
        odometry=OdometryConfig(use_ego_vel=True),
        # FAST_GICP: the drift-rate regime (~1.4%/distance on this scene)
        # the loop prefilter's drift-scaled ellipses are tuned for
        registration=RegistrationConfig(method="FAST_GICP"),
        backend=BackendConfig(max_solver_iterations=8),
        loop=LoopConfig(
            accum_distance_thresh=40.0,
            min_loop_interval_dist=5.0,
            # ~92 keyframes on this course; the default 2048-slot graph makes
            # every per-keyframe SC match pay 8x dead-slot work
            keyframe_capacity=256,
        ),
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    T0 = poses[0]
    odom_traj = []
    for i in range(n_frames):
        cloud = synthetic.observe(
            world, poses[i], rng, capacity=1024, noise=0.005,
            sensor_vel_world=vels[i], dtype=jnp.float64,
        )
        if i == 0:
            dts = np.zeros(IMU_CAP); acc = np.zeros((IMU_CAP, 3))
            gyr = np.zeros((IMU_CAP, 3)); m = np.zeros(IMU_CAP, dtype=bool)
        else:
            d, a, g = synthetic.circular_imu_samples(
                times[i - 1], times[i], rate=50.0, radius=radius, omega=omega
            )
            k = min(len(d), IMU_CAP)
            dts = np.zeros(IMU_CAP); acc = np.zeros((IMU_CAP, 3))
            gyr = np.zeros((IMU_CAP, 3)); m = np.zeros(IMU_CAP, dtype=bool)
            dts[:k], acc[:k], gyr[:k], m[:k] = d[:k], a[:k], g[:k], True
        out = eng.process_frame(cloud, times[i], dts, acc, gyr, m)
        odom_traj.append((times[i], out["odom"]))
    eng.finalize()
    gt = np.stack([np.linalg.inv(T0) @ poses[i] for i in range(n_frames)])
    return eng, gt, times, odom_traj


def _gt_at_stamps(gt, times, stamps):
    idx = [int(np.argmin(np.abs(times - s))) for s in stamps]
    return gt[idx]


def test_e2e_loop_detected(run):
    eng, gt, times, odom_traj = run
    n_loops = (
        int(np.asarray(eng.state.graph.loop_mask).sum())
        if eng.state.graph is not None
        else 0
    )
    assert n_loops >= 1, "revisit of the start was not detected"


def test_e2e_loop_closure_corrects_drift(run):
    eng, gt, times, odom_traj = run
    kf_poses = eng.optimized_keyframe_poses()
    kf_gt = _gt_at_stamps(gt, times, eng.state.kf_stamps)
    assert kf_poses.shape == kf_gt.shape
    opt_stats = ate_mod.ate(kf_poses[:, :3, 3], kf_gt[:, :3, 3], align=False)
    # raw odometry at those keyframes
    odom_poses = np.stack([T for _, T in odom_traj])
    odom_kf = _gt_at_stamps(odom_poses, times, eng.state.kf_stamps)
    odo_stats = ate_mod.ate(odom_kf[:, :3, 3], kf_gt[:, :3, 3], align=False)
    # the global solve must improve on raw odometry overall...
    assert opt_stats["rmse"] < odo_stats["rmse"], (opt_stats, odo_stats)
    # ...and specifically close the gap at the revisit (trajectory end),
    # where the loop constraint acts
    end_opt = np.linalg.norm(kf_poses[-1, :3, 3] - kf_gt[-1, :3, 3])
    end_odo = np.linalg.norm(odom_kf[-1, :3, 3] - kf_gt[-1, :3, 3])
    assert end_opt < 0.7 * end_odo, (end_opt, end_odo)


def test_e2e_full_trajectory_sane(run):
    eng, gt, times, odom_traj = run
    ts, est = eng.trajectory()
    assert len(est) == len(gt)
    assert np.isfinite(est).all()
    # window-backend trajectory tracks odometry (loop corrections live in the
    # global graph, as in the reference's separate loop_optimizer)
    stats = ate_mod.ate(est[:, :3, 3], gt[:, :3, 3], align=True)
    assert stats["rmse"] < 3.0, stats


def test_e2e_keyframes_and_graph(run):
    eng, gt, times, odom_traj = run
    assert eng.state.kf_count >= 30
    kf_poses = eng.optimized_keyframe_poses()
    assert kf_poses.shape[0] == eng.state.kf_count
    assert np.isfinite(kf_poses).all()


def test_e2e_timers_populated(run):
    eng, gt, times, odom_traj = run
    s = eng.timers.summary()
    # frame 0 initializes stage-by-stage; frames 1+ run the fused step
    for stage in ["preprocess", "backend", "frame_step"]:
        assert stage in s and s[stage]["count"] > 0
    assert "| stage |" in eng.timers.report()


def test_e2e_corrected_trajectory_propagates_loop(run):
    """VERDICT round-1 item #5: trajectory(corrected=True) retargets EVERY
    frame with the interpolated odom->map correction, so the full-frame
    trajectory benefits from loop closure (it must not be worse than the
    uncorrected one, and the trajectory end — where drift is largest and the
    loop constraint acts — must improve substantially)."""
    eng, gt, times, odom_traj = run
    ts, raw = eng.trajectory(corrected=False)
    ts2, corr = eng.trajectory(corrected=True)
    np.testing.assert_array_equal(ts, ts2)
    gt_f = _gt_at_stamps(gt, times, ts)
    r_raw = ate_mod.ate(raw[:, :3, 3], gt_f[:, :3, 3], align=False)
    r_corr = ate_mod.ate(corr[:, :3, 3], gt_f[:, :3, 3], align=False)
    assert r_corr["rmse"] < r_raw["rmse"], (r_corr, r_raw)
    end_raw = np.linalg.norm(raw[-1, :3, 3] - gt_f[-1, :3, 3])
    end_corr = np.linalg.norm(corr[-1, :3, 3] - gt_f[-1, :3, 3])
    assert end_corr < 0.8 * end_raw, (end_corr, end_raw)


def test_se3_log_near_pi_branch():
    """_se3_log_np must stay finite and exact through theta -> pi (the
    vee/sin form is singular there; a loop closure correcting ~180 deg of
    heading drift between consecutive keyframes would hit it and silently
    corrupt the exported trajectory)."""
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    for th in (np.pi, np.pi - 1e-5, np.pi - 1e-3, 2.5, 1e-10, 0.0):
        xi = np.concatenate([th * axis, [0.3, -0.2, 0.1]])
        T = pipeline._se3_exp_np(xi)
        xi2 = pipeline._se3_log_np(T)
        assert np.isfinite(xi2).all(), (th, xi2)
        np.testing.assert_allclose(
            pipeline._se3_exp_np(xi2), T, atol=1e-9, err_msg=f"theta={th}"
        )
