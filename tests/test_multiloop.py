"""Multi-loop operation (VERDICT r2 item #4): a 2.6-lap course whose ground
truth forces repeated revisits, so the loop pipeline must

- close >= 2 distinct loops in one session,
- run the pairwise-consistency check against a REAL previous loop
  (loop_detector.cpp:270-297 — round 2 never composed it with one),
- survive a mid-run graph + scan-context-DB compaction with live loop
  edges (keyframe_capacity chosen so compaction fires after the first
  closures land), and keep closing loops afterwards.

Course/engine parameters deliberately match tests/test_pipeline_e2e.py's
single-lap fixture (same capacities, dtype, matcher) so the fused frame-step
program is shared via the persistent compile cache; only the loop-side
programs differ (smaller keyframe capacity).
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
N_FRAMES = 218  # 2.6 laps at omega=0.3, dt=0.25 (one lap = 83.8 frames)
KF_CAPACITY = 144  # ~every frame keyframes (0.75 m/frame vs 0.5 m gate), so
# compaction fires near frame ~144 — after the first revisit's closures
# (lap boundary ~84) — and again near the course end


@pytest.fixture(scope="module")
def run():
    rng = np.random.default_rng(21)
    world = synthetic.make_world(rng, n_points=20000)
    radius, omega, dt = 10.0, 0.3, 0.25
    times, poses, vels = synthetic.circular_trajectory(
        N_FRAMES, radius=radius, dt=dt, omega=omega
    )
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False,
            outlier_removal_method="NONE",
            enable_deskew=False,
        ),
        odometry=OdometryConfig(use_ego_vel=True),
        registration=RegistrationConfig(method="FAST_GICP"),
        backend=BackendConfig(max_solver_iterations=8),
        loop=LoopConfig(
            accum_distance_thresh=40.0,
            min_loop_interval_dist=5.0,
            keyframe_capacity=KF_CAPACITY,
        ),
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    epochs_at_accept = []  # compact_epoch value when each loop was accepted
    prev_accepted = 0
    for i in range(N_FRAMES):
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
        eng.process_frame(cloud, times[i], dts, acc, gyr, m)
        if eng.loop_stats["accepted"] > prev_accepted:
            prev_accepted = eng.loop_stats["accepted"]
            epochs_at_accept.append(eng.state.compact_epoch)
    eng.finalize()
    gt = np.stack([np.linalg.inv(poses[0]) @ poses[i] for i in range(N_FRAMES)])
    return eng, gt, times, epochs_at_accept


def test_multiple_loops_close(run):
    eng, gt, times, epochs = run
    assert eng.loop_stats["accepted"] >= 2, eng.loop_stats


def test_pairwise_check_ran_with_real_previous_loop(run):
    """>= 1 detection must have been consistency-checked against an actual
    previous loop (have_prev=True), exercising loop_detector.cpp:270-297 in
    composition — not just the `ok | ~have_prev` bypass."""
    eng, gt, times, epochs = run
    assert eng.loop_stats["pairwise_checked"] >= 1, eng.loop_stats


def test_compaction_with_live_loop_edges(run):
    """The graph filled past KF_CAPACITY with loop edges present, so at least
    one compaction ran with live loops; the surviving graph must keep its
    loop edges (endpoints are protected by _compact_keyframes) and keyframes
    must keep inserting afterwards."""
    eng, gt, times, epochs = run
    assert eng.state.compact_epoch >= 1
    # a loop accepted BEFORE the last compaction existed when it ran
    assert any(e < eng.state.compact_epoch for e in epochs), epochs
    n_live = int(np.asarray(eng.state.graph.loop_mask).sum())
    assert n_live >= 2, n_live
    li = np.asarray(eng.state.graph.loop_i)[np.asarray(eng.state.graph.loop_mask)]
    lj = np.asarray(eng.state.graph.loop_j)[np.asarray(eng.state.graph.loop_mask)]
    assert (li < eng.state.kf_count).all() and (lj < eng.state.kf_count).all()


def test_loops_still_close_after_compaction(run):
    """Compaction resets the pairwise memory and remaps node indices; the
    pipeline must keep accepting loops afterwards (new detections on the
    compacted graph), proving the SC DB + graph compaction composes with
    live operation."""
    eng, gt, times, epochs = run
    assert any(e >= 1 for e in epochs), epochs


def test_multiloop_graph_improves_on_odometry(run):
    eng, gt, times, epochs = run
    kf_poses = eng.optimized_keyframe_poses()
    idx = [int(np.argmin(np.abs(times - s))) for s in eng.state.kf_stamps]
    kf_gt = gt[idx]
    kf_odom = np.stack([T for T in np.asarray(eng.state.kf_odom)])
    opt = ate_mod.ate(kf_poses[:, :3, 3], kf_gt[:, :3, 3], align=False)
    odo = ate_mod.ate(kf_odom[:, :3, 3], kf_gt[:, :3, 3], align=False)
    assert np.isfinite(kf_poses).all()
    assert opt["rmse"] < odo["rmse"], (opt, odo)
