"""Async loop-closure worker (LoopConfig.async_loop).

The reference runs its loop path on a wall timer + separate loop_optimizer,
asynchronous to the frame callback (radar_graph_slam_nodelet.cpp:177,
652-778); here the same architecture is a background worker thread whose
results merge into the live graph at the next frame. Contracts under test:

1. draining the worker after every frame reproduces the synchronous path
   BIT-EXACTLY (same loops, same solved graph, same corrected trajectory);
2. the merge re-chains keyframes inserted after the worker's snapshot onto
   the solved poses with their raw odometry deltas;
3. one-job-in-flight cadence: keyframes arriving while the worker is busy
   are skipped (the reference's timer-overrun behavior);
4. worker exceptions surface on the main thread, not silently.
"""

import threading
import time

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
from rivslam_tpu.io import synthetic

IMU_CAP = 64


def _cfg(async_loop: bool) -> EngineConfig:
    # the known-good e2e loop recipe (tests/test_pipeline_e2e.py)
    return EngineConfig(
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
            async_loop=async_loop,
            # ~92 keyframes on this course; the default 2048-slot graph
            # makes every per-keyframe SC match pay 8x dead-slot work
            keyframe_capacity=256,
        ),
    )


def test_async_drained_matches_sync_bit_exact():
    """Interleaved run of a sync engine and an async engine (drained after
    every frame) on the same loop course: identical keyframes, identical
    loop edges, and a bit-identical solved global graph."""
    rng = np.random.default_rng(21)
    world = synthetic.make_world(rng, n_points=20000)
    n_frames = 92
    radius, omega, dt = 10.0, 0.3, 0.25
    times, poses, vels = synthetic.circular_trajectory(
        n_frames, radius=radius, dt=dt, omega=omega
    )
    eng_s = pipeline.Engine(_cfg(False), dtype=jnp.float64)
    eng_a = pipeline.Engine(_cfg(True), dtype=jnp.float64)
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
        out_s = eng_s.process_frame(cloud, times[i], dts, acc, gyr, m)
        out_a = eng_a.process_frame(cloud, times[i], dts, acc, gyr, m)
        # drain: the worker's result is merged before the next frame, which
        # makes the async path equivalent to the synchronous one
        applied = eng_a.drain_loops()
        assert out_s["is_keyframe"] == out_a["is_keyframe"]
        assert bool(out_s["loop_found"]) == bool(applied or out_a["loop_found"])
        np.testing.assert_array_equal(out_s["odom"], out_a["odom"])
    eng_s.finalize()
    eng_a.finalize()
    gs, ga = eng_s.state.graph, eng_a.state.graph

    n_loops = int(np.asarray(gs.loop_mask).sum())
    assert n_loops >= 1, "course did not close a loop; contract untestable"
    np.testing.assert_array_equal(np.asarray(gs.loop_mask), np.asarray(ga.loop_mask))
    np.testing.assert_array_equal(np.asarray(gs.loop_i), np.asarray(ga.loop_i))
    np.testing.assert_array_equal(np.asarray(gs.loop_j), np.asarray(ga.loop_j))
    np.testing.assert_array_equal(np.asarray(gs.loop_rel_p), np.asarray(ga.loop_rel_p))
    # solved graph bit-identical (same programs, same inputs, drain makes
    # the merge a pure copy of the worker's solution)
    np.testing.assert_array_equal(np.asarray(gs.R), np.asarray(ga.R))
    np.testing.assert_array_equal(np.asarray(gs.p), np.asarray(ga.p))
    # corrected full-frame trajectories identical
    _, tr_s = eng_s.trajectory(corrected=True)
    _, tr_a = eng_a.trajectory(corrected=True)
    np.testing.assert_array_equal(tr_s, tr_a)
    assert eng_a._loop_skipped == 0  # drain leaves the worker always free
    eng_a.close()


def test_merge_chain_rechains_new_keyframes():
    """Nodes <= k_snap take the solved poses; newer nodes re-chain their raw
    odometry deltas onto them; slots >= count keep live values."""
    eng = pipeline.Engine(EngineConfig(), dtype=jnp.float64)
    K, k_snap, count = 8, 2, 5
    rng = np.random.default_rng(3)

    def rot(th):
        c, s = np.cos(th), np.sin(th)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    live_R = np.stack([rot(0.1 * i) for i in range(K)])
    live_p = rng.standard_normal((K, 3))
    solved_R = np.stack([rot(-0.2 * i) for i in range(K)])
    solved_p = rng.standard_normal((K, 3))
    rel_R = np.stack([rot(0.05 * i) for i in range(K)])
    rel_p = rng.standard_normal((K, 3))
    mR, mp = eng._merge_chain(
        jnp.asarray(live_R), jnp.asarray(live_p),
        jnp.asarray(solved_R), jnp.asarray(solved_p),
        jnp.asarray(rel_R), jnp.asarray(rel_p),
        jnp.asarray(k_snap), jnp.asarray(count),
    )
    mR, mp = np.asarray(mR), np.asarray(mp)
    # solved region
    np.testing.assert_array_equal(mR[: k_snap + 1], solved_R[: k_snap + 1])
    np.testing.assert_array_equal(mp[: k_snap + 1], solved_p[: k_snap + 1])
    # re-chained region: pose_i = pose_{i-1} ∘ rel_i
    T = np.eye(4)
    T[:3, :3], T[:3, 3] = solved_R[k_snap], solved_p[k_snap]
    for i in range(k_snap + 1, count):
        D = np.eye(4)
        D[:3, :3], D[:3, 3] = rel_R[i], rel_p[i]
        T = T @ D
        np.testing.assert_allclose(mR[i], T[:3, :3], atol=1e-12)
        np.testing.assert_allclose(mp[i], T[:3, 3], atol=1e-12)
    # dead slots untouched
    np.testing.assert_array_equal(mR[count:], live_R[count:])
    np.testing.assert_array_equal(mp[count:], live_p[count:])


def test_one_job_in_flight_skips_and_drains(monkeypatch):
    """While the worker is busy, further keyframes skip detection (the
    reference's timer-overrun cadence); drain waits for the in-flight job."""
    eng = pipeline.Engine(
        EngineConfig(loop=LoopConfig(async_loop=True)), dtype=jnp.float64
    )
    release = threading.Event()
    seen = []

    def slow_detect(snap):
        seen.append(snap["k"])
        release.wait(timeout=10.0)
        return None

    monkeypatch.setattr(eng, "_run_loop_detection", slow_detect)
    eng._submit_loop_job({"k": 1, "epoch": 0})
    # give the worker time to pick the job up
    for _ in range(100):
        if seen:
            break
        time.sleep(0.01)
    assert seen == [1]
    eng._submit_loop_job({"k": 2, "epoch": 0})  # worker busy -> skipped
    assert eng._loop_skipped == 1
    release.set()
    applied = eng.drain_loops()
    assert applied is False  # detection returned None
    assert not eng._loop_busy
    eng._submit_loop_job({"k": 3, "epoch": 0})  # free again after drain
    release.set()
    eng.drain_loops()
    assert seen == [1, 3]
    eng.close()


def test_worker_exception_surfaces(monkeypatch):
    eng = pipeline.Engine(
        EngineConfig(loop=LoopConfig(async_loop=True)), dtype=jnp.float64
    )

    def boom(snap):
        raise RuntimeError("loop worker exploded")

    monkeypatch.setattr(eng, "_run_loop_detection", boom)
    eng._submit_loop_job({"k": 1, "epoch": 0})
    with pytest.raises(RuntimeError, match="loop worker exploded"):
        eng.drain_loops()
    # the error is consumed; the engine keeps running
    assert eng.drain_loops() is False
    eng.close()


def test_stale_epoch_result_dropped(monkeypatch):
    """Results computed against a pre-compaction snapshot must be dropped
    (their node indices no longer exist)."""
    eng = pipeline.Engine(
        EngineConfig(loop=LoopConfig(async_loop=True)), dtype=jnp.float64
    )
    det = {"k": 5, "idx": 1, "epoch": 0}
    fake_solved = type("G", (), {"R": None, "p": None})()
    monkeypatch.setattr(eng, "_run_loop_detection", lambda snap: det)
    monkeypatch.setattr(eng, "_add_loop_edge", lambda g, d: object())
    monkeypatch.setattr(eng, "_solve_graph", lambda g: (fake_solved, 0.0))
    accepted = []
    monkeypatch.setattr(eng, "_accept_loop", lambda d, solved: accepted.append(d) or True)
    eng.state.compact_epoch = 1  # compaction happened while job ran
    eng._submit_loop_job({"k": 5, "epoch": 0, "graph": None})
    eng.drain_loops()
    assert accepted == []  # stale result dropped
    eng.close()
