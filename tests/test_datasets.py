import numpy as np
import jax.numpy as jnp

from rivslam_tpu.io import datasets, synthetic
from rivslam_tpu import pipeline
from rivslam_tpu.core.config import EngineConfig, PreprocessConfig


def make_sequence(n_frames=5, rng=None):
    rng = rng or np.random.default_rng(9)
    world = synthetic.make_world(rng, n_points=6000)
    times, poses, vels = synthetic.circular_trajectory(n_frames, radius=10.0, dt=0.25, omega=0.3)
    frames = []
    for i in range(n_frames):
        c = synthetic.observe(world, poses[i], rng, capacity=256, noise=0.01,
                              sensor_vel_world=vels[i], dtype=jnp.float64)
        m = np.asarray(c.mask)
        frames.append(dict(
            stamp=float(times[i]), xyz=np.asarray(c.xyz)[m],
            doppler=np.asarray(c.doppler)[m], intensity=np.asarray(c.intensity)[m],
        ))
    imu_t = np.arange(0.0, times[-1] + 0.02, 0.02)
    imu_a = np.tile([0.0, 0, 9.80511], (len(imu_t), 1))
    imu_g = np.tile([0.0, 0, 0.3], (len(imu_t), 1))
    return datasets.RadarSequence.from_frames(frames, imu_t, imu_a, imu_g), poses


def test_sequence_roundtrip(tmp_path):
    seq, _ = make_sequence()
    p = str(tmp_path / "seq.npz")
    seq.save(p)
    seq2 = datasets.RadarSequence.load(p)
    assert seq2.num_frames == seq.num_frames
    f1, f2 = seq.frame(2), seq2.frame(2)
    np.testing.assert_allclose(f1["xyz"], f2["xyz"])
    np.testing.assert_allclose(f1["doppler"], f2["doppler"])


def test_imu_between():
    seq, _ = make_sequence()
    dts, acc, gyr, m = seq.imu_between(0.0, 0.25, capacity=32)
    k = int(m.sum())
    assert 10 <= k <= 13  # ~12 samples at 50 Hz
    assert abs(dts[:k].sum() - 0.25) < 0.03
    np.testing.assert_allclose(gyr[:k, 2], 0.3)


def test_targets_to_xyz_sign_convention():
    """Reference negates z for RadarScanExtended (cloud_callback_scan:336)."""
    xyz = datasets.targets_to_xyz(np.array([10.0]), np.array([0.0]), np.array([0.2]))
    assert xyz[0, 2] < 0  # positive elevation -> negative z (the quirk)
    np.testing.assert_allclose(np.linalg.norm(xyz[0]), 10.0, atol=1e-9)


def test_replay_driver():
    seq, poses = make_sequence()
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False,
        )
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    outs = datasets.replay(eng, seq, capacity=256, imu_capacity=32)
    assert len(outs) == seq.num_frames
    assert all(np.isfinite(o["pose"]).all() for o in outs)
    ts, est = eng.trajectory()
    assert len(est) == seq.num_frames


def test_status_and_highrate_prediction():
    seq, poses = make_sequence()
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False,
        )
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    outs = datasets.replay(eng, seq, capacity=256, imu_capacity=32)
    # ScanMatchingStatus fields present from frame 1 on
    assert outs[0]["status"] is None
    st = outs[-1]["status"]
    assert set(st) >= {"has_converged", "matching_error", "inlier_fraction",
                       "relative_pose", "num_correspondences"}
    # IMU-rate prediction produces a finite pose
    K = 32
    T = eng.predict_highrate(np.full(K, 0.005), np.tile([0, 0, 9.80511], (K, 1)),
                             np.zeros((K, 3)), np.ones(K, dtype=bool))
    assert T is not None and np.isfinite(T).all()


def test_imu_extrinsics_applied():
    """apply_extrinsics rotates IMU samples by ext_rot (imuConverter parity)."""
    import dataclasses
    from rivslam_tpu.core.config import ImuConfig

    seq, poses = make_sequence(n_frames=3)
    base = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False,
        )
    )
    cfg = dataclasses.replace(base, imu=ImuConfig(apply_extrinsics=True))
    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    outs = datasets.replay(eng, seq, capacity=256, imu_capacity=32)
    assert all(np.isfinite(o["pose"]).all() for o in outs)


def test_scan_extended_ingest_through_engine():
    """RadarScanExtended-style spherical ingest -> shim -> full engine."""
    rng = np.random.default_rng(12)
    world = synthetic.make_world(rng, n_points=8000)
    times, poses, vels = synthetic.circular_trajectory(4, radius=10.0, dt=0.25, omega=0.3)
    frames = []
    for i in range(4):
        c = synthetic.observe(world, poses[i], rng, capacity=256, noise=0.01,
                              sensor_vel_world=vels[i], dtype=jnp.float64)
        m = np.asarray(c.mask)
        xyz = np.asarray(c.xyz)[m]
        # to spherical (reference convention: z = -r sin(el))
        r = np.linalg.norm(xyz, axis=1)
        az = np.arctan2(xyz[:, 1], xyz[:, 0])
        el = np.arcsin(np.clip(-xyz[:, 2] / r, -1, 1))
        back = datasets.targets_to_xyz(r, az, el)
        np.testing.assert_allclose(back, xyz, atol=1e-9)
        frames.append(dict(stamp=float(times[i]), xyz=back,
                           doppler=np.asarray(c.doppler)[m],
                           intensity=np.asarray(c.intensity)[m]))
    imu_t = np.arange(0.0, times[-1] + 0.02, 0.02)
    seq = datasets.RadarSequence.from_frames(
        frames, imu_t, np.tile([0, 0, 9.80511], (len(imu_t), 1)), np.zeros((len(imu_t), 3))
    )
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False,
        )
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    outs = datasets.replay(eng, seq, capacity=256, imu_capacity=32)
    assert all(np.isfinite(o["pose"]).all() for o in outs)
