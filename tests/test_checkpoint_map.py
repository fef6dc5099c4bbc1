import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu import pipeline
from rivslam_tpu.backend import map as map_mod
from rivslam_tpu.core.config import EngineConfig, PreprocessConfig
from rivslam_tpu.io import checkpoint, synthetic


@pytest.fixture(scope="module")
def session():
    return _small_session()


def _small_session(n_frames=6):
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=8000)
    times, poses, vels = synthetic.circular_trajectory(n_frames, radius=10.0, dt=0.25, omega=0.3)
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False,
        )
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float64)
    K = 32
    for i in range(n_frames):
        cloud = synthetic.observe(
            world, poses[i], rng, capacity=256, noise=0.01,
            sensor_vel_world=vels[i], dtype=jnp.float64,
        )
        dts = np.full(K, 0.02); acc = np.zeros((K, 3)); gyr = np.zeros((K, 3))
        m = np.zeros(K, dtype=bool)
        if i > 0:
            d, a, g = synthetic.circular_imu_samples(times[i - 1], times[i], rate=50.0, radius=10.0, omega=0.3)
            kk = min(len(d), K)
            dts[:kk], acc[:kk], gyr[:kk], m[:kk] = d[:kk], a[:kk], g[:kk], True
        eng.process_frame(cloud, times[i], dts, acc, gyr, m)
    return eng, cfg


def test_dump_load_roundtrip(tmp_path, session):
    eng, cfg = session
    d = str(tmp_path / "ckpt")
    checkpoint.dump(eng, d)
    assert os.path.exists(os.path.join(d, "manifest.json"))

    eng2 = pipeline.Engine(cfg, dtype=jnp.float64)
    checkpoint.load(eng2, d)
    assert eng2.state.frame_idx == eng.state.frame_idx
    assert eng2.state.kf_count == eng.state.kf_count
    np.testing.assert_allclose(
        np.asarray(eng2.state.backend.nav.p), np.asarray(eng.state.backend.nav.p)
    )
    np.testing.assert_allclose(
        np.asarray(eng2.state.odo.keyframe_pose), np.asarray(eng.state.odo.keyframe_pose)
    )
    np.testing.assert_allclose(
        np.asarray(eng2.state.graph.p), np.asarray(eng.state.graph.p)
    )
    t1, p1 = eng.trajectory()
    t2, p2 = eng2.trajectory()
    np.testing.assert_allclose(p1, p2)


def test_resume_continues(tmp_path, session):
    """Resume-and-continue: loaded engine processes further frames sanely."""
    eng, cfg = session
    d = str(tmp_path / "ckpt")
    checkpoint.dump(eng, d)
    eng2 = pipeline.Engine(cfg, dtype=jnp.float64)
    checkpoint.load(eng2, d)
    rng = np.random.default_rng(6)
    world = synthetic.make_world(rng, n_points=8000)
    T = np.eye(4); T[:3, 3] = [10, 1, 2.0]
    cloud = synthetic.observe(world, T, rng, capacity=256, noise=0.01, dtype=jnp.float64)
    K = 32
    out = eng2.process_frame(
        cloud, 2.0, np.full(K, 0.02), np.zeros((K, 3)), np.zeros((K, 3)),
        np.ones(K, dtype=bool),
    )
    assert np.isfinite(out["pose"]).all()
    assert eng2.state.frame_idx == eng.state.frame_idx + 1


def test_map_generation(tmp_path, session):
    eng, cfg = session
    st = eng.state
    kf_xyz = jnp.stack([x for x, _ in st.kf_clouds])
    kf_mask = jnp.stack([m for _, m in st.kf_clouds])
    poses = jnp.asarray(eng.optimized_keyframe_poses())
    map_xyz, valid = map_mod.assemble_map(kf_xyz, kf_mask, poses, resolution=0.2)
    n = int(valid.sum())
    assert n > 100
    pts = np.asarray(map_xyz)[np.asarray(valid)]
    # voxel centers: quantized coordinates
    q = pts / 0.2 - 0.5
    np.testing.assert_allclose(q, np.round(q), atol=1e-6)
    # pcd round trip
    p = str(tmp_path / "map.pcd")
    map_mod.save_map_pcd(p, pts)
    back = map_mod.load_pcd(p)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_viz_export(tmp_path, session):
    from rivslam_tpu.eval import viz

    eng, cfg = session
    prefix = str(tmp_path / "session")
    written = viz.export_session(eng, prefix)
    assert "trajectory" in written and os.path.exists(written["trajectory"])
    assert "keyframes" in written and "map" in written
    with open(written["graph"]) as f:
        import json

        g = json.load(f)
    assert g["num_keyframes"] == eng.state.kf_count
    assert len(g["odometry_edges"]) == eng.state.kf_count - 1
    # ply parses: first data row has 6 columns (xyz + rgb)
    lines = open(written["trajectory"]).read().splitlines()
    hdr_end = lines.index("end_header")
    assert len(lines[hdr_end + 1].split()) == 6
    # scan-context descriptor sheet (SC image topic parity): valid P5 PGM
    # with rows = inserted descriptors x rings
    if "scancontext" in written:
        with open(written["scancontext"], "rb") as f:
            assert f.readline().strip() == b"P5"
            w, h = map(int, f.readline().split())
            assert f.readline().strip() == b"255"
            data = f.read()
        assert len(data) == w * h
        n = int(np.asarray(eng.state.scdb.count))
        assert h == n * eng.cfg.loop.num_ring and w == eng.cfg.loop.num_sector
