"""Robustness tests from SURVEY.md §7 'hard parts': capacity sweeps (wrong
capacity silently degrades), f32 end-to-end (the TPU runtime dtype), and
pose-graph solve at full keyframe capacity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu import pipeline
from rivslam_tpu.core import lie
from rivslam_tpu.core.config import (
    EngineConfig, PreprocessConfig, RegistrationConfig,
)
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.io import synthetic
from rivslam_tpu.loop import global_graph


def test_registration_capacity_sweep():
    """Accuracy degrades gracefully (not catastrophically) as capacity
    truncates the scan; and padding far beyond the point count is harmless."""
    rng = np.random.default_rng(3)
    world = synthetic.make_world(rng, n_points=8000)
    T0 = np.eye(4); T0[:3, 3] = [0, 0, 2.0]
    T1 = T0.copy(); T1[:3, 3] += [0.3, -0.2, 0.0]
    cfg = RegistrationConfig(method="FAST_GICP", transformation_epsilon=5e-4)
    errs = {}
    for cap in [128, 256, 512, 1024]:
        tgt = synthetic.observe(world, T0, rng, capacity=cap, noise=0.01, dtype=jnp.float64)
        src = synthetic.observe(world, T1, rng, capacity=cap, noise=0.01, dtype=jnp.float64)
        res = apdgicp.prepare_and_register(
            src.xyz, src.mask, tgt.xyz, tgt.mask, jnp.eye(4, dtype=jnp.float64), cfg
        )
        rel = np.linalg.inv(T0) @ T1
        errs[cap] = float(np.linalg.norm(np.asarray(res.T)[:3, 3] - rel[:3, 3]))
    # denser is at least as good as very sparse; nothing explodes
    assert errs[1024] <= errs[128] + 0.1, errs
    assert all(e < 1.0 for e in errs.values()), errs
    # capacity >> points: masked padding must not change the answer
    tgt = synthetic.observe(world, T0, rng, capacity=256, noise=0.01, dtype=jnp.float64)
    src = synthetic.observe(world, T1, rng, capacity=256, noise=0.01, dtype=jnp.float64)
    r1 = apdgicp.prepare_and_register(
        src.xyz, src.mask, tgt.xyz, tgt.mask, jnp.eye(4, dtype=jnp.float64), cfg
    )
    pad = lambda a, v: jnp.concatenate([a, jnp.full((256,) + a.shape[1:], v, a.dtype)])
    r2 = apdgicp.prepare_and_register(
        pad(src.xyz, 0.0), pad(src.mask, False),
        pad(tgt.xyz, 0.0), pad(tgt.mask, False),
        jnp.eye(4, dtype=jnp.float64), cfg,
    )
    np.testing.assert_allclose(np.asarray(r2.T), np.asarray(r1.T), atol=1e-6)


def test_engine_f32_smoke():
    """The production dtype end-to-end: finite, tracking, no NaNs."""
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=8000)
    times, poses, vels = synthetic.circular_trajectory(8, radius=10.0, dt=0.25, omega=0.3)
    from rivslam_tpu.core.config import OdometryConfig

    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False,
        ),
        odometry=OdometryConfig(use_ego_vel=True),
        registration=RegistrationConfig(method="FAST_GICP"),
    )
    eng = pipeline.Engine(cfg, dtype=jnp.float32)
    K = 32
    T0 = poses[0]
    for i in range(8):
        cloud = synthetic.observe(world, poses[i], rng, capacity=640, noise=0.01,
                                  sensor_vel_world=vels[i], dtype=jnp.float32)
        d, a, g = synthetic.circular_imu_samples(times[i] - 0.25, times[i], rate=50.0,
                                                 radius=10.0, omega=0.3)
        k = min(len(d), K)
        dts = np.zeros(K); acc = np.zeros((K, 3)); gyr = np.zeros((K, 3)); m = np.zeros(K, bool)
        dts[:k], acc[:k], gyr[:k], m[:k] = d[:k], a[:k], g[:k], i > 0
        out = eng.process_frame(cloud, times[i], dts, acc, gyr, m)
        assert np.isfinite(out["pose"]).all()
        gtp = (np.linalg.inv(T0) @ poses[i])[:3, 3]
        assert np.linalg.norm(out["pose"][:3, 3] - gtp) < 2.0


def test_pose_graph_full_capacity():
    """PCG solve at a large keyframe count stays finite and reduces chi2."""
    dtype = jnp.float32
    K, L, n = 1024, 32, 1000
    g = global_graph.PoseGraph.create(K, L, dtype=dtype)
    rng = np.random.default_rng(0)
    # long noisy chain with one loop edge
    gt = [np.eye(4)]
    for k in range(1, n):
        T = np.eye(4)
        T[:3, :3] = np.asarray(lie.so3_exp(jnp.asarray([0, 0, 2 * np.pi / n])))
        T[0, 3] = 1.0
        gt.append(gt[-1] @ T)
    gt = np.stack(gt)
    est = [np.eye(4)]
    rels = [np.eye(4)]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        rel = rel @ np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.005)))
        rels.append(rel)
        est.append(est[-1] @ rel)
    est = np.stack(est).astype(np.float32)
    rels = np.stack(rels).astype(np.float32)
    g = dataclasses.replace(
        g,
        R=g.R.at[:n].set(jnp.asarray(est[:, :3, :3])),
        p=g.p.at[:n].set(jnp.asarray(est[:, :3, 3])),
        node_mask=g.node_mask.at[:n].set(True),
        odom_rel_R=g.odom_rel_R.at[:n].set(jnp.asarray(rels[:, :3, :3])),
        odom_rel_p=g.odom_rel_p.at[:n].set(jnp.asarray(rels[:, :3, 3])),
        odom_info=g.odom_info.at[:n].set(jnp.eye(6, dtype=dtype) * 100.0),
    )
    true_rel = (np.linalg.inv(gt[0]) @ gt[n - 1]).astype(np.float32)
    g = dataclasses.replace(
        g,
        loop_i=g.loop_i.at[0].set(0),
        loop_j=g.loop_j.at[0].set(n - 1),
        loop_rel_R=g.loop_rel_R.at[0].set(jnp.asarray(true_rel[:3, :3])),
        loop_rel_p=g.loop_rel_p.at[0].set(jnp.asarray(true_rel[:3, 3])),
        loop_info=g.loop_info.at[0].set(jnp.eye(6, dtype=dtype) * 400.0),
        loop_mask=g.loop_mask.at[0].set(True),
    )
    _, _, _, _, _, _, chi2_0 = global_graph.linearize(g)
    g_opt, chi2 = jax.jit(lambda x: global_graph.solve_pose_graph(x, gn_iters=6))(g)
    assert np.isfinite(np.asarray(g_opt.p)).all()
    assert float(chi2) < float(chi2_0)
    end_err0 = np.linalg.norm(est[n - 1][:3, 3] - gt[n - 1][:3, 3])
    end_err1 = np.linalg.norm(np.asarray(g_opt.p[n - 1]) - gt[n - 1][:3, 3])
    assert end_err1 < end_err0


def test_empty_scan_through_stages():
    """A scan with zero valid points must not NaN any stage."""
    import jax

    from rivslam_tpu.core.config import FloorConfig, ReveConfig
    from rivslam_tpu.core.pointcloud import RadarCloud
    from rivslam_tpu.frontend import floor, reve

    cloud = RadarCloud.zeros(128, dtype=jnp.float64)
    cfg = RegistrationConfig()
    # covariance estimation
    prep = apdgicp.prepare(cloud.xyz, cloud.mask, cfg)
    assert np.isfinite(np.asarray(prep.cov)).all()
    # registration vs an empty target: must not produce NaN pose
    res = apdgicp.register_dispatch(prep, prep, jnp.eye(4, dtype=jnp.float64), cfg)
    assert np.isfinite(np.asarray(res.T)).all()
    assert int(res.num_correspondences) == 0
    # REVE
    r = reve.estimate_ego_velocity(cloud, ReveConfig(), jax.random.key(0))
    assert not bool(r.success)
    assert np.isfinite(np.asarray(r.v)).all()
    # floor
    f = floor.detect_floor(cloud.xyz, cloud.mask, FloorConfig(), jax.random.key(1))
    assert not bool(f.found)
    assert np.isfinite(np.asarray(f.coeffs)).all()


def test_degenerate_collinear_scan():
    """All points on a line: registration stays finite (H is singular in the
    directions the data cannot constrain; LM damping must cope)."""
    t = np.linspace(-10, 10, 100)
    pts = np.stack([t, 0.1 * t, np.zeros_like(t)], axis=1)
    from rivslam_tpu.core.pointcloud import RadarCloud

    cloud = RadarCloud.from_numpy(pts, 128, dtype=jnp.float64)
    cfg = RegistrationConfig()
    prep = apdgicp.prepare(cloud.xyz, cloud.mask, cfg)
    res = apdgicp.register_dispatch(prep, prep, jnp.eye(4, dtype=jnp.float64), cfg)
    assert np.isfinite(np.asarray(res.T)).all()


def _mini_engine(gps=False):
    from rivslam_tpu.core.config import GpsConfig, LoopConfig

    return pipeline.Engine(EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False, outlier_removal_method="NONE",
            enable_deskew=False, raw_capacity=256, filtered_capacity=256,
        ),
        registration=RegistrationConfig(method="FAST_GICP"),
        loop=LoopConfig(enable=False, keyframe_capacity=64, loop_capacity=4),
        gps=GpsConfig(enable=gps, solve_interval=2),
    ))


def _feed(eng, world, rng, i, imu=None, gps_utm=None, gps_cov=None,
          nan_frame=False, step=0.4):
    T = np.eye(4)
    T[:3, 3] = [step * i, 0.0, 2.0]
    cloud = synthetic.observe(world, T, rng, capacity=256, noise=0.01)
    if nan_frame:
        xyz = np.full((256, 3), np.nan)
        cloud = type(cloud).from_numpy(xyz, 256)
    if imu is None:
        dts = np.full(8, 0.0125)
        acc = np.tile([0.0, 0.0, 9.80511], (8, 1))
        gyr = np.zeros((8, 3))
        m = np.ones(8, np.bool_)
    else:
        dts, acc, gyr, m = imu
    return eng.process_frame(cloud, 100.0 + 0.1 * i, dts, acc, gyr, m,
                             gps_utm=gps_utm, gps_cov=gps_cov)


def test_engine_survives_all_nan_frame():
    """A frame whose every coordinate is NaN (sensor glitch) must be absorbed
    by the NaN filter (preprocessing_nodelet.cpp NaN removal role): the
    engine keeps producing finite poses on the frames after it."""
    rng = np.random.default_rng(11)
    world = synthetic.make_world(rng, n_points=5000)
    eng = _mini_engine()
    for i in range(5):
        out = _feed(eng, world, rng, i, nan_frame=(i == 2))
        assert np.isfinite(np.asarray(out["odom"])).all(), f"frame {i}"
    ts, poses = eng.trajectory()
    assert np.isfinite(poses).all()


def test_engine_survives_imu_dropout():
    """A frame with ZERO valid IMU samples (total dropout) must not NaN the
    window backend's preintegration factor."""
    rng = np.random.default_rng(12)
    world = synthetic.make_world(rng, n_points=5000)
    eng = _mini_engine()
    dropout = (np.zeros(8), np.zeros((8, 3)), np.zeros((8, 3)),
               np.zeros(8, np.bool_))
    for i in range(5):
        out = _feed(eng, world, rng, i, imu=dropout if i == 2 else None)
        assert np.isfinite(np.asarray(out["odom"])).all(), f"frame {i}"
        nav = out.get("nav_state")
        if nav is not None:
            assert np.isfinite(np.asarray(nav.p)).all()


def test_engine_gps_outage_and_reacquire():
    """GPS present, then a multi-frame outage, then reacquisition: zero_utm
    must stay anchored at the FIRST fix and the graph priors stay finite."""
    rng = np.random.default_rng(13)
    world = synthetic.make_world(rng, n_points=5000)
    eng = _mini_engine(gps=True)
    for i in range(8):
        # outage on frames 1-3; fixes everywhere else, so whatever the
        # keyframe cadence, the first keyframe (frame 0) and every keyframe
        # from frame 4 on carry a fix
        has_fix = i not in (1, 2, 3)
        _feed(
            eng, world, rng, i, step=0.6,
            gps_utm=np.array([0.6 * i, 0.0, 30.0]) if has_fix else None,
            gps_cov=np.array([0.5, 0.5, 1.0]) if has_fix else None,
        )
    st = eng.state
    np.testing.assert_allclose(st.zero_utm, [0.0, 0.0, 30.0])
    g = st.graph
    k = int(np.asarray(g.gps_mask).sum())
    assert k >= 2  # first fix + reacquired fix both became priors
    assert np.isfinite(np.asarray(g.gps_xyz)).all()
    assert np.isfinite(np.asarray(g.gps_info)).all()
