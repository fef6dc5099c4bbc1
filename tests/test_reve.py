import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core.config import ReveConfig
from rivslam_tpu.core.pointcloud import RadarCloud
from rivslam_tpu.frontend import reve


def make_doppler_scan(rng, v_true, n=300, capacity=512, n_outliers=0, noise=0.01):
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # keep azimuth/elevation within REVE gates (front hemisphere-ish)
    dirs[:, 0] = np.abs(dirs[:, 0]) + 0.3
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r = rng.uniform(5.0, 60.0, size=n)
    xyz = dirs * r[:, None]
    dop = dirs @ v_true + rng.normal(size=n) * noise
    if n_outliers:
        out_idx = rng.choice(n, n_outliers, replace=False)
        dop[out_idx] += rng.uniform(2.0, 5.0, size=n_outliers) * rng.choice([-1, 1], n_outliers)
    intensity = np.full(n, 20.0)
    return RadarCloud.from_numpy(xyz, capacity, doppler=dop, intensity=intensity, dtype=jnp.float64), out_idx if n_outliers else None


def test_clean_velocity_recovery(rng):
    v_true = np.array([2.0, -0.5, 0.1])
    cloud, _ = make_doppler_scan(rng, v_true)
    res = reve.estimate_ego_velocity(cloud, ReveConfig(), jax.random.key(0))
    assert bool(res.success)
    assert not bool(res.zero_velocity)
    np.testing.assert_allclose(np.asarray(res.v), v_true, atol=0.02)


def test_outlier_rejection(rng):
    v_true = np.array([3.0, 1.0, 0.0])
    # 4% gross outliers: below the 5% "regard outliers as inliers" gate, so
    # RANSAC must actually reject them
    cloud, out_idx = make_doppler_scan(rng, v_true, n=300, n_outliers=12)
    res = reve.estimate_ego_velocity(cloud, ReveConfig(), jax.random.key(1))
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.v), v_true, atol=0.05)
    inl = np.asarray(res.inlier_mask)
    # gross outliers excluded
    assert inl[out_idx].sum() == 0


def test_outlier_quirk_above_5pct(rng):
    """Reference quirk (radar_ego_velocity_estimator.cpp:216-221): when the
    outlier ratio exceeds 5%, ALL targets are regarded as inliers and the
    final solve is polluted — reproduced faithfully."""
    v_true = np.array([3.0, 1.0, 0.0])
    cloud, out_idx = make_doppler_scan(rng, v_true, n=300, n_outliers=60)
    res = reve.estimate_ego_velocity(cloud, ReveConfig(), jax.random.key(1))
    inl = np.asarray(res.inlier_mask)
    # every target passing the validity gates became an inlier — including
    # gross outliers (those excluded failed the az/el/range gates, not RANSAC)
    assert inl[out_idx].sum() > len(out_idx) * 0.8
    assert inl.sum() > 0.9 * 300


def test_zero_velocity_detection(rng):
    cloud, _ = make_doppler_scan(rng, np.zeros(3), noise=0.005)
    cfg = ReveConfig()
    res = reve.estimate_ego_velocity(cloud, cfg, jax.random.key(2))
    assert bool(res.zero_velocity)
    np.testing.assert_allclose(np.asarray(res.v), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(res.sigma),
        [cfg.sigma_zero_velocity_x, cfg.sigma_zero_velocity_y, cfg.sigma_zero_velocity_z],
        atol=1e-9,
    )


def test_sigma_sanity(rng):
    v_true = np.array([1.0, 0.0, 0.0])
    cloud, _ = make_doppler_scan(rng, v_true, noise=0.05)
    res = reve.estimate_ego_velocity(cloud, ReveConfig(), jax.random.key(3))
    s = np.asarray(res.sigma)
    assert (s > 0).all() and (s < 0.2).all()


def test_jit_and_synthetic_world(rng):
    from rivslam_tpu.io import synthetic

    world = synthetic.make_world(rng)
    times, poses, vels = synthetic.circular_trajectory(3)
    cloud = synthetic.observe(
        world, poses[1], rng, sensor_vel_world=vels[1], capacity=512, dtype=jnp.float64
    )
    f = jax.jit(lambda c, k: reve.estimate_ego_velocity(c, ReveConfig(), k))
    res = f(cloud, jax.random.key(4))
    v_expected = poses[1][:3, :3].T @ vels[1]
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.v), v_expected, atol=0.05)
