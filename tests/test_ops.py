import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core import lie
from rivslam_tpu.core.pointcloud import RadarCloud, masked_xyz
from rivslam_tpu.core.config import PreprocessConfig
from rivslam_tpu.ops import knn, voxel, filters, deskew


def make_cloud(rng, n_valid=100, capacity=128, scale=10.0):
    xyz = rng.normal(size=(n_valid, 3)) * scale
    return RadarCloud.from_numpy(
        xyz, capacity, doppler=rng.normal(size=n_valid), intensity=rng.uniform(1, 30, size=n_valid),
        dtype=jnp.float64,
    )


def brute_nn(q, r):
    d = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), d.min(1)


def test_nearest_neighbor_exact(rng):
    q = rng.normal(size=(50, 3))
    r = rng.normal(size=(80, 3))
    cloud_r = RadarCloud.from_numpy(r, 128, dtype=jnp.float64)
    idx, d2 = knn.nearest_neighbor(jnp.asarray(q), masked_xyz(cloud_r), cloud_r.mask)
    ref_idx, ref_d2 = brute_nn(q, r)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(d2), ref_d2, atol=1e-9)


def test_knn_matches_sorted_bruteforce(rng):
    pts = rng.normal(size=(60, 3))
    cloud = RadarCloud.from_numpy(pts, 64, dtype=jnp.float64)
    k = 5
    idx, d2 = knn.knn(masked_xyz(cloud), masked_xyz(cloud), cloud.mask, k)
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    ref = np.sort(d, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(np.asarray(d2)[:60], axis=1), ref, atol=1e-9)


def test_nearest_neighbor_tiled_matches(rng):
    q = jnp.asarray(rng.normal(size=(37, 3)))
    r = rng.normal(size=(300, 3))
    cloud_r = RadarCloud.from_numpy(r, 300, dtype=jnp.float64)
    i1, d1 = knn.nearest_neighbor(q, masked_xyz(cloud_r), cloud_r.mask)
    i2, d2 = knn.nearest_neighbor_tiled(q, masked_xyz(cloud_r), cloud_r.mask, tile=64)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-9)


def test_voxel_downsample_centroids(rng):
    # two well-separated clusters -> two voxels with exact centroids
    a = np.array([[0.01, 0.02, 0.03], [0.04, 0.01, 0.02]])
    b = np.array([[5.01, 5.02, 5.01]])
    pts = np.concatenate([a, b])
    cloud = RadarCloud.from_numpy(pts, 16, dtype=jnp.float64)
    out = voxel.voxel_downsample(cloud, resolution=1.0, out_capacity=8)
    got = out.to_numpy_valid()
    assert got.shape[0] == 2
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got[0], a.mean(0), atol=1e-9)
    np.testing.assert_allclose(got[1], b.mean(0), atol=1e-9)


def test_voxel_downsample_counts(rng):
    pts = rng.uniform(-5, 5, size=(200, 3))
    cloud = RadarCloud.from_numpy(pts, 256, dtype=jnp.float64)
    res = 1.0
    out = voxel.voxel_downsample(cloud, res, out_capacity=256)
    n_vox = len(set(map(tuple, np.floor(pts / res).astype(int))))
    assert int(out.count()) == n_vox


def test_gaussian_voxel_map(rng):
    pts = rng.normal(size=(100, 3))
    cloud = RadarCloud.from_numpy(pts, 128, dtype=jnp.float64)
    coords, mean, cov, cnt = voxel.gaussian_voxel_map(masked_xyz(cloud), cloud.mask, 2.0, 64)
    # check one populous voxel against numpy
    vids = np.floor(pts / 2.0).astype(int)
    uniq, counts = np.unique(vids, axis=0, return_counts=True)
    target = uniq[counts.argmax()]
    sel = (vids == target).all(1)
    ref_mean = pts[sel].mean(0)
    ref_cov = np.cov(pts[sel].T, bias=True)
    j = np.where((np.asarray(coords) == target).all(1) & (np.asarray(cnt) > 0))[0]
    assert len(j) == 1
    np.testing.assert_allclose(np.asarray(mean)[j[0]], ref_mean, atol=1e-9)
    np.testing.assert_allclose(np.asarray(cov)[j[0]], ref_cov, atol=1e-8)


def test_distance_filter(rng):
    cloud = make_cloud(rng, 200, 256, scale=40.0)
    cfg = PreprocessConfig(distance_near_thresh=10.0, distance_far_thresh=60.0)
    out = filters.distance_filter(cloud, cfg)
    d = np.linalg.norm(np.asarray(cloud.xyz), axis=-1)
    expect = np.asarray(cloud.mask) & (d > 10.0) & (d < 60.0)
    np.testing.assert_array_equal(np.asarray(out.mask), expect)


def test_radius_outlier_removal(rng):
    # dense cluster + one isolated point
    pts = np.concatenate([rng.normal(size=(50, 3)) * 0.2, [[100.0, 0, 0]]])
    cloud = RadarCloud.from_numpy(pts, 64, dtype=jnp.float64)
    out = filters.radius_outlier_removal(cloud, radius=1.0, min_neighbors=1)
    m = np.asarray(out.mask)
    assert m[:50].all() and not m[50]


def test_statistical_outlier_removal(rng):
    pts = np.concatenate([rng.normal(size=(80, 3)), [[50.0, 50, 50]]])
    cloud = RadarCloud.from_numpy(pts, 128, dtype=jnp.float64)
    out = filters.statistical_outlier_removal(cloud, mean_k=10, stddev_mult=1.2)
    m = np.asarray(out.mask)
    assert not m[80]
    assert m[:80].sum() > 60


def test_deskew_small_angle(rng):
    pts = rng.normal(size=(50, 3))
    cloud = RadarCloud.from_numpy(pts, 64, dtype=jnp.float64)
    w = jnp.asarray([0.0, 0.0, 0.5])  # rad/s yaw
    out = deskew.deskew(cloud, w, scan_period=0.1)
    # point i rotated by exp(dt_i * w)
    i = 40
    dt = 0.1 * i / 64
    R = lie.so3_exp(dt * w)
    np.testing.assert_allclose(
        np.asarray(out.xyz)[i], np.asarray(R) @ pts[i], atol=1e-9
    )
    # first point unchanged
    np.testing.assert_allclose(np.asarray(out.xyz)[0], pts[0], atol=1e-12)


def test_filters_jit_compose(rng):
    cloud = make_cloud(rng, 100, 128)
    cfg = PreprocessConfig()

    @jax.jit
    def pipeline(c):
        c = filters.nan_filter(c)
        c = filters.power_filter(c, cfg.power_threshold)
        c = filters.distance_filter(c, cfg)
        c = filters.radius_outlier_removal(c, cfg.radius_radius, cfg.radius_min_neighbors)
        return c

    out = pipeline(cloud)
    assert int(out.count()) <= int(cloud.count())


def test_bilateral_filter(rng):
    # two spatial clusters with distinct intensities: smoothing stays local
    a = rng.normal(size=(40, 3)) * 0.5
    b = rng.normal(size=(40, 3)) * 0.5 + 50.0
    pts = np.concatenate([a, b])
    inten = np.concatenate([np.full(40, 10.0), np.full(40, 20.0)])
    inten += rng.normal(size=80) * 0.01
    cloud = RadarCloud.from_numpy(pts, 96, intensity=inten, dtype=jnp.float64)
    out = filters.bilateral_filter(cloud, sigma_s=5.0, sigma_r=5.0)
    oi = np.asarray(out.intensity)
    # intensities smoothed toward each cluster's mean, clusters stay apart
    assert abs(oi[:40].mean() - 10.0) < 0.1
    assert abs(oi[40:80].mean() - 20.0) < 0.1
    assert oi[:40].std() < inten[:40].std()
    # geometry untouched
    np.testing.assert_allclose(np.asarray(out.xyz), np.asarray(cloud.xyz))
