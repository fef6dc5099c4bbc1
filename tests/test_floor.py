import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core.config import FloorConfig
from rivslam_tpu.frontend import floor
from rivslam_tpu.io import synthetic


def make_scene(rng, sensor_height=2.0, n_ground=300, n_other=200, tilt=None):
    ground = np.stack([
        rng.uniform(-20, 20, n_ground), rng.uniform(-20, 20, n_ground),
        np.full(n_ground, -sensor_height) + rng.normal(size=n_ground) * 0.02,
    ], axis=1)
    other = np.stack([
        rng.uniform(-20, 20, n_other), rng.uniform(-20, 20, n_other),
        rng.uniform(-sensor_height + 1.5, 3.0, n_other),
    ], axis=1)
    pts = np.concatenate([ground, other])
    return jnp.asarray(pts), jnp.ones(len(pts), dtype=bool)


def test_detects_ground_plane(rng):
    xyz, mask = make_scene(rng)
    cfg = FloorConfig(sensor_height=2.0)
    res = floor.detect_floor(xyz, mask, cfg, jax.random.key(0))
    assert bool(res.found)
    c = np.asarray(res.coeffs)
    np.testing.assert_allclose(np.abs(c[2]), 1.0, atol=0.01)  # vertical normal
    # plane z = -2: n=(0,0,1), d=2
    np.testing.assert_allclose(c[3], 2.0, atol=0.05)
    assert int(res.num_inliers) > 100


def test_rejects_when_no_floor(rng):
    # points only well above the clip band
    pts = rng.uniform(-20, 20, size=(300, 3))
    pts[:, 2] = rng.uniform(2.0, 5.0, 300)
    cfg = FloorConfig(sensor_height=2.0)
    res = floor.detect_floor(jnp.asarray(pts), jnp.ones(300, bool), cfg, jax.random.key(1))
    assert not bool(res.found)


def test_rejects_tilted_plane(rng):
    # a 45-degree "ground" fails the verticality check
    n = 400
    u = rng.uniform(-10, 10, n)
    v = rng.uniform(-10, 10, n)
    pts = np.stack([u, v, -2.0 + u * 1.0], axis=1)  # 45 deg slope
    cfg = FloorConfig(sensor_height=2.0, height_clip_range=20.0, use_normal_filtering=False)
    res = floor.detect_floor(jnp.asarray(pts), jnp.ones(n, bool), cfg, jax.random.key(2))
    assert not bool(res.found)


def test_jit_and_in_pipeline_shape(rng):
    xyz, mask = make_scene(rng)
    cfg = FloorConfig()
    f = jax.jit(lambda x, m, k: floor.detect_floor(x, m, cfg, k))
    res = f(xyz, mask, jax.random.key(3))
    assert res.coeffs.shape == (4,)
