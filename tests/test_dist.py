"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.dist import dist_gn, mesh as mesh_mod
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.io import synthetic

CFG = RegistrationConfig(transformation_epsilon=5e-4)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=6000)
    from rivslam_tpu.core import lie

    T0 = np.eye(4)
    T0[:3, 3] = [0, 0, 2.0]
    xi = np.array([0.0, 0.0, 0.04, 0.3, -0.2, 0.02])
    T_rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    tgt = synthetic.observe(world, T0, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    src = synthetic.observe(world, T0 @ T_rel, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    s = apdgicp.estimate_covariances(src.xyz, src.mask, CFG)
    t = apdgicp.estimate_covariances(tgt.xyz, tgt.mask, CFG)
    return s, t, T_rel


def test_mesh_construction():
    m = mesh_mod.make_mesh(4, 2)
    assert m.shape == {"data": 4, "model": 2}


def test_sharded_register_matches_local(scene):
    src, tgt, T_rel = scene
    m = mesh_mod.make_mesh(1, 8)
    local = apdgicp.register(src, tgt, jnp.eye(4, dtype=jnp.float64), CFG)
    dist = dist_gn.sharded_register(src, tgt, jnp.eye(4, dtype=jnp.float64), CFG, m)
    np.testing.assert_allclose(np.asarray(dist.T), np.asarray(local.T), atol=1e-9)
    assert int(dist.num_correspondences) == int(local.num_correspondences)


def test_batched_register_data_parallel(scene):
    src, tgt, T_rel = scene
    m = mesh_mod.make_mesh(4, 2)
    B = 8
    stack = lambda t: jax.tree.map(lambda x: jnp.stack([x] * B), t)
    res = dist_gn.batched_register(
        stack(src), stack(tgt), jnp.stack([jnp.eye(4, dtype=jnp.float64)] * B), CFG, m
    )
    local = apdgicp.register(src, tgt, jnp.eye(4, dtype=jnp.float64), CFG)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(res.T[i]), np.asarray(local.T), atol=1e-9)
