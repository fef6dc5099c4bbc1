"""Pallas fused NN kernel vs the XLA reference implementation (interpret
mode on CPU; the driver's TPU bench exercises the compiled path)."""

import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core.pointcloud import RadarCloud, masked_xyz
from rivslam_tpu.ops import knn, pallas_nn


def test_matches_reference_nn(rng):
    q = rng.normal(size=(300, 3)).astype(np.float32) * 10
    r = rng.normal(size=(700, 3)).astype(np.float32) * 10
    cloud = RadarCloud.from_numpy(r, 1024, dtype=jnp.float32)
    ref_idx, ref_d2 = knn.nearest_neighbor(
        jnp.asarray(q), masked_xyz(cloud), cloud.mask
    )
    idx, d2 = pallas_nn.nearest_neighbor_pallas(
        jnp.asarray(q), cloud.xyz, cloud.mask, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(ref_d2), rtol=1e-4, atol=1e-3)


def test_all_masked_refs(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    r = rng.normal(size=(128, 3)).astype(np.float32)
    mask = jnp.zeros(128, dtype=bool)
    idx, d2 = pallas_nn.nearest_neighbor_pallas(
        jnp.asarray(q), jnp.asarray(r), mask, interpret=True
    )
    assert (np.asarray(d2) > 1e29).all()


def test_unaligned_sizes(rng):
    q = rng.normal(size=(97, 3)).astype(np.float32)
    r = rng.normal(size=(513, 3)).astype(np.float32)
    cloud = RadarCloud.from_numpy(r, 513, dtype=jnp.float32)
    ref_idx, ref_d2 = knn.nearest_neighbor(jnp.asarray(q), masked_xyz(cloud), cloud.mask)
    idx, d2 = pallas_nn.nearest_neighbor_pallas(jnp.asarray(q), cloud.xyz, cloud.mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
