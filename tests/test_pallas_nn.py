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


def test_fused_correspondence_gathers_best_match(rng):
    """fused_correspondence_pallas = NN + in-pass feature gather; must equal
    a plain argmin + numpy fancy-index gather."""
    q = rng.normal(size=(300, 3)).astype(np.float32) * 10
    r = rng.normal(size=(700, 3)).astype(np.float32) * 10
    mask = rng.uniform(size=700) > 0.15
    feats = rng.normal(size=(700, 9)).astype(np.float32)
    idx, d2, g = pallas_nn.fused_correspondence_pallas(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask), jnp.asarray(feats),
        interpret=True,
    )
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    D[:, ~mask] = np.inf
    ref_idx = D.argmin(1)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(d2), D.min(1), rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(g), feats[ref_idx])


def test_registration_with_pallas_flag_matches_xla(rng):
    """use_pallas_correspondence=True is a drop-in for the XLA gather path
    (production dispatch parity, VERDICT round-1 item #3)."""
    import dataclasses

    import jax

    from rivslam_tpu.core import lie
    from rivslam_tpu.core.config import RegistrationConfig
    from rivslam_tpu.frontend import apdgicp
    from rivslam_tpu.io import synthetic

    world = synthetic.make_world(rng, n_points=6000)
    T0 = np.eye(4)
    T0[:3, 3] = [1.0, 2.0, 2.0]
    xi = np.array([0.01, -0.02, 0.015, 0.2, -0.3, 0.1])
    T_rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    tgt = synthetic.observe(world, T0, rng, capacity=512, noise=0.01, dtype=jnp.float32)
    src = synthetic.observe(world, T0 @ T_rel, rng, capacity=512, noise=0.01, dtype=jnp.float32)
    cfg = RegistrationConfig(method="FAST_APDGICP", transformation_epsilon=5e-4)
    cfg_p = dataclasses.replace(cfg, use_pallas_correspondence=True)
    eye = jnp.eye(4, dtype=jnp.float32)
    r0 = apdgicp.prepare_and_register(src.xyz, src.mask, tgt.xyz, tgt.mask, eye, cfg)
    r1 = apdgicp.prepare_and_register(src.xyz, src.mask, tgt.xyz, tgt.mask, eye, cfg_p)
    assert bool(r1.converged)
    # coarse truth recovery (the 512-pt noisy problem is weakly constrained
    # — fitness ~0.4 — so this is a sanity bound, not the accuracy test;
    # tight accuracy is covered by test_apdgicp.py at capacity 1024)
    assert np.abs(np.asarray(r1.T) - T_rel).max() < 0.1
    # the REAL assertion: pallas and XLA paths agree (identical math modulo
    # argmin tie order)
    assert np.abs(np.asarray(r1.T) - np.asarray(r0.T)).max() < 1e-3
    assert int(r0.num_correspondences) == int(r1.num_correspondences)


def test_fused_gather_v2_matches_reference(rng):
    """fused_gather_pallas (v2: min + equality-matmul gather, transposed
    feature layout) matches argmin + fancy-index gather away from ties."""
    q = rng.normal(size=(300, 3)).astype(np.float32) * 10
    r = rng.normal(size=(700, 3)).astype(np.float32) * 10
    mask = rng.uniform(size=700) > 0.15
    feats = rng.normal(size=(9, 700)).astype(np.float32)
    d2, g = pallas_nn.fused_gather_pallas(
        jnp.asarray(q), jnp.asarray(r), jnp.asarray(mask),
        jnp.asarray(feats), interpret=True,
    )
    D = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    D[:, ~mask] = np.inf
    ref_idx = D.argmin(1)
    np.testing.assert_allclose(np.asarray(d2), D.min(1), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g), feats[:, ref_idx], rtol=1e-5, atol=1e-5)


def test_fused_gather_v2_ties_average(rng):
    """Exact-tie targets are averaged (documented divergence from argmin's
    first-index pick)."""
    q = np.zeros((1, 3), np.float32)
    r = np.array([[1.0, 0, 0], [-1.0, 0, 0], [5, 5, 5]], np.float32)
    feats = np.array([[10.0, 20.0, 99.0]], np.float32)  # [F=1, M=3]
    d2, g = pallas_nn.fused_gather_pallas(
        jnp.asarray(q), jnp.asarray(r), jnp.ones(3, bool),
        jnp.asarray(feats), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(d2), [1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), [[15.0]], atol=1e-5)


def test_fused_gather_v2_all_masked(rng):
    q = rng.normal(size=(64, 3)).astype(np.float32)
    r = rng.normal(size=(128, 3)).astype(np.float32)
    feats = rng.normal(size=(5, 128)).astype(np.float32)
    d2, g = pallas_nn.fused_gather_pallas(
        jnp.asarray(q), jnp.asarray(r), jnp.zeros(128, bool),
        jnp.asarray(feats), interpret=True,
    )
    assert (np.asarray(d2) > 1e29).all()
    np.testing.assert_array_equal(np.asarray(g), 0.0)
