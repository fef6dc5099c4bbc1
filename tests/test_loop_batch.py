"""Batched multi-candidate loop verification (match_topk + verify_loops_batch)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rivslam_tpu.core.config import LoopConfig, RegistrationConfig
from rivslam_tpu.io import synthetic
from rivslam_tpu.loop import detector, scancontext


def _make_db(rng, cfg, n=24, dtype=jnp.float64):
    """DB of descriptors from scans along a line, plus a revisit of frame 3."""
    world = synthetic.make_world(rng, n_points=6000)
    db = scancontext.ScanContextDB.create(cfg, dtype=dtype)
    clouds = []
    for i in range(n):
        T = np.eye(4)
        T[:3, 3] = [2.0 * i, 0.0, 2.0]
        cl = synthetic.observe(world, T, rng, capacity=512, noise=0.01, dtype=dtype)
        clouds.append(cl)
        db, _ = scancontext.insert(
            db, scancontext.make_descriptor(cl.xyz, cl.intensity, cl.mask, cfg)
        )
    return db, clouds, world


def test_match_topk_top1_equals_match(rng):
    cfg = LoopConfig(num_exclude_recent=4, num_candidates=3)
    db, clouds, world = _make_db(rng, cfg)
    # query = noisy re-observation of frame 3's viewpoint
    T = np.eye(4)
    T[:3, 3] = [6.0, 0.0, 2.0]
    q = synthetic.observe(world, T, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    d = scancontext.make_descriptor(q.xyz, q.intensity, q.mask, cfg)
    K = db.desc.shape[0]
    cand = jnp.ones(K, dtype=bool)
    qidx = jnp.asarray(23)
    idx1, yaw1, dist1 = scancontext.match(db, d, qidx, cand, cfg)
    idxs, yaws, dists, valid = scancontext.match_topk(db, d, qidx, cand, cfg, k=3)
    assert int(idx1) == int(idxs[0])
    assert bool(valid[0])
    np.testing.assert_allclose(float(dist1), float(dists[0]), rtol=1e-6)
    np.testing.assert_allclose(float(yaw1), float(yaws[0]), rtol=1e-6)
    # ranked ascending where valid
    dv = np.asarray(dists)[np.asarray(valid)]
    assert np.all(np.diff(dv) >= -1e-9)


def test_verify_loops_batch_picks_overlapping(rng):
    reg = RegistrationConfig(method="FAST_GICP", max_iterations=16)
    cfg = LoopConfig()
    world = synthetic.make_world(rng, n_points=6000)
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 2.0]
    Tq = T0.copy()
    Tq[:3, 3] += [0.5, 0.2, 0.0]
    Tfar = np.eye(4)
    Tfar[:3, 3] = [500.0, 0.0, 2.0]
    new = synthetic.observe(world, Tq, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    good = synthetic.observe(world, T0, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    far = synthetic.observe(world, Tfar, rng, capacity=512, noise=0.01, dtype=jnp.float64)
    cands_xyz = jnp.stack([far.xyz, good.xyz])
    cands_mask = jnp.stack([far.mask, good.mask])
    yaws = jnp.zeros(2, dtype=jnp.float64)
    valid = jnp.ones(2, dtype=bool)
    res, ok, best = detector.verify_loops_batch(
        new.xyz, new.mask, cands_xyz, cands_mask, yaws, valid, reg, cfg
    )
    ok = np.asarray(ok)
    assert ok[1] and not ok[0]
    assert int(best) == 1
    # the selected solve recovers the relative transform
    T = np.asarray(jax.tree.map(lambda x: x[1], res).T)
    np.testing.assert_allclose(T[:3, 3], Tq[:3, 3] - T0[:3, 3], atol=0.25)


def test_verify_loops_batch_invalid_masked(rng):
    reg = RegistrationConfig(method="FAST_GICP", max_iterations=4)
    cfg = LoopConfig()
    world = synthetic.make_world(rng, n_points=4000)
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 2.0]
    new = synthetic.observe(world, T0, rng, capacity=256, noise=0.01, dtype=jnp.float64)
    cands_xyz = jnp.stack([new.xyz, new.xyz])
    cands_mask = jnp.stack([new.mask, new.mask])
    res, ok, best = detector.verify_loops_batch(
        new.xyz, new.mask, cands_xyz, cands_mask,
        jnp.zeros(2, dtype=jnp.float64), jnp.zeros(2, dtype=bool), reg, cfg
    )
    assert not np.asarray(ok).any()
