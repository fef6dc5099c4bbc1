"""RBF-kernel covariance estimation (GPU_RBF_KERNEL parity).

Reference: fast_apdgicp/src/fast_gicp/cuda/covariance_estimation_rbf.cu
78-160 — per point, Gaussian-weighted moments over ALL points
(w = exp(-kernel_width * d^2), zeroed beyond max_dist; the reference quirk
that `kernel_width` is the exponent factor itself is kept), finalized as
cov = E_w[x x^T] - mean mean^T (cu:46-53). Unlike the reference we do NOT
let the thrust zero-padding points contribute weight (cu:127-130 pads with
(0,0,0) which silently joins neighborhoods near the origin); invalid points
are masked out instead.

Tiers:
1. numpy-mirror parity of the exact path (regularization=NONE),
2. fast SoA path (PLANE) vs exact path (PLANE),
3. max_dist gating + mask exclusion,
4. end-to-end registration acceptance at the reference 0.05 m / 1 deg.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.frontend import apdgicp, apdgicp_fast

from tests.test_apdgicp import check_alignment, make_scene

RBF_CFG = RegistrationConfig(
    covariance_method="RBF", transformation_epsilon=5e-4
)


def _numpy_rbf_cov(xyz, mask, kw, md):
    n = xyz.shape[0]
    covs = np.zeros((n, 3, 3))
    for i in range(n):
        d2 = np.sum((xyz - xyz[i]) ** 2, axis=1)
        w = np.exp(-kw * d2)
        w[d2 > md * md] = 0.0
        w[~mask] = 0.0
        sw = max(w.sum(), 1e-6)
        mean = (w[:, None] * xyz).sum(0) / sw
        exx = np.einsum("m,mi,mj->ij", w, xyz, xyz) / sw
        covs[i] = exx - np.outer(mean, mean)
    return covs


def test_rbf_matches_numpy_mirror():
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(64, 3)) * 2.0
    mask = np.ones(64, bool)
    mask[50:] = False
    cfg = RegistrationConfig(covariance_method="RBF", regularization="NONE")
    prep = apdgicp.estimate_covariances(
        jnp.asarray(xyz), jnp.asarray(mask), cfg
    )
    ref = _numpy_rbf_cov(xyz, mask, cfg.rbf_kernel_width, cfg.rbf_max_dist)
    np.testing.assert_allclose(
        np.asarray(prep.cov)[mask], ref[mask], atol=1e-8
    )


def test_rbf_fast_path_matches_exact():
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.normal(size=(128, 3)) * 3.0)
    mask = jnp.asarray(np.arange(128) < 100)
    exact = apdgicp.estimate_covariances(xyz, mask, RBF_CFG)
    fast = apdgicp_fast.estimate_covariances_rbf_fast(xyz, mask, RBF_CFG)
    np.testing.assert_allclose(
        np.asarray(fast.cov)[:100], np.asarray(exact.cov)[:100], atol=1e-6
    )


def test_rbf_max_dist_gating_and_mask():
    # a far point (beyond max_dist of everything) and a masked-out point must
    # not perturb any neighborhood
    rng = np.random.default_rng(11)
    base = rng.normal(size=(32, 3)) * 0.5
    far = np.array([[100.0, 100.0, 100.0]])
    junk = np.array([[0.1, 0.0, 0.2]])
    xyz = np.concatenate([base, far, junk])
    mask_all = np.ones(34, bool)
    mask_nojunk = mask_all.copy()
    mask_nojunk[33] = False
    cfg = RegistrationConfig(covariance_method="RBF", regularization="NONE")
    with_far = apdgicp.estimate_covariances(
        jnp.asarray(xyz), jnp.asarray(mask_all), cfg
    )
    without = apdgicp.estimate_covariances(
        jnp.asarray(xyz[:32]), jnp.asarray(mask_all[:32]), cfg
    )
    # far point: gated by max_dist, base rows unchanged... but junk (valid,
    # near origin) DOES contribute — so compare against the masked variant
    masked = apdgicp.estimate_covariances(
        jnp.asarray(xyz), jnp.asarray(mask_nojunk), cfg
    )
    np.testing.assert_allclose(
        np.asarray(masked.cov)[:32], np.asarray(without.cov), atol=1e-9
    )
    # and the junk point visibly changes neighborhoods when unmasked
    assert not np.allclose(
        np.asarray(with_far.cov)[:32], np.asarray(without.cov), atol=1e-9
    )


@pytest.fixture(scope="module")
def omni_scene():
    return make_scene(fov_deg=None)


def test_rbf_registration_acceptance(omni_scene):
    """gicp_test.cpp pattern: forward + backward within 0.05 m / 1 deg,
    with RBF covariances on both clouds."""
    source, target, T_rel = omni_scene
    cfg = RBF_CFG
    res = apdgicp.prepare_and_register(
        source.xyz, source.mask, target.xyz, target.mask,
        jnp.eye(4, dtype=source.xyz.dtype), cfg,
    )
    assert bool(res.converged)
    check_alignment(res.T, T_rel)
    res_b = apdgicp.prepare_and_register(
        target.xyz, target.mask, source.xyz, source.mask,
        jnp.eye(4, dtype=source.xyz.dtype), cfg,
    )
    assert bool(res_b.converged)
    check_alignment(res_b.T, np.linalg.inv(T_rel))
