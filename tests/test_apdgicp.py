"""Registration acceptance tests, modeled on the reference's
fast_apdgicp/src/test/gicp_test.cpp forward/backward/swap pattern with its
0.05 m / 1 deg tolerance (gicp_test.cpp:148-149).

Three tiers:
1. perfect-correspondence recovery (machine precision) — validates the
   LM driver, Jacobians and Mahalanobis weighting exactly;
2. dense omnidirectional scene — reference 0.05 m / 1 deg parity for
   FAST_GICP (the variant the reference actually tests);
3. sparse radar-FoV scene — looser 0.25 m bound: differently-sampled sparse
   scans have irreducible estimator noise at this density (the sliding-window
   backend exists to average it out).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.io import synthetic

# gicp_test.cpp constructs matchers directly -> ctor-default epsilons
# (5e-4), not the launch-file 0.1
CFG = RegistrationConfig(transformation_epsilon=5e-4)
GICP_CFG = RegistrationConfig(method="FAST_GICP", transformation_epsilon=5e-4)

XI = np.array([0.01, 0.02, 0.05, 0.4, -0.25, 0.05])


def check_alignment(T_est, T_true, atol_t=0.05, atol_r_deg=1.0):
    delta = np.asarray(lie.se3_inverse(jnp.asarray(T_est)) @ jnp.asarray(T_true))
    dt = np.linalg.norm(delta[:3, 3])
    dr = float(lie.rotation_angle(jnp.asarray(delta[:3, :3]))) * 180 / np.pi
    assert dt < atol_t, f"translation error {dt:.4f} m"
    assert dr < atol_r_deg, f"rotation error {dr:.3f} deg"


def make_scene(fov_deg, capacity=768, noise=0.01, seed=42):
    rng = np.random.default_rng(seed)
    world = synthetic.make_world(rng, n_points=6000)
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 2.0]
    T_rel = np.asarray(lie.se3_exp(jnp.asarray(XI)))
    T1 = T0 @ T_rel
    target = synthetic.observe(
        world, T0, rng, capacity=capacity, noise=noise, fov_deg=fov_deg, dtype=jnp.float64
    )
    source = synthetic.observe(
        world, T1, rng, capacity=capacity, noise=noise, fov_deg=fov_deg, dtype=jnp.float64
    )
    return source, target, T_rel


@pytest.fixture(scope="module")
def omni_scene():
    return make_scene(fov_deg=None)


@pytest.fixture(scope="module")
def fov_scene():
    return make_scene(fov_deg=60)


# ---- tier 1: exact recovery -------------------------------------------------


@pytest.mark.parametrize("method", ["FAST_GICP", "FAST_APDGICP"])
def test_exact_recovery(omni_scene, method):
    _, target, T_rel = omni_scene
    Ti = np.linalg.inv(T_rel)
    src_xyz = np.asarray(target.xyz) @ Ti[:3, :3].T + Ti[:3, 3]
    cfg = RegistrationConfig(method=method, transformation_epsilon=5e-4)
    res = apdgicp.prepare_and_register(
        jnp.asarray(src_xyz), target.mask, target.xyz, target.mask,
        jnp.eye(4, dtype=jnp.float64), cfg,
    )
    assert bool(res.converged)
    check_alignment(np.asarray(res.T), T_rel, atol_t=1e-6, atol_r_deg=1e-5)


# ---- tier 2: reference-parity tolerance on the dense omni scene -------------


def test_forward_alignment_gicp(omni_scene):
    source, target, T_rel = omni_scene
    res = apdgicp.prepare_and_register(
        source.xyz, source.mask, target.xyz, target.mask, jnp.eye(4, dtype=jnp.float64), GICP_CFG
    )
    assert bool(res.converged)
    check_alignment(np.asarray(res.T), T_rel)  # reference 0.05 m / 1 deg


def test_backward_alignment_gicp(omni_scene):
    source, target, T_rel = omni_scene
    res = apdgicp.prepare_and_register(
        target.xyz, target.mask, source.xyz, source.mask, jnp.eye(4, dtype=jnp.float64), GICP_CFG
    )
    assert bool(res.converged)
    check_alignment(np.asarray(res.T), np.linalg.inv(T_rel))


# ---- tier 3: sparse radar-FoV scene ----------------------------------------


@pytest.mark.parametrize("method", ["FAST_GICP", "FAST_APDGICP"])
def test_fov_alignment(fov_scene, method):
    source, target, T_rel = fov_scene
    cfg = RegistrationConfig(method=method, transformation_epsilon=5e-4)
    res = apdgicp.prepare_and_register(
        source.xyz, source.mask, target.xyz, target.mask, jnp.eye(4, dtype=jnp.float64), cfg
    )
    assert bool(res.converged)
    check_alignment(np.asarray(res.T), T_rel, atol_t=0.25, atol_r_deg=1.0)


def test_guess_speeds_convergence(fov_scene):
    source, target, T_rel = fov_scene
    res_cold = apdgicp.prepare_and_register(
        source.xyz, source.mask, target.xyz, target.mask, jnp.eye(4, dtype=jnp.float64), CFG
    )
    res_warm = apdgicp.prepare_and_register(
        source.xyz, source.mask, target.xyz, target.mask, jnp.asarray(T_rel), CFG
    )
    assert bool(res_warm.converged)
    assert int(res_warm.iterations) <= int(res_cold.iterations)


# ---- unit pieces ------------------------------------------------------------


def test_plane_regularization_covs(fov_scene):
    source, _, _ = fov_scene
    prep = apdgicp.estimate_covariances(source.xyz, source.mask, CFG)
    covs = np.asarray(prep.cov)[np.asarray(source.mask)]
    vals = np.linalg.eigvalsh(covs)
    np.testing.assert_allclose(vals[:, 0], 1e-3, rtol=1e-4)
    np.testing.assert_allclose(vals[:, 1:], 1.0, rtol=1e-4)


def test_adaptive_cov_geometry():
    """APD covariance is symmetric PSD with range-scaled spread
    (fast_apdgicp_impl.hpp:163-184)."""
    pt2 = jnp.asarray([[30.0, 30.0, 10.0]], dtype=jnp.float64)
    C2 = np.asarray(apdgicp.adaptive_cov(pt2, CFG))[0]
    assert np.allclose(C2, C2.T)
    vals = np.linalg.eigvalsh(C2)
    assert (vals > 0).all()
    # doubling the range scales the covariance by ~4 (s ~ dist)
    C4 = np.asarray(apdgicp.adaptive_cov(2 * pt2, CFG))[0]
    np.testing.assert_allclose(C4, 4 * C2, rtol=1e-9)


def test_mahalanobis_inverse_matches_linalg():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(50, 3, 3))
    M = A @ np.swapaxes(A, 1, 2) + np.eye(3) * 0.1
    inv = np.asarray(apdgicp._inv3(jnp.asarray(M)))
    np.testing.assert_allclose(inv, np.linalg.inv(M), rtol=1e-8)


def test_hb_matches_autodiff(fov_scene):
    """H = J^T M J and b = J^T M e against jax.grad of the weighted error —
    the kernel-level numerical test SURVEY.md §4 calls for."""
    source, target, T_rel = fov_scene
    src = apdgicp.estimate_covariances(source.xyz, source.mask, CFG)
    tgt = apdgicp.estimate_covariances(target.xyz, target.mask, CFG)
    T = jnp.asarray(T_rel)
    idx, corr, mah, _ = apdgicp._correspondences(T, src, tgt, CFG)
    H, b, err = apdgicp._linearize(T, src, tgt, idx, corr, mah)

    def half_error_at_delta(d):
        Td = apdgicp._se3_from_rt(d) @ T
        return 0.5 * apdgicp._compute_error(Td, src, tgt, idx, corr, mah)

    g = jax.grad(half_error_at_delta)(jnp.zeros(6, dtype=jnp.float64))
    # b = J^T M e = grad(0.5 e^T M e) w.r.t. delta at 0 (the LM solver then
    # steps d = solve(H + lam I, -b), reference lsq_registration_impl.hpp:138)
    np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=1e-6, atol=1e-8)
    hess = jax.hessian(half_error_at_delta)(jnp.zeros(6, dtype=jnp.float64))
    # Gauss-Newton H drops the curvature-of-residual term; on near-converged
    # poses they agree to leading order (matrix-norm-relative)
    rel = np.linalg.norm(np.asarray(hess) - np.asarray(H)) / np.linalg.norm(np.asarray(H))
    assert rel < 1e-3, f"GN Hessian deviates {rel:.2e} from full Hessian"


def test_batched_registration_vmap(fov_scene):
    source, target, T_rel = fov_scene
    src = apdgicp.estimate_covariances(source.xyz, source.mask, CFG)
    tgt = apdgicp.estimate_covariances(target.xyz, target.mask, CFG)
    B = 3
    batch = jax.tree.map(lambda x: jnp.stack([x] * B), src)
    batch_t = jax.tree.map(lambda x: jnp.stack([x] * B), tgt)
    guesses = jnp.stack([jnp.eye(4, dtype=jnp.float64)] * B)
    f = jax.jit(jax.vmap(lambda s, t, g: apdgicp.register(s, t, g, CFG)))
    res = f(batch, batch_t, guesses)
    for i in range(B):
        check_alignment(np.asarray(res.T[i]), T_rel, atol_t=0.25)


def test_adaptive_cov_matches_reference_transcription():
    """Per-point C_dist parity (VERDICT round-1 item #1): adaptive_cov vs a
    direct numpy transcription of fast_apdgicp_impl.hpp:163-192 on identical
    inputs (s_x = d*dist_var/400; s_y/s_z = d*sin(var_deg)/cos(AoA);
    R = Rz(azimuth) @ Ry(elevation); C = (R S)(R S)^T)."""
    import math

    from rivslam_tpu.core.config import RegistrationConfig
    from rivslam_tpu.frontend.apdgicp import adaptive_cov

    cfg = RegistrationConfig(dist_var=0.86, azimuth_var=1.0, elevation_var=1.0)
    rng = np.random.default_rng(12)
    pts = rng.uniform(-40, 40, size=(64, 3))
    pts[:, 0] = np.abs(pts[:, 0]) + 0.5  # forward-ish, avoid AoA ~ +-90 deg

    got = np.asarray(adaptive_cov(jnp.asarray(pts, jnp.float64), cfg))

    for i, p in enumerate(pts):
        x, y, z = p
        dist = math.sqrt(x * x + y * y + z * z)
        aoa = math.atan2(x, math.sqrt(y * y + z * z))
        s_x = dist * cfg.dist_var / 400.0
        s_y = dist * math.sin(math.radians(cfg.azimuth_var)) / math.cos(aoa)
        s_z = dist * math.sin(math.radians(cfg.elevation_var)) / math.cos(aoa)
        elevation = math.atan2(math.sqrt(x * x + y * y), z)
        azimuth = math.atan2(y, x)
        ca, sa = math.cos(azimuth), math.sin(azimuth)
        ce, se = math.cos(elevation), math.sin(elevation)
        Rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]])
        Ry = np.array([[ce, 0, se], [0, 1, 0], [-se, 0, ce]])
        A = (Rz @ Ry) @ np.diag([s_x, s_y, s_z])
        want = A @ A.T
        np.testing.assert_allclose(got[i], want, rtol=1e-10, atol=1e-12)
