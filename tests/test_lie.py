import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu.core import lie


def random_rotvecs(rng, n=64, scale=2.5):
    w = rng.normal(size=(n, 3)) * scale
    # include tiny and near-pi magnitudes
    w[0] = 0.0
    w[1] = np.array([1e-9, 0, 0])
    w[2] = np.array([np.pi - 1e-7, 0, 0])
    w[3] = np.array([0, 0, np.pi - 1e-3])
    return jnp.asarray(w)


def test_so3_exp_log_roundtrip(rng):
    w = random_rotvecs(rng)
    # restrict to |w| < pi for unique log
    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    w = jnp.where(norm > np.pi - 1e-4, w * (np.pi - 1e-4) / norm, w)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)


def test_so3_exp_is_rotation(rng):
    w = random_rotvecs(rng)
    R = lie.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-12)


def test_right_jacobian_definition(rng):
    """exp(w + dw) ~ exp(w) exp(Jr(w) dw) to first order."""
    w = jnp.asarray(rng.normal(size=(16, 3)))
    dw = jnp.asarray(rng.normal(size=(16, 3))) * 1e-6
    lhs = lie.so3_exp(w + dw)
    rhs = lie.so3_exp(w) @ lie.so3_exp(
        jnp.einsum("...ij,...j->...i", lie.so3_right_jacobian(w), dw)
    )
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-11)


def test_right_jacobian_inverse(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)))
    Jr = lie.so3_right_jacobian(w)
    Jri = lie.so3_right_jacobian_inv(w)
    eye = jnp.broadcast_to(jnp.eye(3), Jr.shape)
    np.testing.assert_allclose(np.asarray(Jr @ Jri), np.asarray(eye), atol=1e-9)
    # tiny angle
    w0 = jnp.zeros((1, 3))
    np.testing.assert_allclose(
        np.asarray(lie.so3_right_jacobian_inv(w0)), np.asarray(jnp.eye(3)[None]), atol=1e-9
    )


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(32, 6)))
    xi = xi.at[:, :3].multiply(0.8)
    T = lie.se3_exp(xi)
    xi2 = lie.se3_log(T)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-8)


def test_se3_inverse(rng):
    xi = jnp.asarray(rng.normal(size=(8, 6)))
    T = lie.se3_exp(xi)
    eye = jnp.broadcast_to(jnp.eye(4), T.shape)
    np.testing.assert_allclose(np.asarray(T @ lie.se3_inverse(T)), np.asarray(eye), atol=1e-10)


def test_quat_rot_roundtrip(rng):
    w = random_rotvecs(rng)
    R = lie.so3_exp(w)
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-8)
    # unit norm, canonical sign
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-10)
    assert np.all(np.asarray(q[:, 0]) >= 0)


def test_quat_mul_matches_rotation_compose(rng):
    wa = jnp.asarray(rng.normal(size=(8, 3)))
    wb = jnp.asarray(rng.normal(size=(8, 3)))
    Ra, Rb = lie.so3_exp(wa), lie.so3_exp(wb)
    q = lie.quat_mul(lie.rot_to_quat(Ra), lie.rot_to_quat(Rb))
    np.testing.assert_allclose(np.asarray(lie.quat_to_rot(q)), np.asarray(Ra @ Rb), atol=1e-8)


def test_slerp_endpoints_and_midpoint(rng):
    w = jnp.asarray([0.0, 0.0, 1.0])
    q0 = lie.rot_to_quat(lie.so3_exp(0 * w))
    q1 = lie.rot_to_quat(lie.so3_exp(1.0 * w))
    np.testing.assert_allclose(np.asarray(lie.quat_slerp(q0, q1, jnp.asarray(0.0))), np.asarray(q0), atol=1e-9)
    np.testing.assert_allclose(np.asarray(lie.quat_slerp(q0, q1, jnp.asarray(1.0))), np.asarray(q1), atol=1e-9)
    qm = lie.quat_slerp(q0, q1, jnp.asarray(0.5))
    np.testing.assert_allclose(
        np.asarray(lie.quat_to_rot(qm)), np.asarray(lie.so3_exp(0.5 * w)), atol=1e-9
    )


def test_transform_points(rng):
    xi = jnp.asarray(rng.normal(size=(6,)))
    T = lie.se3_exp(xi)
    pts = jnp.asarray(rng.normal(size=(100, 3)))
    out = lie.transform_points(T, pts)
    ref = (np.asarray(T[:3, :3]) @ np.asarray(pts).T).T + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-10)


def test_normalize_rotation(rng):
    w = jnp.asarray(rng.normal(size=(8, 3)))
    R = lie.so3_exp(w) + jnp.asarray(rng.normal(size=(8, 3, 3))) * 1e-4
    Rn = lie.normalize_rotation(R)
    eye = jnp.broadcast_to(jnp.eye(3), Rn.shape)
    np.testing.assert_allclose(np.asarray(Rn @ jnp.swapaxes(Rn, -1, -2)), np.asarray(eye), atol=1e-12)
    assert float(jnp.max(jnp.abs(Rn - lie.so3_exp(w)))) < 1e-3


def test_jit_and_vmap_compose():
    f = jax.jit(jax.vmap(lambda w: lie.so3_log(lie.so3_exp(w))))
    w = jnp.asarray(np.random.default_rng(1).normal(size=(16, 3))) * 0.5
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-7)


def test_ypr(rng):
    yaw, pitch, roll = 0.3, -0.2, 0.1
    Rz = lie.so3_exp(jnp.asarray([0, 0, yaw]))
    Ry = lie.so3_exp(jnp.asarray([0, pitch, 0]))
    Rx = lie.so3_exp(jnp.asarray([roll, 0, 0]))
    R = Rz @ Ry @ Rx
    np.testing.assert_allclose(np.asarray(lie.ypr_from_rot(R)), [yaw, pitch, roll], atol=1e-9)
