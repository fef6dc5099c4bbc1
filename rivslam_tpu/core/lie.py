"""SO(3)/SE(3) Lie-group math, dtype-polymorphic and jit/vmap friendly.

Every function is branch-free: small-angle singularities are handled with
`jnp.where` on Taylor expansions rather than Python conditionals, so the
whole module vmaps/batches and compiles to straight-line XLA.

Capability parity (math only, re-derived — not a translation):
- reference `fast_apdgicp/include/fast_gicp/so3/so3.hpp:59-78` (skew, so3_exp)
- reference `radar_graph_slam/include/g2o/g2o_types.hpp:200-226` (Jr, Jr^-1)
- Sophus SO3/SE3 exp/log used throughout the reference.

Conventions: rotations are 3x3 matrices (TPU-friendly: compose with matmul on
the MXU); quaternions are [w, x, y, z] and only used at the I/O boundary
(IMU messages, TUM export) and for slerp-based deskew.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of a 3-vector; batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jax.Array) -> jax.Array:
    """Inverse of `hat`."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _sin_x_over_x(x2: jax.Array) -> jax.Array:
    """sin(sqrt(x2))/sqrt(x2), Taylor near 0. x2 = theta^2.

    sqrt argument is made safe BEFORE sqrt so autodiff through the unselected
    branch never sees d(sqrt)/dx at 0 (the where-NaN trap).
    """
    small = x2 < _EPS
    x = jnp.sqrt(jnp.where(small, 1.0, x2))
    return jnp.where(small, 1.0 - x2 / 6.0, jnp.sin(x) / x)


def _one_minus_cos_over_x2(x2: jax.Array) -> jax.Array:
    """(1-cos(theta))/theta^2 with Taylor near 0."""
    small = x2 < _EPS
    safe2 = jnp.where(small, 1.0, x2)
    x = jnp.sqrt(safe2)
    return jnp.where(small, 0.5 - x2 / 24.0, (1.0 - jnp.cos(x)) / safe2)


def _x_minus_sin_over_x3(x2: jax.Array) -> jax.Array:
    """(theta-sin(theta))/theta^3 with Taylor near 0."""
    small = x2 < _EPS
    safe2 = jnp.where(small, 1.0, x2)
    x = jnp.sqrt(safe2)
    return jnp.where(small, 1.0 / 6.0 - x2 / 120.0, (x - jnp.sin(x)) / (safe2 * x))


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: axis-angle 3-vector -> rotation matrix. Batched."""
    theta2 = jnp.sum(w * w, axis=-1)
    a = _sin_x_over_x(theta2)[..., None, None]
    b = _one_minus_cos_over_x2(theta2)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle 3-vector; robust near 0 and pi. Batched.

    Autodiff-safe at the identity: theta comes from atan2(|skew|, cos) and
    the Taylor branch never touches sqrt(0), so Jacobians of residuals like
    log(R_meas^T R) are finite when the residual is exactly zero (the common
    case at a converged factor graph).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Generic branch: vee((R - R^T)/2) * theta/sin(theta)
    w_skew = 0.5 * vee(R - jnp.swapaxes(R, -1, -2))
    s2 = jnp.sum(w_skew * w_skew, axis=-1)  # sin^2(theta)
    near_pi = cos_theta < -1.0 + 1e-11
    small = s2 < 1e-12
    s = jnp.sqrt(jnp.where(small, 1.0, s2))  # safe sqrt
    theta = jnp.arctan2(s, cos_theta)
    # theta/sin(theta): Taylor (in sin^2) near 0, exact elsewhere
    scale = jnp.where(small, 1.0 + s2 / 6.0, theta / s)
    w_generic = w_skew * scale[..., None]
    # Near pi: R ~ I + 2 ww^T/theta^2... use diagonal formulation.
    # (R + I)/2 = ww^T/theta^2 * (1-cos)/... ; axis from largest diagonal of R+I.
    B = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) / 2.0
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.linalg.norm(col, axis=-1, keepdims=True).clip(_EPS)
    # Fix sign using the skew part (which may be tiny but carries the sign);
    # if exactly pi the sign is arbitrary.
    sign = jnp.where(jnp.sum(axis * w_skew, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = axis * (sign * theta)[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Jr(w): exp(w + dw) ~ exp(w) exp(Jr(w) dw). Batched.

    Jr = I - (1-cos)/t^2 W + (t - sin)/t^3 W^2.
    Matches the reference's right-Jacobian usage
    (radar_graph_slam/src/radar_graph_slam/imu_preintegration.cpp:44-59).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    b = _one_minus_cos_over_x2(theta2)[..., None, None]
    c = _x_minus_sin_over_x3(theta2)[..., None, None]
    return eye - b * W + c * (W @ W)


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Jl(w) = Jr(-w)."""
    return so3_right_jacobian(-w)


def so3_right_jacobian_inv(w: jax.Array) -> jax.Array:
    """Jr(w)^-1 = I + W/2 + (1/t^2 - (1+cos)/(2 t sin)) W^2. Batched.

    Matches the analytic inverse right Jacobian of the reference IMU factor
    (g2o/edge_se3_interial.hpp:104-118).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    small = theta2 < _EPS
    safe2 = jnp.where(small, 1.0, theta2)
    safe_t = jnp.sqrt(safe2)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe2 - (1.0 + jnp.cos(safe_t)) / (2.0 * safe_t * jnp.sin(safe_t)),
    )
    return eye + 0.5 * W + coef[..., None, None] * (W @ W)


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    return so3_right_jacobian_inv(-w)


# ---------------------------------------------------------------------------
# SE(3): represented as (R [...,3,3], t [...,3]) pairs or 4x4 matrices.
# ---------------------------------------------------------------------------


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack (R, t) into a homogeneous 4x4. Batched."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_inverse(T: jax.Array) -> jax.Array:
    """Inverse of homogeneous 4x4. Batched."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def se3_exp(xi: jax.Array) -> jax.Array:
    """se(3) -> SE(3) 4x4. xi = [omega(3), rho(3)] (rotation first). Batched."""
    w = xi[..., :3]
    rho = xi[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    return se3_matrix(R, jnp.einsum("...ij,...j->...i", V, rho))


def se3_log(T: jax.Array) -> jax.Array:
    """SE(3) 4x4 -> [omega, rho]. Batched."""
    w = so3_log(T[..., :3, :3])
    Vinv = so3_left_jacobian_inv(w)
    rho = jnp.einsum("...ij,...j->...i", Vinv, T[..., :3, 3])
    return jnp.concatenate([w, rho], axis=-1)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply 4x4 transform(s) to [..., N, 3] points (rigid)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


# ---------------------------------------------------------------------------
# Quaternions [w, x, y, z] — boundary / deskew only.
# ---------------------------------------------------------------------------


def quat_to_rot(q: jax.Array) -> jax.Array:
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion [w,x,y,z], branch-free (Shepperd). Batched."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick numerically best
    qw = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3], axis=-1),
        ],
        axis=-2,
    )
    idx = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_slerp(q0: jax.Array, q1: jax.Array, u: jax.Array) -> jax.Array:
    """Spherical interpolation; u broadcastable. Used by deskew."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - u, jnp.sin((1.0 - u) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, u, jnp.sin(u * theta) / jnp.where(small, 1.0, sin_theta))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True).clip(_EPS)


def rotation_angle(R: jax.Array) -> jax.Array:
    """Geodesic angle of a rotation matrix, radians. Batched."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def normalize_rotation(R: jax.Array) -> jax.Array:
    """Project a near-rotation matrix back onto SO(3) (orthonormalize).

    Gram-Schmidt based; cheap and good enough for drift control after long
    compositions in f32.
    """
    x = R[..., :, 0]
    y = R[..., :, 1]
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(_EPS)
    y = y - jnp.sum(x * y, axis=-1, keepdims=True) * x
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True).clip(_EPS)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=-1)


def ypr_from_rot(R: jax.Array) -> jax.Array:
    """Yaw-pitch-roll (ZYX) from rotation matrix, like reference R2ypr
    (radar_graph_slam/include/radar_graph_slam/ros_utils.hpp)."""
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)
