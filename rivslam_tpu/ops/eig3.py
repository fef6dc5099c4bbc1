"""Closed-form symmetric 3x3 eigen-analysis — branch-free, batched, fast.

`jnp.linalg.eigh` on batched 3x3s runs an iterative QR that maps terribly
onto the TPU (measured ~100x the cost of the distance matrix it follows).
GICP's PLANE regularization only ever needs the SMALLEST eigenvector v:
    U diag(1, 1, eps) U^T  ==  I - (1 - eps) v v^T
so we compute eigenvalues by Cardano's trigonometric formula and the
smallest eigenvector by the best-conditioned cross product of rows of
(A - lambda_min I). Pure VPU arithmetic, fully batched.

Degenerate spectra (lambda_2 ~ lambda_min: the disc orientation is genuinely
ambiguous; isotropic: any basis works) fall back to a fixed axis — exactly
the cases where the regularized covariance is insensitive to the choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smallest_eigenvalue_soa(a00, a01, a02, a11, a12, a22):
    """Smallest eigenvalue from the 6 unique components (Cardano)."""
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    small = p2 < 1e-24
    p_safe = jnp.sqrt(jnp.where(small, 1.0, p2) / 6.0)
    inv_p = jnp.where(small, 0.0, 1.0 / p_safe)
    p = jnp.where(small, 0.0, p_safe)
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) * (inv_p**3)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    return q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)


def smallest_eigenvector_soa(a00, a01, a02, a11, a12, a22):
    """Unit smallest-eigenvector components from symmetric components."""
    lam = smallest_eigenvalue_soa(a00, a01, a02, a11, a12, a22)
    b00, b11, b22 = a00 - lam, a11 - lam, a22 - lam
    # rows of B: r0=(b00,a01,a02), r1=(a01,b11,a12), r2=(a02,a12,b22)
    c0x = a01 * a12 - a02 * b11
    c0y = a02 * a01 - b00 * a12
    c0z = b00 * b11 - a01 * a01
    c1x = b11 * b22 - a12 * a12
    c1y = a12 * a02 - a01 * b22
    c1z = a01 * a12 - b11 * a02
    # r2 x r0 components:
    c2x = a12 * a02 - b22 * a01
    c2y = b22 * b00 - a02 * a02
    c2z = a02 * a01 - a12 * b00
    n0 = c0x * c0x + c0y * c0y + c0z * c0z
    n1 = c1x * c1x + c1y * c1y + c1z * c1z
    n2 = c2x * c2x + c2y * c2y + c2z * c2z
    use1 = (n1 >= n0) & (n1 >= n2)
    use2 = (n2 > n0) & ~use1
    vx = jnp.where(use1, c1x, jnp.where(use2, c2x, c0x))
    vy = jnp.where(use1, c1y, jnp.where(use2, c2y, c0y))
    vz = jnp.where(use1, c1z, jnp.where(use2, c2z, c0z))
    nbest = jnp.where(use1, n1, jnp.where(use2, n2, n0))
    ok = nbest > 1e-20
    vx = jnp.where(ok, vx, 0.0)
    vy = jnp.where(ok, vy, 0.0)
    vz = jnp.where(ok, vz, 1.0)
    inv = 1.0 / jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-20))
    return vx * inv, vy * inv, vz * inv


def plane_regularize_soa(a00, a01, a02, a11, a12, a22, eps: float = 1e-3):
    """PLANE regularization in component form:
    I - (1-eps) v v^T with v the smallest eigenvector."""
    vx, vy, vz = smallest_eigenvector_soa(a00, a01, a02, a11, a12, a22)
    s = 1.0 - eps
    one = jnp.ones_like(a00)
    return (
        one - s * vx * vx,
        -s * vx * vy,
        -s * vx * vz,
        one - s * vy * vy,
        -s * vy * vz,
        one - s * vz * vz,
    )


def eigenvalues_sym3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric [..., 3, 3], ascending. Cardano/trig form."""
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    small = p2 < 1e-24
    p_safe = jnp.sqrt(jnp.where(small, 1.0, p2) / 6.0)
    inv_p = jnp.where(small, 0.0, 1.0 / p_safe)
    p = jnp.where(small, 0.0, p_safe)
    # det(B)/2 with B = (A - q I)/p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) * (inv_p**3)
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)  # largest
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = 3.0 * q - l1 - l3
    return jnp.stack([l3, l2, l1], axis=-1)


def smallest_eigenvector_sym3(A: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric [..., 3, 3]."""
    lam = eigenvalues_sym3(A)[..., 0]
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c0 = jnp.cross(r0, r1)
    c1 = jnp.cross(r1, r2)
    c2 = jnp.cross(r2, r0)
    n0 = jnp.sum(c0 * c0, axis=-1)
    n1 = jnp.sum(c1 * c1, axis=-1)
    n2 = jnp.sum(c2 * c2, axis=-1)
    ns = jnp.stack([n0, n1, n2], axis=-1)
    cs = jnp.stack([c0, c1, c2], axis=-2)
    best = jnp.argmax(ns, axis=-1)
    v = jnp.take_along_axis(cs, best[..., None, None].repeat(3, axis=-1), axis=-2)[
        ..., 0, :
    ]
    nbest = jnp.take_along_axis(ns, best[..., None], axis=-1)[..., 0]
    # degenerate spectrum: direction ambiguous -> fixed fallback axis
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], dtype=A.dtype), v.shape
    )
    ok = nbest > 1e-20
    v = jnp.where(ok[..., None], v, fallback)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-20)


def plane_regularize(cov: jax.Array, eps: float = 1e-3) -> jax.Array:
    """GICP PLANE regularization without eigh:
    U diag(1,1,eps) U^T = I - (1-eps) v v^T with v the smallest eigenvector."""
    v = smallest_eigenvector_sym3(cov)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cov.dtype), cov.shape)
    return eye - (1.0 - eps) * v[..., :, None] * v[..., None, :]
