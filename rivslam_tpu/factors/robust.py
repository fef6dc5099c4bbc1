"""Robust kernels as IRLS weights on whitened residual blocks.

g2o applies a robust kernel rho to each edge's chi2 and scales the edge's
contribution by rho'(chi2) during linearization (RobustKernelHuber etc.,
used via add_robust_kernel, graph_slam.cpp:463-478). We reproduce that as a
per-edge weight w = rho'(chi2) multiplying the (whitened) residual and its
Jacobian — identical normal equations to g2o's implementation.
"""

from __future__ import annotations

import jax.numpy as jnp


def kernel_weight(name: str, delta: float, chi2):
    """Weight rho'(chi2) for a given kernel. chi2 is the edge's squared
    whitened residual norm; returns a scalar (or batched) weight."""
    if name == "NONE":
        return jnp.ones_like(chi2)
    if name == "Huber":
        # g2o RobustKernelHuber: rho(s) = s if s <= d^2 else 2 d sqrt(s) - d^2
        # rho'(s) = 1 if s <= d^2 else d / sqrt(s)
        d2 = delta * delta
        s = jnp.maximum(chi2, 1e-30)
        return jnp.where(chi2 <= d2, 1.0, delta / jnp.sqrt(s))
    if name == "Cauchy":
        d2 = delta * delta
        return 1.0 / (1.0 + chi2 / d2)
    if name == "GemanMcClure":
        d2 = delta * delta
        return (d2 / (d2 + chi2)) ** 2
    if name == "Welsch":
        d2 = delta * delta
        return jnp.exp(-chi2 / d2)
    if name == "Fair":
        d = delta
        s = jnp.sqrt(jnp.maximum(chi2, 1e-30))
        return 1.0 / (1.0 + s / d)
    if name == "DCS":
        phi = delta
        return jnp.minimum(1.0, (2.0 * phi / (phi + chi2)) ** 2)
    if name == "Saturated":
        d2 = delta * delta
        return jnp.where(chi2 <= d2, 1.0, d2 / jnp.maximum(chi2, 1e-30))
    if name == "Tukey":
        d2 = delta * delta
        u = 1.0 - chi2 / d2
        return jnp.where(chi2 <= d2, u * u, 0.0)
    if name == "PseudoHuber":
        d2 = delta * delta
        return 1.0 / jnp.sqrt(1.0 + chi2 / d2)
    raise ValueError(f"unknown robust kernel {name}")
