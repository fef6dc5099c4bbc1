"""Registration method factory parity (registrations.cpp:38-140)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.frontend import apdgicp
from rivslam_tpu.io import synthetic


def _pair(rng, capacity=512):
    world = synthetic.make_world(rng, n_points=6000)
    T0 = np.eye(4)
    T0[:3, 3] = [0.0, 0.0, 2.0]
    T1 = T0.copy()
    T1[:3, 3] += [0.4, -0.15, 0.05]
    tgt = synthetic.observe(world, T0, rng, capacity=capacity, noise=0.005, dtype=jnp.float64)
    src = synthetic.observe(world, T1, rng, capacity=capacity, noise=0.005, dtype=jnp.float64)
    return src, tgt, T1[:3, 3] - T0[:3, 3]


@pytest.mark.parametrize(
    "method",
    ["ICP", "GICP", "GICP_OMP", "FAST_GICP", "FAST_APDGICP", "VGICP",
     "FAST_VGICP", "NDT", "NDT_OMP"],
)
def test_every_method_recovers_translation(rng, method):
    # runtime transformation_epsilon=0.1 stops voxel metrics a step early;
    # use the matcher-benchmark epsilon for the accuracy assertion
    cfg = RegistrationConfig(
        method=method, max_iterations=32, transformation_epsilon=5e-4
    )
    src, tgt, expect = _pair(rng)
    res = apdgicp.prepare_and_register(
        src.xyz, src.mask, tgt.xyz, tgt.mask, jnp.eye(4, dtype=jnp.float64), cfg
    )
    T = np.asarray(res.T)
    assert np.all(np.isfinite(T))
    # NDT's voxel-level distance is coarser; others should be tight
    atol = 0.5 if ("NDT" in method or "VGICP" in method) else 0.15
    np.testing.assert_allclose(T[:3, 3], expect, atol=atol)


def test_icp_ignores_covariances(rng):
    """ICP result must be independent of the covariance regularization."""
    src, tgt, expect = _pair(rng)
    outs = []
    for reg in ("PLANE", "NONE"):
        cfg = RegistrationConfig(method="ICP", max_iterations=32, regularization=reg)
        res = apdgicp.prepare_and_register(
            src.xyz, src.mask, tgt.xyz, tgt.mask, jnp.eye(4, dtype=jnp.float64), cfg
        )
        outs.append(np.asarray(res.T))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-9)
