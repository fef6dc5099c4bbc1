import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu.core import lie
from rivslam_tpu.core.config import RegistrationConfig
from rivslam_tpu.frontend import apdgicp, vgicp
from rivslam_tpu.io import synthetic

CFG = RegistrationConfig(transformation_epsilon=5e-4, voxel_resolution=1.0)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(8)
    world = synthetic.make_world(rng, n_points=12000)
    T0 = np.eye(4)
    T0[:3, 3] = [0, 0, 2.0]
    xi = np.array([0.0, 0.0, 0.03, 0.3, -0.2, 0.03])
    T_rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    tgt = synthetic.observe(world, T0, rng, capacity=1024, noise=0.01, dtype=jnp.float64)
    src = synthetic.observe(world, T0 @ T_rel, rng, capacity=1024, noise=0.01, dtype=jnp.float64)
    return src, tgt, T_rel


def test_voxel_map_build(scene):
    src, tgt, _ = scene
    vm = vgicp.build_voxel_map(tgt.xyz, tgt.mask, CFG, capacity=2048)
    n = int(np.asarray(vm.valid).sum())
    assert n > 200
    # per-voxel covs are SPD
    covs = np.asarray(vm.cov)[np.asarray(vm.valid)]
    assert (np.linalg.eigvalsh(covs) > 0).all()


def test_vgicp_alignment(scene):
    src, tgt, T_rel = scene
    s = apdgicp.estimate_covariances(src.xyz, src.mask, CFG)
    vm = vgicp.build_voxel_map(tgt.xyz, tgt.mask, CFG, capacity=2048)
    res = vgicp.register_vgicp(s, vm, jnp.eye(4, dtype=jnp.float64), CFG)
    assert bool(res.converged)
    delta = np.asarray(lie.se3_inverse(res.T)) @ T_rel
    dt = np.linalg.norm(delta[:3, 3])
    dr = float(lie.rotation_angle(jnp.asarray(delta[:3, :3]))) * 180 / np.pi
    # voxelized metric trades accuracy for robustness/speed: sub-voxel recovery
    assert dt < 0.5, dt
    assert dr < 2.0, dr


def test_vgicp_exact_on_identity(scene):
    src, tgt, _ = scene
    s = apdgicp.estimate_covariances(tgt.xyz, tgt.mask, CFG)
    vm = vgicp.build_voxel_map(tgt.xyz, tgt.mask, CFG, capacity=2048)
    res = vgicp.register_vgicp(s, vm, jnp.eye(4, dtype=jnp.float64), CFG)
    # registering the map's own source cloud stays near identity
    assert np.linalg.norm(np.asarray(res.T)[:3, 3]) < 0.2


@pytest.mark.parametrize("mode", ["P2D", "D2D"])
def test_ndt_alignment(scene, mode):
    # NDT runs the reference's convergence epsilon (0.01,
    # registrations.cpp:56): with the DIRECT7 neighborhood (the NDT_OMP
    # default, registrations.cpp:117) the P2D objective is piecewise in the
    # pose — correspondences switch when a point crosses a voxel boundary —
    # so the pose limit-cycles at the boundary-jitter scale (~1e-3) and an
    # epsilon below that never fires, even though accuracy is BETTER than
    # the KDTREE mode (0.014 vs 0.07 m on this scene). The reference never
    # runs eps < 0.01 (launch value is 0.1).
    import dataclasses

    cfg = dataclasses.replace(CFG, transformation_epsilon=1e-2)
    src, tgt, T_rel = scene
    vm = vgicp.build_voxel_map(tgt.xyz, tgt.mask, cfg, capacity=2048)
    res = vgicp.register_ndt(
        src.xyz, src.mask, vm, jnp.eye(4, dtype=jnp.float64), cfg, mode=mode
    )
    assert bool(res.converged)
    delta = np.asarray(lie.se3_inverse(res.T)) @ T_rel
    assert np.linalg.norm(delta[:3, 3]) < 0.6, np.linalg.norm(delta[:3, 3])


def test_direct7_lookup_matches_bruteforce(scene):
    """The packed-key searchsorted DIRECT7 lookup finds EXACTLY the voxels a
    brute-force coords comparison finds (the [N,V]-free fast path must not
    change which cells participate)."""
    src, tgt, _ = scene
    s = apdgicp.estimate_covariances(src.xyz, src.mask, CFG)
    vm = vgicp.build_voxel_map(tgt.xyz, tgt.mask, CFG, capacity=2048)
    T = jnp.eye(4, dtype=jnp.float64)
    mean_B, corr, _ = vgicp._voxel_correspondences_direct(T, s, vm, CFG, 7)
    coords = np.asarray(vm.coords)
    valid = np.asarray(vm.valid)
    c = np.floor(np.asarray(src.xyz) / CFG.voxel_resolution).astype(np.int64)
    offs = np.asarray(vgicp._DIRECT7_OFFSETS)
    want = c[:, None, :] + offs[None]  # [N,7,3]
    # brute force: does each wanted coord exist among valid voxels?
    table = {tuple(q): i for i, q in enumerate(coords) if valid[i]}
    hit_bf = np.array(
        [[tuple(w) in table for w in row] for row in want]
    ) & np.asarray(src.mask)[:, None]
    np.testing.assert_array_equal(np.asarray(corr), hit_bf)
    # and the one-hot matmul gathered exactly the matched voxel's mean
    means = np.asarray(vm.mean)
    ii = np.array([table[tuple(w)] for w in want[np.asarray(corr)]])
    np.testing.assert_allclose(
        np.asarray(mean_B)[np.asarray(corr)], means[ii], rtol=1e-12
    )
