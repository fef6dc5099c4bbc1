"""Voxel-grid downsample wired into the LIVE preprocessing chain.

Round-2 verdict item: `PreprocessConfig.downsample_method` existed but
`pipeline._preprocess` never called the op — a dead knob. The reference
downsamples every scan between the distance filter and outlier removal
(preprocessing_nodelet.cpp:796-816, :850; launch:57-59, resolution 0.1).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rivslam_tpu import pipeline
from rivslam_tpu.core.config import (
    EngineConfig, FloorConfig, PreprocessConfig, RegistrationConfig,
)
from rivslam_tpu.core.pointcloud import RadarCloud
from rivslam_tpu.ops import voxel

CAP = 512


def _dense_cloud(rng, n_clusters=40, per_cluster=8, res=0.5):
    """Clusters well inside single voxels so downsampling is predictable."""
    centers = rng.uniform(-8, 8, size=(n_clusters, 3))
    # snap centers to voxel centers so each cluster occupies exactly 1 voxel
    centers = (np.floor(centers / res) + 0.5) * res
    pts = (centers[:, None, :] + rng.uniform(-0.1, 0.1, size=(n_clusters, per_cluster, 3)) * res).reshape(-1, 3)
    n = len(pts)
    xyz = np.zeros((CAP, 3))
    xyz[:n] = pts
    mask = np.zeros(CAP, bool)
    mask[:n] = True
    return RadarCloud(
        xyz=jnp.asarray(xyz, jnp.float64),
        doppler=jnp.zeros(CAP, jnp.float64),
        intensity=jnp.full(CAP, 20.0, jnp.float64),
        mask=jnp.asarray(mask),
    ), n_clusters


def _engine(method, res=0.5):
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False,
            outlier_removal_method="NONE",
            enable_deskew=False,
            enable_under_floor_removal=False,
            downsample_method=method,
            downsample_resolution=res,
        ),
        registration=RegistrationConfig(method="FAST_GICP", max_iterations=4),
        floor=FloorConfig(floor_pts_thresh=50),
    )
    return pipeline.Engine(cfg, dtype=jnp.float64)


def test_engine_downsample_matches_standalone_op(rng):
    """With every later filter off, the engine's preprocessed cloud must be
    exactly voxel_downsample(applied at the same chain position) of the
    NONE-path cloud."""
    cloud, n_clusters = _dense_cloud(rng)
    import jax
    key = jax.random.key(0)
    prev_floor = jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float64)

    eng_none = _engine("NONE")
    cl_none, *_ = eng_none._preprocess(cloud, jnp.zeros(3, jnp.float64), key, prev_floor)
    eng_vox = _engine("VOXELGRID")
    cl_vox, *_ = eng_vox._preprocess(cloud, jnp.zeros(3, jnp.float64), key, prev_floor)

    expected = voxel.voxel_downsample(cl_none, 0.5, CAP)
    np.testing.assert_allclose(np.asarray(cl_vox.xyz), np.asarray(expected.xyz), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(cl_vox.mask), np.asarray(expected.mask))
    # one output point per occupied voxel = one per cluster
    assert int(np.asarray(cl_vox.mask).sum()) == n_clusters
    # each surviving point is the centroid of its cluster (pcl::VoxelGrid)
    valid = np.asarray(cl_vox.xyz)[np.asarray(cl_vox.mask)]
    src = np.asarray(cl_none.xyz)[np.asarray(cl_none.mask)]
    vidx = np.floor(src / 0.5).astype(int)
    for pt in valid:
        cell = np.floor(pt / 0.5).astype(int)
        members = src[(vidx == cell).all(axis=1)]
        np.testing.assert_allclose(pt, members.mean(axis=0), atol=1e-9)


def test_downsample_respects_none():
    """NONE keeps the cloud untouched (knob really routes)."""
    rng = np.random.default_rng(3)
    cloud, _ = _dense_cloud(rng)
    import jax
    key = jax.random.key(0)
    prev_floor = jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float64)
    eng = _engine("NONE")
    cl, *_ = eng._preprocess(cloud, jnp.zeros(3, jnp.float64), key, prev_floor)
    assert int(np.asarray(cl.mask).sum()) == int(np.asarray(cloud.mask).sum())
