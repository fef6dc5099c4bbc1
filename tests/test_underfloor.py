"""Under-floor removal feeding odometry (launch:14, scan_matching:87-92)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rivslam_tpu import pipeline
from rivslam_tpu.core.config import (
    EngineConfig, FloorConfig, PreprocessConfig, RegistrationConfig,
)
from rivslam_tpu.core.pointcloud import RadarCloud


def _scene(rng, n_floor=400, n_wall=200, n_ghost=64, cap=1024):
    """Sensor-frame cloud: floor at z=-2, wall features, ghosts 1 m below."""
    floor = np.stack([
        rng.uniform(-10, 10, n_floor), rng.uniform(-10, 10, n_floor),
        np.full(n_floor, -2.0) + rng.normal(0, 0.01, n_floor)], axis=1)
    wall = np.stack([
        rng.uniform(5, 10, n_wall), rng.uniform(-3, 3, n_wall),
        rng.uniform(-1.5, 1.0, n_wall)], axis=1)
    ghost = np.stack([
        rng.uniform(-10, 10, n_ghost), rng.uniform(-10, 10, n_ghost),
        np.full(n_ghost, -3.0)], axis=1)
    pts = np.concatenate([floor, wall, ghost])
    n = len(pts)
    xyz = np.zeros((cap, 3)); xyz[:n] = pts
    mask = np.zeros(cap, bool); mask[:n] = True
    return RadarCloud(
        xyz=jnp.asarray(xyz, jnp.float64),
        doppler=jnp.zeros(cap, jnp.float64),
        intensity=jnp.full(cap, 20.0, jnp.float64),
        mask=jnp.asarray(mask),
    ), n_ghost


def _engine(remove: bool):
    cfg = EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False,
            outlier_removal_method="NONE",
            enable_deskew=False,
            enable_under_floor_removal=remove,
        ),
        registration=RegistrationConfig(method="FAST_GICP", max_iterations=4),
        floor=FloorConfig(floor_pts_thresh=50),
    )
    return pipeline.Engine(cfg, dtype=jnp.float64)


def test_ghosts_removed_from_odometry_input(rng):
    cloud, n_ghost = _scene(rng)
    z = (np.zeros(16), np.zeros((16, 3)), np.zeros((16, 3)), np.zeros(16, bool))
    counts = {}
    for remove in (False, True):
        eng = _engine(remove)
        out = eng.process_frame(cloud, 0.0, *z)
        assert out["floor"] is not None  # floor plane found on this scene
        counts[remove] = int(np.asarray(eng.state.odo.target.mask).sum())
    # the ghosts (below floor - tolerance) are gone; the floor itself stays
    assert counts[False] - counts[True] == n_ghost


def test_fallback_chain_threads(rng):
    cloud, _ = _scene(rng)
    z = (np.zeros(16), np.zeros((16, 3)), np.zeros((16, 3)), np.zeros(16, bool))
    eng = _engine(True)
    eng.process_frame(cloud, 0.0, *z)
    fp = np.asarray(eng.state.floor_prev)
    # prev plane is now the detected one (d ~ +2, normal ~ +z), not the initial
    assert fp[2] > 0.9 and abs(fp[3] - 2.0) < 0.3, fp
