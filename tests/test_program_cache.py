"""Cross-engine program cache (_PROGRAM_CACHE): a fresh Engine with an
already-seen config must bind the SAME jitted stage programs (zero
re-trace / re-compile for new sessions), without any behavioral coupling —
engines share code, never state."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from rivslam_tpu import pipeline
from rivslam_tpu.core.config import EngineConfig, PreprocessConfig, RegistrationConfig
from rivslam_tpu.io import synthetic


def _cfg(**reg):
    return EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False,
            outlier_removal_method="NONE",
            enable_deskew=False,
        ),
        registration=RegistrationConfig(method="FAST_GICP", **reg),
    )


def test_same_config_shares_programs():
    e1 = pipeline.Engine(_cfg(), dtype=jnp.float64)
    e2 = pipeline.Engine(_cfg(), dtype=jnp.float64)
    assert e1._frame_step is e2._frame_step
    assert e1._solve_graph is e2._solve_graph
    assert e1._prog is e2._prog
    # different config -> different programs
    e3 = pipeline.Engine(_cfg(max_iterations=7), dtype=jnp.float64)
    assert e3._frame_step is not e1._frame_step


def test_warm_engine_reproduces_cold_engine():
    rng = np.random.default_rng(5)
    world = synthetic.make_world(rng, n_points=6000)
    frames = []
    for i in range(6):
        T = np.eye(4)
        T[:3, 3] = [0.4 * i, 0.05 * i, 2.0]
        frames.append(
            synthetic.observe(world, T, rng, capacity=256, noise=0.004, dtype=jnp.float64)
        )
    zeros = (np.zeros(8), np.zeros((8, 3)), np.zeros((8, 3)), np.zeros(8, bool))

    def run():
        eng = pipeline.Engine(_cfg(), dtype=jnp.float64, seed=0)
        outs = [eng.process_frame(frames[i], 0.25 * i, *zeros) for i in range(6)]
        return np.stack([o["odom"] for o in outs])

    a = run()
    b = run()  # second engine binds cached programs
    np.testing.assert_array_equal(a, b)


def test_shared_replay_scan():
    seq, _ = synthetic.simulate_sequence(n_frames=8, seed=3, capacity=128)
    from rivslam_tpu.io import datasets

    stacked = datasets.stack_sequence(seq, capacity=128, imu_capacity=16)
    cfg = _cfg()
    e1 = pipeline.Engine(cfg, dtype=jnp.float32, seed=0)
    r1 = e1.replay_sequence(stacked)
    e2 = pipeline.Engine(cfg, dtype=jnp.float32, seed=0)
    e2._build_replay_fn()
    assert e2._replay_scan is e1._replay_scan  # no rebuild, no re-jit
    r2 = e2.replay_sequence(stacked)
    np.testing.assert_array_equal(r1["odom"], r2["odom"])
