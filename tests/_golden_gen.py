"""Regenerate the golden checkpoint (run from repo root with tests on path):
    JAX_PLATFORMS=cpu python tests/_golden_gen.py
Uses the same tiny config as tests/test_golden_ckpt.py — keep them in sync.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp


def golden_config():
    from rivslam_tpu.core.config import (
        BackendConfig, EngineConfig, LoopConfig, OdometryConfig,
        PreprocessConfig, RegistrationConfig,
    )
    return EngineConfig(
        preprocess=PreprocessConfig(
            enable_dynamic_object_removal=False,
            outlier_removal_method="NONE",
            enable_deskew=False,
            raw_capacity=256,
            filtered_capacity=256,
        ),
        odometry=OdometryConfig(keyframe_delta_trans=0.3, keyframe_min_size=10),
        registration=RegistrationConfig(method="FAST_GICP", max_iterations=8),
        backend=BackendConfig(max_solver_iterations=3),
        loop=LoopConfig(keyframe_capacity=16, enable=False),
    )


def run_session():
    from rivslam_tpu import pipeline
    from rivslam_tpu.io import synthetic

    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=4000)
    eng = pipeline.Engine(golden_config(), dtype=jnp.float64)
    zeros = (np.zeros(32), np.zeros((32, 3)), np.zeros((32, 3)), np.zeros(32, bool))
    for i in range(8):
        T = np.eye(4)
        T[:3, 3] = [0.7 * i, 0.0, 2.0]
        cl = synthetic.observe(world, T, rng, capacity=256, noise=0.005, dtype=jnp.float64)
        eng.process_frame(cl, 0.25 * i, *zeros)
    return eng


if __name__ == "__main__":
    from rivslam_tpu.io import checkpoint

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "ckpt_v1")
    eng = run_session()
    checkpoint.dump(eng, out)
    print("golden checkpoint ->", out, "kf_count:", eng.state.kf_count)
