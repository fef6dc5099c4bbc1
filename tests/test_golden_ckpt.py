"""Golden-file checkpoint compatibility.

tests/golden/ckpt_v1 was written by tests/_golden_gen.py and committed; this
test guarantees that future checkpoint-format changes either stay
load-compatible with version-1 dumps or bump the manifest version (in which
case load must fail loudly, not misread arrays).
"""

import json
import os
import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from rivslam_tpu import pipeline
from rivslam_tpu.io import checkpoint

from _golden_gen import golden_config

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden", "ckpt_v1")


def test_golden_checkpoint_loads():
    eng = pipeline.Engine(golden_config(), dtype=jnp.float64)
    checkpoint.load(eng, GOLDEN)
    st = eng.state
    assert st.kf_count == 8
    assert len(st.kf_clouds) == 8
    assert len(st.trajectory) == 8
    assert int(np.asarray(jnp.sum(st.graph.node_mask))) == 8
    assert int(st.scdb.count) == 8
    # poses track the generating straight-line trajectory (0.7 m steps in x)
    kf = eng.optimized_keyframe_poses()
    assert np.all(np.isfinite(kf))
    x = kf[:, 0, 3]
    assert np.all(np.diff(x) > 0.2), x


def test_golden_checkpoint_resumes():
    """A loaded session keeps processing frames (resume-and-continue)."""
    from rivslam_tpu.io import synthetic

    eng = pipeline.Engine(golden_config(), dtype=jnp.float64)
    checkpoint.load(eng, GOLDEN)
    n0 = eng.state.frame_idx
    rng = np.random.default_rng(7)
    world = synthetic.make_world(rng, n_points=4000)
    T = np.eye(4)
    T[:3, 3] = [0.7 * 8, 0.0, 2.0]
    cl = synthetic.observe(world, T, rng, capacity=256, noise=0.005, dtype=jnp.float64)
    zeros = (np.zeros(32), np.zeros((32, 3)), np.zeros((32, 3)), np.zeros(32, bool))
    out = eng.process_frame(cl, 0.25 * 8, *zeros)
    assert eng.state.frame_idx == n0 + 1
    assert np.all(np.isfinite(out["pose"]))


def test_future_version_rejected(tmp_path):
    tampered = tmp_path / "ckpt"
    shutil.copytree(GOLDEN, tampered)
    m = json.loads((tampered / "manifest.json").read_text())
    m["version"] = 99
    (tampered / "manifest.json").write_text(json.dumps(m))
    eng = pipeline.Engine(golden_config(), dtype=jnp.float64)
    with pytest.raises(ValueError, match="version"):
        checkpoint.load(eng, str(tampered))
