"""CLI entry point (python -m rivslam_tpu) end-to-end."""

import os
import subprocess
import sys

import numpy as np


def test_cli_replay(tmp_path):
    sys.path.insert(0, "tests")
    from test_datasets import make_sequence

    seq, poses = make_sequence()
    seq_path = str(tmp_path / "seq.npz")
    seq.save(seq_path)
    out_path = str(tmp_path / "traj.txt")
    map_path = str(tmp_path / "map.pcd")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RIVSLAM_FORCE_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-m", "rivslam_tpu", "--seq", seq_path, "--out", out_path,
         "--map", map_path, "--capacity", "256", "--imu-capacity", "32",
         "--method", "FAST_GICP"],
        capture_output=True, text=True, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    from rivslam_tpu.io import tum

    ts, p = tum.load_tum(out_path)
    assert len(ts) == seq.num_frames
    assert np.isfinite(p).all()
    assert os.path.exists(map_path)
    assert "| stage |" in r.stdout
