"""Dataset presets resolve to valid engine configs."""

import pytest

from rivslam_tpu import presets
from rivslam_tpu.core.config import EngineConfig


def test_all_presets_resolve():
    for name in presets.names():
        cfg = presets.get(name)
        assert isinstance(cfg, EngineConfig)
        assert hash(cfg) is not None  # frozen/hashable: jit-closure safe


def test_preset_deltas():
    assert presets.get("mine").odometry.use_ego_vel
    assert presets.get("long").loop.keyframe_capacity == 4096
    assert presets.get("cp").odometry.keyframe_delta_trans == 0.5


def test_unknown_preset():
    with pytest.raises(ValueError, match="available"):
        presets.get("nope")
