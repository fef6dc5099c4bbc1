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


def test_dataset_presets_ship_rbf_covariances():
    """Round-5 sweep decision (presets._rbf_covariances): dataset presets
    run RBF covariances at kernel width 4.0 — 8/8 validation-arm ATE wins
    over KNN (VALIDATION_r5_*.json) at +55% throughput — while the bare
    RegistrationConfig stays reference-launch-parity (KNN, kw 0.25)."""
    for name in ("cp", "nyl", "garden", "ntu4dradlm", "mine", "hugin"):
        reg = presets.get(name).registration
        assert reg.covariance_method == "RBF", name
        assert reg.rbf_kernel_width == 4.0, name
    # faithful bases unchanged
    assert EngineConfig().registration.covariance_method == "KNN"
    assert EngineConfig().registration.rbf_kernel_width == 0.25


def test_unknown_preset():
    with pytest.raises(ValueError, match="available"):
        presets.get("nope")
