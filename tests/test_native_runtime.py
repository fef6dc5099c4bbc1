"""C++ native runtime: container round-trip and prefetch loader."""

import numpy as np
import pytest

from rivslam_tpu.io import datasets
from rivslam_tpu.runtime import native


def make_seq(n_frames=12, rng=None):
    rng = rng or np.random.default_rng(2)
    frames = []
    t = 0.0
    for i in range(n_frames):
        n = rng.integers(20, 120)
        frames.append(dict(
            stamp=t, xyz=rng.normal(size=(n, 3)).astype(np.float64),
            doppler=rng.normal(size=n), intensity=rng.uniform(5, 30, size=n),
        ))
        t += 0.1
    imu_t = np.arange(0.0, t, 0.01)
    return datasets.RadarSequence.from_frames(
        frames, imu_t, rng.normal(size=(len(imu_t), 3)), rng.normal(size=(len(imu_t), 3))
    )


@pytest.fixture(scope="module")
def rivbin_file(tmp_path_factory):
    seq = make_seq()
    path = str(tmp_path_factory.mktemp("rb") / "seq.rivbin")
    native.write_rivbin(path, seq)
    return path, seq


def test_build_and_open(rivbin_file):
    path, seq = rivbin_file
    ns = native.NativeSequence(path)
    assert ns.num_frames == seq.num_frames
    assert abs(ns.frame_stamp(3) - seq.frame_stamps[3]) < 1e-12
    assert ns.frame_count(3) == seq.offsets[4] - seq.offsets[3]
    ns.close()


def test_frame_roundtrip(rivbin_file):
    path, seq = rivbin_file
    ns = native.NativeSequence(path)
    cap = 128
    for i in [0, 5, seq.num_frames - 1]:
        xyz, dop, inten, mask = ns.read_frame(i, cap)
        f = seq.frame(i)
        k = len(f["xyz"])
        assert mask[:k].all() and not mask[k:].any()
        np.testing.assert_allclose(xyz[:k], f["xyz"], rtol=1e-6)
        np.testing.assert_allclose(dop[:k], f["doppler"], rtol=1e-5, atol=1e-6)
    ns.close()


def test_imu_between(rivbin_file):
    path, seq = rivbin_file
    ns = native.NativeSequence(path)
    k, stamps, acc, gyr = ns.imu_between(0.1, 0.2, 64)
    ref = (seq.imu_stamps > 0.1) & (seq.imu_stamps <= 0.2)
    assert k == ref.sum()
    np.testing.assert_allclose(stamps[:k], seq.imu_stamps[ref], atol=1e-12)
    np.testing.assert_allclose(acc[:k], seq.imu_acc[ref], rtol=1e-6)
    ns.close()


def test_prefetch_loader_in_order(rivbin_file):
    path, seq = rivbin_file
    ns = native.NativeSequence(path)
    loader = native.PrefetchLoader(ns, capacity=128, threads=3, max_queue=4)
    seen = []
    for idx, stamp, xyz, dop, inten, mask in loader:
        seen.append(idx)
        f = seq.frame(idx)
        k = len(f["xyz"])
        np.testing.assert_allclose(xyz[:k], f["xyz"], rtol=1e-6)
        assert int(mask.sum()) == k
    assert seen == list(range(seq.num_frames))
    loader.close()
    ns.close()


def test_aligned_loader_matches_python_path(rivbin_file):
    """next_aligned must reproduce the Python imu_between + clamp pipeline."""
    path, seq = rivbin_file
    ns = native.NativeSequence(path)
    loader = native.PrefetchLoader(ns, capacity=128, threads=2, max_queue=4)
    IMU_CAP = 32
    prev_t = None
    n_seen = 0
    while True:
        item = loader.next_aligned(IMU_CAP)
        if item is None:
            break
        idx, stamp, xyz, dop, inten, mask, dts, acc, gyr, imask = item
        t0 = prev_t if prev_t is not None else stamp - 0.1
        k, stamps, acc_ref, gyr_ref = ns.imu_between(t0, stamp, IMU_CAP)
        assert int(imask.sum()) == k
        if k:
            ref_dts = np.diff(np.concatenate([[t0], stamps[:k]])).clip(1e-4, 0.05)
            np.testing.assert_allclose(dts[:k], ref_dts, atol=1e-12)
            np.testing.assert_allclose(acc[:k], acc_ref[:k], rtol=1e-6)
            np.testing.assert_allclose(gyr[:k], gyr_ref[:k], rtol=1e-6)
        assert np.all(dts[k:] == 0.0) and not imask[k:].any()
        prev_t = stamp
        n_seen += 1
    assert n_seen == seq.num_frames
    loader.close()
    ns.close()
