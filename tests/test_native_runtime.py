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


# ---------------------------------------------------------------------------
# version-2 container: per-frame LZ4-block-compressed chunks
# ---------------------------------------------------------------------------


def test_lz4_codec_roundtrip_and_interop():
    """Native LZ4 block codec roundtrips, and its output is decodable by the
    INDEPENDENT pure-python decoder (io/lz4f.py) — two implementations of
    the public format validating each other."""
    from rivslam_tpu.io import lz4f

    rng = np.random.default_rng(0)
    cases = [
        b"",
        b"a",
        b"abcabcabcabcabcabcabcabcabcXYZ" * 10,
        bytes(rng.integers(0, 256, 100000, dtype=np.uint8)),  # incompressible
        bytes(np.zeros(65536, np.uint8)),
        (np.sin(np.arange(20000) * 0.01) * 100).astype(np.float32).tobytes(),
    ]
    for raw in cases:
        comp = native.lz4_block_compress(raw)
        assert native.lz4_block_decompress(comp, len(raw)) == raw
        if raw:
            assert lz4f.decompress_block(comp, len(raw)) == raw


def test_rivbin_v2_matches_v1(tmp_path):
    """The LZ4-chunked container decodes to exactly the same frames, stamps,
    masks, and IMU windows as the raw one, through both the direct reader
    and the prefetch loader."""
    seq = make_seq(n_frames=10)
    p1 = str(tmp_path / "v1.rivbin")
    p2 = str(tmp_path / "v2.rivbin")
    native.write_rivbin(p1, seq)
    native.write_rivbin(p2, seq, compress=True)
    s1, s2 = native.NativeSequence(p1), native.NativeSequence(p2)
    assert s1.format_version == 1 and s2.format_version == 2
    assert s2.num_frames == s1.num_frames
    for i in range(s1.num_frames):
        assert s2.frame_stamp(i) == s1.frame_stamp(i)
        assert s2.frame_count(i) == s1.frame_count(i)
        a = s1.read_frame(i, 128)
        b = s2.read_frame(i, 128)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    k1, st1, acc1, gyr1 = s1.imu_between(0.15, 0.55, 64)
    k2, st2, acc2, gyr2 = s2.imu_between(0.15, 0.55, 64)
    assert k1 == k2
    np.testing.assert_array_equal(st1, st2)
    np.testing.assert_array_equal(acc1, acc2)
    # prefetch loader path (decompression on worker threads)
    l1 = native.PrefetchLoader(s1, capacity=128, threads=3)
    l2 = native.PrefetchLoader(s2, capacity=128, threads=3)
    for f1, f2 in zip(l1, l2):
        assert f1[0] == f2[0] and f1[1] == f2[1]
        for x, y in zip(f1[2:], f2[2:]):
            np.testing.assert_array_equal(x, y)
    l1.close(); l2.close(); s1.close(); s2.close()


def test_rivbin_v2_corrupt_chunk_raises(tmp_path):
    """A corrupt LZ4 chunk must surface as an error, not as a silently
    zero-masked (or worse, all-origin) frame."""
    rng = np.random.default_rng(5)
    frames = [dict(
        stamp=0.1 * i,
        xyz=np.round(rng.normal(size=(60, 3)) * 8, 1),  # quantized => compressible
        doppler=np.round(rng.normal(size=60), 1),
        intensity=np.round(rng.uniform(5, 30, size=60)),
    ) for i in range(6)]
    imu_t = np.arange(0.0, 0.6, 0.01)
    seq = datasets.RadarSequence.from_frames(
        frames, imu_t, np.zeros((60, 3)), np.zeros((60, 3))
    )
    path = str(tmp_path / "v2.rivbin")
    native.write_rivbin(path, seq, compress=True)
    # v2 layout: 32-byte header | (stamp f64, count u64, chunk_off u64,
    # csize u64) * n | chunks | imu.  Overwrite frame 3's chunk with 0xFF
    # (token lit_len=15 + 0xFF extensions => literal run far past rsize).
    idx_dt = np.dtype([("stamp", "<f8"), ("count", "<u8"),
                       ("chunk_off", "<u8"), ("csize", "<u8")])
    with open(path, "r+b") as f:
        raw = f.read(32 + idx_dt.itemsize * seq.num_frames)
        index = np.frombuffer(raw[32:], dtype=idx_dt)
        assert int(index[3]["csize"]) < int(index[3]["count"]) * 20, \
            "chunk must actually be compressed for the decode path to run"
        chunk_base = 32 + idx_dt.itemsize * seq.num_frames
        off = chunk_base + int(index[3]["chunk_off"])
        f.seek(off)
        f.write(b"\xff" * int(index[3]["csize"]))
    ns = native.NativeSequence(path)
    ns.read_frame(1, 128)  # untouched frame still reads fine
    with pytest.raises(IOError, match="frame 3"):
        ns.read_frame(3, 128)
    ns.close()
    # the prefetch loader path must also surface it
    ns = native.NativeSequence(path)
    loader = native.PrefetchLoader(ns, capacity=128, threads=2)
    with pytest.raises(IOError, match="failed to decode"):
        for _ in loader:
            pass
    loader.close()
    ns.close()


def test_rivbin_odd_targets_imu_aligned(tmp_path):
    """v1 with an odd total target count puts the IMU stamp section at a
    4-mod-8 file offset; the reader must still return exact doubles (the
    misaligned section is copied into owned aligned storage)."""
    rng = np.random.default_rng(7)
    frames = []
    for i, n in enumerate([33, 40, 28]):  # total 101 targets (odd)
        frames.append(dict(
            stamp=0.1 * i, xyz=rng.normal(size=(n, 3)),
            doppler=rng.normal(size=n), intensity=rng.uniform(5, 30, size=n),
        ))
    imu_t = np.arange(0.0, 0.3, 0.01) + 1e-3 * rng.uniform(size=30)
    seq = datasets.RadarSequence.from_frames(
        frames, imu_t, rng.normal(size=(30, 3)), rng.normal(size=(30, 3))
    )
    assert seq.offsets[-1] % 2 == 1
    path = str(tmp_path / "odd.rivbin")
    native.write_rivbin(path, seq)
    ns = native.NativeSequence(path)
    k, stamps, acc, gyr = ns.imu_between(-1.0, 1.0, 64)
    assert k == 30
    np.testing.assert_array_equal(stamps[:k], seq.imu_stamps)
    np.testing.assert_allclose(acc[:k], seq.imu_acc, rtol=1e-6)
    np.testing.assert_allclose(gyr[:k], seq.imu_gyr, rtol=1e-6)
    ns.close()


def test_rivbin_v2_compresses_realistic_frames(tmp_path):
    """Radar-like frames (clustered geometry, quantized intensity) must
    actually shrink on disk."""
    import os

    rng = np.random.default_rng(3)
    frames = []
    base = rng.normal(size=(400, 3)) * 10
    for i in range(30):
        # slowly-varying scene: clusters persist frame to frame
        xyz = (base + rng.normal(size=base.shape) * 0.01).astype(np.float32)
        frames.append(dict(
            stamp=0.1 * i, xyz=xyz.astype(np.float64),
            doppler=np.round(rng.normal(size=len(xyz)), 1),
            intensity=np.round(rng.uniform(5, 30, size=len(xyz))),
        ))
    imu_t = np.arange(0.0, 3.0, 0.01)
    seq = datasets.RadarSequence.from_frames(
        frames, imu_t, np.zeros((len(imu_t), 3)), np.zeros((len(imu_t), 3))
    )
    p1 = str(tmp_path / "v1.rivbin")
    p2 = str(tmp_path / "v2.rivbin")
    native.write_rivbin(p1, seq)
    native.write_rivbin(p2, seq, compress=True)
    assert os.path.getsize(p2) < os.path.getsize(p1)
    # and still decodes identically
    s1, s2 = native.NativeSequence(p1), native.NativeSequence(p2)
    a = s1.read_frame(7, 512)
    b = s2.read_frame(7, 512)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    s1.close(); s2.close()


def test_native_tum_ate_matches_python():
    """The C++ evaluator (Horn alignment) must agree with eval/ate.py
    (Umeyama SVD) - same optimum, independent implementations."""
    import os
    import tempfile

    from rivslam_tpu.eval import ate as ate_py
    from rivslam_tpu.io import tum

    rng = np.random.default_rng(11)
    F = 120
    ts = np.arange(F) * 0.1
    gt = np.zeros((F, 4, 4)) + np.eye(4)
    th = np.linspace(0, 2 * np.pi, F)
    gt[:, 0, 3] = 10 * np.cos(th)
    gt[:, 1, 3] = 10 * np.sin(th)
    gt[:, 2, 3] = 0.1 * th
    # estimate = gt under a rigid offset + noise
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    est = gt.copy()
    est[:, :3, 3] = (gt[:, :3, 3] @ R.T) + [3.0, -2.0, 1.0]
    est[:, :3, 3] += rng.normal(scale=0.05, size=(F, 3))
    with tempfile.TemporaryDirectory() as d:
        pe, pg = os.path.join(d, "est.txt"), os.path.join(d, "gt.txt")
        tum.save_tum(pe, ts, est)
        tum.save_tum(pg, ts, gt)
        res = native.tum_ate(pe, pg)
    ref = ate_py.ate(est[:, :3, 3], gt[:, :3, 3])
    assert res["pairs"] == F
    for k in ("rmse", "mean", "median", "max", "std"):
        np.testing.assert_allclose(res[k], ref[k], rtol=1e-5, atol=1e-8)
    # error paths
    with pytest.raises(ValueError, match="cannot read"):
        native.tum_ate("/nonexistent_est.txt", "/nonexistent_gt.txt")
