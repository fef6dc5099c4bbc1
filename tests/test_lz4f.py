"""LZ4 frame/block decoder (io/lz4f.py) — hand-built spec vectors, a greedy
reference compressor for round-trips, and the rosbag lz4-chunk path."""

import struct

import numpy as np
import pytest

from rivslam_tpu.io import lz4f


# --- a tiny spec-conformant block compressor (test-side reference) --------

def _compress_block_greedy(data: bytes) -> bytes:
    """Greedy LZ4 block compressor: 4-byte hash chains, spec framing
    (last sequence is literals-only). Slow; for tests only."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    anchor = 0  # start of pending literals
    i = 0

    def emit(lit: bytes, match_len: int | None, offset: int | None):
        lit_len = len(lit)
        tok_lit = 15 if lit_len >= 15 else lit_len
        if match_len is None:
            out.append(tok_lit << 4)
        else:
            ml = match_len - 4
            tok_m = 15 if ml >= 15 else ml
            out.append((tok_lit << 4) | tok_m)
        rem = lit_len - 15
        while rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out.extend(lit)
        if match_len is not None:
            out.extend(struct.pack("<H", offset))
            rem = match_len - 4 - 15
            while rem >= 0:
                out.append(min(rem, 255))
                if rem < 255:
                    break
                rem -= 255

    # matches may not start within the last 12 bytes (spec end conditions)
    while i + 12 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == key:
            mlen = 4
            # matches must end >= 5 bytes before block end
            limit = n - 5
            while i + mlen < limit and data[j + mlen] == data[i + mlen]:
                mlen += 1
            emit(data[anchor:i], mlen, i - j)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(data[anchor:], None, None)
    return bytes(out)


# --- block decoder: hand vectors ------------------------------------------

def test_block_all_literals():
    blk = bytes([0x60]) + b"abcdef"
    assert lz4f.decompress_block(blk, 1 << 16) == b"abcdef"


def test_block_literal_extension():
    data = bytes(range(20))
    blk = bytes([0xF0, 5]) + data  # 15 + 5 = 20 literals
    assert lz4f.decompress_block(blk, 1 << 16) == data


def test_block_simple_match():
    # 'abcd' literals then match(offset=4, len=4) -> 'abcdabcd'
    blk = bytes([0x40]) + b"abcd" + struct.pack("<H", 4)
    assert lz4f.decompress_block(blk, 1 << 16) == b"abcdabcd"


def test_block_rle_overlap():
    # 1 literal 'a', match offset=1 len=9 (token nibble 5 -> 4+5) -> 'a'*10
    blk = bytes([0x15]) + b"a" + struct.pack("<H", 1)
    assert lz4f.decompress_block(blk, 1 << 16) == b"a" * 10


def test_block_match_length_extension():
    # 1 literal, offset=1, token nibble 15 + ext 10 -> match len 4+15+10=29
    blk = bytes([0x1F]) + b"x" + struct.pack("<H", 1) + bytes([10])
    assert lz4f.decompress_block(blk, 1 << 16) == b"x" * 30


def test_block_zero_offset_rejected():
    blk = bytes([0x15]) + b"a" + struct.pack("<H", 0)
    with pytest.raises(ValueError):
        lz4f.decompress_block(blk, 1 << 16)


# --- round-trips through the greedy compressor ----------------------------

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_block_roundtrip_structured(seed):
    rng = np.random.default_rng(seed)
    # repetitive structured payload (what rosbag chunks look like)
    fields = rng.integers(0, 50, 64, dtype=np.int64).tobytes()
    data = (b"header=value\x00" + fields) * 40 + rng.bytes(100)
    comp = _compress_block_greedy(data)
    assert len(comp) < len(data)  # it actually compressed
    assert lz4f.decompress_block(comp, 1 << 22) == data


def test_block_roundtrip_incompressible():
    data = np.random.default_rng(3).bytes(4096)
    comp = _compress_block_greedy(data)
    assert lz4f.decompress_block(comp, 1 << 22) == data


# --- frame layer -----------------------------------------------------------

def test_frame_stored_roundtrip():
    data = np.random.default_rng(4).bytes(200_000)  # spans multiple blocks
    assert lz4f.decompress_frame(lz4f.compress_frame(data)) == data


def test_frame_with_compressed_block():
    data = b"radar" * 1000
    blk = _compress_block_greedy(data)
    frame = (
        struct.pack("<I", 0x184D2204)
        + bytes([0x40, 0x40, 0])  # v1, no flags; 64KB blocks; hc (unchecked)
        + struct.pack("<I", len(blk))  # high bit clear: compressed
        + blk
        + struct.pack("<I", 0)
    )
    assert lz4f.decompress_frame(frame) == data


def test_frame_skippable_prefix():
    data = b"payload bytes here"
    frame = (
        struct.pack("<II", 0x184D2A50, 6) + b"skipme"  # skippable frame
        + lz4f.compress_frame(data)
    )
    assert lz4f.decompress_frame(frame) == data


def test_frame_content_size_and_checksum_fields():
    data = b"z" * 100
    blk = _compress_block_greedy(data)
    flg = 0x40 | 0x08 | 0x04  # content size + content checksum
    frame = (
        struct.pack("<I", 0x184D2204)
        + bytes([flg, 0x40])
        + struct.pack("<Q", len(data))
        + bytes([0])  # header checksum (unchecked)
        + struct.pack("<I", len(blk))
        + blk
        + struct.pack("<I", 0)  # EndMark
        + struct.pack("<I", 0xDEADBEEF)  # content checksum (skipped)
    )
    assert lz4f.decompress_frame(frame) == data


def test_frame_bad_magic():
    with pytest.raises(ValueError):
        lz4f.decompress_frame(b"\x00\x01\x02\x03rest")


# --- rosbag integration -----------------------------------------------------

def test_rosbag_lz4_chunks(tmp_path):
    from test_rosbag1 import make_messages, write_bag
    from rivslam_tpu.io import rosbag1

    rng = np.random.default_rng(7)
    path = str(tmp_path / "test_lz4.bag")
    write_bag(path, make_messages(rng), compression="lz4")
    got = list(rosbag1.read_messages(path))
    assert len(got) == 36
