"""LZ4 block/frame codec + xxHash32 (sources/lz4.py)."""

from __future__ import annotations

import random
import struct

import pytest

from montandon_etl_spark.sources.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


def test_xxh32_known_answer_and_properties():
    # the reference implementation's canonical empty-input value
    assert xxh32(b"") == 0x02CC5D05
    # seed sensitivity, length sensitivity, determinism
    assert xxh32(b"abc") != xxh32(b"abc", seed=1)
    assert xxh32(b"abc") != xxh32(b"abcd")
    assert xxh32(b"x" * 1000) == xxh32(b"x" * 1000)
    # all four code paths (>=16 stripes, 4-byte tail, byte tail)
    for n in (0, 3, 4, 15, 16, 17, 31, 64, 100):
        v = xxh32(bytes(range(n % 256))[:n] or b"")
        assert 0 <= v <= 0xFFFFFFFF


def test_block_hand_assembled_vectors():
    """Decode spec-valid streams our encoder would not emit."""
    # literals-only: token lit=5, ml ignored
    assert lz4_block_decompress(bytes([5 << 4]) + b"hello") == b"hello"
    # "abcd" + match(off=4, len=4) -> "abcdabcd"; tail literals "XY"
    enc = (bytes([(4 << 4) | 0]) + b"abcd" + struct.pack("<H", 4)
           + bytes([2 << 4]) + b"XY")
    assert lz4_block_decompress(enc) == b"abcdabcdXY"
    # overlapping RLE: "a" + match(off=1, len=19=15+4 w/ ext 0)
    enc = (bytes([(1 << 4) | 15]) + b"a" + struct.pack("<H", 1)
           + bytes([0]) + bytes([0 << 4]))
    assert lz4_block_decompress(enc) == b"a" * 20
    # 255-continuation literal length: 15+255+2 = 272 literals
    body = bytes(272)
    enc = bytes([15 << 4, 255, 2]) + body
    assert lz4_block_decompress(enc) == body


def test_block_failure_modes():
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bytes([(1 << 4)]) + b"a"
                             + struct.pack("<H", 9) + bytes([0 << 4]))
    with pytest.raises(ValueError, match="truncated"):
        lz4_block_decompress(bytes([5 << 4]) + b"hi")
    with pytest.raises(ValueError, match="offset"):
        # zero offset is illegal
        lz4_block_decompress(bytes([(1 << 4)]) + b"a"
                             + struct.pack("<H", 0) + bytes([0 << 4]))


def test_block_roundtrip_matrix():
    rng = random.Random(5)
    cases = [
        b"", b"a", b"short",
        b"a" * 100000,
        (b"the quick brown fox " * 500),
        bytes(rng.randrange(256) for _ in range(4000)),
        bytes(range(256)) * 100,
        b"ab" * 6 + b"tail!",  # matches near the 12-byte end guard
    ]
    for data in cases:
        enc = lz4_block_compress(data)
        assert lz4_block_decompress(enc) == data
        if len(data) > 1000 and len(set(data)) < 60:
            assert len(enc) < len(data) // 2


def test_frame_roundtrip_and_flags():
    data = (b"kafka record batch payload " * 2000)
    for csum in (True, False):
        for size in (True, False):
            f = lz4_frame_compress(data, block_size=64 << 10,
                                   content_checksum=csum,
                                   content_size=size)
            assert lz4_frame_decompress(f) == data
    # multi-block incompressible input -> stored-uncompressed blocks
    rng = random.Random(9)
    big = bytes(rng.randrange(256) for _ in range(100000))
    f = lz4_frame_compress(big, block_size=64 << 10)
    assert lz4_frame_decompress(f) == big
    assert len(f) >= len(big)  # stored uncompressed + framing overhead


def test_frame_failure_modes():
    data = b"payload " * 100
    f = lz4_frame_compress(data)
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00" + f[1:])
    # flip one content byte -> content checksum mismatch
    broken = bytearray(f)
    broken[20] ^= 0xFF
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(broken))
    # flip the header-checksum byte
    hdr = bytearray(f)
    hdr[4 + 2 + 8] ^= 0xFF  # after magic+FLG+BD+contentsize
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(hdr))
    with pytest.raises(ValueError, match="block_size"):
        lz4_frame_compress(data, block_size=123)


def test_frame_deterministic():
    data = b"deterministic " * 1000
    assert lz4_frame_compress(data) == lz4_frame_compress(data)
