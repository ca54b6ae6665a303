"""Snappy raw-format codec (sources/snappy.py) and the Avro OCF
snappy block codec (compressed body + big-endian CRC32 of the
uncompressed data)."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from montandon_etl_spark.sources.snappy import (
    snappy_compress,
    snappy_decompress,
)


def test_hand_assembled_vectors():
    """Decode spec-valid streams the encoder would not emit."""
    # literal "abcd": preamble 4, tag (4-1)<<2
    assert snappy_decompress(b"\x04" + bytes([3 << 2]) + b"abcd") == b"abcd"
    # overlapping copy: "ab" then copy(off=2, len=6) -> "abababab"
    enc = (b"\x08" + bytes([1 << 2]) + b"ab"
           + bytes([1 | ((6 - 4) << 2) | (0 << 5), 2]))
    assert snappy_decompress(enc) == b"abababab"
    # copy2: literal "xyz" + copy(off=3, len=3) via 2-byte offset
    enc = (b"\x06" + bytes([2 << 2]) + b"xyz"
           + bytes([2 | ((3 - 1) << 2)]) + struct.pack("<H", 3))
    assert snappy_decompress(enc) == b"xyzxyz"
    # copy4: same with 4-byte offset
    enc = (b"\x06" + bytes([2 << 2]) + b"xyz"
           + bytes([3 | ((3 - 1) << 2)]) + struct.pack("<I", 3))
    assert snappy_decompress(enc) == b"xyzxyz"
    # extended literals: 60-form (1 extra byte) and 61-form (2 bytes)
    body1 = bytes(range(200))
    enc = bytes([200]) + b"\x01" + bytes([60 << 2, len(body1) - 1]) + body1
    assert snappy_decompress(enc) == body1
    body2 = bytes(range(256)) * 2  # 512 bytes -> preamble 0x80 0x04
    enc = (b"\x80\x04" + bytes([61 << 2]) + struct.pack("<H", 511) + body2)
    assert snappy_decompress(enc) == body2


def test_failure_modes():
    with pytest.raises(ValueError, match="offset"):
        # copy with offset beyond produced output
        snappy_decompress(b"\x04" + bytes([1 | (0 << 2), 9]))
    with pytest.raises(ValueError, match="preamble said"):
        snappy_decompress(b"\x05" + bytes([3 << 2]) + b"abcd")
    with pytest.raises(ValueError, match="truncated"):
        snappy_decompress(b"\x04" + bytes([3 << 2]) + b"ab")


def test_roundtrip_matrix():
    rng = random.Random(7)
    cases = [
        b"", b"a", b"abc",
        b"hello hello hello hello hello hello",
        b"a" * 100000,  # long RLE -> overlapping copies
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        (b"the quick brown fox " * 400),
        bytes(range(256)) * 300,
    ]
    for data in cases:
        enc = snappy_compress(data)
        assert snappy_decompress(enc) == data
        if len(data) > 1000 and len(set(data)) < 50:
            assert len(enc) < len(data) // 2  # compression really happened


def test_compress_window_and_offsets():
    """Matches crossing 64 KiB back-references stay spec-legal."""
    rng = random.Random(11)
    chunk = bytes(rng.randrange(256) for _ in range(3000))
    data = chunk + bytes(rng.randrange(256)
                         for _ in range(70000)) + chunk
    assert snappy_decompress(snappy_compress(data)) == data


def test_avro_snappy_codec():
    import json

    from montandon_etl_spark.sources.avro import read_ocf, write_ocf
    schema = json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": "string"}]})
    recs = [{"n": i, "s": f"row {i} " * 5} for i in range(500)]
    data = write_ocf(schema, recs, codec="snappy", block_records=128)
    meta, back = read_ocf(data)
    assert back == recs and meta["avro.codec"] == b"snappy"
    # deterministic bytes
    assert write_ocf(schema, recs, codec="snappy", block_records=128) == data
    # CRC is over the UNCOMPRESSED block: flip a CRC byte -> loud failure
    idx = data.rindex(b"\x00" * 0 + data[-20:])  # anchor near the tail
    corrupted = bytearray(data)
    # find the last block's crc: 4 bytes right before the final sync
    crc_pos = len(data) - 16 - 4
    corrupted[crc_pos] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|sync|copy|truncated"):
        read_ocf(bytes(corrupted))
    assert idx >= 0


def test_avro_spark_scan_snappy(spark, tmp_path):
    import json

    from montandon_etl_spark.sources.avro import read_avro_ocf, write_ocf
    schema = json.dumps({
        "type": "record", "name": "P", "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": "string"}]})
    d = tmp_path / "sn"
    d.mkdir()
    want = [{"doc_id": i, "text": f"snappy doc {i}"} for i in range(50)]
    (d / "part-0.avro").write_bytes(write_ocf(schema, want, codec="snappy"))
    out = read_avro_ocf(spark, str(d), schema,
                        "path string, rec_idx int, doc_id long, text string")
    got = sorted((r.doc_id, r.text) for r in out.collect())
    assert got == sorted((r["doc_id"], r["text"]) for r in want)
