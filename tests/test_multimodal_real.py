"""Real multimodal decode paths (zero-dependency codecs): PPM/PGM image
parse + thumbnail, WAV audio features — payloads built independently in
the test, exact expected values asserted."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np

from montandon_etl_spark.operators.multimodal import (
    _parse_pnm,
    audio_features_wav,
    image_features_ppm,
)


def _ppm(w: int, h: int, rgb) -> bytes:
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    arr[:, :] = rgb
    return b"P6\n# a comment\n" + f"{w} {h}\n255\n".encode() + arr.tobytes()


def _wav(rate: int, samples: list[int], channels: int = 1) -> bytes:
    buf = io.BytesIO()
    wf = wave.open(buf, "wb")
    wf.setnchannels(channels)
    wf.setsampwidth(2)
    wf.setframerate(rate)
    wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    wf.close()
    return buf.getvalue()


def test_image_features_ppm(spark):
    img1 = _ppm(8, 4, (10, 20, 30))
    grad = np.arange(8 * 4 * 3, dtype=np.uint8).reshape(4, 8, 3)
    img2 = b"P6\n8 4\n255\n" + grad.tobytes()
    df = spark.createDataFrame(
        [(1, img1), (2, img2), (3, b"not an image")], "id long, payload binary"
    )
    out = {r["asset_id"]: r for r in
           image_features_ppm(df, "id", "payload", thumb_size=(2, 2)).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["mode"]) == (8, 4, "RGB")
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) == (10.0, 20.0, 30.0)
    # thumbnail is itself a valid PPM of the requested size
    tw, th_, mode, px = _parse_pnm(bytes(out[1]["thumb"]))
    assert (tw, th_, mode) == (2, 2, "RGB") and (px == [10, 20, 30]).all()
    # gradient means match numpy exactly
    want = grad.reshape(-1, 3).mean(axis=0)
    assert out[2]["mean_r"] == want[0] and out[2]["mean_b"] == want[2]
    assert out[3]["width"] is None  # undecodable → NULLs, row kept


def test_audio_features_wav(spark):
    # 1 second of a full-scale square wave at 8 kHz: rms == peak == 1000
    sq = [1000, -1000] * 4000
    silent = [0] * 100
    df = spark.createDataFrame(
        [(1, _wav(8000, sq)), (2, _wav(16000, silent)), (3, b"junk")],
        "id long, payload binary",
    )
    out = {r["asset_id"]: r for r in audio_features_wav(df, "id", "payload").collect()}
    assert (out[1]["n_channels"], out[1]["sample_rate"]) == (1, 8000)
    assert out[1]["n_frames"] == 8000 and out[1]["duration_sec"] == 1.0
    assert math.isclose(out[1]["rms"], 1000.0) and out[1]["peak"] == 1000
    assert out[2]["rms"] == 0.0 and out[2]["peak"] == 0
    assert out[2]["duration_sec"] == 100 / 16000
    assert out[3]["sample_rate"] is None  # undecodable → NULLs, row kept


# ------------------------------------------------------------------ PNG --
def test_png_roundtrip_all_filters():
    """Every PNG scanline filter type (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth) must round-trip encode->decode to the exact pixel array,
    for gray, RGB and RGBA."""
    from montandon_etl_spark.operators.multimodal import _encode_png, _parse_png

    rng = np.random.default_rng(42)
    for ch, mode in [(1, "L"), (3, "RGB"), (4, "RGBA")]:
        arr = rng.integers(0, 256, size=(6, 8, ch), dtype=np.uint8)
        for f in range(5):
            b = _encode_png(arr, filter_type=f)
            w, h, got_mode, px = _parse_png(b)
            assert (w, h, got_mode) == (8, 6, mode), (ch, f)
            assert (px == arr).all(), f"filter {f} mode {mode} mismatch"


def test_png_palette_and_rejects():
    from montandon_etl_spark.operators.multimodal import _encode_png, _parse_png
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    # hand-built palette PNG: 2x2, palette [red, green], indices [[0,1],[1,0]]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0])
    raw = bytes([0, 0, 1]) + bytes([0, 1, 0])  # filter0 + indices per row
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    w, h, mode, px = _parse_png(png)
    assert (w, h, mode) == (2, 2, "RGB")
    assert (px[0, 0] == [255, 0, 0]).all() and (px[0, 1] == [0, 255, 0]).all()
    assert (px[1, 0] == [0, 255, 0]).all() and (px[1, 1] == [255, 0, 0]).all()

    # 16-bit depth → explicit rejection (record-not-drop at the UDF layer)
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
             + chunk(b"IDAT", zlib.compress(bytes([0, 0, 0]))) + chunk(b"IEND", b""))
    try:
        _parse_png(png16)
        raise AssertionError("16-bit PNG must be rejected")
    except ValueError:
        pass


def test_image_features_mixed_codecs(spark):
    """image_features dispatches on magic bytes: PPM, PNG (with real
    unfiltering), and garbage in ONE column; exact means on both
    codecs, NULL row for the garbage."""
    from montandon_etl_spark.operators.multimodal import _encode_png, _parse_pnm, image_features

    ppm = _ppm(8, 4, (10, 20, 30))
    arr = np.zeros((4, 8, 3), dtype=np.uint8)
    arr[:, :, 0] = np.arange(8)[None, :] + 100  # row gradient in R
    arr[:, :, 1] = 7
    arr[:, :, 2] = 9
    png = _encode_png(arr, filter_type=1)  # Sub filter exercises unfiltering
    df = spark.createDataFrame(
        [(1, ppm), (2, png), (3, b"\x89PNG\r\n\x1a\njunk"), (4, b"nope")],
        "id long, payload binary",
    )
    out = {r["asset_id"]: r for r in
           image_features(df, "id", "payload", thumb_size=(2, 2)).collect()}
    assert (out[1]["width"], out[1]["mode"], out[1]["mean_r"]) == (8, "RGB", 10.0)
    assert (out[2]["width"], out[2]["height"], out[2]["mode"]) == (8, 4, "RGB")
    assert out[2]["mean_r"] == 100 + 3.5 and out[2]["mean_g"] == 7.0
    tw, th_, mode, px = _parse_pnm(bytes(out[2]["thumb"]))
    assert (tw, th_, mode) == (2, 2, "RGB")
    assert out[3]["width"] is None and out[4]["width"] is None


# ----------------------------------------------------------------- JPEG --
def test_jpeg_roundtrip_paths():
    """Baseline JPEG codec: flat images round-trip exactly; random RGB
    is within quantization error at quant=1; restart markers, 4:2:0
    subsampling, grayscale, and lossier quant all decode."""
    from montandon_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    flat = np.zeros((16, 24, 3), dtype=np.uint8)
    flat[:, :] = (200, 30, 90)
    w, h, mode, px = decode_jpeg(encode_jpeg(flat))
    assert (w, h, mode) == (24, 16, "RGB") and (px == flat).all()

    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(21, 13, 3), dtype=np.uint8)
    for kwargs, bound in [(dict(), 3), (dict(restart_interval=2), 3),
                          (dict(quant=8), 40)]:
        w, h, mode, px = decode_jpeg(encode_jpeg(a, **kwargs))
        assert (w, h, mode) == (13, 21, "RGB")
        err = np.abs(px.astype(int) - a.astype(int)).max()
        assert err <= bound, (kwargs, err)

    gray = (np.arange(32)[None, :] * 8).astype(np.uint8).repeat(16, 0)[:, :, None]
    w, h, mode, px = decode_jpeg(encode_jpeg(gray))
    assert mode == "L" and (px == gray).all()

    # 4:2:0: chroma is 2x2-mean downsampled then nearest-upsampled —
    # exact on flat color, bounded on smooth gradients
    w, h, mode, px = decode_jpeg(encode_jpeg(flat, subsample=True))
    assert np.abs(px.astype(int) - flat.astype(int)).max() <= 1
    grad = np.zeros((16, 16, 3), dtype=np.uint8)
    grad[:, :, 0] = np.arange(16)[None, :] * 4 + 50
    grad[:, :, 1] = np.arange(16)[:, None] * 4 + 50
    grad[:, :, 2] = 99
    w, h, mode, px = decode_jpeg(encode_jpeg(grad, subsample=True, restart_interval=1))
    assert np.abs(px.astype(int) - grad.astype(int)).max() <= 4

    # progressive SOF2 is honestly rejected
    prog = encode_jpeg(flat).replace(b"\xff\xc0", b"\xff\xc2", 1)
    try:
        decode_jpeg(prog)
        raise AssertionError("progressive JPEG must be rejected")
    except ValueError:
        pass


def test_image_features_jpeg_dispatch(spark):
    from montandon_etl_spark.operators.jpeg import encode_jpeg
    from montandon_etl_spark.operators.multimodal import image_features

    flat = np.zeros((8, 8, 3), dtype=np.uint8)
    flat[:, :] = (120, 64, 33)
    df = spark.createDataFrame([(1, encode_jpeg(flat))], "id long, payload binary")
    r = image_features(df, "id", "payload", thumb_size=(2, 2)).collect()[0]
    assert (r["width"], r["height"], r["mode"]) == (8, 8, "RGB")
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (120.0, 64.0, 33.0)


# ----------------------------------------------------- codec properties --
def test_png_roundtrip_property():
    """Property: ANY 8-bit image shape/content round-trips exactly
    through the PNG codec for every filter type (hypothesis-driven)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from montandon_etl_spark.operators.multimodal import _encode_png, _parse_png

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 17), h=st.integers(1, 11),
           ch=st.sampled_from([1, 3, 4]), f=st.integers(0, 4),
           seed=st.integers(0, 2**31 - 1))
    def check(w, h, ch, f, seed):
        arr = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, ch), dtype=np.uint8)
        gw, gh, _mode, px = _parse_png(_encode_png(arr, filter_type=f))
        assert (gw, gh) == (w, h) and (px == arr).all()

    check()


def test_jpeg_roundtrip_property():
    """Property: flat images round-trip exactly; arbitrary content stays
    within the quant=1 error bound, any shape, gray or RGB, with or
    without restarts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from montandon_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 20), h=st.integers(1, 18),
           ch=st.sampled_from([1, 3]), rst=st.sampled_from([0, 1, 3]),
           seed=st.integers(0, 2**31 - 1))
    def check(w, h, ch, rst, seed):
        rng = np.random.default_rng(seed)
        flat = np.zeros((h, w, ch), dtype=np.uint8)
        flat[:, :] = rng.integers(0, 256, size=ch, dtype=np.uint8)
        gw, gh, _m, px = decode_jpeg(encode_jpeg(flat, restart_interval=rst))
        assert (gw, gh) == (w, h) and (px == flat).all()
        noisy = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        _, _, _m2, px2 = decode_jpeg(encode_jpeg(noisy, restart_interval=rst))
        assert np.abs(px2.astype(int) - noisy.astype(int)).max() <= 4

    check()


def test_image_dhash_and_near_dup(spark):
    """dHash: identical pixels → identical bands (distance 0);
    brightness shift preserves the hash (gradient signs); band
    blocking is EXACT for hamming <= 3 (flipping 3 bits still leaves
    an equal band); undecodable payloads keep their row with NULLs."""
    import numpy as np

    from montandon_etl_spark.operators.multimodal import _encode_png
    from montandon_etl_spark.operators.phash import (
        dhash_bands,
        image_dhash,
        image_near_dup_pairs,
    )

    xs = np.arange(18)[None, :]
    ys = np.arange(16)[:, None]
    base = ((11 * xs + 7 * ys + (xs * ys) % 5 * 9) % 200).astype(np.uint8)

    def png(v):
        return _encode_png(np.repeat(v[:, :, None], 3, axis=2))

    rows = [
        (1, png(base)),
        (2, png(base)),                         # identical → 0
        (3, png((base + 30).astype(np.uint8))),  # brightness shift
        (4, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, png binary")
    h = image_dhash(df, "doc_id", "png")
    got = {r["doc_id"]: r for r in h.collect()}
    assert got[4]["b0"] is None  # record-not-drop
    assert [got[1][f"b{i}"] for i in range(4)] == \
           [got[2][f"b{i}"] for i in range(4)]
    # +30 with no wrap preserves every gradient sign → same hash
    assert [got[3][f"b{i}"] for i in range(4)] == \
           [got[1][f"b{i}"] for i in range(4)]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup_pairs(h, "doc_id").collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0

    # exactness at the threshold: flip exactly 3 bits spread over 3
    # bands — one band stays equal, so blocking MUST find the pair
    b = [got[1][f"b{i}"] for i in range(4)]
    flipped = [b[0] ^ 1, b[1] ^ 2, b[2] ^ 4, b[3]]
    h2 = spark.createDataFrame(
        [(1, 18, 16, *b), (9, 18, 16, *flipped)],
        "doc_id bigint, width int, height int, b0 int, b1 int,"
        " b2 int, b3 int")
    p2 = {(r["id_a"], r["id_b"]): r["hamming"]
          for r in image_near_dup_pairs(h2, "doc_id").collect()}
    assert p2 == {(1, 9): 3}
    # 4 flipped bits across all 4 bands: blocking finds nothing AND
    # the verification threshold excludes it anyway
    flipped4 = [x ^ 8 for x in b]
    h3 = spark.createDataFrame(
        [(1, 18, 16, *b), (9, 18, 16, *flipped4)],
        "doc_id bigint, width int, height int, b0 int, b1 int,"
        " b2 int, b3 int")
    assert image_near_dup_pairs(h3, "doc_id").count() == 0
