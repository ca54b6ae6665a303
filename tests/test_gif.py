"""GIF codec (operators/gif.py): LZW round trips across code widths,
dictionary-full clears, interlacing, multi-frame compositing with
transparency/disposal, and the image-features dispatch."""

import numpy as np
import pytest

from montandon_etl_spark.operators import gif as G
from montandon_etl_spark.operators.gif import (GifError, decode_gif,
                                               encode_gif, lzw_decode,
                                               lzw_encode)


def _pal(n):
    k = np.arange(n, dtype=np.int64)
    return np.stack([(k * 37) % 256, (k * 59 + 11) % 256,
                     (k * 83 + 7) % 256], axis=1).astype(np.uint8)


@pytest.mark.parametrize("min_code", [2, 3, 5, 8])
def test_lzw_roundtrip_random(min_code):
    rng = np.random.default_rng(min_code)
    n = 5000
    idx = rng.integers(0, 1 << min_code, n)
    enc = lzw_encode(min_code, idx)
    dec = lzw_decode(min_code, enc, n)
    assert dec == [int(v) for v in idx]
    # structured (compressible) data too
    idx2 = (np.arange(n) // 7) % (1 << min_code)
    enc2 = lzw_encode(min_code, idx2)
    assert lzw_decode(min_code, enc2, n) == [int(v) for v in idx2]
    assert len(enc2) < len(enc)  # structure actually compresses


def test_lzw_dictionary_full_clear():
    """A stream long and diverse enough to fill the 4096-entry table
    forces the encoder's mid-stream clear; the decoder must follow."""
    rng = np.random.default_rng(99)
    n = 120_000
    idx = rng.integers(0, 4, n)  # min_code 2: table fills fast
    enc = lzw_encode(2, idx)
    assert lzw_decode(2, enc, n) == [int(v) for v in idx]


def test_lzw_kwkwk_case():
    # 'abababab...' style input drives the code==next_code branch
    idx = [0, 1] * 400 + [0]
    enc = lzw_encode(2, idx)
    assert lzw_decode(2, enc, len(idx)) == idx


def test_gif_roundtrip_single_frame():
    rng = np.random.default_rng(5)
    pal = _pal(16)
    idx = rng.integers(0, 16, (37, 61))
    data = encode_gif([idx], pal)
    frames, meta = decode_gif(data)
    assert meta["width"] == 61 and meta["height"] == 37
    assert meta["n_frames"] == 1
    assert np.array_equal(frames[0], pal[idx])


def test_gif_interlaced_roundtrip():
    rng = np.random.default_rng(6)
    pal = _pal(8)
    idx = rng.integers(0, 8, (29, 13))  # odd height crosses passes
    data = encode_gif([idx], pal, interlace=True)
    frames, _ = decode_gif(data)
    assert np.array_equal(frames[0], pal[idx])


def test_gif_multiframe_transparency_and_disposal():
    pal = _pal(8)
    base = np.full((10, 10), 2, dtype=np.int64)
    # frame 2: sub-rectangle with transparent holes, dispose=3
    patch = np.array([[5, 7], [7, 5]], dtype=np.int64)
    patch_t = np.array([[5, 7], [7, 1]], dtype=np.int64)  # 1 = trans
    data = encode_gif(
        [base, (3, 4, patch_t), (0, 0, patch)], pal,
        gce=[None, (1, 3), None])
    frames, meta = decode_gif(data)
    assert meta["n_frames"] == 3
    assert np.array_equal(frames[0], pal[base])
    # frame 1: patch drawn at (3,4) except the transparent cell
    want1 = pal[base].copy()
    want1[3, 4] = pal[5]
    want1[3, 5] = pal[7]
    want1[4, 4] = pal[7]  # [4,5] stays base (transparent index 1)
    assert np.array_equal(frames[1], want1)
    # dispose=3 restored the region before frame 2 drew at (0,0)
    want2 = pal[base].copy()
    want2[0:2, 0:2] = pal[patch]
    assert np.array_equal(frames[2], want2)


def test_gif_dispose_background():
    pal = _pal(4)
    f0 = np.full((6, 6), 3, dtype=np.int64)
    data = encode_gif([f0, (2, 2, np.full((2, 2), 1, np.int64)),
                       (0, 0, np.zeros((1, 1), np.int64))], pal,
                      gce=[None, (None, 2), None], bg_index=0)
    frames, _ = decode_gif(data)
    # after frame 1 (dispose=2) its rect is restored to background
    assert np.array_equal(frames[1][2:4, 2:4], np.broadcast_to(
        pal[1], (2, 2, 3)))
    assert np.array_equal(frames[2][2:4, 2:4], np.broadcast_to(
        pal[0], (2, 2, 3)))


def test_gif_rejects_garbage():
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF" + b"\x00" * 20)
    pal = _pal(4)
    good = bytearray(encode_gif([np.zeros((4, 4), np.int64)], pal))
    with pytest.raises(Exception):
        decode_gif(bytes(good[:-2]))  # truncated: no trailer


def test_gif_byte_pinned_determinism():
    pal = _pal(4)
    idx = (np.add.outer(np.arange(8), np.arange(8)) % 4)
    a = encode_gif([idx], pal)
    b = encode_gif([idx], pal)
    assert a == b and a[:6] == b"GIF89a"


def test_image_features_dispatch_gif(spark):
    from montandon_etl_spark.operators.multimodal import (
        _decode_any_image)
    pal = _pal(16)
    idx = (np.add.outer(np.arange(20), np.arange(30)) * 3) % 16
    data = encode_gif([idx], pal)
    w, h, mode, px = _decode_any_image(data)
    assert (w, h, mode) == (30, 20, "RGB")
    assert np.array_equal(px, pal[idx])
