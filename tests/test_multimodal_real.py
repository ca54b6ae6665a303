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
