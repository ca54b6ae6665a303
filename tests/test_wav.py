"""WAV/PCM + IMA-ADPCM codec tests (operators/wav.py).

Known-vector tests are hand-computed from the IMA tables so encoder
and decoder cannot co-sign a shared bug; round trips are bit-exact
for PCM and recursion-exact for ADPCM (decode == the reconstruction
the encoder tracked)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from montandon_etl_spark.operators import wav as W


def _rng_samples(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-32768, 32768, size=n).astype(np.int64)


# --- pure-Python container + codec ---------------------------------

def test_pcm16_roundtrip_mono():
    s = _rng_samples(1, 1234)
    w = W.parse_wav(W.make_wav_pcm16(s, 16000))
    assert w["format"] == W.WAVE_PCM
    assert w["sample_rate"] == 16000
    assert w["n_channels"] == 1
    assert w["n_samples"] == 1234
    assert np.array_equal(w["samples"], s.astype(np.int32))


def test_pcm16_roundtrip_stereo_and_odd_data():
    # interleaved stereo; odd byte-length data pad must not corrupt
    s = _rng_samples(2, 2 * 333)
    w = W.parse_wav(W.make_wav_pcm16(s, 44100, n_channels=2))
    assert w["n_channels"] == 2
    assert w["n_samples"] == 333
    assert np.array_equal(w["samples"], s.astype(np.int32))


def test_unknown_chunks_skipped():
    s = _rng_samples(3, 64)
    raw = W.make_wav_pcm16(s, 8000)
    # splice a LIST chunk (odd size → word-align pad) between
    # "WAVE" and "fmt "
    inject = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = raw[:12] + inject + raw[12:]
    patched = patched[:4] + struct.pack(
        "<I", struct.unpack("<I", raw[4:8])[0] + len(inject)) + patched[8:]
    w = W.parse_wav(patched)
    assert np.array_equal(w["samples"], s.astype(np.int32))


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        W.parse_wav(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        W.parse_wav(b"RIFF\x10\x00\x00\x00WAVEjunk\x04\x00\x00\x00abcd")


def test_adpcm_known_vector():
    # hand-computed from the IMA tables: seed 0 idx 0;
    # s=100: step=7, nib=0b0111, dq=0+7+3+1=11, pred=11, idx=8
    # s=-50: step=16, diff=-61, nib=0b1111, dq=2+16+8+4=30, pred=-19
    data, balign = W.adpcm_encode([0, 100, -50], block_samples=3)
    assert balign == 4 + 1
    pred, idx, _ = struct.unpack("<hBB", data[:4])
    assert (pred, idx) == (0, 0)
    assert data[4] == 0x7 | (0xF << 4)  # low nibble first
    dec = W.adpcm_decode(data, balign, 3)
    assert list(dec) == [0, 11, -19]


def test_adpcm_roundtrip_matches_encoder_reconstruction():
    """decode(encode(x)) must equal the integer recursion the encoder
    tracked — i.e. re-running quantize→dequantize→clamp over x."""
    s = _rng_samples(7, 2000)
    data, balign = W.adpcm_encode(s, block_samples=129)
    dec = W.adpcm_decode(data, balign, len(s))
    # independent reconstruction replay
    exp, idx = [], 0
    for b0 in range(0, len(s), 129):
        blk = s[b0:b0 + 129]
        pred = int(blk[0])
        exp.append(pred)
        for v in blk[1:]:
            step = W.STEP_TABLE[idx]
            nib = W.adpcm_quantize(int(v) - pred, step)
            pred = W._clamp16(pred + W.adpcm_dequantize(nib, step))
            idx = W._clamp_idx(idx + W.INDEX_TABLE[nib & 7])
            exp.append(pred)
    assert list(dec) == exp


def test_adpcm_wav_container_roundtrip():
    s = _rng_samples(11, 777)  # not a multiple of the block size
    raw = W.make_wav_adpcm(s, 16000, block_samples=129)
    w = W.parse_wav(raw)
    assert w["format"] == W.WAVE_IMA_ADPCM
    assert w["n_samples"] == 777  # fact chunk wins over block capacity
    assert len(w["samples"]) == 777
    # block seeds are lossless (full-range noise drifts BETWEEN
    # seeds, so no useful global error bound exists for this input)
    assert all(int(w["samples"][i]) == int(s[i])
               for i in range(0, 777, 129))


def test_adpcm_distortion_reasonable_on_smooth_signal():
    # a slowly-varying ramp should track closely (step table adapts)
    t = np.arange(4000)
    s = (1000 * np.sin(t / 50.0)).astype(np.int64)
    w = W.parse_wav(W.make_wav_adpcm(s, 8000))
    err = np.abs(w["samples"] - s.astype(np.int32))
    assert int(err.max()) < 256


def test_adpcm_corrupt_index_rejected():
    data, balign = W.adpcm_encode([0] * 9, block_samples=9)
    bad = bytearray(data)
    bad[2] = 90  # step index out of range
    with pytest.raises(ValueError):
        W.adpcm_decode(bytes(bad), balign, 9)


def test_fingerprint_gain_invariance():
    s = _rng_samples(21, 2080)
    half = s // 2  # uniform gain change scales every cell energy
    assert W.fingerprint_bands(s) == W.fingerprint_bands(half * 2)
    assert W.fingerprint_bands(s * 0 + s) == W.fingerprint_bands(s)


def test_fingerprint_noise_robust_and_discriminating():
    s = _rng_samples(22, 2080)
    twin = s + (np.arange(2080) % 5) - 2
    other = _rng_samples(23, 2080)
    fb = W.fingerprint_bands
    ham = lambda a, b: sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert ham(fb(s), fb(twin)) <= 3
    assert ham(fb(s), fb(other)) > 10


def test_fingerprint_too_short_raises():
    with pytest.raises(ValueError):
        W.fingerprint_bands(np.zeros(64, dtype=np.int64))


def test_audio_near_dup_spark(spark):
    rows = []
    for d in range(6):
        s = _rng_samples(400 + d % 3, 2080)  # 3 content families x 2
        if d >= 3:
            s = s + (np.arange(2080) % 5) - 2
        rows.append((d, bytearray(W.make_wav_pcm16(s, 16000))))
    rows.append((9, bytearray(b"not a wav")))  # record-not-drop
    df = spark.createDataFrame(rows, "id bigint, wav binary")
    fp = W.audio_fingerprint(df)
    got = {r["id"]: r for r in fp.collect()}
    assert got[9]["b0"] is None
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in W.audio_near_dup_pairs(fp, "id").collect()}
    assert set(pairs) == {(0, 3), (1, 4), (2, 5)}
    assert all(h <= 3 for h in pairs.values())


# --- Spark operators ------------------------------------------------

def _clips_df(spark):
    rows = []
    for i in range(6):
        n = 700 + i * 37
        s = _rng_samples(100 + i, n)
        if i % 3 == 2:
            raw = W.make_wav_adpcm(s, 16000, block_samples=129)
        elif i % 3 == 1:
            st = _rng_samples(200 + i, 2 * n)
            raw = W.make_wav_pcm16(st, 22050, n_channels=2)
        else:
            raw = W.make_wav_pcm16(s, 8000)
        rows.append((i, bytearray(raw)))
    return spark.createDataFrame(rows, "id bigint, wav binary")


def test_wav_meta_spark(spark):
    out = {r["id"]: r for r in W.wav_meta(_clips_df(spark)).collect()}
    assert len(out) == 6
    for i in range(6):
        r = out[i]
        n = 700 + i * 37
        assert r["n_samples"] == n
        raw = bytes(_clips_df(spark).where(f"id={i}")
                    .collect()[0]["wav"])
        w = W.parse_wav(raw)
        s = w["samples"].astype(np.int64)
        assert r["s_sum"] == int(s.sum())
        assert r["s_wsum"] == int((s * np.arange(1, len(s) + 1)).sum())
        assert r["peak"] == int(np.abs(s).max())


def test_audio_frame_features_spark(spark):
    df = _clips_df(spark)
    out = W.audio_frame_features(df, frame=256).toPandas()
    # doc 1 is stereo: mono view is (l+r) // 2 per frame
    raw = bytes(df.where("id=1").collect()[0]["wav"])
    w = W.parse_wav(raw)
    s = w["samples"].astype(np.int64).reshape(-1, 2)
    mono = s.sum(axis=1) // 2
    mine = out[out["id"] == 1].sort_values("frame")
    assert list(mine["n"])[:-1] == [256] * (len(mine) - 1)
    seg0 = mono[:256]
    assert int(mine.iloc[0]["energy"]) == int((seg0 * seg0).sum())
    assert int(mine.iloc[0]["zero_cross"]) == int(
        ((seg0[:-1] * seg0[1:]) < 0).sum())
    assert int(mine.iloc[0]["peak"]) == int(np.abs(seg0).max())
    # frame partition covers every sample exactly once
    n = w["n_samples"]
    assert int(mine["n"].sum()) == n


def test_audio_segments_islands(spark):
    rows = []
    # doc 1: frames energies 5,100,120,3,90,95,96,2 with thr 50 ->
    # islands [1,2], [4,6]
    for f, e in enumerate([5, 100, 120, 3, 90, 95, 96, 2]):
        rows.append((1, f, 10, 0, e, 1, 0))
    # doc 2: all quiet -> no segments
    for f in range(4):
        rows.append((2, f, 10, 0, 7, 1, 0))
    fr = spark.createDataFrame(
        rows, "id bigint, frame bigint, n int, s_sum bigint,"
        " energy bigint, peak bigint, zero_cross bigint")
    segs = {(r["id"], r["seg"]): r for r in
            W.audio_segments(fr, energy_thr=50).collect()}
    assert set(segs) == {(1, 0), (1, 1)}
    s0, s1 = segs[(1, 0)], segs[(1, 1)]
    assert (s0["start_frame"], s0["end_frame"], s0["n_frames"],
            s0["energy_sum"]) == (1, 2, 2, 220)
    assert (s1["start_frame"], s1["end_frame"], s1["n_frames"],
            s1["energy_sum"]) == (4, 6, 3, 281)
    # min_frames filter keeps numbering dense
    segs3 = {r["seg"]: r for r in
             W.audio_segments(fr, energy_thr=50,
                              min_frames=3).collect()}
    assert list(segs3) == [0]
    assert segs3[0]["start_frame"] == 4
