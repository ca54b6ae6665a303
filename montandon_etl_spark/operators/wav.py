"""Audio decode + frame features — the audio arm of the multimodal
family (image: ``multimodal``/``jpeg``/``phash``, video: ``mp4``/
``h264``), dependency-free like the other in-package codecs.

Container: RIFF/WAVE. Two codecs, both fully integer so every decoded
sample is engine-replayable:

- **PCM16** (wFormatTag=1, 16-bit LE) — lossless by definition;
- **IMA ADPCM** (wFormatTag=0x11, DVI/IMA 4-bit) — the classic
  integer predictive codec: per block, a header carries the seed
  sample + step index, then each nibble quantizes ``sample - pred``
  against an 89-entry step table and the decoder reconstructs with
  the *same* integer recursion the encoder ran. decode(encode(x)) is
  therefore a pure-integer function of x — a DuckDB recursive CTE can
  replay the reconstruction exactly (see ``adpcm_roundtrip`` in
  ``__spark_entry__``), the same oracle strategy as the H.264 I_PCM
  and sequence-pack operators.

Spark surface (all Arrow-batched ``mapInPandas``, zero shuffle in the
decode itself — features aggregate map-side inside the batch):

- ``wav_meta(df)``        — per clip: format/rate/channels + integer
  sample aggregates (count, sum, weighted sum, peak);
- ``audio_frame_features(df, frame=...)`` — 1→N fan-out to per-frame
  rows: energy (Σs²), sum, peak (max |s|), zero-crossings — the
  integer skeleton of VAD / silence trimming / clip-quality gates a
  training-data pipeline runs before transcription.

100-TB shape: clips are opaque ``binary`` columns in the lake (K1);
decode+featurize is one pass over (id, bytes) with no Python loop per
sample (numpy vectorised), no shuffle, and emits fixed-width feature
rows ~1000x smaller than the audio — the downstream joins/apps touch
features, never bytes. Frames are computed inside the batch, so a
clip never needs to fit anywhere but its own Arrow batch.

Reference lineage: the reference pipeline stores media URLs and
typed metadata per event (apps/etl/models.py); a multimodal curation
engine must decode and gate the *content*. The image/video analogues
in this repo follow the same design; this completes the triad.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- IMA ADPCM tables (public: IMA ADPCM spec / multimedia dv) ------

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]  # indexed by nibble & 7


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(v: int) -> int:
    return 0 if v < 0 else (88 if v > 88 else v)


def adpcm_quantize(diff: int, step: int) -> int:
    """4-bit IMA quantizer nibble for a prediction error."""
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    if diff >= step:
        nib |= 4
        diff -= step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nib |= 1
    return nib


def adpcm_dequantize(nib: int, step: int) -> int:
    d = step >> 3
    if nib & 4:
        d += step
    if nib & 2:
        d += step >> 1
    if nib & 1:
        d += step >> 2
    return -d if nib & 8 else d


def adpcm_encode(samples, block_samples: int = 505):
    """Encode int16 mono samples → (blocks bytes, block_align).

    Standard IMA-in-WAV block layout: 4-byte header (int16 seed
    sample, uint8 step index, uint8 reserved=0) then 4-bit nibbles,
    low nibble first. ``block_samples`` must be odd >= 1 (header
    sample + pairs of nibbles); the canonical 256-byte mono block is
    505. The step index persists across blocks (encoder state), the
    seed sample re-anchors prediction losslessly at each block start.
    """
    if block_samples < 1 or block_samples % 2 == 0:
        raise ValueError("block_samples must be odd >= 1")
    s = np.asarray(samples, dtype=np.int64)
    out = bytearray()
    idx = 0
    block_align = 4 + (block_samples - 1) // 2
    for b0 in range(0, len(s), block_samples):
        blk = s[b0:b0 + block_samples]
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for v in blk[1:]:
            step = STEP_TABLE[idx]
            nib = adpcm_quantize(int(v) - pred, step)
            pred = _clamp16(pred + adpcm_dequantize(nib, step))
            idx = _clamp_idx(idx + INDEX_TABLE[nib & 7])
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for lo, hi in zip(nibs[::2], nibs[1::2]):
            out.append(lo | (hi << 4))
        out += b"\x00" * (block_align - 4 - len(nibs) // 2)
    return bytes(out), block_align


def adpcm_decode(data: bytes, block_align: int, n_samples: int):
    """Decode IMA ADPCM blocks → np.int32[n_samples] (mono)."""
    block_samples = (block_align - 4) * 2 + 1
    out = np.empty(n_samples, dtype=np.int32)
    pos = 0
    for b0 in range(0, len(data), block_align):
        if pos >= n_samples:
            break
        hdr = data[b0:b0 + 4]
        pred = struct.unpack("<h", hdr[:2])[0]
        idx = hdr[2]
        if idx > 88:
            raise ValueError(f"corrupt ADPCM step index {idx}")
        out[pos] = pred
        pos += 1
        want = min(block_samples - 1, n_samples - pos)
        body = data[b0 + 4:b0 + block_align]
        k = 0
        for byte in body:
            for nib in (byte & 0xF, byte >> 4):
                if k >= want:
                    break
                step = STEP_TABLE[idx]
                pred = _clamp16(pred + adpcm_dequantize(nib, step))
                idx = _clamp_idx(idx + INDEX_TABLE[nib & 7])
                out[pos] = pred
                pos += 1
                k += 1
        if k < want:
            raise ValueError("ADPCM block truncated")
    if pos < n_samples:
        raise ValueError(f"WAV data short: {pos} < {n_samples} samples")
    return out


# --- RIFF/WAVE container -------------------------------------------

WAVE_PCM = 1
WAVE_IMA_ADPCM = 0x11


def make_wav_pcm16(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """int16 samples (interleaved if stereo) → WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", WAVE_PCM, n_channels, sample_rate,
                      sample_rate * n_channels * 2, n_channels * 2, 16)
    return _riff(fmt, data)


def make_wav_adpcm(samples, sample_rate: int,
                   block_samples: int = 505) -> bytes:
    """int16 MONO samples → IMA-ADPCM WAV bytes (lossy)."""
    s = np.asarray(samples, dtype=np.int64)
    data, block_align = adpcm_encode(s, block_samples)
    byte_rate = (sample_rate * block_align + block_samples - 1) // block_samples
    fmt = struct.pack("<HHIIHHHH", WAVE_IMA_ADPCM, 1, sample_rate,
                      byte_rate, block_align, 4, 2, block_samples)
    fact = struct.pack("<I", len(s))
    return _riff(fmt, data, fact=fact)


def _riff(fmt_body: bytes, data: bytes, fact: bytes | None = None) -> bytes:
    chunks = [b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body]
    if fact is not None:
        chunks.append(b"fact" + struct.pack("<I", len(fact)) + fact)
    chunks.append(b"data" + struct.pack("<I", len(data)) + data
                  + (b"\x00" if len(data) % 2 else b""))
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(b: bytes):
    """WAV bytes → dict(format, sample_rate, n_channels, n_samples,
    samples: np.int32 interleaved). Unknown chunks are skipped (LIST,
    cue, bext ... appear in the wild); fmt must precede data."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, 8 + struct.unpack("<I", b[4:8])[0]
    fmt = None
    fact_samples = None
    out = None
    while pos + 8 <= min(end, len(b)):
        cid = b[pos:pos + 4]
        size = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        body = b[pos + 8:pos + 8 + size]
        pos += 8 + size + (size % 2)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, nch, sr, _br, balign, bits = struct.unpack(
                "<HHIIHH", body[:16])
            fmt = (tag, nch, sr, balign, bits)
        elif cid == b"fact":
            fact_samples = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            tag, nch, sr, balign, bits = fmt
            if tag == WAVE_PCM:
                if bits != 16:
                    raise ValueError(f"PCM bits={bits} unsupported (16 only)")
                n = size // 2
                samples = np.frombuffer(body[:n * 2], dtype="<i2"
                                        ).astype(np.int32)
                n_samples = n // nch
            elif tag == WAVE_IMA_ADPCM:
                if nch != 1:
                    raise ValueError("IMA ADPCM: mono only")
                block_samples = (balign - 4) * 2 + 1
                n_blocks = size // balign
                cap = n_blocks * block_samples
                n_samples = fact_samples if fact_samples is not None else cap
                samples = adpcm_decode(body[:n_blocks * balign], balign,
                                       n_samples)
            else:
                raise ValueError(f"wFormatTag={tag:#x} unsupported")
            out = {"format": tag, "sample_rate": sr, "n_channels": nch,
                   "n_samples": int(n_samples), "samples": samples}
    if out is None:
        raise ValueError("no data chunk")
    return out


# --- Spark operators -----------------------------------------------

_META_SCHEMA = ("id bigint, format int, sample_rate int, n_channels int,"
                " n_samples bigint, s_sum bigint, s_wsum bigint,"
                " peak bigint")


def wav_meta(df: DataFrame, id_col: str = "id",
             bytes_col: str = "wav") -> DataFrame:
    """Per clip: container metadata + integer sample aggregates.

    ``s_wsum`` = Σ s[i]·(i+1) is order-sensitive, so a decoder that
    permutes or drops samples cannot pass by luck.
    """
    def run(it):
        for pdf in it:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[bytes_col]):
                w = parse_wav(bytes(raw))
                s = w["samples"].astype(np.int64)
                rows.append((int(i), w["format"], w["sample_rate"],
                             w["n_channels"], w["n_samples"],
                             int(s.sum()),
                             int((s * np.arange(1, len(s) + 1)).sum()),
                             int(np.abs(s).max()) if len(s) else 0))
            yield pd.DataFrame(rows, columns=[
                "id", "format", "sample_rate", "n_channels",
                "n_samples", "s_sum", "s_wsum", "peak"])
    return df.mapInPandas(run, _META_SCHEMA)


FP_CELLS = 65  # 64 energy-gradient bits, like dHash's 9x8 cell grid
FP_BANDS = 4


def fingerprint_bands(samples: np.ndarray, n_channels: int = 1) -> list[int]:
    """64-bit energy-gradient audio fingerprint as four 16-bit bands.

    The clip (mono view) is cut into 65 equal time cells
    ``[floor(c*n/65), floor((c+1)*n/65))``; cell energy = Σs²;
    bit c = energy[c+1] > energy[c]. Gradient signs are invariant to
    uniform gain and robust to small additive noise — the audio
    analogue of the image dHash, and the bands are the same exact
    blocking keys (Hamming <= 3 ⇒ some band equal, by pigeonhole)."""
    s = np.asarray(samples, dtype=np.int64)
    if n_channels > 1:
        s = s.reshape(-1, n_channels).sum(axis=1) // n_channels
    n = len(s)
    if n < FP_CELLS:
        raise ValueError(f"clip too short for fingerprint: {n} samples")
    e = np.empty(FP_CELLS, dtype=np.int64)
    for c in range(FP_CELLS):
        seg = s[c * n // FP_CELLS:(c + 1) * n // FP_CELLS]
        e[c] = int((seg * seg).sum())
    bands = [0] * FP_BANDS
    for c in range(FP_CELLS - 1):
        if e[c + 1] > e[c]:
            bands[c // 16] |= 1 << (c % 16)
    return bands


_FP_SCHEMA = "id bigint, n_samples bigint, b0 int, b1 int, b2 int, b3 int"


def audio_fingerprint(df: DataFrame, id_col: str = "id",
                      bytes_col: str = "wav") -> DataFrame:
    """(id, n_samples, b0..b3) per decodable clip; undecodable or
    too-short payloads yield NULL bands (record-not-drop). One Arrow
    pass, no shuffle — fingerprints are ~10^6x smaller than audio."""
    def run(it):
        for pdf in it:
            rows = []
            for i, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    w = parse_wav(bytes(raw))
                    b = fingerprint_bands(w["samples"], w["n_channels"])
                    rows.append((int(i), w["n_samples"], *b))
                except Exception:
                    rows.append((int(i), None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[
                "id", "n_samples", "b0", "b1", "b2", "b3"])
    return df.select(id_col, bytes_col).mapInPandas(run, _FP_SCHEMA)


def audio_near_dup_pairs(fps: DataFrame, id_col: str = "id",
                         max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) over fingerprints — delegates to the
    shared banded-Hamming join (operators/phash.py): band-equality
    blocking shuffles 4 tiny keys per clip, exact recall for
    max_hamming <= 3 by pigeonhole, bit_count verify JVM-side."""
    from montandon_etl_spark.operators.phash import image_near_dup_pairs
    return image_near_dup_pairs(fps, id_col, max_hamming=max_hamming)


_FRAME_SCHEMA = ("id bigint, frame bigint, n int, s_sum bigint,"
                 " energy bigint, peak bigint, zero_cross bigint")


def audio_frame_features(df: DataFrame, id_col: str = "id",
                         bytes_col: str = "wav",
                         frame: int = 256) -> DataFrame:
    """1→N fan-out: per non-overlapping frame of ``frame`` samples
    (mono view: stereo is averaged ``(l + r) div 2`` first), emit
    integer features — energy Σs², Σs, max |s|, and zero-crossings
    (strict sign products s[i-1]·s[i] < 0 *within* the frame). All
    BIGINT-exact, so the oracle replays them from the fixture's
    closed form. Energy stays < 2^63 for any frame < 2^32 samples."""
    def run(it):
        for pdf in it:
            out_id, out_f, out_n = [], [], []
            out_sum, out_en, out_pk, out_zc = [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[bytes_col]):
                w = parse_wav(bytes(raw))
                s = w["samples"].astype(np.int64)
                if w["n_channels"] > 1:
                    s = s.reshape(-1, w["n_channels"])
                    # floor-div of the sum matches the SQL `//` replay
                    s = s.sum(axis=1) // w["n_channels"]
                nf = (len(s) + frame - 1) // frame
                for f in range(nf):
                    seg = s[f * frame:(f + 1) * frame]
                    out_id.append(int(i))
                    out_f.append(f)
                    out_n.append(len(seg))
                    out_sum.append(int(seg.sum()))
                    out_en.append(int((seg * seg).sum()))
                    out_pk.append(int(np.abs(seg).max()))
                    out_zc.append(int(((seg[:-1] * seg[1:]) < 0).sum()))
            yield pd.DataFrame({
                "id": out_id, "frame": out_f, "n": out_n,
                "s_sum": out_sum, "energy": out_en, "peak": out_pk,
                "zero_cross": out_zc})
    return df.mapInPandas(run, _FRAME_SCHEMA)


def audio_segments(frames: DataFrame, id_col: str = "id",
                   energy_thr: int = 0,
                   min_frames: int = 1) -> DataFrame:
    """VAD-style segmentation over ``audio_frame_features`` output:
    contiguous runs of frames with ``energy >= energy_thr`` become
    segments (gaps-and-islands: run id = frame - dense rank among
    voiced frames — two window functions, no UDF, no extra scan).
    Emits (id, seg, start_frame, end_frame, n_frames, energy_sum);
    runs shorter than ``min_frames`` are dropped. Integer-exact, so
    the oracle replays it from the fixture's closed form.

    100-TB shape: windows partition by clip id — the shuffle key is
    the natural data layout, segments are tiny, and the heavy decode
    stays in the one Arrow pass that produced the frames."""
    from pyspark.sql.window import Window

    voiced = frames.filter(F.col("energy") >= F.lit(energy_thr))
    w = Window.partitionBy(id_col).orderBy("frame")
    runs = voiced.withColumn(
        "_grp", F.col("frame") - F.row_number().over(w))
    return (runs.groupBy(id_col, "_grp")
            .agg(F.min("frame").alias("start_frame"),
                 F.max("frame").alias("end_frame"),
                 F.count(F.lit(1)).alias("n_frames"),
                 F.sum("energy").alias("energy_sum"))
            .filter(F.col("n_frames") >= min_frames)
            .withColumn(
                "seg",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy("start_frame"))
                - 1)
            .select(id_col, "seg", "start_frame", "end_frame",
                    "n_frames", "energy_sum"))
