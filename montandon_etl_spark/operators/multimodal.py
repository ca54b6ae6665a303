"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns beside typed
metadata — exactly the reference's row-metadata/blob-payload split
(apps/etl/models.py:72 stores the blob by path; at 10^10 scale the
payload lives *in* the columnar files, per SURVEY.md §1.1).

The decode/feature-extract step runs through ``mapInPandas`` (Arrow
batch iterator — the right shape for big binary payloads because one
batch amortizes serde over many rows and never materializes the whole
partition). Codec status:

- **real decoders, zero dependencies**: PPM/PGM images
  (``image_features_ppm`` — parse, per-channel stats,
  nearest-neighbor thumbnail re-encoded as PPM) and WAV audio
  (``audio_features_wav`` — stdlib ``wave`` + numpy RMS/peak);
- compressed codecs (JPEG/PNG/MP4) need PIL/ffmpeg, which are NOT in
  this container: ``extract_features(decode_mode="fake")`` keeps that
  plumbing tested with a deterministic stand-in, and
  ``decode_mode="real"`` raises ``NotImplementedError`` behind an
  import-try.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id bigint, n_bytes int, content_sha string, width int, height int, "
    "mode string"
)


def binary_metadata(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Scan-speed metadata over a binary column: size + content hash.
    Pure built-ins — this is the dedup/integrity pass that should NOT
    need Python even for multimodal data."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.octet_length(F.col(bin_col)).alias("n_bytes"),
        F.sha2(F.col(bin_col), 256).alias("content_sha"),
    )


def _parse_pnm(b: bytes):
    """Parse a binary PPM (P6, RGB) or PGM (P5, gray) image — header is
    ASCII tokens (magic, width, height, maxval; '#' comments allowed),
    then raw samples. Returns (width, height, mode, ndarray[h,w,c])."""
    import numpy as np

    magic = b[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic {magic!r}")
    # tokenize header: skip whitespace and comments
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        tokens.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 3 if magic == b"P6" else 1
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=i)
    return w, h, ("RGB" if ch == 3 else "L"), px.reshape(h, w, ch)


def _encode_ppm(arr) -> bytes:
    h, w, ch = arr.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


IMAGE_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, mode string,"
    " mean_r double, mean_g double, mean_b double, thumb binary"
)


def image_features_ppm(
    df: DataFrame, id_col: str, bin_col: str, thumb_size: tuple[int, int] = (4, 4)
) -> DataFrame:
    """REAL image decode + feature extraction for PPM/PGM payloads:
    dimensions, per-channel means, and a nearest-neighbor thumbnail
    re-encoded as PPM — the resize/feature shape of an image-curation
    pipeline, with zero codec dependencies. Arrow-batched mapInPandas;
    undecodable payloads yield NULL features (record-not-drop)."""
    import numpy as np

    tw, th = thumb_size

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    w, h, mode, px = _parse_pnm(bytes(p))
                except Exception:
                    rows.append((aid, None, None, None, None, None, None, None))
                    continue
                means = px.reshape(-1, px.shape[2]).mean(axis=0)
                mr = float(means[0])
                mg = float(means[1]) if px.shape[2] == 3 else None
                mb = float(means[2]) if px.shape[2] == 3 else None
                # nearest-neighbor resize: index maps, no interpolation
                yi = (np.arange(th) * h) // th
                xi = (np.arange(tw) * w) // tw
                thumb = _encode_ppm(np.ascontiguousarray(px[yi][:, xi]))
                rows.append((aid, w, h, mode, mr, mg, mb, thumb))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "mode",
                         "mean_r", "mean_g", "mean_b", "thumb"],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "asset_id bigint, n_channels int, sample_rate int, n_frames int,"
    " duration_sec double, rms double, peak int"
)


def audio_features_wav(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """REAL audio decode for WAV payloads via the stdlib ``wave``
    module: channel/rate/duration metadata plus RMS and peak amplitude
    over 16-bit samples — the loudness/quality gate of an audio-curation
    pipeline. Undecodable payloads yield NULLs (record-not-drop)."""
    import io
    import wave

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    wf = wave.open(io.BytesIO(bytes(p)))
                    nch, sw, rate, nframes = (
                        wf.getnchannels(), wf.getsampwidth(),
                        wf.getframerate(), wf.getnframes(),
                    )
                    raw = wf.readframes(nframes)
                    if sw != 2:
                        raise ValueError("only 16-bit PCM supported")
                    samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
                    rms = float(np.sqrt(np.mean(samples * samples))) if len(samples) else 0.0
                    peak = int(np.max(np.abs(samples))) if len(samples) else 0
                    rows.append((aid, nch, rate, nframes, nframes / rate, rms, peak))
                except Exception:
                    rows.append((aid, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_channels", "sample_rate", "n_frames",
                         "duration_sec", "rms", "peak"],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decode: pseudo-dimensions
    from the content digest. CLEARLY FAKE — replace with PIL decode
    where the codec exists."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, "RGB" if d[2] % 2 else "L"


def extract_features(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    decode_mode: str = "fake",
) -> DataFrame:
    """Decode + feature-extract binary assets via mapInPandas.

    Arrow-batched: each pandas chunk holds many payloads; per-batch
    overhead is constant. Partitioning is preserved (narrow op), so
    this pipelines with the scan — no shuffle.
    """
    if decode_mode == "real":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real decode requires an image codec (PIL) not present in "
                "this container; use decode_mode='fake' for plumbing tests"
            ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            rows = []
            for aid, p in zip(pdf[id_col], payloads):
                if p is None:
                    rows.append((aid, 0, "", None, None, None))
                    continue
                b = bytes(p)
                if decode_mode == "real":
                    raise NotImplementedError("real image decode not available here")
                w, h, mode = _fake_decode(b)
                rows.append(
                    (aid, len(b), hashlib.sha256(b).hexdigest(), w, h, mode)
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_bytes", "content_sha", "width", "height", "mode"],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema=FEATURE_SCHEMA)
