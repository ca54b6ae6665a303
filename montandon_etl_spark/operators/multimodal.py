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
  (``image_features_ppm``), PNG (``_parse_png`` — stdlib ``zlib``
  inflate + all five scanline filters, color types 0/2/3/4/6 at
  8-bit), baseline JPEG (``operators/jpeg`` — Huffman + dequant +
  IDCT + 4:2:0/4:2:2/4:4:4 chroma, restart markers; encoder included
  for round-trip tests), WAV audio (``audio_features_wav`` — stdlib
  ``wave`` + numpy RMS/peak); ``image_features`` dispatches on magic
  bytes (PNM, PNG, or JPEG);
- **MP4 video at the container level** (``operators/mp4`` — full ISO
  BMFF sample-table demux: per-frame byte ranges, pts, keyframes, plus
  a muxer for round-trips); only the H.264/H.265 PIXEL decode of a
  frame payload still needs ffmpeg, which is NOT in this container
  (``mp4.decode_frame_rgb`` is the honest gate).
  ``extract_features(decode_mode="fake")`` keeps exotic-codec plumbing
  tested with a deterministic stand-in, while ``decode_mode="real"``
  uses the real decoders above and yields NULL dims for codecs it
  can't parse (record-not-drop).
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _parse_png(b: bytes):
    """Parse an 8-bit non-interlaced PNG (color types 0 gray, 2 RGB,
    3 palette, 4 gray+alpha, 6 RGBA) with zero codec dependencies:
    stdlib ``zlib`` inflate + the five scanline filters (None/Sub/Up/
    Average/Paeth) inverted per the PNG spec. Returns
    (width, height, mode, ndarray[h,w,c]).

    Per-scanline Python loops for the serial filters (Sub/Average/
    Paeth carry an intra-row dependency) are fine for the thumbnail/
    stats sizes of a curation pipeline; Up/None rows are vectorized."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = bitd = ctype = interlace = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # 4 len + 4 type + data + 4 crc
        if typ == b"IHDR":
            w, h, bitd, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bitd != 8:
        raise ValueError(f"only 8-bit PNG supported (bit depth {bitd})")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p).astype(
            np.int32
        )
        p += stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(channels, stride):
                cur[i] = (cur[i] + cur[i - channels]) & 0xFF
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = cur[i - channels] if i >= channels else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - channels]) if i >= channels else 0
                up = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                pp = a + up - c
                pa, pb, pc = abs(pp - a), abs(pp - up), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        px = plte[px[:, :, 0]]
    mode = {0: "L", 2: "RGB", 3: "RGB", 4: "LA", 6: "RGBA"}[ctype]
    return w, h, mode, px


def _encode_png(arr, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit gray/RGB/RGBA, one filter type for
    every scanline) — the forward transform of ``_parse_png``'s
    inverse, used for round-trip tests and thumbnail output."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    stride = w * ch
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int32)
        f = filter_type
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            enc = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                up = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pp = a + up - c
                pa, pb, pc = abs(pp - a), abs(pp - up), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                enc[i] = (int(cur[i]) - pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {filter_type}")
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


IMAGE_FEATURE_SCHEMA = (
    "asset_id bigint, width int, height int, mode string,"
    " mean_r double, mean_g double, mean_b double, thumb binary"
)


def _pixel_features(aid, w, h, mode, px, tw, th):
    """(asset_id, dims, per-channel means, nearest-neighbor PPM thumb)
    from a decoded pixel array — shared by every image codec path."""
    import numpy as np

    ch = px.shape[2]
    means = px.reshape(-1, ch).mean(axis=0)
    mr = float(means[0])
    mg = float(means[1]) if ch >= 3 else None
    mb = float(means[2]) if ch >= 3 else None
    # nearest-neighbor resize: index maps, no interpolation
    yi = (np.arange(th) * h) // th
    xi = (np.arange(tw) * w) // tw
    small = np.ascontiguousarray(px[yi][:, xi])
    if ch not in (1, 3):  # LA/RGBA thumbs drop alpha (PPM has none)
        small = np.ascontiguousarray(small[:, :, : (3 if ch == 4 else 1)])
    thumb = _encode_ppm(small)
    return (aid, w, h, mode, mr, mg, mb, thumb)


def _decode_any_image(b: bytes):
    """Magic-byte dispatch: PNM (P5/P6), PNG, GIF, or baseline JPEG."""
    if b[:8] == _PNG_MAGIC:
        return _parse_png(b)
    if b[:2] == b"\xff\xd8":
        from montandon_etl_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:4] == b"GIF8":
        from montandon_etl_spark.operators.gif import (
            decode_gif_first_frame)

        return decode_gif_first_frame(b)
    return _parse_pnm(b)


def _image_features_map(df, id_col, bin_col, thumb_size, decode):
    tw, th = thumb_size

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    w, h, mode, px = decode(bytes(p))
                    rows.append(_pixel_features(aid, w, h, mode, px, tw, th))
                except Exception:
                    rows.append((aid, None, None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "width", "height", "mode",
                         "mean_r", "mean_g", "mean_b", "thumb"],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def image_features_ppm(
    df: DataFrame, id_col: str, bin_col: str, thumb_size: tuple[int, int] = (4, 4)
) -> DataFrame:
    """REAL image decode + feature extraction for PPM/PGM payloads:
    dimensions, per-channel means, and a nearest-neighbor thumbnail
    re-encoded as PPM — the resize/feature shape of an image-curation
    pipeline, with zero codec dependencies. Arrow-batched mapInPandas;
    undecodable payloads yield NULL features (record-not-drop)."""
    return _image_features_map(df, id_col, bin_col, thumb_size, _parse_pnm)


def image_features(
    df: DataFrame, id_col: str, bin_col: str, thumb_size: tuple[int, int] = (4, 4)
) -> DataFrame:
    """Image decode + features with magic-byte codec dispatch (PNM or
    PNG — both dependency-free real decoders); undecodable or
    unsupported payloads yield NULL features (record-not-drop). The
    production shape for a mixed-codec image column."""
    return _image_features_map(df, id_col, bin_col, thumb_size, _decode_any_image)


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

    ``decode_mode="real"`` decodes with the dependency-free codecs
    (PNM/PNG/baseline JPEG); payloads those can't parse (video, exotic
    codecs) keep NULL dims. ``"fake"`` is the clearly-quarantined
    deterministic stand-in for plumbing tests — its output must never
    be labeled as real features.
    """
    if decode_mode not in ("real", "fake"):
        raise ValueError(f"decode_mode must be real|fake, got {decode_mode!r}")

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
                    try:
                        w, h, mode, _px = _decode_any_image(b)
                    except Exception:
                        w = h = mode = None  # undecodable: keep the row
                else:
                    w, h, mode = _fake_decode(b)
                rows.append(
                    (aid, len(b), hashlib.sha256(b).hexdigest(), w, h, mode)
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_bytes", "content_sha", "width", "height", "mode"],
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema=FEATURE_SCHEMA)
