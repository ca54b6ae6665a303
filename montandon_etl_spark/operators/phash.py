"""Perceptual image hashing + image near-dup — the multimodal arm of
the dedup family, built on the REAL in-package decoders (PNG/JPEG/PNM
from ``operators/multimodal``; no image library).

dHash (difference hash), fully integer so the whole pipeline is
engine-replayable on a deterministic fixture:

1. grayscale: ``(r + g + b) div 3`` per pixel (identity for mode L);
2. box-resize to 9x8: column ranges ``[floor(c*W/9), floor((c+1)*W/9))``
   and row ranges over H/8, each cell = ``floor(sum / area)``;
3. bit(r, c) = cell[r][c] < cell[r][c+1] — 8x8 = 64 gradient-sign
   bits, robust to brightness/scale shifts;
4. the 64 bits ship as FOUR 16-bit band ints (rows 2b, 2b+1 → band b,
   bit index ``(r % 2) * 8 + c``) — BIGINT-sign-safe in any engine
   and exactly the blocking key the pair join needs.

Near-dup pairs: band-equality blocking is EXACT LSH for Hamming
distance — two hashes within distance d <= 3 must agree on at least
one of the 4 bands (pigeonhole), so recall is 1.0 at the default
threshold, not probabilistic. Verification is
``bit_count(xor)`` summed over the bands, JVM-side.

100-TB shape: decode+hash is one Arrow batch pass over (id, bytes) —
no shuffle; the pair join shuffles 4 rows of (16-bit key, id) per
image, never pixels; Σ|block|² cost is bounded by band-value
collisions (65k values per band spread the space).

Reference lineage: the reference stores image URLs and dedups rows by
content hash (apps/etl/models.py); a multimodal curation pipeline
dedups the PIXELS, tolerant to re-encoding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_W, HASH_H = 8, 8  # 8x8 difference bits from a 9x8 cell grid
N_BANDS = 4


def dhash_bands(px: np.ndarray, mode: str) -> list[int]:
    """The 4 band ints of an image array ((h, w, ch) uint8)."""
    a = px.astype(np.int64)
    if mode == "RGB" or (a.ndim == 3 and a.shape[2] >= 3):
        gray = (a[:, :, 0] + a[:, :, 1] + a[:, :, 2]) // 3
    else:
        gray = a.reshape(a.shape[0], a.shape[1], -1)[:, :, 0]
    h, w = gray.shape
    cells = np.zeros((HASH_H, HASH_W + 1), dtype=np.int64)
    for r in range(HASH_H):
        y0, y1 = r * h // HASH_H, (r + 1) * h // HASH_H
        for c in range(HASH_W + 1):
            x0, x1 = c * w // (HASH_W + 1), (c + 1) * w // (HASH_W + 1)
            box = gray[y0:y1, x0:x1]
            cells[r, c] = int(box.sum()) // box.size
    bands = [0] * N_BANDS
    for r in range(HASH_H):
        for c in range(HASH_W):
            if cells[r, c] < cells[r, c + 1]:
                bands[r // 2] |= 1 << ((r % 2) * 8 + c)
    return bands


def image_dhash(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """(id, width, height, b0..b3) per decodable image; undecodable
    payloads yield NULL hash columns (record-not-drop, like the other
    multimodal operators). Arrow-batched, no shuffle."""
    from montandon_etl_spark.operators.multimodal import _decode_any_image

    schema = (f"{id_col} bigint, width int, height int,"
              " b0 int, b1 int, b2 int, b3 int")

    def batches(it):
        cols = [id_col, "width", "height", "b0", "b1", "b2", "b3"]
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    w, h, mode, px = _decode_any_image(bytes(p))
                    bands = dhash_bands(px, mode)
                    rows.append((int(aid), w, h, *bands))
                except Exception:
                    rows.append((int(aid), None, None,
                                 None, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(batches, schema=schema)


def image_near_dup_pairs(hashes: DataFrame, id_col: str,
                         max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) for hash pairs within ``max_hamming``
    bits, id_a < id_b. Band-equality blocking: exact (recall 1.0) for
    max_hamming <= 3; above that it degrades to standard LSH recall
    (a pair differing in all four bands is never compared) — the same
    documented trade as the text LSH family."""
    with_bands = hashes.filter(F.col("b0").isNotNull())
    sides = []
    for tag in ("a", "b"):
        sides.append(with_bands.select(
            F.col(id_col).alias(f"id_{tag}"),
            *[F.col(f"b{i}").alias(f"{tag}{i}") for i in range(N_BANDS)],
        ))
    a, b = sides
    ax = a.select(
        "id_a", *[f"a{i}" for i in range(N_BANDS)],
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("bi"), F.col(f"a{i}").alias("bv"))
            for i in range(N_BANDS)])).alias("k"))
    bx = b.select(
        "id_b", *[f"b{i}" for i in range(N_BANDS)],
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("bi"), F.col(f"b{i}").alias("bv"))
            for i in range(N_BANDS)])).alias("k"))
    cand = (ax.join(bx, ax["k"] == bx["k"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    *[f"a{i}" for i in range(N_BANDS)],
                    *[f"b{i}" for i in range(N_BANDS)])
            .distinct())
    ham = None
    for i in range(N_BANDS):
        d = F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")))
        ham = d if ham is None else (ham + d)
    return (cand.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
