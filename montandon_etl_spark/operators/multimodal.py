"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns beside typed
metadata — exactly the reference's row-metadata/blob-payload split
(apps/etl/models.py:72 stores the blob by path; at 10^10 scale the
payload lives *in* the columnar files, per SURVEY.md §1.1).

The decode/feature-extract step runs through ``mapInPandas`` (Arrow
batch iterator — the right shape for big binary payloads because one
batch amortizes serde over many rows and never materializes the whole
partition). The actual codecs (PIL/ffmpeg) are NOT in this container,
so decode is STUBBED two ways:

- ``decode_mode="fake"`` (default in tests): a deterministic fake that
  derives pseudo width/height/duration from the payload bytes — the
  Spark-side plumbing (schema, partitioning, UDF signature, Arrow
  batch shape) is real and tested;
- ``decode_mode="real"``: raises ``NotImplementedError`` at the point
  a codec would be called, behind an import-try for PIL.
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
