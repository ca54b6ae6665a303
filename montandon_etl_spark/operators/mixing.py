"""Data-mixture resampling — the corpus-mixing step between a curated
pool and a trainer: each stratum (domain/source/language) gets a target
weight, and documents are deterministically down-sampled (weight < 1)
or up-sampled (weight > 1: whole copies + a hash-thresholded fractional
copy) to hit it in expectation.

Scale shape: one broadcast join of the (stratum → weight) table, one
scan-local hash test per document, and an `explode(sequence(...))` for
the copy fan-out — no shuffle of the documents themselves. The copy
index rides along so downstream packing/shuffling can distinguish
epochs of the same document.

Determinism contract: the keep/copy decision is a pure function of
(key, stratum weight) via the md5-prefix hash60 — the same document
always resamples the same way on any engine and any partition layout,
and a DuckDB oracle replays it exactly. The hash is scaled against an
integer grid (HASH_SPACE) so the threshold compare is integer-exact.

Reference analogue: the reference pipeline ingests every event
(no mixing stage, apps/etl/transform.py); this operator covers the
trainer-facing gap alongside sampling.py's PPS/stratified-cap family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60

# the keep-test grid: hash60 is uniform on [0, 2^60); thresholds are
# precomputed integers on the same grid so both engines compare ints
HASH_SPACE = 1 << 60


def mixture_resample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Resample rows so stratum ``s`` appears ``weights[s]``× as often.

    weight w = whole ``floor(w)`` copies of every row, plus one more
    copy for rows whose key-hash falls under the fractional remainder
    (so w=2.25 → 2 copies always, a 3rd for 25% of keys; w=0.25 → one
    copy for 25% of keys, none otherwise). Output adds ``copy_idx``
    (0-based) and keeps all input columns.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("weights must be non-negative")

    def parts(w: float) -> tuple[int, int]:
        whole = int(w)
        frac_thresh = int(round((w - whole) * HASH_SPACE))
        return whole, frac_thresh

    rows = [(s, *parts(w)) for s, w in sorted(weights.items())]
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        rows, f"{stratum_col} string, _whole int, _frac bigint"
    )
    dwhole, dfrac = parts(default_weight)
    h = hash60(F.col(id_col).cast("string"))  # uniform on [0, 2^60)
    copies = (
        F.coalesce(F.col("_whole"), F.lit(dwhole))
        + F.when(h < F.coalesce(F.col("_frac"), F.lit(dfrac)), 1).otherwise(0)
    )
    return (
        df.join(F.broadcast(wdf), stratum_col, "left")
        .withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)),
        )
        .drop("_whole", "_frac", "_copies")
    )


def mixture_report(
    df: DataFrame, stratum_col: str
) -> DataFrame:
    """Per-stratum row counts of a (resampled) corpus — the sanity
    check a mixing run logs; one partial aggregation."""
    return df.groupBy(stratum_col).agg(F.count("*").alias("n_rows"))
