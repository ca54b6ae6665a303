"""Cardinality sketches that stay deterministic across engines.

``approx_count_distinct`` (HyperLogLog) answers the same question but
its estimate depends on the engine's hash and register layout — it can
never be oracle-checked. The K-minimum-values sketch is the
deterministic alternative: hash every value to (0, 2^60) with the
repo's portable md5-prefix hash (``dedup.hash60``), keep the k
smallest DISTINCT hashes per group, and estimate

    distinct ≈ (k − 1) / normalized_kth_smallest
             = (k − 1) · 2^60 / kth_smallest_hash

with the answer EXACT (= hashes seen) whenever a group has fewer than
k distinct values. Standard error is ~1/sqrt(k − 2). Every step is a
pure function of the input set: the same rows give bit-identical
estimates on Spark and DuckDB, and the tests pin that.

KMV is also mergeable — the sketch of a union is the bottom-k of the
unioned sketches — which is what makes it a lake-friendly statistic:
per-partition sketches combine without rescanning.

100 TB shape: one distinct on (group, hash) with map-side partial
dedup, then a per-group bottom-k that Spark executes as
WindowGroupLimit (top-k pushed into the shuffle, no full sort), then
an O(groups) aggregate. (k − 1) · 2^60 overflows BIGINT for k > 8, so
the numerator is a double literal — exactly representable, since
k − 1 has few significant bits.

Reference lineage: the reference counts distinct monitoring
dimensions with exact SQL aggregates (apps/etl/models.py); at 10^10
rows those become sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct-count estimate:
    (group, n_seen, est_distinct). ``n_seen`` is the sketch size
    (min(k, true distinct)); ``est_distinct`` equals n_seen exactly
    below k, else the (k−1)/R_k estimator."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    d = (
        df.select(
            F.col(group_col),
            hash60(F.col(value_col).cast("string")).alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("hv")
    top = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    numer = float((k - 1) << 60)  # exact double: k-1 has few mantissa bits
    return (
        top.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_seen"), F.max("hv").alias("_kth"))
        .select(
            group_col,
            "n_seen",
            F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
            .otherwise(F.lit(numer) / F.col("_kth"))
            .alias("est_distinct"),
        )
    )
