"""Deterministic sampling — the reproducibility-critical cousins of
df.sample() for training-data pipelines.

``df.sample()`` is seed-dependent ON THE PARTITIONING: the same seed
over a repartitioned input samples different rows, so a re-run of a
10^10-row pipeline silently changes the training set. These operators
key the decision on a content-stable hash of the ROW ID instead — the
same row is in or out forever, on any cluster layout, resumable across
retries. Portable hash (md5-prefix) so an external SQL oracle selects
the identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60


def hash_sample(
    df: DataFrame, id_col: str, fraction_pct: int, buckets: int = 100
) -> DataFrame:
    """Deterministic ~fraction_pct% sample: keep rows whose id-hash
    lands in the first ``fraction_pct`` of ``buckets`` hash buckets.
    Pure scan-local filter — pushes down, costs nothing, reproducible."""
    h = hash60(F.col(id_col).cast("string")) % F.lit(buckets)
    return df.filter(h < fraction_pct)


def stratified_cap(
    df: DataFrame, class_col: str, id_col: str, cap: int
) -> DataFrame:
    """Per-class downsampling to at most ``cap`` rows, chosen by hash
    order (NOT arbitrary first-k, which would be partition-layout
    dependent): the class-balancing step of corpus curation. One
    shuffle on the class column; Spark 4 plans the rank filter as
    WindowGroupLimit (partial top-k below the shuffle)."""
    w = Window.partitionBy(class_col).orderBy(
        hash60(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
