"""Train/val/test splitting + cross-split leakage audit.

``hash_split`` assigns every document a split deterministically from
``hash60(salt | id)`` against integer thresholds on the 2^60 grid —
reproducible across runs/engines (no RNG state), stable under corpus
growth (a document's split never changes when others arrive), and
exactly SQL-replayable (the md5-prefix hash60 twin).

``split_leakage`` is the audit a training pipeline runs before
trusting an eval number: near-duplicate pairs that STRADDLE splits
(train↔val/test) are contamination the id-level disjointness cannot
see. Candidates come from the same banded minhash-LSH as the dedup
family (Σ|bucket|² work, max_bucket capped), then each pair's two
split labels join in and only cross-split pairs survive.

100-TB shape: split assignment is a scan-local expression (no
shuffle, no RNG broadcast); leakage reuses the LSH pair machinery —
its one shuffle is the band-bucket exchange, and the split-label join
is by id against a column already in the scan.

Reference lineage: the reference validates items before load (F-
gates); an ML curation engine must also validate the SPLIT — eval
contamination is the data bug that silently inflates benchmarks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60, minhash_lsh_pairs

GRID = 1 << 60


def hash_split(df: DataFrame, id_col: str,
               weights: tuple = (("train", 8), ("val", 1), ("test", 1)),
               salt: str = "split") -> DataFrame:
    """Add a ``split`` column: deterministic weighted assignment on
    the integer 2^60 hash grid (exact integer thresholds — no float
    boundaries to disagree across engines)."""
    total = sum(w for _, w in weights)
    h = hash60(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    expr = None
    acc = 0
    for name, w in weights[:-1]:
        acc += w
        thr = GRID * acc // total
        cond = h < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(weights[-1][0]) if expr is None
            else expr.otherwise(weights[-1][0]))
    return df.withColumn("split", expr)


def split_report(df: DataFrame) -> DataFrame:
    return (df.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
            .select("split", "n_docs"))


def split_leakage(df: DataFrame, id_col: str, text_col: str,
                  split_col: str = "split", n: int = 2, k: int = 8,
                  bands: int = 4, max_bucket: int | None = 500
                  ) -> DataFrame:
    """Near-duplicate pairs that straddle splits:
    (id_a, id_b, split_a, split_b), id_a < id_b. Empty result =
    no detected contamination at this LSH sensitivity."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, n=n, k=k,
                              bands=bands, max_bucket=max_bucket)
    lab = df.select(F.col(id_col).alias("_id"),
                    F.col(split_col).alias("_s"))
    return (pairs
            .join(lab.select(F.col("_id").alias("id_a"),
                             F.col("_s").alias("split_a")), "id_a")
            .join(lab.select(F.col("_id").alias("id_b"),
                             F.col("_s").alias("split_b")), "id_b")
            .filter(F.col("split_a") != F.col("split_b"))
            .select("id_a", "id_b", "split_a", "split_b"))
