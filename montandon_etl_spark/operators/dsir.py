"""Data Selection via Importance Resampling (DSIR) — hashed n-gram
likelihood-ratio data selection, the published method for "pick the
raw-web documents that look like the target corpus" (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling";
features per Weinberger et al. 2009 hashing trick — both public).

Model: two bag-of-hashed-ngrams distributions — p (target corpus) and
q (raw corpus) — over B hash buckets with Laplace +1 smoothing; a
document's importance score is

    log w(doc) = Σ_features  log p(bucket) − log q(bucket)

and selection takes the top-k documents by score (the deterministic
variant of the paper's Gumbel-noised resampling — this engine's
contract is bit-reproducibility, so the noise-free ranking is the
shipped rule; ties break by doc id).

Determinism contract: the only float in the pipeline is ONE ``ln``
per bucket, computed over the same double expression in both engines
and snapped to integer micro-units (``floor(x·10⁶ + 0.5)``) — the
same trick ``train_logistic`` uses to absorb ``exp`` ULPs. Document
scores are then exact BIGINT sums of (count × micro-log-ratio):
order-independent, layout-independent, and DuckDB-replayable.

100 TB shape:
- feature extraction is the classifier's scan-local column program
  (``classifier.hashed_features`` — no Python, no shuffle);
- the two count tables are partial-agged groupBys bounded by B rows
  each (never by corpus size); corpus totals are two 1-row collects
  (bounded driver metadata);
- the log-ratio table is B rows → **broadcast** join, so scoring is
  scan + broadcast join + one per-doc aggregation — the raw corpus
  text never shuffles;
- top-k is a global ``orderBy().limit(k)`` — Spark plans TakeOrdered
  (per-partition heaps + driver merge of k·P rows), not a full sort.

Reference lineage: the reference hand-picks sources with per-source
extraction allowlists (apps/etl/transform/sources/*.py); DSIR is the
learned, corpus-level generalization a Common-Crawl-scale pipeline
uses to weight raw data toward a trusted target distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.operators.classifier import hashed_features


def dsir_logratio(spark: SparkSession, target: DataFrame, raw: DataFrame,
                  id_col: str, text_col: str,
                  n_buckets: int) -> DataFrame:
    """Per-bucket micro-unit log likelihood ratio table
    ``(bucket, lr_micro)`` covering ALL buckets 0..B−1 (a bucket
    unseen in both corpora still gets the smoothed constant — raw
    documents may hash features there).

    ``lr = ln( (c_t(b)+1)·(N_r+B) / ((c_r(b)+1)·(N_t+B)) )`` — one
    ``ln`` over one double expression, micro-snapped to BIGINT.
    """
    if n_buckets <= 0:
        raise ValueError("dsir: n_buckets must be positive")

    def counts(df: DataFrame) -> DataFrame:
        return (hashed_features(df, id_col, text_col, n_buckets)
                .groupBy("bucket").agg(F.count(F.lit(1)).alias("c")))

    tc, rc = counts(target), counts(raw)
    n_t = tc.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0]
    n_r = rc.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0]
    ntb, nrb = float(n_t + n_buckets), float(n_r + n_buckets)
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (buckets
              .join(tc.withColumnRenamed("c", "ct"), "bucket", "left")
              .join(rc.withColumnRenamed("c", "cr"), "bucket", "left")
              .select("bucket",
                      F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
                      F.coalesce(F.col("cr"), F.lit(0)).alias("cr")))
    ratio = ((F.col("ct") + F.lit(1)).cast("double") * F.lit(nrb)) / \
        ((F.col("cr") + F.lit(1)).cast("double") * F.lit(ntb))
    return joined.select(
        "bucket",
        F.floor(F.log(ratio) * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("lr_micro"))


def dsir_score(docs: DataFrame, id_col: str, text_col: str,
               logratio: DataFrame, n_buckets: int) -> DataFrame:
    """Score every document against a log-ratio table:
    ``(doc_id, n_feats, lr_score)`` with
    ``lr_score = Σ_features lr_micro(bucket)`` an exact BIGINT sum
    (feature occurrences weight naturally by appearing once per
    occurrence). The table is B rows → broadcast; the only shuffle is
    the per-document aggregation."""
    feats = hashed_features(docs, id_col, text_col, n_buckets)
    return (feats.join(F.broadcast(logratio), "bucket")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_feats"),
                 F.sum("lr_micro").alias("lr_score"))
            .withColumnRenamed("doc_id", id_col))


def dsir_select(spark: SparkSession, target: DataFrame, raw: DataFrame,
                id_col: str, text_col: str, n_buckets: int,
                k: int) -> DataFrame:
    """End-to-end DSIR: fit the two hashed-ngram models, score the raw
    corpus, keep the top-``k`` documents by importance score (ties →
    smaller id). Returns ``(id, n_feats, lr_score)`` of the selected
    set."""
    lr = dsir_logratio(spark, target, raw, id_col, text_col, n_buckets)
    scored = dsir_score(raw, id_col, text_col, lr, n_buckets)
    return (scored
            .orderBy(F.col("lr_score").desc(), F.col(id_col).asc())
            .limit(k))
