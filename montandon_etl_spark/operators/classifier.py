"""Hashing-trick linear text classifier (fastText / Vowpal-Wabbit
family) — the model-based quality/topic filter stage of a web-text
curation pipeline.

Architecture (public: Joulin et al. 2016 "Bag of Tricks for Efficient
Text Classification"; Weinberger et al. 2009 hashing trick): unigram +
bigram features hashed into B buckets, a per-(bucket, class) weight
table, document score per class = sum of its features' weights,
prediction = argmax. Weights come from ANY trainer (fastText, a
logistic regression, the NB sufficient statistics from
:func:`feature_class_counts`) — the operator is the inference plan.

Integer-weight contract: weights are int64 so document scores are
exact sums — the argmax/margin comparisons are engine-portable (no
float accumulation order), which is what lets a DuckDB oracle verify
the full pipeline. A float-weight model can always be fixed-point
scaled into this contract (×10^6 and round — ranking unchanged).

Reference analogue: the per-hazard validation gates
(apps/etl/transform/sources/*.py filter_events) are hand-written
keep/route rules; this operator is the learned generalization used at
Common-Crawl scale where hand rules don't cover the tail.

100 TB shape:
- feature extraction is scan-local (one ``transform`` over the token
  array — no Python, no shuffle);
- the weight table is B×C rows (4096×3 here — a few hundred KB even
  at fastText's default 2M buckets) → **broadcast** join, never a
  shuffle of the corpus;
- the only shuffle is the per-document score aggregation, keyed by
  doc_id with map-side partial sums over C conditional columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60

# bigram feature string: adjacent tokens joined with '_'
_BG = "concat(element_at(w, i), '_', element_at(w, i + 1))"


def hashed_features(df: DataFrame, id_col: str, text_col: str,
                    n_buckets: int) -> DataFrame:
    """(doc_id, bucket) — one row per feature OCCURRENCE (counts
    matter, as in fastText's mean-of-embeddings input): whitespace
    unigrams plus adjacent-pair bigrams (joined with '_'), each
    hashed into ``n_buckets`` via the portable md5-prefix hash."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    )
    h = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
    feats = (
        f"concat("
        f" transform(w, x -> {h.format(x='x')} % {n_buckets}),"
        f" transform(sequence(1, greatest(1, size(w) - 1)),"
        f"  i -> case when size(w) >= 2 then"
        f"   {h.format(x=_BG)} % {n_buckets}"
        f"  end))"
    )
    return (
        d.select("doc_id", F.explode(F.expr(feats)).alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .select("doc_id", F.col("bucket").cast("bigint").alias("bucket"))
    )


def seeded_weights(spark, n_buckets: int, n_classes: int,
                   seed: str = "wt") -> DataFrame:
    """Deterministic synthetic weight table (bucket, cls, wt) with
    wt = hash60('<seed>:<bucket>:<cls>') % 1001 - 500 ∈ [-500, 500].
    Stands in for a trained model in tests/benchmarks; a DuckDB oracle
    reconstructs it closed-form. Real deployments pass their own
    (bucket, cls, wt) table to :func:`score_hashed_linear` instead."""
    return (
        spark.range(n_buckets).select(F.col("id").alias("bucket"))
        .crossJoin(spark.range(n_classes).select(F.col("id").alias("cls")))
        .select(
            "bucket", "cls",
            (hash60(F.concat_ws(":", F.lit(seed), F.col("bucket"),
                                F.col("cls"))) % 1001 - 500).alias("wt"),
        )
    )


def feature_class_counts(df: DataFrame, id_col: str, text_col: str,
                         label_col: str, n_buckets: int) -> DataFrame:
    """Per-(bucket, class) feature-occurrence counts over a labeled
    corpus — the sufficient statistics of multinomial Naive Bayes (and
    the count features a logistic trainer starts from). One
    partial-agged groupBy; log/smoothing transforms are the caller's
    (float) business."""
    labels = df.select(F.col(id_col).alias("doc_id"),
                       F.col(label_col).alias("cls"))
    return (
        hashed_features(df, id_col, text_col, n_buckets)
        .join(labels, "doc_id")
        .groupBy("bucket", "cls")
        .agg(F.count("*").alias("n"))
    )


def score_hashed_linear(df: DataFrame, id_col: str, text_col: str,
                        weights: DataFrame, n_buckets: int,
                        n_classes: int) -> DataFrame:
    """Score + classify every document against an integer weight table.

    Returns (doc_id, score_0..score_{C-1}, label, margin): per-class
    exact integer scores, argmax label (ties → smallest class id), and
    the top-1 − top-2 margin (confidence proxy). Documents whose
    features all hash to weightless buckets score 0 everywhere.
    """
    feats = hashed_features(df, id_col, text_col, n_buckets)
    joined = feats.join(F.broadcast(weights), "bucket")
    scores = joined.groupBy("doc_id").agg(*[
        F.coalesce(
            F.sum(F.when(F.col("cls") == c, F.col("wt"))), F.lit(0)
        ).alias(f"score_{c}")
        for c in range(n_classes)
    ])
    # docs can drop out of the join only if weights misses buckets —
    # left-join back so every input doc gets a row
    base = df.select(F.col(id_col).alias("doc_id"))
    scores = base.join(scores, "doc_id", "left").select(
        "doc_id", *[
            F.coalesce(F.col(f"score_{c}"), F.lit(0)).alias(f"score_{c}")
            for c in range(n_classes)
        ]
    )
    top = F.greatest(*[F.col(f"score_{c}") for c in range(n_classes)])
    label = None
    for c in range(n_classes - 1, -1, -1):
        cond = F.col(f"score_{c}") == top
        label = F.when(cond, c) if label is None else F.when(cond, c).otherwise(label)
    # margin: top minus runner-up via a sorted score array
    arr = F.sort_array(
        F.array(*[F.col(f"score_{c}") for c in range(n_classes)]), asc=False
    )
    return scores.select(
        "doc_id", *[f"score_{c}" for c in range(n_classes)],
        label.cast("int").alias("label"),
        (F.element_at(arr, 1) - F.element_at(arr, 2)).alias("margin"),
    )


def train_logistic(df: DataFrame, id_col: str, text_col: str,
                   label_col: str, n_buckets: int, epochs: int = 3,
                   lr: float = 0.5) -> DataFrame:
    """Train a binary logistic regression over the hashed features by
    full-batch gradient descent → an integer weight table
    ``(bucket, w_micro)`` that plugs straight into
    :func:`score_hashed_linear` (micro-units ARE the int-weight
    contract; C=2 inference uses w for class 1 and 0 for class 0, or
    just thresholds the margin at 0).

    Engine-exact by construction, like the k-means family: weights
    live in integer micro-units, so the two cross-row sums — the
    per-document margin Σ w[f] and the per-feature gradient
    Σ count·residual — are exact BIGINT sums (order-independent,
    layout-independent, DuckDB-replayable). The only transcendental,
    the sigmoid, is computed on an exact-integer-derived double and
    its residual is immediately snapped to micro-units, absorbing
    last-ulp ``exp`` differences between engines. The update
    ``w -= floor(lr·g/N + 0.5)`` is a straight-line double expression
    of exact integers, identical in both engines.

    Per epoch: ONE broadcast-weights join for margins (per-doc
    partial-agged sum), one residual join back to features (per-bucket
    partial-agged sum) — the corpus shuffles only at the doc and
    bucket grains; weights are ``localCheckpoint``ed per epoch so
    Catalyst never re-optimizes an epochs-deep plan. Labels must be
    0/1.

    Scale note: gradients are exact while Σ count·1e6 stays within
    int64/2^53 — i.e. training sets up to ~10^9 feature occurrences,
    which is the operating regime anyway: production quality filters
    train on bounded labeled SAMPLES (hash_sample upstream), then
    score the full corpus via the broadcast inference plan.
    """
    if epochs < 1:
        raise ValueError("train_logistic: epochs must be >= 1")
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(label_col).cast("bigint").alias("y"))
    n = base.count()
    if not n:
        raise ValueError("train_logistic: empty training set")
    feats = hashed_features(df, id_col, text_col, n_buckets) \
        .localCheckpoint()
    weights = None  # epoch-0 weights are all zero
    for _ in range(epochs):
        if weights is None:
            zm = base.select("doc_id", "y",
                             F.lit(0).cast("bigint").alias("zm"))
        else:
            zsum = (feats.join(F.broadcast(weights), "bucket")
                    .groupBy("doc_id")
                    .agg(F.sum("w_micro").alias("zm")))
            zm = base.join(zsum, "doc_id", "left").select(
                "doc_id", "y",
                F.coalesce(F.col("zm"), F.lit(0)).cast("bigint").alias("zm"))
        resid = zm.select(
            "doc_id",
            F.floor(
                (F.lit(1.0)
                 / (F.lit(1.0)
                    + F.exp(-(F.col("zm").cast("double")
                              / F.lit(1_000_000.0))))
                 - F.col("y")) * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("bigint").alias("r"),
        )
        grad = (feats.join(resid, "doc_id")
                .groupBy("bucket").agg(F.sum("r").alias("g")))
        delta = grad.select(
            "bucket",
            F.floor(F.lit(lr) * F.col("g") / F.lit(float(n)) + F.lit(0.5))
            .cast("bigint").alias("d"),
        )
        if weights is None:
            weights = delta.select("bucket", (-F.col("d")).alias("w_micro"))
        else:
            # every corpus bucket appears in every epoch's gradient, so
            # a full outer join is belt-and-braces for callers feeding
            # epoch-varying corpora
            weights = weights.join(delta, "bucket", "full_outer").select(
                "bucket",
                (F.coalesce(F.col("w_micro"), F.lit(0))
                 - F.coalesce(F.col("d"), F.lit(0))).alias("w_micro"),
            )
        weights = weights.filter(F.col("w_micro") != 0).localCheckpoint()
    return weights


def train_logistic_ovr(df: DataFrame, id_col: str, text_col: str,
                       label_col: str, n_classes: int, n_buckets: int,
                       epochs: int = 3, lr: float = 0.5) -> DataFrame:
    """Multi-class training as one-vs-rest over :func:`train_logistic`
    → ``(bucket, cls, wt)``, the exact table
    :func:`score_hashed_linear` consumes (argmax over per-class exact
    integer sums — the fastText inference shape). Labels must be
    0..n_classes-1.

    Each class trains the binary problem ``y = (label == c)``; C
    sequential trainings over the same checkpointed corpus — at
    production scale C is small (quality tiers, a topic taxonomy) and
    each training is the bounded-sample regime ``train_logistic``
    documents."""
    if n_classes < 2:
        raise ValueError("train_logistic_ovr: n_classes must be >= 2")
    out = None
    for c in range(n_classes):
        lab = df.withColumn(
            "_y", (F.col(label_col) == c).cast("bigint"))
        w = train_logistic(lab, id_col, text_col, "_y", n_buckets,
                           epochs=epochs, lr=lr).select(
            "bucket", F.lit(c).alias("cls"),
            F.col("w_micro").alias("wt"))
        out = w if out is None else out.unionByName(w)
    return out
