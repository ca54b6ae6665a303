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


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int, seed: int = 0) -> DataFrame:
    """Efraimidis–Spirakis (A-ES) weighted sampling WITHOUT
    replacement: each row draws u ∈ (0, 1] from a content-stable hash
    of (id, seed) and scores ``u^(1/w)``; the global top-k by score is
    distributed exactly as k sequential weighted draws without
    replacement (Efraimidis & Spirakis 2006, public) — the data-mixing
    primitive behind "sample 1M docs proportional to quality".

    Determinism: u = (hash60(id ‖ '#' ‖ seed) + 1) / 2^60 is a pure
    function of the row id — the same rows are selected on any
    partition layout, any cluster size, any engine (the oracle replays
    the identical md5 arithmetic). New seed → fresh independent
    sample. Rows with NULL or non-positive weight are excluded (they
    can never be drawn).

    Scale shape: NO shuffle — Catalyst plans the global
    ``orderBy(...).limit(k)`` as TakeOrderedAndProject (per-partition
    top-k heaps merged once at the driver): O(corpus) scan +
    O(k log k) merge, driver memory O(k). Plan-pinned.

    Accepted ulp risk (ADVICE r5, documented rather than changed —
    the oracle SQL text is frozen): the score crosses the oracle
    boundary as a raw libm double (``pow``); Java Math.pow and
    DuckDB/C pow may differ in the last ulp, so a near-tie at the
    k-th rank could in principle select different rows. Inputs are
    integer-exact on both sides, the driver fixtures have no such
    ties, and any future re-keying should quantize the score before
    ranking.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if "_aes" in df.columns:
        raise ValueError(
            "weighted_sample: input already has an '_aes' column - it "
            "would be overwritten and dropped; rename it upstream")
    u = (hash60(F.concat(F.col(id_col).cast("string"),
                         F.lit("#"), F.lit(seed)))
         + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    score = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_aes", score)
        .orderBy(F.desc("_aes"), F.col(id_col))
        .limit(k)
        .drop("_aes")
    )


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


def pps_systematic_sample(df: DataFrame, id_col: str, weight_col: str,
                          n_samples: int, n_buckets: int = 256) -> DataFrame:
    """Deterministic probability-proportional-to-size sampling by the
    systematic (cumulative-interval) method — the mixture-construction
    step of a training-data pipeline ("sample N documents with
    probability ∝ quality×length") made exactly reproducible.

    Rows are laid on a line in hash-of-id order (content-stable, like
    every sampler here), each occupying its INTEGER weight (scale
    fractional scores to integer units upstream); the line is cut by
    the centered systematic grid c_i = (2i+1)·W/(2n), i < n, and the
    row under each cut is taken — expected multiplicity of a row is
    exactly n·w/W, and a row with w ≥ W/n is always taken. Every
    quantity stays in BIGINT (cut membership counts odd multiples of W
    via integer division — no float, no decimal division), so the
    selected set is bit-identical in any engine and partition layout.
    Returns (id, n_hits ≥ 1); heavy rows can cover several cuts.
    Bound: 2·n_samples·ΣW must fit in int64.

    Plan shape — two-phase bucketed cumulative sum, NO global sort:
    the hash line is pre-cut into ``n_buckets`` contiguous hash
    ranges (bucket order ≡ hash order, ties impossible across
    buckets since equal hashes share a bucket). Phase 1 aggregates
    the ≤n_buckets per-bucket weight totals (one partial-agg
    shuffle of n_buckets rows) and the driver turns them into an
    exclusive-prefix offset map — bounded metadata, broadcast back
    as a literal map. Phase 2 runs the cumulative sum as a window
    PARTITIONED by bucket (each bucket sorts locally in parallel)
    plus the broadcast offset — bit-identical to the single global
    window by construction — and the scan-local cut-count
    expression. The sort is per-bucket, so the operator scales with
    executors instead of funneling 10^10 rows through one task."""
    wcol = F.col(weight_col).cast("bigint")
    span = (1 << 60) // n_buckets  # hash60 ∈ [0, 2^60)
    base = (df.withColumn("_w", wcol).filter(F.col("_w") > 0)
            .withColumn("_h", hash60(F.col(id_col).cast("string")))
            .withColumn("_bk", F.expr(f"_h div {span}")))
    bucket_totals = sorted(
        base.groupBy("_bk").agg(F.sum("_w").alias("t")).collect(),
        key=lambda r: r["_bk"])
    if not bucket_totals:
        return df.select(F.col(id_col),
                         F.lit(0).cast("bigint").alias("n_hits")).limit(0)
    offsets, total = {}, 0
    for r in bucket_totals:
        offsets[r["_bk"]] = total
        total += r["t"]
    off_map = F.create_map(
        *[F.lit(v) for kv in offsets.items() for v in kv])
    wb = Window.partitionBy("_bk").orderBy("_h", F.col(id_col))
    with_cum = base.withColumn(
        "_cum", off_map[F.col("_bk")] + F.sum("_w").over(wb))
    # cut i sits at (2i+1)·T/(2n); row covers (cum−w, cum] —
    # #cuts = f(2n·cum) − f(2n·(cum−w)) with f(x) = #odd m: m·T ≤ x
    #       = (x div T + 1) div 2  (pure int64 arithmetic)
    n2 = 2 * n_samples
    with_b = with_cum.withColumn("_R", F.col("_cum") * n2).withColumn(
        "_L", (F.col("_cum") - F.col("_w")) * n2)
    f_hi = F.expr(f"(_R div {total} + 1) div 2")
    f_lo = F.expr(f"(_L div {total} + 1) div 2")
    return (with_b
            .withColumn("n_hits", (f_hi - f_lo).cast("bigint"))
            .filter(F.col("n_hits") > 0)
            .select(F.col(id_col), "n_hits"))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int,
                   seed: str = "0") -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards:
    ``(shard, pos, <row>)`` where ``shard``/``pos`` define a
    pseudorandom permutation of the corpus that is a pure function of
    (row id, seed) — identical on any partition layout, any engine,
    any cluster size, and resumable across retries (the property
    ``df.orderBy(rand(seed))`` does NOT have).

    Trainers want the corpus order decorrelated from crawl/ingest
    order, reproducible run-to-run, and addressable (shard k, position
    i) for mid-epoch resume. Shard = fixed-width range of the 60-bit
    id-hash space (``h // (2^60 / n_shards)`` — no sampled range
    partitioner, so no nondeterminism), position = rank of (h, id)
    within the shard. New seed → new independent permutation.

    100 TB shape: ONE hash-shuffle to the shard grain; the per-shard
    rank is a window WITHIN each shard (rows/shard ~ corpus/n_shards —
    pick n_shards so a shard fits a task, exactly like output-file
    sizing); no global sort, no single partition anywhere. Ties are
    impossible at the (h, id) grain because id is unique.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    taken = {"shard", "pos", "_h"} & set(df.columns)
    if taken:
        raise ValueError(f"shuffle_shards: input already has {sorted(taken)}")
    width = (1 << 60) // n_shards  # last shard absorbs the remainder
    h = hash60(F.concat(F.col(id_col).cast("string"),
                        F.lit("#"), F.lit(seed)))
    # integer div, NOT `/`: Spark's `/` on bigints is DOUBLE division,
    # inexact above 2^53 — shard ids near range edges would flip
    d = df.withColumn("_h", h).withColumn(
        "shard",
        F.least(F.expr(f"_h div {width}").cast("int"),
                F.lit(n_shards - 1)),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        d.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h")
        .select("shard", "pos",
                *[c for c in df.columns])
    )
