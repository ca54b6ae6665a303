"""Deduplication operators — exact, revision-chain, MinHash-LSH,
SimHash, n-gram Jaccard.

The reference dedups payloads by sha-256 content hash with a revision
chain to the first occurrence
(apps/etl/extraction/sources/gdacs/extract.py:128-148, models.py:86-93).
``dedup_exact`` / ``revision_chain`` are that operator, vectorized.
The near-dup family (MinHash, SimHash, Jaccard) extends it to the
training-data-pipeline use case over the ``documents`` table.

Portability note: every hash is md5-based —
``conv(substr(md5(x),1,15),16,10)`` → 60-bit int — because both Spark
and the DuckDB oracle compute the identical value
(``('0x'||substr(md5(x),1,15))::bigint``), so these operators are
oracle-checkable end to end. At 100 TB you would swap md5 for
``xxhash64`` (cheaper); the algebra is hash-agnostic.

Scale notes per operator are in the docstrings — the shared theme:
everything is one explode + one shuffle (groupBy/join on the hash),
no driver-side loops, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.util import stable_round6


def hash60(col) -> F.Column:
    """Portable 60-bit hash: md5 hex prefix → bigint (same value in
    DuckDB via ('0x'||substr(md5(x),1,15))::bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def char_shingles(col: str, n: int) -> F.Column:
    """Array of overlapping character n-grams (deterministic order)."""
    return F.expr(
        f"transform(sequence(1, greatest(1, length({col}) - {n} + 1)),"
        f" i -> substring({col}, i, {n}))"
    )


def word_shingles(col: str, n: int) -> F.Column:
    """Array of overlapping word n-grams over whitespace tokens."""
    words = f"split(trim({col}), '\\\\s+')"
    return F.expr(
        f"transform(sequence(1, greatest(1, size({words}) - {n} + 1)),"
        f" i -> concat_ws(' ', slice({words}, i, {n})))"
    )


# ---------------------------------------------------------------- exact dedup
def ngram_contamination(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str | None = None,
    n: int = 5,
    threshold: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at
    least ``threshold`` distinct word n-grams with a benchmark/eval
    set — the leakage gate every serious training-data pipeline runs
    before a corpus ships.

    100 TB shape: the benchmark side is tiny relative to the corpus,
    so its distinct n-grams BROADCAST; the corpus n-grams then never
    shuffle — the plan is scan → explode → broadcast-semi-ish join →
    per-doc count (map-side combinable). Returns one row per corpus
    doc: (id, n_hits, contaminated)."""
    bt = bench_text_col or text_col
    bg = (
        benchmark.select(
            F.explode(F.array_distinct(word_shingles(bt, n))).alias("g")
        ).distinct()
    )
    dg = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g"),
    )
    hits = (
        dg.join(F.broadcast(bg), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    zero = F.coalesce(F.col("n_hits"), F.lit(0))
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            zero.alias("n_hits"),
            (zero >= threshold).alias("contaminated"),
        )
    )


def dedup_exact(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the first (min id) row per sha-256 of content.

    Reference: duplicate-content lookup keeps the first stored payload
    (extract.py:134-139). Plan: sha2 is JVM-side; one hash-shuffle on
    the digest; min_by gets map-side partial aggregation.
    """
    payload = [c for c in df.columns]
    h = F.sha2(F.col(content_col).cast("binary"), 256)
    return (
        df.withColumn("content_hash", h)
        .groupBy("content_hash")
        .agg(
            F.min_by(F.struct(*payload), F.col(id_col)).alias("_w"),
            F.count("*").alias("dup_count"),
        )
        .select("content_hash", "dup_count", *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def revision_chain(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Annotate every row with ``revision_id`` = first id with the same
    content hash (the reference's revision FK, models.py:86-93), and
    ``is_canonical``. Window over the hash — same shuffle key as
    dedup_exact, no join needed."""
    from pyspark.sql import Window as W

    h = F.sha2(F.col(content_col).cast("binary"), 256)
    w = W.partitionBy("content_hash")
    return (
        df.withColumn("content_hash", h)
        .withColumn("revision_id", F.min(id_col).over(w))
        .withColumn("is_canonical", (F.col(id_col) == F.col("revision_id")))
    )


def suppress_unchanged(
    batch: DataFrame,
    current: DataFrame,
    key_col: str = "url",
    content_col: str = "html",
) -> DataFrame:
    """NO_CHANGE suppression (reference ValidationStatus.NO_CHANGE,
    apps/etl/models.py:45 + dedup-by-content extract.py:128-139): drop
    batch events whose content hash equals the current table row's —
    re-crawls of unchanged pages never reach the merge, cutting write
    amplification at the source.

    Semantics note: suppressed events do NOT advance the row's
    (warc_ts, seq) metadata — exactly the reference's behavior (the
    original row is kept; only a revision pointer is recorded). Use
    upstream of ``SnapshotTable.merge`` when that trade-off is wanted.

    Plan: current side reduced to (key, hash) — the wide content never
    joins; left-anti on (key, hash) with the batch's computed hash.
    """
    cur_hashes = current.select(
        F.col(key_col), F.sha2(F.col(content_col).cast("binary"), 256).alias("_h")
    )
    hashed = batch.withColumn(
        "_h", F.sha2(F.col(content_col).cast("binary"), 256)
    )
    return hashed.join(cur_hashes, [key_col, "_h"], "left_anti").drop("_h")


# ------------------------------------------------------------- ngram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    use_words: bool = True,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate near-dup pairs.

    Plan: explode distinct shingles → self-equi-join on shingle →
    count shared per pair → |A∪B| = |A|+|B|−|A∩B|. The shingle join is
    the classic inverted-index pattern: cost is Σ df(shingle)², so at
    scale you run MinHash-LSH first (below) and use this only to
    verify candidates. ``block_col`` adds a blocking key to the join
    (only same-block pairs compared — e.g. same source/domain), the
    standard way to bound the inverted-index blowup.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = (word_shingles(text_col, n) if use_words else char_shingles(text_col, n))
    sel = [F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("sh")]
    if block_col:
        sel.insert(1, F.col(block_col).alias("blk"))
    toks = df.select(*sel)
    sizes = toks.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = toks.alias("a")
    b = toks.alias("b")
    cond = (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id"))
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", stable_round6("jaccard").alias("jaccard"))
    )


# --------------------------------------------------------------- minhash lsh
# Universal-hash permutation family for MinHash: one md5 per shingle
# (the expensive part), then k cheap affine permutations
# ((a_i*h + b_i) mod P) over the Mersenne prime P = 2^31-1. All values
# stay below 2^62 so the arithmetic is exact in BIGINT on both engines
# (and safe under Spark's ANSI overflow checking). Hashing the shingle
# k times with md5 — the previous scheme — made md5 ~k times the cost
# of the whole signature stage.
MINHASH_P = (1 << 31) - 1


def minhash_coeffs(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) permutation coefficients (seeded LCG —
    the SAME literals are inlined into the SQL oracle)."""
    s = seed
    out = []
    for _ in range(k):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = 1 + (s >> 33) % (MINHASH_P - 1)
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (s >> 33) % MINHASH_P
        out.append((int(a), int(b)))
    return out


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 16,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """k-permutation MinHash signature per document.

    min over shingles of perm_i(hash(shingle)) approximates Jaccard:
    P[min_i(A)=min_i(B)] = J(A,B). One explode + one groupBy with k
    min-aggregates (all map-side combinable) — a single shuffle and a
    single md5 per shingle regardless of k.

    ``carry_cols``: extra columns to ride the aggregation (grouped
    with the unique id — identical rows per id, so the grouping is
    equivalent and the caller skips a re-join against the source).

    Shape note (measured, r06): a per-row higher-order-function form
    (array_min over transform) removes this shuffle but runs OUTSIDE
    whole-stage codegen — per-element interpreted lambda eval roughly
    doubled every minhash consumer's wall, so the explode + codegen'd
    partial-min aggregation stays. The shuffle moves k partial mins
    per id per map partition, not the shingles.
    """
    carry = list(carry_cols or [])
    sh = word_shingles(text_col, n)
    toks = df.select(
        F.col(id_col).alias("id"), *carry,
        F.explode(F.array_distinct(sh)).alias("sh")
    ).withColumn("hp", hash60(F.col("sh")) % F.lit(MINHASH_P))
    aggs = [
        F.min((F.lit(a) * F.col("hp") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    return toks.groupBy("id", *carry).agg(*aggs)


def _banded(sig: DataFrame, k: int, bands: int) -> DataFrame:
    """Explode a k-wide signature into (id, band, bucket) rows — the ONE
    definition of the band/bucket encoding, shared by pair generation
    and the audit sidecar so they can never disagree about which
    buckets exist."""
    r = k // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "|", *[F.col(f"mh{i}").cast("string") for i in range(b * r, (b + 1) * r)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Banded-LSH candidate pairs: split the k-wide signature into
    ``bands`` bands of k/bands rows; docs sharing any band bucket are
    candidates. Band-bucket join replaces the O(N²) all-pairs compare
    with Σ bucket² — the scale path for near-dup at 10^10 docs.
    Returns distinct (id_a, id_b), id_a < id_b.

    ``max_bucket`` caps pathological buckets: a near-universal band
    signature (boilerplate/identical pages) would otherwise materialize
    |bucket|² pair structs in a single row — executor OOM at scale.
    Buckets larger than the cap are dropped BEFORE pair expansion (a
    size filter on the collected id list, so the blowup never
    materializes). The members of a dropped bucket are exact or
    near-exact duplicates of each other — ``dedup_exact`` upstream is
    the operator that owns that case; LSH's job is the long tail.
    Use ``minhash_lsh_bucket_stats`` to audit how many buckets/docs the
    cap drops at a given corpus. ``max_bucket=None`` disables the cap.
    """
    assert k % bands == 0
    sig = minhash_signatures(df, id_col, text_col, n=n, k=k)
    # One pass: explode the signature into its bands (a union of band
    # projections would recompute the whole shingle+minhash pipeline
    # per band — 4x the aggregation work and 4x the scans; a self-join
    # would double it again). Pairs are generated inside each bucket
    # from the collected id list: Σ|bucket|² work, the true LSH cost.
    banded = _banded(sig, k, bands)
    pairs_in_bucket = F.expr(
        "filter(flatten(transform(ids, x -> transform(ids,"
        " y -> struct(x AS id_a, y AS id_b)))), p -> p.id_a < p.id_b)"
    )
    size_pred = F.size("ids") > 1
    if max_bucket is not None:
        size_pred = size_pred & (F.size("ids") <= max_bucket)
    return (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("id").alias("ids"))
        .filter(size_pred)
        .select(F.explode(pairs_in_bucket).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def minhash_lsh_bucket_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    max_bucket: int | None = 500,
) -> DataFrame:
    """Audit sidecar for ``minhash_lsh_pairs``: one row of bucket-size
    accounting — n_buckets, n_candidate_buckets, n_dropped_buckets,
    n_dropped_slots ((band, doc) incidences inside dropped buckets),
    n_dropped_docs (DISTINCT documents that lost at least one bucket —
    the number an operator sizes the dedup_exact fallback from), and
    max_bucket_size. Shares the band/bucket encoding with the pair
    generator via ``_banded``. Count-only aggregation — the id lists
    are never collected."""
    assert k % bands == 0
    sig = minhash_signatures(df, id_col, text_col, n=n, k=k)
    banded = _banded(sig, k, bands)
    cap = F.lit(max_bucket if max_bucket is not None else (1 << 62))
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("sz"))
    totals = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("sz") > 1).cast("long")).alias("n_candidate_buckets"),
        F.sum((F.col("sz") > cap).cast("long")).alias("n_dropped_buckets"),
        F.sum(F.when(F.col("sz") > cap, F.col("sz")).otherwise(0)).alias("n_dropped_slots"),
        F.max("sz").alias("max_bucket_size"),
    )
    dropped_docs = (
        banded.join(
            sizes.filter(F.col("sz") > cap).select("band", "bucket"),
            ["band", "bucket"],
            "left_semi",
        )
        .agg(F.countDistinct("id").alias("n_dropped_docs"))
    )
    return totals.join(F.broadcast(dropped_docs))


# -------------------------------------------------------------- dedup clusters
def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iters: int = 20,
    algorithm: str = "labelprop",
) -> DataFrame:
    """Connected components over near-dup candidate pairs → cluster
    assignment: every doc gets ``cluster_id`` = min doc id reachable
    through the pair graph (the canonical representative). This is the
    stage after LSH in a web-scale dedup pipeline: pairs say "these two
    match"; clustering decides which single copy survives.

    Algorithm: iterative min-label propagation — each round every node
    takes the min of its own label and its neighbors' labels (one join
    + one groupBy per round, all map-side combinable). Rounds needed =
    graph diameter; near-dup components are shallow (pairs come from
    shared buckets, so diameter is small). The loop is driver-side but
    each round is fully distributed, and it exits on convergence via a
    single scalar count. At 10^10 nodes with adversarial long chains
    you would switch to the large-star/small-star algorithm (same
    primitive ops, O(log n) rounds guaranteed); the semantics here are
    identical.

    ``pairs``: (id_a, id_b) with id_a < id_b, e.g. from
    ``minhash_lsh_pairs`` (optionally Jaccard-verified first).
    Returns (id, cluster_id, is_canonical).

    ``algorithm="star"`` switches to alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the edge set itself contracts toward per-component stars, giving
    bounded rounds on adversarial diameters where even pointer-jumped
    label propagation pays per-round latency; identical output
    (property-tested on chains and random graphs).
    """
    if algorithm == "star":
        return _cc_star(nodes, pairs, id_col, max_iters)
    if algorithm != "labelprop":
        raise ValueError(f"unknown algorithm {algorithm!r} (labelprop|star)")
    # localCheckpoint per round: an iterative DataFrame program's
    # lineage otherwise deepens every round and Catalyst re-optimizes
    # the whole nested plan at each action — O(rounds²) planning that
    # dwarfs the actual work. Checkpointing pins each round's result
    # and restarts the plan from a leaf (exactly what GraphX/GraphFrames
    # do internally for the same reason).
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    # iterate ONLY over nodes that appear in an edge: a singleton's
    # label never changes, so it never needs to ride the loop — after
    # LSH blocking the paired fraction of a corpus is small, which
    # shrinks every per-round join/shuffle to |edge endpoints|
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .select("id", F.col("id").alias("cluster_id"))
        .localCheckpoint()
    )
    def step(lbls: DataFrame) -> DataFrame:
        # step 1 — neighbor-min: each node takes the min label across
        # its edges (covers one hop of graph distance per step)
        neighbor_min = (
            edges.join(lbls, edges.src == lbls.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        stepped = lbls.join(neighbor_min, "id", "left").select(
            "id",
            F.least(
                F.col("cluster_id"), F.coalesce("nmin", F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # step 2 — pointer jump (path halving): follow the label to ITS
        # label; chains collapse in O(log diameter) steps instead of
        # O(diameter), so a 10^4-long revision chain converges in ~14.
        # The label is always a node id, so the self-join hits.
        jump = stepped.select(
            F.col("id").alias("cluster_id"), F.col("cluster_id").alias("_jump")
        )
        return stepped.join(jump, "cluster_id", "left").select(
            "id",
            F.least(
                F.col("cluster_id"), F.coalesce("_jump", F.col("cluster_id"))
            ).alias("cluster_id"),
        )

    from pyspark.sql import Observation

    for _ in range(max_iters):
        # two propagation steps per checkpointed round: checkpoint
        # materialization dominates round cost at small data, and an
        # extra step past the fixpoint is idempotent — pay it half as
        # often. The convergence count rides the SAME job via observe()
        # (the old separate count-job per round is gone — one Spark job
        # per round total).
        obs = Observation()
        stepped = (
            step(step(labels))
            .withColumnRenamed("cluster_id", "new_cid")
            .join(labels.withColumnRenamed("cluster_id", "old_cid"), "id")
            .select(
                "id",
                F.col("new_cid").alias("cluster_id"),
                (F.col("new_cid") != F.col("old_cid")).cast("int").alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("changed"))
        )
        new_labels = stepped.localCheckpoint()  # eager: fires the observation
        labels = new_labels.select("id", "cluster_id")
        if not obs.get["changed"]:
            break
    # singletons (no edges) re-enter as their own cluster
    out = (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
    )
    return out.withColumn("is_canonical", F.col("id") == F.col("cluster_id"))


def _cc_star(
    nodes: DataFrame, pairs: DataFrame, id_col: str, max_iters: int
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al. 2014): instead of propagating labels over a fixed
    edge set, each round REWRITES the edge set so every node hangs off
    the smallest node it can currently see — components contract to
    stars in O(log² n) rounds regardless of diameter.

    large-star(u): attach every strictly-larger neighbor of u to
    m = min({u} ∪ Γ(u)); small-star(u): attach u and its strictly-
    smaller neighbors to the smallest of them. Both are one groupBy +
    one join over the (symmetrized) edge list — the same distributed
    primitives as label propagation, so the 100-TB story is unchanged;
    what improves is the ROUND BOUND on adversarial chains.
    """
    sym = lambda e: (  # noqa: E731
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    edges = sym(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    ).localCheckpoint()

    def large_star(e: DataFrame) -> DataFrame:
        mins = e.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("u", "mv").alias("m"))
        return (
            e.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        sm = e.filter(F.col("v") < F.col("u"))
        mins = sm.groupBy("u").agg(F.min("v").alias("m"))
        return (
            sm.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins.select("u", F.col("m").alias("v")))
        )

    prev_n = edges.count()
    for _ in range(max_iters):
        new_edges = sym(small_star(large_star(edges))).localCheckpoint()
        n = new_edges.count()
        if n == prev_n and new_edges.exceptAll(edges).isEmpty():
            edges = new_edges
            break
        edges, prev_n = new_edges, n

    # at the fixpoint every component is a star around its min; any
    # remaining round trips are harmless (idempotent), so labels are
    # simply min(self, min neighbor)
    mins = edges.groupBy("u").agg(F.min("v").alias("mv"))
    out = (
        nodes.select(F.col(id_col).alias("id"))
        .join(mins.withColumnRenamed("u", "id"), "id", "left")
        .select(
            "id",
            F.least("id", F.coalesce("mv", F.col("id"))).alias("cluster_id"),
        )
    )
    return out.withColumn("is_canonical", F.col("id") == F.col("cluster_id"))


# ------------------------------------------------------------------- simhash
def simhash64(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per token hash, each bit votes ±1; the
    fingerprint's bit b is 1 iff the vote sum is positive.

    Plan: one explode + one groupBy with ``bits`` conditional-sum
    aggregates (map-side combinable) — near-dup docs land on equal or
    Hamming-close fingerprints. 32 bits keeps the bigint arithmetic
    portable to the DuckDB oracle.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = df.select(F.col(id_col).alias("id"), F.explode(words).alias("tok"))
    toks = toks.withColumn("h", hash60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("id").agg(*votes)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("bigint")).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("id", fp.alias("simhash"))


def fuzzy_contamination(corpus: DataFrame, bench: DataFrame,
                        id_col: str, text_col: str,
                        n: int = 3, k: int = 16, bands: int = 4,
                        jaccard_pct: int = 50) -> DataFrame:
    """Cross-corpus NEAR-duplicate decontamination — the FineWeb-style
    middle path between ``ngram_contamination`` (exact n-gram overlap,
    misses light paraphrase) and semantic contamination (needs
    embeddings): flag corpus documents whose word-shingle Jaccard with
    ANY benchmark document clears ``jaccard_pct`` percent.

    Candidates come from joining the corpus's banded MinHash buckets
    to the BENCHMARK's banded buckets — never corpus x corpus, so the
    Σ|bucket|² blowup of self-LSH does not exist here; the benchmark
    side (eval sets: thousands of docs) is broadcast. Candidates are
    verified with EXACT set Jaccard over the same distinct shingles,
    as an integer percentage ``(100*|A∩B|) div |A∪B|`` (truncating
    div, pinned cross-engine), and each flagged doc reports its
    best-matching benchmark doc (max Jaccard, smallest bench id on
    ties — partition-order-free).

    Returns (id, bench_id, jacc_pct), one row per FLAGGED corpus doc.

    Scale shape: corpus text is scanned twice (signature pass, verify
    pass), both scan-local explodes; the verify join touches only
    candidate docs' shingles, and everything benchmark-sided is a
    broadcast. At 10^10 corpus docs the wide work is one groupBy(id)
    for signatures and one groupBy(id, bench_id) for intersections.

    Reference lineage: the reference gates loads against existing
    item registries by exact id (apps/etl/load checks); this is the
    content-level generalization a training corpus needs.
    """
    assert k % bands == 0
    c_sig = minhash_signatures(corpus, id_col, text_col, n=n, k=k)
    b_sig = minhash_signatures(bench, id_col, text_col, n=n, k=k)
    bb = (_banded(b_sig, k, bands)
          .withColumnRenamed("id", "bench_id"))
    cand = (_banded(c_sig, k, bands)
            .join(F.broadcast(bb), ["band", "bucket"])
            .select("id", "bench_id").distinct())
    sh = lambda df, alias: df.select(  # noqa: E731
        F.col(id_col).alias(alias),
        F.explode(F.array_distinct(word_shingles(text_col, n)))
        .alias("sh"))
    c_sh = sh(corpus, "id")
    b_sh = sh(bench, "bench_id")
    c_sz = c_sh.groupBy("id").agg(F.count(F.lit(1)).alias("_nc"))
    b_sz = b_sh.groupBy("bench_id").agg(F.count(F.lit(1)).alias("_nb"))
    inter = (cand.join(c_sh, "id")
             .join(F.broadcast(b_sh), ["bench_id", "sh"])
             .groupBy("id", "bench_id").agg(F.count(F.lit(1)).alias("_ni")))
    j = (inter.join(c_sz, "id").join(F.broadcast(b_sz), "bench_id")
         .select("id", "bench_id",
                 F.expr("(100 * _ni) div (_nc + _nb - _ni)")
                 .alias("jacc_pct"))
         .where(F.col("jacc_pct") >= F.lit(jaccard_pct)))
    best = F.min(F.struct((-F.col("jacc_pct")).alias("_nj"),
                          F.col("bench_id").alias("_b")))
    return (j.groupBy("id").agg(best.alias("_t"))
            .select("id", F.col("_t")["_b"].alias("bench_id"),
                    (-F.col("_t")["_nj"]).alias("jacc_pct")))
