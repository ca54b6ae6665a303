"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators: brute-force cosine top-k as the
correctness baseline, a label-partitioned (IVF-style coarse-cell)
variant as the scale path, and a random-hyperplane LSH bucketer.

All dot products run JVM-side via ``aggregate(zip_with(...))`` —
no Python in the hot loop. Top-k is a per-query window, which Catalyst
executes as partial top-k (WindowGroupLimit pushes rank<=k below the
shuffle in Spark 3.5+/4.x).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from montandon_etl_spark.operators.util import stable_round6


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _ncol(a) -> F.Column:
    """Accept a column name or an already-built Column (lets callers
    score subspace SLICES without materializing them as columns)."""
    return F.col(a) if isinstance(a, str) else a


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            _ncol(a),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity_col(a: str, b: str) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (few rows) is broadcast; the corpus scan is
    embarrassingly parallel — per-partition score + partial top-k,
    final top-k after a k-row-per-query shuffle. This is the oracle
    baseline the approximate variants are measured against.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col("qvec", "cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", stable_round6("cosine").alias("cosine"), "rank")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's coarse cell.

    ``cell_col`` is the coarse quantizer assignment (here the
    pre-assigned ``label``; at scale: nearest-centroid from a sampled
    k-means). Probing 1 of C cells cuts the scan by ~C×; the cell
    equi-join also makes the search a co-partitioned join instead of a
    broadcast-everything scan.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(cell_col).alias("cell"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col("qvec", "cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "neighbor_id",
                stable_round6("cosine").alias("cosine"), "rank")
    )


def _collect_centroids(embeddings, n_centroids, id_col, vec_col):
    """Head centroids (the n smallest-id vectors) — the degenerate
    quantizer, kept as the ``quantizer="head"`` baseline the k-means
    recall test measures against."""
    return (
        embeddings.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(n_centroids)
        .collect()
    )


def _fold(vals):
    """Strict left fold WITHOUT an initial accumulator (seed = first
    element) — DuckDB ``list_reduce`` semantics; with IEEE doubles this
    matches Spark's ``aggregate(.., 0.0, ..)`` bit-for-bit (0.0 + x == x)."""
    it = iter(vals)
    acc = next(it)
    for x in it:
        acc = acc + x
    return acc


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    sample_size: int = 64,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[dict]:
    """Seeded sampled k-means coarse quantizer (Lloyd's algorithm):
    the realistic IVF training path — train on a deterministic sample,
    assign the corpus scan-locally against the C learned centroids.

    Scale story: ONE small job collects the ``sample_size``
    hash-smallest vectors (data-layout independent — the order key is
    a content hash of the id, not partition order), Lloyd runs on the
    driver over S rows of quantizer METADATA (S×dim doubles, a few KB),
    and the corpus-side assignment stays a scan-local argmax over C
    compiled-in literals — identical plan shape to the head quantizer,
    zero extra distributed work at any corpus size.

    Determinism contract (cross-engine checkable): sample = smallest
    ``hash60(id)``; init = first C sample vectors; assignment argmax
    breaks ties toward the smaller centroid id; means are strict folds
    in sample order divided by member count; empty cells keep their
    previous centroid. Every float op is IEEE double in a pinned order,
    so a SQL oracle (DuckDB list_reduce folds) reproduces the centroids
    bit-for-bit — the same trick the hyperplane-LSH oracle uses.
    """
    sample = collect_kmeans_sample(embeddings, sample_size, id_col, vec_col)
    return lloyd_centroids(sample, n_centroids, n_iters)


def collect_kmeans_sample(
    embeddings: DataFrame,
    sample_size: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """ONE bounded job: the ``sample_size`` hash-smallest full vectors
    in (hash60(id), id) order — the shared training sample for every
    quantizer over the same corpus. Because the order key is a content
    hash of the ID (never the vector), the sampled ROW SET is identical
    whether the caller later trains on full vectors or on subspace
    slices — so a single collect feeds the coarse quantizer and all M
    PQ codebooks bit-identically to per-quantizer collects."""
    from montandon_etl_spark.operators.dedup import hash60

    rows = (
        embeddings.select(
            hash60(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col).alias("i"),
            F.col(vec_col).alias("v"),
        )
        .orderBy("h", "i")
        .limit(sample_size)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def lloyd_centroids(
    sample: list[list[float]], n_centroids: int = 8, n_iters: int = 2
) -> list[dict]:
    """Driver-side Lloyd over an already-collected sample (quantizer
    METADATA, a few KB) — the deterministic core of
    ``kmeans_centroids``, factored out so multi-quantizer trainings
    (IVF-PQ: 1 coarse + M subspace codebooks) reuse one sample collect
    instead of paying one full-table job each."""
    import math

    if not sample:
        return []

    def cos(v: list[float], c: list[float]) -> float:
        dot = _fold(a * b for a, b in zip(v, c))
        return dot / (
            math.sqrt(_fold(x * x for x in c)) * math.sqrt(_fold(x * x for x in v))
        )

    cents = [list(v) for v in sample[:n_centroids]]
    for _ in range(n_iters):
        groups: list[list[list[float]]] = [[] for _ in cents]
        for v in sample:  # sample order = (hash60, id) — the fold order
            best, best_s = 0, None
            for ci, c in enumerate(cents):
                s = cos(v, c)
                if best_s is None or s > best_s:  # tie keeps smaller cid
                    best, best_s = ci, s
            groups[best].append(v)
        cents = [
            [_fold(m[d] for m in g) / len(g) for d in range(len(g[0]))]
            if g
            else cents[ci]
            for ci, g in enumerate(groups)
        ]
    return [{"cid": i, "cvec": c} for i, c in enumerate(cents)]


def _quantizer_centroids(embeddings, quantizer, n_centroids, id_col, vec_col):
    if quantizer == "kmeans":
        return kmeans_centroids(
            embeddings, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    if quantizer == "head":
        return _collect_centroids(embeddings, n_centroids, id_col, vec_col)
    raise ValueError(f"unknown quantizer {quantizer!r} (use 'kmeans' or 'head')")


def _fsql(x: float) -> str:
    """An exact double literal for generated SQL: ``repr`` round-trips
    the double through the shortest decimal string, and STRING→DOUBLE
    casting parses it back to the identical bits."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _cell_score_sql(cents, vc_sql: str) -> list[str]:
    """SQL-text twin of ``_cell_score_entries`` — same ops in the same
    order (zip_with fold dot, strict-fold norm, nrm*norm then divide),
    emitted as ONE parseable string per centroid instead of ~25 py4j
    round trips: building the M=8×K=16 ADC trees through the Column
    API cost ~7 s of pure driver time PER CALL (measured sf0.1), which
    dominated every incremental-index batch."""
    import math

    out = []
    for c in cents:
        vec = [float(x) for x in c["cvec"]]
        nrm = math.sqrt(sum(x * x for x in vec))
        lit = "array(" + ", ".join(_fsql(x) for x in vec) + ")"
        dot = (
            f"aggregate(zip_with({vc_sql}, {lit},"
            " (a, b) -> CAST(a AS DOUBLE) * b),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        norm = (
            f"sqrt(aggregate({vc_sql}, CAST(0.0 AS DOUBLE),"
            " (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
        )
        cos = f"{dot} / ({_fsql(nrm)} * {norm})"
        out.append(
            f"named_struct('cos', {cos}, 'ncid', {-int(c['cid'])})")
    return out


def _cell_score_entries(cents, vc) -> list:
    """Per-centroid (cosine, -cid) structs as scan-local expressions:
    fold-ordered dot products (bit-identical to a strict-fold SQL
    oracle), centroid vector + norm compiled in as literals. Struct
    comparison orders by cosine first, then -cid — ties go to the
    SMALLEST centroid id. Shared by every IVF variant so tie-break and
    fold-order fixes propagate everywhere at once. ``vc`` may be a
    column name or a Column (e.g. a subspace slice)."""
    import math

    col = _ncol(vc)
    entries = []
    for c in cents:
        vec = [float(x) for x in c["cvec"]]
        nrm = math.sqrt(sum(x * x for x in vec))
        lit = F.array(*[F.lit(x) for x in vec])
        dot = F.aggregate(
            F.zip_with(col, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        cos = dot / (F.lit(nrm) * _norm(col))
        entries.append(F.struct(cos.alias("cos"), F.lit(-int(c["cid"])).alias("ncid")))
    return entries


def _top_cells(cents, vc, n: int) -> F.Column:
    """The n nearest cell ids, best first — sort the (cos, -cid)
    structs descending inside the scan, no shuffle. ``vc`` may be a
    column name / SQL vector expression (fast path: the whole tree is
    ONE parsed F.expr) or a Column (py4j-built fallback, same tree)."""
    if isinstance(vc, str):
        entries = ", ".join(_cell_score_sql(cents, vc))
        return F.expr(
            f"transform(slice(sort_array(array({entries}), false),"
            f" 1, {int(n)}), s -> -s.ncid)"
        )
    arr = F.sort_array(F.array(*_cell_score_entries(cents, vc)), asc=False)
    return F.transform(F.slice(arr, 1, n), lambda s: -s["ncid"])


def cosine_topk_ivf_computed(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "kmeans",
) -> DataFrame:
    """IVF where the coarse cells are COMPUTED from the data: cell =
    nearest centroid by cosine (the single-probe case of
    ``cosine_topk_ivf_multiprobe``, kept as its own entry point because
    it also REPORTS the cell column). No pre-assigned label column —
    the realistic 100-TB setting. Centroids come from a seeded sampled
    k-means by default (``quantizer="head"`` keeps the old first-C
    baseline); cell assignment is a scan-local argmax over C centroid
    literals (zero extra shuffle); the probe is a co-partitioned cell
    equi-join."""
    cents = _quantizer_centroids(embeddings, quantizer, n_centroids, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).withColumn("cell", _top_cells(cents, "qvec", 1)[0])
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("cell", _top_cells(cents, "cvec", 1)[0])
    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col("qvec", "cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "neighbor_id",
                stable_round6("cosine").alias("cosine"), "rank")
    )


def cosine_topk_ivf_multiprobe(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "kmeans",
) -> DataFrame:
    """Multi-probe IVF: each query probes its ``nprobe`` nearest cells
    instead of one — the recall/cost dial of IVF search (recall lost to
    a query sitting near a cell boundary is recovered by probing the
    neighbor cell; scan cost grows by nprobe/C, not |corpus|).

    Corpus vectors keep exactly one cell (their nearest centroid, same
    assignment as ``cosine_topk_ivf_computed`` — both share the same
    centroid/score helpers); only the query side fans out, so the join
    stays a small-side broadcast against the cell-partitioned corpus.
    """
    cents = _quantizer_centroids(embeddings, quantizer, n_centroids, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    ).select(
        "query_id", "qvec", F.explode(_top_cells(cents, "qvec", nprobe)).alias("cell")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    ).withColumn("cell", _top_cells(cents, "cvec", 1)[0])
    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_similarity_col("qvec", "cvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                stable_round6("cosine").alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine >= threshold, id_a < id_b.

    ``block_col`` restricts comparisons to the same block (coarse cell
    / domain) — the standard way to keep the pair join from going
    O(N²); at web scale you'd block by ``lsh_hyperplane_buckets``
    instead. Dot products are JVM-side zip_with aggregates.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, (["blk"] if block_col else []) or None) if block_col else a.crossJoin(b)
    joined = joined.filter(cond)
    cos = cosine_similarity_col("va", "vb")
    out = joined.withColumn("cosine", cos).filter(F.col("cosine") >= threshold)
    cols = ["id_a", "id_b", stable_round6("cosine").alias("cosine")]
    return out.select(*cols)


def hyperplane_planes(
    n_planes: int = 8, dim: int = 64, seed: int = 42
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via a tiny LCG (seeded,
    no wall-clock) — the SAME plane literals can be inlined into an
    external SQL oracle, so the bucketing is cross-engine checkable."""
    def lcg(s: int):
        while True:
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            yield (s >> 11) / float(1 << 53) - 0.5

    g = lcg(seed)
    return [[next(g) for _ in range(dim)] for _ in range(n_planes)]


def hyperplane_bucket_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Bucket = sign-bit string of dot products with fixed hyperplanes,
    as a pure column expression (JVM-side zip_with/aggregate): usable
    inline as a blocking key — no join against a bucket side-table."""
    bits = []
    for p in planes:
        plane_lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane_lit,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket assignment per vector. Vectors in
    the same bucket are ANN candidates; bucket join replaces all-pairs.
    Hyperplanes are deterministic literals compiled into the plan — no
    side-channel state on executors."""
    planes = hyperplane_planes(n_planes, dim, seed)
    return embeddings.select(
        F.col(id_col).alias("id"),
        hyperplane_bucket_expr(vec_col, planes).alias("bucket"),
    )


def embedding_near_dup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs blocked by random-hyperplane LSH bucket
    — the production-scale path: the blocking key is derived from the
    vector itself (no label/domain column needed), computed inline in
    the scan (zero extra join/shuffle to attach it), and the pair join
    cost drops from Σ|block|² over data-defined blocks to Σ|bucket|²
    over 2^n_planes sign buckets. Standard LSH recall caveat applies:
    only same-bucket pairs are compared (near-dups with cosine just
    over the threshold can straddle a hyperplane); raise recall by
    unioning over several seeds."""
    planes = hyperplane_planes(n_planes, dim, seed)
    withb = embeddings.withColumn("_lsh_bucket", hyperplane_bucket_expr(vec_col, planes))
    return embedding_near_dup_pairs(
        withb, threshold=threshold, id_col=id_col, vec_col=vec_col,
        block_col="_lsh_bucket",
    )


# ------------------------------------------------------ product quantization
def pq_codebooks(embeddings: DataFrame, dim: int, m_subspaces: int = 4,
                 n_codewords: int = 8, sample_size: int = 64,
                 n_iters: int = 2, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 sample: list[list[float]] | None = None) -> list[list[dict]]:
    """Per-subspace codebooks for product quantization: the vector is
    split into ``m_subspaces`` contiguous slices and each slice gets
    its own seeded sampled (spherical) k-means — exactly the
    ``kmeans_centroids`` determinism contract, M times, so a SQL
    oracle reproduces every codebook bit-for-bit. Returns
    books[m] = [{cid, cvec}, ...].

    All M trainings share ONE sample collect (the row set is selected
    by hash60(id), independent of the slice — see
    ``collect_kmeans_sample``), then Lloyd runs per subspace on
    driver-side slices: bit-identical to per-subspace collects, minus
    M-1 full-table jobs. Pass ``sample`` (a ``collect_kmeans_sample``
    result over the same corpus/params) to also share the coarse
    quantizer's collect."""
    if dim % m_subspaces:
        raise ValueError("dim must divide evenly into subspaces")
    d = dim // m_subspaces
    if sample is None:
        sample = collect_kmeans_sample(embeddings, sample_size, id_col, vec_col)
    return [
        lloyd_centroids(
            [v[m * d:(m + 1) * d] for v in sample], n_codewords, n_iters)
        for m in range(m_subspaces)
    ]


def ivfpq_quantizers(embeddings: DataFrame, dim: int, n_centroids: int = 8,
                     m_subspaces: int = 4, n_codewords: int = 8,
                     sample_size: int = 64, n_iters: int = 2,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """(coarse centroids, PQ codebooks) for IVF-PQ from ONE sample
    collect — 1 bounded job instead of 1 + M. Returns
    ``(cents, books)`` exactly as ``kmeans_centroids`` /
    ``pq_codebooks`` would produce them separately."""
    sample = collect_kmeans_sample(embeddings, sample_size, id_col, vec_col)
    cents = lloyd_centroids(sample, n_centroids, n_iters)
    books = pq_codebooks(embeddings, dim, m_subspaces, n_codewords,
                         sample_size, n_iters, id_col, vec_col, sample=sample)
    return cents, books


def cosine_topk_pq(embeddings: DataFrame, queries: DataFrame, dim: int,
                   k: int = 5, m_subspaces: int = 4, n_codewords: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   qid_col: str = "query_id", qvec_col: str = "qvec",
                   sample_size: int = 64, n_iters: int = 2) -> DataFrame:
    """Top-k by PQ-approximated cosine — the memory story of ANN at
    100 TB: each corpus vector compresses to M codeword ids (M bytes
    at K ≤ 256 vs dim×4 raw — 64× here), and scoring reads ONLY the
    codes plus the M×K codebook literals compiled into the plan.

    Asymmetric distance computation: the query stays exact; a
    candidate is scored as cos(q, x̂) where x̂ is the concatenation of
    its codewords — numerator and the candidate norm are per-subspace
    strict folds combined in fixed subspace order, so the approximated
    score (not just the ranking) is engine-exact and a SQL oracle
    matches it to the last rounded digit.

    Fidelity envelope (honest numbers on the synthetic fixture, whose
    vectors are near-isotropic — exact-cosine IQR ≈ 0.16, the hardest
    regime for PQ): M=8/K=16 gives corr(exact, approx) ≈ 0.6 and
    recall@5 ≈ 0.2 vs brute force; on real embeddings with cluster
    structure (and production-sized K=256 codebooks) PQ recall is far
    higher — the determinism contract, not the recall at toy K, is
    what this operator pins. Encoding is a scan-local
    argmax per subspace against codeword literals (zero shuffle);
    scoring is a broadcast of the query rows; the only shuffle is the
    final per-query top-k. Returns (query_id, neighbor_id, pq_cosine,
    rank); ranks tie-break on neighbor id."""
    from montandon_etl_spark.operators.util import stable_round6

    books = pq_codebooks(embeddings, dim, m_subspaces, n_codewords,
                         sample_size, n_iters, id_col, vec_col)
    enc = _pq_encode(embeddings, books, dim, id_col, vec_col)
    q = queries.select(F.col(qid_col).alias("query_id"),
                       F.col(qvec_col).alias("qvec"))
    scored = enc.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    return _pq_rank(scored, books, dim, k)


def _pq_encode(embeddings: DataFrame, books, dim: int,
               id_col: str, vec_col: str) -> DataFrame:
    """(neighbor_id, _c0.._c{M-1}): scan-local per-subspace argmax
    against the codeword literals — the PQ code columns."""
    m_subspaces = len(books)
    d = dim // m_subspaces
    # single select (no withColumn loop — each withColumn re-analyzes
    # a deeper projection; at M=8 the ADC trees made plan compile a
    # visible wall)
    return embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        *[
            F.element_at(
                _top_cells(books[m], f"slice({vec_col}, {m * d + 1}, {d})", 1),
                1,
            ).alias(f"_c{m}")
            for m in range(m_subspaces)
        ],
    )


def _pq_rank(scored: DataFrame, books, dim: int, k: int) -> DataFrame:
    """ADC scoring + per-query top-k over (query_id, qvec, neighbor_id,
    _c0..): per-subspace strict folds combined in fixed order."""
    from montandon_etl_spark.operators.util import stable_round6

    m_subspaces = len(books)
    d = dim // m_subspaces
    num = None
    norm2 = None
    # codeword lookup + query slice stay inline expressions (no
    # withColumn loop — 2 columns × M re-analyses made plan compile a
    # visible wall at M=8); float ops and their order are unchanged
    for m in range(m_subspaces):
        cw = F.element_at(
            F.lit([[float(x) for x in c["cvec"]] for c in books[m]]),
            F.col(f"_c{m}") + 1)
        qm = F.slice(F.col("qvec"), m * d + 1, d)
        dm = F.aggregate(
            F.zip_with(qm, cw, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        nm = F.aggregate(
            cw, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
        num = dm if num is None else (num + dm)
        norm2 = nm if norm2 is None else (norm2 + nm)
    score = num / (_norm("qvec") * F.sqrt(norm2))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_pq"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_pq", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                stable_round6("_pq").alias("pq_cosine"), "rank")
    )


def cosine_topk_ivfpq(embeddings: DataFrame, queries: DataFrame, dim: int,
                      k: int = 5, n_centroids: int = 8, nprobe: int = 2,
                      m_subspaces: int = 8, n_codewords: int = 16,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      qid_col: str = "query_id", qvec_col: str = "qvec",
                      sample_size: int = 64, n_iters: int = 2) -> DataFrame:
    """IVF-PQ — the production vector-search composition (FAISS's
    default at scale): a coarse k-means quantizer PRUNES candidates to
    the query's ``nprobe`` cells, and product-quantization codes SCORE
    them — so the scan touches ~nprobe/C of the corpus and reads only
    M code bytes per candidate instead of the raw vector. Cell
    assignment and PQ encoding are both scan-local argmaxes against
    literals; the probe is a co-partitioned cell equi-join; scoring is
    the same engine-exact ADC as ``cosine_topk_pq``. Both quantizers
    follow the seeded sampled k-means contract, so a SQL oracle
    reproduces cells, codes, and scores exactly."""
    cents, books = ivfpq_quantizers(
        embeddings, dim, n_centroids, m_subspaces, n_codewords,
        sample_size, n_iters, id_col, vec_col)
    d = dim // m_subspaces
    enc = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(_top_cells(cents, vec_col, 1), 1).alias("cell"),
        *[
            F.element_at(
                _top_cells(books[m], f"slice({vec_col}, {m * d + 1}, {d})", 1),
                1,
            ).alias(f"_c{m}")
            for m in range(m_subspaces)
        ],
    )
    q = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(qvec_col).alias("qvec"),
        F.explode(_top_cells(cents, qvec_col, nprobe)).alias("cell"),
    )
    scored = enc.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id"))
    return _pq_rank(scored, books, dim, k)


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    centroid_source: DataFrame | None = None,
    sample_size: int = 64,
    n_iters: int = 2,
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag every corpus
    vector whose cosine to SOME benchmark/eval vector reaches
    ``threshold`` — the semantic leak the n-gram and minhash
    decontamination gates cannot see (a paraphrased eval question
    shares no 8-gram with its source).

    Returns one row per corpus vector:
    ``(id, cell, contaminated, max_bench_sim, n_bench_hits,
    nearest_bench_id)`` — ``max_bench_sim`` micro-snapped,
    ``nearest_bench_id`` the smallest benchmark id achieving it
    (NULLs / 0 when no benchmark vector shares a probe cell).

    100-TB shape: the seeded k-means quantizer blocks the comparison —
    corpus rows take their top-1 cell scan-locally, benchmark rows
    (small by nature: eval sets are 10³–10⁵ rows) probe their
    ``nprobe`` nearest cells and BROADCAST, so the corpus never
    shuffles and per-row work is |bench ∩ probe cells|, not |bench|.
    Recall dial is IVF's: a contaminated pair is missed only when the
    corpus row's cell is outside the benchmark row's nprobe nearest —
    ``nprobe=n_centroids`` makes the gate exhaustive. Determinism:
    the shared seeded-k-means + strict-fold cosine contracts, so a
    SQL oracle replays cells, similarities, flags, and tie-broken
    nearest ids exactly."""
    bid = bench_id_col or id_col
    base = centroid_source if centroid_source is not None else \
        corpus.select(F.col(id_col), F.col(vec_col)).unionByName(
            benchmark.select(F.col(bid).alias(id_col), F.col(vec_col)))
    cents = kmeans_centroids(base, n_centroids=n_centroids,
                             sample_size=sample_size, n_iters=n_iters,
                             id_col=id_col, vec_col=vec_col)
    cor = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.element_at(_top_cells(cents, vec_col, 1), 1).alias("cell"))
    ben = benchmark.select(
        F.col(bid).alias("bid"), F.col(vec_col).alias("vb"),
        F.explode(_top_cells(cents, vec_col, nprobe)).alias("cell"))
    pairs = (cor.join(F.broadcast(ben), "cell")
             .withColumn("cos", cosine_similarity_col("v", "vb")))
    stats = pairs.groupBy("id").agg(
        F.max("cos").alias("_mx"),
        F.sum(F.when(F.col("cos") >= F.lit(threshold), 1).otherwise(0))
        .alias("n_bench_hits"))
    near = (pairs.join(stats.select("id", "_mx"), "id")
            .filter(F.col("cos") == F.col("_mx"))
            .groupBy("id").agg(F.min("bid").alias("nearest_bench_id")))
    return (cor.select("id", "cell")
            .join(stats, "id", "left").join(near, "id", "left")
            .select(
                F.col("id").alias(id_col), "cell",
                F.coalesce(F.col("_mx") >= F.lit(threshold), F.lit(False))
                .alias("contaminated"),
                stable_round6(F.col("_mx")).alias("max_bench_sim"),
                F.coalesce(F.col("n_bench_hits"), F.lit(0))
                .alias("n_bench_hits"),
                "nearest_bench_id"))


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 64,
    n_iters: int = 2,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the seeded
    sampled k-means quantizer, then compare pairs ONLY within a
    cluster and drop every item that has a semantically-near
    lower-id neighbor there. The rule is the paper's one-pass
    variant: x drops iff SOME lower-id same-cluster item has
    cosine >= threshold — regardless of whether that item itself
    dropped — so the decision is a single scan with no iteration,
    and lowest-id is the deterministic survivor of every
    near-duplicate chain.

    Returns (id, cell, keep, max_dup_sim): ``max_dup_sim`` is the
    highest cosine to any lower-id same-cell item (NULL when none).

    100-TB shape: cell assignment is a scan-local argmax against
    centroid literals; the pair comparison is a self-join on the
    cell key — Σ|cell|² work instead of N², exactly the role the
    coarse quantizer plays in the paper; the per-id reduction is one
    groupBy. All determinism contracts (seeded k-means, strict-fold
    dot products, round-half-up) are shared with the IVF family, so
    a SQL oracle reproduces cells, similarities, and the kept set
    exactly."""
    cents = kmeans_centroids(embeddings, n_centroids=n_centroids,
                             sample_size=sample_size, n_iters=n_iters,
                             id_col=id_col, vec_col=vec_col)
    assigned = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.element_at(_top_cells(cents, vec_col, 1), 1).alias("cell"),
    )
    return semdedup_keep(assigned, threshold).select(
        F.col("id").alias(id_col), "cell", "keep", "max_dup_sim")


def semdedup_keep(assigned: DataFrame, threshold: float) -> DataFrame:
    """The SemDeDup one-pass keep rule over assigned rows
    ``(id, v, cell)`` → ``(id, v, cell, keep, max_dup_sim)``: an id
    drops iff SOME lower-id same-cell row has cosine >= threshold.
    Applied to the FULL corpus by ``semantic_dedup`` and, because the
    rule is a pure function of a cell's membership, applied per
    TOUCHED CELL by the incremental ``SemDedupIndex`` — both produce
    identical rows for identical membership."""
    lower = assigned.select(F.col("id").alias("id_b"),
                            F.col("v").alias("vb"), "cell")
    pairs = (
        assigned.join(lower, "cell")
        .filter(F.col("id_b") < F.col("id"))
        .withColumn("cos", cosine_similarity_col("v", "vb"))
    )
    best = pairs.groupBy("id").agg(F.max("cos").alias("_maxsim"))
    return (
        assigned.join(best, "id", "left")
        .select(
            "id", "v", "cell",
            (F.coalesce(F.col("_maxsim"), F.lit(-1.0))
             < F.lit(threshold)).alias("keep"),
            stable_round6("_maxsim").alias("max_dup_sim"),
        )
    )


def cosine_topk_pq_rerank(embeddings: DataFrame, queries: DataFrame,
                          dim: int, k: int = 5, shortlist: int = 20,
                          n_centroids: int = 8, nprobe: int = 2,
                          m_subspaces: int = 8, n_codewords: int = 16,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          qid_col: str = "query_id",
                          qvec_col: str = "qvec") -> DataFrame:
    """Two-stage retrieval — the production shape of PQ search:
    stage 1 shortlists ``shortlist`` candidates per query with the
    compressed IVF-PQ ADC scan (touches ~nprobe/C of the corpus, M
    code bytes per candidate), stage 2 re-scores ONLY the shortlist
    against the raw vectors (exact cosine) and emits the true top-k
    of the shortlist. The expensive full-precision read is a
    broadcast semi-join of |queries|·shortlist ids — never a second
    corpus-wide score. Ranks/scores are engine-exact (stable 1e-6
    rounding), so the composed SQL oracle reproduces both stages."""
    cand = cosine_topk_ivfpq(
        embeddings, queries, dim, k=shortlist, n_centroids=n_centroids,
        nprobe=nprobe, m_subspaces=m_subspaces, n_codewords=n_codewords,
        id_col=id_col, vec_col=vec_col, qid_col=qid_col,
        qvec_col=qvec_col)
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cvec"))
    q = queries.select(F.col(qid_col).alias("query_id"),
                       F.col(qvec_col).alias("qvec"))
    exact = (c.join(F.broadcast(cand.select("query_id", "neighbor_id")),
                    "neighbor_id")
             .join(F.broadcast(q), "query_id")
             .withColumn("cosine", cosine_similarity_col("qvec", "cvec")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("neighbor_id"))
    return (exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    stable_round6("cosine").alias("cosine"), "rank"))
