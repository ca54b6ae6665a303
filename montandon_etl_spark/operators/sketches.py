"""Cardinality sketches that stay deterministic across engines.

The engine-builtin ``approx_count_distinct`` (HyperLogLog) answers
the distinct question but its estimate depends on the engine's hash
and register layout — it can never be oracle-checked. This module
ships two deterministic alternatives: a K-minimum-values sketch, and
a from-scratch HyperLogLog (``hll_*``) built on the repo's portable
md5-prefix hash with EXACT integer register math (the harmonic-mean
denominator Σ 2^(−M_j) is a dyadic rational, summed as BIGINT
``Σ 2^(Kmax−M_j)`` — order-independent and bit-identical across
engines). The K-minimum-values sketch: hash every value to (0, 2^60) with the
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


# --------------------------------------------------------------- Bloom filter
# 60-bit words so every shift stays in positive BIGINT territory in
# BOTH engines (1 << 63 is sign-trouble on the JVM and out-of-range in
# DuckDB's checked arithmetic)
_BLOOM_WORD = 60
# F.shiftleft takes a PYTHON int for the shift, so a column-valued bit
# index goes through this power-of-two lookup table instead
_POW2 = [1 << b for b in range(_BLOOM_WORD)]


def _bit_mask(bit: F.Column) -> F.Column:
    return F.element_at(F.lit(_POW2), bit + 1)


def _bloom_positions(value_col: str, m_bits: int,
                     n_hashes: int) -> list[F.Column]:
    """Kirsch–Mitzenmacher double hashing: pos_i = (h1 + i·h2) mod m
    from TWO md5-prefix hashes instead of one per hash function — the
    md5 is the probe's dominant cost and this halves it (to 2) for any
    n_hashes, with the classic result that the FP rate is preserved.
    Pure int64 (h1 + i·h2 < 2^60 + n·2^60 stays far from overflow for
    the practical n), so the layout is engine-portable like before."""
    v = F.col(value_col).cast("string")
    h1 = hash60(F.concat(v, F.lit("#a")))
    h2 = hash60(F.concat(v, F.lit("#b")))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
            for i in range(n_hashes)]


def bloom_build(df: DataFrame, value_col: str, m_bits: int,
                n_hashes: int) -> DataFrame:
    """Build a Bloom filter over a column as (word_idx, bits) rows —
    sparse 60-bit words, only words with at least one set bit appear.

    Every bit position is a pure function of the value (the portable
    md5-prefix hash, salted per hash function), so the SAME rows give
    a bit-identical filter on Spark and DuckDB — a Bloom filter an
    oracle can verify, unlike engine-internal ones.

    100 TB shape: the filter of a benchmark/blocklist set is a few MB
    of (word, bits) rows — BROADCAST it and probe the corpus scan-side
    (see ``bloom_probe``) instead of broadcasting the exact member
    set; build is explode → groupBy(word) bit_or, map-side
    combinable. Mergeable: union = bit_or of word rows."""
    return (
        df.select(F.explode(F.array(
            *_bloom_positions(value_col, m_bits, n_hashes))).alias("pos"))
        .select(
            (F.col("pos") / _BLOOM_WORD).cast("bigint").alias("word_idx"),
            F.pmod(F.col("pos"), F.lit(_BLOOM_WORD)).cast("int").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or(_bit_mask(F.col("bit"))).alias("bits"))
    )


def bloom_probe(df: DataFrame, id_col: str, value_col: str,
                bloom: DataFrame, m_bits: int, n_hashes: int) -> DataFrame:
    """Membership probe: (id, value, maybe_member). ``maybe_member``
    is true iff EVERY hash position's bit is set (false positives at
    the filter's rate — deterministic ones, since the bit math is
    portable; false negatives never). The filter side broadcasts; the
    probe side never shuffles before the per-row verdict."""
    probes = df.select(
        F.col(id_col), F.col(value_col),
        F.explode(F.array(
            *_bloom_positions(value_col, m_bits, n_hashes))).alias("pos"),
    ).select(
        id_col, value_col,
        (F.col("pos") / _BLOOM_WORD).cast("bigint").alias("word_idx"),
        _bit_mask(F.pmod(F.col("pos"), F.lit(_BLOOM_WORD)).cast("int"))
        .alias("mask"),
    )
    joined = probes.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
           == F.col("mask"))
    return (
        joined.groupBy(id_col, value_col)
        .agg(F.min(hit.cast("int")).alias("_all"))
        .select(id_col, value_col, (F.col("_all") == 1).alias("maybe_member"))
    )


def bloom_dense(bloom: DataFrame, m_bits: int) -> list[int]:
    """Collect a sparse (word_idx, bits) filter into the dense word
    list. Driver-side size is the FILTER size (m_bits/60 bigints —
    exactly what would broadcast anyway), bounded by configuration,
    never by data."""
    n_words = (m_bits + _BLOOM_WORD - 1) // _BLOOM_WORD
    got = {r["word_idx"]: r["bits"] for r in bloom.collect()}
    return [got.get(i, 0) for i in range(n_words)]


def bloom_member_col(value_col: str, words: list[int], m_bits: int,
                     n_hashes: int) -> F.Column:
    """Scan-local membership predicate against a dense filter compiled
    into the plan as an array literal: n_hashes element_at lookups +
    mask tests per row, fully inside whole-stage codegen — no join, no
    shuffle, the shape a 100-TB decontamination scan wants."""
    arr = F.lit(words)
    cond = None
    for pos in _bloom_positions(value_col, m_bits, n_hashes):
        word = F.element_at(arr, (pos / _BLOOM_WORD).cast("int") + 1)
        mask = _bit_mask(F.pmod(pos, F.lit(_BLOOM_WORD)).cast("int"))
        c = word.bitwiseAND(mask) == mask
        cond = c if cond is None else (cond & c)
    return cond


def bloom_contamination(corpus: DataFrame, id_col: str, text_col: str,
                        benchmark: DataFrame, n: int = 5,
                        m_bits: int = 1 << 18,
                        n_hashes: int = 4) -> DataFrame:
    """``dedup.ngram_contamination`` with the benchmark side compressed
    to a Bloom filter — the 100-TB variant: the broadcast shrinks from
    the full n-gram set to m_bits/8 bytes at a deterministic (and
    oracle-checkable) false-positive rate. The filter compiles into
    the corpus scan as a literal (``bloom_member_col``), so the plan
    is scan → explode → scan-local bit tests → one per-doc count —
    the only shuffle is the final doc aggregate. Returns per corpus
    doc: (id, n_hits, contaminated≥1) counting DISTINCT n-grams whose
    probe answers maybe-member."""
    from montandon_etl_spark.operators.dedup import word_shingles

    bg = (benchmark.select(
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g"))
        .distinct())
    words = bloom_dense(bloom_build(bg, "g", m_bits, n_hashes), m_bits)
    dg = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("g"))
    hit = bloom_member_col("g", words, m_bits, n_hashes)
    return (
        dg.groupBy(id_col)
        .agg(F.sum(hit.cast("int")).cast("bigint").alias("n_hits"))
        .select(id_col, "n_hits", (F.col("n_hits") >= 1).alias("contaminated"))
    )


# ------------------------------------------------------------- count-min ----
def countmin_build(df: DataFrame, value_col: str, depth: int = 4,
                   width: int = 256) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over a column,
    as sparse counter rows (j, pos, cnt) — row j's counter at
    pos = (h1 + j·h2) mod width, Kirsch–Mitzenmacher double hashing
    like the Bloom filter above (two md5s per value total).

    The frequency-estimation dual of ``bloom_build``: depth×width
    integers summarize the full frequency table; estimates only ever
    OVER-count (by ≤ εN with ε=e/width at δ=e^-depth confidence).
    Mergeable: union of streams = SUM of matching (j, pos) counters —
    the property that lets 1000 executors sketch partitions
    independently and a tiny reduce combine them.

    100 TB shape: build is one partial-agged groupBy over
    depth × n_rows narrow pairs; the sketch (depth·width rows,
    config-bounded, never data-bounded) then BROADCASTS to whatever
    probes it — heavy-hitter screening without shuffling the corpus
    (exact top-k by groupBy pays a full shuffle of the key universe;
    the sketch is the pre-filter that makes that affordable)."""
    pos = _bloom_positions(value_col, width, depth)
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), p.alias("pos"))
        for j, p in enumerate(pos)
    ])).alias("x")).select("x.j", "x.pos")
    return (pairs.groupBy("j", "pos")
            .agg(F.count("*").cast("bigint").alias("cnt")))


def countmin_estimate(items: DataFrame, value_col: str, sketch: DataFrame,
                      depth: int = 4, width: int = 256) -> DataFrame:
    """Point-query the sketch for each item: est = min over rows j of
    counter[(j, pos_j(item))], absent counters read 0. The sketch side
    broadcasts; items never shuffle before their verdict (the final
    per-item min is keyed by the item itself, map-side combinable)."""
    pos = _bloom_positions(value_col, width, depth)
    probes = items.select(F.col(value_col), F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), p.alias("pos"))
        for j, p in enumerate(pos)
    ])).alias("x")).select(value_col, "x.j", "x.pos")
    joined = probes.join(F.broadcast(sketch), ["j", "pos"], "left")
    return (joined.groupBy(value_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")))


# --------------------------------------------------------------------- HLL
def _hll_dims(p: int) -> tuple[int, int, float]:
    """(m, Kmax, alpha_m) for precision ``p``. Register ranks are
    1..Kmax over the 60-bit portable hash; p is bounded so the exact
    BIGINT denominator Σ 2^(Kmax−M_j) ≤ m·2^Kmax = 2^61 never
    overflows."""
    if not 4 <= p <= 16:
        raise ValueError("hll: p must be in [4, 16]")
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    return m, 61 - p, alpha


def _gcols(group_col: str | list[str]) -> list[str]:
    return [group_col] if isinstance(group_col, str) else list(group_col)


def hll_registers(df: DataFrame, group_col: str | list[str], value_col: str,
                  p: int = 6) -> DataFrame:
    """Per-group HLL register table ``(group..., j, mj)`` — the
    mergeable sketch state (union = groupBy(group, j).max(mj); see
    ``hll_merge``). Register index is the hash's low p bits
    (``h % m``), the rank is leading-zeros+1 of the remaining
    ``Kmax−1`` bits, computed EXACTLY via the binary-string length
    (``bin``) both engines share — no float log anywhere. NULL values
    are ignored, as in every distinct count. ``group_col`` may be a
    list for composite groups (the incremental view uses this)."""
    m, kmax, _ = _hll_dims(p)
    gs = _gcols(group_col)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *[F.col(g) for g in gs],
            hash60(F.col(value_col).cast("string")).alias("h"),
        )
        .select(
            *gs,
            F.pmod(F.col("h"), F.lit(m)).cast("int").alias("j"),
            F.expr(f"h div {m}").alias("w"),
        )
        .groupBy(*gs, "j")
        .agg(F.max(
            F.when(F.col("w") == 0, F.lit(kmax))
            .otherwise(F.lit(kmax) - F.length(F.bin(F.col("w"))))
        ).cast("int").alias("mj"))
    )


def hll_merge(a: DataFrame, b: DataFrame,
              group_col: str | list[str]) -> DataFrame:
    """Sketch of the union of the two sketches' underlying sets."""
    return (a.unionByName(b).groupBy(*_gcols(group_col), "j")
            .agg(F.max("mj").alias("mj")))


def hll_estimate(reg: DataFrame, group_col: str | list[str],
                 p: int = 6) -> DataFrame:
    """(group, est_distinct) from a register table. The raw estimate
    is ``α·m²·2^Kmax / S`` with ``S = Σ 2^(Kmax−M_j)`` an exact
    BIGINT (absent registers contribute 2^Kmax); the standard
    small-range correction ``m·ln(m/V)`` applies when the raw
    estimate ≤ 2.5m and V (empty registers) > 0. The numerator and
    thresholds are Python-computed double literals, the final value
    is snapped to micro-units — estimates are bit-identical across
    engines and layouts. Standard error ~1.04/sqrt(m)."""
    from montandon_etl_spark.operators.util import stable_round6

    m, kmax, alpha = _hll_dims(p)
    gs = _gcols(group_col)
    numer = alpha * m * m * float(1 << kmax)  # exact parse both engines
    agg = reg.groupBy(*gs).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.expr(f"(cast(1 as bigint) << ({kmax} - mj))"))
        .alias("s_present"),
    ).select(
        *gs,
        (F.col("s_present")
         + (F.lit(m) - F.col("cnt")) * F.lit(1 << kmax)).alias("s"),
        (F.lit(m) - F.col("cnt")).alias("v"),
    )
    e_raw = F.lit(numer) / F.col("s").cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v")),
    ).otherwise(e_raw)
    return agg.select(*gs, stable_round6(est).alias("est_distinct"))


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 p: int = 6) -> DataFrame:
    """Per-group deterministic-HLL distinct estimate
    ``(group, est_distinct)`` — one shuffle to the (group, register)
    grain (map-side partial max), then an O(groups) aggregate.
    Register state is m rows per group regardless of data volume: the
    sketch a 100-TB scan reduces to is KBs."""
    return hll_estimate(
        hll_registers(df, group_col, value_col, p), group_col, p)


def py_hash60(s: str) -> int:
    """Driver-side mirror of :func:`hash60` for plain strings: md5 hex
    prefix → int. Bit-identical to the Spark/DuckDB column form, so
    metadata-level probes (manifest Bloom pruning) agree with filters
    the engines built."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def bloom_test_sparse(wmap: dict, m_bits: int, n_hashes: int,
                      value: str) -> bool:
    """Driver-side membership test against a SPARSE word map
    ({word_idx: bits}) built by :func:`bloom_build`'s layout — same
    Kirsch–Mitzenmacher positions, same 60-bit words. False negatives
    never (the guarantee pruning correctness rests on)."""
    h1 = py_hash60(value + "#a")
    h2 = py_hash60(value + "#b")
    for i in range(n_hashes):
        p = (h1 + i * h2) % m_bits
        if not (int(wmap.get(p // _BLOOM_WORD, 0)) >> (p % _BLOOM_WORD)) & 1:
            return False
    return True
