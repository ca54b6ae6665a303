"""Text-analysis operators over document tables.

Training-data-pipeline stages: language id, quality scoring, token
counting, document fingerprinting. All pure ``pyspark.sql.functions``
expressions (whole-stage-codegen'd; no UDFs) so they run at scan speed
and are oracle-checkable in ANSI SQL.

Reference lineage: the reference derives per-document structured
values from raw payloads and records them beside the row
(apps/etl/transform/sources/gdacs.py:35-57, models.py:112); these
operators are the columnar generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import word_shingles
from montandon_etl_spark.operators.util import stable_round6

# Small, fixed stopword lists (must stay in sync with the SQL oracle
# strings in __spark_entry__.py — they are the *same* list).
EN_STOP = ["the", "of", "and", "to", "in", "is", "a", "that", "it", "for"]
ES_STOP = ["el", "la", "de", "que", "y", "en", "los", "se", "un", "por"]

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens, BPE-ish regex tokens, chars — per document."""
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars_obs"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(_BPE_ISH)).alias("n_bpe_tokens"),
    )


def stopword_hits(text_col: str, stops: list[str]) -> F.Column:
    """Count of tokens (with multiplicity) that are in the stop list."""
    words = f"split(lower(trim({text_col})), '\\\\s+')"
    lit_list = ", ".join(f"'{s}'" for s in stops)
    return F.expr(
        f"size(filter({words}, w -> array_contains(array({lit_list}), w)))"
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic quality heuristics: length, punctuation ratio,
    stopword ratio, mean word length, and a composite score.

    score = stop_ratio − punct_ratio − |mean_word_len − 5| / 10,
    clipped to [0, 1] — the shape (not the weights) is what matters:
    every term is a scan-local expression, so quality filtering of a
    100 TB corpus is a single pushed-down scan.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    stops = stopword_hits(text_col, EN_STOP)
    mean_wl = (n_chars - (n_words - 1)) / n_words
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_obs"),
        n_words.alias("n_words"),
        stable_round6(n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        stable_round6(stops / n_words).alias("stop_ratio"),
        stable_round6(mean_wl).alias("mean_word_len"),
        _quality_col(text_col).alias("quality"),
    )


def lang_id_stopwords(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """SQL-expressible language id: en vs es stopword hits, 'und' when
    neither clears 2 hits. (The CDC pipeline's richer variant lives in
    functions/extract.py; this one is the scan-speed analytics form.)"""
    en = stopword_hits(text_col, EN_STOP)
    es = stopword_hits(text_col, ES_STOP)
    return df.select(
        F.col(id_col),
        _lang_pred_col(text_col).alias("lang_pred"),
        en.alias("en_hits"),
        es.alias("es_hits"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3
) -> DataFrame:
    """Within-document repetition ratios — the Gopher-rules-style
    boilerplate signal a web-corpus filter keys on (nav bars, SEO spam,
    generated pages repeat themselves):

    - ``dup_word_ratio``: 1 − distinct/total whitespace tokens;
    - ``dup_ngram_ratio``: 1 − distinct/total word n-grams (captures
      repeated PHRASES that unique words miss).

    Pure scan-local array expressions (split → array_distinct → size):
    zero shuffle, zero Python — filtering 100 TB on these is one
    pushed-down scan, same shape as quality_score.
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(words)
    sh = word_shingles(text_col, ngram)
    n_sh = F.size(sh)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        stable_round6(
            1.0 - F.size(F.array_distinct(words)) / n_words
        ).alias("dup_word_ratio"),
        stable_round6(
            1.0 - F.size(F.array_distinct(sh)) / n_sh
        ).alias("dup_ngram_ratio"),
    )


def dedup_paragraphs(df: DataFrame, id_col: str, text_col: str,
                     sep: str = "\n\n") -> DataFrame:
    """Intra-document exact paragraph dedup (the C4/Gopher-style
    cleanup stage: boilerplate repeated within one page — nav blocks,
    cookie banners — gets collapsed to its first occurrence, original
    order preserved). Returns (id, clean_text, n_paras, n_removed).

    Shape: posexplode → per-(doc, para) min position → ordered
    reassembly via array_sort(collect_list(struct(pos, para))). The
    per-doc grouping is map-side combinable and the whole operator
    shuffles only (doc, para) rows — no corpus-wide state, so it
    scales as a single pass."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    )
    firsts = paras.groupBy(id_col, "para").agg(
        F.min("pos").alias("pos"), F.count(F.lit(1)).alias("_n")
    )
    return firsts.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.sum("_n").alias("n_paras"),
        (F.sum("_n") - F.count(F.lit(1))).alias("n_removed"),
    )


# PII patterns restricted to syntax shared by Java regex (Spark) and
# RE2 (DuckDB) so the oracle runs the literal same programs
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def redact_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII scrubbing (the redaction stage of a training-data pipeline):
    emails → ``<EMAIL>`` then IPv4 literals → ``<IP>``, in that fixed
    order (emails with host-like domains must not half-redact), plus
    per-kind match counts. Pure regexp_replace/regexp_count scan
    expressions — zero Python, zero shuffle, pushes to 100 TB as a
    single scan."""
    t = F.col(text_col)
    no_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(no_email, F.lit(PII_IPV4)).alias("n_ipv4"),
        F.regexp_replace(no_email, PII_IPV4, "<IP>").alias("clean_text"),
    )


def ngram_lm_score(df: DataFrame, id_col: str, text_col: str,
                   n: int = 3) -> DataFrame:
    """Self-trained character n-gram LM quality score (the CCNet-style
    fluency signal of a webtext pipeline): train n-gram counts over the
    corpus itself, then score each document as the mean conditional
    probability of its n-grams, P(c_i | c_{i-n+1..i-1}) =
    count(ngram) / count(prefix). Self-training means every document
    n-gram exists in the model, so no smoothing is needed; documents
    full of corpus-typical sequences score high, line noise scores low.

    100 TB shape: one explode→groupBy pass builds the n-gram counts
    (map-side combined; the model is bounded by |charset|^n, NOT corpus
    size), prefix counts roll up from the n-gram counts without a
    second corpus pass, and BOTH model tables broadcast — the scoring
    pass is a scan + two broadcast joins + one groupBy(doc), no
    shuffle of the exploded n-grams.

    Cross-engine determinism: each ratio is ONE correctly-rounded IEEE
    division (bit-identical in any engine), snapped to integer
    micro-units before summing — integer sums are order-independent,
    so the score never depends on partitioning. Oracle twin in
    ``__spark_entry__.oracle_sql()['ngram_lm_score']``."""
    t, p = F.col(text_col), n - 1
    pos = df.filter(F.length(t) >= n).select(
        F.col(id_col),
        F.explode(F.expr(
            f"transform(sequence(1, length({text_col}) - {p}),"
            f" i -> substring({text_col}, i, {n}))"
        )).alias("ng"),
    )
    ngc = pos.groupBy("ng").agg(F.count(F.lit(1)).alias("ngc"))
    pfc = ngc.groupBy(F.substring("ng", 1, p).alias("pf")).agg(
        F.sum("ngc").alias("pfc")
    )
    micro = F.floor(F.col("ngc") / F.col("pfc") * 1_000_000 + F.lit(0.5))
    scored = (
        pos.join(F.broadcast(ngc), "ng")
        .join(F.broadcast(pfc), F.substring(F.col("ng"), 1, p) == F.col("pf"))
        .select(F.col(id_col), micro.alias("micro"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        (F.floor(F.sum("micro") / F.count(F.lit(1)) + F.lit(0.5))
         / 1_000_000).alias("lm_score"),
    )


def perplexity_buckets(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, sample_size: int = 512) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the self-trained n-gram LM, then split the
    corpus into head / middle / tail terciles of fluency — the
    partition CCNet feeds to downstream mixing (keep head, down-weight
    tail). Returns ``(id, n_ngrams, lm_score, ppl_bucket)``.

    Thresholds come from a HASH-ORDERED SAMPLE exactly as CCNet
    computes its percentile cutoffs from a sample: the bottom
    ``sample_size`` docs by (hash60(id), id) — a bounded TakeOrdered,
    never a global sort — are collected, and the tercile cutoffs are
    the ceil(k/3)-th and ceil(2k/3)-th smallest sampled scores
    (multiset rank over the SNAPPED score values, so ties cannot make
    the cutoff ambiguous). Bucket assignment is then a scan-side
    comparison against two literals. Deterministic end to end: the LM
    score is already integer-micro-snapped, the sample is a pure
    function of ids, and rank selection has no interpolation — a SQL
    oracle replays thresholds and buckets exactly.

    Docs shorter than ``n`` chars carry no LM evidence and are
    excluded, as in ``ngram_lm_score``."""
    import math

    from montandon_etl_spark.operators.dedup import hash60

    scores = ngram_lm_score(df, id_col, text_col, n).localCheckpoint()
    samp = (scores
            .orderBy(hash60(F.col(id_col).cast("string")), F.col(id_col))
            .limit(sample_size).select("lm_score").collect())
    s = sorted(r["lm_score"] for r in samp)
    k = len(s)
    if k == 0:
        return scores.withColumn("ppl_bucket",
                                 F.lit(None).cast("string"))
    t1 = s[math.ceil(k / 3.0) - 1]
    t2 = s[math.ceil(2 * k / 3.0) - 1]
    return scores.select(
        id_col, "n_ngrams", "lm_score",
        F.when(F.col("lm_score") <= F.lit(t1), "tail")
        .when(F.col("lm_score") <= F.lit(t2), "middle")
        .otherwise("head").alias("ppl_bucket"))


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, n: int = 4) -> DataFrame:
    """Rolling-shingle fingerprint: min md5 over word 4-grams — one
    stable 32-hex token per document (winnowing with window = whole
    doc). Equal fingerprints ⇒ near-identical prefixes of content;
    grouping by it is a cheap near-dup pre-cluster."""
    sh = word_shingles(text_col, n)
    return df.select(
        F.col(id_col),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("fingerprint"),
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 4, window: int = 8
) -> DataFrame:
    """Winnowing (MOSS-style) fingerprint selection: hash every word
    n-gram, slide a ``window`` over the hash sequence, keep each
    window's minimum — guaranteeing a shared fingerprint for any match
    at least ``window + n - 1`` words long, with ~2/(window+1) of the
    hashes retained. The standard plagiarism / substring-near-dup
    scheme where whole-doc MinHash is too coarse.

    Plan: all array expressions inside the scan (transform / slice /
    array_min / array_distinct) + one explode — no shuffle until the
    caller groups by fingerprint. Integer hashing via the portable
    md5-prefix hash60, so the DuckDB oracle computes identical values.
    Returns (id, fingerprint) — distinct fingerprints per doc.
    """
    from montandon_etl_spark.operators.dedup import hash60, word_shingles

    sh = word_shingles(text_col, n)
    hashes = F.transform(sh, lambda s: hash60(s))
    win_mins = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.lit(1), F.size(hashes) - (window - 1))
        ),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(win_mins)).alias("fingerprint"),
    )


def _quality_col(text_col: str) -> F.Column:
    """The composite quality score as a single scan-local column —
    the exact program quality_score materializes (micro-snapped)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    n_punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
    stops = stopword_hits(text_col, EN_STOP)
    mean_wl = (n_chars - (n_words - 1)) / n_words
    raw = (stops / n_words) - (n_punct / F.greatest(n_chars, F.lit(1))) - (
        F.abs(mean_wl - 5.0) / 10.0
    )
    return stable_round6(F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0)))


def _lang_pred_col(text_col: str) -> F.Column:
    """lang_id_stopwords' prediction as a single scan-local column."""
    en = stopword_hits(text_col, EN_STOP)
    es = stopword_hits(text_col, ES_STOP)
    return (
        F.when((en >= es) & (en >= 2), F.lit("en"))
        .when((es > en) & (es >= 2), F.lit("es"))
        .otherwise(F.lit("und"))
    )


def curation_gate(df: DataFrame, id_col: str, text_col: str,
                  min_quality: float = 0.02,
                  lang: str = "en") -> DataFrame:
    """The curation funnel fused into ONE declarative plan —
    ``(id, quality, lang_pred, is_canonical, keep, reject_reason)``:

    - quality and language are scan-local column programs (the same
      micro-snapped expressions ``quality_score``/``lang_id_stopwords``
      materialize), so the gate evaluates inside the corpus scan;
    - canonical-copy election is the single shuffle: a min-id window
      over ``sha256(text)`` (exact-dedup's first-match-by-ordering);
    - ``reject_reason`` is the reference's ORDERED validation-gate
      idiom (apps/etl/transform/sources/*.py filter_events) applied to
      corpus curation: duplicate → wrong-language → low-quality, first
      failing gate names the reason, survivors get NULL + keep=true.

    The point is compositional: a 100 TB curation pass is one scan +
    one hash-window, not a chain of per-stage materializations.
    Downstream stages consume ``filter(keep)`` (→ mixture_resample →
    sequence_pack) without ever re-reading text.
    """
    base = df.select(
        F.col(id_col),
        _quality_col(text_col).alias("quality"),
        _lang_pred_col(text_col).alias("lang_pred"),
        F.sha2(F.col(text_col), 256).alias("_h"),
    )
    w = Window.partitionBy("_h")
    gated = base.withColumn(
        "is_canonical", F.col(id_col) == F.min(id_col).over(w))
    reason = (
        F.when(~F.col("is_canonical"), F.lit("duplicate"))
        .when(F.col("lang_pred") != lang, F.lit("not_" + lang))
        .when(F.col("quality") < F.lit(min_quality), F.lit("low_quality"))
    )
    return gated.select(
        id_col, "quality", "lang_pred", "is_canonical",
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def corpus_report(df: DataFrame, dims: tuple[str, str] = ("lang", "source"),
                  text_col: str = "text") -> DataFrame:
    """Dataset-card rollup: ONE pass over the corpus producing every
    granularity a mixture designer asks for — per (lang, source), per
    lang, per source, and the grand total — via CUBE grouping sets
    (Catalyst expands them inside a single shuffle with map-side
    partial aggregation; no N scans for N breakdowns). Aggregated-out
    dimensions surface as '<all>' so the marker can't collide with a
    data NULL. Metrics are integers (docs, chars, whitespace tokens)
    — value-exact against the SQL CUBE replay.

    100-TB shape: this is the operator that replaces "run 4 GROUP BYs
    over 100 TB" with one scan + one shuffle of ~|lang|x|source| rows.

    Reference lineage: the reference's per-run summary reporting
    (transform counts by source/hazard) as a first-class operator.
    """
    a, b = dims
    return (df.cube(a, b)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.length(F.col(text_col))).alias("sum_chars"),
                 F.sum(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
                 .alias("sum_ws_tokens"))
            .select(F.coalesce(F.col(a), F.lit("<all>")).alias(a),
                    F.coalesce(F.col(b), F.lit("<all>")).alias(b),
                    "n_docs", "sum_chars", "sum_ws_tokens"))


def c4_clean(df: DataFrame, id_col: str, text_col: str,
             min_words: int = 3, min_lines: int = 1,
             badwords: list[str] | None = None) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2, public): line
    level — keep a line only if it ends in terminal punctuation
    (``.!?"``), has at least ``min_words`` words, and does not mention
    "javascript"; page level — drop the whole page when it contains
    "lorem ipsum", a curly brace, any ``badwords`` entry, or fewer
    than ``min_lines`` surviving lines. Returns one row per input page
    ``(id, page_kept, reject_reason, n_lines_total, n_lines_kept,
    clean_text)`` with ORDERED reject reasons (lorem_ipsum >
    curly_brace > bad_word > too_few_lines — first match wins, the
    ``curation_gate`` determinism convention) and ``clean_text`` the
    surviving lines newline-joined (NULL for rejected pages).

    Pure column program — split/filter/join lambdas inside whole-stage
    codegen, zero shuffles, zero Python; a SQL oracle replays every
    rule with the same string functions. The paper's corpus-level
    three-sentence-span dedup is the separate ``dup_spans`` /
    ``strip_dup_spans`` operator pair (same §2.2 pipeline)."""
    text = F.col(text_col)
    lines = F.split(text, "\n")
    keep = lambda x: (  # noqa: E731
        F.substring(F.rtrim(x), -1, 1).isin(".", "!", "?", '"')
        & (F.size(F.split(F.trim(x), r"\s+")) >= min_words)
        & (F.trim(x) != "")
        & ~F.lower(x).contains("javascript"))
    kept = F.filter(lines, keep)
    low = F.lower(text)
    bad = None
    for w in (badwords or []):
        c = low.contains(w.lower())
        bad = c if bad is None else (bad | c)
    reason = (F.when(low.contains("lorem ipsum"), F.lit("lorem_ipsum"))
              .when(text.contains("{"), F.lit("curly_brace")))
    if bad is not None:
        reason = reason.when(bad, F.lit("bad_word"))
    reason = reason.when(F.size(kept) < min_lines,
                         F.lit("too_few_lines"))
    return df.select(
        F.col(id_col),
        reason.isNull().alias("page_kept"),
        reason.alias("reject_reason"),
        F.size(lines).alias("n_lines_total"),
        F.size(kept).alias("n_lines_kept"),
        F.when(reason.isNull(), F.array_join(kept, "\n"))
        .alias("clean_text"))


GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, id_col: str, text_col: str,
                 min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """The Gopher/MassiveText quality heuristics (Rae et al. 2021,
    App. A — public): keep a page only if

    1. word count in ``[min_words, max_words]``;
    2. mean word length in [3, 10] characters;
    3. symbol-to-word ratio (``#`` or ``...``) <= 0.1;
    4. <= 90% of lines start with a bullet (``•``, ``-``, ``*``);
    5. <= 30% of lines end with an ellipsis (``...`` / ``…``);
    6. >= 80% of words contain an alphabetic character;
    7. >= 2 distinct Gopher stop words present ({the, be, to, of,
       and, that, have, with}).

    Every threshold evaluates by INTEGER cross-multiplication
    (``3*n <= total_len <= 10*n`` instead of a float mean), so the
    decision — and every emitted statistic — is exact and engine-
    portable; no float ever crosses the oracle boundary. Output is one
    row per page with the raw counts, ``kept`` and an ORDERED
    ``reject_reason`` (rule order above, first violation wins — the
    ``curation_gate`` determinism convention). Pure codegen column
    program: zero shuffles, zero Python."""
    text = F.col(text_col)
    words = F.filter(F.split(F.trim(text), r"\s+"),
                     lambda x: x != F.lit(""))
    lines = F.filter(F.split(text, "\n"),
                     lambda x: F.trim(x) != F.lit(""))
    n_words = F.size(words).cast("bigint")
    total_wlen = F.aggregate(
        words, F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x))
    n_hash = (F.length(text)
              - F.length(F.replace(text, F.lit("#"), F.lit("")))
              ).cast("bigint")
    n_ellipsis = ((F.length(text)
                   - F.length(F.replace(text, F.lit("..."), F.lit(""))))
                  / 3).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    is_bullet = lambda x: (  # noqa: E731
        F.startswith(F.trim(x), F.lit("•"))
        | F.startswith(F.trim(x), F.lit("-"))
        | F.startswith(F.trim(x), F.lit("*")))
    n_bullet = F.size(F.filter(lines, is_bullet)).cast("bigint")
    ends_ell = lambda x: (  # noqa: E731
        F.endswith(F.rtrim(x), F.lit("..."))
        | F.endswith(F.rtrim(x), F.lit("…")))
    n_ell_lines = F.size(F.filter(lines, ends_ell)).cast("bigint")
    n_alpha = F.size(F.filter(
        words, lambda x: x.rlike("[a-zA-Z]"))).cast("bigint")
    def _stop_hit(s: str) -> F.Column:
        return F.exists(words, lambda x: F.lower(x) == F.lit(s)).cast("int")

    stop_hits = None
    for s in GOPHER_STOPS:
        hit = _stop_hit(s)
        stop_hits = hit if stop_hits is None else (stop_hits + hit)
    n_stops = stop_hits.cast("bigint")

    d = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        total_wlen.alias("total_word_len"),
        n_hash.alias("n_hash"),
        n_ellipsis.alias("n_ellipsis"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ell_lines.alias("n_ellipsis_lines"),
        n_alpha.alias("n_alpha_words"),
        n_stops.alias("n_stop_words"),
    )
    w = F.col("n_words")
    reason = (
        F.when(w < min_words, F.lit("too_few_words"))
        .when(w > max_words, F.lit("too_many_words"))
        .when(F.col("total_word_len") < 3 * w, F.lit("short_words"))
        .when(F.col("total_word_len") > 10 * w, F.lit("long_words"))
        .when(10 * (F.col("n_hash") + F.col("n_ellipsis")) > w,
              F.lit("symbol_ratio"))
        .when(10 * F.col("n_bullet_lines") > 9 * F.col("n_lines"),
              F.lit("bullet_lines"))
        .when(10 * F.col("n_ellipsis_lines") > 3 * F.col("n_lines"),
              F.lit("ellipsis_lines"))
        .when(5 * F.col("n_alpha_words") < 4 * w, F.lit("alpha_words"))
        .when(F.col("n_stop_words") < 2, F.lit("stop_words")))
    return d.withColumn("kept", reason.isNull()) \
            .withColumn("reject_reason", reason)


def strip_host_boilerplate(df: DataFrame, id_col: str, host_col: str,
                           text_col: str, sep: str = "\n",
                           min_docs: int = 3,
                           frac_pct: int = 50) -> DataFrame:
    """Cross-document boilerplate removal (the CCNet/site-template
    stage that intra-doc ``dedup_paragraphs`` cannot do): a line that
    appears in at least ``frac_pct`` percent of a host's documents —
    for hosts with at least ``min_docs`` documents — is site
    boilerplate (nav bars, footers, cookie banners rendered into every
    page of the domain) and is stripped from every document of that
    host. Returns (id, clean_text, n_lines, n_removed); a document
    that was ALL boilerplate survives with an empty clean_text.

    The threshold compare is exact integer arithmetic
    (``line_docs * 100 >= frac_pct * host_docs``) so any SQL engine
    replays the same boundary.

    Scale shape (100 TB): the only wide state is the (host, line)
    doc-frequency aggregate — map-side combinable, keyed on a
    bounded-cardinality pair (hosts x distinct template lines), never
    corpus-global. Host doc counts are one row per host. The
    boilerplate set joins back to the exploded lines on (host, line)
    — an equi-join AQE can broadcast when the template set is small —
    and reassembly is the same per-doc sort-collect as
    ``dedup_paragraphs``. No window over the corpus, no driver state.

    Reference lineage: the reference normalizes per-source payload
    shapes with static per-source config (apps/etl/sources.py);
    this derives the per-site template from the data itself.
    """
    lines = df.select(
        F.col(id_col), F.col(host_col).alias("_host"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_line"),
    )
    host_docs = df.groupBy(F.col(host_col).alias("_host")).agg(
        F.countDistinct(id_col).alias("_hd"))
    line_docs = lines.groupBy("_host", "_line").agg(
        F.countDistinct(id_col).alias("_ld"))
    boiler = (
        line_docs.join(host_docs, "_host")
        .where((F.col("_hd") >= F.lit(min_docs))
               & (F.col("_ld") * 100 >= F.lit(frac_pct) * F.col("_hd")))
        .select("_host", "_line", F.lit(True).alias("_boiler")))
    flagged = lines.join(boiler, ["_host", "_line"], "left").select(
        F.col(id_col), "_pos", "_line",
        F.coalesce(F.col("_boiler"), F.lit(False)).alias("_b"))
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(
                        F.struct("_pos", "_line", "_b"))),
                    lambda s: ~s["_b"]),
                lambda s: s["_line"]),
            sep).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_b").cast("bigint")).alias("n_removed"),
    )
