"""Exact duplicate-span detection and removal (ExactSubstr dedup).

The corpus-level exact-substring dedup family from "Deduplicating
Training Data Makes Language Models Better" (Lee et al., 2022): any
token window of length ``k`` that occurs more than once in the corpus
(across documents OR repeated inside one document) marks a duplicated
region; overlapping duplicated windows merge into maximal spans, and
``strip_dup_spans`` removes every token covered by such a span.

Lee et al. build a suffix array over the concatenated corpus — a
fundamentally single-machine layout. The Spark-native equivalent used
here trades the "any length >= k" suffix-array guarantee for the
standard rolling-window relaxation: a duplicated substring of length
L >= k is exactly the union of its L-k+1 duplicated k-windows, so
merging overlapping duplicated k-windows recovers the same maximal
spans (for substrings >= k tokens) without any global ordering.

Reference analogue: the reference dedups whole payloads by content
hash (apps/etl/extraction/sources/gdacs/extract.py:128-148); this
operator is the sub-document refinement of that idea for web text,
where boilerplate repeats across pages that are not whole-page equal.

Scale shape (100 TB lens):
- tokenize + window hashing are scan-local (one ``transform`` over the
  token array, no Python);
- duplicate detection is ONE partial-aggregated ``groupBy(gh)`` over
  (hash) only — k-grams repeat heavily in web text, so the map-side
  combine collapses the shuffle to distinct-gram volume;
- the gram->count join shuffles narrow (doc, pos, hash) triples; AQE
  broadcasts the duplicate-hash side when it is small (it usually is:
  only hashes with count >= min_count survive);
- span merge is a per-document window — partitions by doc_id, and
  every window of a fixed k has monotone end = pos+k-1, so interval
  merge degenerates to a single lag() gap test (no running max).
No driver loops, no collect, no row-at-a-time UDFs anywhere.

Portable hashing via :func:`~montandon_etl_spark.operators.dedup.hash60`
so the DuckDB oracle replays the pipeline value-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60


def _token_windows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(doc_id, pos, gh): 1-based token position and 60-bit hash of the
    k-token window starting there. Documents shorter than k tokens
    contribute nothing (strict windows — no short-gram fallback)."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    )
    gs = (
        f"case when size(w) >= {k} then "
        f"transform(sequence(1, size(w) - {k} + 1), "
        f"i -> struct(i as pos, concat_ws(' ', slice(w, i, {k})) as g)) "
        f"else array() end"
    )
    return (
        d.select("doc_id", F.explode(F.expr(gs)).alias("x"))
        .select("doc_id", F.col("x.pos").alias("pos"), hash60(F.col("x.g")).alias("gh"))
    )


def dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A k-token window is *duplicated* when its text occurs at least
    ``min_count`` times corpus-wide (self-repeats included — repeated
    boilerplate inside one page counts). Overlapping / gap-free
    duplicated windows merge into one span.

    Returns (doc_id, span_start, span_end, span_len, n_windows) with
    1-based inclusive token positions.
    """
    grams = _token_windows(df, id_col, text_col, k)
    counts = (
        grams.groupBy("gh").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("gh")
    )
    dup = grams.join(counts, "gh", "inner").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    # fixed k => window ends are monotone in pos; a new span starts
    # exactly when the coverage gap pos - prev > k (prev covers through
    # prev+k-1; pos == prev+k is contiguous coverage -> same span)
    flagged = (
        dup.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > k), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(w))
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .withColumn("span_len", F.col("span_end") - F.col("span_start") + 1)
        .select("doc_id", "span_start", "span_end", "span_len", "n_windows")
    )


def strip_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Remove every token covered by a duplicated span (all copies are
    stripped — the conservative Lee et al. 'remove all occurrences'
    policy; keeping one canonical copy is the survivor-election job,
    see operators/survivor_index.py).

    Returns (doc_id, clean_text, n_tokens, n_removed) where clean_text
    is the surviving tokens joined by single spaces (whitespace is
    normalized — the tokenization is not invertible by design).
    """
    spans = (
        dup_spans(df, id_col, text_col, k=k, min_count=min_count)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("spans"))
    )
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    ).join(spans, "doc_id", "left")
    kept = (
        "filter(transform(w, (t, i) -> struct(t as tok, i + 1 as pos)), "
        "x -> spans is null or not exists(spans, "
        "s -> x.pos between s.span_start and s.span_end))"
    )
    return d.select(
        "doc_id",
        F.concat_ws(" ", F.expr(f"transform({kept}, x -> x.tok)")).alias("clean_text"),
        F.size("w").alias("n_tokens"),
        (F.size("w") - F.size(F.expr(kept))).alias("n_removed"),
    )
