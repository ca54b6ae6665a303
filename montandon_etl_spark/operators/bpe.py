"""Deterministic byte-pair-encoding tokenizer: corpus-trained merges
plus a pure column-program encoder — the tokenization stage of an LLM
data pipeline (token counting for mixture weighting, length filtering,
cost estimation) with an exact cross-engine contract.

Design for scale (the part that matters at 100 TB):

- **Training runs on the DISTINCT-WORD table, not the corpus.** One
  corpus scan builds (word, n) — vocabulary-bounded (Heaps' law: a
  few million rows for a web-scale corpus), shuffling only words and
  counts. Every merge round then aggregates symbol pairs over that
  small table (weighted by n), picks the argmax, and rewrites the
  word segmentations — O(vocab) per round, corpus never rescanned.
- **Encoding is a broadcast join.** The trained (word → token string)
  table broadcasts; tokenizing a document is split + join + sum, no
  shuffle of text. Out-of-vocabulary words (when encoding a corpus
  the tokenizer was not trained on) fall back to the merge-replay
  column program compiled from the merge list — pass ``merges=`` to
  the encoders to wire it (left join + scan-side ``apply_merges``
  coalesce); without it the join is inner and inputs must be
  in-vocab.
- **Determinism is the contract.** Ties in pair counts break
  lexicographically; segmentation state is a plain string with a
  THREE-space separator so one non-regex ``replace`` per merge
  applies it left-to-right non-overlapping with byte-identical
  semantics in Spark and DuckDB — the oracle replays training as an
  unrolled chain of materialized CTEs and must reproduce the merges
  and every token count exactly.

Segmentation-string invariant: tokens are separated by exactly three
spaces and the string is padded with three spaces at both ends, e.g.
``"   l   o   w   </w>   "``. A merge (a, b) is the plain replace

    " a   b " -> " ab "

the single-space margins anchor token boundaries (a token can never
be a false suffix/prefix match because its other side is a space),
and each replacement consumes one space from each flanking
three-space run and re-emits it, so the invariant survives and
CONSECUTIVE occurrences ("a b a b") all merge in one pass exactly as
classic BPE does (leftmost, non-overlapping).

Normalization (shared, ASCII-only so both engines agree byte-for-
byte): lowercase, keep [a-z0-9], words split on runs of anything
else; each word gets a ``</w>`` end marker so merges never cross word
boundaries.

Reference lineage: the reference counts and filters documents by raw
length (apps/etl/transform pipelines); an LLM-scale corpus pipeline
budgets by TOKENS, which requires the tokenizer in-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "   "  # the three-space token separator (see module docstring)


def _norm_words(df: DataFrame, text_col: str) -> F.Column:
    """Array of normalized words of a text column (empty strings
    filtered)."""
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    return F.filter(F.split(F.trim(cleaned), " +"), lambda w: w != "")


def _seg0(word: F.Column) -> F.Column:
    """Initial segmentation string of a word: single characters +
    ``</w>``, three-space separated, three-space padded."""
    return F.concat(F.lit(SEP),
                    F.regexp_replace(word, "(.)", "$1" + SEP),
                    F.lit("</w>" + SEP))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the vocabulary-bounded training
    set. One scan, shuffles only (word, partial count)."""
    return (df.select(F.explode(_norm_words(df, text_col)).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair counts over the current
    segmentations, weighted by word frequency."""
    toks = F.split(F.trim(F.col("seg")), SEP)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.size(toks) - 1).alias("a"),
        F.slice(toks, 2, F.size(toks) - 1).alias("b"),
    )
    return (words.select("n", F.explode(pairs).alias("p"))
            .select("n", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b").agg(F.sum("n").alias("cnt")))


def _safe_batch(cands: list, by_second: dict, by_first: dict,
                limit: int) -> list[tuple[str, str]]:
    """Greedy prefix of the rank-ordered candidate list that is
    PROVABLY equivalent to applying the merges one sequential round at
    a time. Three sound conditions (each guards a way the sequential
    argmax could diverge from the precomputed ranking):

    1. **Prefix, no skips.** Selection stops at the first candidate
       that overlaps an earlier selection. A skipped-over candidate
       outranks everything after it and its count may survive the
       earlier merges untouched, so sequential could pick it next.
    2. **Symbol disjointness.** A candidate must share no symbol with
       any selected merge's {a, b, ab}: merges only DECREASE counts of
       pairs touching a/b, and pairs touching the created symbol ab
       can increase.
    3. **Hazard bound.** Any pair involving a created symbol a_i·b_i
       has post-merge count <= max_x cnt(x, a_i) + max_x cnt(x, a_ib_i)
       (left side; mirrored on the right with b_i) — every occurrence
       is either pre-existing or consumes one (x, a_i) adjacency. The
       next candidate is admitted only if its count STRICTLY exceeds
       every selected merge's bound, so no created pair can match or
       beat it (strictness also dodges unknowable lexicographic ties).
    """
    sel: list[tuple[str, str]] = []
    used: set[str] = set()
    hazard = -1
    for row in cands:
        a, b, cnt = row["a"], row["b"], row["cnt"]
        if cnt < 2:
            break
        if sel:
            if a in used or b in used:
                break  # condition 1: stop at first overlap, no skips
            if cnt <= hazard:
                break  # condition 3
        sel.append((a, b))
        used.update((a, b, a + b))
        bound = max(by_second.get(a, 0) + by_second.get(a + b, 0),
                    by_first.get(b, 0) + by_first.get(a + b, 0))
        hazard = max(hazard, bound)
        if len(sel) >= limit:
            break
    return sel


def train_bpe(spark: SparkSession, df: DataFrame, n_merges: int,
              text_col: str = "text",
              batch_k: int = 16) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges over a corpus. Returns the merge
    list (rank order — bounded driver metadata, the model itself) and
    the trained (word, n, seg) vocabulary table.

    Per driver round: one pair-count aggregation over the vocab table,
    one bounded collect of the top-``batch_k`` candidates plus the
    per-symbol adjacency maxima of the symbols they touch, then up to
    ``batch_k`` merges selected by :func:`_safe_batch` — the maximal
    rank-prefix whose members provably ARE the next sequential argmax
    picks (see its docstring), applied together in one segmentation
    rewrite. Output is byte-identical to ``batch_k=1`` (the classic
    one-merge-per-round algorithm, kept as the property-test
    reference); the batching only amortizes driver round-trips, which
    is what makes 32k-merge production vocabularies tractable. The
    vocab table is localCheckpoint()ed per round (iterative-lineage
    rule). Rounds stop early if no pair occurs twice."""
    words = (word_counts(df, text_col)
             .withColumn("seg", _seg0(F.col("word")))
             .localCheckpoint())
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        k = min(batch_k, n_merges - len(merges))
        pc = _pair_counts(words)
        if k > 1:
            pc = pc.localCheckpoint()  # reuse across the two collects
        cands = (pc.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                 .limit(k).collect())
        if not cands or cands[0]["cnt"] < 2:
            break
        if k > 1 and len(cands) > 1:
            syms = sorted({s for r in cands for s in
                           (r["a"], r["b"], r["a"] + r["b"])})
            mx = (pc.select(
                F.col("a").alias("s"), "cnt", F.lit(True).alias("first"))
                .union(pc.select(F.col("b").alias("s"), "cnt",
                                 F.lit(False).alias("first")))
                .filter(F.col("s").isin(syms))
                .groupBy("s", "first").agg(F.max("cnt").alias("m"))
                .collect())
            by_first = {r["s"]: r["m"] for r in mx if r["first"]}
            by_second = {r["s"]: r["m"] for r in mx if not r["first"]}
            batch = _safe_batch(cands, by_second, by_first, k)
        else:
            a, b = cands[0]["a"], cands[0]["b"]
            batch = [(a, b)]
        merges.extend(batch)
        seg = F.col("seg")
        for a, b in batch:
            seg = F.replace(seg, F.lit(f" {a}{SEP}{b} "),
                            F.lit(f" {a}{b} "))
        words = words.withColumn("seg", seg).localCheckpoint()
    return merges, words


def apply_merges(seg: F.Column, merges: list[tuple[str, str]]) -> F.Column:
    """Compile the merge list into a column program (one plain replace
    per merge, rank order) — encodes words the training table has
    never seen, byte-identical to replaying training."""
    for a, b in merges:
        seg = F.replace(seg, F.lit(f" {a}{SEP}{b} "), F.lit(f" {a}{b} "))
    return seg


def bpe_doc_tokens(df: DataFrame, vocab: DataFrame, id_col: str,
                   text_col: str = "text",
                   merges: list[tuple[str, str]] | None = None) -> DataFrame:
    """Tokenize documents against a trained vocabulary table:
    (id, n_words, n_tokens, tokens_prefix) where tokens_prefix is the
    first 12 tokens of the document (word order preserved). The vocab
    join broadcasts — document text never shuffles; only the
    per-word position rows do.

    When ``merges`` is given, out-of-vocabulary words (encoding a
    corpus the tokenizer was not trained on) fall back scan-side to
    the compiled merge-replay program (:func:`apply_merges` — byte-
    identical to what training would have segmented them as); without
    it the join is inner and OOV words are dropped (and the word must
    be known in-vocab by the caller's contract)."""
    toks = F.split(F.trim(F.col("seg")), SEP)
    wtok = F.broadcast(vocab.select(
        "word", F.size(toks).alias("w_toks"),
        F.trim(F.col("seg")).alias("w_seg")))
    ex = (df.select(F.col(id_col),
                    F.posexplode(_norm_words(df, text_col))
                    .alias("pos", "word"))
          .join(wtok, "word", "left" if merges is not None else "inner"))
    if merges is not None:
        ex = ex.withColumn(
            "w_seg",
            F.coalesce(F.col("w_seg"),
                       F.trim(apply_merges(_seg0(F.col("word")), merges))))
        ex = ex.withColumn(
            "w_toks",
            F.coalesce(F.col("w_toks"),
                       F.size(F.split(F.col("w_seg"), SEP))))
    per_doc = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("w_toks").cast("bigint").alias("n_tokens"),
        F.array_join(
            F.slice(
                F.flatten(F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w_seg"))),
                    lambda s: F.split(s["w_seg"], SEP))),
                1, 12),
            " ").alias("tokens_prefix"),
    )
    return per_doc


def chunk_documents(df: DataFrame, vocab: DataFrame, id_col: str,
                    text_col: str = "text",
                    budget_tokens: int = 128,
                    merges: list[tuple[str, str]] | None = None) -> DataFrame:
    """Token-budget document chunking — the context-window packing
    step between a cleaned corpus and a trainer/RAG indexer: sentences
    stay whole, and a sentence starts a new chunk when its START
    offset crosses a multiple of the budget (pure integer rule, so
    chunk boundaries are bit-identical cross-engine; a sentence longer
    than the budget owns its chunk).

    Per-sentence token counts come from the trained BPE vocabulary
    (broadcast join — text never shuffles); the cumulative layout is
    one window sum per document. With ``merges`` given, OOV words
    count via the scan-side merge-replay fallback (see
    :func:`bpe_doc_tokens`); otherwise inputs must be in-vocab.
    Returns (id, chunk_id, n_sentences, n_tokens, first_sent_idx)."""
    from pyspark.sql import Window

    from montandon_etl_spark.sources.payload import split_sentences

    sents = split_sentences(df, id_col, text_col)
    toks = F.split(F.trim(F.col("seg")), SEP)
    wtok = F.broadcast(vocab.select("word", F.size(toks).alias("w_toks")))
    sw = (
        sents.select(F.col(id_col), "sent_idx",
                     F.explode(_norm_words(sents, "sentence")).alias("word"))
        .join(wtok, "word", "left" if merges is not None else "inner")
    )
    if merges is not None:
        sw = sw.withColumn(
            "w_toks",
            F.coalesce(
                F.col("w_toks"),
                F.size(F.split(
                    F.trim(apply_merges(_seg0(F.col("word")), merges)),
                    SEP))))
    sw = (sw.groupBy(id_col, "sent_idx")
          .agg(F.sum("w_toks").cast("bigint").alias("s_toks")))
    w = Window.partitionBy(id_col).orderBy("sent_idx")
    packed = (
        sw.withColumn("_cum", F.sum("s_toks").over(w))
        .withColumn("chunk_id",
                    F.expr(f"cast((_cum - s_toks) div {budget_tokens} as int)"))
    )
    return packed.groupBy(id_col, "chunk_id").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.sum("s_toks").cast("bigint").alias("n_tokens"),
        F.min("sent_idx").alias("first_sent_idx"),
    )
