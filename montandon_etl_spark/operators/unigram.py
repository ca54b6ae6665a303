"""Unigram-LM subword tokenization — Viterbi segmentation against a
scored piece vocabulary (Kudo 2018, "Subword Regularization", the
SentencePiece unigram model; public). Completes the production
tokenizer triple: ``bpe.py`` is merge-replay, ``wordpiece.py`` is
greedy longest-match, and this is the probabilistic family — each word
segments into the piece sequence maximizing the sum of piece
log-probabilities.

Text normalization is shared with ``operators/bpe`` (lowercase, keep
``[a-z0-9]``, split on everything else) so all three tokenizer
families agree on what a word is.

Determinism contract (what makes a SQL oracle possible): piece scores
are ln(count/total) snapped to integer micro-units (the ``dsir`` /
``train_logistic`` ULP-absorption trick — ONE IEEE ``ln`` per piece,
then pure integers). The Viterbi DP maximizes a single combined BIGINT
weight ``1000·Σscore − n_pieces`` so the score-then-fewest-pieces
tie-break folds into exact integer arithmetic: the optimum VALUE is
unique even where segmentations tie, and a DuckDB recursive CTE
replays the DP bit-for-bit (per step, one LEFT JOIN per piece length
against the vocab — piece lengths are bounded by ``max_piece_len``).

100-TB shape (the ``wordpiece_encode`` contract): the DP runs once per
DISTINCT word — Heaps-law bounded, not corpus-bounded — in ONE Arrow
batch pass with the vocabulary broadcast as a plain dict (production
unigram vocabularies are 32k–100k pieces, single-digit MBs); documents
take their piece counts via a broadcast word join, so document text
never shuffles. Vocabulary derivation is two bounded aggregations over
exploded substrings (O(Σ|word|·max_piece_len) candidate rows, pruned
by min_count/top_k before anything is collected).

Training (``unigram_train``) is deterministic hard-EM (Viterbi-EM):
E-step re-segments the distinct-word table under current scores,
M-step re-scores pieces from corpus-frequency-weighted piece counts
(Laplace +1 so surviving pieces never hit ln(0)) and prunes to the
top ``vocab_size`` by (count desc, piece asc), single characters
always retained (Kudo's character-coverage floor). Each round is one
Arrow pass + one aggregation + one bounded vocab collect — the same
driver-round shape as BPE training, but rounds are O(1) per vocab
(2–3 EM sweeps), not O(vocab).

Reference lineage: the reference measures documents in characters
(apps/etl/transform.py); token accounting against a probabilistic
vocabulary is the third encoder a curation pipeline meets in the wild
(Llama/T5-family tokenizers are unigram models).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.bpe import _norm_words

UNK = "[UNK]"
MICRO = 1_000_000.0
# combined DP weight = PIECE_W * Σ score_micro − n_pieces.
# n_pieces ≤ max_word_len < PIECE_W keeps the two components separable
# by div/mod, and |score_micro| ≤ ~25e6 × 64 pieces × 1000 ≈ 1.6e12
# stays far inside BIGINT.
PIECE_W = 1000



def _topk_pieces(df, k: int):
    """Exact global top-k of (piece, ...) rows under (c DESC, piece
    ASC) WITHOUT an unpartitioned window (a single task sorting the
    whole distinct-substring table, VERDICT r5 Next #6): a per-hash-
    bucket top-k first — every global top-k row is in its bucket's
    top-k under the same total order — then the final rank over the
    <= n_buckets*k survivors, bounded by configuration, never by the
    piece table."""
    from pyspark.sql import Window

    from montandon_etl_spark.operators.dedup import hash60

    n_b = 32
    wb = Window.partitionBy("_tb").orderBy(F.col("c").desc(), F.col("piece"))
    w = Window.orderBy(F.col("c").desc(), F.col("piece"))
    return (df.withColumn("_tb", F.pmod(hash60(F.col("piece")), F.lit(n_b))
                          .cast("int"))
            .withColumn("_rk", F.row_number().over(wb))
            .filter(F.col("_rk") <= k).drop("_rk", "_tb")
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))

def _snap_ln_score(count_col: F.Column, total: int) -> F.Column:
    """ln(count/total) in integer micro-units — floor(x·1e6 + 0.5),
    the one float in the pipeline (dsir.py's ULP-absorption snap)."""
    ratio = count_col.cast("double") / F.lit(float(total))
    return F.floor(F.log(ratio) * F.lit(MICRO) + F.lit(0.5)).cast("bigint")


def _word_occurrences(docs: DataFrame, text_col: str) -> DataFrame:
    """One row per word OCCURRENCE (corpus multiplicity preserved)."""
    return docs.select(F.explode(_norm_words(docs, text_col)).alias("word"))


def _piece_counts(occ: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, len, c): corpus-frequency-weighted substring counts for
    all piece lengths 1..max_piece_len."""
    # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) — a word shorter
    # than m must produce an empty list, not substring(word, 0, m)
    subs = F.flatten(F.expr(
        f"transform(sequence(1, {max_piece_len}), m -> "
        f"if(length(word) >= m, "
        f"transform(sequence(1, length(word) - m + 1), "
        f"i -> substring(word, i, m)), "
        f"cast(array() as array<string>)))"))
    return (occ.select(F.explode(subs).alias("piece"))
            .groupBy("piece")
            .agg(F.count(F.lit(1)).alias("c"))
            .select("piece", F.length("piece").alias("len"), "c"))


def unigram_vocab(docs: DataFrame, text_col: str = "text",
                  max_piece_len: int = 4, min_count: int = 2,
                  top_k: int = 2000) -> DataFrame:
    """Deterministic data-derived piece vocabulary ``(piece,
    score_micro)``: every observed single character (the coverage
    floor), plus the ``top_k`` substrings of length 2..max_piece_len
    with corpus count ≥ min_count, ranked (count desc, piece asc).
    Scores are micro-snapped ln(count/total) over the SELECTED vocab's
    count mass — the empirical-frequency initialization of the unigram
    model (EM refinement is ``unigram_train``).

    The ranking window is global but runs over the distinct-substring
    table, bounded by alphabet combinatorics (≤ 37^max_piece_len ≈
    1.9M rows at the default), never by corpus size."""
    cnt = _piece_counts(_word_occurrences(docs, text_col), max_piece_len)
    chars = cnt.filter(F.col("len") == 1)
    ngrams = _topk_pieces(
        cnt.filter((F.col("len") >= 2) & (F.col("c") >= min_count)), top_k)
    vocab = chars.select("piece", "c").unionByName(
        ngrams.select("piece", "c"))
    total = vocab.agg(F.sum("c")).collect()[0][0] or 1
    return vocab.select(
        "piece", _snap_ln_score(F.col("c"), int(total)).alias("score_micro"))


def _viterbi(word: str, scores: dict, max_piece_len: int,
             max_word_len: int):
    """Pure-Python combined-weight DP. Returns (pieces, n_pieces,
    score_micro) or None when the word is unsegmentable or too long
    (whole-word UNK, wordpiece semantics). Integer-only."""
    n = len(word)
    if n > max_word_len:
        return None
    # best[i] = max combined weight over segmentations of word[:i]
    best = [0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        cand_v, cand_m = None, 0
        for m in range(min(max_piece_len, i), 0, -1):
            prev = best[i - m]
            if prev is None:
                continue
            s = scores.get(word[i - m:i])
            if s is None:
                continue
            v = prev + PIECE_W * s - 1
            # ties prefer the longest piece (first hit in this loop);
            # the VALUE is tie-free by construction either way
            if cand_v is None or v > cand_v:
                cand_v, cand_m = v, m
        best[i], back[i] = cand_v, cand_m
    if best[n] is None:
        return None
    pieces, i = [], n
    while i > 0:
        m = back[i]
        pieces.append(word[i - m:i])
        i -= m
    pieces.reverse()
    n_pieces = (-best[n]) % PIECE_W
    score = (best[n] + n_pieces) // PIECE_W
    return pieces, n_pieces, score


def unigram_word_segments(words: DataFrame, vocab: DataFrame,
                          word_col: str = "word",
                          max_piece_len: int = 4,
                          max_word_len: int = 64,
                          unk_score_micro: int = -25_000_000) -> DataFrame:
    """Viterbi-segment a DISTINCT-word table: ``(word, pieces
    array<string>, n_pieces, score_micro, is_unk)``. The vocabulary is
    collected and broadcast as a plain dict (bounded by vocab size,
    never by data); segmentation is one Arrow batch pass."""
    scores = {r["piece"]: r["score_micro"]
              for r in vocab.select("piece", "score_micro").collect()}

    def seg(it):
        import pandas as pd

        for pdf in it:
            P, N, S, U = [], [], [], []
            for w in pdf[word_col]:
                r = _viterbi(str(w), scores, max_piece_len, max_word_len)
                if r is None:
                    P.append([UNK]); N.append(1)
                    S.append(unk_score_micro); U.append(True)
                else:
                    P.append(r[0]); N.append(r[1])
                    S.append(r[2]); U.append(False)
            yield pd.DataFrame({word_col: pdf[word_col], "pieces": P,
                                "n_pieces": N, "score_micro": S,
                                "is_unk": U})

    return words.select(word_col).distinct().mapInPandas(
        seg, schema=f"{word_col} string, pieces array<string>, "
                    f"n_pieces int, score_micro bigint, is_unk boolean")


def unigram_encode(docs: DataFrame, vocab: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   max_piece_len: int = 4, max_word_len: int = 64,
                   unk_score_micro: int = -25_000_000) -> DataFrame:
    """Per-document unigram-LM accounting: ``(doc_id, n_words,
    n_pieces, neg_logprob_micro)`` — word count, optimal total piece
    count, and the corpus negative log-likelihood of the document in
    exact integer micro-units (Σ of per-word Viterbi scores, UNK words
    contributing ``-unk_score_micro``). Empty documents report zeros.
    Text never shuffles: distinct words segment once, documents take
    counts via a broadcast word join."""
    words = docs.select(F.col(id_col).alias("doc_id"),
                        F.explode_outer(_norm_words(docs, text_col))
                        .alias("word"))
    wt = unigram_word_segments(
        words.select("word").filter(F.col("word").isNotNull()),
        vocab, max_piece_len=max_piece_len, max_word_len=max_word_len,
        unk_score_micro=unk_score_micro)
    joined = words.join(
        F.broadcast(wt.drop("pieces", "is_unk")), "word", "left")
    return (joined.groupBy("doc_id")
            .agg(F.count("word").alias("n_words"),
                 F.coalesce(F.sum("n_pieces"), F.lit(0)).cast("bigint")
                 .alias("n_pieces"),
                 F.coalesce(-F.sum("score_micro"), F.lit(0))
                 .cast("bigint").alias("neg_logprob_micro"))
            .select(F.col("doc_id").alias(id_col), "n_words",
                    "n_pieces", "neg_logprob_micro"))


def unigram_train(docs: DataFrame, text_col: str = "text",
                  max_piece_len: int = 4, min_count: int = 2,
                  seed_top_k: int = 2000, vocab_size: int = 500,
                  n_iters: int = 2, max_word_len: int = 64) -> DataFrame:
    """Deterministic hard-EM (Viterbi-EM) refinement of the seed
    vocabulary. Per round: segment every distinct word under current
    scores (one Arrow pass), count pieces weighted by corpus word
    frequency (one aggregation), keep single chars + the top
    ``vocab_size`` multi-char pieces by (count desc, piece asc), and
    re-score with Laplace +1 smoothed micro-snapped ln. Returns the
    final ``(piece, score_micro)`` vocabulary.

    Hard-EM (argmax E-step) instead of full forward-backward keeps
    every round's statistics exact integers — the property tests replay
    the whole trainer in pure Python bit-for-bit. Driver state per
    round is one vocab-bounded collect, same as BPE training."""
    occ = _word_occurrences(docs, text_col)
    wf = occ.groupBy("word").agg(F.count(F.lit(1)).alias("wf"))
    wf = wf.localCheckpoint()  # iterative loop: cut lineage per round
    vocab = unigram_vocab(docs, text_col, max_piece_len=max_piece_len,
                          min_count=min_count, top_k=seed_top_k)
    for _ in range(n_iters):
        seg = unigram_word_segments(
            wf.select("word"), vocab, max_piece_len=max_piece_len,
            max_word_len=max_word_len)
        counts = (seg.join(wf, "word")
                  .select(F.explode("pieces").alias("piece"), "wf")
                  .filter(F.col("piece") != UNK)
                  .groupBy("piece")
                  .agg(F.sum("wf").cast("bigint").alias("c")))
        chars = counts.filter(F.length("piece") == 1)
        multi = _topk_pieces(
            counts.filter(F.length("piece") >= 2), vocab_size)
        kept = chars.unionByName(multi)
        rows = kept.collect()  # bounded by vocab_size + |alphabet|
        total = sum(r["c"] + 1 for r in rows) or 1
        spark = docs.sparkSession
        vocab = spark.createDataFrame(
            [(r["piece"], r["c"]) for r in rows], "piece string, c bigint"
        ).select("piece",
                 _snap_ln_score(F.col("c") + 1, int(total))
                 .alias("score_micro"))
    return vocab
