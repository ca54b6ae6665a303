"""WordPiece subword encoding — greedy longest-match-first against a
given vocabulary (Wu et al. 2016 "Google's Neural Machine Translation
System", the BERT tokenizer's inference algorithm; public). The BPE
module covers the merge-REPLAY tokenizer family; this is the other
production encoder: no merge history, just a vocabulary where
continuation pieces carry a ``##`` prefix, and each word is consumed
left to right taking the LONGEST vocabulary piece that matches at the
cursor. A word with no match at some cursor encodes as the single
``[UNK]`` token (whole-word failure, BERT semantics).

Text normalization is shared with ``operators/bpe`` (lowercase, keep
``[a-z0-9]``, split on everything else) so the two tokenizer families
agree on what a word is.

100-TB shape (the ``bpe_doc_tokens`` contract): encoding runs once per
DISTINCT word — the distinct-word table is Heaps-law bounded
(O(corpus^~0.5) entries), not corpus-bounded — in ONE Arrow batch pass
with the vocabulary BROADCAST as two plain Python sets (production
vocabularies are 30k–100k strings, single-digit MBs); documents then
take their token counts via a broadcast join of the word table, so
document text never shuffles and per-doc aggregation is the only
shuffle. Greedy matching is O(len²) set probes per distinct word
worst-case — bounded by ``max_word_len`` exactly as BERT bounds it
(longer words are UNK without scanning).

Determinism: the encoding is a pure function of (word, vocab) — no
floats anywhere — so a SQL oracle can replay the greedy walk exactly
(the driver query does, with a recursive CTE over a join-built
longest-match table).

Reference lineage: the reference measures documents in characters
(apps/etl/transform); token accounting against a FIXED released
vocabulary (as opposed to training one — bpe.py) is what a curation
pipeline runs when the tokenizer is already shipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.operators.bpe import _norm_words

UNK = "[UNK]"


def _encode_word(word: str, base: set, cont: set,
                 max_word_len: int) -> list[str] | None:
    """Pure-Python greedy longest-match; None = UNK (no piece matches
    at some cursor, or the word exceeds ``max_word_len``)."""
    n = len(word)
    if n > max_word_len:
        return None
    toks: list[str] = []
    pos = 0
    while pos < n:
        vocab = base if pos == 0 else cont
        for ln in range(n - pos, 0, -1):
            piece = word[pos:pos + ln]
            if piece in vocab:
                toks.append(piece if pos == 0 else "##" + piece)
                pos += ln
                break
        else:
            return None
    return toks


def wordpiece_word_tokens(words: DataFrame, vocab: DataFrame,
                          word_col: str = "word",
                          token_col: str = "token",
                          max_word_len: int = 64) -> DataFrame:
    """Encode a DISTINCT-word table: ``(word, toks array<string>,
    n_toks, is_unk)`` — UNK words carry ``[UNK]`` as their single
    token. ``vocab`` is one string column where ``##``-prefixed rows
    are continuation pieces (the BERT vocab file shape); it is
    collected and broadcast (bounded by vocabulary size, never by
    data)."""
    pieces = [r[0] for r in vocab.select(token_col).distinct().collect()]
    base = {p for p in pieces if not p.startswith("##") and p}
    cont = {p[2:] for p in pieces if p.startswith("##") and len(p) > 2}

    def enc(it):
        import pandas as pd

        for pdf in it:
            out_t, out_n, out_u = [], [], []
            for w in pdf[word_col]:
                toks = _encode_word(str(w), base, cont, max_word_len)
                if toks is None:
                    out_t.append([UNK]); out_n.append(1); out_u.append(True)
                else:
                    out_t.append(toks)
                    out_n.append(len(toks))
                    out_u.append(False)
            yield pd.DataFrame({word_col: pdf[word_col], "toks": out_t,
                                "n_toks": out_n, "is_unk": out_u})

    return words.select(word_col).distinct().mapInPandas(
        enc, schema=f"{word_col} string, toks array<string>, "
                    f"n_toks int, is_unk boolean")


def wordpiece_encode(docs: DataFrame, vocab: DataFrame,
                     id_col: str = "doc_id", text_col: str = "text",
                     token_col: str = "token", max_word_len: int = 64,
                     prefix_k: int = 8) -> DataFrame:
    """Per-document WordPiece accounting against a fixed vocabulary:
    ``(doc_id, n_words, n_tokens, n_unk, tok_prefix)`` — token totals,
    UNK-word count, and the document's first ``prefix_k`` tokens
    space-joined (the eyeball/debug column; built from the first
    ``prefix_k`` words only, so the per-doc collected state is
    bounded). Empty documents report zeros and an empty prefix."""
    words = (docs
             .select(F.col(id_col).alias("doc_id"),
                     F.posexplode_outer(_norm_words(docs, text_col))
                     .alias("pos", "word")))
    wt = wordpiece_word_tokens(
        words.select("word").filter(F.col("word").isNotNull()),
        vocab, token_col=token_col, max_word_len=max_word_len)
    joined = words.join(F.broadcast(wt), "word", "left")
    agg = (joined.groupBy("doc_id").agg(
        F.count(F.col("word")).alias("n_words"),
        F.coalesce(F.sum("n_toks"), F.lit(0)).cast("bigint")
        .alias("n_tokens"),
        F.coalesce(F.sum(F.when(F.col("is_unk"), 1).otherwise(0)),
                   F.lit(0)).cast("bigint").alias("n_unk"),
        F.sort_array(F.collect_list(
            F.when(F.col("pos") < prefix_k,
                   F.struct(F.col("pos"), F.col("toks"))))).alias("_pf")))
    return agg.select(
        F.col("doc_id").alias(id_col), "n_words", "n_tokens", "n_unk",
        F.array_join(
            F.slice(F.flatten(F.transform(F.col("_pf"),
                                          lambda s: s["toks"])),
                    1, prefix_k), " ").alias("tok_prefix"))
