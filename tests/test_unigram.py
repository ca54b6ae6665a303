"""Unigram-LM tokenizer: Viterbi DP correctness against an
independent pure-Python replay, trainer determinism, and UNK edges."""

from __future__ import annotations

import math
import random
import re

from montandon_etl_spark.operators.unigram import (
    UNK, _viterbi, unigram_encode, unigram_train, unigram_vocab,
    unigram_word_segments)


# ------------------------------------------------- independent replay
def _norm(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
            if w]


def _ref_vocab(texts, max_piece_len=4, min_count=2, top_k=2000):
    """Tuple-based reimplementation of unigram_vocab (shares no code
    with the module)."""
    cnt: dict[str, int] = {}
    for t in texts:
        for w in _norm(t):
            for m in range(1, max_piece_len + 1):
                for i in range(len(w) - m + 1):
                    p = w[i:i + m]
                    cnt[p] = cnt.get(p, 0) + 1
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    ngrams = sorted(((p, c) for p, c in cnt.items()
                     if len(p) >= 2 and c >= min_count),
                    key=lambda x: (-x[1], x[0]))[:top_k]
    voc = dict(chars)
    voc.update(dict(ngrams))
    total = float(sum(voc.values()))
    return {p: math.floor(math.log(c / total) * 1e6 + 0.5)
            for p, c in voc.items()}


def _ref_viterbi(word, scores, max_piece_len=4):
    """Brute-force over ALL segmentations (exponential — test words
    are short), maximizing (score_sum, -n_pieces)."""
    best = None

    def rec(pos, acc, n):
        nonlocal best
        if pos == len(word):
            key = (acc, -n)
            if best is None or key > best:
                best = key
            return
        for m in range(1, min(max_piece_len, len(word) - pos) + 1):
            s = scores.get(word[pos:pos + m])
            if s is not None:
                rec(pos + m, acc + s, n + 1)

    rec(0, 0, 0)
    return None if best is None else (best[0], -best[1])


def test_viterbi_matches_bruteforce_and_tiebreak():
    rng = random.Random(11)
    alphabet = "abc"
    scores = {c: -1_000_000 for c in alphabet}
    scores.update({"ab": -1_500_000, "bc": -1_500_000, "abc": -2_800_000,
                   "aa": -2_000_001, "cab": -3_100_000})
    for _ in range(300):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        got = _viterbi(w, scores, 4, 64)
        want = _ref_viterbi(w, scores)
        assert got is not None and want is not None
        assert (got[2], got[1]) == want, w
        assert "".join(got[0]) == w
    # explicit tie: 'ab'+'c' vs 'a'+'bc' both score -2.5; equal n → the
    # combined VALUE is identical either way (that's the contract)
    g = _viterbi("abc", scores, 4, 64)
    assert g[1] == 2 and g[2] == -2_500_000


def test_viterbi_unk_paths():
    scores = {"a": -1_000_000}
    assert _viterbi("ab", scores, 4, 64) is None      # 'b' not in vocab
    assert _viterbi("a" * 65, scores, 4, 64) is None  # too long
    assert _viterbi("aa", scores, 4, 64) == (["a", "a"], 2, -2_000_000)


def test_spark_encode_matches_python_replay(spark):
    rng = random.Random(7)
    base = ["the quick brown fox", "jumped over the lazy dog",
            "tokenization of subwords", "zzz qqq xxyyzz"]
    rows = [(i, " ".join(rng.choice(base) for _ in range(rng.randint(1, 3))))
            for i in range(120)] + [(999, ""), (998, "!!! ???")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    voc = unigram_vocab(docs, min_count=2, top_k=300)
    got = {r["doc_id"]: (r["n_words"], r["n_pieces"],
                         r["neg_logprob_micro"])
           for r in unigram_encode(docs, voc).collect()}
    ref_scores = _ref_vocab([t for _, t in rows], min_count=2, top_k=300)
    for did, text in rows:
        words = _norm(text)
        np_, sc = 0, 0
        for w in words:
            r = _viterbi(w, ref_scores, 4, 64)
            assert r is not None
            np_ += r[1]
            sc += r[2]
        assert got[did] == (len(words), np_, -sc), did
    got2 = {r["doc_id"]: (r["n_words"], r["n_pieces"],
                          r["neg_logprob_micro"])
            for r in unigram_encode(docs.repartition(7), voc).collect()}
    assert got2 == got


def test_word_segments_unk_and_short_words(spark):
    docs = spark.createDataFrame(
        [(1, "aa ab aa a")], "doc_id bigint, text string")
    voc = unigram_vocab(docs, min_count=1, top_k=10)
    words = spark.createDataFrame(
        [("aa",), ("a",), ("qq",), ("a" * 70,)], "word string")
    seg = {r["word"]: r for r in
           unigram_word_segments(words, voc).collect()}
    # empirical frequencies: s('a')=ln(.6), s('aa')=ln(.2) → two 'a's
    # beat one 'aa' (2·ln .6 > ln .2); the DP must pick the char path
    assert not seg["aa"]["is_unk"] and seg["aa"]["pieces"] == ["a", "a"]
    assert seg["a"]["pieces"] == ["a"]          # 1-char word segments
    assert seg["qq"]["is_unk"] and seg["qq"]["pieces"] == [UNK]
    assert seg["a" * 70]["is_unk"]              # max_word_len bound


def test_train_hard_em_deterministic_and_useful(spark):
    """Spark hard-EM trainer ≡ an independent pure-Python replay of
    the same algorithm, and a dominant substring survives pruning and
    is USED in segmentation."""
    rows = [(i, "running jumping walking talking " * 2) for i in range(20)]
    rows += [(100 + i, "xq zv") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["piece"]: r["score_micro"]
           for r in unigram_train(docs, vocab_size=30, n_iters=2,
                                  min_count=2, seed_top_k=200).collect()}

    # ---- pure-Python replay of the trainer ----
    texts = [t for _, t in rows]
    wf: dict[str, int] = {}
    for t in texts:
        for w in _norm(t):
            wf[w] = wf.get(w, 0) + 1
    scores = _ref_vocab(texts, min_count=2, top_k=200)
    for _ in range(2):
        pc: dict[str, int] = {}
        for w, f in wf.items():
            r = _viterbi(w, scores, 4, 64)
            if r is None:
                continue
            for p in r[0]:
                pc[p] = pc.get(p, 0) + f
        chars = {p: c for p, c in pc.items() if len(p) == 1}
        multi = sorted(((p, c) for p, c in pc.items() if len(p) >= 2),
                       key=lambda x: (-x[1], x[0]))[:30]
        kept = dict(chars)
        kept.update(dict(multi))
        total = float(sum(c + 1 for c in kept.values()))
        scores = {p: math.floor(math.log((c + 1) / total) * 1e6 + 0.5)
                  for p, c in kept.items()}
    assert got == scores
    # 'ing' is in every frequent word → must survive and be used
    assert "ing" in got
    seg = _viterbi("running", got, 4, 64)
    assert "ing" in seg[0]
