"""BPE tokenizer: hand-checked merges on a tiny corpus, the
non-overlapping left-to-right merge semantics (the 3-space-separator
replace trick), and OOV encoding via the compiled merge program."""

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.bpe import (
    SEP,
    apply_merges,
    bpe_doc_tokens,
    train_bpe,
    word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


def test_train_merges_hand_checked(spark):
    """Sennrich-style example: 'low'x5 'lower'x2 'newest'x6 'widest'x3.
    Round 1: pair (e,s) occurs 6+3=9 times — wait, (s,t) also 9; and
    (t,</w>) 9. Tie-break is lexicographic: (e,s) < (s,t) < (t,</w>).
    So merge 1 = (e,s); merge 2 = (es,t) 9; merge 3 = (est,</w>) 9."""
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    merges, vocab = train_bpe(spark, _docs(spark, [" ".join(corpus)]), 3)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]
    segs = {r["word"]: r["seg"].strip() for r in vocab.collect()}
    assert segs["newest"] == f"n{SEP}e{SEP}w{SEP}est</w>"
    assert segs["low"] == f"l{SEP}o{SEP}w{SEP}</w>"


def test_overlapping_pairs_merge_leftmost_nonoverlapping(spark):
    """'aaaa' under merge (a,a): leftmost non-overlapping → aa aa
    (classic BPE; a single pass via the 3-space replace), 'aaa' → aa a
    (the odd tail stays). Round 2 ties (aa,aa)=2 with (aa,</w>)=2 and
    the lexicographic tie-break picks (aa,</w>) ('<' sorts below
    'a')."""
    merges, vocab = train_bpe(spark, _docs(spark, ["aaaa aaaa aaa"]), 2)
    assert merges == [("a", "a"), ("aa", "</w>")]
    segs = {r["word"]: r["seg"].strip() for r in vocab.collect()}
    assert segs["aaaa"] == f"aa{SEP}aa</w>"
    assert segs["aaa"] == f"aa{SEP}a{SEP}</w>"


def test_apply_merges_matches_training_replay(spark):
    """Encoding an unseen word through the compiled merge program must
    equal what training-replay segmentation would produce."""
    corpus = ["the cat sat on the mat the bat"] * 3
    merges, vocab = train_bpe(spark, _docs(spark, corpus), 6)
    from montandon_etl_spark.operators.bpe import _seg0
    oov = spark.createDataFrame([("rat",), ("that",)], "word string")
    got = {r["word"]: r["enc"].strip() for r in oov.select(
        "word", apply_merges(_seg0(F.col("word")), merges).alias("enc")
    ).collect()}
    # 'at' family merges learned from cat/sat/mat/bat apply to rat/that
    trained_at = any(a + b == "at" for a, b in merges) or any(
        "at" in (a + b) for a, b in merges)
    assert trained_at
    for w, enc in got.items():
        toks = enc.split(SEP)
        assert "".join(toks).replace("</w>", "") == w  # lossless
    # vocabulary words re-encoded through the program == stored segs
    vw = vocab.select("word", "seg",
                      apply_merges(_seg0(F.col("word")), merges).alias("enc"))
    assert vw.filter(F.col("seg") != F.col("enc")).count() == 0


def test_doc_tokens_accounting(spark):
    docs = _docs(spark, ["low low newest", "widest lower", ""])
    merges, vocab = train_bpe(spark, docs, 2)
    out = {r["doc_id"]: r for r in
           bpe_doc_tokens(docs, vocab, "doc_id").collect()}
    assert out[0]["n_words"] == 3
    assert 2 not in out  # empty doc drops out
    segs = {r["word"]: r["seg"] for r in vocab.collect()}
    want0 = sum(len(segs[w].strip().split(SEP))
                for w in ("low", "low", "newest"))
    assert out[0]["n_tokens"] == want0
    # prefix preserves word order
    assert out[1]["tokens_prefix"].startswith(
        " ".join(segs["widest"].strip().split(SEP))[:6])


def test_word_counts_normalization(spark):
    docs = _docs(spark, ["Hello, WORLD!! hello-world 42"])
    got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
    assert got == {"hello": 2, "world": 2, "42": 1}


def test_chunk_documents_packing(spark):
    """Chunk boundaries: sentences whole, a sentence opens chunk k
    when its start offset crosses k*budget; chunk token sums
    reconstruct the doc total; layout-invariant."""
    from montandon_etl_spark.operators.bpe import (
        bpe_doc_tokens,
        chunk_documents,
        train_bpe,
    )

    texts = ["one two three. four five. six seven eight nine. ten."]
    docs = _docs(spark, texts * 2)  # two identical docs
    merges, vocab = train_bpe(spark, docs, 4)
    out = chunk_documents(docs, vocab, "doc_id", budget_tokens=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    tot = {r["doc_id"]: r["n_tokens"]
           for r in bpe_doc_tokens(docs, vocab, "doc_id").collect()}
    for d, rows in by_doc.items():
        assert sum(r["n_tokens"] for r in rows) == tot[d]
        # chunk ids contiguous from 0 in first-sentence order
        rows = sorted(rows, key=lambda r: r["first_sent_idx"])
        assert rows[0]["chunk_id"] == 0
        assert all(rows[i]["chunk_id"] <= rows[i + 1]["chunk_id"]
                   for i in range(len(rows) - 1))
    # identical docs chunk identically
    a, b = (sorted(((r["chunk_id"], r["n_sentences"], r["n_tokens"])
                    for r in by_doc[d])) for d in sorted(by_doc))
    assert a == b


def _ref_bpe(texts, n_merges):
    """Independent pure-Python BPE reference (dict/list algorithm, no
    string-replace trick): returns (merges, {word: token tuple})."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split():
            words[w] += 1
    segs = {w: tuple(w) + ("</w>",) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, n in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        # tie-break: highest count, then lexicographically SMALLEST pair
        top = max(pc.values())
        pair = min(p for p, c in pc.items() if c == top)
        if pc[pair] < 2:
            break
        merges.append(pair)
        a, b = pair
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
    return merges, segs


def test_doc_tokens_oov_fallback(spark):
    """Encoding a corpus the tokenizer was NOT trained on: with
    merges= the encoders left-join the vocab and replay the merge
    program for unseen words — token counts match per-word
    apply_merges, and an all-OOV document does NOT vanish."""
    from montandon_etl_spark.operators.bpe import _seg0, chunk_documents

    train = _docs(spark, ["low low lower newest newest widest"])
    merges, vocab = train_bpe(spark, train, 3)
    # 'slowest' and 'zzz' are OOV; doc 1 is ALL-OOV
    docs = _docs(spark, ["low slowest newest", "zzz qqq"])
    out = {r["doc_id"]: r for r in
           bpe_doc_tokens(docs, vocab, "doc_id", merges=merges).collect()}
    assert set(out) == {0, 1}
    assert out[1]["n_words"] == 2  # all-OOV doc present and counted
    oov = spark.createDataFrame([("slowest",), ("zzz",), ("qqq",)],
                                "word string")
    enc = {r["word"]: r["enc"].strip().split(SEP) for r in oov.select(
        "word", apply_merges(_seg0(F.col("word")), merges).alias("enc")
    ).collect()}
    segs = {r["word"]: r["seg"].strip().split(SEP) for r in vocab.collect()}
    want0 = (len(segs["low"]) + len(enc["slowest"]) + len(segs["newest"]))
    assert out[0]["n_tokens"] == want0
    assert out[1]["n_tokens"] == len(enc["zzz"]) + len(enc["qqq"])
    # without merges= the legacy inner-join contract holds (OOV drops)
    legacy = {r["doc_id"]: r for r in
              bpe_doc_tokens(docs, vocab, "doc_id").collect()}
    assert 1 not in legacy and legacy[0]["n_words"] == 2
    # chunking with the fallback accounts every sentence's OOV words
    ch = chunk_documents(docs, vocab, "doc_id", budget_tokens=4,
                         merges=merges).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["n_tokens"]
    assert by_doc == {0: out[0]["n_tokens"], 1: out[1]["n_tokens"]}


def test_batched_training_equals_sequential(spark):
    """batch_k>1 must produce the IDENTICAL merge list and
    segmentations as the classic one-merge-per-round algorithm — the
    _safe_batch prefix/disjoint/hazard guards are sound, on corpora
    engineered to stress created-symbol interactions ('cab...xy'
    style) as well as random ones."""
    import random

    rng = random.Random(20260818)
    corpora = [
        # created-pair hazard: after (a,b), (c,ab) outranks (x,y)
        " ".join(["cab"] * 9 + ["xy"] * 4),
        # equal-count created-pair tie: (ab,</w>) ties batched (c,d)
        " ".join(["zab"] * 5 + ["cd"] * 5),
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest",
    ]
    alphabet = "abcxz0"
    for _ in range(4):
        lex = ["".join(rng.choice(alphabet)
                       for _ in range(rng.randint(1, 5)))
               for _ in range(rng.randint(4, 15))]
        corpora.append(" ".join(rng.choice(lex + [w + w for w in lex[:2]])
                                for _ in range(rng.randint(15, 60))))
    for text in corpora:
        n_merges = 8
        seq_m, seq_v = train_bpe(spark, _docs(spark, [text]), n_merges,
                                 batch_k=1)
        bat_m, bat_v = train_bpe(spark, _docs(spark, [text]), n_merges,
                                 batch_k=8)
        assert bat_m == seq_m, text
        a = {r["word"]: r["seg"] for r in seq_v.collect()}
        b = {r["word"]: r["seg"] for r in bat_v.collect()}
        assert a == b, text


def test_bpe_matches_python_reference_randomized(spark):
    """Property test: the string-replace training program must equal an
    independent tuple-based reference BPE (merges AND final
    segmentations) on randomized corpora — including adjacent-repeat
    words that stress the non-overlapping merge semantics."""
    import random

    rng = random.Random(20260817)
    alphabet = "abcz01"
    for trial in range(6):
        n_words = rng.randint(5, 25)
        lex = ["".join(rng.choice(alphabet)
                       for _ in range(rng.randint(1, 6)))
               for _ in range(n_words)]
        # repeat-heavy text (shared prefixes/suffixes + doubled chars)
        text = " ".join(rng.choice(lex + [w + w for w in lex[:3]])
                        for _ in range(rng.randint(20, 80)))
        n_merges = rng.randint(1, 10)
        want_merges, want_segs = _ref_bpe([text], n_merges)
        from montandon_etl_spark.operators.bpe import SEP, train_bpe
        got_merges, vocab = train_bpe(spark, _docs(spark, [text]), n_merges)
        assert got_merges == want_merges, (trial, text)
        got_segs = {r["word"]: tuple(r["seg"].strip().split(SEP))
                    for r in vocab.collect()}
        assert got_segs == {w: s for w, s in want_segs.items()}, (trial, text)
