"""WordPiece greedy longest-match encoding: engine output must equal
the textbook algorithm (BERT's own example included), UNK is
whole-word, matching is longest-first (not leftmost-shortest), and
results are identical on any partition layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from montandon_etl_spark.operators.wordpiece import (
    _encode_word, wordpiece_encode, wordpiece_word_tokens)

VOCAB = ["un", "runn", "run", "##ing", "##ning", "##n", "##i", "##g",
         "a", "##ffable", "##ff", "b", "##b", "c"]


def _vdf(spark, toks=VOCAB):
    return spark.createDataFrame([(t,) for t in toks], "token string")


def test_greedy_longest_match_reference_cases():
    base = {t for t in VOCAB if not t.startswith("##")}
    cont = {t[2:] for t in VOCAB if t.startswith("##")}
    # BERT's canonical example shape: un + ##ffable wins over un ##ff ...
    assert _encode_word("unffable", base, cont, 64) == ["un", "##ffable"]
    # longest FIRST piece: 'runn' beats 'run' at the cursor
    assert _encode_word("running", base, cont, 64) == ["runn", "##ing"]
    # and the shorter base piece only wins when the long one can't match
    assert _encode_word("runing", base, cont, 64) == ["run", "##ing"]
    # longest CONTINUATION piece: ##ning beats ##n at its cursor
    assert _encode_word("unning", base, cont, 64) == ["un", "##ning"]
    # no base piece at cursor 0 → UNK
    assert _encode_word("zebra", base, cont, 64) is None
    # tail fails mid-word → whole word UNK
    assert _encode_word("unz", base, cont, 64) is None
    # over the length bound → UNK without scanning
    assert _encode_word("ab", base, cont, 1) is None
    assert _encode_word("", base, cont, 64) == []


def test_word_table_and_doc_accounting(spark):
    docs = spark.createDataFrame(
        [(1, "unffable running a"),
         (2, "zebra a b"),          # one UNK word
         (3, ""),                   # empty doc
         (4, "A!  b?? C")],         # normalization: lowercase, strip
        "doc_id bigint, text string")
    wt = {r["word"]: (r["toks"], r["n_toks"], r["is_unk"])
          for r in wordpiece_word_tokens(
              spark.createDataFrame(
                  [("unffable",), ("zebra",), ("a",)], "word string"),
              _vdf(spark)).collect()}
    assert wt["unffable"] == (["un", "##ffable"], 2, False)
    assert wt["zebra"] == (["[UNK]"], 1, True)
    assert wt["a"] == (["a"], 1, False)

    out = {r["doc_id"]: r for r in wordpiece_encode(
        docs, _vdf(spark)).collect()}
    assert out[1]["n_words"] == 3
    assert out[1]["n_tokens"] == 2 + 2 + 1
    assert out[1]["n_unk"] == 0
    assert out[1]["tok_prefix"] == "un ##ffable runn ##ing a"
    assert out[2]["n_words"] == 3 and out[2]["n_unk"] == 1
    assert out[2]["n_tokens"] == 1 + 1 + 1
    assert out[2]["tok_prefix"] == "[UNK] a b"
    assert out[3]["n_words"] == 0 and out[3]["n_tokens"] == 0
    assert out[3]["tok_prefix"] == ""
    assert out[4]["n_words"] == 3
    assert out[4]["tok_prefix"] == "a b c"

    # layout invariance
    out2 = {r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_unk"],
                          r["tok_prefix"])
            for r in wordpiece_encode(docs.repartition(5),
                                      _vdf(spark)).collect()}
    assert out2 == {i: (r["n_words"], r["n_tokens"], r["n_unk"],
                        r["tok_prefix"]) for i, r in out.items()}


def test_engine_equals_python_reference_random(spark):
    """Seeded random words + a hash-derived vocab: the Arrow path must
    equal the pure-Python algorithm on every word."""
    import hashlib

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    words = sorted({f"w{h(str(i)) % 10**6:06d}"[:3 + h(str(i)) % 7]
                    for i in range(300)})
    grams3 = {w[i:i + 3] for w in words for i in range(len(w) - 2)}
    chars = {c for w in words for c in w}
    vocab = ([g for g in grams3 if h(g) % 5 == 0]
             + ["##" + g for g in grams3 if h("##" + g) % 5 == 0]
             + [c for c in chars if h(c) % 29 != 0]
             + ["##" + c for c in chars if h(c) % 29 != 0])
    base = {t for t in vocab if not t.startswith("##")}
    cont = {t[2:] for t in vocab if t.startswith("##")}
    got = {r["word"]: (r["toks"], r["is_unk"])
           for r in wordpiece_word_tokens(
               spark.createDataFrame([(w,) for w in words], "word string")
               .repartition(6),
               _vdf(spark, vocab)).collect()}
    n_unk = 0
    for w in words:
        want = _encode_word(w, base, cont, 64)
        if want is None:
            n_unk += 1
            assert got[w] == (["[UNK]"], True), w
        else:
            assert got[w] == (want, False), w
    assert 0 < n_unk < len(words)  # both branches exercised
