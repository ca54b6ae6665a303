"""BM25 lexical search (operators/text_index): the one-shot scorer
must match a pure-Python Okapi-BM25 reference bit-for-bit (integer
micro-unit contract), and the incrementally-maintained inverted index
must answer exactly the one-shot scorer over the surviving LWW state
after ANY sequence of upsert/update/delete batches — while touching
only the partitions its batches' terms own."""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.text_index import (
    TextIndex,
    bm25_topk,
    tokens_col,
)

TS0 = pd.Timestamp("2024-03-01")


def _toks(s: str) -> list[str]:
    return [t.lower() for t in re.findall(r"[A-Za-z0-9]+", s)]


def ref_bm25(docs: dict[int, str], queries: list[tuple[int, str]],
             k: int = 10, k1: float = 1.2, b: float = 0.75):
    """Pure-Python reference mirroring the engine's operation order:
    IDF and per-term contributions snapped to integer micro-units, the
    per-doc score an integer sum. A doc ranks iff it matches >= 1
    query term (tf > 0), even if its snapped score is 0."""
    toks = {d: _toks(s) for d, s in docs.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    out = []
    for qid, qtext in queries:
        qterms = sorted(set(_toks(qtext)))
        scores: dict[int, int] = {}
        for d, ts in toks.items():
            micro, matched = 0, False
            for t in qterms:
                tf = ts.count(t)
                if tf == 0:
                    continue
                matched = True
                df = sum(1 for x in toks.values() if t in x)
                idfm = math.floor(
                    math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                    * 1_000_000.0 + 0.5)
                idf = idfm / 1_000_000.0
                tfn = tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dl[d] / avgdl))
                micro += math.floor(idf * tfn * 1_000_000.0 + 0.5)
            if matched:
                scores[d] = micro
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend((qid, d, m / 1_000_000.0, r)
                   for r, (d, m) in enumerate(ranked, 1))
    return sorted(out)


CORPUS = {
    1: "spark shuffle join fast join plan",
    2: "slow table scan table table scan",
    3: "merge batch window spark window",
    4: "the quick brown fox jumps over the lazy dog",
    5: "join order and join strategy for a fast plan",
    6: "scan",          # single-token doc: extreme dl normalization
    7: "",               # zero-token doc: counts toward N, never ranks
}
QUERIES = [(0, "fast join plan"), (1, "table scan"),
           (2, "spark window xyzzy"), (3, "zzz qqq")]


def _docs_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(i, s) for i, s in docs.items()], "doc_id bigint, text string")


def _queries_df(spark):
    return spark.createDataFrame(
        [(int(i), s) for i, s in QUERIES], "query_id bigint, qtext string")


def _rows(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def test_bm25_matches_python_reference(spark):
    got = _rows(bm25_topk(_docs_df(spark, CORPUS), _queries_df(spark), k=10))
    assert got == ref_bm25(CORPUS, QUERIES, k=10)
    # the all-out-of-vocabulary query produced no rows at all
    assert not [r for r in got if r[0] == 3]
    # the OOV term in query 2 contributed nothing: same rows as the
    # query without it
    no_oov = _rows(bm25_topk(
        _docs_df(spark, CORPUS),
        spark.createDataFrame([(2, "spark window")],
                              "query_id bigint, qtext string"), k=10))
    assert no_oov == [r for r in got if r[0] == 2]


def test_bm25_layout_invariance(spark):
    d = _docs_df(spark, CORPUS)
    base = _rows(bm25_topk(d, _queries_df(spark), k=10))
    for parts in (1, 7):
        assert _rows(bm25_topk(d.repartition(parts), _queries_df(spark),
                               k=10)) == base


def test_bm25_empty_corpus_raises(spark):
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(_docs_df(spark, {}), _queries_df(spark))


# ---------------------------------------------------------------- TextIndex


def _batch(spark, rows):
    """rows: (seq, doc_id, hours, op, text_or_None)"""
    data = [(s, d, (TS0 + pd.Timedelta(hours=h)).to_pydatetime(), op, t)
            for (s, d, h, op, t) in rows]
    return spark.createDataFrame(
        data, "seq bigint, doc_id bigint, warc_ts timestamp, op string,"
              " text string")


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _survivor_check(spark, idx, survivors: dict[int, str]):
    """Index query == one-shot bm25_topk over the survivors, stats are
    the survivors' exact integers, and postings hold exactly the
    survivors' (term, doc, tf, dl) rows."""
    got = _rows(idx.query(spark, _queries_df(spark), k=10))
    want = _rows(bm25_topk(_docs_df(spark, survivors), _queries_df(spark),
                           k=10)) if survivors else []
    assert got == want
    n, sumdl = idx.stats()
    assert n == len(survivors)
    assert sumdl == sum(len(_toks(t)) for t in survivors.values())
    post = _rows(idx.postings.read(spark, idx.POSTING_SCHEMA))
    want_post = sorted(
        (t, d, toks.count(t), len(toks))
        for d, s in survivors.items()
        for toks in [_toks(s)]
        for t in set(toks))
    assert post == want_post


def test_incremental_equals_oneshot(spark, tmp_path):
    idx = TextIndex.create(str(tmp_path / "tix"), n_parts=4, n_buckets=4)
    live = dict(CORPUS)
    idx.update(spark, _batch(
        spark, [(i, d, 0, "upsert", t) for i, (d, t) in
                enumerate(CORPUS.items())]), batch_id=0)
    _survivor_check(spark, idx, live)

    # update doc 2 (its old terms must retract), delete 3, insert 8
    live[2] = "vector search and lexical search"
    del live[3]
    live[8] = "fast fast fast join"
    idx.update(spark, _batch(spark, [
        (100, 2, 1, "upsert", live[2]),
        (101, 3, 1, "delete", None),
        (102, 8, 1, "upsert", live[8]),
    ]), batch_id=1)
    _survivor_check(spark, idx, live)

    # stale LWW loser (older warc_ts) must not change doc 1; doc 3
    # re-inserted with new text resurrects cleanly after its tombstone
    live[3] = "table scan strikes back"
    idx.update(spark, _batch(spark, [
        (103, 1, -5, "upsert", "stale loser text must never surface"),
        (104, 3, 2, "upsert", live[3]),
    ]), batch_id=2)
    _survivor_check(spark, idx, live)


def test_duplicate_delivery_noop(spark, tmp_path):
    idx = TextIndex.create(str(tmp_path / "tix"), n_parts=4, n_buckets=4)
    idx.update(spark, _batch(
        spark, [(i, d, 0, "upsert", t) for i, (d, t) in
                enumerate(CORPUS.items())]), batch_id=0)
    b1 = [(100, 2, 1, "upsert", "totally new terms here"),
          (101, 3, 1, "delete", None)]
    idx.update(spark, _batch(spark, b1), batch_id=1)
    versions = idx.postings.versions()
    before = _rows(idx.query(spark, _queries_df(spark), k=10))
    stats = idx.stats()
    idx.update(spark, _batch(spark, b1), batch_id=1)  # redelivery
    assert idx.postings.versions() == versions
    assert idx.stats() == stats
    assert _rows(idx.query(spark, _queries_df(spark), k=10)) == before


def test_update_touches_only_term_partitions(spark, tmp_path):
    """A batch's postings version rewrites exactly the partitions
    owning its docs' old ∪ new terms — O(touched), never the index."""
    idx = TextIndex.create(str(tmp_path / "tix"), n_parts=8, n_buckets=4)
    idx.update(spark, _batch(
        spark, [(i, d, 0, "upsert", t) for i, (d, t) in
                enumerate(CORPUS.items())]), batch_id=0)
    old_terms = set(_toks(CORPUS[2]))
    new_text = "vector search"
    idx.update(spark, _batch(spark, [(100, 2, 1, "upsert", new_text)]),
               batch_id=1)
    v = idx.postings.versions()[-1]
    want = {_hash60(t) % 8 for t in old_terms | set(_toks(new_text))}
    assert set(idx.postings._pmap(v)) == want


def test_query_reads_only_probe_partitions(spark, tmp_path):
    idx = TextIndex.create(str(tmp_path / "tix"), n_parts=8, n_buckets=4)
    idx.update(spark, _batch(
        spark, [(i, d, 0, "upsert", t) for i, (d, t) in
                enumerate(CORPUS.items())]), batch_id=0)
    seen = []
    orig = idx.postings.read

    def spy(spark_, schema, part_filter=None, **kw):
        seen.append(set(part_filter))
        return orig(spark_, schema, part_filter=part_filter, **kw)

    idx.postings.read = spy
    q = spark.createDataFrame([(0, "spark join")],
                              "query_id bigint, qtext string")
    idx.query(spark, q, k=5).collect()
    assert seen == [{_hash60("spark") % 8, _hash60("join") % 8}]


def test_query_empty_index_raises(spark, tmp_path):
    idx = TextIndex.create(str(tmp_path / "tix"), n_parts=4, n_buckets=4)
    with pytest.raises(ValueError, match="empty index"):
        idx.query(spark, _queries_df(spark))


def test_tokenizer_ascii_only(spark):
    df = spark.createDataFrame(
        [("MiXeD Case42 naïve café 7up",)], "t string")
    got = df.select(tokens_col("t").alias("x")).first()["x"]
    # non-ASCII bytes act as separators; lowering is per-ASCII-token
    assert got == ["mixed", "case42", "na", "ve", "caf", "7up"]


def test_null_text_counts_as_empty(spark, tmp_path):
    """An upsert with NULL text indexes as a zero-token doc: counted
    in N, dl 0, no postings — never a -1 from size(NULL)."""
    idx = TextIndex.create(str(tmp_path / "tix"), n_parts=4, n_buckets=4)
    idx.update(spark, _batch(spark, [
        (0, 1, 0, "upsert", "real words here"),
        (1, 2, 0, "upsert", None),
    ]), batch_id=0)
    assert idx.stats() == (2, 3)
    assert idx.postings.read(spark, idx.POSTING_SCHEMA).count() == 3
    d = _docs_df(spark, {1: "real words here"}).unionByName(
        spark.createDataFrame([(2, None)], "doc_id bigint, text string"))
    assert _rows(idx.query(spark, _queries_df(spark), k=10)) == \
        _rows(bm25_topk(d, _queries_df(spark), k=10))


def test_bm25_randomized_against_reference(spark):
    """Seeded random corpora (repeated words, tiny docs, tied scores,
    shared vocab) — engine == pure-Python reference bit-for-bit on
    every one."""
    import random

    vocab = ["spark", "scan", "join", "the", "fast", "q1", "zz"]
    rng = random.Random(20260817)
    for trial in range(5):
        docs = {
            d: " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(1, 12)))
            for d in range(rng.randint(2, 9))
        }
        queries = [(qi, " ".join(rng.choice(vocab)
                                 for _ in range(rng.randint(1, 3))))
                   for qi in range(2)]
        qdf = spark.createDataFrame(queries,
                                    "query_id bigint, qtext string")
        got = _rows(bm25_topk(_docs_df(spark, docs), qdf, k=4))
        assert got == ref_bm25(docs, queries, k=4), (trial, docs, queries)
