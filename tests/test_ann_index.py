"""Incremental ANN index: after ANY sequence of upsert/delete batches
(including vector changes that migrate keys across cells and stale
LWW losers), the cell-partitioned postings must equal a one-shot
build over the surviving state, and query() must match the one-shot
cosine_topk_ivf_multiprobe on the same centroids."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.ann_index import AnnIndex
from montandon_etl_spark.operators.similarity import (
    cosine_topk_ivf_multiprobe,
    kmeans_centroids,
)

TS = pd.Timestamp("2024-03-01")
DIM = 6


def _vec(seed: int) -> list[float]:
    # deterministic pseudo-vectors spread over a few directions
    return [float(((seed * (i + 3) * 2654435761) % 1000) - 500) / 500
            for i in range(DIM)]


def _batch(spark, rows):
    """rows: (seq, vid, hours, op, vec_or_None)"""
    data = [(s, v, (TS + pd.Timedelta(hours=h)).to_pydatetime(), op, vec)
            for (s, v, h, op, vec) in rows]
    return spark.createDataFrame(
        data,
        "seq bigint, vec_id bigint, warc_ts timestamp, op string,"
        " vec array<float>",
    )


def _centroids(spark, n=4):
    corpus = spark.createDataFrame(
        [(i, _vec(i)) for i in range(40)], "vec_id bigint, embedding array<float>"
    )
    cents = kmeans_centroids(corpus, n_centroids=n)
    return [c["cvec"] for c in sorted(cents, key=lambda c: c["cid"])]


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def cents(spark):
    return _centroids(spark)


def _bootstrap(spark, tmp, cents, live_rows):
    """One-shot index over the given live state."""
    idx = AnnIndex.create(str(tmp), centroids=cents)
    idx.update(spark, _batch(
        spark, [(i, v, 0, "upsert", vec) for i, (v, vec) in enumerate(live_rows)]
    ), batch_id=0)
    return idx


def test_incremental_equals_bootstrap(spark, tmp_path, cents):
    idx = AnnIndex.create(str(tmp_path / "inc"), centroids=cents)
    live: dict[int, list[float]] = {}

    batches = [
        # initial inserts
        [(1, 1, 0, "upsert", _vec(1)), (2, 2, 0, "upsert", _vec(2)),
         (3, 3, 0, "upsert", _vec(3)), (4, 4, 0, "upsert", _vec(4))],
        # vector change migrates key 1 to a different region; delete 3
        [(5, 1, 1, "upsert", _vec(40)), (6, 3, 1, "delete", None),
         (7, 5, 1, "upsert", _vec(5))],
        # stale echoes must lose: old upsert for 1, pre-insert delete
        # for 2 (earlier warc_ts — a same-ts delete would WIN on seq)
        [(8, 1, 0, "upsert", _vec(7)), (9, 2, -1, "delete", None),
         (10, 6, 2, "upsert", _vec(6))],
    ]
    effects = [
        lambda: live.update({1: _vec(1), 2: _vec(2), 3: _vec(3), 4: _vec(4)}),
        lambda: (live.update({1: _vec(40), 5: _vec(5)}), live.pop(3)),
        lambda: live.update({6: _vec(6)}),
    ]
    queries = spark.createDataFrame(
        [(100, _vec(13)), (101, _vec(21))], "query_id bigint, qvec array<float>"
    )
    for bid, (rows, eff) in enumerate(zip(batches, effects)):
        idx.update(spark, _batch(spark, rows), batch_id=bid)
        eff()
        boot = _bootstrap(spark, tmp_path / f"boot{bid}", cents, sorted(live.items()))
        # postings content identical (id, cell, vec)
        sch = idx._posting_schema()
        a = idx.postings.read(spark, sch, attach_part=True)
        b = boot.postings.read(spark, sch, attach_part=True)
        assert _sorted_rows(a) == _sorted_rows(b)
        # queries identical
        qa = idx.query(spark, queries, k=3, nprobe=2)
        qb = boot.query(spark, queries, k=3, nprobe=2)
        assert _sorted_rows(qa) == _sorted_rows(qb)


def test_query_matches_oneshot_multiprobe(spark, tmp_path, cents):
    corpus = [(v, _vec(v)) for v in range(1, 25)]
    idx = AnnIndex.create(str(tmp_path / "ann"), centroids=cents)
    # two batches, split by parity
    for bid in (0, 1):
        rows = [(v, v, 0, "upsert", vec) for v, vec in corpus if v % 2 == bid]
        idx.update(spark, _batch(spark, rows), batch_id=bid)

    emb = spark.createDataFrame(
        [(v, vec) for v, vec in corpus], "vec_id bigint, embedding array<float>"
    )
    queries = emb.filter(F.col("vec_id") <= 2)
    want = cosine_topk_ivf_multiprobe(
        emb, queries, k=4, n_centroids=len(cents), nprobe=2,
        quantizer="kmeans",
    )
    # same corpus → kmeans_centroids(emb) == the frozen cents? No: the
    # fixture centroids came from a DIFFERENT corpus (range(40)); use
    # an index frozen on THIS corpus's centroids for the comparison
    cents2 = [c["cvec"] for c in sorted(
        kmeans_centroids(emb, n_centroids=len(cents)), key=lambda c: c["cid"])]
    idx2 = AnnIndex.create(str(tmp_path / "ann2"), centroids=cents2)
    for bid in (0, 1):
        rows = [(v, v, 0, "upsert", vec) for v, vec in corpus if v % 2 == bid]
        idx2.update(spark, _batch(spark, rows), batch_id=bid)
    got = idx2.query(spark, queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    ), k=4, nprobe=2)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_redelivery_and_crash_retry(spark, tmp_path, cents):
    import shutil

    idx = AnnIndex.create(str(tmp_path / "ann"), centroids=cents)
    b0 = [(1, 1, 0, "upsert", _vec(1)), (2, 2, 0, "upsert", _vec(2))]
    idx.update(spark, _batch(spark, b0), batch_id=0)
    # migrate key 1, then simulate a crash before the postings write
    b1 = [(3, 1, 1, "upsert", _vec(40))]
    idx.update(spark, _batch(spark, b1), batch_id=1)
    head = idx.table.io.head_snapshot_id()
    sch = idx._posting_schema()
    want = _sorted_rows(idx.postings.read(spark, sch, attach_part=True))
    shutil.rmtree(str(tmp_path / "ann" / "postings" / f"v{head}"))
    idx.update(spark, _batch(spark, b1), batch_id=1)  # re-delivery repairs
    assert _sorted_rows(idx.postings.read(spark, sch, attach_part=True)) == want
    # full no-op on a second redelivery
    idx.update(spark, _batch(spark, b1), batch_id=1)
    assert idx.table.io.head_snapshot_id() == head


def _pq_setup(spark, emb, n_cents=4, m=3, k_cw=4):
    from montandon_etl_spark.operators.similarity import pq_codebooks

    cents = [c["cvec"] for c in sorted(
        kmeans_centroids(emb, n_centroids=n_cents), key=lambda c: c["cid"])]
    books = pq_codebooks(emb, dim=DIM, m_subspaces=m, n_codewords=k_cw)
    book_lists = [[c["cvec"] for c in sorted(b, key=lambda c: c["cid"])]
                  for b in books]
    return cents, book_lists


def test_pq_postings_match_batch_ivfpq(spark, tmp_path):
    """With codebooks frozen at create, the incrementally-built index
    must answer EXACTLY what the one-shot cosine_topk_ivfpq computes
    on the same quantizers — same (query_id, neighbor_id, pq_cosine,
    rank) — and postings must store codes, not vectors (bytes/row
    shrink measured)."""
    import os

    from montandon_etl_spark.operators.similarity import cosine_topk_ivfpq

    corpus = [(v, _vec(v)) for v in range(1, 30)]
    emb = spark.createDataFrame(
        corpus, "vec_id bigint, embedding array<float>")
    cents, books = _pq_setup(spark, emb)

    idx = AnnIndex.create(str(tmp_path / "pq"), centroids=cents,
                          codebooks=books)
    for bid in (0, 1):
        rows = [(v, v, 0, "upsert", vec) for v, vec in corpus if v % 2 == bid]
        idx.update(spark, _batch(spark, rows), batch_id=bid)

    queries = emb.filter(F.col("vec_id") <= 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    got = idx.query(spark, queries, k=4, nprobe=2)
    assert got.columns == ["query_id", "neighbor_id", "pq_cosine", "rank"]
    want = cosine_topk_ivfpq(
        emb, queries, dim=DIM, k=4,
        n_centroids=len(cents), nprobe=2, m_subspaces=3, n_codewords=4)
    assert _sorted_rows(got) == _sorted_rows(want)

    # rows carry the M code ints, never the raw vector
    sch = idx._posting_schema()
    assert "vec array" not in sch and "_c0" in sch and "_c2" in sch


def test_pq_postings_shrink_bytes_per_row(spark, tmp_path):
    """The point of PQ postings at 10^10 vectors: stored bytes/row
    drop vs raw-vector postings. Measured on a corpus big enough that
    parquet data (not footer metadata) dominates file size."""
    import os
    import random

    from montandon_etl_spark.operators.similarity import pq_codebooks

    dim, n = 32, 2000
    rng = random.Random(7)
    corpus = [(i, [rng.uniform(-1, 1) for _ in range(dim)])
              for i in range(n)]
    emb = spark.createDataFrame(
        corpus, "vec_id bigint, embedding array<float>")
    cents = [c["cvec"] for c in sorted(
        kmeans_centroids(emb, n_centroids=4), key=lambda c: c["cid"])]
    books = [[c["cvec"] for c in sorted(b, key=lambda c: c["cid"])]
             for b in pq_codebooks(emb, dim=dim, m_subspaces=8,
                                   n_codewords=16)]

    def _bytes(ix):
        tot = 0
        for root, _, files in os.walk(os.path.join(ix.path, "postings")):
            tot += sum(os.path.getsize(os.path.join(root, f))
                       for f in files if f.endswith(".parquet"))
        return tot

    rows = [(v, v, 0, "upsert", vec) for v, vec in corpus]
    pq = AnnIndex.create(str(tmp_path / "pq"), centroids=cents,
                         codebooks=books)
    pq.update(spark, _batch(spark, rows), batch_id=0)
    raw = AnnIndex.create(str(tmp_path / "raw"), centroids=cents)
    raw.update(spark, _batch(spark, rows), batch_id=0)
    # 32 floats (128B) → 8 small-int codes: expect well over 2× less
    assert _bytes(pq) * 2 < _bytes(raw), (_bytes(pq), _bytes(raw))


def test_pq_incremental_equals_bootstrap(spark, tmp_path):
    """PQ postings survive the full CDC algebra: cell migrations,
    deletes, stale LWW losers — state always equals a one-shot build
    over the surviving rows."""
    emb = spark.createDataFrame(
        [(i, _vec(i)) for i in range(40)], "vec_id bigint, embedding array<float>")
    cents, books = _pq_setup(spark, emb)

    def mk(tmp):
        return AnnIndex.create(str(tmp), centroids=cents, codebooks=books)

    idx = mk(tmp_path / "inc")
    live: dict[int, list[float]] = {}
    batches = [
        [(1, 1, 0, "upsert", _vec(1)), (2, 2, 0, "upsert", _vec(2)),
         (3, 3, 0, "upsert", _vec(3))],
        [(4, 1, 1, "upsert", _vec(40)), (5, 3, 1, "delete", None),
         (6, 5, 1, "upsert", _vec(5))],
        [(7, 1, 0, "upsert", _vec(7)), (8, 6, 2, "upsert", _vec(6))],
    ]
    effects = [
        lambda: live.update({1: _vec(1), 2: _vec(2), 3: _vec(3)}),
        lambda: (live.update({1: _vec(40), 5: _vec(5)}), live.pop(3)),
        lambda: live.update({6: _vec(6)}),
    ]
    for bid, (rows, eff) in enumerate(zip(batches, effects)):
        idx.update(spark, _batch(spark, rows), batch_id=bid)
        eff()
        boot = mk(tmp_path / f"boot{bid}")
        boot.update(spark, _batch(
            spark,
            [(i, v, 0, "upsert", vec)
             for i, (v, vec) in enumerate(sorted(live.items()))]),
            batch_id=0)
        sch = idx._posting_schema()
        a = idx.postings.read(spark, sch, attach_part=True)
        b = boot.postings.read(spark, sch, attach_part=True)
        assert _sorted_rows(a) == _sorted_rows(b)
