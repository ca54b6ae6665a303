"""Incremental SemDeDup (operators/semdedup_index): after ANY batch
sequence (inserts that retract higher-id neighbors, vector changes
that migrate cells, deletes that resurrect suppressed rows), the
maintained keep-list must equal semantic_dedup's one-pass rule over
the surviving state on the same frozen centroids — and each batch
must rewrite only its touched cells."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from montandon_etl_spark.operators.semdedup_index import SemDedupIndex
from montandon_etl_spark.operators.similarity import (
    _top_cells,
    semdedup_keep,
)

TS = pd.Timestamp("2024-03-01")
DIM = 4

# four well-separated directions so cells are stable, plus scaled
# copies (same direction => cosine 1.0 => semantic dup)
_DIRS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
         [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]


def _vec(direction: int, scale: float = 1.0, wiggle: float = 0.0):
    v = [x * scale for x in _DIRS[direction]]
    v[(direction + 1) % DIM] += wiggle
    return [float(x) for x in v]


def _batch(spark, rows):
    """rows: (seq, vid, hours, op, vec_or_None)"""
    data = [(s, v, (TS + pd.Timedelta(hours=h)).to_pydatetime(), op, vec)
            for (s, v, h, op, vec) in rows]
    return spark.createDataFrame(
        data, "seq bigint, vec_id bigint, warc_ts timestamp, op string,"
              " vec array<float>")


def _oneshot(spark, idx, live: dict[int, list[float]]):
    """semantic_dedup's rule over the live state on the SAME frozen
    centroids (the index's equivalence contract)."""
    emb = spark.createDataFrame(
        [(k, v) for k, v in live.items()],
        "vec_id bigint, embedding array<float>")
    assigned = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v"),
        F.element_at(_top_cells(idx.cents, "embedding", 1), 1)
        .alias("cell"))
    return sorted(
        tuple(r) for r in semdedup_keep(assigned, idx.threshold)
        .select(F.col("id").alias("vec_id"), "cell", "keep",
                "max_dup_sim").collect())


def _state(spark, idx):
    return sorted(tuple(r) for r in idx.state(spark).collect())


def test_incremental_equals_oneshot(spark, tmp_path):
    idx = SemDedupIndex.create(str(tmp_path / "sdi"), centroids=_DIRS,
                               threshold=0.7, n_buckets=4)
    live: dict[int, list[float]] = {}

    # batch 0: one row per direction — everything kept
    rows = [(i, 10 + i, 0, "upsert", _vec(i)) for i in range(4)]
    live.update({10 + i: _vec(i) for i in range(4)})
    idx.update(spark, _batch(spark, rows), batch_id=0)
    assert _state(spark, idx) == _oneshot(spark, idx, live)
    assert all(r[2] for r in _state(spark, idx))  # all kept

    # batch 1: a LOWER-id dup in cell 0 retracts the kept row 10,
    # and an unrelated insert in cell 2
    live[5] = _vec(0, scale=2.0)
    live[20] = _vec(2, wiggle=0.4)
    idx.update(spark, _batch(spark, [
        (100, 5, 1, "upsert", live[5]),
        (101, 20, 1, "upsert", live[20]),
    ]), batch_id=1)
    got = {t[0]: t for t in _state(spark, idx)}
    assert _state(spark, idx) == _oneshot(spark, idx, live)
    assert got[5][2] and not got[10][2]  # lowest id survives

    # batch 2: deleting the suppressor RESURRECTS row 10; a vector
    # change migrates row 20 from cell 2 to cell 3 (both cells rewrite)
    del live[5]
    live[20] = _vec(3, wiggle=0.3)
    idx.update(spark, _batch(spark, [
        (200, 5, 2, "delete", None),
        (201, 20, 2, "upsert", live[20]),
    ]), batch_id=2)
    assert _state(spark, idx) == _oneshot(spark, idx, live)
    got = {t[0]: t for t in _state(spark, idx)}
    assert got[10][2]  # resurrected

    # stale LWW loser must change nothing
    idx.update(spark, _batch(spark, [
        (202, 10, -5, "upsert", _vec(1)),
    ]), batch_id=3)
    assert _state(spark, idx) == _oneshot(spark, idx, live)


def test_update_touches_only_cells(spark, tmp_path):
    idx = SemDedupIndex.create(str(tmp_path / "sdi"), centroids=_DIRS,
                               threshold=0.7, n_buckets=4)
    idx.update(spark, _batch(spark, [
        (i, 10 + i, 0, "upsert", _vec(i)) for i in range(4)
    ]), batch_id=0)
    # one insert into cell 1 only
    idx.update(spark, _batch(spark, [(100, 7, 1, "upsert", _vec(1))]),
               batch_id=1)
    v = idx.store.versions()[-1]
    assert set(idx.store._pmap(v)) == {1}
    # a cell migration (2 -> 3) rewrites exactly both cells
    idx.update(spark, _batch(spark, [(200, 12, 2, "upsert", _vec(3))]),
               batch_id=2)
    v = idx.store.versions()[-1]
    assert set(idx.store._pmap(v)) == {2, 3}


def test_duplicate_delivery_noop(spark, tmp_path):
    idx = SemDedupIndex.create(str(tmp_path / "sdi"), centroids=_DIRS,
                               threshold=0.7, n_buckets=4)
    b0 = [(i, 10 + i, 0, "upsert", _vec(i % 4)) for i in range(6)]
    idx.update(spark, _batch(spark, b0), batch_id=0)
    versions = idx.store.versions()
    before = _state(spark, idx)
    idx.update(spark, _batch(spark, b0), batch_id=0)  # redelivery
    assert idx.store.versions() == versions
    assert _state(spark, idx) == before
