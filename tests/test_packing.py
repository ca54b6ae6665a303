"""Sequence packing: greedy invariants, partition-layout independence,
and the metadata-only contract."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from montandon_etl_spark.operators.packing import pack_stats, sequence_pack


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, n_ws long")
    return df.repartition(parts) if parts else df


def _rows(n=400, seed=11):
    rng = random.Random(seed)
    return [(i, rng.randint(1, 90)) for i in range(n)]


def test_pack_invariants(spark):
    packed = sequence_pack(
        _df(spark, _rows()), "doc_id", "n_ws", budget=128, n_shards=8
    ).collect()
    by_seq: dict[tuple, list] = {}
    for r in packed:
        by_seq.setdefault((r.shard, r.seq_id), []).append(r)
    assert len(packed) == 400
    for (_, _), members in by_seq.items():
        members.sort(key=lambda r: r.tok_offset)
        fill = 0
        for r in members:
            assert r.tok_offset == fill  # docs are contiguous, atomic
            fill += r.n_toks
        # a sequence only exceeds the budget when a single oversize
        # doc owns it
        assert fill <= 128 or len(members) == 1


def test_pack_greedy_no_earlier_fit(spark):
    """First-fit-in-order: a sequence's first doc must NOT fit in the
    previous sequence of the same shard."""
    packed = sequence_pack(
        _df(spark, _rows()), "doc_id", "n_ws", budget=128, n_shards=4
    ).collect()
    seq_fill: dict[tuple, int] = {}
    first_doc: dict[tuple, int] = {}
    for r in packed:
        k = (r.shard, r.seq_id)
        seq_fill[k] = seq_fill.get(k, 0) + r.n_toks
        if r.tok_offset == 0:
            first_doc[k] = r.n_toks
    for (shard, sid), first_n in first_doc.items():
        if sid == 0:
            continue
        assert seq_fill[(shard, sid - 1)] + first_n > 128


def test_pack_partition_layout_invariant(spark):
    rows = _rows(300, seed=5)
    a = sequence_pack(_df(spark, rows), "doc_id", "n_ws", 64, n_shards=8)
    b = sequence_pack(
        _df(spark, list(reversed(rows)), parts=13), "doc_id", "n_ws", 64,
        n_shards=8,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_oversize_doc_owns_sequence(spark):
    rows = [(1, 10), (2, 500), (3, 10), (4, 10)]
    packed = sequence_pack(
        _df(spark, rows), "doc_id", "n_ws", budget=64, n_shards=1
    ).collect()
    by_doc = {r.doc_id: r for r in packed}
    big = by_doc[2]
    assert big.tok_offset == 0
    others_in_seq = [
        r for r in packed if r.seq_id == big.seq_id and r.doc_id != 2
    ]
    assert not others_in_seq


def test_pack_stats_utilization(spark):
    packed = sequence_pack(
        _df(spark, _rows()), "doc_id", "n_ws", budget=128, n_shards=8
    )
    stats = pack_stats(packed, budget=128)
    got = stats.agg(
        F.sum("seq_toks").alias("t"), F.sum("n_docs").alias("d"),
        F.max("fill_ratio_pct").alias("mx"),
    ).first()
    assert got.d == 400
    assert got.t == sum(n for _, n in _rows())
    assert got.mx <= 100
