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


def test_fim_transform_invariants(spark):
    """FIM contract: applied docs reconstruct to the original text
    from their sentinel-delimited parts, mode/apply rates land near
    their targets, and output is layout-independent."""
    from montandon_etl_spark.operators.packing import (
        FIM_MID, FIM_PRE, FIM_SUF, fim_transform)

    rows = [(i, f"doc {i} body " + "abcdefghij" * (1 + i % 4))
            for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: (r["fim_mode"], r["fim_text"])
           for r in fim_transform(docs, "doc_id", "text",
                                  rate=0.5, spm_rate=0.5).collect()}
    orig = dict(rows)
    modes = {"none": 0, "psm": 0, "spm": 0}
    for did, (mode, ft) in out.items():
        modes[mode] += 1
        if mode == "none":
            assert ft == orig[did]
        elif mode == "psm":
            body = ft.removeprefix(FIM_PRE)
            pre, rest = body.split(FIM_SUF, 1)
            suf, mid = rest.split(FIM_MID, 1)
            assert pre + mid + suf == orig[did]
        else:
            body = ft.removeprefix(FIM_SUF)
            suf, rest = body.split(FIM_PRE, 1)
            pre, mid = rest.split(FIM_MID, 1)
            assert pre + mid + suf == orig[did]
    assert 140 <= modes["none"] <= 260          # rate=0.5 of 400
    assert modes["psm"] > 30 and modes["spm"] > 30
    out2 = {r["doc_id"]: (r["fim_mode"], r["fim_text"])
            for r in fim_transform(docs.repartition(7), "doc_id",
                                   "text", rate=0.5,
                                   spm_rate=0.5).collect()}
    assert out2 == out


def test_fim_transform_rate_edges(spark):
    """rate=0 passes everything through; rate=1 transforms every doc
    with len >= 2; 1-char docs always pass through."""
    from montandon_etl_spark.operators.packing import fim_transform

    docs = spark.createDataFrame(
        [(1, "x"), (2, "xy"), (3, "hello world")],
        "doc_id bigint, text string")
    all_none = fim_transform(docs, "doc_id", "text", rate=0.0).collect()
    assert all(r["fim_mode"] == "none" for r in all_none)
    full = {r["doc_id"]: r["fim_mode"]
            for r in fim_transform(docs, "doc_id", "text",
                                   rate=1.0).collect()}
    assert full[1] == "none" and full[2] != "none" and full[3] != "none"
