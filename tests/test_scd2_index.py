"""Incremental SCD2 index: incremental ≡ batch equivalence under
arbitrary batch splits and arrival orders, late events around
tombstones, exactly-once redelivery, partition-pruned point reads,
and the run_stream integration."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.scd import scd2_history
from montandon_etl_spark.operators.scd2_index import Scd2Index

SCHEMA = "k bigint, ts timestamp, seq bigint, op string, v string"


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1, 0, 0, s), q, o, p)
         for k, s, q, o, p in rows], SCHEMA)


def _idx(tmp_path):
    return Scd2Index.create(
        str(tmp_path / "scd2"), key_col="k", key_type="bigint",
        ts_col="ts", seq_col="seq", payload_cols=("v",),
        payload_types=("string",), n_parts=4)


def _batch_equiv(spark, idx, all_events):
    want = {
        (r["k"], r["ver"]): r
        for r in scd2_history(all_events, "k", ["ts", "seq"],
                              op_col="op")
        .select("k", F.col("version").alias("ver"), "valid_from",
                "valid_to", "is_current", "v").collect()
    }
    got = {
        (r["key"], r["ver"]): r for r in idx.history(spark).collect()
    }
    assert set(got) == set(want)
    for kk in want:
        for c in ("valid_from", "valid_to", "is_current", "v"):
            assert got[kk][c] == want[kk][c], (kk, c)


def test_incremental_equals_batch_with_late_events(spark, tmp_path):
    idx = _idx(tmp_path)
    # batch 0: k1 at t0, t4; k2 at t1
    b0 = [(1, 0, 0, "upsert", "a"), (1, 4, 1, "upsert", "c"),
          (2, 1, 2, "upsert", "x")]
    # batch 1 arrives LATE: k1 at t2 lands BETWEEN indexed events,
    # plus a tombstone at t6
    b1 = [(1, 2, 3, "upsert", "b"), (1, 6, 4, "delete", None)]
    # batch 2: reinsert after the tombstone + a brand-new key
    b2 = [(1, 8, 5, "upsert", "d"), (3, 0, 6, "upsert", "z")]
    rows = []
    for i, b in enumerate([b0, b1, b2]):
        rows += b
        idx.update(spark, _mk(spark, b), version=i)
        _batch_equiv(spark, idx, _mk(spark, rows))
    # the late t2 event must have split [t0, t4) into [t0, t2)+[t2, t4)
    hist = {(r["key"], r["ver"]): r for r in idx.history(spark).collect()}
    assert hist[(1, 1)]["valid_to"] == dt.datetime(2024, 1, 1, 0, 0, 2)
    assert hist[(1, 2)]["v"] == "b"
    # tombstone consumed ver 4; reinsert is ver 5 and current
    assert (1, 4) not in hist and hist[(1, 5)]["is_current"]


def test_redelivery_and_torn_write_no_op(spark, tmp_path):
    idx = _idx(tmp_path)
    b0 = _mk(spark, [(1, 0, 0, "upsert", "a"), (2, 0, 1, "upsert", "x")])
    idx.update(spark, b0, version=0)
    before = sorted(map(tuple, idx.history(spark).collect()))
    idx.update(spark, b0, version=0)  # duplicate delivery
    assert sorted(map(tuple, idx.history(spark).collect())) == before
    # same events redelivered under a NEW epoch: (key, seq) dedup
    idx.update(spark, b0, version=1)
    assert sorted(map(tuple, idx.history(spark).collect())) == before


def test_point_read_prunes_partitions(spark, tmp_path):
    idx = _idx(tmp_path)
    rows = [(k, s, k * 10 + s, "upsert", f"v{k}.{s}")
            for k in range(1, 9) for s in range(3)]
    idx.update(spark, _mk(spark, rows), version=0)
    keys = spark.createDataFrame([(3,)], "key bigint")
    got = idx.history(spark, keys=keys).collect()
    assert {r["key"] for r in got} == {3} and len(got) == 3
    # as_of returns exactly one version per live key
    asof = idx.as_of(spark, dt.datetime(2024, 1, 1, 0, 0, 1)).collect()
    per_key = {}
    for r in asof:
        per_key.setdefault(r["key"], []).append(r)
    assert all(len(v) == 1 for v in per_key.values())
    assert all(r["v"].endswith(".1") for r in asof)


def test_layout_stamp_fails_loudly(tmp_path, spark):
    idx = _idx(tmp_path)
    import json
    import os
    p = os.path.join(idx.path, "index.json")
    cfg = json.load(open(p))
    cfg["layout"] = 0
    json.dump(cfg, open(p, "w"))
    with pytest.raises(ValueError, match="layout"):
        Scd2Index(idx.path)


def test_rides_run_stream(spark, tmp_path):
    """End-to-end: the updater maintains the history alongside the
    lake merge; final intervals equal the batch operator over the full
    changelog."""
    from montandon_etl_spark.lake.table import SnapshotTable
    from montandon_etl_spark.sources.changelog import (
        gen_changelog,
        write_changelog,
    )
    from montandon_etl_spark.streaming.pipeline import (
        CHANGELOG_SPARK_SCHEMA,
        run_stream,
    )

    log = gen_changelog(n_events=600, n_urls=120, seed=7, n_domains=15)
    write_changelog(log, str(tmp_path / "chg"), n_chunks=3)
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    idx = Scd2Index.create(str(tmp_path / "scd2"), key_col="url",
                           key_type="string", ts_col="warc_ts",
                           seq_col="seq", n_parts=4)
    run_stream(spark, table, str(tmp_path / "chg"),
               str(tmp_path / "ckpt"), max_files_per_trigger=1,
               derived_updaters=[idx.updater()]).awaitTermination(300)
    full = spark.read.schema(CHANGELOG_SPARK_SCHEMA).parquet(
        str(tmp_path / "chg"))
    want = scd2_history(
        full.select(F.col("url").alias("key"),
                    F.col("warc_ts").alias("ts"), "seq", "op"),
        "key", ["ts", "seq"], op_col="op")
    w = {(r["key"], r["version"]): (r["valid_from"], r["valid_to"],
                                    r["is_current"])
         for r in want.collect()}
    g = {(r["key"], r["ver"]): (r["valid_from"], r["valid_to"],
                                r["is_current"])
         for r in idx.history(spark).collect()}
    assert g == w and len(g) > 100
