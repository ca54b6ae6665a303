"""Incremental WET export: manifest-diff-pruned rewrites whose product
is byte-identical to a from-scratch export of the final state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.sources.wet_export import WetExport


def _mk_table(spark, path):
    fields = [Field(1, "did", "string", False),
              Field(2, "warc_ts", "timestamp", False),
              Field(10, "text", "string", True)]
    return SnapshotTable.create(path, fields=fields, key_col="did",
                                n_buckets=8)


def _batch(spark, ids, seq_off, op="upsert", text=None):
    rows = [(str(i), i + seq_off,
             None if op == "delete" else (text or f"text of {i}"))
            for i in ids]
    df = spark.createDataFrame(rows, "did string, seq bigint, text string")
    return df.select(
        "did", "seq",
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("warc_ts"),
        F.lit(op).alias("op"), "text")


def _shard_bytes(path):
    return {f: open(os.path.join(path, f), "rb").read()
            for f in os.listdir(path) if f.endswith(".warc.wet")}


def test_incremental_equals_full_and_prunes(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t"))
    exp = WetExport.create(str(tmp_path / "wet"))
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    t.merge(spark, _batch(spark, range(60), 0), batch_id=0)
    w1 = exp.refresh(spark, t)
    assert len(w1) > 0 and exp.refresh(spark, t) == []  # idempotent

    # a single-key update touches ONE bucket → exactly one shard rewrites
    t.merge(spark, _batch(spark, [7], 1000, text="rewritten 7"),
            batch_id=1)
    w2 = exp.refresh(spark, t)
    assert len(w2) == 1

    # deletes: empty one key's bucket-mates gradually; also catch-up
    # over TWO commits in one refresh
    t.merge(spark, _batch(spark, range(0, 60, 3), 2000, op="delete"),
            batch_id=2)
    t.merge(spark, _batch(spark, [61], 3000, text="late arrival"),
            batch_id=3)
    exp.refresh(spark, t)

    inc = _shard_bytes(str(tmp_path / "wet"))
    full = WetExport.create(str(tmp_path / "wet_full"))
    full.refresh(spark, t)
    assert inc == _shard_bytes(str(tmp_path / "wet_full"))  # BYTE-identical
    assert exp.state["shards"] == full.state["shards"]

    # read-back: conversion records of exactly the surviving state
    back = {r["uri"]: bytes(r["payload"]).decode()
            for r in exp.read(spark).collect()}
    want = {r["did"]: r["text"] for r in t.read(spark).collect()}
    assert back == want
    assert all(r["warc_type"] == "conversion"
               for r in exp.read(spark).collect())


def test_emptied_bucket_shard_removed(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "t2"))
    exp = WetExport.create(str(tmp_path / "wet2"))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t.merge(spark, _batch(spark, range(20), 0), batch_id=0)
    exp.refresh(spark, t)
    n_before = len(_shard_bytes(str(tmp_path / "wet2")))
    t.merge(spark, _batch(spark, range(20), 1000, op="delete"),
            batch_id=1)
    exp.refresh(spark, t)
    assert _shard_bytes(str(tmp_path / "wet2")) == {}
    assert exp.state["shards"] == {}
    assert n_before > 0
    assert exp.read(spark).count() == 0


def test_rebucket_respec_sidecar_follows(spark, tmp_path):
    """After an 8→4 rebucket the incremental sidecar equals a
    from-scratch export (stale wet shards removed); pinned to a
    pre-respec snapshot it reproduces the old layout."""
    t = _mk_table(spark, str(tmp_path / "t"))
    t.merge(spark, _batch(spark, range(0, 40), 0), batch_id=0)
    t.merge(spark, _batch(spark, range(0, 40, 5), 100, op="delete"),
            batch_id=1)
    inc = WetExport.create(str(tmp_path / "inc"))
    inc.refresh(spark, t)
    pre_sid = t.snapshot()["snapshot_id"]
    pre = _shard_bytes(inc.path)
    t.rebucket(spark, 4)
    inc.refresh(spark, t)
    full = WetExport.create(str(tmp_path / "full"))
    full.refresh(spark, t)
    fi, ff = _shard_bytes(inc.path), _shard_bytes(full.path)
    assert fi.keys() == ff.keys() and len(fi) > 0
    for name in fi:
        assert fi[name] == ff[name], name
    ids = {int(n.split("-")[1].split(".")[0]) for n in fi}
    assert ids and max(ids) < 4
    pinned = WetExport.create(str(tmp_path / "pin"))
    pinned.refresh(spark, t, snapshot_id=pre_sid)
    assert _shard_bytes(pinned.path) == pre
