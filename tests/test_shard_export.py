"""Incremental trainer-shard export (sources/shard_export.py):
manifest-diff-driven shard rewrites must stay byte-identical to a
from-scratch export of the final table state."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.sources.shard_export import ShardExport

N_DOCS = 60


def _mk_table(spark, base):
    fields = [
        Field(1, "did", "string", False),
        Field(2, "warc_ts", "timestamp", False),
        Field(10, "text", "string", True),
    ]
    return SnapshotTable.create(os.path.join(base, "t"), fields=fields,
                                key_col="did", n_buckets=8)


def _batch(spark, dids, seq0, text_fn, op="upsert"):
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    rows = [(f"d{i}", seq0 + i, text_fn(i)) for i in dids]
    df = spark.createDataFrame(rows, "did string, seq bigint, text string")
    return df.select("did", "seq", ts.alias("warc_ts"),
                     F.lit(op).alias("op"), "text")


def _files(d):
    return {f: open(os.path.join(d, f), "rb").read()
            for f in sorted(os.listdir(d)) if not f.endswith(".json")}


def _run_batches(spark, table, exp=None):
    """Three upserts, one content update, one delete; refresh between
    every commit when ``exp`` is given."""
    batches = [
        _batch(spark, range(0, 20), 0, lambda i: f"alpha beta doc {i}"),
        _batch(spark, range(20, 40), 100, lambda i: f"gamma delta {i} {i}"),
        _batch(spark, range(40, N_DOCS), 200, lambda i: f"eps {i}"),
        _batch(spark, range(0, N_DOCS, 7), 1000,
               lambda i: f"REWRITTEN {i}"),
        _batch(spark, range(0, N_DOCS, 5), 2000, lambda i: None,
               op="delete"),
    ]
    for b, df in enumerate(batches):
        table.merge(spark, df, batch_id=b)
        if exp is not None:
            exp.refresh(spark, table)


def test_incremental_equals_full_byte_identical(spark):
    base = tempfile.mkdtemp(prefix="shex_")
    table = _mk_table(spark, base)
    inc = ShardExport.create(os.path.join(base, "inc"), vocab_size=50000)
    _run_batches(spark, table, exp=inc)
    # no new commits -> no-op
    assert inc.refresh(spark, table) == []
    full = ShardExport.create(os.path.join(base, "full"), vocab_size=50000)
    full.refresh(spark, table)
    fi, ff = _files(inc.path), _files(full.path)
    assert fi.keys() == ff.keys() and len(fi) > 0
    for name in fi:
        assert fi[name] == ff[name], name
    # read-back equals the LWW survivors' tokens
    got = {r["seq_id"]: list(r["tokens"])
           for r in inc.read(spark).collect()}
    from montandon_etl_spark.operators.dedup import hash60
    want_df = table.read(spark).select(
        hash60(F.col("did")).alias("sid"),
        F.expr(inc.state["token_sql"]).alias("toks"))
    want = {r["sid"]: list(r["toks"]) for r in want_df.collect()}
    assert got == want
    alive = {i for i in range(N_DOCS) if i % 5 != 0}
    assert len(want) == len(alive)


def test_emptied_bucket_removes_shard_file(spark):
    base = tempfile.mkdtemp(prefix="shex_")
    table = _mk_table(spark, base)
    table.merge(spark, _batch(spark, range(0, 30), 0,
                              lambda i: f"word {i}"), batch_id=0)
    exp = ShardExport.create(os.path.join(base, "e"), vocab_size=50000)
    exp.refresh(spark, table)
    # find every did in one on-disk shard and delete exactly those
    sh = {r["did"]: r["s"] for r in
          spark.createDataFrame([(f"d{i}",) for i in range(30)],
                                "did string")
          .select("did", table.bucket_expr("did").alias("s")).collect()}
    victim = sh["d0"]
    dids = [int(d[1:]) for d, s in sh.items() if s == victim]
    table.merge(spark, _batch(spark, dids, 100, lambda i: None,
                              op="delete"), batch_id=1)
    before = set(os.listdir(exp.path))
    assert f"shard-{victim:05d}.bin" in before
    exp.refresh(spark, table)
    after = set(os.listdir(exp.path))
    assert f"shard-{victim:05d}.bin" not in after
    assert f"shard-{victim:05d}.idx" not in after
    assert str(victim) not in exp.state["shards"]
    # untouched shards' files did not rewrite (byte compare)
    got = {r["seq_id"] for r in exp.read(spark).collect()}
    assert len(got) == 30 - len(dids)


def test_crash_between_files_and_state_converges(spark):
    base = tempfile.mkdtemp(prefix="shex_")
    table = _mk_table(spark, base)
    exp = ShardExport.create(os.path.join(base, "e"), vocab_size=50000)
    table.merge(spark, _batch(spark, range(0, 30), 0,
                              lambda i: f"w {i}"), batch_id=0)
    exp.refresh(spark, table)
    table.merge(spark, _batch(spark, range(10, 20), 100,
                              lambda i: f"upd {i}"), batch_id=1)
    exp.refresh(spark, table)
    want = _files(exp.path)
    # simulate: shard files from the last refresh landed, export.json
    # didn't — roll last_sid back and refresh again
    st = dict(exp.state)
    st["last_sid"] = 1
    ShardExport._write_state(exp.path, st)
    exp2 = ShardExport(exp.path)
    exp2.refresh(spark, table)
    assert _files(exp.path) == want
    assert exp2.state["last_sid"] == exp.state["last_sid"]


def test_layout_guard():
    base = tempfile.mkdtemp(prefix="shex_")
    ShardExport.create(os.path.join(base, "e"), vocab_size=10)
    p = os.path.join(base, "e", "export.json")
    st = json.load(open(p))
    st["layout"] = 99
    json.dump(st, open(p, "w"))
    with pytest.raises(ValueError):
        ShardExport(os.path.join(base, "e"))


def test_shard_export_rides_the_stream(spark):
    """run_stream(derived_updaters=[exp.updater(table)]) keeps the
    trainer shards current per micro-batch, and a checkpoint re-run
    leaves every file byte-identical (idempotent redelivery)."""
    from montandon_etl_spark.sources import gen_changelog, write_changelog
    from montandon_etl_spark.streaming import run_stream

    base = tempfile.mkdtemp(prefix="shex_stream_")
    log = gen_changelog(400, 120, seed=7, n_domains=10)
    write_changelog(log, os.path.join(base, "log"), n_chunks=3)
    table = SnapshotTable.create(os.path.join(base, "t"), n_buckets=8)
    exp = ShardExport.create(os.path.join(base, "shards"),
                             vocab_size=50000)
    run_stream(spark, table, os.path.join(base, "log"),
               os.path.join(base, "ckpt"),
               derived_updaters=[exp.updater(table)]).awaitTermination(300)
    want = _files(exp.path)
    assert len(want) > 0
    # full export of the final state must match byte-for-byte
    full = ShardExport.create(os.path.join(base, "full"),
                              vocab_size=50000)
    full.refresh(spark, table)
    assert _files(full.path) == want
    # re-run on the same checkpoint: no redelivered work, same bytes
    run_stream(spark, table, os.path.join(base, "log"),
               os.path.join(base, "ckpt"),
               derived_updaters=[exp.updater(table)]).awaitTermination(300)
    assert _files(exp.path) == want


def test_rebucket_respec_rewrites_and_removes_stale_shards(spark):
    """A 8→4 rebucket changes the shard universe: the incremental
    export after the respec must equal a from-scratch export (stale
    shard-ids past the new bucket count removed), and an export pinned
    to a PRE-respec snapshot still shards under the old count."""
    base = tempfile.mkdtemp(prefix="shexrb_")
    table = _mk_table(spark, base)
    inc = ShardExport.create(os.path.join(base, "inc"), vocab_size=50000)
    _run_batches(spark, table, exp=inc)
    pre_sid = table.snapshot()["snapshot_id"]
    pre_files = _files(inc.path)
    table.rebucket(spark, 4)
    inc.refresh(spark, table)
    full = ShardExport.create(os.path.join(base, "full"), vocab_size=50000)
    full.refresh(spark, table)
    fi, ff = _files(inc.path), _files(full.path)
    assert fi.keys() == ff.keys() and len(fi) > 0
    for name in fi:
        assert fi[name] == ff[name], name
    # every surviving shard id is under the NEW bucket count
    ids = {int(n.split("-")[1].split(".")[0]) for n in fi}
    assert ids and max(ids) < 4
    # pinned pre-respec export reproduces the OLD layout byte-for-byte
    pinned = ShardExport.create(os.path.join(base, "pin"), vocab_size=50000)
    pinned.refresh(spark, table, snapshot_id=pre_sid)
    assert _files(pinned.path) == pre_files
