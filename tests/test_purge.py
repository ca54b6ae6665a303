"""purge_keys — physical right-to-erasure across retained history."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from montandon_etl_spark.lake.table import SnapshotTable

VICTIM = "https://victim-zqx9.example/secret-page"
TOKEN = b"victim-zqx9"


def _b(spark, rows, op="upsert"):
    df = spark.createDataFrame(
        rows, "url string, seq bigint, html binary, text string,"
        " lang string")
    return df.select(
        "url", "seq",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.lit(op).alias("op"), "html", "text", "lang")


def _mk(spark, base):
    t = SnapshotTable.create(os.path.join(base, "t"), n_buckets=8)
    t.merge(spark, _b(spark, [
        (VICTIM, 1, bytearray(b"<html>" + TOKEN + b"v1"), "sec1", "en"),
        ("https://a.example/1", 2, bytearray(b"<html>a"), "aa", "en"),
        ("https://b.example/2", 3, bytearray(b"<html>b"), "bb", "fr"),
    ]), batch_id=0)
    t.merge(spark, _b(spark, [
        (VICTIM, 10, bytearray(b"<html>" + TOKEN + b"v2"), "sec2", "en"),
        ("https://c.example/3", 11, bytearray(b"<html>c"), "cc", "es"),
    ]), batch_id=1)
    t.compact(spark)
    t.merge(spark, _b(spark, [("https://a.example/1", 20, None, None,
                               None)], op="delete"), batch_id=2)
    return t


def _all_parquet_bytes(path):
    out = b""
    for p in glob.glob(os.path.join(path, "data", "**", "*.parquet"),
                       recursive=True):
        with open(p, "rb") as f:
            out += f.read()
    return out


def test_purge_erases_all_history(spark):
    base = tempfile.mkdtemp(prefix="purge_")
    t = _mk(spark, base)
    snaps = [s["snapshot_id"] for s in t.history()]
    pre = {sid: {r["url"]: r["text"] for r in
                 t.read(spark, snapshot_id=sid).collect()}
           for sid in snaps if sid > 0}
    assert any(VICTIM in v for v in pre.values())
    assert TOKEN in _all_parquet_bytes(t.path)

    rep = t.purge_keys(spark, [VICTIM])
    assert rep["rows_purged"] >= 2  # two revisions lived in files
    assert rep["files_rewritten"] + rep["files_dropped"] >= 1
    assert rep["snapshots_updated"] >= 1
    # gone at HEAD and at EVERY retained snapshot
    for sid in pre:
        got = {r["url"]: r["text"] for r in
               t.read(spark, snapshot_id=sid).collect()}
        assert VICTIM not in got, sid
        want = {k: v for k, v in pre[sid].items() if k != VICTIM}
        assert got == want, sid  # bystanders byte-identical
    # physically gone from disk
    assert TOKEN not in _all_parquet_bytes(t.path)
    # re-run converges to a no-op
    rep2 = t.purge_keys(spark, [VICTIM])
    assert rep2["rows_purged"] == 0
    assert rep2["files_rewritten"] == 0


def test_purge_unknown_key_is_noop(spark):
    base = tempfile.mkdtemp(prefix="purge_")
    t = _mk(spark, base)
    before = _all_parquet_bytes(t.path)
    rep = t.purge_keys(spark, ["https://nope.example/x"])
    assert rep["rows_purged"] == 0
    assert _all_parquet_bytes(t.path) == before


def test_purged_key_can_reingest(spark):
    base = tempfile.mkdtemp(prefix="purge_")
    t = _mk(spark, base)
    t.purge_keys(spark, [VICTIM])
    t.merge(spark, _b(spark, [
        (VICTIM, 100, bytearray(b"<html>fresh"), "fresh", "en")]),
        batch_id=7)
    got = {r["url"]: r["text"] for r in t.read(spark).collect()}
    assert got[VICTIM] == "fresh"


def test_purge_tombstone_rows_also_erased(spark):
    """Deleting a key leaves op='delete' rows in MOR deltas — purge
    must remove those too (they carry the key)."""
    base = tempfile.mkdtemp(prefix="purge_")
    t = SnapshotTable.create(os.path.join(base, "t"), n_buckets=4)
    t.merge(spark, _b(spark, [
        (VICTIM, 1, bytearray(TOKEN), "s", "en"),
        ("https://k.example/1", 2, bytearray(b"k"), "k", "en")]),
        batch_id=0)
    t.merge(spark, _b(spark, [(VICTIM, 10, None, None, None)],
                      op="delete"), batch_id=1)
    t.purge_keys(spark, [VICTIM])
    assert TOKEN not in _all_parquet_bytes(t.path)
    raw = t.read(spark, include_tombstones=True, resolve=False)
    assert raw.filter(F.col("url") == VICTIM).count() == 0
