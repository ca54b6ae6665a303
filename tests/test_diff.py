"""SnapshotTable.diff — time-travel change feed between snapshots."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.table import SnapshotTable


def _mk(spark, base):
    fields = [
        Field(1, "did", "string", False),
        Field(2, "warc_ts", "timestamp", False),
        Field(10, "text", "string", True),
    ]
    return SnapshotTable.create(os.path.join(base, "t"), fields=fields,
                                key_col="did", n_buckets=8)


def _b(spark, rows, op="upsert"):
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    df = spark.createDataFrame(rows, "did string, seq bigint, text string")
    return df.select("did", "seq", ts.alias("warc_ts"),
                     F.lit(op).alias("op"), "text")


def test_diff_add_update_delete(spark):
    base = tempfile.mkdtemp(prefix="diff_")
    t = _mk(spark, base)
    t.merge(spark, _b(spark, [("a", 1, "A1"), ("b", 2, "B1"),
                              ("c", 3, "C1")]), batch_id=0)
    t.merge(spark, _b(spark, [("b", 10, "B2"), ("d", 11, "D1")]),
            batch_id=1)
    t.merge(spark, _b(spark, [("c", 20, None)], op="delete"), batch_id=2)
    got = {r["did"]: r for r in t.diff(spark, 1, 3).collect()}
    assert set(got) == {"b", "c", "d"}
    assert got["b"]["change"] == "updated"
    assert (got["b"]["old_text"], got["b"]["new_text"]) == ("B1", "B2")
    assert got["c"]["change"] == "deleted"
    assert (got["c"]["old_text"], got["c"]["new_text"]) == ("C1", None)
    assert got["d"]["change"] == "added"
    assert (got["d"]["old_text"], got["d"]["new_text"]) == (None, "D1")
    # self-diff and reverse direction
    assert t.diff(spark, 3, 3).count() == 0
    rev = {r["did"]: r for r in t.diff(spark, 3, 1).collect()}
    assert rev["d"]["change"] == "deleted"
    assert rev["c"]["change"] == "added"
    # columns= projection keeps order cols for classification
    slim = {r["did"]: r for r in
            t.diff(spark, 1, 3, columns=["text"]).collect()}
    assert slim["b"]["new_text"] == "B2"
    assert "old_seq" in t.diff(spark, 1, 3, columns=["text"]).columns


def test_diff_prunes_to_changed_buckets(spark):
    base = tempfile.mkdtemp(prefix="diff_")
    t = _mk(spark, base)
    t.merge(spark, _b(spark, [(f"k{i}", i, f"v{i}") for i in range(40)]),
            batch_id=0)
    t.merge(spark, _b(spark, [("k0", 100, "v0-new")]), batch_id=1)
    a = t.snapshot(1)["manifest_files"]
    b = t.snapshot(2)["manifest_files"]
    changed = {k for k in set(a) | set(b) if a.get(k) != b.get(k)}
    assert len(changed) == 1  # single-key update touches one bucket
    got = {r["did"]: r["change"] for r in t.diff(spark, 1, 2).collect()}
    assert got == {"k0": "updated"}


def test_diff_compaction_is_invisible(spark):
    base = tempfile.mkdtemp(prefix="diff_")
    t = _mk(spark, base)
    for i in range(3):
        t.merge(spark, _b(spark, [(f"k{j}", i * 100 + j, f"v{i}.{j}")
                                  for j in range(12)]), batch_id=i)
    before = t.io.head_snapshot_id()
    t.compact(spark)
    after = t.io.head_snapshot_id()
    assert after > before  # compaction committed a snapshot
    assert t.diff(spark, before, after).count() == 0


def test_diff_by_tag(spark):
    base = tempfile.mkdtemp(prefix="diff_")
    t = _mk(spark, base)
    t.merge(spark, _b(spark, [("a", 1, "A1")]), batch_id=0)
    t.tag("v1")
    t.merge(spark, _b(spark, [("a", 2, "A2")]), batch_id=1)
    got = t.diff(spark, "v1").collect()
    assert len(got) == 1 and got[0]["change"] == "updated"
