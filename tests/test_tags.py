"""Snapshot tags: immutable named refs, tag-based time travel, and
expiry protection (the write-audit-publish primitive)."""

from __future__ import annotations

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable


@pytest.fixture
def table(tmp_path):
    return SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)


def _merge(spark, table, lo, n=30, bid=None):
    df = spark.createDataFrame(
        [(lo + i, f"https://t.com/{(lo + i) % 13}",
          pd.Timestamp("2024-03-01").to_pydatetime(), "upsert",
          f"<p>{lo + i}</p>".encode()) for i in range(n)],
        "seq long, url string, warc_ts timestamp, op string, html binary",
    )
    return table.merge(spark, df, batch_id=bid)


def test_tag_read_and_immutability(spark, table):
    _merge(spark, table, 0, bid=0)
    sid = table.tag("v1")
    before = sorted(map(tuple, table.read(spark).collect()))
    _merge(spark, table, 1000, bid=1)
    assert sorted(map(tuple, table.read(spark, snapshot_id="v1").collect())) \
        == before
    assert table.tags() == {"v1": sid}
    with pytest.raises(FileExistsError):
        table.tag("v1")
    with pytest.raises(KeyError, match="no tag"):
        table.read(spark, snapshot_id="nope")
    with pytest.raises(ValueError):
        table.tag("../escape")


def test_tagged_snapshot_survives_expiry(spark, table):
    _merge(spark, table, 0, bid=0)
    table.tag("audit-ok")
    before = sorted(map(tuple, table.read(spark, snapshot_id="audit-ok")
                        .collect()))
    for j in range(1, 5):
        _merge(spark, table, 1000 * j, bid=j)
    res = table.expire_snapshots(keep_n=1)
    assert table.tags()["audit-ok"] in res["retained_snapshots"]
    # the tagged state is still byte-identical after aggressive expiry
    assert sorted(map(tuple, table.read(spark, snapshot_id="audit-ok")
                      .collect())) == before
    # ... and dropping the tag releases it on the next expiry
    table.drop_tag("audit-ok")
    res2 = table.expire_snapshots(keep_n=1)
    assert res2["removed_snapshots"] >= 1
    with pytest.raises(FileNotFoundError):
        table.io.read_snapshot(1)


def test_write_audit_publish_flow(spark, table):
    """WAP: commit a batch, audit the snapshot, publish by tag;
    a failed audit never gets the tag and expiry reclaims it."""
    _merge(spark, table, 0, bid=0)
    good_sid = table.snapshot()["snapshot_id"]
    audit_rows = table.read(spark, snapshot_id=good_sid).count()
    assert audit_rows == 13
    table.tag("published", snapshot_id=good_sid)
    # a later bad batch is committed but NOT published
    _merge(spark, table, 50_000, bid=1)
    assert table.tags() == {"published": good_sid}
    got = table.read(spark, snapshot_id="published").count()
    assert got == 13


# ----------------------------------------------------------------- rollback


def test_rollback_restores_state_forward(spark, table):
    _merge(spark, table, 0, bid=0)
    good_sid = table.tag("good")
    good = sorted(map(tuple, table.read(spark).collect()))
    # the bad batch: overwrites url /0 AND inserts a fresh key
    bad = spark.createDataFrame(
        [(1000, "https://t.com/0",
          pd.Timestamp("2024-03-02").to_pydatetime(), "upsert",
          b"<p>bad</p>"),
         (1001, "https://t.com/fresh",
          pd.Timestamp("2024-03-02").to_pydatetime(), "upsert",
          b"<p>bad</p>")],
        "seq long, url string, warc_ts timestamp, op string, html binary",
    )
    table.merge(spark, bad, batch_id=1)
    bad_sid = table.io.head_snapshot_id()
    assert sorted(map(tuple, table.read(spark).collect())) != good

    snap = table.rollback("good")
    # forward-moving history: new snapshot, bad state still readable
    assert snap["snapshot_id"] == bad_sid + 1
    assert snap["parent_id"] == bad_sid
    assert table.io.head_snapshot_id() == snap["snapshot_id"]
    assert snap["metrics"]["rolled_back_to"] == good_sid
    assert sorted(map(tuple, table.read(spark).collect())) == good
    assert sorted(map(tuple,
                      table.read(spark, snapshot_id=bad_sid).collect())) \
        != good
    # the change feed of the rollback commit retracts the bad batch
    ch = {r["url"]: r["change_type"]
          for r in table.changes(spark, bad_sid,
                                 snap["snapshot_id"]).collect()}
    assert ch["https://t.com/fresh"] == "delete"  # fresh key retracted
    assert ch["https://t.com/0"] == "update"      # overwrite reverted


def test_rollback_reopens_batch_id_ledger(spark, table):
    _merge(spark, table, 0, bid=0)
    table.tag("good")
    _merge(spark, table, 1000, bid=1)
    # before rollback, redelivering batch 1 is a no-op (exactly-once)
    assert _merge(spark, table, 2000, bid=1) is None
    table.rollback("good")
    assert table.snapshot()["committed_max_batch_id"] == 0
    # after rollback the FIXED batch 1 genuinely merges
    res = _merge(spark, table, 3000, bid=1)
    assert res is not None
    got = {r["url"] for r in table.read(spark).collect()}
    assert any(u.endswith(f"/{(3000 + i) % 13}") for i in range(30)
               for u in got)


def test_rollback_restores_schema(spark, table):
    _merge(spark, table, 0, bid=0)
    pre_ddl = table.io.head_snapshot_id()
    table.apply_ddl("rename_column", "lang", new_name="language")
    assert "language" in table.read(spark).columns
    table.rollback(pre_ddl)
    cols = table.read(spark).columns
    assert "lang" in cols and "language" not in cols
    # rows unchanged by the schema round-trip
    assert table.read(spark).count() > 0


def test_rollback_noop_and_expiry(spark, table):
    _merge(spark, table, 0, bid=0)
    head = table.snapshot()
    assert table.rollback(head["snapshot_id"])["snapshot_id"] \
        == head["snapshot_id"]  # already there: no empty commit
    assert table.io.head_snapshot_id() == head["snapshot_id"]

    table.tag("keep")
    _merge(spark, table, 1000, bid=1)
    table.rollback("keep")
    want = sorted(map(tuple, table.read(spark).collect()))
    # the undone snapshots expire; head stays byte-identical and the
    # bad batch's files become vacuumable garbage
    table.expire_snapshots(keep_n=1)
    table.vacuum_orphans()
    assert sorted(map(tuple, table.read(spark).collect())) == want
