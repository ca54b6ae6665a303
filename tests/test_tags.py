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
