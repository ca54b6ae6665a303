"""Partition-spec evolution: ``SnapshotTable.rebucket``.

Contract under test:
- state identical (incl. tombstones) after a grow or shrink respec;
- time travel to pre-rebucket snapshots keeps the OLD layout working;
- subsequent MERGEs land under the new bucket count;
- change feed across the rebucket boundary reports only real changes;
- purge_keys erases keys from snapshots on BOTH sides of a respec
  (historical snapshots hash keys under their own n_buckets);
- empty-table respec is metadata-only; same-count respec is a no-op.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.streaming.pipeline import enrich_batch
from tests.conftest import assert_state_equals_oracle


@pytest.fixture(params=["mor", "cow"])
def table(tmp_path, request):
    return SnapshotTable.create(
        str(tmp_path / "pages"), n_buckets=8, write_mode=request.param
    )


def _merge_pdf(spark, table, pdf, batch_id=None, **kw):
    sdf = spark.createDataFrame(pdf[["seq", "url", "warc_ts", "op", "html"]])
    return table.merge(spark, enrich_batch(sdf), batch_id=batch_id, **kw)


def _manifest_buckets(table, snapshot_id=None):
    return {m["bucket"] for m in table.manifest_entries(snapshot_id=snapshot_id)}


@pytest.mark.parametrize("new_b", [32, 3])
def test_rebucket_preserves_state(spark, table, small_changelog, new_b):
    n = len(small_changelog)
    _merge_pdf(spark, table, small_changelog.iloc[: n // 2], batch_id=0)
    _merge_pdf(spark, table, small_changelog.iloc[n // 2 :], batch_id=1)
    before = table.read(spark, include_tombstones=True).toPandas()
    snap = table.rebucket(spark, new_b)
    assert snap["type"] == "rebucket"
    assert table.properties["n_buckets"] == new_b
    after = table.read(spark, include_tombstones=True).toPandas()
    assert len(before) == len(after)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))
    # physical layout actually respec'd
    bs = _manifest_buckets(table)
    assert bs and max(bs) < new_b
    if new_b < 8:
        assert len(bs) <= new_b


def test_time_travel_across_rebucket(spark, table, small_changelog):
    n = len(small_changelog)
    _merge_pdf(spark, table, small_changelog.iloc[: n // 2], batch_id=0)
    pre_sid = table.snapshot()["snapshot_id"]
    pre_state = table.read(spark).toPandas()
    table.rebucket(spark, 32)
    _merge_pdf(spark, table, small_changelog.iloc[n // 2 :], batch_id=1)
    # old snapshot still reads under its own (old) layout
    old = table.read(spark, snapshot_id=pre_sid).toPandas()
    assert_state_equals_oracle(old, pre_state)
    assert max(_manifest_buckets(table, snapshot_id=pre_sid)) < 8
    # head state folds both batches
    assert_state_equals_oracle(
        table.read(spark).toPandas(), replay_oracle(small_changelog))
    # the post-rebucket merge wrote under the NEW count
    head_bs = _manifest_buckets(table)
    assert max(head_bs) < 32


def test_changes_across_rebucket_boundary(spark, table, small_changelog):
    n = len(small_changelog)
    _merge_pdf(spark, table, small_changelog.iloc[: n // 2], batch_id=0)
    sid0 = table.snapshot()["snapshot_id"]
    table.rebucket(spark, 16)
    # pure respec: no visible key changed
    assert table.changes(spark, sid0).count() == 0
    _merge_pdf(spark, table, small_changelog.iloc[n // 2 :], batch_id=1)
    feed = table.changes(spark, sid0).toPandas()
    # feed across the boundary equals the logical diff of the two states
    a = replay_oracle(small_changelog.iloc[: n // 2]).set_index("url")
    b = replay_oracle(small_changelog).set_index("url")
    ins = set(b.index) - set(a.index)
    dels = set(a.index) - set(b.index)
    upd = {u for u in set(a.index) & set(b.index)
           if a.loc[u, "seq"] != b.loc[u, "seq"]}
    got = {t: set(g["url"]) for t, g in feed.groupby("change_type")}
    assert got.get("insert", set()) == ins
    assert got.get("delete", set()) == dels
    assert got.get("update", set()) == upd


def test_point_lookup_after_rebucket(spark, table, small_changelog):
    _merge_pdf(spark, table, small_changelog, batch_id=0)
    url = replay_oracle(small_changelog)["url"].iloc[0]
    table.rebucket(spark, 32)
    got = table.read(spark, point_lookup=url).toPandas()
    assert list(got["url"]) == [url]


def test_purge_keys_across_rebucket(spark, table, small_changelog):
    """purge must erase the key from PRE-rebucket snapshots too — those
    hash it into a different bucket id than head does."""
    _merge_pdf(spark, table, small_changelog, batch_id=0)
    url = replay_oracle(small_changelog)["url"].iloc[3]
    table.rebucket(spark, 5)
    rep = table.purge_keys(spark, [url])
    assert rep["rows_purged"] >= 2  # pre- and post-respec copies
    for s in table.history():
        sid = s["snapshot_id"]
        got = table.read(spark, snapshot_id=sid, include_tombstones=True)
        assert got.filter(got.url == url).count() == 0, f"sid {sid}"


def test_rebucket_tombstones_preserved_and_gc(spark, table):
    ts = pd.Timestamp("2024-06-01")
    rows = [
        (1, "https://x/1", ts, "upsert", b"<p>a</p>"),
        (2, "https://x/2", ts, "upsert", b"<p>b</p>"),
        (3, "https://x/2", ts + pd.Timedelta(hours=1), "delete", None),
    ]
    pdf = pd.DataFrame(rows, columns=["seq", "url", "warc_ts", "op", "html"])
    _merge_pdf(spark, table, pdf, batch_id=0)
    table.rebucket(spark, 4)
    tomb = table.read(spark, include_tombstones=True)
    assert tomb.filter(tomb.op == "delete").count() == 1  # kept
    # a late OLDER upsert still cannot resurrect the deleted url
    late = pd.DataFrame(
        [(0, "https://x/2", ts - pd.Timedelta(hours=1), "upsert", b"<p>z</p>")],
        columns=["seq", "url", "warc_ts", "op", "html"])
    _merge_pdf(spark, table, late, batch_id=1)
    assert table.read(spark).filter("url = 'https://x/2'").count() == 0
    # horizon GC drops it when the source guarantees no older events
    table.rebucket(spark, 6, tombstone_horizon=10)
    tomb2 = table.read(spark, include_tombstones=True)
    assert tomb2.filter(tomb2.op == "delete").count() == 0


def test_rebucket_noop_and_empty(spark, tmp_path):
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    s0 = t.snapshot()
    assert t.rebucket(spark, 8)["snapshot_id"] == s0["snapshot_id"]  # no-op
    snap = t.rebucket(spark, 64)  # empty table: metadata-only
    assert snap["type"] == "rebucket"
    assert t.properties["n_buckets"] == 64
    assert t.read(spark).count() == 0
    assert not glob.glob(os.path.join(str(tmp_path / "t"), "data", "s1*", "*"))


def test_rebucket_plan_single_exchange(spark, tmp_path, small_changelog):
    """The rebucket rewrite is ONE exchange: repartition by the NEW
    bucket clusters (bucket, key), so the LWW groupBy reduces in place
    (hash(bucket) satisfies the clustered distribution — the same
    one-job shape as MERGE). Pins the expression rebucket() builds."""
    import re

    from pyspark.sql import functions as F

    from montandon_etl_spark.lake.table import _BUCKET_COL
    from montandon_etl_spark.operators.lww import lww_latest

    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    sdf = spark.createDataFrame(
        small_changelog[["seq", "url", "warc_ts", "op", "html"]])
    t.merge(spark, enrich_batch(sdf), batch_id=0)
    raw = t.read(spark, include_tombstones=True, resolve=False)
    resolved = lww_latest(
        raw.withColumn(_BUCKET_COL, F.pmod(
            F.xxhash64(F.col("url")), F.lit(32)).cast("int"))
        .repartition(16, F.col(_BUCKET_COL)),
        keys=[_BUCKET_COL, "url"], order_cols=["warc_ts", "seq"])
    plan = resolved._jdf.queryExecution().executedPlan().toString()
    ex = re.findall(r"Exchange (\w+)", plan)
    assert ex == ["hashpartitioning"], plan[:2000]


def test_rebucket_sticky_zorder_stats(spark, tmp_path, small_changelog):
    t = SnapshotTable.create(str(tmp_path / "t"), n_buckets=8)
    sdf = spark.createDataFrame(
        small_changelog[["seq", "url", "warc_ts", "op", "html"]])
    t.merge(spark, enrich_batch(sdf), batch_id=0)
    t.compact(spark, cluster_by=["warc_ts"])
    t.rebucket(spark, 16)
    ents = t.manifest_entries()
    assert ents and all("warc_ts" in (e.get("col_stats") or {}) for e in ents)
