"""Round-2 lifecycle + hardening: snapshot expiry, orphan vacuum,
tombstone GC, point-lookup file pruning, within-batch duplicate events,
trailing/gap DDL, LSH bucket cap, COW key-join fallback, JSON validity."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.changelog import gen_changelog, gen_ddl_events
from montandon_etl_spark.streaming.pipeline import (
    apply_trailing_ddl,
    enrich_batch,
    merge_microbatch,
)
from tests.conftest import assert_state_equals_oracle


def _merge_pdf(spark, table, pdf, batch_id=None, **kw):
    sdf = spark.createDataFrame(pdf[["seq", "url", "warc_ts", "op", "html"]])
    return table.merge(spark, enrich_batch(sdf), batch_id=batch_id, **kw)


def _parquet_count(table_path: str) -> int:
    return len(glob.glob(os.path.join(table_path, "data", "**", "*.parquet"),
                         recursive=True))


# ------------------------------------------------------- duplicate delivery --
@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_within_batch_duplicate_event_single_row(spark, tmp_path, mode):
    """At-least-once redelivery INSIDE one micro-batch: the same
    (url, seq) event twice must produce exactly one table row."""
    t = SnapshotTable.create(str(tmp_path / f"dup_{mode}"), n_buckets=4,
                             write_mode=mode)
    ts = pd.Timestamp("2024-06-01")
    row = (7, "https://dup.example.org/p", ts, "upsert", b"<p>hello</p>")
    pdf = pd.DataFrame([row, row], columns=["seq", "url", "warc_ts", "op", "html"])
    _merge_pdf(spark, t, pdf, batch_id=0)
    got = t.read(spark).toPandas()
    assert len(got) == 1
    assert got["seq"].iloc[0] == 7 and got["text"].iloc[0] is not None


# ---------------------------------------------------------- trailing/gap DDL --
def test_trailing_and_gap_ddl_applied(spark, tmp_path, small_changelog):
    """A DDL whose seq lands in a gap between micro-batches is applied
    by the next batch; a DDL beyond the last DML is applied by the
    trailing sweep — total order matches replay_oracle."""
    t = SnapshotTable.create(str(tmp_path / "ddl_pages"), n_buckets=8)
    dml = small_changelog.sort_values("seq").reset_index(drop=True)
    max_seq = int(dml.seq.max())
    b1 = dml[dml.seq <= 300]
    b2 = dml[dml.seq > 320]  # seq (300, 320] never appears in any batch
    ddl = gen_ddl_events(start_seq=0)
    ddl["seq"] = [310, max_seq + 50]  # one in the gap, one beyond all DML

    for i, seg in enumerate([b1, b2]):
        sdf = spark.createDataFrame(seg[["seq", "url", "warc_ts", "op", "html"]])
        merge_microbatch(spark, t, sdf, batch_id=i, ddl_events=ddl)
    fields_mid = {f.name for f in t.user_fields()}
    assert ddl.iloc[0]["field"] in fields_mid or ddl.iloc[0]["new_name"] in fields_mid
    applied = apply_trailing_ddl(t, ddl)
    assert applied == 1  # the beyond-all-DML event
    got = t.read(spark).toPandas()
    want = replay_oracle(pd.concat([b1, b2]), ddl)
    assert sorted(got.columns) == sorted(want.columns)
    assert_state_equals_oracle(got, want, value_cols=["warc_ts", "seq", "text"])
    assert apply_trailing_ddl(t, ddl) == 0  # idempotent


# --------------------------------------------------------------- expiry / GC --
def test_expire_snapshots_reclaims_files_keeps_time_travel(spark, tmp_path,
                                                           small_changelog):
    t = SnapshotTable.create(str(tmp_path / "exp_pages"), n_buckets=4,
                             write_mode="mor", compact_threshold=100)
    n = len(small_changelog)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n - 50)]):
        _merge_pdf(spark, t, small_changelog.iloc[lo:hi], batch_id=i)
    t.compact(spark)
    # one merge AFTER compaction so the pre-compaction delta files are
    # referenced only by snapshots outside the keep_n=2 window
    _merge_pdf(spark, t, small_changelog.iloc[n - 50 :], batch_id=3)
    parent = t.snapshot()["parent_id"]
    want_head = t.read(spark).toPandas()
    want_parent = t.read(spark, snapshot_id=parent).toPandas()
    before = _parquet_count(t.path)

    report = t.expire_snapshots(keep_n=2)
    assert report["removed_data_files"] > 0
    assert report["removed_snapshots"] > 0
    assert _parquet_count(t.path) < before
    # live files = exactly the union of the two retained manifests
    live = {os.path.normpath(m["path"]) for rid in report["retained_snapshots"]
            for m in t.manifest_entries(snapshot_id=rid)}
    on_disk = {
        os.path.normpath(os.path.relpath(p, t.path))
        for p in glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                           recursive=True)
    }
    assert on_disk == live
    # time travel within keep_n is byte-identical
    assert_state_equals_oracle(t.read(spark).toPandas(), want_head)
    assert_state_equals_oracle(t.read(spark, snapshot_id=parent).toPandas(),
                               want_parent)
    # history walk stops gracefully at the horizon
    assert [s["snapshot_id"] for s in t.history()] == sorted(report["retained_snapshots"])
    # expired snapshot read fails loudly, not wrongly
    with pytest.raises(FileNotFoundError):
        t.read(spark, snapshot_id=0)
    assert t.read(spark).count() == len(want_head)


def test_vacuum_orphans_removes_crashed_commit_only(spark, tmp_path,
                                                    small_changelog):
    t = SnapshotTable.create(str(tmp_path / "vac_pages"), n_buckets=4)
    _merge_pdf(spark, t, small_changelog.iloc[:200], batch_id=0)
    want = t.read(spark).toPandas()
    # simulate a crash: data written for the NEXT snapshot, HEAD not swapped
    head = t.io.head_snapshot_id()
    orphan_dir = t.io.commit_data_dir(head + 1)
    os.makedirs(os.path.join(orphan_dir, "_bucket=0"), exist_ok=True)
    with open(os.path.join(orphan_dir, "_bucket=0", "part-junk.parquet"), "wb") as f:
        f.write(b"not a real parquet")
    with open(t.io.head_path() + ".tmp", "w") as f:
        f.write("torn")
    removed = t.vacuum_orphans()
    assert any(orphan_dir in r for r in removed)
    assert not os.path.exists(orphan_dir)
    assert not os.path.exists(t.io.head_path() + ".tmp")
    # committed data untouched
    assert_state_equals_oracle(t.read(spark).toPandas(), want)
    assert t.vacuum_orphans() == []


def test_tombstone_gc_horizon(spark, tmp_path):
    """Ordered replay: compaction with a seq horizon physically drops
    tombstones; later (higher-seq) upserts still recreate keys; final
    state equals the oracle."""
    ts = pd.Timestamp("2024-06-01")
    cols = ["seq", "url", "warc_ts", "op", "html"]
    b1 = pd.DataFrame([
        (1, "https://a/1", ts, "upsert", b"<p>a1</p>"),
        (2, "https://a/2", ts, "upsert", b"<p>a2</p>"),
        (3, "https://a/1", ts + pd.Timedelta(hours=1), "delete", None),
        (4, "https://a/3", ts, "upsert", b"<p>a3</p>"),
        (5, "https://a/3", ts + pd.Timedelta(hours=1), "delete", None),
    ], columns=cols)
    b2 = pd.DataFrame([
        (6, "https://a/1", ts + pd.Timedelta(days=1), "upsert", b"<p>a1v2</p>"),
    ], columns=cols)
    t = SnapshotTable.create(str(tmp_path / "gc_pages"), n_buckets=4,
                             write_mode="mor", compact_threshold=100)
    _merge_pdf(spark, t, b1, batch_id=0)
    raw = t.read(spark, include_tombstones=True).toPandas()
    assert (raw["op"] == "delete").sum() == 2
    # horizon = committed max seq: the ordered source guarantees every
    # future event has seq > 5, so both tombstones are droppable
    t.compact(spark, tombstone_horizon=5)
    raw = t.read(spark, include_tombstones=True).toPandas()
    assert (raw["op"] == "delete").sum() == 0
    assert set(t.read(spark).toPandas()["url"]) == {"https://a/2"}
    _merge_pdf(spark, t, b2, batch_id=1)
    got = t.read(spark).toPandas()
    want = replay_oracle(pd.concat([b1, b2]))
    assert_state_equals_oracle(got, want)


def test_tombstone_preserved_without_horizon(spark, tmp_path):
    ts = pd.Timestamp("2024-06-01")
    cols = ["seq", "url", "warc_ts", "op", "html"]
    b1 = pd.DataFrame([
        (2, "https://b/1", ts + pd.Timedelta(hours=1), "delete", None),
    ], columns=cols)
    late_old = pd.DataFrame([
        (1, "https://b/1", ts, "upsert", b"<p>old</p>"),
    ], columns=cols)
    t = SnapshotTable.create(str(tmp_path / "keep_pages"), n_buckets=4,
                             write_mode="mor", compact_threshold=100)
    _merge_pdf(spark, t, b1, batch_id=0)
    t.compact(spark)  # no horizon → tombstone survives compaction
    _merge_pdf(spark, t, late_old, batch_id=1)
    assert t.read(spark).count() == 0  # not resurrected


# ------------------------------------------------------- point-lookup pruning --
def test_point_lookup_prunes_files_within_bucket(spark, tmp_path):
    """Two merges with disjoint url ranges land files in the same
    buckets; a point lookup must read fewer files than the bucket holds
    (manifest key min/max pruning), and return the right row."""
    ts = pd.Timestamp("2024-06-01")
    cols = ["seq", "url", "warc_ts", "op", "html"]
    lo = pd.DataFrame(
        [(i, f"https://aaa.example.org/p/{i:04d}", ts, "upsert", b"<p>lo</p>")
         for i in range(40)], columns=cols)
    hi = pd.DataFrame(
        [(100 + i, f"https://zzz.example.org/p/{i:04d}", ts, "upsert", b"<p>hi</p>")
         for i in range(40)], columns=cols)
    t = SnapshotTable.create(str(tmp_path / "pl_pages"), n_buckets=2,
                             write_mode="mor", compact_threshold=100)
    _merge_pdf(spark, t, lo, batch_id=0)
    _merge_pdf(spark, t, hi, batch_id=1)
    url = "https://aaa.example.org/p/0007"
    all_entries = t.manifest_entries()
    pruned = t.manifest_entries(point_lookup=url)
    assert all(m["key_min"] is not None for m in all_entries)
    assert 0 < len(pruned) < len(all_entries)
    # every pruned-in file is from the lo batch (zzz files can't match)
    assert all(m["key_min"].startswith("https://aaa") for m in pruned)
    got = t.read(spark, point_lookup=url).toPandas()
    assert list(got["url"]) == [url] and got["seq"].iloc[0] == 7


# ------------------------------------------------------------- LSH bucket cap --
def test_lsh_pathological_bucket_cap(spark):
    """An adversarial corpus (many identical docs → one universal band
    bucket) must NOT expand |bucket|² pairs: the cap drops the bucket
    before pair generation and the stats sidecar reports the drop."""
    from montandon_etl_spark.operators.dedup import (
        minhash_lsh_bucket_stats,
        minhash_lsh_pairs,
    )

    n = 400
    rows = [(i, "the same boilerplate page text repeated everywhere") for i in range(n)]
    rows += [(n, "a genuinely unique document about owls and rivers"),
             (n + 1, "a genuinely unique document about owls and rivers!")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    capped = minhash_lsh_pairs(df, "doc_id", "text", n=2, k=8, bands=4,
                               max_bucket=50)
    pairs = capped.toPandas()
    # the 400-doc bucket is dropped; the near-dup pair of unique docs survives
    assert not ((pairs.id_a < n) & (pairs.id_b < n)).any()
    assert ((pairs.id_a == n) & (pairs.id_b == n + 1)).any()

    stats = minhash_lsh_bucket_stats(df, "doc_id", "text", n=2, k=8, bands=4,
                                     max_bucket=50).collect()[0]
    assert stats["n_dropped_buckets"] >= 1
    assert stats["max_bucket_size"] == n
    assert stats["n_dropped_docs"] >= n

    uncapped = minhash_lsh_pairs(df, "doc_id", "text", n=2, k=8, bands=4,
                                 max_bucket=None)
    assert uncapped.count() == n * (n - 1) // 2 + 1  # full blowup without cap


# --------------------------------------------------------- COW key-join paths --
def test_cow_shuffle_semijoin_equals_broadcast(spark, tmp_path, small_changelog):
    outs = {}
    for name, bk in [("bcast", True), ("shuffle", False)]:
        t = SnapshotTable.create(str(tmp_path / f"cow_{name}"), n_buckets=8,
                                 write_mode="cow")
        n = len(small_changelog)
        _merge_pdf(spark, t, small_changelog.iloc[: n // 2], batch_id=0,
                   broadcast_keys=bk)
        _merge_pdf(spark, t, small_changelog.iloc[n // 2 :], batch_id=1,
                   broadcast_keys=bk)
        outs[name] = t.read(spark).toPandas()
    assert_state_equals_oracle(outs["shuffle"], outs["bcast"])
    assert_state_equals_oracle(outs["bcast"], replay_oracle(small_changelog))


# ------------------------------------------------------------------ richer DDL --
def test_drop_column_no_value_leak_on_readd(spark, tmp_path):
    """drop_column is schema-only (files untouched) and a later add of
    the SAME NAME is a distinct field id — the old values must not leak
    into the re-added column."""
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "drop_pages"), n_buckets=2)
    pdf = pd.DataFrame([(1, "https://c/1", ts, "upsert", b"<p>uno</p>")],
                       columns=["seq", "url", "warc_ts", "op", "html"])
    _merge_pdf(spark, t, pdf, batch_id=0)
    assert t.read(spark).toPandas()["lang"].iloc[0] is not None

    t.apply_ddl("drop_column", "lang")
    got = t.read(spark).toPandas()
    assert "lang" not in got.columns and len(got) == 1

    t.apply_ddl("add_column", "lang", dtype="string")
    got = t.read(spark).toPandas()
    assert got["lang"].iloc[0] is None  # fresh field id → no resurrection

    with pytest.raises(ValueError):
        t.apply_ddl("drop_column", "url")  # key column is undroppable
    with pytest.raises(ValueError):
        t.apply_ddl("drop_column", "seq")  # system column is undroppable


def test_widen_column_preserves_old_files(spark, tmp_path):
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "widen_pages"), n_buckets=2)
    t.apply_ddl("add_column", "views", dtype="int")
    pdf = pd.DataFrame(
        [(1, "https://w/1", ts, "upsert", b"<p>x</p>", 7)],
        columns=["seq", "url", "warc_ts", "op", "html", "views"])
    sdf = spark.createDataFrame(pdf)
    t.merge(spark, enrich_batch(sdf), batch_id=0)

    t.apply_ddl("widen_column", "views", dtype="bigint")
    got = t.read(spark)
    assert dict(got.dtypes)["views"] == "bigint"
    assert got.toPandas()["views"].iloc[0] == 7  # old int file reads widened

    # a post-widen producer can exceed int range
    pdf2 = pd.DataFrame(
        [(2, "https://w/2", ts, "upsert", b"<p>y</p>", 2**40)],
        columns=["seq", "url", "warc_ts", "op", "html", "views"])
    t.merge(spark, enrich_batch(spark.createDataFrame(pdf2)), batch_id=1)
    vals = {r["url"]: r["views"] for r in t.read(spark).collect()}
    assert vals == {"https://w/1": 7, "https://w/2": 2**40}

    with pytest.raises(ValueError):
        t.apply_ddl("widen_column", "views", dtype="int")  # narrowing refused


# ----------------------------------------------------- end-to-end maintenance --
def test_plan_with_maintenance_policy(spark, tmp_path, small_changelog):
    """Full pipeline with the production maintenance policy on — an
    ordered changelog tail with tombstone GC, aggressive compaction and
    snapshot retention — still replays to exactly the oracle state, and
    the table keeps only the retained snapshots on disk."""
    from montandon_etl_spark.plans.cdc import CdcPipelinePlan
    from montandon_etl_spark.sources.changelog import write_changelog

    log_dir = str(tmp_path / "chg")
    write_changelog(small_changelog, log_dir, n_chunks=8)
    plan = CdcPipelinePlan(
        changelog_dir=log_dir,
        table_path=str(tmp_path / "pages"),
        n_buckets=8,
        ordered_source=True,
        retention_snapshots=2,
        compact_threshold=2,
    )
    table = plan.run_batch(spark, n_batches=8)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))
    # retention kept only the newest snapshots
    assert len(table.history()) <= 2
    live = {os.path.normpath(m["path"]) for m in table.manifest_entries()}
    on_disk = {
        os.path.normpath(os.path.relpath(p, table.path))
        for p in glob.glob(os.path.join(table.path, "data", "**", "*.parquet"),
                           recursive=True)
    }
    assert live <= on_disk  # every referenced file exists
    # tombstone GC ran at compactions: deletes of long-settled seqs are
    # physically gone (only tombstones newer than the last compaction
    # horizon may remain)
    raw = table.read(spark, include_tombstones=True).toPandas()
    horizon_candidates = [
        s["metrics"].get("tombstone_horizon")
        for s in table.history() if s["type"] == "compact"
    ]
    if horizon_candidates and any(h is not None for h in horizon_candidates):
        h = max(x for x in horizon_candidates if x is not None)
        assert not ((raw["op"] == "delete") & (raw["seq"] <= h)).any()


def test_streaming_sink_retention(spark, tmp_path, small_changelog):
    """The streaming sink applies the retention policy between epochs:
    after the tail drains, only keep_n snapshots remain and the state
    still equals the oracle."""
    from montandon_etl_spark.sources.changelog import write_changelog
    from montandon_etl_spark.streaming.pipeline import run_stream

    log_dir = str(tmp_path / "schg")
    write_changelog(small_changelog, log_dir, n_chunks=4)
    t = SnapshotTable.create(str(tmp_path / "spages"), n_buckets=4)
    q = run_stream(spark, t, log_dir, str(tmp_path / "sckpt"),
                   gc_tombstones=True, retention_snapshots=2)
    q.awaitTermination(300)
    assert len(t.history()) <= 2
    assert_state_equals_oracle(t.read(spark).toPandas(),
                               replay_oracle(small_changelog))


# -------------------------------------------------------------- change feed --
def test_change_feed_between_snapshots(spark, tmp_path, small_changelog):
    """table.changes(A, B) classifies exactly the keys whose visible
    state differs — verified against the replay oracle at both
    snapshots."""
    t = SnapshotTable.create(str(tmp_path / "cdf_pages"), n_buckets=4)
    n = len(small_changelog)
    s1 = _merge_pdf(spark, t, small_changelog.iloc[: 2 * n // 3], batch_id=0)
    s2 = _merge_pdf(spark, t, small_changelog.iloc[2 * n // 3 :], batch_id=1)
    feed = t.changes(spark, s1["snapshot_id"], s2["snapshot_id"]).toPandas()

    a = replay_oracle(small_changelog.iloc[: 2 * n // 3]).set_index("url")
    b = replay_oracle(small_changelog).set_index("url")
    want_ins = set(b.index) - set(a.index)
    want_del = set(a.index) - set(b.index)
    common = set(a.index) & set(b.index)
    want_upd = {u for u in common if a.loc[u, "seq"] != b.loc[u, "seq"]}

    got = feed.groupby("change_type").url.apply(set).to_dict()
    assert got.get("insert", set()) == want_ins
    assert got.get("delete", set()) == want_del
    assert got.get("update", set()) == want_upd
    # unchanged keys never appear
    assert len(feed) == len(want_ins) + len(want_del) + len(want_upd)
    # new-side payload rides along for inserts/updates
    upd = feed[feed.change_type == "update"]
    if len(upd):
        assert upd.new_text.notna().all()
        u = upd.iloc[0]
        assert b.loc[u.url, "seq"] == u.new_seq and a.loc[u.url, "seq"] == u.old_seq


def test_change_feed_empty_and_pruned(spark, tmp_path, small_changelog):
    t = SnapshotTable.create(str(tmp_path / "cdf2"), n_buckets=8, write_mode="cow")
    s1 = _merge_pdf(spark, t, small_changelog.iloc[:300], batch_id=0)
    # schema-only snapshot: zero data change → empty feed
    s2 = t.apply_ddl("add_column", "note", dtype="string")
    assert t.changes(spark, s1["snapshot_id"], s2["snapshot_id"]).count() == 0
    # one-url merge on a COW table touches one bucket → feed is that url
    one = small_changelog.iloc[[5]].copy()
    one["seq"] = one["seq"] + 50_000
    one["warc_ts"] = one["warc_ts"] + pd.Timedelta(days=2)
    s3 = _merge_pdf(spark, t, one, batch_id=1)
    feed = t.changes(spark, s2["snapshot_id"], s3["snapshot_id"]).toPandas()
    assert list(feed.url) == [one["url"].iloc[0]]
    assert feed.change_type.iloc[0] == "update"


def test_merge_rejects_malformed_batch(spark, tmp_path):
    """A producer batch missing the key/order/op columns must fail
    loudly — _conform would otherwise write NULL-keyed rows."""
    t = SnapshotTable.create(str(tmp_path / "schema_guard"), n_buckets=2)
    bad = spark.createDataFrame(
        [(1, pd.Timestamp("2024-06-01").to_pydatetime(), "upsert")],
        "seq bigint, warc_ts timestamp, op string")  # url missing
    with pytest.raises(ValueError, match="missing required column"):
        t.merge(spark, bad, batch_id=0)
    assert t.io.head_snapshot_id() == 0  # nothing committed


# ------------------------------------------------------------- JSON validity --
def test_validate_json_payload_flags_malformed(spark):
    from montandon_etl_spark.sources.payload import validate_json_payload

    df = spark.createDataFrame(
        [("1", '{"k": 5}'), ("2", "garbage"), ("3", '{"k":'), ("4", None),
         ("5", "{'k': 7}"), ("6", '{"other": 1}')],
        "id string, props string")
    got = {
        r["id"]: (r["payload_valid"], r["k"])
        for r in validate_json_payload(df, "props", "k bigint")
        .select("id", "payload_valid", F.col("parsed.k").alias("k")).collect()
    }
    assert got == {"1": (True, 5), "2": (False, None), "3": (False, None),
                   "4": (None, None), "5": (False, None), "6": (True, None)}


# ----------------------------------------------------------- session parsing --
def test_shuffle_partition_inference_guards():
    from montandon_etl_spark.session import _infer_shuffle_partitions as infer

    assert infer("local[4]", 32) == 4
    assert infer("local[4,2]", 32) == 4  # threads,maxFailures form
    assert infer("local[*]", 32) == 32
    assert infer("spark://host:7077", 32) == 32
    assert infer("local[oops]", 32) == 32
    assert infer("yarn", 16) == 16
