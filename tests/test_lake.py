"""Snapshot-log table: create, merge, tombstones, schema evolution,
time travel, exactly-once, bucket pruning."""

from __future__ import annotations

import glob
import os

import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.changelog import gen_changelog
from montandon_etl_spark.streaming.pipeline import enrich_batch
from tests.conftest import assert_state_equals_oracle


@pytest.fixture(params=["mor", "cow"])
def table(tmp_path, request):
    """Both write modes run the full semantic suite."""
    return SnapshotTable.create(
        str(tmp_path / "pages"), n_buckets=8, write_mode=request.param
    )


def _merge_pdf(spark, table, pdf, batch_id=None, **kw):
    sdf = spark.createDataFrame(pdf[["seq", "url", "warc_ts", "op", "html"]])
    return table.merge(spark, enrich_batch(sdf), batch_id=batch_id, **kw)


def test_create_and_empty_read(spark, table):
    df = table.read(spark)
    assert df.count() == 0
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang", "seq"}


def test_single_batch_merge_matches_oracle(spark, table, small_changelog):
    _merge_pdf(spark, table, small_changelog, batch_id=0)
    got = table.read(spark).toPandas()
    want = replay_oracle(small_changelog)
    assert_state_equals_oracle(got, want)


def test_multi_batch_merge_matches_oracle(spark, table, small_changelog):
    n = len(small_changelog)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        _merge_pdf(spark, table, small_changelog.iloc[lo:hi], batch_id=i)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))


def test_out_of_order_batches_same_final_state(spark, table, small_changelog):
    """LWW commutativity: replaying batches in a different order gives
    the same final state (late data folds in correctly)."""
    n = len(small_changelog)
    chunks = [small_changelog.iloc[2 * n // 3 :], small_changelog.iloc[: n // 3],
              small_changelog.iloc[n // 3 : 2 * n // 3]]
    for i, c in enumerate(chunks):
        _merge_pdf(spark, table, c, batch_id=i)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))


def test_delete_tombstone_blocks_older_upsert(spark, table, small_changelog):
    """A late-arriving upsert older than an already-applied delete must
    NOT resurrect the url (tombstone correctness across batches)."""
    import pandas as pd

    ts = pd.Timestamp("2024-06-01")
    b1 = pd.DataFrame(
        [(10, "https://x/1", ts + pd.Timedelta(hours=2), "delete", None)],
        columns=["seq", "url", "warc_ts", "op", "html"],
    )
    b2 = pd.DataFrame(
        [(5, "https://x/1", ts, "upsert", b"<p>old</p>")],
        columns=["seq", "url", "warc_ts", "op", "html"],
    )
    _merge_pdf(spark, table, b1, batch_id=0)
    _merge_pdf(spark, table, b2, batch_id=1)
    assert table.read(spark).count() == 0
    # tombstone is still there internally
    assert table.read(spark, include_tombstones=True).count() == 1


def test_exactly_once_duplicate_batch_noop(spark, table, small_changelog):
    first = small_changelog.iloc[:400]
    snap1 = _merge_pdf(spark, table, first, batch_id=0)
    assert snap1 is not None
    again = _merge_pdf(spark, table, first, batch_id=0)  # redelivery
    assert again is None
    assert table.io.head_snapshot_id() == snap1["snapshot_id"]
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(first))


def test_salted_merge_equals_unsalted(spark, table, small_changelog):
    _merge_pdf(spark, table, small_changelog, batch_id=0, use_salted=True, n_salts=8)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))


def test_copy_on_write_only_touched_buckets(spark, tmp_path, small_changelog):
    table = SnapshotTable.create(str(tmp_path / "cow_pages"), n_buckets=8,
                                 write_mode="cow")
    _merge_pdf(spark, table, small_changelog, batch_id=0)
    snap1 = table.snapshot()
    # a one-url second batch touches exactly one bucket
    one = small_changelog.iloc[[0]].copy()
    one["seq"] = one["seq"] + 10_000
    one["warc_ts"] = one["warc_ts"] + __import__("pandas").Timedelta(days=1)
    _merge_pdf(spark, table, one, batch_id=1)
    snap2 = table.snapshot()
    assert snap2["metrics"]["buckets_rewritten"] == 1
    man1 = table.manifest_entries(snapshot_id=snap1["snapshot_id"])
    man2 = table.manifest_entries(snapshot_id=snap2["snapshot_id"])
    carried = {m["path"] for m in man1} & {m["path"] for m in man2}
    assert len(carried) == len(man1) - 1  # 7 of 8 buckets carried over
    # manifest-list form: untouched buckets carry the SAME manifest file
    # by reference, so commit metadata is O(touched buckets)
    shared_refs = set(snap1["manifest_files"].values()) & set(
        snap2["manifest_files"].values())
    assert len(shared_refs) == len(snap1["manifest_files"]) - 1


def test_time_travel(spark, table, small_changelog):
    s1 = _merge_pdf(spark, table, small_changelog.iloc[:300], batch_id=0)
    n1 = table.read(spark).count()
    _merge_pdf(spark, table, small_changelog.iloc[300:], batch_id=1)
    n_head = table.read(spark).count()
    assert table.read(spark, snapshot_id=s1["snapshot_id"]).count() == n1
    assert n_head >= n1


def test_schema_evolution_add_and_rename(spark, table, small_changelog):
    _merge_pdf(spark, table, small_changelog.iloc[:200], batch_id=0)
    table.apply_ddl("add_column", "title", dtype="string")
    table.apply_ddl("rename_column", "lang", new_name="language")
    df = table.read(spark)
    assert "language" in df.columns and "lang" not in df.columns and "title" in df.columns
    # old files still readable: language carries pre-rename data
    assert df.filter(df.language.isNotNull()).count() > 0
    assert df.filter(df.title.isNotNull()).count() == 0
    # new data after evolution merges fine and old+new union correctly
    _merge_pdf(spark, table, small_changelog.iloc[200:400], batch_id=1)
    df2 = table.read(spark)
    assert df2.filter(df2.language.isNotNull()).count() == df2.count()
    # field ids stable: rename did not change the id of lang/language
    fields = {f.name: f.id for f in table.user_fields()}
    assert fields["language"] == 5 and fields["title"] == 6


def test_rename_key_column_follows_through(spark, table, small_changelog):
    """Renaming the key column must rename properties.key_col too —
    otherwise every later read/merge resolves a dead name. Batches may
    keep arriving under the HISTORICAL name (conform maps by field
    id), and LWW/point reads work under the new one."""
    _merge_pdf(spark, table, small_changelog.iloc[:400], batch_id=0)
    table.apply_ddl("rename_column", "url", new_name="page_url")
    assert table.properties["key_col"] == "page_url"
    df = table.read(spark)
    assert "page_url" in df.columns and "url" not in df.columns
    n0 = df.count()
    assert n0 > 0
    # a post-rename batch still carrying the old name conforms by id
    _merge_pdf(spark, table, small_changelog.iloc[400:], batch_id=1)
    got = table.read(spark).withColumnRenamed("page_url", "url").toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))
    # point lookup under the new key name
    url = got["url"].iloc[0]
    assert table.read(spark, point_lookup=url).count() == 1
    # order-col rename follows through as well
    table.apply_ddl("rename_column", "warc_ts", new_name="seen_ts")
    assert table.properties["order_cols"][0] == "seen_ts"
    assert table.read(spark).count() == len(got)


def test_diff_and_changes_across_key_rename(spark, table, small_changelog):
    """Cross-snapshot operators resolve each side by FIELD ID, so a
    key/order-column rename between the snapshots doesn't break the
    change feed — and a rename-only pair of snapshots diffs empty."""
    n = len(small_changelog)
    _merge_pdf(spark, table, small_changelog.iloc[: n // 2], batch_id=0)
    sid0 = table.snapshot()["snapshot_id"]
    table.apply_ddl("rename_column", "url", new_name="page_url")
    table.apply_ddl("rename_column", "warc_ts", new_name="seen_ts")
    assert table.changes(spark, sid0).count() == 0
    assert table.diff(spark, sid0).count() == 0
    _merge_pdf(spark, table, small_changelog.iloc[n // 2 :], batch_id=1)
    feed = table.changes(spark, sid0, include_old_values=True).toPandas()
    a = replay_oracle(small_changelog.iloc[: n // 2]).set_index("url")
    b = replay_oracle(small_changelog).set_index("url")
    ins = set(b.index) - set(a.index)
    dels = set(a.index) - set(b.index)
    upd = {u for u in set(a.index) & set(b.index)
           if a.loc[u, "seq"] != b.loc[u, "seq"]}
    got = {t: set(g["page_url"]) for t, g in feed.groupby("change_type")}
    assert got.get("insert", set()) == ins
    assert got.get("delete", set()) == dels
    assert got.get("update", set()) == upd
    d = table.diff(spark, sid0).toPandas()
    assert set(d["page_url"]) == ins | dels | upd


def test_rename_system_or_taken_name_rejected(spark, table, small_changelog):
    _merge_pdf(spark, table, small_changelog.iloc[:50], batch_id=0)
    with pytest.raises(ValueError, match="system column"):
        table.apply_ddl("rename_column", "seq", new_name="sequence")
    with pytest.raises(ValueError, match="already exists"):
        table.apply_ddl("rename_column", "text", new_name="lang")


def test_bucket_pruned_read_reads_fewer_files(spark, table, small_changelog):
    _merge_pdf(spark, table, small_changelog, batch_id=0)
    snap = table.snapshot()
    all_buckets = {m["bucket"] for m in table.manifest_entries(snapshot_id=snap["snapshot_id"])}
    one_bucket = next(iter(all_buckets))
    pruned = table.read(spark, buckets=[one_bucket])
    full = table.read(spark)
    assert 0 < pruned.count() < full.count()


def test_mor_compaction_preserves_state(spark, tmp_path, small_changelog):
    """Deltas accumulate per bucket; compact() folds them to one file
    per bucket without changing visible state, and keeps tombstones."""
    table = SnapshotTable.create(str(tmp_path / "mor_pages"), n_buckets=4,
                                 write_mode="mor", compact_threshold=1000)
    n = len(small_changelog)
    for i, lo in enumerate(range(0, n, n // 6)):
        _merge_pdf(spark, table, small_changelog.iloc[lo : lo + n // 6], batch_id=i)
    before = table.read(spark).toPandas()
    files_before = len(table.manifest_entries())
    tombs_before = table.read(spark, include_tombstones=True).count() - len(before)
    assert files_before > 4  # real delta accumulation
    snap = table.compact(spark)
    assert snap["type"] == "compact"
    files_after = len(table.manifest_entries())
    assert files_after <= 4
    after = table.read(spark).toPandas()
    assert_state_equals_oracle(after, replay_oracle(small_changelog))
    assert before.sort_values("url").reset_index(drop=True).equals(
        after.sort_values("url").reset_index(drop=True)
    )
    tombs_after = table.read(spark, include_tombstones=True).count() - len(after)
    assert tombs_after == tombs_before > 0  # deletes survive compaction


def test_mor_auto_compaction_triggers(spark, tmp_path, small_changelog):
    table = SnapshotTable.create(str(tmp_path / "mor_auto"), n_buckets=2,
                                 write_mode="mor", compact_threshold=2)
    n = len(small_changelog)
    for i, lo in enumerate(range(0, n, n // 6)):
        _merge_pdf(spark, table, small_changelog.iloc[lo : lo + n // 6], batch_id=i)
    counts: dict[int, int] = {}
    for m in table.manifest_entries():
        counts[m["bucket"]] = counts.get(m["bucket"], 0) + 1
    assert max(counts.values()) <= 2 + 1  # budget respected (±1 fresh delta)
    assert any(s["type"] == "compact" for s in table.history())
    assert_state_equals_oracle(table.read(spark).toPandas(),
                               replay_oracle(small_changelog))


def test_orphan_files_ignored(spark, table, small_changelog, tmp_path):
    """Crash-safety: data files written but never committed are invisible."""
    _merge_pdf(spark, table, small_changelog.iloc[:100], batch_id=0)
    n = table.read(spark).count()
    # simulate a crashed commit: stray parquet in a future commit dir
    d = table.io.commit_data_dir(99)
    os.makedirs(os.path.join(d, "_bucket=0"), exist_ok=True)
    import shutil

    src = glob.glob(os.path.join(
        table.io.data_dir, "s00000001*", "_bucket=*", "*.parquet"))[0]
    shutil.copy(src, os.path.join(d, "_bucket=0", "orphan.parquet"))
    assert table.read(spark).count() == n  # manifest is authoritative


def test_projected_read_prunes_scan_and_matches(spark, table, small_changelog):
    """read(columns=...) must (a) shrink the scan's ReadSchema so the
    html payload bytes are never read for a narrow projection — the
    LWW max_by struct otherwise blocks Catalyst's own pruning — and
    (b) return exactly the full read's projection."""
    import re

    _merge_pdf(spark, table, small_changelog.iloc[:400], batch_id=0)
    _merge_pdf(spark, table, small_changelog.iloc[400:], batch_id=1)

    proj = table.read(spark, columns=["url", "lang"])
    assert proj.columns == ["url", "lang"]
    plan = proj._jdf.queryExecution().executedPlan().toString()
    schemas = set(re.findall(r"ReadSchema: (\S+)", plan))
    assert schemas, "no scan in plan?"
    assert not any("html" in s for s in schemas), schemas
    full = {(r.url, r.lang) for r in table.read(spark).select("url", "lang").collect()}
    got = {(r.url, r.lang) for r in proj.collect()}
    assert got == full and len(got) > 0

    # projection composes with rename: new name projects old files
    table.apply_ddl("rename_column", "lang", new_name="language")
    renamed = table.read(spark, columns=["url", "language"])
    assert {(r.url, r.language) for r in renamed.collect()} == full
    with pytest.raises(ValueError, match="unknown column"):
        table.read(spark, columns=["nope"])


def test_mor_single_file_fast_path_equals_election(spark, tmp_path,
                                                   small_changelog):
    """r06: a MOR read over buckets holding ONE data file each skips
    the LWW election exchange; result and schema must be identical to
    the elected form (single-commit per-bucket output is key-unique
    by construction)."""
    t = SnapshotTable.create(str(tmp_path / "ff"), n_buckets=8,
                             write_mode="mor")
    _merge_pdf(spark, t, small_changelog, batch_id=0)
    fast = t.read(spark)
    # no election aggregate in the plan when every bucket has one file
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan
    assert_state_equals_oracle(fast.toPandas(), replay_oracle(small_changelog))
    # second batch: buckets now hold two delta files -> election is back
    pdf2 = small_changelog.copy()
    pdf2["seq"] = pdf2["seq"] + 1_000_000
    _merge_pdf(spark, t, pdf2, batch_id=1)
    slow = t.read(spark)
    plan2 = slow._jdf.queryExecution().executedPlan().toString()
    assert "max_by" in plan2
    assert list(fast.columns) == list(slow.columns)
