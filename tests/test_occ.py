"""Optimistic concurrency on snapshot commits: lost-update detection,
snapshot-id claim, stale-lock recovery."""

from __future__ import annotations

import copy
import os
import time

import pytest

from montandon_etl_spark.lake.format import CommitConflict
from montandon_etl_spark.lake.table import SnapshotTable


@pytest.fixture
def table(tmp_path):
    return SnapshotTable.create(str(tmp_path / "t"), n_buckets=4)


def _child_snap(t, sid=None):
    snap = copy.deepcopy(t.snapshot())
    snap["parent_id"] = snap["snapshot_id"]
    snap["snapshot_id"] = sid if sid is not None else snap["snapshot_id"] + 1
    snap["type"] = "test"
    return snap


def test_stale_parent_conflict(table):
    """Writer B built against parent 0, but writer A committed 1 in
    between: B must conflict and HEAD must stay at A's commit."""
    a = _child_snap(table)  # parent 0 -> sid 1
    b = _child_snap(table)  # also parent 0 -> sid 1 (stale view)
    b["snapshot_id"] = 2  # B picked a free id but its parent is stale
    table.io.write_snapshot_and_swap_head(a)
    with pytest.raises(CommitConflict, match="HEAD moved"):
        table.io.write_snapshot_and_swap_head(b)
    assert table.io.head_snapshot_id() == 1
    assert not os.path.exists(table.io.snapshot_path(2))


def test_duplicate_snapshot_id_conflict(table):
    """A claim on an id HEAD has already published must conflict even
    when the parent check is satisfied."""
    a = _child_snap(table)
    table.io.write_snapshot_and_swap_head(a)  # head = 1
    b = _child_snap(table, sid=1)
    b["parent_id"] = 1  # parent check passes; the id claim must not
    with pytest.raises(CommitConflict, match="already committed"):
        table.io.write_snapshot_and_swap_head(b)
    assert table.io.head_snapshot_id() == 1


def test_torn_claim_reclaimed(table):
    """A writer that wrote snapshot-1.json but died before the HEAD
    swap leaves an unreachable orphan; the retry reclaims the id and
    publishes its own content."""
    import json

    with open(table.io.snapshot_path(1), "w") as f:
        json.dump({"snapshot_id": 1, "type": "torn-garbage"}, f)
    a = _child_snap(table)
    table.io.write_snapshot_and_swap_head(a)
    assert table.io.head_snapshot_id() == 1
    assert table.io.read_snapshot(1)["type"] == "test"


def test_retry_after_conflict_succeeds(table):
    a = _child_snap(table)
    b = _child_snap(table)
    table.io.write_snapshot_and_swap_head(a)
    with pytest.raises(CommitConflict):
        table.io.write_snapshot_and_swap_head(b)
    # the conflicted writer re-reads HEAD and rebuilds: normal retry
    b2 = _child_snap(table)
    assert b2["parent_id"] == 1
    table.io.write_snapshot_and_swap_head(b2)
    assert table.io.head_snapshot_id() == 2


def test_stale_lock_broken(table):
    lock = os.path.join(table.io.meta_dir, "COMMIT.lock")
    with open(lock, "w") as f:
        f.write("999999")
    old = time.time() - 120
    os.utime(lock, (old, old))
    table.io.write_snapshot_and_swap_head(_child_snap(table))
    assert table.io.head_snapshot_id() == 1
    assert not os.path.exists(lock)


def test_live_lock_times_out(table):
    lock = os.path.join(table.io.meta_dir, "COMMIT.lock")
    with open(lock, "w") as f:
        f.write("1")
    table.io.LOCK_WAIT_SEC = 0.2
    try:
        with pytest.raises(CommitConflict, match="lock held"):
            table.io.write_snapshot_and_swap_head(_child_snap(table))
    finally:
        os.unlink(lock)
        del table.io.LOCK_WAIT_SEC


def test_no_tmp_litter_after_conflict(table):
    a = _child_snap(table)
    b = _child_snap(table)
    table.io.write_snapshot_and_swap_head(a)
    with pytest.raises(CommitConflict):
        table.io.write_snapshot_and_swap_head(b)
    litter = [p for p in os.listdir(table.io.meta_dir) if ".tmp" in p]
    assert litter == []


def _mkbatch(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        [(seq, url, pd.Timestamp("2024-01-01").to_pydatetime(), "upsert",
          html.encode()) for seq, url, html in rows],
        "seq long, url string, warc_ts timestamp, op string, html binary",
    )


def test_merge_retries_through_conflict(spark, table):
    """A concurrent commit landing between a merge's compute and its
    HEAD swap forces CommitConflict; the merge retries against the new
    HEAD and both writers' rows survive (no lost update), with the
    loser's first-attempt staging debris removed."""
    import glob as g

    # writer A's competing commit is injected right before writer B's
    # first swap attempt
    real_swap = table.io.write_snapshot_and_swap_head
    fired = {"n": 0}

    def inject_then_swap(snap):
        if fired["n"] == 0 and snap.get("type") == "merge":
            fired["n"] = 1
            a = _child_snap(table)
            a["type"] = "merge"
            real_swap(a)  # A wins the race
        return real_swap(snap)

    table.io.write_snapshot_and_swap_head = inject_then_swap
    try:
        out = table.merge(
            spark, _mkbatch(spark, [(1, "https://b.com/1", "<p>b</p>")]),
            batch_id=0,
        )
    finally:
        table.io.write_snapshot_and_swap_head = real_swap
    assert out is not None
    head = table.snapshot()
    assert head["type"] == "merge" and head["parent_id"] == 1
    assert table.read(spark).count() == 1
    # exactly one staged data dir for the committed sid survives
    sid = head["snapshot_id"]
    dirs = g.glob(os.path.join(table.io.data_dir, f"s{sid:08d}-*"))
    assert len(dirs) == 1, dirs
    # a redelivery of the same batch after the retry is still a no-op
    assert table.merge(
        spark, _mkbatch(spark, [(1, "https://b.com/1", "<p>b</p>")]),
        batch_id=0,
    ) is None


def test_vacuum_removes_crashed_loser_debris(spark, table):
    """A loser that crashed before its abort leaves a token dir at the
    winner's sid; vacuum removes it (unreferenced) and keeps the
    winner's files."""
    table.merge(spark, _mkbatch(spark, [(1, "https://a.com/1", "<p>a</p>")]),
                batch_id=0)
    sid = table.snapshot()["snapshot_id"]
    loser = table.io.commit_data_dir(sid, "deadbeef")
    os.makedirs(os.path.join(loser, "_bucket=0"))
    with open(os.path.join(loser, "_bucket=0", "part-junk.parquet"), "wb") as f:
        f.write(b"junk")
    mf = os.path.join(table.io.manifests_dir(),
                      f"m-{sid:08d}-deadbeef-b00000.json")
    with open(mf, "w") as f:
        f.write("[]")
    removed = table.vacuum_orphans()
    assert loser in removed and mf in removed
    assert table.read(spark).count() == 1


def test_two_writers_interleaved_no_lost_updates(spark, table):
    """Two writer threads interleave merges on the same table (no
    batch-id coordination — multi-writer mode); every commit must land
    (retry absorbs conflicts) and the final state equals LWW over the
    union of all events."""
    import threading

    def rows_for(writer, j):
        lo = 1000 * (2 * j + writer)
        return [(lo + i, f"https://w.com/{(lo + i) % 37}", f"<p>{lo + i}</p>")
                for i in range(40)]

    batches = {w: [rows_for(w, j) for j in range(3)] for w in (0, 1)}
    errs = []

    def run(writer):
        try:
            for b in batches[writer]:
                table.merge(spark, _mkbatch(spark, b), batch_id=None,
                            commit_retries=8)
        except Exception as e:  # surfaced below
            errs.append(e)

    ts = [threading.Thread(target=run, args=(w,)) for w in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    # serial LWW oracle over the union (max seq per url wins)
    want = {}
    for w in (0, 1):
        for b in batches[w]:
            for seq, url, html in b:
                if url not in want or seq > want[url][0]:
                    want[url] = (seq, html)
    got = {r.url: (r.seq, bytes(r.html).decode())
           for r in table.read(spark).collect()}
    assert got == want
    # 6 merges committed: head is at least 6 (auto-compactions may add)
    assert table.snapshot()["snapshot_id"] >= 6


def test_ddl_retries_through_conflict(spark, table):
    """A DDL losing a commit race rebuilds the schema change against
    the new HEAD and lands on top of it."""
    real_swap = table.io.write_snapshot_and_swap_head
    fired = {"n": 0}

    def inject(snap):
        if fired["n"] == 0 and snap.get("type") == "schema":
            fired["n"] = 1
            a = _child_snap(table)
            real_swap(a)
        return real_swap(snap)

    table.io.write_snapshot_and_swap_head = inject
    try:
        out = table.apply_ddl("add_column", "score", dtype="double")
    finally:
        table.io.write_snapshot_and_swap_head = real_swap
    assert out["parent_id"] == 1
    assert "score" in [f.name for f in table.user_fields()]


def test_merge_path_still_commits(spark, table):
    """The normal single-writer MERGE path is unaffected by the OCC
    guards (head advances once per batch)."""
    import pandas as pd

    df = spark.createDataFrame(
        [(1, "https://a.com/x", pd.Timestamp("2024-01-01").to_pydatetime(),
          "upsert", b"<p>hi</p>")],
        "seq long, url string, warc_ts timestamp, op string, html binary",
    )
    table.merge(spark, df, batch_id=0)
    assert table.snapshot()["snapshot_id"] == 1
    assert table.read(spark).count() == 1
