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
