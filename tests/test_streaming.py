"""Structured Streaming CDC: replay equivalence, checkpoint resume,
exactly-once under redelivery, DDL interleaving (SURVEY.md §5.1-5.3)."""

from __future__ import annotations

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.changelog import gen_changelog, gen_ddl_events, write_changelog
from montandon_etl_spark.streaming.pipeline import merge_microbatch, run_stream
from tests.conftest import assert_state_equals_oracle


@pytest.fixture()
def log_dir(tmp_path, small_changelog):
    d = str(tmp_path / "changelog")
    write_changelog(small_changelog, d, n_chunks=5)
    return d


def test_stream_replay_matches_oracle(spark, tmp_path, small_changelog, log_dir):
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=8)
    q = run_stream(spark, table, log_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))
    # 5 chunks, 1 file per trigger → ≥1 commit per non-empty batch
    assert table.snapshot()["committed_max_batch_id"] >= 0
    # lineage: offsets recorded on every merge snapshot
    for s in table.history():
        if s["type"] == "merge":
            assert s["offsets"]["events"] > 0


def test_kill_and_resume_from_checkpoint(spark, tmp_path, small_changelog, log_dir):
    """Process some files, 'kill', restart with same checkpoint: no dup,
    no loss — final state equals full-replay oracle."""
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    # phase 1: only first 2 chunks visible
    import os
    import shutil

    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    files = sorted(os.listdir(log_dir))
    hold = files[2:]
    for f in hold:
        shutil.move(os.path.join(log_dir, f), os.path.join(staged, f))
    q1 = run_stream(spark, table, log_dir, ckpt)
    q1.awaitTermination(300)
    mid_snap = table.io.head_snapshot_id()
    assert mid_snap > 0
    # phase 2: reveal the rest, resume from checkpoint
    for f in hold:
        shutil.move(os.path.join(staged, f), os.path.join(log_dir, f))
    q2 = run_stream(spark, table, log_dir, ckpt)
    q2.awaitTermination(300)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(small_changelog))


def test_redelivered_epoch_is_noop(spark, tmp_path, small_changelog):
    """foreachBatch may re-run a batch with the same epoch id (T5 →
    exactly-once): simulate by calling merge_microbatch twice."""
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=8)
    sdf = spark.createDataFrame(small_changelog[["seq", "url", "warc_ts", "op", "html"]])
    merge_microbatch(spark, table, sdf, batch_id=0)
    head = table.io.head_snapshot_id()
    merge_microbatch(spark, table, sdf, batch_id=0)  # redelivery
    assert table.io.head_snapshot_id() == head
    assert_state_equals_oracle(table.read(spark).toPandas(), replay_oracle(small_changelog))


def test_ddl_interleaved_with_dml(spark, tmp_path, small_changelog):
    """DDL events split a micro-batch; final state matches oracle incl.
    rename and added column (SURVEY.md §7 step 7)."""
    mid = int(small_changelog["seq"].iloc[len(small_changelog) // 2])
    ddl = gen_ddl_events(start_seq=mid)  # add title, rename lang→language
    # give DDL seqs that don't collide with DML seqs
    ddl["seq"] = [mid + 0, mid + 1]
    dml = small_changelog[~small_changelog.seq.isin(ddl.seq)].reset_index(drop=True)

    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=8)
    n = len(dml)
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        sdf = spark.createDataFrame(dml.iloc[lo:hi][["seq", "url", "warc_ts", "op", "html"]])
        merge_microbatch(spark, table, sdf, batch_id=i, ddl_events=ddl)

    got = table.read(spark).toPandas()
    want = replay_oracle(dml, ddl)
    assert "language" in got.columns and "title" in got.columns
    assert_state_equals_oracle(got, want,
                               value_cols=["warc_ts", "seq", "html", "text", "language"])
    # the reference's pre-rename rows carry data under the new name
    assert got["language"].notna().all()


def test_permutation_invariance_property(spark, tmp_path):
    """Property: any permutation of the changelog yields the same final
    table (LWW over a total order is commutative)."""
    log = gen_changelog(300, 100, seed=11, n_domains=10)
    want = replay_oracle(log)
    for perm_seed in (1, 2):
        table = SnapshotTable.create(str(tmp_path / f"pages{perm_seed}"), n_buckets=4)
        shuffled = log.sample(frac=1.0, random_state=perm_seed).reset_index(drop=True)
        for i, lo in enumerate(range(0, len(shuffled), 100)):
            sdf = spark.createDataFrame(
                shuffled.iloc[lo : lo + 100][["seq", "url", "warc_ts", "op", "html"]]
            )
            merge_microbatch(spark, table, sdf, batch_id=i)
        assert_state_equals_oracle(table.read(spark).toPandas(), want)
