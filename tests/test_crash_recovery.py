"""Hard-kill crash recovery: SIGKILL the pipeline process mid-stream,
resume from checkpoint in a fresh process, assert the final table is
byte-identical to the oracle — the north rule's "a killed job replays
from the last snapshot without duplicates"."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.changelog import gen_changelog, write_changelog
from tests.conftest import assert_state_equals_oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUN = """
import sys
sys.path.insert(0, {repo!r})
from montandon_etl_spark.session import get_spark
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.streaming.pipeline import run_stream
spark = get_spark(app_name="crash", master="local[4]", shuffle_partitions=4)
try:
    table = SnapshotTable.create({table!r}, n_buckets=4)
except FileExistsError:
    table = SnapshotTable({table!r})
q = run_stream(spark, table, {log!r}, {ckpt!r})
q.awaitTermination(600)
print("STREAM_DONE", flush=True)
spark.stop()
"""


@pytest.mark.slow
def test_sigkill_mid_stream_then_resume(tmp_path, spark):
    log_dir = str(tmp_path / "log")
    table_path = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    changelog = gen_changelog(4000, 1200, seed=99, n_domains=30)
    write_changelog(changelog, log_dir, n_chunks=8)

    script = _RUN.format(repo=REPO, table=table_path, log=log_dir, ckpt=ckpt)
    env = dict(os.environ, PYTHONPATH=REPO)

    # phase 1: start, wait for >=2 committed snapshots, SIGKILL the tree
    proc = subprocess.Popen(
        [sys.executable, "-c", script], env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    head_file = os.path.join(table_path, "_meta", "HEAD")
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(head_file) and int(open(head_file).read()) >= 2:
            break
        if proc.poll() is not None:
            pytest.fail("pipeline exited before reaching 2 commits")
        time.sleep(0.3)
    else:
        pytest.fail("never reached 2 commits")
    os.killpg(os.getpgid(proc.pid), signal.SIGKILL)  # hard kill, no cleanup
    proc.wait()
    killed_at = int(open(head_file).read())
    assert killed_at < 8, "kill happened after everything was already done"

    # phase 2: resume in a fresh process from the same checkpoint
    out = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert "STREAM_DONE" in out.stdout, out.stderr[-1000:]

    # final state == oracle (no loss, no duplicates)
    table = SnapshotTable(table_path)
    got = table.read(spark).toPandas()
    assert_state_equals_oracle(got, replay_oracle(changelog))
    # batch ids strictly increase across the kill (no double-commit)
    merges = [s for s in table.history() if s["type"] == "merge"
              and s["batch_id"] is not None]
    bids = [s["batch_id"] for s in merges]
    assert bids == sorted(set(bids)), f"duplicate/out-of-order commits: {bids}"
    # lineage metadata survived: every merge carries offsets
    assert all(s["offsets"]["events"] > 0 for s in merges)
