"""Debezium initial-snapshot handoff consistency (cdc_ingest's classic
bootstrap problem): a new consumer receives (1) a snapshot phase — one
op=r frame per existing key, captured while writes CONTINUE — then
(2) the stream from a binlog position at or BEFORE the snapshot
completed. Events in the overlap window arrive twice: folded into the
r row AND as their own c/u/d frames. Convergence to the true state
must not depend on phase boundaries, because the r rows carry their
row's real (ts, seq) version identifiers and the engine's merge is
last-writer-wins on exactly that pair — redelivery is idempotent and
ordering-free by construction.

These tests pin that property end-to-end through the real decode →
quarantine → MERGE path, for every overlap window and for
snapshot-after-stream delivery order."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.changelog import gen_changelog
from montandon_etl_spark.sources.kafka import decode_debezium, split_quarantine
from montandon_etl_spark.streaming.pipeline import enrich_batch
from tests.conftest import assert_state_equals_oracle

KAFKA_DDL = ("key binary, value binary, topic string, partition int,"
             " offset bigint, timestamp timestamp")


def _dbz(seq, url, ts_us, op, html: bytes | None) -> bytes:
    import base64
    body = {"op": op, "ts_ms": ts_us // 1000,
            "source": {"seq": int(seq), "ts_us": int(ts_us)}}
    if op == "d":
        body["before"] = {"url": url}
    else:
        body["after"] = {
            "url": url, "warc_ts_us": int(ts_us),
            "html_b64": (base64.b64encode(html).decode()
                         if html is not None else None)}
    return json.dumps(body).encode()


def _merge_frames(spark, table, values, batch_id):
    rows = [(b"k", v, "pages", 0, i,
             pd.Timestamp("2024-06-01").to_pydatetime())
            for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, KAFKA_DDL)
    good, bad = split_quarantine(decode_debezium(df))
    assert bad.count() == 0
    table.merge(spark, enrich_batch(good), batch_id=batch_id)


def _snapshot_state(log: pd.DataFrame, upto_seq: int) -> pd.DataFrame:
    """The table state a consistent snapshot reader sees after all
    events with seq <= upto_seq (LWW on (warc_ts, seq), deletes
    removing the key)."""
    return replay_oracle(log[log.seq <= upto_seq])


@pytest.mark.parametrize("overlap", [0, 25, 150])
def test_snapshot_then_stream_converges(spark, tmp_path, overlap):
    """snapshot(≤S) as op=r frames + stream(> S - overlap) ≡ full
    replay, for no/partial/full-history overlap."""
    log = gen_changelog(300, 120, seed=21, n_domains=10)
    smax = int(log.seq.max())
    s_cut = smax // 2
    snap = _snapshot_state(log, s_cut)
    table = SnapshotTable.create(str(tmp_path / f"t{overlap}"), n_buckets=4)
    # phase 1: snapshot reads — op r, each row's OWN version pair
    r_frames = [
        _dbz(r.seq, r.url, int(pd.Timestamp(r.warc_ts).value // 1000),
             "r", bytes(r.html))
        for r in snap.itertuples()]
    _merge_frames(spark, table, r_frames, batch_id=0)
    # phase 2: the stream from an overlapping position
    tail = log[log.seq > s_cut - overlap]
    op_map = {"upsert": "u", "delete": "d"}
    s_frames = [
        _dbz(r.seq, r.url, int(pd.Timestamp(r.warc_ts).value // 1000),
             op_map[r.op], None if r.html is None else bytes(r.html))
        for r in tail.itertuples()]
    _merge_frames(spark, table, s_frames, batch_id=1)
    assert_state_equals_oracle(table.read(spark).toPandas(),
                               replay_oracle(log))


def test_stream_before_snapshot_converges(spark, tmp_path):
    """Phase order must not matter: stream tail merged FIRST, the
    (older) snapshot rows afterwards — r rows must never overwrite
    newer streamed versions (their version pair loses LWW)."""
    log = gen_changelog(240, 100, seed=22, n_domains=8)
    smax = int(log.seq.max())
    s_cut = smax // 2
    snap = _snapshot_state(log, s_cut)
    table = SnapshotTable.create(str(tmp_path / "rev"), n_buckets=4)
    op_map = {"upsert": "u", "delete": "d"}
    tail = log[log.seq > s_cut - 30]
    _merge_frames(spark, table, [
        _dbz(r.seq, r.url, int(pd.Timestamp(r.warc_ts).value // 1000),
             op_map[r.op], None if r.html is None else bytes(r.html))
        for r in tail.itertuples()], batch_id=0)
    _merge_frames(spark, table, [
        _dbz(r.seq, r.url, int(pd.Timestamp(r.warc_ts).value // 1000),
             "r", bytes(r.html))
        for r in snap.itertuples()], batch_id=1)
    # keys whose ONLY version predates the stream window exist too
    assert_state_equals_oracle(table.read(spark).toPandas(),
                               replay_oracle(log))


def test_snapshot_redelivery_idempotent(spark, tmp_path):
    """The whole snapshot phase redelivered under a NEW batch id (a
    restart that lost its offset but not its ledger) is a no-op for
    state: r rows tie on (ts, seq) with themselves."""
    log = gen_changelog(150, 70, seed=23, n_domains=6)
    snap = _snapshot_state(log, int(log.seq.max()))
    table = SnapshotTable.create(str(tmp_path / "re"), n_buckets=4)
    frames = [
        _dbz(r.seq, r.url, int(pd.Timestamp(r.warc_ts).value // 1000),
             "r", bytes(r.html))
        for r in snap.itertuples()]
    _merge_frames(spark, table, frames, batch_id=0)
    before = table.read(spark).toPandas()
    _merge_frames(spark, table, frames, batch_id=1)
    after = table.read(spark).toPandas()
    cols = ["url", "seq", "warc_ts", "text"]
    assert before.sort_values("url")[cols].reset_index(drop=True).equals(
        after.sort_values("url")[cols].reset_index(drop=True))
