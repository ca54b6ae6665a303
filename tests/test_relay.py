"""CDC relay loop (sources/relay.py): diff → Debezium-Avro frames →
generic decode → merge reproduces the source table; incremental
relays, delete domination, determinism, quarantine."""

from __future__ import annotations

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.sources.relay import (
    relay_changelog,
    relay_frames,
    relay_schema,
)

TS = pd.Timestamp("2024-06-01")

PAYLOAD = [("html", "binary"), ("text", "string"), ("lang", "string")]
SCHEMA = relay_schema("url", "string", "warc_ts", PAYLOAD)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, seq bigint, warc_ts timestamp, op string,"
              " html binary, text string, lang string")


def _rows(table, spark):
    pdf = (table.read(spark).toPandas()
           .sort_values("url").reset_index(drop=True))
    return [tuple(r) for r in
            pdf[["url", "seq", "warc_ts", "html", "text", "lang"]]
            .itertuples(index=False)]


def _mk_batches():
    b0 = [(f"https://r/{i}", i, TS.to_pydatetime(), "upsert",
           f"<p>{i}</p>".encode(), f"text {i}", "en") for i in range(20)]
    b1 = ([(f"https://r/{i}", 100 + i,
            (TS + pd.Timedelta(hours=1)).to_pydatetime(), "upsert",
            f"<p>v2 {i}</p>".encode(), f"text v2 {i}", "es")
           for i in range(0, 20, 3)]
          + [(f"https://r/{i}", 200 + i,
              (TS + pd.Timedelta(hours=2)).to_pydatetime(), "delete",
              None, None, None) for i in range(0, 20, 5)])
    return b0, b1


def _relay_into(spark, src, dst, from_sid, to_sid, batch_id):
    frames = relay_frames(src.diff(spark, from_sid, to_sid), "url",
                          SCHEMA, schema_id=3)
    decoded = relay_changelog(frames, 3, SCHEMA, "url", "string")
    good = decoded.filter("decode_ok").drop("decode_ok")
    dst.merge(spark, good, batch_id=batch_id)
    return frames


def test_full_relay_loop(spark, tmp_path):
    """decode(encode(diff(0, head))) merged into an empty clone ≡ the
    source table — including binary payloads and deletes."""
    b0, b1 = _mk_batches()
    src = SnapshotTable.create(str(tmp_path / "src"), n_buckets=4)
    src.merge(spark, _batch(spark, b0), batch_id=0)
    src.merge(spark, _batch(spark, b1), batch_id=1)
    dst = SnapshotTable.create(str(tmp_path / "dst"), n_buckets=4)
    _relay_into(spark, src, dst, 0, None, batch_id=0)
    assert _rows(dst, spark) == _rows(src, spark)


def test_incremental_relay(spark, tmp_path):
    """A consumer at snapshot 1 catches up via diff(1, 2) — deletes of
    versions it already holds must dominate (synthesized seq+1)."""
    b0, b1 = _mk_batches()
    src = SnapshotTable.create(str(tmp_path / "src"), n_buckets=4)
    dst = SnapshotTable.create(str(tmp_path / "dst"), n_buckets=4)
    src.merge(spark, _batch(spark, b0), batch_id=0)
    dst.merge(spark, _batch(spark, b0), batch_id=0)  # consumer in sync
    src.merge(spark, _batch(spark, b1), batch_id=1)
    _relay_into(spark, src, dst, 1, None, batch_id=1)
    assert _rows(dst, spark) == _rows(src, spark)
    # deleted keys really are gone on the consumer
    urls = {r[0] for r in _rows(dst, spark)}
    assert "https://r/0" not in urls and "https://r/5" not in urls


def test_relay_deterministic_and_compaction_empty(spark, tmp_path):
    b0, b1 = _mk_batches()
    src = SnapshotTable.create(str(tmp_path / "src"), n_buckets=4)
    src.merge(spark, _batch(spark, b0), batch_id=0)
    src.merge(spark, _batch(spark, b1), batch_id=1)
    f1 = relay_frames(src.diff(spark, 0), "url", SCHEMA, 3) \
        .orderBy("offset").collect()
    f2 = relay_frames(src.diff(spark, 0), "url", SCHEMA, 3) \
        .orderBy("offset").collect()
    assert [bytes(r.value) for r in f1] == [bytes(r.value) for r in f2]
    # vs the EMPTY snapshot, add-then-delete keys are no net change:
    # 20 keys - 4 deleted = 16 adds, zero delete frames
    assert len(f1) == 16
    # vs snapshot 1 the deletes surface as op=d frames
    decoded = relay_changelog(
        relay_frames(src.diff(spark, 1), "url", SCHEMA, 3),
        3, SCHEMA, "url", "string")
    ops = [r.op for r in decoded.collect()]
    assert ops.count("delete") == 4
    assert ops.count("upsert") == 5  # i%3==0 updates minus deleted 0,15


def test_relay_quarantine_and_schema_mismatch(spark, tmp_path):
    b0, _ = _mk_batches()
    src = SnapshotTable.create(str(tmp_path / "src"), n_buckets=4)
    src.merge(spark, _batch(spark, b0), batch_id=0)
    frames = relay_frames(src.diff(spark, 0), "url", SCHEMA, 3)
    poisoned = frames.select("value").union(
        spark.createDataFrame([(b"\xffgarbage",), (None,)],
                              "value binary"))
    decoded = relay_changelog(poisoned, 3, SCHEMA, "url", "string")
    assert decoded.filter("NOT decode_ok").count() == 2
    assert decoded.filter("decode_ok").count() == 20
    # wrong registry id -> everything quarantines, nothing crashes
    wrong = relay_changelog(frames, 99, SCHEMA, "url", "string")
    assert wrong.filter("decode_ok").count() == 0
