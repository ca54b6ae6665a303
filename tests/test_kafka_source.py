"""Kafka wire-format decode: both envelope dialects on kafka-shaped
static frames (same fixed columns the real source emits), quarantine of
malformed frames, and an end-to-end decode → MERGE → oracle check."""

from __future__ import annotations

import base64
import json

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.kafka import (
    decode_debezium,
    decode_json_changelog,
    split_quarantine,
)
from montandon_etl_spark.streaming.pipeline import enrich_batch
from tests.conftest import assert_state_equals_oracle

TS = pd.Timestamp("2024-06-01", tz="UTC")
KAFKA_DDL = (
    "key binary, value binary, topic string, partition int,"
    " offset bigint, timestamp timestamp"
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def _frame(url: str, value: bytes | None, offset: int):
    return (url.encode(), value, "pages", 0, offset,
            TS.tz_localize(None).to_pydatetime())


def _kafka_df(spark, frames):
    return spark.createDataFrame(frames, KAFKA_DDL)


def _native_value(seq, url, ts, op, html: bytes | None) -> bytes:
    return json.dumps({
        "seq": seq, "url": url, "warc_ts_us": _us(ts), "op": op,
        "html_b64": base64.b64encode(html).decode() if html is not None else None,
    }).encode()


def _dbz_value(seq, url, ts, op, html: bytes | None) -> bytes:
    body = {"op": op, "ts_ms": _us(ts) // 1000,
            "source": {"seq": seq, "ts_us": _us(ts)}}
    if op == "d":
        body["before"] = {"url": url}
    else:
        body["after"] = {"url": url, "warc_ts_us": _us(ts),
                         "html_b64": base64.b64encode(html).decode()}
    return json.dumps(body).encode()


def test_decode_json_changelog_roundtrip_and_quarantine(spark):
    frames = [
        _frame("https://k/1", _native_value(1, "https://k/1", TS, "upsert", b"<p>a</p>"), 0),
        _frame("https://k/2", _native_value(2, "https://k/2", TS, "upsert", b"<p>b</p>"), 1),
        _frame("https://k/1", _native_value(3, "https://k/1", TS, "delete", None), 2),
        _frame("https://k/x", b"not json at all", 3),
        _frame("https://k/y", None, 4),  # Kafka tombstone frame
        _frame("https://k/z", b"{}", 5),  # valid JSON, missing key fields
        _frame("https://k/w", b'{"op": "upsert"}', 6),  # no url/seq/ts
        _frame("https://k/v", _native_value(9, "https://k/v", TS, "weird_op", b"x"), 7),
        # valid JSON, malformed base64 payload — must QUARANTINE the
        # frame, not abort the micro-batch (ANSI unbase64 would throw)
        _frame("https://k/u", json.dumps({
            "seq": 10, "url": "https://k/u", "warc_ts_us": _us(TS),
            "op": "upsert", "html_b64": "!!!not base64!!!"}).encode(), 8),
    ]
    good, bad = split_quarantine(decode_json_changelog(_kafka_df(spark, frames)))
    g = good.orderBy("seq").collect()
    assert [r["seq"] for r in g] == [1, 2, 3]
    assert g[0]["html"] == b"<p>a</p>" and g[0]["op"] == "upsert"
    assert g[2]["op"] == "delete" and g[2]["html"] is None
    assert g[0]["warc_ts"] == TS.tz_localize(None)
    # malformed, null, field-less, unknown-op, and bad-base64 frames ALL
    # quarantined — a well-formed-but-empty frame must never become a
    # NULL-keyed row, and one bad payload must never wedge the stream
    assert bad.count() == 6


def test_decode_debezium_envelope(spark):
    frames = [
        _frame("https://d/1", _dbz_value(1, "https://d/1", TS, "c", b"<p>v1</p>"), 0),
        _frame("https://d/1", _dbz_value(2, "https://d/1", TS + pd.Timedelta(hours=1), "u", b"<p>v2</p>"), 1),
        _frame("https://d/2", _dbz_value(3, "https://d/2", TS, "r", b"<p>snap</p>"), 2),
        _frame("https://d/2", _dbz_value(4, "https://d/2", TS + pd.Timedelta(hours=2), "d", None), 3),
        _frame("https://d/z", json.dumps({"op": "weird"}).encode(), 4),
        _frame("https://d/b", json.dumps({
            "op": "c", "ts_ms": _us(TS) // 1000,
            "source": {"seq": 9, "ts_us": _us(TS)},
            "after": {"url": "https://d/b", "warc_ts_us": _us(TS),
                      "html_b64": "%%bad b64%%"}}).encode(), 5),
    ]
    good, bad = split_quarantine(decode_debezium(_kafka_df(spark, frames)))
    g = {r["seq"]: r for r in good.collect()}
    assert set(g) == {1, 2, 3, 4}
    assert g[2]["op"] == "upsert" and g[2]["html"] == b"<p>v2</p>"
    assert g[4]["op"] == "delete" and g[4]["url"] == "https://d/2"
    assert g[4]["html"] is None
    assert bad.count() == 2  # unknown op + bad base64 quarantined, not dropped


@pytest.mark.parametrize("dialect", ["native", "debezium"])
def test_kafka_decode_merge_matches_oracle(spark, tmp_path, dialect):
    """decode → enrich → MERGE: the Kafka-shaped feed replays to the
    same table state as the plain changelog oracle."""
    events = [
        (1, "https://m/1", TS, "upsert", b"<p>one</p>"),
        (2, "https://m/2", TS, "upsert", b"<p>two</p>"),
        (3, "https://m/1", TS + pd.Timedelta(hours=1), "upsert", b"<p>one v2</p>"),
        (4, "https://m/2", TS + pd.Timedelta(hours=1), "delete", None),
    ]
    if dialect == "native":
        frames = [
            _frame(u, _native_value(s, u, t, op, h), i)
            for i, (s, u, t, op, h) in enumerate(events)
        ]
        decoded = decode_json_changelog(_kafka_df(spark, frames))
    else:
        dbz_op = {"upsert": "u", "delete": "d"}
        frames = [
            _frame(u, _dbz_value(s, u, t, dbz_op[op], h), i)
            for i, (s, u, t, op, h) in enumerate(events)
        ]
        decoded = decode_debezium(_kafka_df(spark, frames))
    good, _ = split_quarantine(decoded)

    table = SnapshotTable.create(str(tmp_path / f"kafka_{dialect}"), n_buckets=4)
    table.merge(spark, enrich_batch(good), batch_id=0)
    got = table.read(spark).toPandas()
    pdf = pd.DataFrame(
        [(s, u, t.tz_localize(None), op, h) for s, u, t, op, h in events],
        columns=["seq", "url", "warc_ts", "op", "html"],
    )
    assert_state_equals_oracle(got, replay_oracle(pdf))


def test_decode_debezium_schema_change_statements(spark):
    """DDL SQL → engine DDL spec mapping: all four supported forms
    (with quoting/case/; variants), unsupported statements and unknown
    types fail decode_ok."""
    import json as _json

    from montandon_etl_spark.sources.kafka import decode_debezium_schema_change

    def frame(seq, ddl):
        return (b"k", _json.dumps(
            {"source": {"seq": seq, "ts_us": 0}, "ddl": ddl}).encode(),
            "sc", 0, seq, None)

    cases = [
        (1, "ALTER TABLE pages ADD COLUMN title varchar(255)", True,
         ("add_column", "title", None, "string")),
        (2, "alter table pages rename column lang to language;", True,
         ("rename_column", "lang", "language", None)),
        (3, 'ALTER TABLE pages DROP COLUMN `score`', True,
         ("drop_column", "score", None, None)),
        (4, "ALTER TABLE pages ALTER COLUMN rank SET DATA TYPE bigint", True,
         ("widen_column", "rank", None, "bigint")),
        (5, "ALTER TABLE pages ALTER COLUMN rank TYPE int8", True,
         ("widen_column", "rank", None, "bigint")),
        (6, "CREATE INDEX i ON pages(url)", False, None),
        (7, "ALTER TABLE pages ADD COLUMN x hyperloglog", False, None),
        (8, "ALTER TABLE pages ADD COLUMN a int, ADD COLUMN b int", False,
         None),
        (9, "DROP TABLE pages", False, None),
    ]
    rows = spark.createDataFrame(
        [frame(s, d) for s, d, _, _ in cases],
        "key binary, value binary, topic string, partition int,"
        " offset bigint, timestamp timestamp")
    got = {r["seq"]: r for r in
           decode_debezium_schema_change(rows).collect()}
    for seq, _, want_ok, want_spec in cases:
        r = got[seq]
        assert r["decode_ok"] == want_ok, (seq, r)
        if want_ok:
            op, field, new_name, dtype = want_spec
            spec = _json.loads(r["ddl"])
            assert r["op"] == op
            assert spec.get("field") == field
            assert spec.get("new_name") == new_name
            assert spec.get("dtype") == dtype


# ------------------------------------------------------------- wal2json --
def _w2j_lsn(seq: int) -> str:
    return f"{seq >> 32:X}/{seq & 0xFFFFFFFF:X}"


def _w2j_value(seq, url, ts, action, html: bytes | None = None,
               **extra) -> bytes:
    body = {"action": action, "lsn": _w2j_lsn(seq), "xid": 7,
            "timestamp": ts.strftime("%Y-%m-%d %H:%M:%S.%f") + "+00"}
    if action in ("I", "U"):
        body["columns"] = [
            {"name": "url", "type": "text", "value": url},
            {"name": "warc_ts_us", "type": "bigint", "value": _us(ts)},
        ]
        if html is not None:
            body["columns"].append(
                {"name": "html_b64", "type": "text",
                 "value": base64.b64encode(html).decode()})
    elif action == "D":
        body["identity"] = [{"name": "url", "type": "text", "value": url}]
    body.update(extra)
    return json.dumps(body).encode()


def test_decode_wal2json_truth_table(spark):
    from montandon_etl_spark.sources.kafka import decode_wal2json

    t2 = TS + pd.Timedelta(hours=2)
    ddl_ok = json.dumps({"action": "M", "lsn": _w2j_lsn(7), "xid": 7,
                         "prefix": "ddl",
                         "content": json.dumps({"op": "add_column",
                                                "field": "rank",
                                                "dtype": "int"})}).encode()
    ddl_bad = json.dumps({"action": "M", "lsn": _w2j_lsn(8), "xid": 7,
                          "prefix": "ddl",
                          "content": json.dumps(
                              {"op": "rename_column",
                               "field": "x"})}).encode()  # no new_name
    frames = [
        _frame("w/1", _w2j_value(1, "w/1", TS, "I", b"<p>a</p>"), 0),
        _frame("w/1", _w2j_value(2, "w/1", TS, "U", b"<p>b</p>"), 1),
        _frame("w/1", _w2j_value(3, "w/1", t2, "D"), 2),
        # transaction framing and app messages: filtered, not rows
        _frame("", json.dumps({"action": "B", "lsn": _w2j_lsn(4),
                               "xid": 7}).encode(), 3),
        _frame("", json.dumps({"action": "C", "lsn": _w2j_lsn(5),
                               "xid": 7}).encode(), 4),
        _frame("", json.dumps({"action": "M", "lsn": _w2j_lsn(6),
                               "prefix": "app",
                               "content": "x"}).encode(), 5),
        # in-band DDL message (pg_logical_emit_message with prefix=ddl)
        _frame("", ddl_ok, 6),
        # poison DDL: spec missing its op's required field → quarantine
        _frame("", ddl_bad, 7),
        # truncate is unsupported and must surface loudly
        _frame("", json.dumps({"action": "T", "lsn": _w2j_lsn(9),
                               "xid": 7}).encode(), 8),
        # malformed LSN must not become seq 0
        _frame("w/z", json.dumps({"action": "I", "lsn": "zz",
                                  "columns": [
                                      {"name": "url", "value": "w/z"},
                                      {"name": "warc_ts_us",
                                       "value": _us(TS)}]}).encode(), 9),
        # bad base64 payload
        _frame("w/y", json.dumps({"action": "I", "lsn": _w2j_lsn(11),
                                  "columns": [
                                      {"name": "url", "value": "w/y"},
                                      {"name": "warc_ts_us",
                                       "value": _us(TS)},
                                      {"name": "html_b64",
                                       "value": "%%%"}]}).encode(), 10),
        _frame("w/x", b"not json", 11),
        _frame("w/t", None, 12),  # Kafka tombstone: quarantined
        # I frame missing its key column
        _frame("w/u", json.dumps({"action": "I", "lsn": _w2j_lsn(13),
                                  "columns": [
                                      {"name": "warc_ts_us",
                                       "value": _us(TS)}]}).encode(), 13),
    ]
    good, bad = split_quarantine(decode_wal2json(_kafka_df(spark, frames)))
    g = {r["seq"]: r for r in good.collect()}
    assert set(g) == {1, 2, 3, 7}
    assert g[1]["op"] == "upsert" and g[1]["html"] == b"<p>a</p>"
    assert g[2]["html"] == b"<p>b</p>"
    assert g[3]["op"] == "delete" and g[3]["url"] == "w/1"
    # the delete's event time comes from the frame's commit timestamp
    assert g[3]["warc_ts"] == t2.tz_localize(None).to_pydatetime()
    assert g[7]["op"] == "add_column"
    assert json.loads(g[7]["ddl"])["field"] == "rank"
    assert g[7]["url"] == "ddl:7"
    # B/C/M-app filtered; the 7 malformed/unsupported frames (poison
    # DDL, truncate, bad LSN, bad base64, non-JSON, tombstone,
    # missing key column) quarantined
    assert bad.count() == 7
    raws = {bytes(r["_raw"]) if r["_raw"] is not None else None
            for r in bad.collect()}
    assert ddl_bad in raws and b"not json" in raws and None in raws


def test_wal2json_decode_merge_matches_oracle(spark, tmp_path):
    """wal2json feed → decode → enrich → MERGE replays to the same
    table state as the plain changelog oracle (LSN is the seq)."""
    from montandon_etl_spark.sources.kafka import decode_wal2json

    events = [
        (1, "https://w/1", TS, "upsert", b"<p>one</p>"),
        (2, "https://w/2", TS, "upsert", b"<p>two</p>"),
        (3, "https://w/1", TS + pd.Timedelta(hours=1), "upsert",
         b"<p>one v2</p>"),
        (4, "https://w/2", TS + pd.Timedelta(hours=1), "delete", None),
    ]
    act = {"upsert": "I", "delete": "D"}
    frames = [_frame(u, _w2j_value(s, u, t, act[op], h), i)
              for i, (s, u, t, op, h) in enumerate(events)]
    good, bad = split_quarantine(decode_wal2json(_kafka_df(spark, frames)))
    assert bad.count() == 0
    table = SnapshotTable.create(str(tmp_path / "w2j"), n_buckets=4)
    table.merge(spark, enrich_batch(good.drop("ddl")), batch_id=0)
    got = table.read(spark).toPandas()
    pdf = pd.DataFrame(
        [(s, u, t.tz_localize(None), op, h) for s, u, t, op, h in events],
        columns=["seq", "url", "warc_ts", "op", "html"],
    )
    assert_state_equals_oracle(got, replay_oracle(pdf))
