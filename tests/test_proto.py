"""Protobuf wire format + Confluent framing (sources/proto.py): spec
known-answer vectors, signed/zigzag/fixed encodings, packed vs
unpacked repeated, unknown-field skipping (forward compat), nested
messages, framing truth table, and the three-dialect equivalence —
the SAME changelog through JSON, Avro, and Protobuf Debezium decodes
lands the identical table state."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.kafka import split_quarantine
from montandon_etl_spark.sources.proto import (
    DEBEZIUM_PROTO_DESCRIPTOR,
    confluent_proto_frame,
    decode_debezium_proto,
    decode_message,
    encode_message,
    parse_confluent_proto,
)
from montandon_etl_spark.streaming.pipeline import enrich_batch
from tests.conftest import assert_state_equals_oracle

TS = pd.Timestamp("2024-06-01", tz="UTC")


# ------------------------------------------------------------ spec vectors --
def test_spec_known_answers():
    """The canonical examples from the protobuf encoding docs."""
    # message Test1 { int32 a = 1; } with a=150 -> 08 96 01
    assert encode_message({1: ("a", "int32")}, {"a": 150}).hex() == "089601"
    # message Test2 { string b = 2; } with b="testing"
    assert encode_message({2: ("b", "string")}, {"b": "testing"}).hex() \
        == "120774657374696e67"
    # message Test3 { Test1 c = 3; } with c.a=150 -> 1a 03 08 96 01
    assert encode_message({3: ("c", {1: ("a", "int32")})},
                          {"c": {"a": 150}}).hex() == "1a03089601"
    # packed repeated int32 [3,270,86942] field 4 -> 22 06 03 8e 02 9e a7 05
    assert encode_message({4: ("d", "int32", "repeated")},
                          {"d": [3, 270, 86942]}).hex() == "2206038e029ea705"


def test_signed_encodings():
    desc = {1: ("a", "int32"), 2: ("b", "int64"), 3: ("c", "sint32"),
            4: ("d", "sint64"), 5: ("e", "sfixed32"), 6: ("f", "sfixed64"),
            7: ("g", "fixed32"), 8: ("h", "fixed64"), 9: ("i", "double"),
            10: ("j", "float"), 11: ("k", "bool"), 12: ("m", "uint64")}
    msg = {"a": -1, "b": -(2 ** 40), "c": -2, "d": 2 ** 40, "e": -7,
           "f": -(2 ** 50), "g": 2 ** 31, "h": 2 ** 63, "i": -0.5,
           "j": 1.5, "k": True, "m": 2 ** 63 + 9}
    enc = encode_message(desc, msg)
    # int negatives use the 10-byte two's-complement form per spec
    assert enc[:11].hex() == "08ffffffffffffffffff01"
    assert decode_message(desc, enc) == msg


def test_proto3_defaults_and_presence():
    desc = {1: ("n", "int32"), 2: ("s", "string"), 3: ("b", "bytes"),
            4: ("f", "double"), 5: ("ok", "bool"),
            6: ("sub", {1: ("x", "int32")}), 7: ("r", "int64", "repeated")}
    got = decode_message(desc, b"")
    assert got == {"n": 0, "s": "", "b": b"", "f": 0.0, "ok": False,
                   "sub": None, "r": []}
    # presence: an explicitly encoded empty submessage is NOT None
    enc = encode_message(desc, {"sub": {}})
    assert decode_message(desc, enc)["sub"] == {"x": 0}


def test_unknown_fields_skipped_forward_compat():
    """A consumer with an OLD descriptor must skip fields a NEWER
    producer added — every wire type."""
    new_desc = {1: ("a", "int32"), 2: ("s", "string"),
                3: ("d", "double"), 4: ("f", "fixed32"),
                5: ("sub", {1: ("x", "int32")})}
    old_desc = {1: ("a", "int32")}
    enc = encode_message(new_desc, {"a": 42, "s": "gone", "d": 2.5,
                                    "f": 7, "sub": {"x": 1}})
    assert decode_message(old_desc, enc) == {"a": 42}


def test_repeated_unpacked_accepted():
    """Parsers must accept unpacked encodings of packable fields."""
    desc = {1: ("r", "int32", "repeated")}
    unpacked = b"".join(encode_message({1: ("r", "int32")}, {"r": v})
                        for v in (3, 270, 86942))
    assert decode_message(desc, unpacked) == {"r": [3, 270, 86942]}
    # and mixed packed + unpacked concatenates
    packed = encode_message(desc, {"r": [5]})
    assert decode_message(desc, unpacked + packed)["r"] == [3, 270, 86942, 5]


def test_repeated_strings_and_messages():
    desc = {1: ("tags", "string", "repeated"),
            2: ("kids", {1: ("x", "int32")}, "repeated")}
    msg = {"tags": ["a", "bb"], "kids": [{"x": 1}, {"x": 2}]}
    assert decode_message(desc, encode_message(desc, msg)) == msg


def test_decode_failure_modes():
    desc = {1: ("s", "string")}
    enc = encode_message(desc, {"s": "hello"})
    with pytest.raises(ValueError):
        decode_message(desc, enc[:-1])  # truncated bytes
    with pytest.raises(ValueError, match="wire type"):
        # field 1 as varint instead of len-delimited
        decode_message(desc, b"\x08\x05")
    with pytest.raises(ValueError, match="groups"):
        decode_message({9: ("z", "int32")}, b"\x0b")  # wt=3 group start


# ----------------------------------------------------- Confluent framing ----
def test_confluent_frame_roundtrip():
    body = b"\x08\x96\x01"
    f0 = confluent_proto_frame(7, body)
    assert f0[:6] == b"\x00\x00\x00\x00\x07\x00"  # id 7, index count 0
    assert parse_confluent_proto(f0) == (7, [], body)
    f2 = confluent_proto_frame(9, body, [1, 2])
    assert parse_confluent_proto(f2) == (9, [1, 2], body)
    with pytest.raises(ValueError, match="magic"):
        parse_confluent_proto(b"\x01\x00\x00\x00\x07\x00" + body)


# ------------------------------------------------------------- Debezium -----
def _dbz_proto(seq, url, ts, op, html: bytes | None, sid=7) -> bytes:
    us = int(ts.value // 1000)
    rec = {"op": op, "ts_ms": us // 1000,
           "source": {"seq": seq, "ts_us": us}}
    if op == "d":
        rec["before"] = {"url": url}
    else:
        rec["after"] = {"url": url, "warc_ts_us": us, "html": html or b""}
    return confluent_proto_frame(
        sid, encode_message(DEBEZIUM_PROTO_DESCRIPTOR, rec))


KAFKA_DDL = ("key binary, value binary, topic string, partition int,"
             " offset bigint, timestamp timestamp")


def _frames_df(spark, values):
    rows = [(b"k", v, "pages", 0, i, TS.tz_localize(None).to_pydatetime())
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, KAFKA_DDL)


def test_decode_debezium_proto_truth_table(spark):
    reg = {7: DEBEZIUM_PROTO_DESCRIPTOR}
    good = _dbz_proto(1, "https://p/1", TS, "c", b"<p>one</p>")
    values = [
        good,
        _dbz_proto(2, "https://p/2", TS, "u", b"<p>two</p>"),
        _dbz_proto(3, "https://p/1", TS, "d", None),
        b"\x01" + good[1:],                    # bad magic
        confluent_proto_frame(9, good[6:]),    # unknown schema id
        good[:-1],                             # truncated body
        None,                                  # Kafka tombstone
        # unknown op
        confluent_proto_frame(7, encode_message(
            DEBEZIUM_PROTO_DESCRIPTOR,
            {"op": "z", "ts_ms": 0, "source": {"seq": 9, "ts_us": 0}})),
        # upsert without after
        confluent_proto_frame(7, encode_message(
            DEBEZIUM_PROTO_DESCRIPTOR,
            {"op": "c", "ts_ms": 0, "source": {"seq": 10, "ts_us": 0}})),
        # delete without before
        confluent_proto_frame(7, encode_message(
            DEBEZIUM_PROTO_DESCRIPTOR,
            {"op": "d", "ts_ms": 0, "source": {"seq": 11, "ts_us": 0}})),
    ]
    decoded = decode_debezium_proto(_frames_df(spark, values), reg,
                                    keep_raw=True)
    good_df, bad = split_quarantine(decoded)
    g = sorted(good_df.collect(), key=lambda r: r["seq"])
    assert [r["seq"] for r in g] == [1, 2, 3]
    assert g[0]["op"] == "upsert" and g[0]["html"] == b"<p>one</p>"
    assert g[2]["op"] == "delete" and g[2]["html"] is None
    assert g[0]["warc_ts"] == TS.tz_localize(None)
    assert bad.count() == 7
    assert b"\x01" + good[1:] in [r["_raw"] for r in bad.collect()]


def test_proto_forward_compat_envelope(spark):
    """A producer adds envelope fields this consumer's descriptor does
    not know — frames must still decode (unknown-field skip)."""
    wider = dict(DEBEZIUM_PROTO_DESCRIPTOR)
    wider[6] = ("transaction", {1: ("id", "string"), 2: ("ord", "int64")})
    wider[7] = ("tags", "string", "repeated")
    us = int(TS.value // 1000)
    frame = confluent_proto_frame(7, encode_message(wider, {
        "op": "c", "ts_ms": us // 1000, "source": {"seq": 5, "ts_us": us},
        "after": {"url": "https://p/5", "warc_ts_us": us, "html": b"x"},
        "transaction": {"id": "tx-1", "ord": 3}, "tags": ["a", "b"]}))
    decoded = decode_debezium_proto(
        _frames_df(spark, [frame]), {7: DEBEZIUM_PROTO_DESCRIPTOR})
    good, bad = split_quarantine(decoded)
    assert bad.count() == 0
    r = good.collect()[0]
    assert r["seq"] == 5 and r["url"] == "https://p/5"


def test_proto_stream_end_to_end(spark, tmp_path):
    """debezium-proto dialect through the pluggable frames-dir source
    and run_stream: final table ≡ replay oracle, poison quarantined."""
    import glob
    import os

    from montandon_etl_spark.sources.changelog import gen_changelog
    from montandon_etl_spark.sources.kafka import kafka_frames_dir_source
    from montandon_etl_spark.streaming.pipeline import run_stream

    log = gen_changelog(200, 80, seed=13, n_domains=8)
    op_map = {"upsert": "u", "delete": "d"}
    values = []
    for i, r in enumerate(log.itertuples()):
        values.append(_dbz_proto(
            int(r.seq), r.url, pd.Timestamp(r.warc_ts, tz="UTC"),
            op_map[r.op], None if r.html is None else bytes(r.html)))
        if i % 50 == 0:
            values.append(b"\xffpoison")
    n_poison = sum(1 for v in values if v.startswith(b"\xff"))
    frames_dir = str(tmp_path / "frames")
    _frames_df(spark, values).repartition(3).write.parquet(frames_dir)
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    qdir = str(tmp_path / "quarantine")
    run_stream(spark, table, None, str(tmp_path / "ckpt"),
               source=kafka_frames_dir_source(
                   frames_dir, dialect="debezium-proto",
                   registry={7: DEBEZIUM_PROTO_DESCRIPTOR}),
               quarantine_dir=qdir).awaitTermination(300)
    assert_state_equals_oracle(table.read(spark).toPandas(),
                               replay_oracle(log))
    bad = spark.read.parquet(*glob.glob(os.path.join(qdir, "epoch=*")))
    assert bad.count() == n_poison


def test_three_dialect_equivalence(spark, tmp_path):
    """JSON, Avro, and Protobuf Debezium decodes of the same logical
    changelog merge to the identical table state."""
    import base64
    import json as _json

    from montandon_etl_spark.sources.avro import (
        DEBEZIUM_AVRO_SCHEMA,
        confluent_frame,
        decode_debezium_avro,
        encode_record,
    )
    from montandon_etl_spark.sources.kafka import decode_debezium

    events = [
        (1, "https://m/1", TS, "c", b"<p>one</p>"),
        (2, "https://m/2", TS, "c", b"<p>two</p>"),
        (3, "https://m/1", TS + pd.Timedelta(hours=1), "u", b"<p>v2</p>"),
        (4, "https://m/2", TS + pd.Timedelta(hours=1), "d", None),
    ]

    def json_val(s, u, t, op, h):
        us = int(t.value // 1000)
        body = {"op": op, "ts_ms": us // 1000,
                "source": {"seq": s, "ts_us": us}}
        if op == "d":
            body["before"] = {"url": u}
        else:
            body["after"] = {"url": u, "warc_ts_us": us,
                             "html_b64": base64.b64encode(h).decode()}
        return _json.dumps(body).encode()

    def avro_val(s, u, t, op, h):
        us = int(t.value // 1000)
        rec = {"op": op, "ts_ms": us // 1000,
               "source": {"seq": s, "ts_us": us},
               "before": {"url": u} if op == "d" else None,
               "after": None if op == "d" else
               {"url": u, "warc_ts_us": us, "html": h}}
        return confluent_frame(7, encode_record(DEBEZIUM_AVRO_SCHEMA, rec))

    states = []
    for dialect, mk, dec in [
        ("json", json_val, decode_debezium),
        ("avro", avro_val,
         lambda df: decode_debezium_avro(df, {7: DEBEZIUM_AVRO_SCHEMA})),
        ("proto", lambda *a: _dbz_proto(*a),
         lambda df: decode_debezium_proto(df,
                                          {7: DEBEZIUM_PROTO_DESCRIPTOR})),
    ]:
        vals = [mk(s, u, t, op, h) for s, u, t, op, h in events]
        good, _ = split_quarantine(dec(_frames_df(spark, vals)))
        table = SnapshotTable.create(str(tmp_path / f"t_{dialect}"),
                                     n_buckets=4)
        table.merge(spark, enrich_batch(good), batch_id=0)
        states.append(table.read(spark).toPandas())

    op_map = {"c": "upsert", "u": "upsert", "d": "delete"}
    pdf = pd.DataFrame(
        [(s, u, t.tz_localize(None), op_map[op], h)
         for s, u, t, op, h in events],
        columns=["seq", "url", "warc_ts", "op", "html"])
    want = replay_oracle(pdf)
    for st in states:
        assert_state_equals_oracle(st, want)
