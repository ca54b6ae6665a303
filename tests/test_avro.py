"""Avro binary codec, OCF container, and Confluent-framed Debezium
decode (sources/avro.py): spec known-answer vectors, randomized
roundtrips, container failure modes, quarantine truth table, and the
end-to-end stream equivalence — the SAME changelog through the JSON
and Avro Debezium dialects lands the identical table state."""

from __future__ import annotations

import glob
import io
import json
import os
import random
import struct

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.oracle import replay_oracle
from montandon_etl_spark.sources.avro import (
    DEBEZIUM_AVRO_SCHEMA,
    confluent_frame,
    decode_debezium_avro,
    decode_record,
    decode_value,
    encode_record,
    parse_schema,
    read_long,
    read_ocf,
    write_long,
    write_ocf,
)
from montandon_etl_spark.sources.changelog import gen_changelog
from montandon_etl_spark.sources.kafka import split_quarantine
from montandon_etl_spark.streaming.pipeline import enrich_batch, run_stream
from tests.conftest import assert_state_equals_oracle

TS = pd.Timestamp("2024-06-01", tz="UTC")


# ------------------------------------------------------------ spec vectors --
def test_varint_zigzag_spec_vectors():
    """The exact table from the Avro 1.11 spec (binary encoding)."""
    vectors = [(0, "00"), (-1, "01"), (1, "02"), (-2, "03"), (2, "04"),
               (-64, "7f"), (64, "8001"), (-8193, "81 80 01".replace(" ", ""))]
    for n, hx in vectors:
        out = io.BytesIO()
        write_long(out, n)
        assert out.getvalue().hex() == hx, n
        back, pos = read_long(out.getvalue(), 0)
        assert back == n and pos == len(out.getvalue())


def test_record_spec_known_answer():
    """The canonical spec example: record {a: long, b: string} with
    {a: 27, b: "foo"} encodes to exactly 36 06 66 6f 6f."""
    schema = json.dumps({
        "type": "record", "name": "test", "fields": [
            {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]})
    enc = encode_record(schema, {"a": 27, "b": "foo"})
    assert enc.hex() == "3606666f6f"
    assert decode_record(schema, enc) == {"a": 27, "b": "foo"}


NESTED_SCHEMA = json.dumps({
    "type": "record", "name": "Doc", "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "ok", "type": "boolean"},
        {"name": "blob", "type": "bytes"},
        {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "digest", "type": {"type": "fixed", "name": "D16",
                                    "size": 4}},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "counts", "type": {"type": "map", "values": "long"}},
        {"name": "child", "type": ["null", {
            "type": "record", "name": "Child", "fields": [
                {"name": "x", "type": "int"},
                {"name": "grand", "type": ["null", "Child"]}]}]},
    ]})


def _mk_doc(i: int) -> dict:
    return {
        "id": i * 7 - 3,
        "title": None if i % 3 == 0 else f"t{i}",
        "score": i * 0.5,
        "ratio": float(i),
        "ok": i % 2 == 0,
        "blob": bytes([i % 256, (i * 3) % 256]),
        "kind": "ABC"[i % 3],
        "digest": struct.pack(">I", i),
        "tags": [f"g{j}" for j in range(i % 4)],
        "counts": {f"k{j}": i * j for j in range(i % 3)},
        "child": None if i % 5 == 0 else
        {"x": i, "grand": {"x": -i, "grand": None} if i % 2 else None},
    }


def test_nested_roundtrip_all_types():
    for i in range(30):
        doc = _mk_doc(i)
        assert decode_record(NESTED_SCHEMA, encode_record(NESTED_SCHEMA, doc)) \
            == doc


def test_negative_block_count_arrays():
    """Writers may emit array/map blocks with a NEGATIVE count followed
    by a byte size (for skipping); the decoder must honour it."""
    schema = parse_schema(json.dumps({"type": "array", "items": "long"}))
    body = io.BytesIO()
    items = io.BytesIO()
    for v in (5, -7):
        write_long(items, v)
    write_long(body, -2)                      # negative count
    write_long(body, len(items.getvalue()))   # byte size
    body.write(items.getvalue())
    write_long(body, 0)
    got, pos = decode_value(schema, body.getvalue(), 0)
    assert got == [5, -7] and pos == len(body.getvalue())


def test_truncated_and_trailing_fail():
    schema = json.dumps({
        "type": "record", "name": "t",
        "fields": [{"name": "s", "type": "string"}]})
    enc = encode_record(schema, {"s": "hello"})
    with pytest.raises(ValueError):
        decode_record(schema, enc[:-1])
    with pytest.raises(ValueError):
        decode_record(schema, enc + b"\x00")


def test_randomized_roundtrip_property():
    rng = random.Random(20240601)
    schema = json.dumps({
        "type": "record", "name": "R", "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "a", "type": {"type": "array", "items": "double"}},
            {"name": "m", "type": {"type": "map", "values": "string"}}]})
    for _ in range(200):
        rec = {
            "n": rng.randint(-2**62, 2**62),
            "s": None if rng.random() < 0.3 else
            "".join(chr(rng.randint(32, 0x2FF)) for _ in range(rng.randint(0, 12))),
            "a": [rng.uniform(-1e9, 1e9) for _ in range(rng.randint(0, 5))],
            "m": {f"k{j}": str(rng.random()) for j in range(rng.randint(0, 4))},
        }
        assert decode_record(schema, encode_record(schema, rec)) == rec


# -------------------------------------------------------------------- OCF ---
@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_multiblock(codec):
    docs = [_mk_doc(i) for i in range(257)]
    data = write_ocf(NESTED_SCHEMA, docs, codec=codec, block_records=100)
    meta, back = read_ocf(data)
    assert back == docs
    assert meta["avro.codec"].decode() == codec
    assert json.loads(meta["avro.schema"].decode()) == json.loads(NESTED_SCHEMA)
    # deterministic bytes: same input → same file (re-export contract)
    assert write_ocf(NESTED_SCHEMA, docs, codec=codec, block_records=100) == data


def test_ocf_failure_modes():
    docs = [_mk_doc(i) for i in range(5)]
    data = write_ocf(NESTED_SCHEMA, docs)
    with pytest.raises(ValueError, match="not an Avro"):
        read_ocf(b"PK\x03\x04" + data[4:])
    # flip a byte inside the trailing sync marker
    corrupt = data[:-1] + bytes([data[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="sync"):
        read_ocf(corrupt)
    with pytest.raises(ValueError):
        read_ocf(data[:-20])  # truncated final block


def test_ocf_spark_scan(spark, tmp_path):
    """read_avro_ocf: a sharded OCF export scans back to exactly the
    written rows, one task per file; a corrupt shard yields its single
    record-not-drop NULL row instead of failing the scan."""
    from montandon_etl_spark.sources.avro import read_avro_ocf
    schema = json.dumps({
        "type": "record", "name": "Page", "fields": [
            {"name": "doc_id", "type": "long"},
            {"name": "text", "type": "string"}]})
    d = tmp_path / "avro"
    d.mkdir()
    want = []
    for shard in range(4):
        recs = [{"doc_id": shard * 100 + i, "text": f"doc {shard}/{i}"}
                for i in range(25)]
        want += recs
        codec = "deflate" if shard % 2 else "null"
        (d / f"part-{shard:04d}.avro").write_bytes(
            write_ocf(schema, recs, codec=codec))
    (d / "part-9999.avro").write_bytes(b"garbage not avro")
    out = read_avro_ocf(spark, str(d), schema,
                        "path string, rec_idx int, doc_id long, text string")
    rows = out.collect()
    good = sorted((r.doc_id, r.text) for r in rows if r.rec_idx is not None)
    assert good == sorted((r["doc_id"], r["text"]) for r in want)
    assert sum(1 for r in rows if r.rec_idx is None) == 1


# -------------------------------------------------- Confluent / Debezium ----
def _dbz_avro(seq, url, ts, op, html: bytes | None, sid=7) -> bytes:
    us = int(ts.value // 1000)
    rec = {"op": op, "ts_ms": us // 1000,
           "source": {"seq": seq, "ts_us": us},
           "before": {"url": url} if op == "d" else None,
           "after": None if op == "d" else
           {"url": url, "warc_ts_us": us, "html": html or b""}}
    return confluent_frame(sid, encode_record(DEBEZIUM_AVRO_SCHEMA, rec))


KAFKA_DDL = ("key binary, value binary, topic string, partition int,"
             " offset bigint, timestamp timestamp")


def _frames_df(spark, values):
    rows = [(b"k", v, "pages", 0, i, TS.tz_localize(None).to_pydatetime())
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, KAFKA_DDL)


def test_decode_debezium_avro_truth_table(spark):
    reg = {7: DEBEZIUM_AVRO_SCHEMA}
    good_upsert = _dbz_avro(1, "https://a/1", TS, "c", b"<p>one</p>")
    values = [
        good_upsert,
        _dbz_avro(2, "https://a/2", TS, "u", b"<p>two</p>"),
        _dbz_avro(3, "https://a/1", TS, "d", None),
        b"\x01" + good_upsert[1:],            # bad magic
        confluent_frame(9, good_upsert[5:]),  # unknown schema id
        good_upsert[:-1],                     # truncated body
        good_upsert + b"\x00",                # trailing bytes
        None,                                 # Kafka tombstone frame
        # unknown op code
        confluent_frame(7, encode_record(DEBEZIUM_AVRO_SCHEMA, {
            "op": "z", "ts_ms": 0, "source": {"seq": 9, "ts_us": 0},
            "before": None, "after": None})),
        # upsert with after == null
        confluent_frame(7, encode_record(DEBEZIUM_AVRO_SCHEMA, {
            "op": "c", "ts_ms": 0, "source": {"seq": 10, "ts_us": 0},
            "before": None, "after": None})),
    ]
    decoded = decode_debezium_avro(_frames_df(spark, values), reg,
                                   keep_raw=True)
    good, bad = split_quarantine(decoded)
    g = sorted(good.collect(), key=lambda r: r["seq"])
    assert [r["seq"] for r in g] == [1, 2, 3]
    assert g[0]["op"] == "upsert" and g[0]["html"] == b"<p>one</p>"
    assert g[2]["op"] == "delete" and g[2]["html"] is None
    assert g[0]["url"] == "https://a/1"
    assert g[0]["warc_ts"] == TS.tz_localize(None)
    assert bad.count() == 7
    # forensics: raw frame bytes preserved on the quarantine side
    assert b"\x01" + good_upsert[1:] in [r["_raw"] for r in bad.collect()]


def test_avro_json_dialect_equivalence(spark, tmp_path):
    """The SAME logical changelog through the JSON-Debezium and
    Avro-Debezium decodes merges to the identical table state."""
    events = [
        (1, "https://m/1", TS, "c", b"<p>one</p>"),
        (2, "https://m/2", TS, "c", b"<p>two</p>"),
        (3, "https://m/1", TS + pd.Timedelta(hours=1), "u", b"<p>one v2</p>"),
        (4, "https://m/2", TS + pd.Timedelta(hours=1), "d", None),
        (5, "https://m/3", TS + pd.Timedelta(hours=2), "r", b"<p>three</p>"),
    ]
    values = [_dbz_avro(s, u, t, op, h) for s, u, t, op, h in events]
    good, _ = split_quarantine(decode_debezium_avro(
        _frames_df(spark, values), {7: DEBEZIUM_AVRO_SCHEMA}))
    table = SnapshotTable.create(str(tmp_path / "avro_pages"), n_buckets=4)
    table.merge(spark, enrich_batch(good), batch_id=0)
    got = table.read(spark).toPandas()
    op_map = {"c": "upsert", "u": "upsert", "r": "upsert", "d": "delete"}
    pdf = pd.DataFrame(
        [(s, u, t.tz_localize(None), op_map[op], h)
         for s, u, t, op, h in events],
        columns=["seq", "url", "warc_ts", "op", "html"])
    assert_state_equals_oracle(got, replay_oracle(pdf))


def test_avro_stream_end_to_end(spark, tmp_path):
    """Confluent-framed Avro frames dir → pluggable source →
    run_stream: final table ≡ replay oracle, poison frames quarantined,
    multi-micro-batch (maxFilesPerTrigger=1 over several files)."""
    from montandon_etl_spark.sources.kafka import kafka_frames_dir_source

    log = gen_changelog(300, 120, seed=11, n_domains=10)
    op_map = {"upsert": "u", "delete": "d"}
    values = []
    for i, r in enumerate(log.itertuples()):
        v = _dbz_avro(int(r.seq), r.url, pd.Timestamp(r.warc_ts, tz="UTC"),
                      op_map[r.op], None if r.html is None else bytes(r.html))
        values.append(v)
        if i % 60 == 0:
            values.append(b"\xff poisoned frame")
    n_poison = sum(1 for v in values if v.startswith(b"\xff"))
    frames_dir = str(tmp_path / "frames")
    _frames_df(spark, values).repartition(4).write.parquet(frames_dir)

    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    qdir = str(tmp_path / "quarantine")
    q = run_stream(spark, table, None, str(tmp_path / "ckpt"),
                   source=kafka_frames_dir_source(
                       frames_dir, dialect="debezium-avro",
                       registry={7: DEBEZIUM_AVRO_SCHEMA}),
                   quarantine_dir=qdir)
    q.awaitTermination(300)
    assert_state_equals_oracle(table.read(spark).toPandas(),
                               replay_oracle(log))
    bad = spark.read.parquet(*glob.glob(os.path.join(qdir, "epoch=*")))
    assert bad.count() == n_poison


def test_registry_plumbing_validation():
    from montandon_etl_spark.sources.kafka import kafka_frames_dir_source
    with pytest.raises(ValueError, match="registry"):
        kafka_frames_dir_source("/tmp/x", dialect="debezium-avro")
    with pytest.raises(ValueError, match="registry"):
        kafka_frames_dir_source("/tmp/x", dialect="debezium",
                                registry={1: "{}"})


# ---------------------------------------------------- schema resolution -----
from montandon_etl_spark.sources.avro import adapt_value, parse_schema  # noqa: E402


def _resolve(writer_json, reader_json, rec):
    enc = encode_record(writer_json, rec)
    return decode_record(writer_json, enc, reader_schema_json=reader_json)


def test_resolution_field_add_drop_defaults():
    w = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"},
        {"name": "gone", "type": "string"}]})
    r = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"},
        {"name": "added_s", "type": "string", "default": "dflt"},
        {"name": "added_b", "type": "bytes", "default": "ÿ!"},
        {"name": "added_u", "type": ["null", "long"], "default": None},
        {"name": "added_arr", "type": {"type": "array", "items": "int"},
         "default": [1, 2]}]})
    got = _resolve(w, r, {"a": 7, "gone": "x"})
    assert got == {"a": 7, "added_s": "dflt", "added_b": b"\xff!",
                   "added_u": None, "added_arr": [1, 2]}
    # reader-only field WITHOUT default -> loud error
    r_bad = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "nodefault", "type": "long"}]})
    with pytest.raises(ValueError, match="no default"):
        _resolve(w, r_bad, {"a": 1, "gone": ""})


def test_resolution_promotions_and_unions():
    w = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "n", "type": "int"},
        {"name": "x", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "u", "type": ["null", "int"]}]})
    r = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "n", "type": "double"},
        {"name": "x", "type": ["null", "double"]},
        {"name": "s", "type": "bytes"},
        {"name": "u", "type": ["null", "long", "string"]}]})
    got = _resolve(w, r, {"n": 3, "x": 9, "s": "hi", "u": 5})
    assert got == {"n": 3.0, "x": 9.0, "s": b"hi", "u": 5}
    assert isinstance(got["n"], float) and isinstance(got["u"], int)
    got = _resolve(w, r, {"n": 0, "x": 0, "s": "", "u": None})
    assert got["u"] is None


def test_resolution_enum_default_and_nested():
    w = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "k", "type": {"type": "enum", "name": "K",
                               "symbols": ["A", "B", "NEW"]}},
        {"name": "sub", "type": {"type": "record", "name": "S", "fields": [
            {"name": "v", "type": "int"},
            {"name": "extra", "type": "string"}]}}]})
    r = json.dumps({"type": "record", "name": "R", "fields": [
        {"name": "k", "type": {"type": "enum", "name": "K",
                               "symbols": ["A", "B"], "default": "A"}},
        {"name": "sub", "type": {"type": "record", "name": "S", "fields": [
            {"name": "v", "type": "long"},
            {"name": "w", "type": "long", "default": 42}]}}]})
    got = _resolve(w, r, {"k": "NEW", "sub": {"v": 1, "extra": "drop"}})
    assert got == {"k": "A", "sub": {"v": 1, "w": 42}}
    got = _resolve(w, r, {"k": "B", "sub": {"v": 2, "extra": ""}})
    assert got["k"] == "B"


def test_ocf_scan_resolves_evolved_writers(spark, tmp_path):
    """One directory, three writer generations; the reader schema
    resolves all of them into one column set."""
    from montandon_etl_spark.sources.avro import read_avro_ocf
    v1 = json.dumps({"type": "record", "name": "P", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"}]})
    v2 = json.dumps({"type": "record", "name": "P", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "lang", "type": "string"}]})       # added field
    v3 = json.dumps({"type": "record", "name": "P", "fields": [
        {"name": "doc_id", "type": "int"},           # narrower writer
        {"name": "text", "type": "string"},
        {"name": "lang", "type": "string"},
        {"name": "junk", "type": "double"}]})        # writer-only
    reader = json.dumps({"type": "record", "name": "P", "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "lang", "type": "string", "default": "und"}]})
    d = tmp_path / "evo"
    d.mkdir()
    (d / "g1.avro").write_bytes(write_ocf(
        v1, [{"doc_id": 1, "text": "one"}]))
    (d / "g2.avro").write_bytes(write_ocf(
        v2, [{"doc_id": 2, "text": "two", "lang": "en"}]))
    (d / "g3.avro").write_bytes(write_ocf(
        v3, [{"doc_id": 3, "text": "three", "lang": "fr", "junk": 1.5}]))
    out = read_avro_ocf(
        spark, str(d), reader,
        "path string, rec_idx int, doc_id long, text string, lang string")
    got = sorted((r.doc_id, r.text, r.lang) for r in out.collect())
    assert got == [(1, "one", "und"), (2, "two", "en"), (3, "three", "fr")]


def test_debezium_avro_evolved_producer(spark):
    """A producer registers an EVOLVED envelope (extra field in after,
    extra top-level block) under a new schema id; the consumer's fixed
    reader schema resolves it — frames decode, nothing quarantines."""
    evolved = json.loads(DEBEZIUM_AVRO_SCHEMA)
    for f in evolved["fields"]:
        if f["name"] == "after":
            f["type"][1]["fields"].append(
                {"name": "content_type", "type": "string"})
    evolved["fields"].append(
        {"name": "transaction",
         "type": ["null", {"type": "record", "name": "Tx", "fields": [
             {"name": "id", "type": "string"}]}]})
    evolved_json = json.dumps(evolved)
    us = int(TS.value // 1000)
    frame = confluent_frame(9, encode_record(evolved_json, {
        "op": "c", "ts_ms": us // 1000,
        "source": {"seq": 8, "ts_us": us},
        "before": None,
        "after": {"url": "https://e/8", "warc_ts_us": us,
                  "html": b"<p>evolved</p>", "content_type": "text/html"},
        "transaction": {"id": "tx-9"}}))
    reg = {7: DEBEZIUM_AVRO_SCHEMA, 9: evolved_json}
    old_frame = _dbz_avro(1, "https://e/1", TS, "c", b"<p>old</p>")
    decoded = decode_debezium_avro(_frames_df(spark, [old_frame, frame]),
                                   reg)
    good, bad = split_quarantine(decoded)
    assert bad.count() == 0
    rows = sorted(good.collect(), key=lambda r: r["seq"])
    assert [r["seq"] for r in rows] == [1, 8]
    assert rows[1]["html"] == b"<p>evolved</p>"
