"""CDC relay: export a table's change feed as Confluent-framed
Debezium-Avro Kafka frames — the OUTBOUND half of the CDC loop.

The engine already tails Debezium topics (sources/kafka.py, avro.py,
proto.py). A lakehouse is also a CDC *producer*: downstream caches,
search indexes, and sibling regions subscribe to "what changed between
snapshot A and B". ``lake.table.diff`` computes exactly that feed from
manifest diffs (O(changed buckets)); this module serializes it into
the same wire format the inbound side consumes, so

    table.diff(a, b) → relay_frames → (Kafka) → relay_changelog
    → SnapshotTable.merge

reproduces the source table on any consumer that was at snapshot A —
the loop test test_relay.py pins ``decode(encode(diff)) merged into a
clone ≡ source`` byte-for-byte.

Envelope semantics:

- added → op ``c``, updated → op ``u``: ``after`` carries the new
  key/order/payload values, ``source.seq``/``ts_us`` the new version.
- deleted → op ``d``: ``before`` carries the key; ``source`` carries
  the DELETED version's order pair with ``seq + 1`` — the diff knows
  the last content version but not the delete event itself, and the
  relay must emit a frame that DOMINATES that version under the
  consumer's (ts, seq) last-writer-wins rule. Within one relay stream
  each key appears at most once, so the synthesized seq cannot
  collide.

Schemas are generated from the table's (key, ts, payload) columns —
``relay_schema`` maps engine types to Avro (timestamps as micros
longs, binary as bytes, payload fields nullable) — and the decoder is
GENERIC over that schema: unlike the pages-contract decoder in
sources/avro.py, ``relay_changelog`` reads its output column set from
the registry entry, so any table shape relays through the same two
calls. Both directions are Arrow-batched mapInPandas over opaque
bytes (the codec-module policy); schemas parse once per batch.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.sources.avro import (
    confluent_frame,
    decode_value,
    encode_record,
    parse_schema,
)

_AVRO_TYPES = {"string": "string", "bigint": "long", "long": "long",
               "int": "int", "double": "double", "float": "float",
               "binary": "bytes", "boolean": "boolean",
               "timestamp": "long"}  # timestamps relay as epoch micros


def relay_schema(key_col: str, key_type: str, ts_col: str,
                 payload: list[tuple[str, str]]) -> str:
    """Debezium-envelope Avro schema for a table shape. ``payload`` is
    [(column, engine_type)]; payload fields are nullable unions."""
    after_fields = (
        [{"name": key_col, "type": _AVRO_TYPES[key_type]},
         {"name": f"{ts_col}_us", "type": "long"}]
        + [{"name": c, "type": ["null", _AVRO_TYPES[t]]}
           for c, t in payload])
    return json.dumps({
        "type": "record", "name": "Envelope", "fields": [
            {"name": "before", "type": ["null", {
                "type": "record", "name": "Key",
                "fields": [{"name": key_col,
                            "type": _AVRO_TYPES[key_type]}]}]},
            {"name": "after", "type": ["null", {
                "type": "record", "name": "Row",
                "fields": after_fields}]},
            {"name": "source", "type": {
                "type": "record", "name": "Source", "fields": [
                    {"name": "seq", "type": "long"},
                    {"name": "ts_us", "type": "long"}]}},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": "long"},
        ]})


def _us(v: Any) -> int | None:
    if v is None or v is pd.NaT:
        return None
    return int(pd.Timestamp(v).value // 1000)


KAFKA_FRAME_DDL = ("key binary, value binary, topic string, partition int,"
                   " offset bigint, timestamp timestamp")


def relay_frames(diff_df: DataFrame, key_col: str, schema_json: str,
                 schema_id: int, ts_col: str = "warc_ts",
                 seq_col: str = "seq",
                 payload_cols: list[str] | None = None,
                 topic: str = "relay") -> DataFrame:
    """``table.diff`` rows → Confluent-framed Debezium-Avro Kafka
    frames (KAFKA_FRAME_DDL shape). Deterministic: offset = source
    seq, frame timestamp = source instant, key = utf-8 key bytes."""
    schema = json.loads(schema_json)
    after_fields = [f["name"] for b in schema["fields"]
                    if b["name"] == "after"
                    for f in b["type"][1]["fields"]]
    pcols = payload_cols
    if pcols is None:
        pcols = [f for f in after_fields
                 if f not in (key_col, f"{ts_col}_us")]
    need = ([key_col, "change", f"old_{seq_col}", f"new_{seq_col}",
             f"old_{ts_col}", f"new_{ts_col}"]
            + [f"new_{c}" for c in pcols])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["key", "value", "topic", "partition", "offset", "timestamp"]
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                d = r._asdict()
                key = d[key_col]
                if d["change"] == "deleted":
                    seq = int(d[f"old_{seq_col}"]) + 1
                    ts_us = _us(d[f"old_{ts_col}"])
                    rec = {"op": "d", "ts_ms": ts_us // 1000,
                           "source": {"seq": seq, "ts_us": ts_us},
                           "before": {key_col: key}, "after": None}
                else:
                    seq = int(d[f"new_{seq_col}"])
                    ts_us = _us(d[f"new_{ts_col}"])
                    after = {key_col: key, f"{ts_col}_us": ts_us}
                    for c in pcols:
                        v = d[f"new_{c}"]
                        after[c] = None if v is None or v is pd.NaT else (
                            bytes(v) if isinstance(v, (bytes, bytearray))
                            else v)
                    rec = {"op": "c" if d["change"] == "added" else "u",
                           "ts_ms": ts_us // 1000,
                           "source": {"seq": seq, "ts_us": ts_us},
                           "before": None, "after": after}
                frame = confluent_frame(schema_id,
                                        encode_record(schema_json, rec))
                rows.append((str(key).encode(), frame, topic, 0, seq,
                             pd.Timestamp(ts_us, unit="us")))
            yield pd.DataFrame(rows, columns=cols)

    return diff_df.select(*need).mapInPandas(batches,
                                             schema=KAFKA_FRAME_DDL)


def relay_changelog(kafka_df: DataFrame, schema_id: int, schema_json: str,
                    key_col: str, key_type: str, ts_col: str = "warc_ts",
                    value_col: str = "value") -> DataFrame:
    """Generic decode of relay frames back to changelog rows: output
    columns are derived FROM THE SCHEMA (seq, key, ts, op + payload
    columns + decode_ok), so any relayed table shape round-trips.
    Malformed frames follow record-not-drop (decode_ok=false)."""
    schema = json.loads(schema_json)
    after_fields = [(f["name"], f["type"]) for b in schema["fields"]
                    if b["name"] == "after"
                    for f in b["type"][1]["fields"]]
    pcols = [(n, t) for n, t in after_fields
             if n not in (key_col, f"{ts_col}_us")]
    inv = {"long": "bigint", "int": "int", "string": "string",
           "bytes": "binary", "double": "double", "float": "float",
           "boolean": "boolean"}

    def sql_t(t: Any) -> str:
        a = t[1] if isinstance(t, list) else t
        return inv[a]

    out_ddl = (f"seq bigint, `{key_col}` {key_type}, {ts_col}_us bigint,"
               f" op string, "
               + ", ".join(f"`{n}` {sql_t(t)}" for n, t in pcols)
               + ", decode_ok boolean")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsed = parse_schema(schema_json)
        cols = (["seq", key_col, f"{ts_col}_us", "op"]
                + [n for n, _ in pcols] + ["decode_ok"])
        npay = len(pcols)
        for pdf in it:
            rows = []
            for v in pdf[value_col]:
                raw = bytes(v) if v is not None else b""
                try:
                    if len(raw) < 5 or raw[0] != 0:
                        raise ValueError("bad magic")
                    if struct.unpack_from(">I", raw, 1)[0] != schema_id:
                        raise ValueError("unknown schema id")
                    rec, pos = decode_value(parsed, raw, 5)
                    if pos != len(raw):
                        raise ValueError("trailing bytes")
                    src = rec["source"]
                    if rec["op"] == "d":
                        rows.append((src["seq"], rec["before"][key_col],
                                     src["ts_us"], "delete")
                                    + (None,) * npay + (True,))
                    elif rec["op"] in ("c", "u", "r"):
                        a = rec["after"]
                        rows.append((src["seq"], a[key_col],
                                     a[f"{ts_col}_us"], "upsert")
                                    + tuple(a[n] for n, _ in pcols)
                                    + (True,))
                    else:
                        raise ValueError("unknown op")
                except Exception:
                    rows.append((None,) * (4 + npay) + (False,))
            yield pd.DataFrame(rows, columns=cols)

    out = kafka_df.select(F.col(value_col)).mapInPandas(batches,
                                                        schema=out_ddl)
    return out.select(
        "seq", key_col,
        F.timestamp_micros(f"{ts_col}_us").alias(ts_col),
        "op", *[n for n, _ in pcols], "decode_ok",
    )
