"""Protocol Buffers wire format + Confluent-framed Debezium decode —
the third of the three schema-registry serdes (JSON, Avro, Protobuf)
a production Kafka CDC tail can speak.

From-scratch stdlib implementation of the public proto3 wire spec:

- **Varints** (base-128 little-endian), **zigzag** for sint32/64,
  little-endian **fixed32/fixed64**, **length-delimited** fields.
- Wire types 0 (varint), 1 (i64), 2 (len), 5 (i32). Groups (3/4) are
  long-deprecated and raise.
- **Unknown fields are skipped by wire type** — the proto
  forward-compatibility contract that makes producer-side schema
  evolution non-breaking for this consumer (the Avro dialect gets the
  same property from writer-schema resolution; here it is structural).
- **Repeated** scalar fields accept BOTH packed (one length-delimited
  block, the proto3 default) and unpacked (repeated tags) encodings,
  as the spec requires of parsers.
- Field presence: message-typed fields decode to None when absent
  (how Debezium's before/after distinguish delete/insert); scalars
  take proto3 zero defaults; repeated fields default to [].

Descriptors are plain dicts — ``{field_number: (name, type[, label])}``
with type a scalar name or a nested descriptor dict, label optionally
``"repeated"`` — mirroring how the Avro dialect carries its schema
as plain JSON: the registry snapshot is data, not generated code.

Confluent Protobuf framing: magic ``0x00`` + 4-byte big-endian schema
id + **message-indexes** (a varint count then that many varints
walking the file's message-type tree; the common first-message case
is the single byte ``0x00``) + body. ``decode_debezium_proto`` is the
binary triplet of kafka.decode_debezium / avro.decode_debezium_avro —
same changelog columns, registry snapshot broadcast, record-not-drop
quarantine on malformed frames.
"""

from __future__ import annotations

import io
import struct
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALARS = {"int32", "int64", "uint32", "uint64", "sint32", "sint64",
            "bool", "enum", "fixed64", "sfixed64", "double", "fixed32",
            "sfixed32", "float", "string", "bytes"}
_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "sint32", "sint64",
                 "bool", "enum"}
_PACKABLE = _VARINT_TYPES | {"fixed64", "sfixed64", "double", "fixed32",
                             "sfixed32", "float"}


# ---------------------------------------------------------------- varint ----
def write_varint(out: io.BytesIO, u: int) -> None:
    if u < 0:  # int32/int64 negatives: two's-complement 64-bit
        u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zz_enc(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zz_dec(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _to_signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _to_signed32(u: int) -> int:
    u &= (1 << 32) - 1
    return u - (1 << 32) if u >= (1 << 31) else u


# ------------------------------------------------------------- wire types ---
def _wire_type(t: Any) -> int:
    if isinstance(t, dict) or t in ("string", "bytes"):
        return 2
    if t in _VARINT_TYPES:
        return 0
    if t in ("fixed64", "sfixed64", "double"):
        return 1
    if t in ("fixed32", "sfixed32", "float"):
        return 5
    raise ValueError(f"unknown field type {t!r}")


def _enc_scalar(out: io.BytesIO, t: str, v: Any) -> None:
    if t in ("int32", "int64", "uint32", "uint64", "enum"):
        write_varint(out, int(v))
    elif t in ("sint32", "sint64"):
        write_varint(out, _zz_enc(int(v)))
    elif t == "bool":
        write_varint(out, 1 if v else 0)
    elif t == "fixed64":
        out.write(struct.pack("<Q", v))
    elif t == "sfixed64":
        out.write(struct.pack("<q", v))
    elif t == "double":
        out.write(struct.pack("<d", v))
    elif t == "fixed32":
        out.write(struct.pack("<I", v))
    elif t == "sfixed32":
        out.write(struct.pack("<i", v))
    elif t == "float":
        out.write(struct.pack("<f", v))
    else:
        raise ValueError(f"not a numeric scalar: {t!r}")


def _dec_scalar(t: str, buf: bytes, pos: int) -> tuple[Any, int]:
    if t in _VARINT_TYPES:
        u, pos = read_varint(buf, pos)
        if t in ("sint32", "sint64"):
            return _zz_dec(u), pos
        if t == "bool":
            return u != 0, pos
        if t == "int64":
            return _to_signed64(u), pos
        if t == "int32":
            # protobuf semantics: truncate to 32 bits, reinterpret signed
            return _to_signed32(u), pos
        return u, pos  # uint32/uint64/enum
    if t in ("fixed64", "sfixed64", "double"):
        if pos + 8 > len(buf):
            raise ValueError("truncated i64 field")
        fmt = {"fixed64": "<Q", "sfixed64": "<q", "double": "<d"}[t]
        return struct.unpack_from(fmt, buf, pos)[0], pos + 8
    if t in ("fixed32", "sfixed32", "float"):
        if pos + 4 > len(buf):
            raise ValueError("truncated i32 field")
        fmt = {"fixed32": "<I", "sfixed32": "<i", "float": "<f"}[t]
        return struct.unpack_from(fmt, buf, pos)[0], pos + 4
    raise ValueError(f"not a numeric scalar: {t!r}")


# --------------------------------------------------------------- messages ---
def encode_message(desc: dict[int, tuple], msg: dict) -> bytes:
    """Encode a dict against a descriptor. Proto3 semantics: scalar
    zero values ARE emitted only when explicitly present in ``msg``
    (callers building test vectors control the bytes); None values and
    absent keys emit nothing. Repeated numeric fields are PACKED."""
    out = io.BytesIO()
    for num in sorted(desc):
        entry = desc[num]
        name, t = entry[0], entry[1]
        label = entry[2] if len(entry) > 2 else ""
        if name not in msg or msg[name] is None:
            continue
        v = msg[name]
        if label == "repeated":
            if isinstance(t, dict) or t in ("string", "bytes"):
                for item in v:
                    _enc_field(out, num, t, item)
            elif v:  # packed
                body = io.BytesIO()
                for item in v:
                    _enc_scalar(body, t, item)
                write_varint(out, (num << 3) | 2)
                write_varint(out, len(body.getvalue()))
                out.write(body.getvalue())
        else:
            _enc_field(out, num, t, v)
    return out.getvalue()


def _enc_field(out: io.BytesIO, num: int, t: Any, v: Any) -> None:
    if isinstance(t, dict):
        body = encode_message(t, v)
        write_varint(out, (num << 3) | 2)
        write_varint(out, len(body))
        out.write(body)
    elif t == "string":
        b = v.encode("utf-8")
        write_varint(out, (num << 3) | 2)
        write_varint(out, len(b))
        out.write(b)
    elif t == "bytes":
        b = bytes(v)
        write_varint(out, (num << 3) | 2)
        write_varint(out, len(b))
        out.write(b)
    else:
        write_varint(out, (num << 3) | _wire_type(t))
        _enc_scalar(out, t, v)


def _skip(wt: int, buf: bytes, pos: int) -> int:
    """Skip an unknown field by wire type (forward compatibility)."""
    if wt == 0:
        _, pos = read_varint(buf, pos)
        return pos
    if wt == 1:
        return pos + 8
    if wt == 2:
        n, pos = read_varint(buf, pos)
        if pos + n > len(buf):
            raise ValueError("truncated len field")
        return pos + n
    if wt == 5:
        return pos + 4
    raise ValueError(f"unsupported wire type {wt} (groups are deprecated)")


def decode_message(desc: dict[int, tuple], buf: bytes) -> dict:
    """Decode a message against a descriptor. Unknown field numbers
    are skipped by wire type. Scalars default to proto3 zero values,
    message fields to None, repeated fields to []."""
    msg: dict[str, Any] = {}
    for entry in desc.values():
        name, t = entry[0], entry[1]
        label = entry[2] if len(entry) > 2 else ""
        if label == "repeated":
            msg[name] = []
        elif isinstance(t, dict):
            msg[name] = None
        elif t == "string":
            msg[name] = ""
        elif t == "bytes":
            msg[name] = b""
        elif t in ("double", "float"):
            msg[name] = 0.0
        elif t == "bool":
            msg[name] = False
        else:
            msg[name] = 0
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if num not in desc:
            pos = _skip(wt, buf, pos)
            continue
        entry = desc[num]
        name, t = entry[0], entry[1]
        label = entry[2] if len(entry) > 2 else ""
        expect = _wire_type(t)
        if (label == "repeated" and not isinstance(t, dict)
                and t in _PACKABLE and wt == 2):
            n, pos = read_varint(buf, pos)
            end = pos + n
            if end > len(buf):
                raise ValueError("truncated packed field")
            while pos < end:
                v, pos = _dec_scalar(t, buf, pos)
                msg[name].append(v)
            if pos != end:
                raise ValueError("packed field overran its length")
            continue
        if wt != expect:
            raise ValueError(
                f"field {num} ({name}): wire type {wt}, expected {expect}")
        if isinstance(t, dict):
            n, pos = read_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("truncated message field")
            v = decode_message(t, buf[pos:pos + n])
            pos += n
        elif t in ("string", "bytes"):
            n, pos = read_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("truncated bytes field")
            raw = buf[pos:pos + n]
            v = raw.decode("utf-8") if t == "string" else raw
            pos += n
        else:
            v, pos = _dec_scalar(t, buf, pos)
        if label == "repeated":
            msg[name].append(v)
        else:
            msg[name] = v
    return msg


# ----------------------------------------------------- Confluent framing ----
def confluent_proto_frame(schema_id: int, body: bytes,
                          msg_indexes: list[int] | None = None) -> bytes:
    """magic 0 + schema id + message-indexes + body. The default
    first-message-in-file case serializes as the single byte 0x00."""
    out = io.BytesIO()
    out.write(b"\x00" + struct.pack(">I", schema_id))
    idx = msg_indexes or []
    if not idx:
        out.write(b"\x00")
    else:
        write_varint(out, len(idx))
        for i in idx:
            write_varint(out, i)
    out.write(body)
    return out.getvalue()


def parse_confluent_proto(raw: bytes) -> tuple[int, list[int], bytes]:
    if len(raw) < 6 or raw[0] != 0:
        raise ValueError("bad Confluent magic")
    sid = struct.unpack_from(">I", raw, 1)[0]
    n, pos = read_varint(raw, 5)
    idx = []
    for _ in range(n):
        i, pos = read_varint(raw, pos)
        idx.append(i)
    return sid, idx, raw[pos:]


# Debezium envelope as a proto descriptor (the shape Debezium's
# Protobuf converter registers): before/after sub-messages, source
# block, op string, ts_ms int64. html ships as raw bytes.
_DBZ_ROW = {1: ("url", "string"), 2: ("warc_ts_us", "int64"),
            3: ("html", "bytes")}
DEBEZIUM_PROTO_DESCRIPTOR = {
    1: ("before", {1: ("url", "string")}),
    2: ("after", _DBZ_ROW),
    3: ("source", {1: ("seq", "int64"), 2: ("ts_us", "int64")}),
    4: ("op", "string"),
    5: ("ts_ms", "int64"),
}

_DBZ_OPS = {"c": "upsert", "u": "upsert", "r": "upsert", "d": "delete"}


def decode_debezium_proto(kafka_df: DataFrame,
                          registry: dict[int, dict[int, tuple]],
                          value_col: str = "value",
                          keep_raw: bool = False) -> DataFrame:
    """Confluent-framed Debezium-Protobuf frames → changelog rows
    (+ ``decode_ok``) — same output columns as the JSON and Avro
    dialects so split_quarantine and the MERGE are dialect-blind.
    ``registry`` maps schema id → envelope descriptor.

    decode_ok=false (NULL fields, frame preserved) for: bad magic,
    unknown schema id, truncated body/varints, wire-type mismatches,
    unknown op, missing after on upsert / before on delete."""
    reg = dict(registry)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["seq", "url", "warc_ts_us", "op", "html", "decode_ok", "raw"]
        for pdf in it:
            rows = []
            for v in pdf[value_col]:
                raw = bytes(v) if v is not None else b""
                try:
                    sid, _idx, body = parse_confluent_proto(raw)
                    if sid not in reg:
                        raise ValueError("unknown schema id")
                    rec = decode_message(reg[sid], body)
                    if rec["source"] is None:
                        raise ValueError("missing source block")
                    op = _DBZ_OPS[rec["op"]]  # KeyError → quarantine
                    if op == "delete":
                        if rec["before"] is None:
                            raise ValueError("delete without before")
                        rows.append((rec["source"]["seq"],
                                     rec["before"]["url"],
                                     rec["source"]["ts_us"], op, None,
                                     True, raw))
                    else:
                        after = rec["after"]
                        if after is None:
                            raise ValueError("upsert without after")
                        rows.append((rec["source"]["seq"], after["url"],
                                     after["warc_ts_us"], op,
                                     bytes(after["html"]), True, raw))
                except Exception:
                    rows.append((None, None, None, None, None, False, raw))
            yield pd.DataFrame(rows, columns=cols)

    out = kafka_df.select(F.col(value_col)).mapInPandas(
        batches,
        schema="seq bigint, url string, warc_ts_us bigint, op string,"
               " html binary, decode_ok boolean, raw binary")
    cols = [F.col("seq"), F.col("url"),
            F.timestamp_micros("warc_ts_us").alias("warc_ts"),
            F.col("op"), F.col("html"), F.col("decode_ok")]
    if keep_raw:
        cols.append(F.col("raw").alias("_raw"))
    return out.select(*cols)
