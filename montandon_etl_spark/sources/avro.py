"""Apache Avro: binary codec + Object Container File reader/writer +
Confluent wire-format (schema-registry-framed) Debezium decode.

Avro is THE production CDC wire format: Debezium's recommended value
converter is Avro against a schema registry, and warehouse landing
zones exchange Avro OCF files. The engine already decodes Debezium
JSON (sources/kafka.py); this module adds the binary dialect so a
Kafka tail producing Confluent-framed Avro (magic ``0x00`` + 4-byte
big-endian schema id + Avro body) lands in the SAME changelog shape —
swapping dialects changes one decode call, not the pipeline.

Everything here is from-scratch stdlib (struct + zlib), implementing
the public Avro 1.11 specification:

- **Binary encoding**: zigzag varint longs/ints, IEEE little-endian
  float/double, length-prefixed bytes/strings, records as field
  concatenation, arrays/maps as counted blocks with 0 terminator,
  unions as zigzag branch index + value, enums as symbol index,
  fixed as raw bytes.
- **Object Container File**: magic ``Obj\\x01``, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker,
  then blocks of ``(count, size, payload, sync)``. Codecs ``null``
  and ``deflate`` (raw zlib, wbits=-15) both ways.
- **Confluent framing**: 1-byte magic 0, 4-byte schema id, body;
  the registry is a plain ``{id: schema_json}`` mapping (in
  production a broadcast snapshot of the registry's subjects).

Scale shape: decode is an Arrow-batched ``mapInPandas`` over binary
payloads — the same slow-path policy as the WARC/shapefile/image
codecs (sources/warc.py): per-batch Python over opaque bytes, zero
row-at-a-time ``F.udf``, schemas parsed ONCE per batch (registry
lookup memoized per partition). Malformed frames follow the engine's
record-not-drop policy (reference keeps failures as rows,
apps/etl/models.py:82-85): ``decode_ok=false`` + NULL fields →
quarantine, never a dropped or NULL-keyed row in the MERGE.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# ---------------------------------------------------------------- varint ----
def _zz(n: int) -> int:
    """Zigzag-map a signed int to unsigned (spec: (n<<1)^(n>>63))."""
    return (n << 1) ^ (n >> 63)


def _unzz(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    u = _zz(n)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzz(u), pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


# ---------------------------------------------------------------- schema ----
def parse_schema(schema_json: str | dict | list) -> Any:
    """Parse an Avro schema (JSON text or already-loaded structure)
    into the resolved form used by encode/decode: named types are
    registered so later references by full name resolve. Returns the
    resolved schema node (dict / list / str)."""
    node = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    names: dict[str, dict] = {}

    def resolve(n: Any, ns: str = "") -> Any:
        if isinstance(n, str):
            if n in _PRIMITIVES:
                return n
            full = n if "." in n else (ns + "." + n if ns else n)
            if full in names:
                return names[full]
            if n in names:
                return names[n]
            raise ValueError(f"unknown type reference: {n}")
        if isinstance(n, list):  # union
            return [resolve(b, ns) for b in n]
        if not isinstance(n, dict):
            raise ValueError(f"bad schema node: {n!r}")
        t = n.get("type")
        if t in ("record", "error"):
            nns = n.get("namespace", ns)
            full = n["name"] if "." in n["name"] else (
                nns + "." + n["name"] if nns else n["name"])
            rec = {"type": "record", "name": full, "fields": []}
            names[full] = rec
            names.setdefault(n["name"], rec)
            for f_ in n["fields"]:
                ent = {"name": f_["name"], "type": resolve(f_["type"], nns)}
                if "default" in f_:
                    ent["default"] = f_["default"]
                rec["fields"].append(ent)
            return rec
        if t == "enum":
            e = {"type": "enum", "name": n["name"],
                 "symbols": list(n["symbols"])}
            if "default" in n:
                e["default"] = n["default"]
            names[n["name"]] = e
            return e
        if t == "fixed":
            fx = {"type": "fixed", "name": n["name"], "size": int(n["size"])}
            names[n["name"]] = fx
            return fx
        if t == "array":
            return {"type": "array", "items": resolve(n["items"], ns)}
        if t == "map":
            return {"type": "map", "values": resolve(n["values"], ns)}
        if t in _PRIMITIVES:
            return t
        if isinstance(t, (dict, list)):  # {"type": {...}} wrapper
            return resolve(t, ns)
        raise ValueError(f"unsupported schema type: {t!r}")

    return resolve(node)


# ---------------------------------------------------------------- codec -----
def encode_value(schema: Any, v: Any, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                write_long(out, i)
                encode_value(branch, v, out)
                return
        raise ValueError(f"value {v!r} matches no union branch")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        write_long(out, int(v))
    elif t == "float":
        out.write(struct.pack("<f", float(v)))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t in ("bytes", "string"):
        b = v.encode("utf-8") if t == "string" else bytes(v)
        write_long(out, len(b))
        out.write(b)
    elif t == "record":
        for f_ in schema["fields"]:
            encode_value(f_["type"], v[f_["name"]], out)
    elif t == "enum":
        write_long(out, schema["symbols"].index(v))
    elif t == "fixed":
        b = bytes(v)
        if len(b) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.write(b)
    elif t == "array":
        if v:
            write_long(out, len(v))
            for item in v:
                encode_value(schema["items"], item, out)
        write_long(out, 0)
    elif t == "map":
        if v:
            write_long(out, len(v))
            for k in v:  # caller controls ordering (dicts preserve it)
                write_long(out, len(k.encode("utf-8")))
                out.write(k.encode("utf-8"))
                encode_value(schema["values"], v[k], out)
        write_long(out, 0)
    else:
        raise ValueError(f"unsupported type {t!r}")


def _matches(branch: Any, v: Any) -> bool:
    t = branch if isinstance(branch, str) else branch["type"]
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, float)
    if t == "string":
        return isinstance(v, str)
    if t in ("bytes", "fixed"):
        return isinstance(v, (bytes, bytearray))
    if t == "record":
        return isinstance(v, dict)
    if t == "enum":
        return isinstance(v, str)
    if t == "array":
        return isinstance(v, list)
    if t == "map":
        return isinstance(v, dict)
    return False


def decode_value(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    if isinstance(schema, list):
        idx, pos = read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return decode_value(schema[idx], buf, pos)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError("truncated boolean")
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return read_long(buf, pos)
    if t == "float":
        if pos + 4 > len(buf):
            raise ValueError("truncated float")
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        if pos + 8 > len(buf):
            raise ValueError("truncated double")
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = read_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("truncated bytes/string")
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "record":
        rec = {}
        for f_ in schema["fields"]:
            rec[f_["name"]], pos = decode_value(f_["type"], buf, pos)
        return rec, pos
    if t == "enum":
        idx, pos = read_long(buf, pos)
        syms = schema["symbols"]
        if not 0 <= idx < len(syms):
            raise ValueError("enum index out of range")
        return syms[idx], pos
    if t == "fixed":
        n = schema["size"]
        if pos + n > len(buf):
            raise ValueError("truncated fixed")
        return buf[pos:pos + n], pos + n
    if t == "array":
        items = []
        while True:
            cnt, pos = read_long(buf, pos)
            if cnt == 0:
                return items, pos
            if cnt < 0:  # block with byte-size prefix
                cnt = -cnt
                _, pos = read_long(buf, pos)
            for _ in range(cnt):
                item, pos = decode_value(schema["items"], buf, pos)
                items.append(item)
    if t == "map":
        m: dict[str, Any] = {}
        while True:
            cnt, pos = read_long(buf, pos)
            if cnt == 0:
                return m, pos
            if cnt < 0:
                cnt = -cnt
                _, pos = read_long(buf, pos)
            for _ in range(cnt):
                klen, pos = read_long(buf, pos)
                k = buf[pos:pos + klen].decode("utf-8")
                pos += klen
                m[k], pos = decode_value(schema["values"], buf, pos)
    raise ValueError(f"unsupported type {t!r}")


def encode_record(schema_json: str, record: dict) -> bytes:
    out = io.BytesIO()
    encode_value(parse_schema(schema_json), record, out)
    return out.getvalue()


def decode_record(schema_json: str, data: bytes,
                  reader_schema_json: str | None = None) -> dict:
    """Decode against the WRITER schema; if ``reader_schema_json`` is
    given, project the result through Avro schema resolution (the
    spec's evolution contract, see ``adapt_value``)."""
    writer = parse_schema(schema_json)
    v, pos = decode_value(writer, data, 0)
    if pos != len(data):
        raise ValueError(f"{len(data) - pos} trailing bytes after record")
    if reader_schema_json is None:
        return v
    return adapt_value(v, writer, parse_schema(reader_schema_json))


# ------------------------------------------------------- schema resolution --
# The Avro spec's writer→reader resolution, applied VALUE-side after a
# full writer-schema decode (equivalent to streaming resolution, and
# what schema evolution in a registry-backed CDC tail requires: the
# consumer holds ONE reader schema while producers register new writer
# versions):
# - record fields match by name; writer-only fields drop; reader-only
#   fields take their declared default (error without one);
# - promotions: int→long/float/double, long→float/double, float→
#   double, string↔bytes;
# - writer union: the decoded branch is matched structurally; reader
#   union: first branch the adapted value resolves against wins;
# - enum: writer symbol unknown to the reader falls back to the
#   reader's declared enum ``default`` (error without one).

_PROMOTE = {
    ("int", "long"): int, ("int", "float"): float,
    ("int", "double"): float, ("long", "float"): float,
    ("long", "double"): float, ("float", "double"): float,
}


def _branch_for(v: Any, union: list) -> Any:
    for b in union:
        if _matches(b, v):
            return b
    raise ValueError(f"decoded value {v!r} matches no writer union branch")


def adapt_value(v: Any, writer: Any, reader: Any) -> Any:
    if isinstance(writer, list):
        writer = _branch_for(v, writer)
    if isinstance(reader, list):
        last_err = None
        for b in reader:
            try:
                return adapt_value(v, writer, b)
            except ValueError as e:
                last_err = e
        raise ValueError(f"no reader union branch accepts writer value: "
                         f"{last_err}")
    wt = writer if isinstance(writer, str) else writer["type"]
    rt = reader if isinstance(reader, str) else reader["type"]
    if wt == rt and wt in _PRIMITIVES:
        return v
    if (wt, rt) in _PROMOTE:
        return _PROMOTE[(wt, rt)](v)
    if wt == "string" and rt == "bytes":
        return v.encode("utf-8")
    if wt == "bytes" and rt == "string":
        return v.decode("utf-8")
    if wt == "record" and rt == "record":
        wf = {f_["name"]: f_ for f_ in writer["fields"]}
        out = {}
        for f_ in reader["fields"]:
            name = f_["name"]
            if name in wf:
                out[name] = adapt_value(v[name], wf[name]["type"],
                                        f_["type"])
            elif "default" in f_:
                out[name] = _default_value(f_["type"], f_["default"])
            else:
                raise ValueError(
                    f"reader field {name!r} absent from writer schema and "
                    f"has no default")
        return out
    if wt == "enum" and rt == "enum":
        if v in reader["symbols"]:
            return v
        if "default" in reader:
            return reader["default"]
        raise ValueError(f"enum symbol {v!r} unknown to reader")
    if wt == "array" and rt == "array":
        return [adapt_value(x, writer["items"], reader["items"]) for x in v]
    if wt == "map" and rt == "map":
        return {k: adapt_value(x, writer["values"], reader["values"])
                for k, x in v.items()}
    if wt == "fixed" and rt == "fixed":
        if writer["size"] != reader["size"]:
            raise ValueError("fixed size mismatch between schemas")
        return v
    raise ValueError(f"cannot resolve writer type {wt!r} to reader {rt!r}")


def _default_value(schema: Any, dflt: Any) -> Any:
    """JSON default → runtime value (spec: bytes/fixed defaults are
    strings holding latin-1 code points; union defaults conform to the
    FIRST branch)."""
    if isinstance(schema, list):
        return _default_value(schema[0], dflt)
    t = schema if isinstance(schema, str) else schema["type"]
    if t in ("bytes", "fixed"):
        return dflt.encode("latin-1")
    if t in ("float", "double"):
        return float(dflt)
    if t == "record":
        return {f_["name"]: _default_value(f_["type"], dflt[f_["name"]])
                for f_ in schema["fields"]}
    if t == "array":
        return [_default_value(schema["items"], x) for x in dflt]
    if t == "map":
        return {k: _default_value(schema["values"], x)
                for k, x in dflt.items()}
    return dflt


# ------------------------------------------------------------------- OCF ----
_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(schema_json: str, records: list[dict], codec: str = "null",
              sync: bytes | None = None, block_records: int = 1000) -> bytes:
    """Serialize records into an Object Container File. ``sync`` must
    be 16 bytes; default is deterministic (sha of the schema) so
    identical inputs produce identical files — the engine's
    byte-identical re-export contract (sources/shard_export.py)."""
    import hashlib
    schema = parse_schema(schema_json)
    if sync is None:
        sync = hashlib.sha256(schema_json.encode()).digest()[:16]
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"unsupported codec {codec!r}")
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    encode_value(_META_SCHEMA, meta, out)
    out.write(sync)
    for i in range(0, len(records), block_records):
        chunk = records[i:i + block_records]
        body = io.BytesIO()
        for r in chunk:
            encode_value(schema, r, body)
        payload = body.getvalue()
        if codec == "deflate":
            payload = zlib.compress(payload, 9)[2:-4]  # raw deflate
        elif codec == "snappy":
            # Avro spec: snappy blocks carry a 4-byte big-endian CRC32
            # of the UNCOMPRESSED data after the compressed body
            from montandon_etl_spark.sources.snappy import snappy_compress
            payload = snappy_compress(payload) + struct.pack(
                ">I", zlib.crc32(payload))
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Parse an OCF: returns (metadata dict of str→bytes, records).
    Raises on bad magic, unknown codec, or sync-marker mismatch —
    a torn/corrupt container must fail loudly, not truncate."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file")
    meta, pos = decode_value(_META_SCHEMA, data, 4)
    schema_json = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", "snappy"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema = parse_schema(schema_json)
    sync = data[pos:pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(data):
        cnt, pos = read_long(data, pos)
        size, pos = read_long(data, pos)
        payload = data[pos:pos + size]
        if len(payload) != size:
            raise ValueError("truncated block")
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec == "snappy":
            from montandon_etl_spark.sources.snappy import snappy_decompress
            body, crc = payload[:-4], payload[-4:]
            payload = snappy_decompress(body)
            if struct.pack(">I", zlib.crc32(payload)) != crc:
                raise ValueError("snappy block CRC mismatch")
        p = 0
        for _ in range(cnt):
            rec, p = decode_value(schema, payload, p)
            records.append(rec)
        if p != len(payload):
            raise ValueError("block payload has trailing bytes")
    return meta, records


# ------------------------------------------------------------ Spark layer ---
def avro_ocf_rows(df: DataFrame, id_col: str, bin_col: str,
                  schema_json: str, out_schema: str) -> DataFrame:
    """One row per record inside each OCF blob. ``schema_json`` is the
    READER schema: containers written under a DIFFERENT schema resolve
    through the spec's evolution rules (``adapt_value`` — name-matched
    fields, defaults, promotions); an unresolvable container fails the
    blob with one NULL row (record-not-drop). ``out_schema`` is the
    Spark DDL of the emitted columns: ``id_col, rec_idx int`` + one
    column per top-level reader field (nulls for absent union
    branches)."""
    fields = [f_["name"] for f_ in json.loads(schema_json)["fields"]]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [id_col, "rec_idx"] + fields
        reader = parse_schema(schema_json)
        reader_plain = json.loads(schema_json)
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    meta, recs = read_ocf(bytes(p))
                    wj = meta["avro.schema"].decode()
                    same = json.loads(wj) == reader_plain
                    writer = None if same else parse_schema(wj)
                    for i, r in enumerate(recs):
                        if not same:
                            r = adapt_value(r, writer, reader)
                        rows.append((aid, i, *[r.get(f_) for f_ in fields]))
                except Exception:
                    rows.append((aid, None) + (None,) * len(fields))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(batches, schema=out_schema)


def read_avro_ocf(spark, path: str, schema_json: str, out_schema: str,
                  id_col: str = "path") -> DataFrame:
    """Scan a directory of ``.avro`` OCF files into rows (binaryFile
    source → per-file decode). File-level parallelism: one task per
    file — shard the export (write_ocf per bucket) for cluster scans,
    exactly like the WARC/token-shard layout."""
    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path").alias(id_col), F.col("content")))
    return avro_ocf_rows(files, id_col, "content",
                         schema_json, out_schema)


# ----------------------------------------------------- Confluent framing ----
def confluent_frame(schema_id: int, body: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", schema_id) + body


# Debezium envelope as an Avro schema (the shape Debezium's Avro
# converter registers: before/after as nullable sub-records, op code,
# source block). html ships as raw bytes — no base64 hop like JSON.
DEBEZIUM_AVRO_SCHEMA = json.dumps({
    "type": "record", "name": "Envelope", "fields": [
        {"name": "before", "type": ["null", {
            "type": "record", "name": "Key",
            "fields": [{"name": "url", "type": "string"}]}]},
        {"name": "after", "type": ["null", {
            "type": "record", "name": "Row", "fields": [
                {"name": "url", "type": "string"},
                {"name": "warc_ts_us", "type": "long"},
                {"name": "html", "type": "bytes"}]}]},
        {"name": "source", "type": {
            "type": "record", "name": "Source", "fields": [
                {"name": "seq", "type": "long"},
                {"name": "ts_us", "type": "long"}]}},
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": "long"},
    ]})

_DBZ_OPS = {"c": "upsert", "u": "upsert", "r": "upsert", "d": "delete"}


def decode_debezium_avro(kafka_df: DataFrame, registry: dict[int, str],
                         value_col: str = "value",
                         keep_raw: bool = False,
                         reader_schema: str | None = None) -> DataFrame:
    """Confluent-framed Debezium-Avro frames → changelog rows
    (+ ``decode_ok``) — the binary twin of kafka.decode_debezium, same
    output columns so split_quarantine and the MERGE are dialect-blind.

    ``registry`` is the schema-registry snapshot {id: schema json}; it
    is captured in the closure and shipped to executors once per task
    (broadcast semantics), schemas parsed once per partition.

    decode_ok=false (NULL fields, frame preserved) for: bad magic,
    unknown schema id, truncated/trailing bytes, unknown op, missing
    after-row on upsert / key on delete.

    ``reader_schema``: the consumer's envelope schema (defaults to
    DEBEZIUM_AVRO_SCHEMA when any registry writer differs from it) —
    frames written under EVOLVED registry schemas resolve through
    ``adapt_value`` before field access, so a producer adding envelope
    fields or widening types never breaks this consumer.
    """
    reg_json = dict(registry)
    if reader_schema is None and any(
            json.loads(s) != json.loads(DEBEZIUM_AVRO_SCHEMA)
            for s in reg_json.values()):
        reader_schema = DEBEZIUM_AVRO_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parsed: dict[int, Any] = {}
        rdr = parse_schema(reader_schema) if reader_schema else None
        rdr_plain = json.loads(reader_schema) if reader_schema else None
        cols = ["seq", "url", "warc_ts_us", "op", "html", "decode_ok", "raw"]
        for pdf in it:
            rows = []
            for v in pdf[value_col]:
                raw = bytes(v) if v is not None else b""
                try:
                    if len(raw) < 5 or raw[0] != 0:
                        raise ValueError("bad magic")
                    sid = struct.unpack_from(">I", raw, 1)[0]
                    if sid not in reg_json:
                        raise ValueError("unknown schema id")
                    if sid not in parsed:
                        parsed[sid] = parse_schema(reg_json[sid])
                    rec, pos = decode_value(parsed[sid], raw, 5)
                    if pos != len(raw):
                        raise ValueError("trailing bytes")
                    if rdr is not None and \
                            json.loads(reg_json[sid]) != rdr_plain:
                        rec = adapt_value(rec, parsed[sid], rdr)
                    op = _DBZ_OPS[rec["op"]]  # KeyError → quarantine
                    if op == "delete":
                        key = rec["before"] or {}
                        url = key["url"]
                        rows.append((rec["source"]["seq"], url,
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
