"""Kafka RecordBatch v2 wire format (magic=2), from scratch.

The engine's Kafka dialects (sources/kafka.py, avro.py, proto.py)
decode the *value* bytes Spark's Kafka source hands them; this module
decodes the layer BELOW that — the record-batch byte layout brokers
write to segment `.log` files and ship on the wire (the public Kafka
protocol guide, "Messagesets → Record Batch"):

    baseOffset int64 | batchLength int32 | partitionLeaderEpoch int32
    magic int8(=2)   | crc uint32 (CRC32C of attributes..end)
    attributes int16 (bits 0-2 codec: 0 none / 1 gzip / 2 snappy /
                      3 lz4 / 4 zstd; bit 3 logAppendTime;
                      bit 4 transactional; bit 5 control)
    lastOffsetDelta int32 | baseTimestamp int64 | maxTimestamp int64
    producerId int64 | producerEpoch int16 | baseSequence int32
    recordCount int32 | records (codec-compressed concatenation)

Records use ZIGZAG VARINTS (protobuf sint encoding) for every length
and delta; -1 length means NULL key/value/header-value. Kafka's codec
conventions are implemented with this repo's own codecs: gzip = RFC
1952 via zlib, snappy = xerial-framed blocks over sources/snappy.py
(magic ``\\x82SNAPPY\\x00`` + BE version/compat + BE-length chunks —
what the JVM SnappyOutputStream writes), lz4 = the LZ4 FRAME format
over sources/lz4.py, zstd = RFC 8878 frames over sources/zstd.py
(from-scratch FSE/Huffman, reference-verified in test_zstd). The
batch CRC is CRC32C (Castagnoli, reflected poly
0x82F63B78) — table-built here, pinned to crc32c(b"123456789") ==
0xE3069283 — and is VERIFIED on decode; control batches (bit 5) are
CRC-checked then skipped, matching consumer semantics.

Why it matters at 100 TB: tiered-storage segment files are plain
concatenations of these batches. ``segment_records`` turns a
DataFrame of raw segment blobs into the standard Spark-Kafka columns
``(key, value, offset, timestamp)`` with an Arrow-batched
mapInPandas — so historical backfill can read segment dumps straight
from object storage with the SAME downstream decode dialects as the
live stream, no broker round-trip. Reference analogue: the HTTP
extract loop's source-agnostic ingestion (apps/etl/extract.py) —
here the agnosticism extends one layer down the wire.
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Any, Iterator

from montandon_etl_spark.sources.lz4 import (
    lz4_frame_compress,
    lz4_frame_decompress,
)
from montandon_etl_spark.sources.proto import (
    _zz_dec,
    _zz_enc,
    read_varint,
    write_varint,
)
from montandon_etl_spark.sources.zstd import (
    zstd_compress,
    zstd_decompress,
)
from montandon_etl_spark.sources.snappy import (
    snappy_compress,
    snappy_decompress,
)

# ------------------------------------------------------------- crc32c -------
# Castagnoli CRC-32 (iSCSI), reflected polynomial 0x82F63B78 — the
# checksum Kafka v2 batches carry (java.util.zip.CRC32C).
_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ------------------------------------------------- xerial snappy frame ------
_XERIAL_MAGIC = b"\x82SNAPPY\x00"


def xerial_frame(data: bytes, chunk: int = 32 << 10) -> bytes:
    out = bytearray(_XERIAL_MAGIC)
    out += struct.pack(">ii", 1, 1)  # version, compat-version
    for i in range(0, len(data), chunk):
        comp = snappy_compress(data[i:i + chunk])
        out += struct.pack(">i", len(comp))
        out += comp
    return bytes(out)


def xerial_unframe(data: bytes) -> bytes:
    if not data.startswith(_XERIAL_MAGIC):
        # raw snappy block (producers that skip the JVM stream wrapper)
        return snappy_decompress(data)
    pos = len(_XERIAL_MAGIC) + 8
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated xerial chunk length")
        ln = struct.unpack_from(">i", data, pos)[0]
        pos += 4
        if ln < 0 or pos + ln > len(data):
            raise ValueError("truncated xerial chunk")
        out += snappy_decompress(data[pos:pos + ln])
        pos += ln
    return bytes(out)


# ---------------------------------------------------------- record I/O ------
CODEC_NONE, CODEC_GZIP, CODEC_SNAPPY, CODEC_LZ4, CODEC_ZSTD = range(5)
_CODEC_NAMES = {"none": CODEC_NONE, "gzip": CODEC_GZIP,
                "snappy": CODEC_SNAPPY, "lz4": CODEC_LZ4,
                "zstd": CODEC_ZSTD}


def _zz_write(out: io.BytesIO, n: int) -> None:
    write_varint(out, _zz_enc(n))


def _zz_read(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = read_varint(buf, pos)
    return _zz_dec(u), pos


def _encode_record(out: io.BytesIO, offset_delta: int, ts_delta: int,
                   key: bytes | None, value: bytes | None,
                   headers: list[tuple[str, bytes | None]]) -> None:
    body = io.BytesIO()
    body.write(b"\x00")  # record attributes: unused, always 0
    _zz_write(body, ts_delta)
    _zz_write(body, offset_delta)
    for blob in (key, value):
        if blob is None:
            _zz_write(body, -1)
        else:
            _zz_write(body, len(blob))
            body.write(blob)
    _zz_write(body, len(headers))
    for hk, hv in headers:
        hkb = hk.encode()
        _zz_write(body, len(hkb))
        body.write(hkb)
        if hv is None:
            _zz_write(body, -1)
        else:
            _zz_write(body, len(hv))
            body.write(hv)
    raw = body.getvalue()
    _zz_write(out, len(raw))
    out.write(raw)


def _decode_record(buf: bytes, pos: int) -> tuple[dict, int]:
    ln, pos = _zz_read(buf, pos)
    if ln < 0 or pos + ln > len(buf):
        raise ValueError("truncated record")
    end = pos + ln
    pos += 1  # record attributes (unused)
    ts_delta, pos = _zz_read(buf, pos)
    off_delta, pos = _zz_read(buf, pos)
    blobs: list[bytes | None] = []
    for _ in range(2):
        bl, pos = _zz_read(buf, pos)
        if bl < 0:
            blobs.append(None)
        else:
            if pos + bl > end:
                raise ValueError("record key/value overruns record")
            blobs.append(buf[pos:pos + bl])
            pos += bl
    n_hdr, pos = _zz_read(buf, pos)
    headers = []
    for _ in range(n_hdr):
        kl, pos = _zz_read(buf, pos)
        hk = buf[pos:pos + kl].decode()
        pos += kl
        vl, pos = _zz_read(buf, pos)
        if vl < 0:
            hv = None
        else:
            hv = buf[pos:pos + vl]
            pos += vl
        headers.append((hk, hv))
    if pos != end:
        raise ValueError("record length mismatch")
    return ({"timestamp_delta": ts_delta, "offset_delta": off_delta,
             "key": blobs[0], "value": blobs[1], "headers": headers}, end)


# ------------------------------------------------------------- batches ------
_HDR = struct.Struct(">qiibI")          # baseOffset..crc
_MID = struct.Struct(">hiqqqhii")       # attributes..recordCount
_ATTR_OFF = _HDR.size                   # crc covers attributes..end


def encode_record_batch(records: list[dict], base_offset: int = 0,
                        codec: str = "none", producer_id: int = -1,
                        producer_epoch: int = -1, base_sequence: int = -1,
                        partition_leader_epoch: int = 0,
                        transactional: bool = False,
                        control: bool = False) -> bytes:
    """records: dicts with ``timestamp`` (int, ms), optional ``key`` /
    ``value`` (bytes|None) and ``headers`` (list[(str, bytes|None)]).
    Offsets are assigned densely from ``base_offset``."""
    if not records:
        raise ValueError("empty record batch")
    cnum = _CODEC_NAMES.get(codec)
    if cnum is None:
        raise ValueError(f"unsupported codec {codec!r}")
    base_ts = min(r["timestamp"] for r in records)
    max_ts = max(r["timestamp"] for r in records)
    body = io.BytesIO()
    for i, r in enumerate(records):
        _encode_record(body, i, r["timestamp"] - base_ts,
                       r.get("key"), r.get("value"), r.get("headers", []))
    payload = body.getvalue()
    if cnum == CODEC_GZIP:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        payload = co.compress(payload) + co.flush()
    elif cnum == CODEC_SNAPPY:
        payload = xerial_frame(payload)
    elif cnum == CODEC_LZ4:
        payload = lz4_frame_compress(payload)
    elif cnum == CODEC_ZSTD:
        payload = zstd_compress(payload)
    attrs = cnum | (0x10 if transactional else 0) | (0x20 if control else 0)
    mid = _MID.pack(attrs, len(records) - 1, base_ts, max_ts, producer_id,
                    producer_epoch, base_sequence, len(records)) + payload
    crc = crc32c(mid)
    batch_len = 4 + 1 + 4 + len(mid)  # leaderEpoch + magic + crc + rest
    return _HDR.pack(base_offset, batch_len, partition_leader_epoch,
                     2, crc) + mid


# Control-record keys: version int16 + type int16 (0 abort, 1 commit)
CTRL_ABORT, CTRL_COMMIT = 0, 1


def control_marker(kind: int, coordinator_epoch: int = 0) -> dict:
    """Build the record a transaction coordinator writes to end a
    transaction: key = (version=0, type), value = (version=0,
    coordinatorEpoch)."""
    return {"timestamp": 0,
            "key": struct.pack(">hh", 0, kind),
            "value": struct.pack(">hi", 0, coordinator_epoch)}


def _scan_batches(data: bytes, verify_crc: bool) -> Iterator[tuple]:
    """Low-level batch walk: yields (header fields, decompressed
    payload) per batch, CRC-verified."""
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated batch header")
        base_offset, batch_len = struct.unpack_from(">qi", data, pos)
        end = pos + 12 + batch_len
        if end > n:
            raise ValueError("truncated record batch")
        _, _, _, magic, crc = _HDR.unpack_from(data, pos)
        if magic != 2:
            raise ValueError(f"unsupported batch magic {magic}")
        mid = data[pos + _HDR.size:end]
        if verify_crc and crc32c(mid) != crc:
            raise ValueError(f"batch crc mismatch at offset {base_offset}")
        (attrs, _last_delta, base_ts, max_ts, pid, pep, bseq,
         n_rec) = _MID.unpack_from(mid, 0)
        payload = mid[_MID.size:]
        cnum = attrs & 0x07
        if cnum == CODEC_GZIP:
            payload = zlib.decompress(payload, 47)
        elif cnum == CODEC_SNAPPY:
            payload = xerial_unframe(payload)
        elif cnum == CODEC_LZ4:
            payload = lz4_frame_decompress(payload)
        elif cnum == CODEC_ZSTD:
            payload = zstd_decompress(payload)
        elif cnum != CODEC_NONE:
            raise ValueError(f"unknown codec bits {cnum}")
        yield (base_offset, attrs, base_ts, max_ts, pid, pep, bseq,
               n_rec, payload)
        pos = end


def _batch_records(base_offset: int, attrs: int, base_ts: int, max_ts: int,
                   payload: bytes, n_rec: int) -> Iterator[dict]:
    log_append = bool(attrs & 0x08)
    rpos = 0
    for _ in range(n_rec):
        rec, rpos = _decode_record(payload, rpos)
        yield {
            "offset": base_offset + rec["offset_delta"],
            "timestamp": (max_ts if log_append
                          else base_ts + rec["timestamp_delta"]),
            "key": rec["key"],
            "value": rec["value"],
            "headers": rec["headers"],
        }
    if rpos != len(payload):
        raise ValueError("records payload has trailing bytes")


def decode_record_batches(data: bytes, *, verify_crc: bool = True,
                          skip_control: bool = True,
                          read_committed: bool = False) -> Iterator[dict]:
    """Iterate records of every batch in a segment blob (batches are
    concatenated back to back in `.log` files). Yields dicts with
    absolute ``offset``, resolved ``timestamp`` (log-append time wins
    when attributes bit 3 is set), ``key``, ``value``, ``headers``.

    Idempotent-producer semantics always apply: a redelivered batch —
    same (producerId, producerEpoch, baseSequence) with pid ≥ 0 — is
    skipped, exactly the broker's duplicate-produce dedup, so a retry
    storm in the producer can't double-feed the CDC merge.

    ``read_committed=True`` adds transaction isolation: a batch with
    the transactional bit belongs to the producer's transaction that
    ends at that pid's NEXT control marker in the log; if that marker
    is ABORT the batch's records are dropped. An unterminated
    transaction (no marker in this blob) is beyond the last stable
    offset, so its records are not yet visible either — matching what
    a read_committed consumer would be allowed to fetch."""
    if read_committed:
        # markers[pid] = ordered [(marker_offset, kind), ...]
        markers: dict[int, list[tuple[int, int]]] = {}
        for (boff, attrs, _bt, _mt, pid, _pep, _bseq, n_rec,
             payload) in _scan_batches(data, verify_crc=False):
            if attrs & 0x20:
                rec = next(iter(_batch_records(boff, attrs, 0, 0, payload,
                                               n_rec)))
                _ver, kind = struct.unpack(">hh", rec["key"][:4])
                markers.setdefault(pid, []).append((boff, kind))

    seen: set[tuple[int, int, int]] = set()
    for (boff, attrs, base_ts, max_ts, pid, pep, bseq, n_rec,
         payload) in _scan_batches(data, verify_crc):
        is_control = bool(attrs & 0x20)
        if pid >= 0 and bseq >= 0 and not is_control:
            dup_key = (pid, pep, bseq)
            if dup_key in seen:
                continue
            seen.add(dup_key)
        if is_control:
            if skip_control:
                continue
        elif read_committed and attrs & 0x10:
            nxt = next((k for off, k in markers.get(pid, ())
                        if off > boff), None)
            if nxt != CTRL_COMMIT:
                continue  # aborted, or still open (past the LSO)
        yield from _batch_records(boff, attrs, base_ts, max_ts, payload,
                                  n_rec)


# ------------------------------------------------------------ Spark ---------
RECORD_SCHEMA = ("offset bigint, timestamp bigint, key binary, value binary")


def segment_records(df, blob_col: str = "segment",
                    read_committed: bool = False):
    """DataFrame[... blob_col binary] → DataFrame[offset, timestamp,
    key, value]: every record of every v2 batch in every blob, CRC
    verified, control batches skipped, redelivered idempotent-producer
    batches deduped (and aborted transactions dropped when
    ``read_committed``). One Arrow batch in, many rows out — the scan
    stays embarrassingly parallel (one task per segment file slice),
    nothing shuffles; transaction markers live in the same segment as
    the batches they terminate, so isolation needs no cross-blob
    state."""
    import pandas as pd

    def gen(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows: list[tuple[Any, ...]] = []
            for blob in pdf[blob_col]:
                for r in decode_record_batches(
                        bytes(blob), read_committed=read_committed):
                    rows.append((r["offset"], r["timestamp"], r["key"],
                                 r["value"]))
            yield pd.DataFrame(
                rows, columns=["offset", "timestamp", "key", "value"])

    return df.select(blob_col).mapInPandas(gen, schema=RECORD_SCHEMA)


def kafka_segment_dir_source(segments_dir: str, dialect: str = "json",
                             read_committed: bool = False,
                             **decode_kwargs):
    """Source factory over a directory of Kafka segment `.log` dumps:
    binaryFile scan → batch decode → the chosen envelope dialect from
    sources/kafka.py. Historical backfill path: same decode tree as
    the live ``kafka_source``, pointed at tiered-storage segments."""
    from montandon_etl_spark.sources.kafka import _decode_fn

    def factory(spark):
        from pyspark.sql import functions as F
        raw = (spark.read.format("binaryFile")
               .option("pathGlobFilter", "*.log").load(segments_dir)
               .select(F.col("content").alias("segment")))
        recs = segment_records(
            raw, read_committed=read_committed).withColumnRenamed(
            "timestamp", "kafka_ts_ms")
        return _decode_fn(dialect)(recs, **decode_kwargs)

    return factory
