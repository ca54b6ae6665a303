"""Dependency-free WARC (ISO 28500) reader/writer — the container the
actual web corpus ships in (Common Crawl distributes WARC files), so a
crawl-scale pipeline needs it on BOTH ends: parse archive blobs into
the changelog shape on ingest, and emit WARC shards as an export sink.

- ``parse_warc``: WARC/1.0 and /1.1 records framed by headers +
  ``Content-Length`` + CRLF CRLF; whole-file OR per-record-member gzip
  (stdlib ``zlib`` handles concatenated members) detected by magic.
- ``build_warc``: deterministic writer — ``WARC-Record-ID`` derives
  from sha-256 of (uri, date, payload), no uuid4, so re-exports are
  byte-identical (same idempotency-key policy as P9, streaming/
  sinks.py).
- ``warc_records``: mapInPandas over opaque archive blobs → one row
  per record (Arrow-batched; a corrupt blob yields one NULL row —
  record-not-drop). Narrow, pipelines with the scan.
- ``warc_to_changelog``: response records → the engine's
  ``(seq, url, warc_ts, op, html)`` micro-batch shape, ready for
  ``merge_microbatch`` / ``run_stream``'s pluggable source.
- ``to_warc_shards``: groups rows by a deterministic shard key and
  muxes each shard into one WARC blob via ``applyInPandas`` — the
  export sink (caller writes the blobs wherever blobs go).

Reference analogue: the zip fetch-and-unpack source (S8,
apps/etl/extraction — archive download → member iteration) — WARC is
the web-scale counterpart of that container step.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def gz_member(data: bytes) -> bytes:
    """One deterministic gzip member (level 6, mtime 0 — zlib's gzip
    writer stamps no clock), the Common Crawl .warc.gz layout: one
    member PER RECORD, so a reader can seek to any record's byte
    offset and inflate just that member (record-level random access in
    an archive file). ``parse_warc`` already inflates concatenated
    members transparently."""
    co = zlib.compressobj(level=6, wbits=31)
    return co.compress(data) + co.flush()


def build_warc(records: list[tuple[str, str, bytes]],
               warc_type: str = "response",
               gzip_members: bool = False) -> bytes:
    """records: (target_uri, iso8601_date, payload). Deterministic:
    no clocks, no uuids. ``gzip_members``: emit one gzip member per
    record (the distribution layout) — still byte-deterministic."""
    out = []
    for uri, date, payload in records:
        digest = hashlib.sha256(
            uri.encode() + b"|" + date.encode() + b"|" + payload
        ).hexdigest()
        headers = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + warc_type.encode() + _CRLF
            + b"WARC-Record-ID: <urn:sha256:" + digest.encode() + b">" + _CRLF
            + b"WARC-Date: " + date.encode() + _CRLF
            + b"WARC-Target-URI: " + uri.encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        )
        rec = headers + _CRLF + payload + _CRLF + _CRLF
        out.append(gz_member(rec) if gzip_members else rec)
    return b"".join(out)


def _gunzip_all(b: bytes) -> bytes:
    """Decompress ALL concatenated gzip members (per-record gzip is
    the Common Crawl layout)."""
    out, pos = [], 0
    while pos < len(b):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(b[pos:]))
        rest = d.unused_data
        if not rest:
            break
        pos = len(b) - len(rest)
    return b"".join(out)


def parse_warc(b: bytes) -> list[dict]:
    """→ [{"warc_type", "record_id", "uri", "date", "payload"}, ...].
    Raises ValueError on malformed framing."""
    if b[:2] == b"\x1f\x8b":
        b = _gunzip_all(b)
    records, pos, n = [], 0, len(b)
    while pos < n:
        if b[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC version line at {pos}")
        head_end = b.find(_CRLF + _CRLF, pos)
        if head_end == -1:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        for line in b[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body = head_end + 4
        payload = b[body : body + length]
        if b[body + length : body + length + 4] != _CRLF + _CRLF:
            raise ValueError("missing record trailer CRLF CRLF")
        records.append({
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "refers_to": headers.get("warc-refers-to"),
            "content_type": headers.get("content-type"),
            "payload": payload,
        })
        pos = body + length + 4
    return records


WARC_RECORD_SCHEMA = (
    "asset_id bigint, rec_idx int, warc_type string, record_id string,"
    " uri string, warc_date string, refers_to string,"
    " content_type string, content_length int, payload binary"
)


def warc_records(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """One row per WARC record inside each archive blob."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "rec_idx", "warc_type", "record_id", "uri",
                "warc_date", "refers_to", "content_type",
                "content_length", "payload"]
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    for i, r in enumerate(parse_warc(bytes(p))):
                        rows.append((aid, i, r["warc_type"], r["record_id"],
                                     r["uri"], r["date"], r["refers_to"],
                                     r["content_type"],
                                     len(r["payload"]), r["payload"]))
                except Exception:
                    rows.append((aid, None, None, None, None, None, None,
                                 None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(batches, schema=WARC_RECORD_SCHEMA)


def warc_to_changelog(records: DataFrame) -> DataFrame:
    """Response records → the engine's changelog micro-batch shape:
    (seq, url, warc_ts, op, html). ``seq`` is derived from the record's
    position so replays are deterministic; non-response records
    (warcinfo, request, metadata) are filtered — they are container
    framing, not content."""
    return (
        records.filter(F.col("warc_type") == "response")
        .select(
            (F.col("asset_id") * 1_000_000 + F.col("rec_idx")).alias("seq"),
            F.col("uri").alias("url"),
            F.to_timestamp(F.col("warc_date")).alias("warc_ts"),
            F.lit("upsert").alias("op"),
            F.col("payload").alias("html"),
        )
    )


def to_warc_shards(df: DataFrame, url_col: str, ts_col: str,
                   payload_col: str, n_shards: int = 16,
                   gzip_members: bool = False) -> DataFrame:
    """Export sink: deterministic shard = xxhash(url) % n_shards; each
    shard muxes its rows (url-sorted, so output bytes are independent
    of partitioning) into ONE WARC blob via applyInPandas. Returns
    (shard int, warc binary)."""

    def mux(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        recs = [
            (u, pd.Timestamp(t).strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(p))
            for u, t, p in zip(pdf[url_col], pdf[ts_col], pdf[payload_col])
        ]
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "warc": [build_warc(
                                 recs, gzip_members=gzip_members)]})

    shards = df.select(
        url_col, ts_col, payload_col,
        F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_shards)).alias("shard"),
    )
    return shards.groupBy("shard").applyInPandas(
        mux, schema="shard int, warc binary"
    )
