"""WET / WAT derived formats — Common Crawl's extraction sidecars
(public layout: commoncrawl.org "Web Archive Transformation" docs).
A crawl pipeline ships three artifact families per segment: WARC (raw
responses — sources/warc.py), WET (WARC-framed ``conversion`` records
whose payload is the extracted plain text), and WAT (WARC-framed
``metadata`` records whose payload is a JSON envelope of per-page
metadata: headers, title, outgoing links). This module writes and
reads both sidecars on the same dependency-free WARC framing.

Determinism contract (the same re-export-byte-identical policy as
``build_warc``): record ids derive from sha-256 of (uri, date,
payload); WET records carry ``WARC-Refers-To`` pointing at the
ORIGINAL response record's sha-derived id, so lineage from text back
to raw bytes survives the format hop; WAT JSON is serialized with
sorted keys and fixed separators. No clocks, no uuids anywhere —
shards are byte-identical on any partition layout (rows are url-sorted
inside each shard).

100-TB shape: sharding is one hash shuffle (xxhash(url) % n_shards),
muxing is Arrow ``applyInPandas`` per shard; metadata extraction is
pure per-row regex inside the same pass — no second shuffle. Parsing
reuses ``warc_records``' mapInPandas (one row per record, corrupt
blobs yield a NULL row, record-not-drop).

Reference analogue: the reference emits one transformed document per
event (apps/etl/transform.py) with no derived-artifact story; WET/WAT
is what that step becomes when the corpus is Common-Crawl-shaped.
"""

from __future__ import annotations

import hashlib
import json
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"

_TITLE_RE = re.compile(rb"<title[^>]*>(.*?)</title>",
                       re.IGNORECASE | re.DOTALL)
_LINK_RE = re.compile(rb"""(?:href|src)\s*=\s*["']([^"']*)["']""",
                      re.IGNORECASE)


def response_record_id(uri: str, date: str, payload: bytes) -> str:
    """The sha-derived WARC-Record-ID ``build_warc`` would stamp on the
    original response record — the WET/WAT ``WARC-Refers-To`` target."""
    digest = hashlib.sha256(
        uri.encode() + b"|" + date.encode() + b"|" + payload).hexdigest()
    return f"<urn:sha256:{digest}>"


def _build_derived(records, warc_type: str, content_type: str,
                   gzip_members: bool = False) -> bytes:
    """records: (uri, date, refers_to, payload bytes). WARC framing
    with the derived-record headers; record ids sha-derived like
    ``build_warc`` (deterministic re-exports)."""
    out = []
    for uri, date, refers, payload in records:
        digest = hashlib.sha256(
            uri.encode() + b"|" + date.encode() + b"|" + payload).hexdigest()
        headers = (
            b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + warc_type.encode() + _CRLF
            + b"WARC-Record-ID: <urn:sha256:" + digest.encode() + b">"
            + _CRLF
            + b"WARC-Refers-To: " + refers.encode() + _CRLF
            + b"WARC-Date: " + date.encode() + _CRLF
            + b"WARC-Target-URI: " + uri.encode() + _CRLF
            + b"Content-Type: " + content_type.encode() + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
        )
        rec = headers + _CRLF + payload + _CRLF + _CRLF
        if gzip_members:
            from montandon_etl_spark.sources.warc import gz_member
            rec = gz_member(rec)
        out.append(rec)
    return b"".join(out)


def build_wet(records, gzip_members: bool = False) -> bytes:
    """records: (uri, date, refers_to, text str) → WET bytes
    (``conversion`` records, text/plain payloads). ``gzip_members``:
    one deterministic gzip member per record (the .wet.gz layout)."""
    return _build_derived(
        [(u, d, r, t.encode("utf-8")) for u, d, r, t in records],
        "conversion", "text/plain", gzip_members=gzip_members)


def html_meta(html: bytes) -> dict:
    """Deterministic page metadata for the WAT envelope: first
    ``<title>`` text (utf-8, surrounding whitespace stripped) and every
    href/src link IN DOCUMENT ORDER (duplicates kept — the Common
    Crawl WAT convention; consumers dedup)."""
    m = _TITLE_RE.search(html)
    title = m.group(1).decode("utf-8", "replace").strip() if m else None
    links = [x.decode("utf-8", "replace") for x in _LINK_RE.findall(html)]
    return {"title": title, "links": links}


def wat_envelope(uri: str, date: str, refers_to: str, meta: dict) -> str:
    """Canonical WAT JSON (sorted keys, fixed separators — byte-stable
    across processes)."""
    env = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Date": date,
                "WARC-Refers-To": refers_to,
                "WARC-Target-URI": uri,
            },
            "Payload-Metadata": {
                "HTML-Metadata": {
                    "Head": {"Title": meta["title"]},
                    "Links": [{"url": u} for u in meta["links"]],
                },
            },
        },
    }
    return json.dumps(env, sort_keys=True, separators=(",", ":"))


def _shard_mux(df: DataFrame, url_col: str, n_shards: int, mux,
               out_col: str) -> DataFrame:
    shards = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_shards)))
    return shards.groupBy("shard").applyInPandas(
        mux, schema=f"shard int, {out_col} binary")


def to_wet_shards(df: DataFrame, url_col: str, date_col: str,
                  text_col: str, refers_col: str,
                  n_shards: int = 16) -> DataFrame:
    """(shard, wet binary): url-sorted conversion records per shard.
    ``date_col`` is the ISO-8601 STRING the original record was stamped
    with (strings, not timestamps, so the bytes can't drift through a
    session timezone)."""

    def mux(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        recs = list(zip(pdf[url_col], pdf[date_col], pdf[refers_col],
                        pdf[text_col]))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "wet": [build_wet(recs)]})

    return _shard_mux(df.select(url_col, date_col, text_col, refers_col),
                      url_col, n_shards, mux, "wet")


def to_wat_shards(df: DataFrame, url_col: str, date_col: str,
                  html_col: str, refers_col: str,
                  n_shards: int = 16) -> DataFrame:
    """(shard, wat binary): url-sorted metadata records per shard,
    payload = the canonical JSON envelope over ``html_meta`` of the raw
    page bytes. Extraction happens inside the mux pass — one shuffle
    total."""

    def mux(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(url_col, kind="mergesort")
        recs = []
        for u, d, r, h in zip(pdf[url_col], pdf[date_col],
                              pdf[refers_col], pdf[html_col]):
            env = wat_envelope(u, d, r, html_meta(bytes(h)))
            recs.append((u, d, r, env.encode("utf-8")))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "wat": [_build_derived(recs, "metadata",
                                                    "application/json")]})

    return _shard_mux(df.select(url_col, date_col, html_col, refers_col),
                      url_col, n_shards, mux, "wat")
