"""WARC reader/writer: byte-exact round-trip (plain and gzipped),
record-not-drop on corrupt blobs, end-to-end export → re-ingest
through the CDC merge equals the direct merge."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.sources.warc import (
    build_warc,
    parse_warc,
    to_warc_shards,
    warc_records,
    warc_to_changelog,
)

RECS = [
    ("http://a.example/x", "2024-01-01T00:00:00Z", b"<p>alpha</p>"),
    ("http://b.example/y", "2024-01-02T12:30:00Z", "café ☃".encode()),
    ("http://c.example/z", "2024-01-03T23:59:59Z", b"\x00\xff binary \x1f\x8b"),
]


def test_roundtrip_plain_and_gzip():
    b = build_warc(RECS)
    for blob in (b, gzip.compress(b)):
        got = parse_warc(blob)
        assert [(r["uri"], r["date"], r["payload"]) for r in got] == RECS
        assert all(r["warc_type"] == "response" for r in got)
    # deterministic writer: same input → same bytes, ids are sha-derived
    assert build_warc(RECS) == b
    assert "urn:sha256:" in parse_warc(b)[0]["record_id"]


def test_per_record_gzip_members():
    members = b"".join(gzip.compress(build_warc([r])) for r in RECS)
    got = parse_warc(members)
    assert [(r["uri"], r["payload"]) for r in got] == [(u, p) for u, _, p in RECS]


def test_malformed_raises():
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    b = build_warc(RECS[:1])
    with pytest.raises(ValueError):
        parse_warc(b[:-2])  # trailer chopped


def test_warc_records_operator_record_not_drop(spark):
    blob = build_warc(RECS)
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(b"not a warc"))],
        "asset_id bigint, payload binary",
    )
    out = warc_records(df, "asset_id", "payload").toPandas()
    good = out[out.asset_id == 1].sort_values("rec_idx")
    assert [bytes(p) for p in good.payload] == [p for _, _, p in RECS]
    assert list(good.uri) == [u for u, _, _ in RECS]
    bad = out[out.asset_id == 2]
    assert len(bad) == 1 and bad.warc_type.isna().all()


def test_export_reingest_equals_direct_merge(spark, tmp_path):
    """documents → WARC shards → parse → changelog → MERGE must equal
    merging the rows directly: the container round-trip is invisible
    to the table."""
    from montandon_etl_spark.lake.format import Field
    from montandon_etl_spark.lake.table import SnapshotTable
    from montandon_etl_spark.streaming.pipeline import merge_microbatch

    rows = [(f"http://s.example/{i}", pd.Timestamp("2024-02-01").to_pydatetime(),
             f"<p>doc {i} é</p>".encode()) for i in range(40)]
    src = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")

    shards = to_warc_shards(src, "url", "warc_ts", "html", n_shards=4)
    assert shards.count() <= 4
    recs = warc_records(shards, "shard", "warc")
    batch = warc_to_changelog(recs)

    def mk(name):
        return SnapshotTable.create(str(tmp_path / name), n_buckets=4)

    t_warc, t_direct = mk("via_warc"), mk("direct")
    merge_microbatch(spark, t_warc, batch, batch_id=0)
    direct = src.select(
        F.monotonically_increasing_id().alias("seq"), "url", "warc_ts",
        F.lit("upsert").alias("op"), "html",
    )
    merge_microbatch(spark, t_direct, direct, batch_id=0)

    a = t_warc.read(spark).select("url", "html", "text").toPandas().sort_values("url")
    b = t_direct.read(spark).select("url", "html", "text").toPandas().sort_values("url")
    assert list(a.url) == list(b.url)
    assert [bytes(x) for x in a.html] == [bytes(x) for x in b.html]
    assert list(a.text) == list(b.text)
