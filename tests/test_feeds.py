"""Sitemap / RSS / Atom discovery sources (sources/feeds.py)."""

from __future__ import annotations

import pytest

from montandon_etl_spark.sources.feeds import (
    _rfc822_to_us,
    _w3c_to_us,
    build_atom,
    build_rss,
    build_sitemap,
    feed_entries,
    parse_feed,
    parse_sitemap,
    sitemap_entries,
)


def test_w3c_dates():
    assert _w3c_to_us("2024-01-02") == 1704153600000000
    assert _w3c_to_us("2024-01-02T03:04:05Z") == 1704164645000000
    assert _w3c_to_us("2024-01-02T03:04:05+01:00") == 1704161045000000
    assert _w3c_to_us("2024-01-02T03:04:05") == 1704164645000000  # naive=UTC
    assert _w3c_to_us("not a date") is None
    assert _w3c_to_us(None) is None


def test_rfc822_dates():
    assert _rfc822_to_us("Tue, 02 Jan 2024 03:04:05 GMT") == 1704164645000000
    assert _rfc822_to_us("Tue, 02 Jan 2024 03:04:05 +0100") == 1704161045000000
    assert _rfc822_to_us("garbage") is None


def test_parse_sitemap_urlset_roundtrip():
    sm = build_sitemap([
        {"loc": "https://a/1", "lastmod": "2024-01-02",
         "changefreq": "daily", "priority": "0.8"},
        {"loc": "https://a/2"},
    ])
    got = parse_sitemap(sm)
    assert [e["kind"] for e in got] == ["url", "url"]
    assert got[0]["loc"] == "https://a/1"
    assert got[0]["lastmod_us"] == 1704153600000000
    assert got[0]["changefreq"] == "daily" and got[0]["priority"] == 0.8
    assert got[1]["lastmod_raw"] is None and got[1]["priority"] is None


def test_parse_sitemap_index_and_namespace_sins():
    idx = build_sitemap([{"loc": "https://a/sm1.xml",
                          "lastmod": "2024-02-03T04:05:06Z"}], index=True)
    got = parse_sitemap(idx)
    assert got[0]["kind"] == "sitemap"
    assert got[0]["lastmod_us"] == _w3c_to_us("2024-02-03T04:05:06Z")
    # namespace-less sitemap still parses (local-name matching)
    bare = b"<urlset><url><loc>https://b/x</loc></url></urlset>"
    assert parse_sitemap(bare)[0]["loc"] == "https://b/x"
    with pytest.raises(ValueError, match="not a sitemap"):
        parse_sitemap(b"<html></html>")


def test_parse_rss():
    rss = build_rss([
        {"title": "post one", "link": "https://b/p1", "guid": "g1",
         "pubDate": "Tue, 02 Jan 2024 03:04:05 GMT",
         "description": "first"},
        {"title": "post two", "link": "https://b/p2"},
    ])
    got = parse_feed(rss)
    assert [e["feed_kind"] for e in got] == ["rss", "rss"]
    assert got[0]["published_us"] == 1704164645000000
    assert got[0]["entry_id"] == "g1" and got[0]["summary"] == "first"
    assert got[1]["published_raw"] is None


def test_parse_atom_link_selection_and_date_fallback():
    atom = build_atom([
        {"title": "e1", "self": "https://c/self", "link": "https://c/e1",
         "id": "tag:1", "published": "2024-01-02T03:04:05Z",
         "summary": "s1"},
        # no published -> fall back to updated; only a self link
        {"title": "e2", "self": "https://c/self2", "id": "tag:2"},
    ])
    # inject an <updated> into the second entry
    atom = atom.replace(b"<id>tag:2</id>",
                        b"<id>tag:2</id><updated>2024-03-04</updated>")
    got = parse_feed(atom)
    assert got[0]["link"] == "https://c/e1"  # alternate beats self
    assert got[0]["published_us"] == _w3c_to_us("2024-01-02T03:04:05Z")
    assert got[1]["link"] == "https://c/self2"  # only link wins
    assert got[1]["published_us"] == _w3c_to_us("2024-03-04")
    with pytest.raises(ValueError, match="not a feed"):
        parse_feed(b"<urlset></urlset>")


def test_spark_layers_record_not_drop(spark):
    sm_blobs = [(0, build_sitemap([{"loc": f"https://s/{i}"}
                                   for i in range(3)])),
                (1, b"<broken")]
    fd_blobs = [(0, build_rss([{"title": "x", "link": "https://f/x"}])),
                (1, build_atom([{"title": "y", "link": "https://f/y"}])),
                (2, b"not xml")]
    sm = sitemap_entries(
        spark.createDataFrame(sm_blobs, "asset_id bigint, payload binary"),
        "asset_id", "payload").collect()
    assert sorted(r.loc for r in sm if r.entry_idx is not None) == \
        [f"https://s/{i}" for i in range(3)]
    assert [r.asset_id for r in sm if r.entry_idx is None] == [1]
    fe = feed_entries(
        spark.createDataFrame(fd_blobs, "asset_id bigint, payload binary"),
        "asset_id", "payload").collect()
    kinds = {r.asset_id: r.feed_kind for r in fe if r.entry_idx is not None}
    assert kinds == {0: "rss", 1: "atom"}
    assert [r.asset_id for r in fe if r.entry_idx is None] == [2]
