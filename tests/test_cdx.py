"""SURT canonicalization + CDXJ line assembly edges."""

from __future__ import annotations

from montandon_etl_spark.functions.urls import surt
from montandon_etl_spark.sources.cdx import cdx_lines, parse_cdxj_line


def test_surt_edges(spark):
    cases = [
        ("HTTPS://WWW.Example.COM:443/A/B?Q=1", "com,example)/a/b?q=1"),
        ("http://sub.Example.com:80/p/7#frag", "com,example,sub)/p/7"),
        ("https://EXAMPLE.org:8080/X", "org,example:8080)/x"),
        ("http://a.B.example.NET", "net,example,b,a)/"),
        ("http://example.com?q=1", "com,example)/?q=1"),  # empty path
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["s"] for r in df.select(surt("u").alias("s")).collect()]
    assert got == [w for _, w in cases]
    # domain contiguity: every example.com key sorts between the
    # com,example prefix bounds regardless of subdomain/path
    keys = sorted(k for k in got if k and k.startswith("com,example"))
    assert keys == [k for k in sorted(x for x in got if x)
                    if k.startswith("com,example")]


def test_cdx_line_roundtrip(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [("http://www.E.com/a", datetime(2024, 3, 5, 6, 7, 8), b"body")],
        "url string, ts timestamp, payload binary")
    r = cdx_lines(df, "url", "ts", "payload").collect()[0]
    assert r["surt_key"] == "com,e)/a"
    assert r["ts14"] == "20240305060708"
    parsed = parse_cdxj_line(r["line"])
    assert parsed["surt_key"] == "com,e)/a"
    assert parsed["ts14"] == "20240305060708"
    assert parsed["url"] == "http://www.E.com/a"
    assert parsed["length"] == 4
    assert parsed["digest"] == "sha256:" + r["digest"]
