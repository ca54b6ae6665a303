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


def test_c4_clean_rules(spark):
    """Each C4 rule pinned on a hand-built page set."""
    from montandon_etl_spark.operators.textstats import c4_clean

    pages = [
        (1, "good line here.\nshort.\nno punctuation at all\nalso fine indeed!"),
        (2, "enable javascript now please.\nreal content line here."),
        (3, "lorem ipsum dolor sit amet.\nperfectly good line."),
        (4, "brace { inside }.\ngood line either way."),
        (5, "nothing survives here\nshort."),
        (6, 'quoted line ends well."'),
        (7, "bad words appear here today.\nclean line follows after."),
    ]
    df = spark.createDataFrame(pages, "doc_id bigint, page string")
    out = {r["doc_id"]: r for r in c4_clean(
        df, "doc_id", "page", min_words=3,
        badwords=["bad words"]).collect()}
    assert out[1]["page_kept"] and out[1]["clean_text"] == \
        "good line here.\nalso fine indeed!"
    assert out[1]["n_lines_total"] == 4 and out[1]["n_lines_kept"] == 2
    # javascript drops the LINE, not the page
    assert out[2]["page_kept"] and out[2]["clean_text"] == \
        "real content line here."
    assert out[3]["reject_reason"] == "lorem_ipsum"
    assert out[4]["reject_reason"] == "curly_brace"
    assert out[5]["reject_reason"] == "too_few_lines"
    assert out[5]["n_lines_kept"] == 0
    assert out[6]["page_kept"]          # terminal quote counts
    assert out[7]["reject_reason"] == "bad_word"
    assert all(out[d]["clean_text"] is None
               for d in (3, 4, 5, 7))


def test_point_in_polygon_concave_and_blocking(spark):
    """Ray-cast correctness on a CONCAVE polygon (bbox-inside points
    outside the shape — exactly the candidates blocking lets through
    and the verify must reject), plus layout invariance."""
    from montandon_etl_spark.functions.geo import point_in_polygon_join

    # U-shape: bbox [0,4]x[0,3]; the notch (1,1)-(3,3) is OUTSIDE
    ring = [[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [3.0, 3.0], [3.0, 1.0],
            [1.0, 1.0], [1.0, 3.0], [0.0, 3.0]]
    polys = spark.createDataFrame(
        [(7, ring)], "region_id bigint, ring array<array<double>>")
    pts = [
        (1, 0.5, 2.5, True),    # left arm
        (2, 3.5, 2.5, True),    # right arm
        (3, 2.0, 0.5, True),    # base
        (4, 2.0, 2.0, False),   # inside bbox, inside the NOTCH
        (5, 2.0, 3.5, False),   # above bbox
        (6, 5.5, 0.5, False),   # beside bbox (never a candidate)
    ]
    df = spark.createDataFrame([(i, x, y) for i, x, y, _ in pts],
                               "pid bigint, px double, py double")
    got = sorted(r["pid"] for r in point_in_polygon_join(
        df, polys, "pid", "px", "py", "region_id", "ring",
        cell=1.0).collect())
    assert got == [i for i, _, _, keep in pts if keep]
    got2 = sorted(r["pid"] for r in point_in_polygon_join(
        df.repartition(5), polys, "pid", "px", "py", "region_id",
        "ring", cell=2.5).collect())
    assert got2 == got                      # cell size can't change truth


def test_write_cdx_sorted_shards_and_lookup(spark, tmp_path):
    """Sorted-shard CDX artifact: shard files are internally sorted,
    boundaries respected, cluster.idx covers every line, lookups read
    one shard, and the artifact is byte-identical on any layout."""
    import os
    from datetime import datetime, timedelta

    from montandon_etl_spark.sources.cdx import cdx_lookup, write_cdx

    rows = []
    for i in range(80):
        dom = ["alpha.com", "beta.net", "gamma.org"][i % 3]
        rows.append((f"http://www.{dom}/p/{i:03d}",
                     datetime(2024, 1, 1) + timedelta(hours=i),
                     f"body {i}".encode()))
    # two captures of the SAME url → lookup returns both, time-ordered
    rows.append(("http://www.alpha.com/p/000",
                 datetime(2024, 6, 1), b"recrawl"))
    df = spark.createDataFrame(rows, "url string, ts timestamp, payload binary")
    out = str(tmp_path / "cdx")
    bounds = ["net,beta)/", "org,gamma)/"]
    man = write_cdx(df, out, bounds)
    assert [r["shard"] for r in man] == [0, 1, 2]
    # boundaries respected + files sorted
    for r in man:
        lines = open(os.path.join(out, f"cdx-{r['shard']:05d}")
                     ).read().splitlines()
        assert lines == sorted(lines) and len(lines) == r["n_lines"]
        assert lines[0].split(" ")[0] == r["first_key"]
        assert lines[-1].split(" ")[0] == r["last_key"]
    assert sum(r["n_lines"] for r in man) == len(rows)
    assert man[0]["last_key"] < bounds[0]
    assert bounds[0] <= man[1]["first_key"] < bounds[1]
    assert man[2]["first_key"] >= bounds[1]

    hits = cdx_lookup(out, "com,alpha)/p/000")
    assert [h["ts14"] for h in hits] == ["20240101000000", "20240601000000"]
    assert cdx_lookup(out, "com,alpha)/p/999") == []

    out2 = str(tmp_path / "cdx2")
    write_cdx(df.repartition(7), out2, bounds)
    for f in os.listdir(out):
        assert open(os.path.join(out, f)).read() == \
            open(os.path.join(out2, f)).read(), f
