"""Unit tests for the web-curation trio: cross-document host
boilerplate removal, anchor-text aggregation, politeness frontier
scheduling. The full-corpus DuckDB parity rides test_oracle_parity;
these pin the discriminating edge behaviors on hand-built corpora."""
from __future__ import annotations

from montandon_etl_spark.operators.graph import anchor_text_agg
from montandon_etl_spark.operators.relational import frontier_schedule
from montandon_etl_spark.operators.textstats import strip_host_boilerplate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, host string, text string")


def test_boilerplate_threshold_and_min_docs(spark):
    rows = [
        # host A: 4 docs. NAV in 4/4 (100%), COOKIE in 2/4 (=50%,
        # boundary inclusive), RARE in 1/4 (25%).
        (1, "a", "NAV\nCOOKIE\nbody one"),
        (2, "a", "NAV\nCOOKIE\nbody two"),
        (3, "a", "NAV\nRARE\nbody three"),
        (4, "a", "NAV\nbody four"),
        # host B: 2 docs (< min_docs=3) — identical lines survive.
        (5, "b", "NAV\nbody five"),
        (6, "b", "NAV\nbody six"),
    ]
    out = {
        r["id"]: r
        for r in strip_host_boilerplate(
            _docs(spark, rows), "id", "host", "text",
            min_docs=3, frac_pct=50).collect()
    }
    # 50% boundary is inclusive: COOKIE (2/4) stripped alongside NAV
    assert out[1]["clean_text"] == "body one"
    assert out[1]["n_removed"] == 2 and out[1]["n_lines"] == 3
    assert out[2]["clean_text"] == "body two"
    # RARE (1/4) kept
    assert out[3]["clean_text"] == "RARE\nbody three"
    assert out[3]["n_removed"] == 1
    assert out[4]["clean_text"] == "body four"
    # host below min_docs keeps everything, even 100%-frequency lines
    assert out[5]["clean_text"] == "NAV\nbody five"
    assert out[5]["n_removed"] == 0


def test_gopher_rules_every_reason_and_boundaries(spark):
    """Each crafted page violates exactly one ordered Gopher rule;
    boundary pages sit ON a threshold and must be kept."""
    from montandon_etl_spark.operators.textstats import gopher_rules

    good = ("the quick brown fox jumps with energy and grace that "
            "dogs have to admire every single day of a long year ")
    docs = [
        (0, good * 5),                            # kept (~100 words)
        (1, "the and short"),                     # too_few_words
        (2, good * 300),                          # too_many_words
        (3, ("a be to of " * 25).strip()),        # short_words (mean 1.75)
        (4, ("incomprehensibilities " * 25).strip()),  # mean 21 long_words
        (5, good * 3 + ("## " * 30).strip()),     # symbol_ratio (hashes)
        (6, "\n".join("- " + good for _ in range(10))),   # bullet_lines
        (7, "\n".join(good + "..." for _ in range(10))),  # ellipsis? see below
        (8, ("12 345 " * 30).strip() + " the with extra padding words "
             * 5),                                 # alpha_words
        (9, ("zebra quokka wombat lynx " * 20).strip()),  # stop_words
        (10, ("abc " * 60).strip()),              # mean exactly 3 -> kept? needs stops
        (11, ("the with " + "abcdefghij " * 58).strip()),  # mean<=10 boundary
    ]
    out = {r["doc_id"]: r for r in gopher_rules(
        spark.createDataFrame(docs, "doc_id int, page string"),
        "doc_id", "page", min_words=10, max_words=1500,
    ).collect()}
    assert out[0]["kept"] and out[0]["reject_reason"] is None
    assert out[1]["reject_reason"] == "too_few_words"
    assert out[2]["reject_reason"] == "too_many_words"
    assert out[3]["reject_reason"] == "short_words"
    assert out[4]["reject_reason"] == "long_words"
    assert out[5]["reject_reason"] == "symbol_ratio"
    assert out[6]["reject_reason"] == "bullet_lines"
    # every line of page 7 ends in "...": 10*10 > 3*10
    assert out[7]["reject_reason"] == "ellipsis_lines"
    assert out[8]["reject_reason"] == "alpha_words"
    assert out[9]["reject_reason"] == "stop_words"
    # page 10: mean word length EXACTLY 3 passes the bound, but it has
    # no stop words — the LAST rule catches it (order is the contract)
    assert out[10]["reject_reason"] == "stop_words"
    assert out[10]["total_word_len"] == 3 * out[10]["n_words"]
    # page 11: 58 10-char words + 'the with' -> mean just under 10, kept
    assert out[11]["kept"], out[11]["reject_reason"]


def test_gopher_rules_counts_exact(spark):
    from montandon_etl_spark.operators.textstats import gopher_rules

    page = "the cat...\n- item one\n• item two\nplain end…\nwith # and ## done"
    r = gopher_rules(
        spark.createDataFrame([(1, page)], "doc_id int, page string"),
        "doc_id", "page", min_words=1).collect()[0]
    assert r["n_lines"] == 5
    assert r["n_bullet_lines"] == 2
    assert r["n_ellipsis_lines"] == 2  # '...' line and the '…' line
    assert r["n_hash"] == 3
    assert r["n_ellipsis"] == 1
    assert r["n_stop_words"] == 3  # 'the', 'with', 'and'


def test_boilerplate_all_boiler_doc_survives_empty(spark):
    rows = [(i, "h", "NAV\nFOOT") for i in range(1, 4)] + [
        (9, "h", "NAV\nFOOT\nreal body")]
    out = {
        r["id"]: r
        for r in strip_host_boilerplate(
            _docs(spark, rows), "id", "host", "text",
            min_docs=3, frac_pct=75).collect()
    }
    assert len(out) == 4  # nothing vanishes
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 2
    assert out[9]["clean_text"] == "real body"


def test_boilerplate_order_preserved_across_strips(spark):
    rows = [
        (1, "h", "x1\nNAV\nx2\nNAV\nx3"),
        (2, "h", "NAV\ny"),
        (3, "h", "NAV\nz"),
    ]
    out = {
        r["id"]: r
        for r in strip_host_boilerplate(
            _docs(spark, rows), "id", "host", "text",
            min_docs=3, frac_pct=100).collect()
    }
    # both NAV instances removed, original order of the rest kept
    assert out[1]["clean_text"] == "x1\nx2\nx3"
    assert out[1]["n_lines"] == 5 and out[1]["n_removed"] == 2


def test_anchor_text_tie_breaks_lexicographic(spark):
    links = spark.createDataFrame(
        [
            ("t1", "zeta"), ("t1", "zeta"),
            ("t1", "alpha"), ("t1", "alpha"),   # tie 2-2 -> alpha
            ("t1", "mid"),
            ("t2", "only"),
        ],
        "target string, anchor string")
    out = {r["target"]: r for r in
           anchor_text_agg(links, "target", "anchor").collect()}
    assert out["t1"]["n_refs"] == 5
    assert out["t1"]["n_anchors"] == 3
    assert out["t1"]["top_anchor"] == "alpha"
    assert out["t1"]["top_n"] == 2
    assert out["t2"]["top_anchor"] == "only" and out["t2"]["top_n"] == 1


def test_frontier_schedule_slots_and_delays(spark):
    urls = spark.createDataFrame(
        [
            ("h1", "http://h1/b", 5, 100),
            ("h1", "http://h1/a", 5, 100),   # prio tie -> url ASC
            ("h1", "http://h1/c", 9, 100),   # highest prio -> slot 0
            ("h2", "http://h2/x", 1, 250),
            ("h2", "http://h2/y", 0, 250),
        ],
        "host string, url string, prio int, delay_ms bigint")
    out = {r["url"]: r for r in frontier_schedule(
        urls, "host", "url", "prio", "delay_ms").collect()}
    assert out["http://h1/c"]["slot"] == 0
    assert out["http://h1/a"]["slot"] == 1
    assert out["http://h1/b"]["slot"] == 2
    assert out["http://h1/b"]["offset_ms"] == 200
    assert out["http://h2/y"]["offset_ms"] == 250


def test_fuzzy_contamination_flags_near_dups_only(spark):
    from montandon_etl_spark.operators.dedup import fuzzy_contamination

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    corpus = spark.createDataFrame(
        [
            (1, base),                       # near-dup of bench 101
            (2, base.replace("quick", "slow")),  # still near bench 101
            (3, "completely different content about spark shuffles "
                "and partition pruning at webscale with no overlap"),
        ],
        "id bigint, text string")
    bench = spark.createDataFrame(
        [(101, base + " extra"), (102, "unrelated benchmark prompt "
                                       "about arithmetic word problems")],
        "id bigint, text string")
    out = {r["id"]: r for r in fuzzy_contamination(
        corpus, bench, "id", "text", n=3, k=16, bands=4,
        jaccard_pct=50).collect()}
    assert 1 in out and out[1]["bench_id"] == 101
    assert out[1]["jacc_pct"] >= 80
    assert 3 not in out  # no shared shingles -> never a candidate
    # doc 2 shares most shingles except around the substituted word
    if 2 in out:
        assert out[2]["bench_id"] == 101


def test_fuzzy_contamination_best_match_election(spark):
    from montandon_etl_spark.operators.dedup import fuzzy_contamination

    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame([(1, t)], "id bigint, text string")
    # two IDENTICAL bench docs -> equal jaccard; smallest id must win
    bench = spark.createDataFrame(
        [(202, t), (201, t)], "id bigint, text string")
    out = fuzzy_contamination(corpus, bench, "id", "text",
                              jaccard_pct=50).collect()
    assert len(out) == 1
    assert out[0]["bench_id"] == 201 and out[0]["jacc_pct"] == 100


def test_recrawl_schedule_mean_gap_and_default(spark):
    import datetime as dt

    from montandon_etl_spark.operators.relational import recrawl_schedule

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # key 1: changes at +0s, +10s, +40s -> mean gap 20s
        (1, t0), (1, t0 + dt.timedelta(seconds=10)),
        (1, t0 + dt.timedelta(seconds=40)),
        # key 2: single observation -> default interval
        (2, t0),
    ]
    out = {r["key"]: r for r in recrawl_schedule(
        spark.createDataFrame(rows, "k bigint, ts timestamp"),
        "k", "ts", default_interval_us=3_600_000_000).collect()}
    assert out[1]["interval_us"] == 20_000_000
    assert out[1]["next_fetch_us"] == out[1]["last_us"] + 20_000_000
    assert out[2]["interval_us"] == 3_600_000_000
