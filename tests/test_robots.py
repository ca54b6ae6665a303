"""robots.txt parser/matcher + Spark policy gate (sources/robots.py)."""

from __future__ import annotations

from montandon_etl_spark.sources import robots as R

TXT = """
# crawler policy
User-agent: specialbot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /*.php$
Disallow:
Sitemap: https://x/sitemap.xml
"""


def test_group_selection_and_parse():
    star = R.parse_robots(TXT, agent="anybot")
    assert star == [("/private", False), ("/private/ok", True),
                    ("/*.php$", False)]
    # most specific agent group wins
    sp = R.parse_robots(TXT, agent="SpecialBot/1.0")
    assert sp == [("/", False)]
    # empty file / no groups
    assert R.parse_robots("", agent="x") == []


def test_multi_agent_group_header():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert R.parse_robots(txt, agent="b") == [("/x", False)]
    assert R.parse_robots(txt, agent="zzz") == []  # no * group


def test_matching_semantics():
    rules = [("/private", False), ("/private/ok", True)]
    assert not R.robots_allowed("/private/a", rules)
    assert R.robots_allowed("/private/ok/b", rules)  # longer allow wins
    assert R.robots_allowed("/other", rules)  # no match -> allowed
    # wildcard + anchor
    assert not R.robots_allowed("/a/b.php", [("/*.php$", False)])
    assert R.robots_allowed("/a/b.php.txt", [("/*.php$", False)])
    assert not R.robots_allowed("/a/b.php.txt", [("/*.php", False)])
    # tie -> allow wins
    assert R.robots_allowed("/dual/x", [("/dual", False), ("/dual", True)])
    # Disallow: / blocks root too
    assert not R.robots_allowed("/", [("/", False)])


def test_rule_regex_translation():
    assert R.rule_regex("/a*b$") == "^/a.*b$"
    assert R.rule_regex("/p") == "^/p"
    import re
    assert re.match(R.rule_regex("/a*b$"), "/aXXb")
    assert not re.match(R.rule_regex("/a*b$"), "/aXXbY")


def test_robots_gate_spark(spark):
    robots = spark.createDataFrame(
        [("a.com", bytearray(
            b"User-agent: *\nDisallow: /private\nAllow: /private/ok\n")),
         ("b.com", bytearray(b"User-agent: *\nDisallow: /*.php$\n"))],
        "host string, robots_txt binary")
    rules = R.build_rules(robots)
    docs = spark.createDataFrame(
        [(1, "https://a.com/private/x"), (2, "https://a.com/private/ok/y"),
         (3, "https://a.com/pub"), (4, "https://b.com/f.php"),
         (5, "https://b.com/f.phpx"), (6, "https://nobots.com/z")],
        "id bigint, url string")
    got = {r["id"]: r["allowed"]
           for r in R.robots_gate(docs, rules).collect()}
    assert got == {1: False, 2: True, 3: True, 4: False, 5: True,
                   6: True}
    # gate is a broadcast join: the corpus never shuffles
    plan = (R.robots_gate(docs, rules)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
