"""robots.txt policy gate — the crawl-politeness filter a webtext
corpus applies before anything else ships to training.

Dependency-free parser for the Robots Exclusion Protocol (RFC 9309 /
the public Google REP spec): user-agent groups, Allow/Disallow rules,
``*`` wildcards and the ``$`` end anchor, longest-match-wins with
allow winning ties, unmatched paths allowed, and a missing robots.txt
allowing everything.

Spark shape: rules are PARSED ONCE per host (``build_rules`` — a
mapInPandas over the tiny robots dimension, each rule pre-compiled to
an anchored regex string), broadcast-joined to the corpus by host,
and the longest-match decision is evaluated JVM-side with
higher-order array functions (``filter``/``transform``/
``array_max``/``exists``) over the per-host rule array — no Python in
the per-document hot path, no shuffle of the corpus (the join is a
broadcast).

Reference lineage: the reference's HTTP sources (SURVEY S1) fetch
politely; a 100-TB crawl-derived corpus must be able to re-apply the
policy at curation time (robots change after crawl; licensing sweeps
re-gate old content).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULE_SCHEMA = ("host string, rules array<struct<p: string,"
               " allow: boolean, rx: string>>")


def rule_regex(pattern: str) -> str:
    """Robots pattern → anchored regex (valid in Python re, Java
    regex, and RE2): ``*`` → ``.*``, trailing ``$`` → end anchor."""
    anchor = pattern.endswith("$")
    body = pattern[:-1] if anchor else pattern
    rx = "^" + ".*".join(re.escape(seg) for seg in body.split("*"))
    return rx + "$" if anchor else rx


def parse_robots(txt: str, agent: str = "*") -> list[tuple[str, bool]]:
    """→ ordered [(pattern, allow)] for the most specific user-agent
    group (longest group token contained in ``agent``; ``*`` as the
    fallback). Empty patterns (bare ``Disallow:``) add no rule."""
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    in_group_header = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_group_header = True
        elif key in ("allow", "disallow"):
            in_group_header = False
            if cur_agents and val:
                cur_rules.append((val, key == "allow"))
            elif cur_agents:
                pass  # empty pattern: no rule
        # other keys (sitemap, crawl-delay...) are ignored
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent_l = agent.lower()
    best: tuple[int, list[tuple[str, bool]]] | None = None
    star: list[tuple[str, bool]] | None = None
    for agents, rules in groups:
        for a in agents:
            if a == "*":
                if star is None:
                    star = rules
            elif a in agent_l:
                if best is None or len(a) > best[0]:
                    best = (len(a), rules)
    if best is not None:
        return best[1]
    return star if star is not None else []


def robots_allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Longest matching pattern wins; allow wins length ties; no
    match → allowed."""
    best_len, best_allow = -1, True
    for pat, allow in rules:
        if re.match(rule_regex(pat), path):
            ln = len(pat)
            if ln > best_len or (ln == best_len and allow):
                best_len, best_allow = ln, allow
    return best_allow if best_len >= 0 else True


def build_rules(robots_df: DataFrame, host_col: str = "host",
                txt_col: str = "robots_txt",
                agent: str = "*") -> DataFrame:
    """(host, robots bytes/text) → (host, rules array) with regexes
    pre-compiled once per host."""
    def run(it):
        for pdf in it:
            rows = []
            for h, t in zip(pdf[host_col], pdf[txt_col]):
                if isinstance(t, (bytes, bytearray)):
                    t = bytes(t).decode("utf-8", "replace")
                rules = [(p, a, rule_regex(p))
                         for p, a in parse_robots(t or "", agent)]
                rows.append((h, rules))
            yield pd.DataFrame(rows, columns=["host", "rules"])
    return robots_df.mapInPandas(run, RULE_SCHEMA)


def robots_gate(docs: DataFrame, rules_df: DataFrame,
                url_col: str = "url") -> DataFrame:
    """Annotate each doc with ``host`` and ``allowed``. Broadcast
    join by host; the longest-match decision runs JVM-side over the
    rule array (matching rules → max pattern length → any allow at
    that length). Hosts with no robots row allow everything."""
    out = docs.withColumn("host", F.parse_url(F.col(url_col), F.lit("HOST")))
    out = out.withColumn("_path", F.parse_url(F.col(url_col), F.lit("PATH")))
    out = out.join(F.broadcast(rules_df), "host", "left")
    m = "filter(rules, r -> _path rlike r.rx)"
    decide = F.expr(
        f"CASE WHEN rules IS NULL OR size({m}) = 0 THEN true ELSE "
        f"exists({m}, r -> length(r.p) = "
        f"array_max(transform({m}, r -> length(r.p))) AND r.allow) END")
    return out.withColumn("allowed", decide).drop("_path", "rules")
