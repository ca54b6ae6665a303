"""Deterministic HyperLogLog (operators/sketches.hll_*): portable
md5-prefix hash + exact BIGINT register math — the estimate must be a
pure function of the input SET (layout-, duplicate- and
NULL-insensitive), mergeable by register max, and accurate to the
standard HLL envelope."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.sketches import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _df(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, v) for v in vals], "g string, v string")


def _est(df, p=6):
    rows = hll_distinct(df, "g", "v", p=p).collect()
    assert len(rows) == 1
    return rows[0]["est_distinct"]


def test_accuracy_envelope(spark):
    # sigma = 1.04/sqrt(m); allow ~4 sigma
    for p, n, tol in ((6, 5000, 0.52), (10, 20000, 0.13)):
        est = _est(_df(spark, [f"user-{i}" for i in range(n)]), p=p)
        assert abs(est - n) / n < tol, (p, n, est)


def test_small_range_linear_counting(spark):
    # tiny cardinalities route through m*ln(m/V) and are near-exact
    for n in (1, 3, 7, 20):
        est = _est(_df(spark, [f"u{i}" for i in range(n)]), p=6)
        assert abs(est - n) <= max(1.0, 0.2 * n), (n, est)


def test_set_semantics(spark):
    base = [f"u{i}" for i in range(300)]
    e0 = _est(_df(spark, base))
    # duplicates change nothing
    assert _est(_df(spark, base * 3)) == e0
    # NULLs are ignored
    d = spark.createDataFrame(
        [("g", v) for v in base] + [("g", None)] * 5, "g string, v string")
    assert _est(d) == e0
    # partition layout changes nothing (bit-for-bit)
    assert _est(_df(spark, base).repartition(7)) == e0


def test_merge_equals_union(spark):
    a = [f"a{i}" for i in range(400)]
    b = [f"b{i}" for i in range(300)] + a[:100]  # overlap
    ra = hll_registers(_df(spark, a), "g", "v", p=6)
    rb = hll_registers(_df(spark, b), "g", "v", p=6)
    merged = sorted(tuple(r) for r in hll_merge(ra, rb, "g").collect())
    union = sorted(tuple(r) for r in hll_registers(
        _df(spark, a + b), "g", "v", p=6).collect())
    assert merged == union
    est_m = hll_estimate(hll_merge(ra, rb, "g"), "g", p=6).first()
    est_u = hll_estimate(hll_registers(
        _df(spark, a + b), "g", "v", p=6), "g", p=6).first()
    assert est_m["est_distinct"] == est_u["est_distinct"]


def test_groups_independent(spark):
    d = spark.createDataFrame(
        [("x", f"u{i}") for i in range(200)]
        + [("y", f"u{i}") for i in range(40)], "g string, v string")
    got = {r["g"]: r["est_distinct"]
           for r in hll_distinct(d, "g", "v", p=8).collect()}
    assert abs(got["x"] - 200) / 200 < 0.3
    assert abs(got["y"] - 40) / 40 < 0.3
    # each group's estimate equals its solo run (no cross-group bleed)
    assert got["x"] == _est(_df(spark, [f"u{i}" for i in range(200)]), p=8)


def test_p_validation(spark):
    with pytest.raises(ValueError, match="p must be"):
        hll_distinct(_df(spark, ["a"]), "g", "v", p=3)
