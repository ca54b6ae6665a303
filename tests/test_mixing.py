"""Mixture resampling: weight semantics, determinism, layout
invariance, and expectation accuracy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.mixing import (
    HASH_SPACE, mixture_report, mixture_resample)


def _docs(spark, n=2000, parts=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("src"),
    )
    return df.repartition(parts) if parts else df


WEIGHTS = {"s0": 2.5, "s1": 0.4, "s2": 0.0, "s3": 1.0}


def test_weight_semantics(spark):
    out = mixture_resample(_docs(spark), "doc_id", "src", WEIGHTS)
    per_doc = out.groupBy("doc_id", "src").agg(
        F.count("*").alias("c"), F.max("copy_idx").alias("mx")).collect()
    for r in per_doc:
        if r.src == "s0":
            assert r.c in (2, 3)
        elif r.src == "s1":
            assert r.c == 1  # kept docs appear once
        elif r.src == "s3":
            assert r.c == 1
        assert r.mx == r.c - 1  # copy_idx is dense 0..c-1
    srcs = {r.src for r in per_doc}
    assert "s2" not in srcs  # weight 0 drops the stratum entirely
    # s1 down-samples: strictly fewer than its 500 docs survive
    n1 = sum(1 for r in per_doc if r.src == "s1")
    assert 0 < n1 < 500


def test_expectation_accuracy(spark):
    out = mixture_report(
        mixture_resample(_docs(spark, n=8000), "doc_id", "src", WEIGHTS),
        "src").collect()
    got = {r.src: r.n_rows for r in out}
    # each stratum has 2000 docs; hash-uniformity keeps realized counts
    # within a few percent of weight * 2000
    assert abs(got["s0"] - 5000) < 250
    assert abs(got["s1"] - 800) < 250
    assert got["s3"] == 2000
    assert "s2" not in got


def test_layout_invariance_and_determinism(spark):
    a = mixture_resample(_docs(spark), "doc_id", "src", WEIGHTS)
    b = mixture_resample(_docs(spark, parts=13), "doc_id", "src", WEIGHTS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_default_weight_and_validation(spark):
    out = mixture_resample(_docs(spark), "doc_id", "src", {"s0": 0.0},
                           default_weight=2.0)
    per = {r.src: r.n_rows for r in mixture_report(out, "src").collect()}
    assert "s0" not in per
    assert per["s1"] == per["s2"] == per["s3"] == 1000  # 500 docs x 2
    with pytest.raises(ValueError):
        mixture_resample(_docs(spark), "doc_id", "src", {"s0": -1.0})


def test_hash_space_grid():
    assert HASH_SPACE == 1 << 60
