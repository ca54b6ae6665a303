"""Deterministic training shuffle (operators/sampling.shuffle_shards):
a pure-function-of-(id, seed) permutation — exactly-once coverage,
contiguous per-shard positions, layout invariance, seed independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.sampling import shuffle_shards


def _df(spark, n=1000):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 (F.col("id") * 7).alias("payload"))


def _triples(df):
    return sorted((r["shard"], r["pos"], r["doc_id"]) for r in df.collect())


def test_permutation_properties(spark):
    n, s = 1000, 8
    out = shuffle_shards(_df(spark, n), "doc_id", n_shards=s, seed="a")
    rows = out.collect()
    # every row exactly once, payload carried through
    assert sorted(r["doc_id"] for r in rows) == list(range(n))
    assert all(r["payload"] == r["doc_id"] * 7 for r in rows)
    # positions contiguous 1..count within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(s))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # hash-uniform balance (loose: no shard > 2x the mean)
    assert max(len(p) for p in by_shard.values()) < 2 * n / s
    # and the order genuinely decorrelates from doc_id order
    first_shard = sorted(by_shard)[0]
    ids_in_order = [r["doc_id"] for r in rows if r["shard"] == first_shard]
    assert ids_in_order != sorted(ids_in_order)


def test_layout_invariance_and_seed(spark):
    d = _df(spark, 500)
    base = _triples(shuffle_shards(d, "doc_id", 8, seed="a"))
    assert _triples(shuffle_shards(d.repartition(13), "doc_id", 8,
                                   seed="a")) == base
    other = _triples(shuffle_shards(d, "doc_id", 8, seed="b"))
    assert other != base  # a new seed is a new permutation


def test_single_shard(spark):
    out = shuffle_shards(_df(spark, 100), "doc_id", 1).collect()
    assert {r["shard"] for r in out} == {0}
    assert sorted(r["pos"] for r in out) == list(range(1, 101))


def test_validation(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(_df(spark, 10), "doc_id", 0)


def test_reserved_column_collision(spark):
    d = _df(spark, 10).withColumn("shard", F.lit(1))
    with pytest.raises(ValueError, match="already has"):
        shuffle_shards(d, "doc_id", 4)
