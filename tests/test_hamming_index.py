"""Incremental banded-Hamming fingerprint index
(operators/hamming_index.py): after any batch sequence, pairs() must
equal a one-shot banded recompute over the surviving fingerprints."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.hamming_index import HammingIndex
from montandon_etl_spark.operators.phash import image_near_dup_pairs


def _fp(rng):
    return [int(v) for v in rng.integers(0, 1 << 16, size=4)]


def _twin(fp, rng, flips=2):
    out = list(fp)
    for _ in range(flips):
        band = int(rng.integers(0, 4))
        out[band] ^= 1 << int(rng.integers(0, 16))
    return out


def _batch(spark, rows, seq0, op="upsert"):
    """rows: [(key, [b0..b3] | None)]"""
    ts = "2024-01-01 00:00:00"
    data = []
    for i, (k, fp) in enumerate(rows):
        b = fp if fp is not None else [None] * 4
        data.append((k, seq0 + i, *b))
    df = spark.createDataFrame(
        data, "url string, seq bigint, b0 int, b1 int, b2 int, b3 int")
    return df.select("url", "seq",
                     F.to_timestamp(F.lit(ts)).alias("warc_ts"),
                     F.lit(op).alias("op"), "b0", "b1", "b2", "b3")


def _oneshot(spark, idx):
    fps = (idx.fingerprints(spark)
           .withColumnRenamed(idx.key_col, "id"))
    return {(r["id_a"], r["id_b"]): r["hamming"]
            for r in image_near_dup_pairs(fps, "id",
                                          max_hamming=3).collect()}


def _indexed(spark, idx):
    return {(r["id_a"], r["id_b"]): r["hamming"]
            for r in idx.pairs(spark).collect()}


def test_incremental_equals_oneshot_through_churn(spark):
    rng = np.random.default_rng(42)
    base = tempfile.mkdtemp(prefix="hidx_")
    idx = HammingIndex.create(os.path.join(base, "i"), n_buckets=8,
                              n_pfx=16)
    fam = [_fp(rng) for _ in range(6)]
    # batch 0: originals + one undecodable (NULL bands)
    b0 = [(f"k{i}", fam[i]) for i in range(6)] + [("knull", None)]
    idx.update(spark, _batch(spark, b0, 0), batch_id=0)
    assert _indexed(spark, idx) == _oneshot(spark, idx) == {}
    # batch 1: twins arrive -> pairs appear
    b1 = [(f"t{i}", _twin(fam[i], rng)) for i in range(6)]
    idx.update(spark, _batch(spark, b1, 100), batch_id=1)
    got = _indexed(spark, idx)
    assert got == _oneshot(spark, idx)
    assert len(got) >= 5  # twins land within hamming<=3 (flips may collide)
    # batch 2: delete some originals -> their pairs retract
    b2 = [(f"k{i}", None) for i in range(0, 6, 2)]
    idx.update(spark, _batch(spark, b2, 200, op="delete"), batch_id=2)
    assert _indexed(spark, idx) == _oneshot(spark, idx)
    # batch 3: rewrite a twin to a fresh random fp -> pair disappears;
    # the previously-NULL key becomes decodable as a twin of fam[1]
    b3 = [("t1", _fp(rng)), ("knull", _twin(fam[1], rng))]
    idx.update(spark, _batch(spark, b3, 300), batch_id=3)
    got = _indexed(spark, idx)
    assert got == _oneshot(spark, idx)
    assert any("knull" in p for p in got)
    assert not any(("k1", "t1") == p or ("t1", "k1") == p for p in got)


def test_redelivery_is_noop(spark):
    rng = np.random.default_rng(7)
    base = tempfile.mkdtemp(prefix="hidx_")
    idx = HammingIndex.create(os.path.join(base, "i"), n_buckets=4,
                              n_pfx=8)
    fp = _fp(rng)
    b = [("a", fp), ("b", _twin(fp, rng))]
    idx.update(spark, _batch(spark, b, 0), batch_id=0)
    want = _indexed(spark, idx)
    vers = set(idx.store.versions())
    idx.update(spark, _batch(spark, b, 0), batch_id=0)  # redelivered
    assert set(idx.store.versions()) == vers
    assert _indexed(spark, idx) == want


def test_layout_guard():
    import json
    base = tempfile.mkdtemp(prefix="hidx_")
    HammingIndex.create(os.path.join(base, "i"))
    p = os.path.join(base, "i", "index.json")
    cfg = json.load(open(p))
    cfg["layout"] = 99
    json.dump(cfg, open(p, "w"))
    with pytest.raises(ValueError):
        HammingIndex(os.path.join(base, "i"))
