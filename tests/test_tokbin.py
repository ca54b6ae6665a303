"""Indexed token-shard export/reader (sources/tokbin.py)."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

from montandon_etl_spark.sources import tokbin as T


def test_shard_roundtrip_pure():
    base = tempfile.mkdtemp()
    p = os.path.join(base, "shard-00000")
    seqs = [(7, [1, 2, 3]), (9, []), (12, [65535, 0, 44])]
    m = T.write_shard(p, [s for s, _ in seqs], [t for _, t in seqs],
                      vocab_size=65536)
    assert m["n_seqs"] == 3 and m["n_tokens"] == 6
    assert m["bin_bytes"] == 12  # u16
    assert m["idx_bytes"] == 8 + 9 + 3 * 20
    got = [(s, list(t)) for s, t in T.read_shard(p)]
    assert got == [(7, [1, 2, 3]), (9, []), (12, [65535, 0, 44])]


def test_dtype_switches_to_i32():
    base = tempfile.mkdtemp()
    p = os.path.join(base, "shard-00001")
    m = T.write_shard(p, [1], [[70000, 3]], vocab_size=100000)
    assert m["bin_bytes"] == 8  # i32
    assert [list(t) for _, t in T.read_shard(p)] == [[70000, 3]]


def test_out_of_range_token_rejected():
    base = tempfile.mkdtemp()
    with pytest.raises(ValueError):
        T.write_shard(os.path.join(base, "s"), [1], [[70000]],
                      vocab_size=65536)
    with pytest.raises(ValueError):
        T.write_shard(os.path.join(base, "s"), [1], [[-1]],
                      vocab_size=100)


def test_bad_magic_rejected():
    base = tempfile.mkdtemp()
    p = os.path.join(base, "shard-00002")
    T.write_shard(p, [1], [[5]], vocab_size=10)
    with open(p + ".idx", "r+b") as f:
        f.write(b"XXXXXXXX")
    with pytest.raises(ValueError):
        list(T.read_shard(p))


def _tok_df(spark, n_docs=40, seed=5):
    rng = np.random.default_rng(seed)
    rows = [(i, [int(t) for t in
                 rng.integers(0, 50000, size=rng.integers(0, 30))])
            for i in range(n_docs)]
    return spark.createDataFrame(rows, "seq_id bigint, tokens array<bigint>")


def test_spark_export_read_roundtrip(spark):
    df = _tok_df(spark)
    out = tempfile.mkdtemp()
    man = T.to_token_shards(df, out, vocab_size=50000, n_shards=4)
    mrows = {r["shard"]: r for r in man.collect()}
    assert sum(r["n_seqs"] for r in mrows.values()) == 40
    back = T.read_token_shards(spark, out)
    got = {r["seq_id"]: list(r["tokens"]) for r in back.collect()}
    want = {r["seq_id"]: list(r["tokens"]) for r in df.collect()}
    assert got == want
    # within-shard order is seq_id ascending
    for r in back.collect():
        pass
    ordered = sorted(
        ((r["shard"], r["pos"], r["seq_id"]) for r in back.collect()))
    for i in range(1, len(ordered)):
        if ordered[i][0] == ordered[i - 1][0]:
            assert ordered[i][2] > ordered[i - 1][2]


def test_spark_export_byte_identical(spark):
    df = _tok_df(spark, seed=6)
    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    T.to_token_shards(df, d1, vocab_size=50000, n_shards=3).collect()
    T.to_token_shards(df, d2, vocab_size=50000, n_shards=3).collect()
    fs1 = sorted(os.listdir(d1))
    assert fs1 == sorted(os.listdir(d2))
    for f in fs1:
        with open(os.path.join(d1, f), "rb") as a, \
                open(os.path.join(d2, f), "rb") as b:
            assert a.read() == b.read(), f
