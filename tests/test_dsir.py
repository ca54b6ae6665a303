"""DSIR importance resampling: the log-ratio table must equal a pure
Python replay of the hashed-ngram model exactly (micro-snapped), the
document scores must be exact integer sums of the table, and
selection must prefer target-like documents with deterministic
ordering on any input layout."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dsir import (
    dsir_logratio, dsir_score, dsir_select)

B = 64


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip())


def _feats(text: str) -> list[int]:
    toks = _toks(text)
    feats = list(toks)
    if len(toks) >= 2:
        feats += [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    return [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B
            for s in feats]


def _py_logratio(target: list[str], raw: list[str]) -> dict[int, int]:
    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    for t in target:
        for b in _feats(t):
            tc[b] = tc.get(b, 0) + 1
    for t in raw:
        for b in _feats(t):
            rc[b] = rc.get(b, 0) + 1
    nt, nr = sum(tc.values()), sum(rc.values())
    out = {}
    for b in range(B):
        ratio = ((tc.get(b, 0) + 1) * float(nr + B)) / \
            ((rc.get(b, 0) + 1) * float(nt + B))
        out[b] = math.floor(math.log(ratio) * 1000000.0 + 0.5)
    return out


TARGET = [
    "the quick brown fox jumps over the lazy dog",
    "the fox and the dog are friends in the forest",
    "a brown dog sleeps under the old oak tree",
]
RAW = TARGET + [
    "stonks moon rocket buy now limited offer click here",
    "xyzzy plugh qwerty asdf zxcv uiop hjkl vbnm",
    "the quick dog naps near the brown fox den",
    "free spins casino jackpot bonus code winner claim",
]


def _df(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string")


def test_logratio_matches_python_replay(spark):
    got = {r["bucket"]: r["lr_micro"] for r in dsir_logratio(
        spark, _df(spark, TARGET), _df(spark, RAW),
        "doc_id", "text", B).collect()}
    want = _py_logratio(TARGET, RAW)
    assert got == want
    assert len(got) == B  # every bucket present, seen or not


def test_scores_are_exact_sums_and_layout_invariant(spark):
    lr = dsir_logratio(spark, _df(spark, TARGET), _df(spark, RAW),
                       "doc_id", "text", B)
    lr_map = {r["bucket"]: r["lr_micro"] for r in lr.collect()}
    docs = _df(spark, RAW)
    got = {r["doc_id"]: (r["n_feats"], r["lr_score"])
           for r in dsir_score(docs, "doc_id", "text", lr, B).collect()}
    for i, t in enumerate(RAW):
        fs = _feats(t)
        assert got[i] == (len(fs), sum(lr_map[b] for b in fs))
    # any partition layout → identical scores
    got2 = {r["doc_id"]: (r["n_feats"], r["lr_score"])
            for r in dsir_score(docs.repartition(7), "doc_id", "text",
                                lr, B).collect()}
    assert got2 == got


def test_select_prefers_target_like(spark):
    sel = dsir_select(spark, _df(spark, TARGET), _df(spark, RAW),
                      "doc_id", "text", B, k=4).collect()
    ids = [r["doc_id"] for r in sel]
    assert len(ids) == 4
    # the three target docs themselves + the target-like raw doc (5)
    # outrank the spam/gibberish rows
    assert set(ids) <= {0, 1, 2, 5}
    # ordering is (score desc, id asc) — deterministic
    scores = [(r["lr_score"], -r["doc_id"]) for r in sel]
    assert scores == sorted(scores, reverse=True)


def test_validation(spark):
    with pytest.raises(ValueError):
        dsir_logratio(spark, _df(spark, TARGET), _df(spark, RAW),
                      "doc_id", "text", 0)
