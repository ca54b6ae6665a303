"""Hashed linear classifier + count-min sketch vs Python references."""

from __future__ import annotations

import hashlib
import random

import pytest

from pyspark.sql import functions as F

from montandon_etl_spark.operators.classifier import (
    feature_class_counts,
    hashed_features,
    score_hashed_linear,
    seeded_weights,
)
from montandon_etl_spark.operators.sketches import countmin_build, countmin_estimate


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_features(text: str, b: int) -> list[int]:
    # engine semantics: split(trim('')) is [''] — one empty token
    s = text.strip()
    w = s.split() if s else [""]
    out = [_h60(x) % b for x in w]
    out += [_h60(f"{w[i]}_{w[i+1]}") % b for i in range(len(w) - 1)]
    return out


def _ref_weight(bucket: int, cls: int) -> int:
    return _h60(f"wt:{bucket}:{cls}") % 1001 - 500


def _corpus(seed: int, n: int = 25) -> dict[int, str]:
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(60)]
    return {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for d in range(n)
    }


def test_features_match_reference(spark):
    docs = _corpus(5)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {}
    for r in hashed_features(df, "doc_id", "text", 512).collect():
        got.setdefault(r.doc_id, []).append(r.bucket)
    for d, t in docs.items():
        assert sorted(got.get(d, [])) == sorted(_ref_features(t, 512)), d


def test_scores_exact_and_tiebreak(spark):
    docs = _corpus(9)
    docs[100] = ""  # empty text -> one '' token, still scored
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    wts = seeded_weights(spark, 256, 3)
    out = {r.doc_id: r for r in
           score_hashed_linear(df, "doc_id", "text", wts, 256, 3).collect()}
    assert set(out) == set(docs)
    for d, t in docs.items():
        feats = _ref_features(t, 256)
        scores = [sum(_ref_weight(b, c) for b in feats) for c in range(3)]
        r = out[d]
        assert [r.score_0, r.score_1, r.score_2] == scores, d
        top = max(scores)
        assert r.label == scores.index(top)  # smallest index on ties
        assert r.margin == top - sorted(scores, reverse=True)[1]


def test_weights_broadcast_in_plan(spark):
    docs = _corpus(2)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    wts = seeded_weights(spark, 256, 2)
    plan = score_hashed_linear(df, "doc_id", "text", wts, 256, 2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # weight table never shuffles the corpus


def test_feature_class_counts(spark):
    docs = {0: "a b a", 1: "a c"}
    labels = {0: 0, 1: 1}
    df = spark.createDataFrame(
        [(d, t, labels[d]) for d, t in docs.items()],
        "doc_id long, text string, y int",
    )
    got = {(r.bucket, r.cls): r.n for r in
           feature_class_counts(df, "doc_id", "text", "y", 64).collect()}
    want: dict[tuple[int, int], int] = {}
    for d, t in docs.items():
        for b in _ref_features(t, 64):
            k = (b, labels[d])
            want[k] = want.get(k, 0) + 1
    assert got == want


# ------------------------------------------------------------- count-min ----
def _km_pos(v: str, j: int, width: int) -> int:
    return (_h60(v + "#a") + j * _h60(v + "#b")) % width


def test_countmin_never_undercounts(spark):
    rng = random.Random(13)
    vals = [rng.randint(0, 40) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = countmin_build(df, "v", depth=4, width=64)
    items = spark.createDataFrame([(v,) for v in set(vals)], "v long")
    est = {r.v: r.est for r in countmin_estimate(items, "v", sk, 4, 64).collect()}
    exact: dict[int, int] = {}
    for v in vals:
        exact[v] = exact.get(v, 0) + 1
    for v, e in exact.items():
        assert est[v] >= e, v  # one-sided error
    # the estimate equals the true min over rows of colliding mass
    for v in exact:
        want = min(
            sum(c for u, c in exact.items()
                if _km_pos(str(u), j, 64) == _km_pos(str(v), j, 64))
            for j in range(4)
        )
        assert est[v] == want, v


def test_countmin_mergeable(spark):
    a = spark.createDataFrame([(i % 7,) for i in range(100)], "v long")
    b = spark.createDataFrame([(i % 5,) for i in range(80)], "v long")
    both = a.union(b)
    merged = (
        countmin_build(a, "v", 4, 32).union(countmin_build(b, "v", 4, 32))
        .groupBy("j", "pos").agg(F.sum("cnt").alias("cnt"))
    )
    direct = countmin_build(both, "v", 4, 32)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_countmin_absent_item_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "v long")
    sk = countmin_build(df, "v", depth=4, width=1024)
    items = spark.createDataFrame([(999999,)], "v long")
    [r] = countmin_estimate(items, "v", sk, 4, 1024).collect()
    assert 0 <= r.est <= 50  # absent item: only collision mass


# ------------------------------------------------------- logistic training


def _ref_train(docs, B, epochs, lr):
    """Pure-Python replay of train_logistic: md5-prefix hashing,
    micro-snapped sigmoid residuals, exact integer margin/gradient
    sums, floor(lr*g/N + 0.5) updates, zero weights dropped."""
    import hashlib
    import math

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    feats = {}
    for d, text, _ in docs:
        ws = text.strip().split()
        fs = [h60(x) % B for x in ws]
        if len(ws) >= 2:
            fs += [h60(f"{ws[i]}_{ws[i + 1]}") % B
                   for i in range(len(ws) - 1)]
        feats[d] = fs
    w, n = {}, len(docs)
    for _ in range(epochs):
        g = {}
        for d, _, y in docs:
            zm = sum(w.get(f, 0) for f in feats[d])
            p = 1.0 / (1.0 + math.exp(-(zm / 1_000_000.0)))
            r = math.floor((p - y) * 1_000_000.0 + 0.5)
            for f in feats[d]:
                g[f] = g.get(f, 0) + r
        for f, gv in g.items():
            nw = w.get(f, 0) - math.floor(lr * gv / n + 0.5)
            if nw:
                w[f] = nw
            else:
                w.pop(f, None)
    return sorted(w.items())


_POS = ["good great fine solid clean", "great good nice steady fine",
        "fine clean good bright great", "solid good great calm fine"]
_NEG = ["bad awful broken dirty poor", "awful bad grim poor broken",
        "poor broken bad murky awful"]


def _train_df(spark):
    rows = [(i, t, 1) for i, t in enumerate(_POS)] + \
           [(100 + i, t, 0) for i, t in enumerate(_NEG)]
    return rows, spark.createDataFrame(
        rows, "doc_id bigint, text string, y bigint")


def test_train_logistic_matches_python_reference(spark):
    from montandon_etl_spark.operators.classifier import train_logistic

    rows, df = _train_df(spark)
    got = sorted((r["bucket"], r["w_micro"]) for r in train_logistic(
        df, "doc_id", "text", "y", n_buckets=64, epochs=4,
        lr=0.5).collect())
    assert got == _ref_train(rows, 64, 4, 0.5)
    assert got  # training actually produced weights


def test_train_logistic_separates_and_composes(spark):
    """Trained weights separate a separable corpus, and they plug into
    score_hashed_linear's int-weight contract (class-1 weights,
    class-0 zeros → label = margin sign)."""
    from montandon_etl_spark.operators.classifier import (
        score_hashed_linear, train_logistic)

    rows, df = _train_df(spark)
    w = train_logistic(df, "doc_id", "text", "y", n_buckets=64,
                       epochs=8, lr=1.0)
    wts = w.selectExpr("bucket", "1 AS cls", "w_micro AS wt").unionByName(
        w.selectExpr("bucket", "0 AS cls", "0 AS wt"))
    scored = score_hashed_linear(df, "doc_id", "text", wts,
                                 n_buckets=64, n_classes=2)
    got = {r["doc_id"]: r["label"] for r in scored.collect()}
    assert got == {d: y for d, _, y in rows}


def test_train_logistic_layout_invariance(spark):
    from montandon_etl_spark.operators.classifier import train_logistic

    _, df = _train_df(spark)
    base = sorted(map(tuple, train_logistic(
        df, "doc_id", "text", "y", n_buckets=64, epochs=3).collect()))
    repart = sorted(map(tuple, train_logistic(
        df.repartition(5), "doc_id", "text", "y", n_buckets=64,
        epochs=3).collect()))
    assert base == repart


def test_train_logistic_empty_raises(spark):
    from montandon_etl_spark.operators.classifier import train_logistic

    with pytest.raises(ValueError, match="empty training set"):
        train_logistic(
            spark.createDataFrame([], "doc_id bigint, text string, y bigint"),
            "doc_id", "text", "y", n_buckets=64)


def test_train_logistic_epoch_validation(spark):
    from montandon_etl_spark.operators.classifier import train_logistic

    _, df = _train_df(spark)
    with pytest.raises(ValueError, match="epochs"):
        train_logistic(df, "doc_id", "text", "y", n_buckets=64, epochs=0)


def test_train_ovr_multiclass(spark):
    """One-vs-rest training separates a 3-class corpus and each class
    column equals its standalone binary training."""
    from montandon_etl_spark.operators.classifier import (
        score_hashed_linear, train_logistic, train_logistic_ovr)

    corpora = {
        0: ["good great fine solid", "great fine good calm",
            "fine good great still"],
        1: ["bad awful poor grim", "awful bad grim murky",
            "poor awful bad bleak"],
        2: ["tables charts figures data", "charts data tables rows",
            "figures tables data cells"],
    }
    rows = [(100 * c + i, t, c) for c, ts in corpora.items()
            for i, t in enumerate(ts)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, y bigint")
    wts = train_logistic_ovr(df, "doc_id", "text", "y", n_classes=3,
                             n_buckets=64, epochs=8, lr=1.0)
    scored = score_hashed_linear(df, "doc_id", "text", wts,
                                 n_buckets=64, n_classes=3)
    got = {r["doc_id"]: r["label"] for r in scored.collect()}
    assert got == {d: y for d, _, y in rows}
    # class-c weights == the standalone binary training for class c
    solo = sorted(map(tuple, train_logistic(
        df.withColumn("_y", (F.col("y") == 2).cast("bigint")),
        "doc_id", "text", "_y", 64, epochs=8, lr=1.0).collect()))
    ovr_c2 = sorted((r["bucket"], r["wt"]) for r in
                    wts.filter(F.col("cls") == 2).collect())
    assert ovr_c2 == solo
