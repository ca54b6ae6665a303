"""dup_spans / strip_dup_spans vs a brute-force Python reference."""

from __future__ import annotations

import random

import pytest

from montandon_etl_spark.operators.spans import dup_spans, strip_dup_spans


def _ref_spans(docs: dict[int, str], k: int, min_count: int = 2):
    """Brute-force: hash every k-window, count corpus-wide, merge
    duplicated windows whose coverage is contiguous (gap <= k)."""
    toks = {d: t.strip().split() for d, t in docs.items()}
    counts: dict[str, int] = {}
    wins: dict[int, list[int]] = {}
    for d, w in toks.items():
        wins[d] = []
        for i in range(len(w) - k + 1):
            g = " ".join(w[i : i + k])
            counts[g] = counts.get(g, 0) + 1
            wins[d].append(i + 1)  # 1-based
    spans = []
    for d, w in toks.items():
        dup = [
            p for p in wins[d] if counts[" ".join(w[p - 1 : p - 1 + k])] >= min_count
        ]
        cur = None
        for p in dup:
            if cur is None or p - cur[1] > k:
                if cur:
                    spans.append((d, cur[0], cur[1] + k - 1, len(cur[2])))
                cur = [p, p, [p]]
            else:
                cur[1] = p
                cur[2].append(p)
        if cur:
            spans.append((d, cur[0], cur[1] + k - 1, len(cur[2])))
    return sorted(spans)


def _ref_strip(docs: dict[int, str], k: int):
    spans = _ref_spans(docs, k)
    out = {}
    for d, t in docs.items():
        w = t.strip().split()
        covered = set()
        for sd, s, e, _ in spans:
            if sd == d:
                covered.update(range(s, e + 1))
        kept = [tok for i, tok in enumerate(w, start=1) if i not in covered]
        out[d] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


def _corpus(seed: int, n_docs: int = 30) -> dict[int, str]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    boiler = " ".join(rng.choice(vocab) for _ in range(12))
    short = " ".join(rng.choice(vocab) for _ in range(6))
    docs = {}
    for d in range(n_docs):
        parts = [rng.choice(vocab) for _ in range(rng.randint(2, 25))]
        if rng.random() < 0.5:
            parts.insert(rng.randint(0, len(parts)), boiler)
        if rng.random() < 0.3:
            parts.append(short)  # below k: never a span by itself
        if rng.random() < 0.2:
            parts += parts[:10]  # self-repeat inside one doc
        docs[d] = " ".join(parts)
    return docs


@pytest.mark.parametrize("seed", [7, 21])
def test_spans_match_reference(spark, seed):
    docs = _corpus(seed)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in dup_spans(df, "doc_id", "text", k=8).collect()
    )
    assert got == _ref_spans(docs, 8)


def test_span_len_consistent(spark):
    docs = _corpus(3)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    for r in dup_spans(df, "doc_id", "text", k=8).collect():
        assert r.span_len == r.span_end - r.span_start + 1
        assert r.span_len >= 8
        # n_windows of a maximal contiguous span is bounded by its length
        assert 1 <= r.n_windows <= r.span_len - 8 + 1


def test_strip_matches_reference(spark):
    docs = _corpus(11)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in strip_dup_spans(df, "doc_id", "text", k=8).collect()
    }
    assert got == _ref_strip(docs, 8)


def test_short_docs_never_span(spark):
    docs = {0: "a b c", 1: "a b c", 2: "a b c d e f g"}  # all < k=8 tokens
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    assert dup_spans(df, "doc_id", "text", k=8).count() == 0
    st = {r.doc_id: r for r in strip_dup_spans(df, "doc_id", "text", k=8).collect()}
    assert st[0].clean_text == "a b c" and st[0].n_removed == 0


def test_self_repeat_counts(spark):
    base = " ".join(f"t{i}" for i in range(10))
    docs = {0: base + " x y z " + base}  # one doc, phrase repeated
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    spans = dup_spans(df, "doc_id", "text", k=8).collect()
    assert len(spans) == 2  # both copies flagged
    assert {(s.span_start, s.span_end) for s in spans} == {(1, 10), (14, 23)}
