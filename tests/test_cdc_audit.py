"""CDC audit operators: gap audit ≡ global-sort definition on
adversarial bucket layouts, checksums detect single-row divergence,
debounce is the GREEDY kept-set (not the lag approximation)."""

from __future__ import annotations

from datetime import datetime, timedelta

from montandon_etl_spark.operators.cdc_audit import (
    bucket_checksums, debounce, sequence_gap_audit)


def _gaps(spark, seqs, n_buckets):
    df = spark.createDataFrame([(s,) for s in seqs], "seq bigint")
    return sorted((r["prev_seq"], r["next_seq"], r["n_missing"])
                  for r in sequence_gap_audit(df, "seq",
                                              n_buckets=n_buckets).collect())


def _ref_gaps(seqs):
    u = sorted(set(seqs))
    return [(a, b, b - a - 1) for a, b in zip(u, u[1:]) if b > a + 1]


def test_gap_audit_matches_global_definition_any_bucketing(spark):
    """Gaps inside buckets, across bucket boundaries, and spanning
    ENTIRELY EMPTY buckets — identical to the one-window definition at
    every n_buckets (incl. 1 bucket and more buckets than rows)."""
    seqs = [1, 2, 3, 10, 11, 500, 501, 502, 900, 2, 10]  # dups too
    want = _ref_gaps(seqs)
    for nb in (1, 2, 7, 64, 1000):
        assert _gaps(spark, seqs, nb) == want, nb


def test_gap_audit_edges(spark):
    assert _gaps(spark, [42], 8) == []          # single seq → no pairs
    assert _gaps(spark, [5, 6, 7], 8) == []     # contiguous → no gaps
    df = spark.createDataFrame([], "seq bigint")
    assert sequence_gap_audit(df, "seq").collect() == []


def test_bucket_checksums_detect_single_row_divergence(spark):
    rows = [(i, 100 + i, 1_000_000 * i) for i in range(200)]
    a = spark.createDataFrame(rows, "user_id bigint, event_id bigint, ts_us bigint")
    cs = lambda df: {r["bucket"]: (r["n_rows"], r["checksum"])
                     for r in bucket_checksums(
                         df, "user_id", ["user_id", "event_id", "ts_us"],
                         n_buckets=16).collect()}
    ca = cs(a)
    assert cs(a.repartition(9)) == ca           # layout-independent
    # one mutated row → exactly that key's bucket mismatches, with the
    # SAME n_rows (count alone would miss an update-divergence)
    rows_b = list(rows)
    rows_b[57] = (57, 100 + 57, 1_000_000 * 57 + 1)
    cb = cs(spark.createDataFrame(
        rows_b, "user_id bigint, event_id bigint, ts_us bigint"))
    diff = [b for b in ca if ca[b] != cb[b]]
    assert len(diff) == 1
    assert ca[diff[0]][0] == cb[diff[0]][0]     # counts equal, hash differs
    # one DELETED row → that bucket differs in count too
    cc = cs(spark.createDataFrame(
        rows[:57] + rows[58:], "user_id bigint, event_id bigint, ts_us bigint"))
    diff2 = [b for b in ca if ca[b] != cc[b]]
    assert len(diff2) == 1 and ca[diff2[0]][0] == cc[diff2[0]][0] + 1


def test_debounce_is_greedy_not_lag(spark):
    """Events at t=0,40,70,110 with gap 60: greedy keeps 0,70 (40 is
    suppressed so 70 measures from 0; 110 measures from 70). The lag
    approximation would keep 0 and 110 only — this pins the real
    semantics."""
    t0 = datetime(2024, 1, 1)
    rows = [(1, t0 + timedelta(minutes=m), i)
            for i, m in enumerate([0, 40, 70, 110])]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint")
    kept = sorted(r["event_id"] for r in debounce(
        df, "user_id", "ts", min_gap_us=60 * 60_000_000,
        tiebreak_col="event_id").collect())
    assert kept == [0, 2]
    # per-key independence + first-event-always
    rows += [(2, t0, 10), (2, t0 + timedelta(seconds=1), 11)]
    df2 = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_id bigint")
    kept2 = sorted(r["event_id"] for r in debounce(
        df2, "user_id", "ts", min_gap_us=60 * 60_000_000,
        tiebreak_col="event_id").collect())
    assert kept2 == [0, 2, 10]
    # tie on ts → tiebreak column decides the first kept deterministically
    rows3 = [(3, t0, 21), (3, t0, 20)]
    df3 = spark.createDataFrame(rows3, "user_id bigint, ts timestamp, event_id bigint")
    kept3 = sorted(r["event_id"] for r in debounce(
        df3, "user_id", "ts", min_gap_us=1, tiebreak_col="event_id").collect())
    assert kept3 == [20]
