"""CDC operational tooling — the audits a binlog/WAL-tail pipeline
runs continuously in production: offset-continuity (did we lose a
range of the log?), replica checksums (did two copies of the table
diverge?), and per-key debounce (rate-limit hot keys before they hit
the merge).

Reference lineage: the reference tracks per-source extraction state
and retries (apps/etl/models.py ExtractionData status fields) but has
no log-continuity or divergence audit — at one HTTP batch a day it
can eyeball failures; a 10^10-event stream cannot.

All three are deterministic integer/window programs with exact SQL
oracles; none shuffles more than once on its natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import hash60


def sequence_gap_audit(df: DataFrame, seq_col: str,
                       n_buckets: int = 64) -> DataFrame:
    """Find every hole in a sequence column: rows ``(prev_seq,
    next_seq, n_missing)`` for each adjacent PRESENT pair with
    ``next_seq > prev_seq + 1``. The CDC continuity check — a missing
    WAL/binlog offset range means silent data loss, and the exactly-
    once story is only as good as the evidence the log arrived whole.

    100-TB shape (the PPS two-phase idiom): adjacency needs a global
    sort, which must never be a single task. Rows hash into
    ``n_buckets`` contiguous RANGES of the seq domain (one 1-row
    min/max agg picks the width); in-range adjacency is a per-bucket
    window (each bucket sorts in its own task), and the ≤n_buckets
    boundary pairs are closed on the driver from the per-bucket
    min/max — collect is bounded by configuration, never rows. Output
    is identical to the global-sort definition by construction:
    every adjacent present pair is either in-bucket or a boundary
    pair, and empty buckets fold into their surrounding boundary gap.

    Duplicate seqs are collapsed first (a dup is not a gap)."""
    s = df.select(F.col(seq_col).cast("bigint").alias("s")).distinct()
    lo_hi = s.agg(F.min("s").alias("lo"), F.max("s").alias("hi")).collect()[0]
    out_schema = (f"prev_seq bigint, next_seq bigint, n_missing bigint")
    spark = df.sparkSession
    if lo_hi["lo"] is None or lo_hi["lo"] == lo_hi["hi"]:
        return spark.createDataFrame([], out_schema)
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    width = max(1, (hi - lo) // n_buckets + 1)
    b = s.withColumn("_bk", ((F.col("s") - F.lit(lo)) / F.lit(width))
                     .cast("bigint"))
    w = Window.partitionBy("_bk").orderBy("s")
    inner = (b.withColumn("_nxt", F.lead("s").over(w))
             .filter(F.col("_nxt") > F.col("s") + 1)
             .select(F.col("s").alias("prev_seq"),
                     F.col("_nxt").alias("next_seq"),
                     (F.col("_nxt") - F.col("s") - 1).alias("n_missing")))
    # boundary pairs: last seq of each non-empty bucket vs first seq of
    # the NEXT non-empty bucket — ≤ n_buckets rows, closed driver-side
    edges = sorted((r["_bk"], r["mn"], r["mx"]) for r in
                   b.groupBy("_bk").agg(F.min("s").alias("mn"),
                                        F.max("s").alias("mx")).collect())
    cross = []
    for (_, _, prev_mx), (_, nxt_mn, _) in zip(edges, edges[1:]):
        if nxt_mn > prev_mx + 1:
            cross.append((prev_mx, nxt_mn, nxt_mn - prev_mx - 1))
    if cross:
        inner = inner.unionByName(spark.createDataFrame(cross, out_schema))
    return inner


def bucket_checksums(df: DataFrame, key_col: str, encode_cols: list[str],
                     n_buckets: int = 32) -> DataFrame:
    """Merkle-style per-bucket content checksums: ``(bucket, n_rows,
    checksum)`` where ``checksum = bit_xor(hash60(encoding))`` over the
    rows hashing into the bucket. Two replicas of a table (primary vs
    DR copy, pre- vs post-migration) compare by exchanging ≤n_buckets
    rows instead of data; a mismatched bucket narrows the diff to
    1/n_buckets of the keyspace — recurse with a finer n_buckets to
    binary-search the divergent keys.

    XOR (not SUM) because it is order-independent AND overflow-free at
    any row count; hash60's md5-prefix keeps the checksum
    engine-portable so a DuckDB/Spark pair agree bit-for-bit. The
    encoding is an explicit length-safe concat of the caller's columns
    (cast to string with '|' separators) — callers must pick columns
    with engine-stable string forms (ints, strings, unix_micros of
    timestamps; NOT raw doubles).

    One scan + one groupBy on the bucket — the minimal shape."""
    enc = F.concat_ws("|", *[F.col(c).cast("string") for c in encode_cols])
    return (df.select(
        F.pmod(hash60(F.col(key_col).cast("string")),
               F.lit(n_buckets)).alias("bucket"),
        hash60(enc).alias("_h"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.bit_xor("_h").alias("checksum")))


def debounce(df: DataFrame, key_col: str, ts_col: str,
             min_gap_us: int, tiebreak_col: str) -> DataFrame:
    """Greedy per-key debounce: keep a key's first event, then each
    event at least ``min_gap_us`` after the PREVIOUS KEPT one — the
    rate limiter in front of a merge when hot keys flap (a page
    re-crawled every few seconds carries no new information at
    6-hour-grain freshness SLAs).

    Greedy-kept is inherently sequential per key (whether an event
    survives depends on which earlier events survived — not
    expressible as lag/window over raw rows), so this is Arrow-batched
    ``applyInPandas`` per key: one shuffle on the key, then a linear
    integer scan per group. Order inside a key is (ts, tiebreak) —
    pass the event id for full determinism; a DuckDB recursive CTE
    replays the same scan exactly (integer microsecond compares).

    Returns the kept rows' ``(key, tiebreak, ts)``."""
    if min_gap_us <= 0:
        raise ValueError("debounce: min_gap_us must be positive")
    import pandas as pd

    k, o, t = key_col, tiebreak_col, ts_col

    def keep(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_us", o], kind="mergesort")
        us = pdf["_us"].to_numpy()
        mask = [False] * len(us)
        last = None
        for i, u in enumerate(us):
            if last is None or u >= last + min_gap_us:
                mask[i] = True
                last = u
        return pdf.loc[mask, [k, o, t]]

    src = df.select(
        k, o, F.col(t).cast("timestamp").alias(t),
        F.unix_micros(F.col(t).cast("timestamp")).alias("_us"))
    out_schema = src.select(k, o, t).schema
    return src.groupBy(k).applyInPandas(keep, schema=out_schema)
