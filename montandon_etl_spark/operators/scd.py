"""CDC history shapes: SCD2 validity intervals, Kafka-style log
compaction, and per-column churn statistics.

A CDC engine's downstream consumers want three standard reshapes of a
change stream beyond latest-state LWW: the full *history* as validity
intervals (slowly-changing-dimension type 2 — the warehouse join shape
for "value as of time T"), the *minimal equivalent changelog* (log
compaction — what Kafka's cleaner produces, and what bounds replay
cost for a new consumer), and *which columns actually change* (drives
column-family layout and delta encodings at 100 TB).

All three are per-key window programs: partitioned by the CDC key,
ordered by the CDC ordering tuple — the one shape where a window is
the minimum possible work, because per-key ordering IS the semantics.
No global sort, no driver state; keys parallelize freely.

Reference lineage: the reference keeps per-item revision chains and
latest-pointer updates (apps/etl/load/items.py upsert + revision
bookkeeping); these operators are the corpus-level reshapes of that
same ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def scd2_history(df: DataFrame, keys, order_cols,
                 op_col: str | None = None,
                 delete_ops: tuple = ("delete",)) -> DataFrame:
    """Materialize a change stream as SCD2 validity intervals: per
    key, event k's payload is valid from its own ordering position
    until the NEXT event's (half-open), the last surviving version has
    ``valid_to`` NULL and ``is_current`` true, and ``version`` counts
    1..n in change order. If ``op_col`` is given, rows whose op is in
    ``delete_ops`` are tombstones: they close the previous version's
    interval (they participate in the lead) but emit no row — so a
    deleted key's history ends with a closed interval and no current
    row.

    ``valid_from``/``valid_to`` are the FIRST ordering column's values
    (the event timestamp in the common case); the full ordering tuple
    still decides sequence for ties.
    """
    keys, order_cols = _norm(keys), _norm(order_cols)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in order_cols])
    ts = order_cols[0]
    out = df.select(
        "*",
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )
    if op_col is not None:
        out = out.where(~F.col(op_col).isin(*delete_ops))
    return out.withColumn("is_current", F.col("valid_to").isNull())


def compact_changelog(df: DataFrame, keys, order_cols,
                      op_col: str | None = None,
                      retain_tombstones: bool = True) -> DataFrame:
    """Kafka-style log compaction: the minimal changelog whose replay
    produces the same final table state as replaying the full log —
    the single latest event per key, INCLUDING a trailing delete
    (tombstone) when ``retain_tombstones`` (dropping it changes
    replay-into-nonempty-state semantics, exactly as Kafka's
    ``delete.retention.ms`` horizon does; ``False`` models the
    post-horizon cleaning pass).

    One max_by reduce per key (map-side combinable aggregate, no
    window sort): the same plan shape as ``lww.lww_latest`` but
    op-preserving, which is what makes the output a *changelog* rather
    than a *state*. Replay equivalence is pinned by test against the
    lake's MERGE.
    """
    keys, order_cols = _norm(keys), _norm(order_cols)
    payload = [c for c in df.columns if c not in keys]
    win = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order_cols])).alias("_w")
    out = df.groupBy(*keys).agg(win).select(
        *keys, *[F.col("_w")[c].alias(c) for c in payload])
    if op_col is not None and not retain_tombstones:
        out = out.where(~(F.col(op_col) == F.lit("delete")))
    return out


def column_churn(df: DataFrame, keys, order_cols,
                 value_cols: list[str]) -> DataFrame:
    """Per-column change-frequency statistics over consecutive
    revisions of each key: for every column, how many key-adjacent
    event pairs changed it (null-safe compare), out of how many
    transitions total, as an exact integer percent (truncating div).
    Returns one row per column: (col_name, n_transitions, n_changes,
    churn_pct).

    Shape: ONE per-key window pass computing all columns' lag-compare
    flags, then a single global rollup of <=|value_cols| counters
    (map-side combined to one row per partition) unpivoted with
    ``stack`` — no per-column scans, no join.
    """
    keys, order_cols = _norm(keys), _norm(order_cols)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).asc() for c in order_cols])
    flags = df.select(
        F.when(F.lag(order_cols[0]).over(w).isNull(), None)
        .otherwise(F.lit(1)).alias("_trans"),
        *[(~F.col(c).eqNullSafe(F.lag(c).over(w))).cast("int")
          .alias(f"_chg_{c}") for c in value_cols],
    )
    aggs = [F.count("_trans").alias("_n_trans")] + [
        F.sum(F.when(F.col("_trans").isNotNull(),
                     F.col(f"_chg_{c}")).otherwise(F.lit(0)))
        .alias(f"_n_{c}") for c in value_cols
    ]
    tot = flags.agg(*aggs)
    stack = ", ".join(f"'{c}', _n_{c}" for c in value_cols)
    return tot.select(
        F.expr(f"stack({len(value_cols)}, {stack})"
               " AS (col_name, n_changes)"),
        F.col("_n_trans").alias("n_transitions"),
    ).select(
        "col_name", "n_transitions", F.col("n_changes").cast("bigint")
        .alias("n_changes"),
        F.expr("(100 * n_changes) div n_transitions").alias("churn_pct"),
    )


def temporal_join(facts: DataFrame, history: DataFrame,
                  key_col: str, ts_col: str,
                  valid_from: str = "valid_from",
                  valid_to: str = "valid_to",
                  how: str = "inner") -> DataFrame:
    """Point-in-time enrichment: join each fact row to the ONE
    dimension version whose SCD2 validity interval contains the fact's
    timestamp (``valid_from <= ts < valid_to``, open-ended current
    versions match everything after their start). Facts before the
    key's first version (or inside a deletion hole) match nothing —
    dropped under ``inner``, NULL-padded under ``left``.

    Shape: an EQUI-join on the key followed by the interval predicate
    — never a range/cross join, because a key's version count is small
    (its revision history), so the per-key fan-in is bounded and the
    filter prunes it to exactly one row. This is the join shape
    warehouses call "AS OF": at 10^10 facts it is one shuffle (or a
    broadcast when the dimension history fits), same cost as any
    equi-join on the key.
    """
    f = facts.alias("f")
    h = history.alias("h")
    ts = F.col(f"f.{ts_col}")
    cond = (
        (F.col(f"f.{key_col}") == F.col(f"h.{key_col}"))
        & (F.col(f"h.{valid_from}") <= ts)
        & (F.col(f"h.{valid_to}").isNull()
           | (ts < F.col(f"h.{valid_to}")))
    )
    out = f.join(h, cond, how)
    keep = [F.col(f"f.{c}") for c in facts.columns] + [
        F.col(f"h.{c}").alias(f"dim_{c}")
        for c in history.columns if c != key_col
    ]
    return out.select(*keep)
