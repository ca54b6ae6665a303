"""Relational operators from the reference's inventory (SURVEY.md §2),
re-expressed as composable DataFrame functions.

Each function cites the reference operator it generalizes. All are
built-in-expression compositions — Catalyst gets full pushdown /
pruning / join-selection freedom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validation_gate(df: DataFrame, rules: list[tuple[str, F.Column]]) -> DataFrame:
    """Record-not-drop validation (reference keeps failed rows with a
    reason — apps/etl/models.py:82-85, extract.py:41-52): evaluate
    ordered (name, predicate) rules; add ``valid`` and the first
    failing rule's name as ``fail_reason``."""
    fail = F.lit(None).cast("string")
    for name, pred in reversed(rules):
        fail = F.when(~pred, F.lit(name)).otherwise(fail)
    return df.withColumn("fail_reason", fail).withColumn(
        "valid", F.col("fail_reason").isNull()
    )


def try_int(col) -> F.Column:
    """Null-coalescing int coercion: None/'-'/garbage → NULL
    (reference get_as_int, extraction/sources/gdacs/extract.py:33-38)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "-", F.lit(None)).otherwise(c).try_cast("bigint")


def priority_fallback_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, str, list[str]]],
    fact_keys: list[str],
) -> DataFrame:
    """First-applicable-of-N-levels join (reference joins records to
    admin level2→level1→level0 shapefiles and keeps the first hit,
    transform/sources/desinventar.py:98-127).

    ``dims`` = [(dim_df, priority_name, dim_keys)] in priority order.
    Implemented as a union of priority-tagged dims + one equi-join +
    min-priority winner — one broadcastable join instead of N
    sequential left joins.
    """
    tagged = None
    for prio, (dim, name, keys) in enumerate(dims):
        d = dim.select(
            *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
            F.lit(prio).alias("_prio"),
            F.lit(name).alias("match_level"),
        )
        tagged = d if tagged is None else tagged.unionByName(d)
    # resolve the winning priority per key on the (small) dim side, so
    # the fact side sees exactly one match — no fact-side window needed
    kcols = [f"_k{i}" for i in range(len(fact_keys))]
    winners = (
        tagged.groupBy(*kcols)
        .agg(F.min_by(F.col("match_level"), F.col("_prio")).alias("match_level"))
    )
    cond = None
    for i, fk in enumerate(fact_keys):
        c = fact[fk] == winners[f"_k{i}"]
        cond = c if cond is None else cond & c
    return fact.join(F.broadcast(winners), cond, "left").drop(*kcols)


def top_k_per_group(
    df: DataFrame, keys: list[str], order_col: str, k: int, tiebreak: str
) -> DataFrame:
    """Top-k per group via row_number window; Spark 4 rewrites the
    rank filter into WindowGroupLimit (partial top-k below the
    shuffle), so this holds at 100× data."""
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.asc(tiebreak))
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def incremental_window(
    df: DataFrame, ts_col: str, days: int = 1
) -> DataFrame:
    """Data-derived incremental scan window: rows within ``days`` of
    the max timestamp *in the data* — the replayable version of the
    reference's wall-clock yesterday→today URL window
    (apps/etl/etl_tasks/gdacs.py:33-35).

    The max-ts aggregate is a 1-row broadcast cross-joined against the
    scan — ONE Spark plan (no driver-side .collect() splitting it into
    two jobs), so AQE can reuse the exchange and the whole thing
    submits as a single action."""
    hi = df.agg(F.max(ts_col).alias("_hi"))
    return (
        df.join(F.broadcast(hi))
        .filter(F.col(ts_col) >= F.col("_hi") - F.expr(f"INTERVAL {days} DAYS"))
        .drop("_hi")
    )


def sessionize(
    df: DataFrame, key: str, ts_col: str, gap_minutes: int = 30,
    tiebreak: str | None = None,
) -> DataFrame:
    """Sessionization: new session when the gap to the previous event
    exceeds the threshold; session id = count of boundaries so far.
    Two stacked windows over the same (key, ts) partitioning — a
    single shuffle. ``tiebreak`` makes equal-ts ordering deterministic.
    Gap math in integer microseconds (portable to the SQL oracle)."""
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # cast handles TIMESTAMP_NTZ parquet columns (session tz is UTC)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    return df.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_new")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: each left row picks the LATEST right row with the
    same keys and ``right.ts <= left.ts`` (the temporal lookup Spark
    lacks as a builtin; reference-shaped use: enrich a change event
    with the most recent prior state).

    Plan: union the two sides tagged, one window over (keys, ts, side)
    with ``last(value, ignorenulls)`` carrying right values forward —
    a SINGLE shuffle on the keys, no range-join explosion, no
    per-row probe. This is the standard scalable as-of shape: cost is
    one sort-shuffle of |L|+|R|, independent of time-gap skew.
    ``tiebreak`` orders equal timestamps deterministically; right rows
    sort before left rows at the same (ts, tiebreak) so a same-instant
    right row IS visible to the left row (<=, not <).
    """
    lcols = list(left.columns)
    rtypes = dict(right.dtypes)
    # the carried right payload is ONE struct so a row's values can
    # never mix with an older right row's values through column-wise
    # null skipping
    r_struct_ddl = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in right_cols) + ">"
    tagged_l = left.select(
        *lcols, F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_ddl).alias("_r"),
    )
    ltypes = dict(left.dtypes)
    tagged_r = right.select(
        *keys, F.col(ts_col),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols
          if c not in keys and c != ts_col],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    order = [F.col(ts_col), F.col("_side")] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_l.unionByName(tagged_r).withColumn(
        "_r", F.last("_r", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("_side") == 1)
        .select(*lcols, *[F.col(f"_r.{c}").alias(c) for c in right_cols])
    )


def heavy_hitters(
    df: DataFrame, key_expr: F.Column, k: int = 10, alias: str = "key"
) -> DataFrame:
    """Top-k hottest keys with share of total — the skew probe a CDC
    operator runs before choosing a salting strategy (the engine's
    salted LWW exists because of exactly these keys). One map-side
    combinable count, then orderBy+limit — Spark plans that as
    TakeOrderedAndProject (per-partition partial top-k, k rows to the
    driver side), NOT a global sort; the rank window runs over k rows
    only. No unpartitioned window over the full key set."""
    counts = df.groupBy(key_expr.alias(alias)).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    top = counts.orderBy(F.desc("n"), F.asc(alias)).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc(alias))  # k rows only
    return (
        top.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("share", (F.col("n") / F.col("_total")))
        .drop("_total")
    )


def kv_pivot(df: DataFrame, group: str, k_col: str, v_col: str) -> DataFrame:
    """2-column → map pivot (reference dict(zip(col0, col1)) over an
    HTML table, extraction/sources/gdacs/extract.py:71-79)."""
    return df.groupBy(group).agg(
        F.map_from_arrays(
            F.collect_list(k_col), F.collect_list(v_col)
        ).alias("kv")
    )


def bucketed_range_join(points: DataFrame, intervals: DataFrame,
                        point_col: str, start_col: str, end_col: str,
                        bucket_width: int) -> DataFrame:
    """Point-in-interval join as an EQUI-join — the scale fix for the
    plan Spark otherwise picks for a pure range predicate
    (BroadcastNestedLoopJoin: every point against every interval).

    Positions are int64 (e.g. unix_micros). Each interval explodes to
    the contiguous buckets of width ``bucket_width`` it overlaps
    (bounded by interval_span/width + 1 rows — pick the width near
    the typical interval length); each point maps to its ONE bucket,
    so after the bucket equi-join + the exact half-open
    ``start <= p < end`` filter every matching pair appears exactly
    once — no distinct needed. The join shuffles on the bucket key
    and AQE handles hot buckets; at 10^10 points this is the
    standard interval-join shape (Spark has no native range-join
    optimization without vendor extensions).

    Caller guarantees disjoint column names between the two sides;
    ``end_col`` must be strictly greater than ``start_col``."""
    p = points.withColumn(
        "_bk", F.expr(f"{point_col} div {bucket_width}"))
    iv = (intervals
          .withColumn("_bk", F.explode(F.sequence(
              F.expr(f"{start_col} div {bucket_width}"),
              F.expr(f"({end_col} - 1) div {bucket_width}")))))
    return (p.join(iv, "_bk")
            .filter((F.col(point_col) >= F.col(start_col))
                    & (F.col(point_col) < F.col(end_col)))
            .drop("_bk"))


def gapfill_locf(df: DataFrame, key_col: str, ts_col: str,
                 value_col: str, step_us: int,
                 order_col: str | None = None) -> DataFrame:
    """Time-series resample to a regular grid with last-observation-
    carried-forward — the metrics/monitoring shape (the reference
    plots per-source event counts over time from irregular rows,
    apps/etl/models.py; at scale the grid materializes once in-engine).

    Per key: slots of ``step_us`` microseconds spanning the key's OWN
    observed [min, max] range (nothing fabricated beyond the data's
    span). Each slot's representative observation is the LAST one
    inside it (ties on the timestamp break by ``order_col`` — pass the
    event id for full determinism); empty slots carry the previous
    slot's value forward and are flagged ``filled=true``. The first
    slot of every key is observed by construction, so no leading NULLs
    exist.

    Returns ``(key, grid_ts, value, filled)``.

    100-TB shape: ONE partial-agged groupBy to the (key, slot) grain
    (max_by struct — the LWW idiom), a bounded per-key sequence explode
    for the grid (grid size = span/step, a config choice, never row
    count), one left join on (key, slot), and ONE window partitioned
    by key for the carry-forward — a single shuffle on the key. A
    key's whole grid sorts in one task: fine for metrics grids (10^4-
    10^6 slots); a multi-year-span key at second resolution needs a
    coarser step or a key split, which is the same capacity planning
    every gap-fill engine asks for.

    Determinism: slot arithmetic is integer division of unix_micros,
    the per-slot winner is a struct max, and LOCF is a pure function
    of slot order — bit-identical on any layout, so a SQL oracle
    (DuckDB ``last_value(... IGNORE NULLS)``) replays it exactly."""
    if step_us <= 0:
        raise ValueError("gapfill_locf: step_us must be positive")
    oc = F.col(order_col) if order_col else F.lit(0)
    slot = F.expr(f"unix_micros(cast({ts_col} as timestamp)) "
                  f"div {int(step_us)}")
    obs = (df.select(F.col(key_col).alias("k"), slot.alias("slot"),
                     F.struct(F.col(ts_col).cast("timestamp").alias("t"),
                              oc.alias("o"),
                              F.col(value_col).alias("v")).alias("s"))
           .groupBy("k", "slot")
           .agg(F.max("s")["v"].alias("obs_value")))
    grid = (obs.groupBy("k")
            .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
            .select("k", F.explode(F.sequence("lo", "hi")).alias("slot")))
    joined = grid.join(obs, ["k", "slot"], "left")
    w = (Window.partitionBy("k").orderBy("slot")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        F.col("k").alias(key_col),
        F.timestamp_micros(F.col("slot") * F.lit(int(step_us)))
        .alias("grid_ts"),
        F.last("obs_value", ignorenulls=True).over(w).alias(value_col),
        F.col("obs_value").isNull().alias("filled"))


def frontier_schedule(urls: DataFrame, host_col: str, url_col: str,
                      prio_col: str, delay_col: str) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: within each host,
    fetches are serialized (one connection per host is the politeness
    contract), ordered by (priority DESC, url ASC), and fetch ``k``
    is scheduled ``k * delay_ms`` after the host's first slot —
    ``delay_col`` carries the host's robots.txt crawl delay in ms
    (see ``sources.robots``). Returns (host, url, slot, offset_ms).

    Scale shape: ONE window partitioned by host. Per-host sequencing
    is inherent to the semantics (politeness IS per-host
    serialization), so the per-partition sort is the minimum possible
    work; hosts are independent, so 10^8 hosts parallelize freely and
    the only skew risk is a single mega-host's frontier, which is
    bounded by the crawl budget upstream.

    Reference lineage: the reference schedules per-source extraction
    jobs with static priorities (apps/etl/sources.py priority,
    Celery beat cadence); this computes the fetch timeline from
    priorities + politeness data instead.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.col(prio_col).desc(), F.col(url_col).asc())
    slot = (F.row_number().over(w) - 1).cast("bigint")
    return urls.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        slot.alias("slot"),
        (slot * F.col(delay_col)).cast("bigint").alias("offset_ms"),
    )


def recrawl_schedule(df: DataFrame, key_col: str, ts_col: str,
                     default_interval_us: int = 86_400_000_000
                     ) -> DataFrame:
    """Adaptive recrawl scheduling from observed change history — the
    classic crawl-freshness policy: a page's revisit interval is its
    mean observed inter-change gap, so frequently-changing pages are
    revisited often and static ones rarely. Per key:
    ``n_changes``, ``last_us`` (epoch micros of the latest change),
    ``interval_us`` = (last-first) div (n-1) for n >= 2 else
    ``default_interval_us`` (cold-start prior), ``next_fetch_us`` =
    last + interval. All exact BIGINT micros arithmetic (truncating
    div) so any engine replays the schedule bit-for-bit.

    Shape: ONE map-side-combinable groupBy(key) with min/max/count —
    no window, no join; the cheapest possible pass over a 10^10-row
    change ledger. Feed the output's hosts through
    ``frontier_schedule`` for the politeness-ordered fetch timeline.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    g = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.min(us).alias("_first_us"),
        F.max(us).alias("last_us"),
    )
    interval = F.when(
        F.col("n_changes") >= 2,
        F.expr("(last_us - _first_us) div (n_changes - 1)"),
    ).otherwise(F.lit(default_interval_us))
    return g.select(
        "key", "n_changes", "last_us",
        interval.alias("interval_us"),
        (F.col("last_us") + interval).alias("next_fetch_us"),
    )
