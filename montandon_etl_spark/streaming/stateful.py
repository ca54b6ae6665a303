"""Stateful streaming operators: watermarked windowed aggregation and a
custom per-key LWW state store via applyInPandasWithState.

The reference has no watermark policy (its daily date-window re-scan
tolerates lateness — SURVEY.md §2.10 T8); the engine adds the real
streaming constructs:

- ``windowed_event_counts`` — tumbling event-time windows with a
  watermark bounding state (the metrics stage of the firehose);
- ``streaming_lww_state`` — an ``applyInPandasWithState`` operator
  holding the current LWW winner key per url across micro-batches and
  emitting only CHANGED winners (a changelog compactor: upstream of
  the sink it turns an at-least-once event stream into a minimal
  upsert stream). State is (warc_ts, seq) per url — tiny and bounded
  by the keyspace, the payload itself stays out of the state store.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts with bounded state: late rows beyond
    the watermark are dropped from state (not from the table — the LWW
    merge is order-insensitive; this operator only feeds metrics)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("op"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n",
        )
    )


def session_window_stats(
    stream: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization via the native ``session_window``
    aggregate: per-key sessions close after ``gap`` of event-time
    silence; the watermark bounds open-session state. The streaming
    twin of ``relational.sessionize`` (same gap semantics, windows
    instead of running ids — ids need total order, which a stream
    doesn't have until sessions close)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "warc_ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: drop redelivered
    events (same (url, seq) — an at-least-once source's duplicates)
    whose first copy arrived within the watermark. Unlike a plain
    dropDuplicates, expired keys leave the state store, so state is
    O(events per watermark window), not O(all events ever) — the only
    form that survives a 10^10-event stream. Duplicates older than the
    watermark are already handled downstream: the MERGE's LWW election
    is idempotent to redelivery.
    """
    keys = keys if keys is not None else ["url", "seq"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


_LWW_STATE_SCHEMA = "warc_ts_us long, seq long"
_LWW_OUT_SCHEMA = "url string, warc_ts timestamp, seq long, op string"


def _lww_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keep the max (warc_ts, seq) per url; emit a row only when the
    winner advances (dedup/no-change suppression — the reference's
    NO_CHANGE state, apps/etl/models.py:45, done streaming-side)."""
    if state.exists:
        cur_ts, cur_seq = state.get
    else:
        cur_ts, cur_seq = -1, -1
    best = None
    for pdf in pdfs:
        for r in pdf.itertuples():
            ts_us = int(r.warc_ts.value // 1000)  # pandas ns → us
            if (ts_us, int(r.seq)) > (cur_ts, cur_seq):
                cur_ts, cur_seq = ts_us, int(r.seq)
                best = (r.url, r.warc_ts, int(r.seq), r.op)
    if best is not None:
        state.update((cur_ts, cur_seq))
        yield pd.DataFrame(
            [best], columns=["url", "warc_ts", "seq", "op"]
        )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    max_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream equi-join with a time-interval bound —
    the request/response (impression/click) shape of a CDC firehose:
    each left event matches right events for the same key whose
    timestamp lands in ``[left_ts, left_ts + max_delay]``.

    Scale contract: BOTH sides carry a watermark and the join condition
    bounds event-time distance, so Spark's symmetric hash join can
    evict state once the watermark passes ``left_ts + max_delay`` —
    state is O(events inside the lateness+delay horizon), never
    O(stream). Without the interval bound the state store grows
    forever; this wrapper makes the bound non-optional.

    Drain-semantics caveat (ADVICE r5): inner-join completeness vs a
    batch join of the same inputs holds when availableNow drains each
    side in one micro-batch (no ``maxFilesPerTrigger``) or arrival is
    event-time-ordered; with many-file triggers, rows arriving behind
    the already-advanced watermark are dropped from join state and
    matches can be lost relative to the batch oracle.

    ``how``: ``inner`` (append output as matches arrive) or
    ``leftOuter`` (unmatched lefts emit NULL-padded ONLY after the
    watermark proves no match can still arrive — results trail the
    data by the watermark delay, the documented Spark semantics).
    Column contract: ``key`` joins by name; every other right column
    must not collide with a left name (rename upstream).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how}")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(f"column collision (rename upstream): {sorted(overlap)}")
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}")
           <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"))
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key]
    return lw.join(rw, cond, how).select(*out_cols)


def streaming_lww_state(stream: DataFrame) -> DataFrame:
    """Per-url LWW winner tracking across micro-batches; emits only
    winner changes. Arrow-batched state function (pandas in/out), state
    is 16 bytes per url."""
    return (
        stream.select("url", "warc_ts", "seq", "op")
        .groupBy("url")
        .applyInPandasWithState(
            _lww_state_fn,
            outputStructType=_LWW_OUT_SCHEMA,
            stateStructType=_LWW_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
