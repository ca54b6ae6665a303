"""External sinks for foreachBatch (SURVEY.md §2.11 K4, §2.10 T4).

The reference loads STAC items by HTTP POST with Celery autoretry
(max 3 retries, backoff — apps/etl/load/sources/base.py:8-20) and
at-least-once redelivery (CELERY_ACKS_LATE, main/settings.py:59). The
engine's equivalent is a foreachBatch sink wrapper:

- per-partition delivery (``foreachPartition`` inside the batch — the
  driver never sees row payloads);
- bounded retry with deterministic backoff per partition-batch;
- idempotency keys derived from content (``sha2(url‖warc_ts‖seq)``),
  NOT uuid4 (reference load/sources/gdacs.py:24-26 uses uuid4, which
  is non-replayable — SURVEY §2.3 P9 flags this as a bug class);
- transport is injected (a callable), so tests exercise retry/backoff
  without a network and deployments plug in requests/httpx where one
  exists.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_idempotency_key(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Deterministic, replay-stable delivery key (replaces uuid4)."""
    return df.withColumn(
        "etl_id",
        F.sha2(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]), 256),
    )


def deliver_batch(
    batch_df: DataFrame,
    transport: Callable[[list[dict]], None],
    key_cols: list[str] = ("url", "warc_ts", "seq"),
    max_retries: int = 3,
    retry_delay_s: float = 5.0,
    chunk_size: int = 500,
) -> None:
    """POST a micro-batch to an external endpoint, per partition, with
    bounded retries (reference: autoretry_for=(Exception,), retries=3,
    delay=5 — load/sources/base.py:8).

    ``transport`` receives a list of row dicts (one chunk) and raises
    on failure. Exactly-once at the endpoint is the endpoint's job via
    ``etl_id`` — the sink only guarantees at-least-once with stable
    keys (the reference's contract, made explicit).
    """
    keyed = with_idempotency_key(batch_df, list(key_cols))

    def send_partition(rows: Iterator) -> None:
        chunk: list[dict] = []

        def flush() -> None:
            if not chunk:
                return
            for attempt in range(max_retries + 1):
                try:
                    transport(chunk)
                    chunk.clear()
                    return
                except Exception:
                    if attempt == max_retries:
                        raise
                    time.sleep(retry_delay_s * (attempt + 1))

        for row in rows:
            chunk.append(row.asDict())
            if len(chunk) >= chunk_size:
                flush()
        flush()

    keyed.foreachPartition(send_partition)
