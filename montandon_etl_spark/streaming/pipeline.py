"""The CDC pipeline: changelog tail → enrich → MERGE → snapshot commit.

Spark restatement of the reference's whole task graph (SURVEY.md §3.1):
the Celery chain fetch → validate → dedup → transform → load
(apps/etl/etl_tasks/gdacs.py:94-123) collapses into one streaming
DataFrame program,

    readStream(changelog) → validate/filter → extract(text,lang)
      via Arrow pandas UDF → LWW MERGE into SnapshotTable
      (inside foreachBatch, exactly-once on epoch id)

with the daily beat trigger (main/settings.py:166-175) replaced by a
checkpointed streaming trigger: ``availableNow`` for catch-up replay,
``processingTime`` for tail mode. At-least-once redelivery
(CELERY_ACKS_LATE, main/settings.py:59) becomes exactly-once because
the table's commit log is keyed by batch id.

DDL events (schema evolution) interleave with DML by ``seq``: inside a
micro-batch whose seq range spans a DDL event, the batch is split into
pre/post segments around each DDL, the pre-segment merged, the DDL
applied as a schema-only snapshot, then the rest. Re-running a
partially-applied batch is safe: LWW re-merge of identical events is
idempotent and an already-applied DDL is detected and skipped.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.functions.extract import extract_text_udf
from montandon_etl_spark.lake.table import SnapshotTable

CHANGELOG_SPARK_SCHEMA = "seq bigint, url string, warc_ts timestamp, op string, html binary"


def enrich_batch(batch_df: DataFrame) -> DataFrame:
    """Derive (text, lang) for upserts via the Arrow-vectorized
    extractor; deletes keep NULL payload columns. One UDF invocation
    per batch partition — Arrow batches, no per-row Python."""
    is_up = F.col("op") == F.lit("upsert")
    return (
        batch_df.withColumn("_x", extract_text_udf(F.col("html")))
        .withColumn("text", F.when(is_up, F.col("_x.text")))
        .withColumn("lang", F.when(is_up, F.col("_x.lang")))
        .drop("_x")
    )


def _pending_ddl(table: SnapshotTable, ddl_events: pd.DataFrame | None,
                 hi: int | None) -> list[dict]:
    """Not-yet-applied DDL events with seq <= ``hi`` (all of them when
    ``hi`` is None). High-water semantics, not range semantics: a DDL
    whose seq lands in a gap between micro-batches (or below a batch's
    min seq after a replay split) is picked up by the next batch whose
    max seq passes it, instead of being silently skipped. "Already
    applied" is inferred from the live schema, so retrying a
    partially-committed batch is idempotent; the per-seq application
    loop in ``merge_microbatch`` keeps total order vs DML."""
    if ddl_events is None or len(ddl_events) == 0:
        return []
    current: dict[str, str] = {f.name: f.type for f in table.user_fields()}
    out = []
    for r in ddl_events.sort_values("seq").itertuples():
        if hi is not None and r.seq > hi:
            continue
        # "already applied" inferred from the live schema (retry of a
        # partially-done batch must be idempotent)
        if r.op == "add_column" and r.field in current:
            continue
        if r.op in ("rename_column", "drop_column") and r.field not in current:
            continue
        if r.op == "widen_column" and current.get(r.field) == r.dtype:
            continue
        out.append({"seq": int(r.seq), "op": r.op, "field": r.field,
                    "new_name": r.new_name, "dtype": r.dtype})
        # track the evolving schema so chained DDLs in one batch
        # (add a, rename a->b, widen b) are all emitted
        if r.op == "add_column":
            current[r.field] = r.dtype
        elif r.op == "rename_column":
            current[r.new_name] = current.pop(r.field)
        elif r.op == "drop_column":
            current.pop(r.field)
        elif r.op == "widen_column":
            current[r.field] = r.dtype
    return out


def apply_trailing_ddl(table: SnapshotTable,
                       ddl_events: pd.DataFrame | None) -> int:
    """Apply every not-yet-applied DDL event (a DDL with seq beyond the
    changelog's last DML event has no carrying batch — call this once
    after replay/stream completion). Returns the number applied."""
    ddls = _pending_ddl(table, ddl_events, None)
    for d in ddls:
        table.apply_ddl(d["op"], d["field"], d["new_name"], d["dtype"])
    return len(ddls)


def merge_microbatch(
    spark: SparkSession,
    table: SnapshotTable,
    batch_df: DataFrame,
    batch_id: int | None,
    ddl_events: pd.DataFrame | None = None,
    use_salted: bool = False,
    gc_tombstones: bool = False,
) -> None:
    """One exactly-once micro-batch commit, with DDL interleaving.
    ``gc_tombstones``: the caller asserts the changelog is globally
    seq-ordered (a WAL/binlog tail), enabling tombstone GC at the
    amortized compactions (see SnapshotTable.compact)."""
    head = table.snapshot()
    if batch_id is not None and batch_id <= head["committed_max_batch_id"]:
        return  # duplicate epoch delivery → full no-op

    # the seq-range probe is only needed to place DDL events — skip the
    # extra job entirely on the (overwhelmingly common) no-DDL path
    if ddl_events is None or len(ddl_events) == 0:
        table.merge(spark, batch_df, batch_id=batch_id, use_salted=use_salted,
                    enrich=enrich_batch, gc_tombstones=gc_tombstones)
        return

    bounds = batch_df.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return
    ddls = _pending_ddl(table, ddl_events, bounds["hi"])

    # enrichment is handed to merge() so the extractor UDF runs only on
    # rows that actually win the merge (losers never pay for it)
    lo = bounds["lo"]
    for d in ddls:
        # a DDL whose seq precedes this batch (gap between micro-batches)
        # yields an empty pre-segment: merge() no-ops, the DDL still applies
        seg = batch_df.filter((F.col("seq") >= lo) & (F.col("seq") < d["seq"]))
        # pre-DDL segment committed without the epoch id (idempotent re-merge);
        # only the final segment advances the batch high-water mark
        table.merge(spark, seg, batch_id=None, use_salted=use_salted, enrich=enrich_batch)
        table.apply_ddl(d["op"], d["field"], d["new_name"], d["dtype"])
        lo = max(lo, d["seq"])
    final = batch_df.filter(F.col("seq") >= lo)
    table.merge(spark, final, batch_id=batch_id, use_salted=use_salted,
                enrich=enrich_batch, gc_tombstones=gc_tombstones)


def run_stream(
    spark: SparkSession,
    table: SnapshotTable,
    changelog_dir: str,
    checkpoint_dir: str,
    ddl_events: pd.DataFrame | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    use_salted: bool = False,
    gc_tombstones: bool = False,
    retention_snapshots: int | None = None,
):
    """Tail a changelog directory into the table.

    File-based source here (the sandbox has no Kafka); the source
    contract — offsets tracked in the checkpoint, epochs delivered to
    foreachBatch — is identical for a Kafka/binlog source, so only
    ``readStream.format(...)`` changes on a real deployment (see
    ``sources/kafka.py`` for the wire-format decode).

    ``retention_snapshots``: expire snapshots beyond the newest N after
    each commit — bounds on-disk growth for a forever-running tail
    (driver-side file ops between batches, off the hot path).
    """
    reader = spark.readStream.schema(CHANGELOG_SPARK_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(changelog_dir)

    def sink(df: DataFrame, epoch_id: int) -> None:
        merge_microbatch(spark, table, df, epoch_id, ddl_events, use_salted,
                         gc_tombstones=gc_tombstones)
        if retention_snapshots is not None:
            table.expire_snapshots(keep_n=retention_snapshots)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    return q
