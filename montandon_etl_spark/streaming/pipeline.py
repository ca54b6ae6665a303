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

import json
import os
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.functions.extract import extract_text_udf
from montandon_etl_spark.lake.table import SnapshotTable

CHANGELOG_SPARK_SCHEMA = "seq bigint, url string, warc_ts timestamp, op string, html binary"
# in-band DDL variant (SURVEY §1.4): schema-evolution events as rows
CHANGELOG_DDL_SPARK_SCHEMA = CHANGELOG_SPARK_SCHEMA + ", ddl string"
DDL_OPS = ("add_column", "rename_column", "drop_column", "widen_column")


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


# op → spec fields that must be present non-empty strings for the DDL
# to be applicable at all (mirrors SnapshotTable.apply_ddl's needs)
_DDL_REQUIRED = {
    "add_column": ("field", "dtype"),
    "rename_column": ("field", "new_name"),
    "drop_column": ("field",),
    "widen_column": ("field", "dtype"),
}


def _extract_inband_ddl(
    batch_df: DataFrame,
) -> tuple[DataFrame, pd.DataFrame | None, list]:
    """Split a changelog batch that carries a ``ddl`` column into
    (DML-only frame, in-band DDL events as the side-channel pandas
    shape, malformed DDL rows). The collect is bounded metadata — DDL
    events are rare schema changes, never data volume. Streams WITHOUT
    the ddl column skip this entirely (zero extra jobs on the common
    path).

    A DDL row whose spec is unparseable JSON or lacks its op's
    required fields lands in the THIRD slot instead of raising later
    inside apply_ddl — one poison DDL frame must quarantine, not wedge
    the stream on every retry (ADVICE r3 #1)."""
    if "ddl" not in batch_df.columns:
        return batch_df, None, []
    ddl_rows = (
        batch_df.filter(F.col("op").isin(*DDL_OPS))
        .select("seq", "op", "ddl")
        .collect()
    )
    dml = batch_df.filter(~F.col("op").isin(*DDL_OPS)).drop("ddl")
    if not ddl_rows:
        return dml, None, []
    recs, bad = [], []
    for r in ddl_rows:
        try:
            spec = json.loads(r["ddl"]) if r["ddl"] else None
        except (ValueError, TypeError):
            spec = None
        if not isinstance(spec, dict) or any(
            not isinstance(spec.get(k), str) or not spec[k]
            for k in _DDL_REQUIRED[r["op"]]
        ):
            bad.append(r)
            continue
        recs.append((int(r["seq"]), r["op"], spec.get("field"),
                     spec.get("new_name"), spec.get("dtype")))
    events = (pd.DataFrame(
        recs, columns=["seq", "op", "field", "new_name", "dtype"])
        if recs else None)
    return dml, events, bad


def merge_microbatch(
    spark: SparkSession,
    table: SnapshotTable,
    batch_df: DataFrame,
    batch_id: int | None,
    ddl_events: pd.DataFrame | None = None,
    use_salted: bool = False,
    gc_tombstones: bool = False,
    on_bad_ddl: Callable[[list], None] | None = None,
) -> None:
    """One exactly-once micro-batch commit, with DDL interleaving.
    ``gc_tombstones``: the caller asserts the changelog is globally
    seq-ordered (a WAL/binlog tail), enabling tombstone GC at the
    amortized compactions (see SnapshotTable.compact).

    DDL can arrive two ways: in-band as rows of ``batch_df`` (a ``ddl``
    column present — the WAL-tail shape, SURVEY §1.4 literally) or as
    the ``ddl_events`` side-channel (kept for operator-pushed
    migrations). Both funnel into the same seq-ordered idempotent
    application loop; an in-band DDL needs no trailing sweep because
    its own row advances the batch's max seq past it."""
    head = table.snapshot()
    if batch_id is not None and batch_id <= head["committed_max_batch_id"]:
        return  # duplicate epoch delivery → full no-op

    batch_df, inband, bad_ddl = _extract_inband_ddl(batch_df)
    if bad_ddl:
        if on_bad_ddl is not None:
            on_bad_ddl(bad_ddl)  # quarantine path (run_stream wires it)
        else:
            raise ValueError(
                f"malformed in-band DDL frame(s) at seq "
                f"{[r['seq'] for r in bad_ddl]} and no on_bad_ddl "
                f"handler — refusing to silently drop schema changes")
    if inband is not None:
        ddl_events = (inband if ddl_events is None or len(ddl_events) == 0
                      else pd.concat([ddl_events, inband], ignore_index=True))

    # the seq-range probe is only needed to place DDL events — skip the
    # extra job entirely on the (overwhelmingly common) no-DDL path
    if ddl_events is None or len(ddl_events) == 0:
        table.merge(spark, batch_df, batch_id=batch_id, use_salted=use_salted,
                    enrich=enrich_batch, gc_tombstones=gc_tombstones)
        return

    bounds = batch_df.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    if inband is not None:
        # an in-band DDL row extends the batch's seq high-water even
        # when it trails every DML row — this is why in-band needs no
        # apply_trailing_ddl sweep
        ih = int(inband["seq"].max())
        hi = ih if hi is None else max(int(hi), ih)
    if hi is None:
        return  # empty batch (side-channel DDL waits for a carrying batch)
    ddls = _pending_ddl(table, ddl_events, hi)
    if lo is None:
        # DDL-only batch: no DML to segment. The LAST applied DDL's
        # schema snapshot carries the epoch's batch_id (an all-applied
        # replay gets an explicit empty commit), so the epoch advances
        # committed_max_batch_id like every other — duplicate delivery
        # is then caught by the standard check instead of resting on
        # schema-inference, which misidentifies rename A->B followed
        # later by rename B->A (ADVICE r3 #3)
        for i, d in enumerate(ddls):
            table.apply_ddl(d["op"], d["field"], d["new_name"], d["dtype"],
                            batch_id=batch_id if i == len(ddls) - 1 else None)
        if not ddls and batch_id is not None:
            table.commit_batch_id(batch_id)
        return

    # enrichment is handed to merge() so the extractor UDF runs only on
    # rows that actually win the merge (losers never pay for it)
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
    changelog_dir: str | None,
    checkpoint_dir: str,
    ddl_events: pd.DataFrame | None = None,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
    use_salted: bool = False,
    gc_tombstones: bool = False,
    retention_snapshots: int | None = None,
    source: Callable[[SparkSession], DataFrame] | None = None,
    quarantine_dir: str | None = None,
    in_band_ddl: bool = False,
    derived_updaters: list[Callable[[SparkSession, DataFrame, int], None]]
    | None = None,
):
    """Tail a change stream into the table.

    The source is pluggable (the reference makes its extraction source
    pluggable per source module, apps/etl/extraction/sources/base/
    extract.py:10-86): by default a parquet changelog directory is
    tailed; pass ``source`` — a factory ``spark -> streaming DataFrame``
    — to feed anything else (a Kafka/Debezium tail via
    ``sources.kafka.kafka_source`` / ``kafka_frames_dir_source``) into
    the SAME foreachBatch/merge path. The offsets-in-checkpoint /
    epochs-to-foreachBatch contract is identical either way.

    A source whose frames need decoding emits a ``decode_ok`` column
    (see sources/kafka.py): good rows merge, bad frames are written to
    ``quarantine_dir`` (per-epoch overwrite → idempotent on re-delivery)
    — record-not-drop, and one poisoned frame never wedges the tail.

    ``in_band_ddl``: the file source reads the extended changelog schema
    whose rows carry schema-evolution events (SURVEY §1.4); DDL is
    applied seq-ordered by ``merge_microbatch`` with no side-channel.

    ``retention_snapshots``: expire snapshots beyond the newest N after
    each commit — bounds on-disk growth for a forever-running tail
    (driver-side file ops between batches, off the hot path).

    ``derived_updaters``: callables ``(spark, batch_df, epoch_id)`` run
    AFTER the merge commits, inside the same foreachBatch — the seam
    that keeps derived artifacts (a ``NearDupIndex``, a
    ``MaterializedAggregate``) current per micro-batch. Each updater
    must be idempotent on its epoch/snapshot id, exactly like the merge
    itself, so a re-delivered epoch is a no-op end-to-end (both
    shipped consumers are; tested in ``test_derived_stream``).
    """
    if source is not None:
        stream = source(spark)
    else:
        if changelog_dir is None:
            raise ValueError("changelog_dir is required without a source factory")
        schema = CHANGELOG_DDL_SPARK_SCHEMA if in_band_ddl else CHANGELOG_SPARK_SCHEMA
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        stream = reader.parquet(changelog_dir)

    def sink(df: DataFrame, epoch_id: int) -> None:
        if "decode_ok" in df.columns:
            bad = df.filter(~F.coalesce(F.col("decode_ok"), F.lit(False)))
            if quarantine_dir is not None:
                (bad.write.mode("overwrite")
                 .parquet(os.path.join(quarantine_dir, f"epoch={epoch_id}")))
            # "_"-prefixed columns are decode forensics (raw frame bytes)
            # for the quarantine only — they must never ride the merge
            drop = ["decode_ok"] + [c for c in df.columns if c.startswith("_")]
            df = df.filter(F.col("decode_ok")).drop(*drop)

        def bad_ddl_sink(rows: list) -> None:
            # malformed in-band DDL frames: record-not-drop, same
            # contract as decode quarantine (own epoch subdir so a
            # decode-quarantine overwrite can't clobber them)
            if quarantine_dir is None:
                raise ValueError(
                    f"malformed in-band DDL frame(s) at seq "
                    f"{[r['seq'] for r in rows]} — configure "
                    f"quarantine_dir to divert instead of failing")
            (spark.createDataFrame(
                [(r["seq"], r["op"], r["ddl"]) for r in rows],
                "seq bigint, op string, ddl string")
             .write.mode("overwrite")
             .parquet(os.path.join(quarantine_dir, f"ddl_epoch={epoch_id}")))

        merge_microbatch(spark, table, df, epoch_id, ddl_events, use_salted,
                         gc_tombstones=gc_tombstones, on_bad_ddl=bad_ddl_sink)
        for upd in derived_updaters or []:
            upd(spark, df, epoch_id)
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
