"""Incremental SCD2 history index — the change stream's validity
intervals maintained per CDC micro-batch.

``operators/scd.scd2_history`` materializes SCD2 in one batch pass;
at 10^10 events a consumer wants the intervals MAINTAINED, not
recomputed. The index stores every event (tombstones included — they
bound intervals and must survive for late arrivals around them) in a
key-hash-partitioned ``VersionedPartitionStore`` with the derived
interval columns materialized beside it, so "history of key k" and
"value as of T" are partition-pruned point reads with no window at
query time.

Per batch the index rewrites ONLY the partitions owning the batch's
keys: read their current rows, union the new events (idempotent under
at-least-once redelivery via (key, seq) dedup), and recompute the
per-key lead/row_number window WITHIN those partitions — late events
(a ts older than already-indexed ones, including around a tombstone)
come out right by construction because the window re-runs over the
key's full event set. O(touched partitions) work per batch, the
matview/AnnIndex family shape; exactly-once mirrors the family too
(store version = batch/epoch id; a committed version no-ops, a torn
write is invisible and re-runs).

Equivalence contract (pinned in tests): after any batch sequence and
any arrival order, ``history()`` row-for-row equals
``scd2_history(all events so far)``.

Reference lineage: the reference keeps per-item revision rows updated
at load time (apps/etl/load upsert + revision bookkeeping); this is
that ledger as an incrementally-maintained interval table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.operators.dedup import hash60


class Scd2Index:
    #: bump on any on-disk layout change so an old index dir fails
    #: loudly instead of reading garbage (the NearDupIndex lesson)
    LAYOUT = 1

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "index.json")) as f:
            cfg = json.load(f)
        if cfg.get("layout") != self.LAYOUT:
            raise ValueError(
                f"Scd2Index at {path}: layout {cfg.get('layout')!r} != "
                f"{self.LAYOUT} — rebuild the index")
        self.cfg = cfg
        self.store = VersionedPartitionStore(
            os.path.join(path, "events"), "part", cfg["n_parts"])

    # ------------------------------------------------------------- create
    @classmethod
    def create(cls, path: str, key_col: str = "url",
               key_type: str = "string", ts_col: str = "warc_ts",
               seq_col: str = "seq", op_col: str = "op",
               payload_cols: tuple = (), payload_types: tuple = (),
               n_parts: int = 16) -> "Scd2Index":
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump({"layout": cls.LAYOUT, "n_parts": n_parts,
                       "key_col": key_col, "key_type": key_type,
                       "ts_col": ts_col, "seq_col": seq_col,
                       "op_col": op_col,
                       "payload_cols": list(payload_cols),
                       "payload_types": list(payload_types)}, f)
        return cls(path)

    # ------------------------------------------------------------- schema
    @property
    def _payloads(self) -> list[tuple[str, str]]:
        return list(zip(self.cfg["payload_cols"],
                        self.cfg["payload_types"]))

    @property
    def _event_schema(self) -> str:
        pl = "".join(f", {c} {t}" for c, t in self._payloads)
        return (f"key {self.cfg['key_type']}, ts timestamp, seq bigint,"
                f" op string{pl}")

    @property
    def STORE_SCHEMA(self) -> str:
        return (f"{self._event_schema}, valid_from timestamp,"
                f" valid_to timestamp, ver int, is_current boolean,"
                f" part int")

    def _part_expr(self, key_col) -> F.Column:
        return F.pmod(hash60(key_col.cast("string")),
                      F.lit(self.cfg["n_parts"])).cast("int")

    # ------------------------------------------------------------- update
    def update(self, spark: SparkSession, batch_df: DataFrame,
               version: int) -> None:
        """Apply one micro-batch. ``batch_df`` must carry the
        configured key/ts/seq/op/payload columns; ``version`` must be
        strictly increasing across batches (the stream epoch id). A
        version already committed is a duplicate delivery → no-op.
        ``seq`` is assumed to be the unique event id (the changelog
        contract): a redelivered (key, seq) pair is byte-identical, so
        the (key, seq) dedup is deterministic."""
        if version in self.store.versions():
            return
        c = self.cfg
        ev = batch_df.select(
            F.col(c["key_col"]).alias("key"),
            F.col(c["ts_col"]).cast("timestamp").alias("ts"),
            F.col(c["seq_col"]).cast("bigint").alias("seq"),
            F.col(c["op_col"]).alias("op"),
            *[F.col(p).cast(t) for p, t in self._payloads],
        ).withColumn("part", self._part_expr(F.col("key")))
        touched = {
            r["part"] for r in ev.select("part").distinct().collect()
        }
        names = ["key", "ts", "seq", "op"] + [p for p, _ in
                                              self._payloads]
        prev = self.store.read(spark, self.STORE_SCHEMA,
                               part_filter=touched, attach_part=True)
        allr = (prev.select(*names, "part")
                .unionByName(ev.select(*names, "part"))
                .dropDuplicates(["key", "seq"]))
        w = Window.partitionBy("key").orderBy(
            F.col("ts").asc(), F.col("seq").asc())
        rec = allr.select(
            *names, "part",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).alias("ver"),
        ).withColumn("is_current", F.col("valid_to").isNull())
        self.store.write(spark, rec, version, touched,
                         self.STORE_SCHEMA)
        self.store.gc()

    # ------------------------------------------------------------- reads
    def history(self, spark: SparkSession,
                keys: DataFrame | None = None) -> DataFrame:
        """Materialized intervals of surviving versions (tombstones
        bound intervals but emit no row). ``keys`` (a one-column
        DataFrame named ``key``) prunes the read to those keys'
        partitions — the point-lookup path."""
        if keys is None:
            df = self.store.read(spark, self.STORE_SCHEMA)
        else:
            parts = {
                r["p"] for r in keys.select(
                    self._part_expr(F.col("key")).alias("p"))
                .distinct().collect()
            }
            df = self.store.read(spark, self.STORE_SCHEMA,
                                 part_filter=parts).join(
                F.broadcast(keys), "key", "left_semi")
        return df.where(F.col("op") != F.lit("delete")).select(
            "key", "seq", "op",
            *[p for p, _ in self._payloads],
            "valid_from", "valid_to", "ver", "is_current")

    def as_of(self, spark: SparkSession, ts) -> DataFrame:
        """State as of timestamp ``ts``: the unique version per key
        with valid_from <= ts < coalesce(valid_to, +inf)."""
        t = F.lit(ts).cast("timestamp")
        return self.history(spark).where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t)))

    # ------------------------------------------------------------- stream
    def updater(self):
        """``run_stream(derived_updaters=[idx.updater()])`` hook: the
        epoch id is the store version (increasing; redelivered epochs
        no-op on the committed version)."""
        def upd(spark: SparkSession, batch_df: DataFrame,
                epoch_id: int) -> None:
            self.update(spark, batch_df, version=int(epoch_id))
        return upd
