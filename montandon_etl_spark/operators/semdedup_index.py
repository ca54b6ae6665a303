"""Incremental SemDeDup: the semantic keep-list maintained per CDC
batch.

``similarity.semantic_dedup`` re-clusters and re-compares the whole
corpus per call — O(Σ|cell|²) over EVERYTHING. But the keep rule ("x
drops iff some lower-id same-cell row has cosine >= threshold") is a
pure function of a CELL's membership, so a CDC engine should pay only
for the cells a batch touches. This module applies the engine's
incremental-index architecture (``AnnIndex`` / ``NearDupIndex``) to
it:

- an **assignment table** (``SnapshotTable``): per key its frozen-cell
  assignment + vector — LWW MERGE, exactly-once batch ids, tombstones;
- a **cell store** (``VersionedPartitionStore`` partitioned BY CELL):
  rows ``(key, vec, keep, max_dup_sim)``. A batch rewrites ONLY the
  cells its keys' old∪new assignments touch, recomputing the keep
  rule from that cell's surviving membership inside the same rewrite
  (the |cell|² pair comparison — exactly the blocked cost the paper's
  coarse quantizer buys, now scoped to touched cells).

An insert can retract a previously-kept higher-id neighbor and a
delete can resurrect rows it alone suppressed — both fall out of the
full-cell recompute, no cascade tracking needed (the rule never
chains: it references lower-id NEIGHBORS, not lower-id survivors).

Centroids are FROZEN at ``create`` (the seeded sampled k-means every
IVF-family operator shares), so the incrementally-maintained state is
bit-identical to ``semantic_dedup`` over the surviving LWW corpus on
the same centroids (tested per batch), and the driver oracle replays
it in SQL.

Scale notes (100 TB): per batch work = merge + Σ|touched cell|²
comparisons + touched-cell rewrites; driver state is touched cell ids
(≤ C ints). Reading the keep-list is partition-pruned by cell; the
usual re-cluster-on-drift caveat applies, as in ``AnnIndex``.

Reference lineage: the reference's per-source dedup keeps the first
arrival of a content key (apps/etl/extraction dedup on hash columns);
this is that idea at embedding granularity, maintained incrementally.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.similarity import (
    _top_cells,
    semdedup_keep,
)


class SemDedupIndex:
    """Incrementally-maintained SemDeDup keep-list. See module
    docstring."""

    LAYOUT = 1

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "index.json")) as f:
            cfg = json.load(f)
        if cfg.get("layout") != self.LAYOUT:
            raise ValueError(
                f"SemDedupIndex at {path}: layout {cfg.get('layout')!r} "
                f"!= {self.LAYOUT} — rebuild the index")
        self.threshold: float = cfg["threshold"]
        self.centroids: list[list[float]] = cfg["centroids"]
        self.cents = [{"cid": i, "cvec": v}
                      for i, v in enumerate(self.centroids)]
        self.table = SnapshotTable(os.path.join(path, "assign"))
        self.store = VersionedPartitionStore(
            os.path.join(path, "keep"), "cell", len(self.centroids))

    @property
    def key_col(self) -> str:
        return self.table.properties["key_col"]

    def _store_schema(self) -> str:
        return (f"{self.key_col} bigint, vec array<float>, keep boolean,"
                " max_dup_sim double, cell int")

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, centroids: list[list[float]],
               threshold: float = 0.7, key_col: str = "vec_id",
               n_buckets: int = 8) -> "SemDedupIndex":
        fields = [
            Field(1, key_col, "bigint", False),
            Field(2, "warc_ts", "timestamp", False),
            Field(10, "cell", "int", True),
            Field(11, "vec", "array<float>", True),
        ]
        SnapshotTable.create(
            os.path.join(path, "assign"), fields=fields, key_col=key_col,
            n_buckets=n_buckets,
        )
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump({"layout": cls.LAYOUT, "threshold": float(threshold),
                       "centroids": [[float(x) for x in c]
                                     for c in centroids]}, f)
        return cls(path)

    # ----------------------------------------------------------------- state
    def assignments(self, spark: SparkSession,
                    snapshot_id: int | None = None,
                    buckets: list[int] | None = None) -> DataFrame:
        return self.table.read(spark, snapshot_id=snapshot_id,
                               buckets=buckets).select(
            self.key_col, "cell", "vec")

    def state(self, spark: SparkSession,
              cells: set[int] | None = None) -> DataFrame:
        """Current keep-list ``(key, cell, keep, max_dup_sim)`` —
        partition-pruned when ``cells`` is given."""
        return self.store.read(spark, self._store_schema(),
                               part_filter=cells, attach_part=True) \
            .select(self.key_col, "cell", "keep", "max_dup_sim")

    # ---------------------------------------------------------------- update
    def update(self, spark: SparkSession, batch_df: DataFrame,
               vec_col: str = "vec", batch_id: int | None = None) -> None:
        """Apply one micro-batch (key, warc_ts, seq, op, vec): assign
        upserts' cells in-scan against the frozen centroids, LWW-merge
        the assignment table, then rewrite ONLY the touched cells —
        surviving membership plus a fresh keep-rule evaluation inside
        the same rewrite. Exactly-once mirrors AnnIndex: merge dedups
        on batch_id, store versions by snapshot id, pre-state is
        head's parent."""
        key = self.key_col
        ups = batch_df.filter(F.col("op") == "upsert").select(
            "seq", key, "warc_ts", "op",
            F.col(vec_col).alias("vec"),
        ).withColumn(
            "cell", F.element_at(_top_cells(self.cents, "vec", 1), 1)
        )
        dels = batch_df.filter(F.col("op") == "delete").select(
            "seq", key, "warc_ts", "op")
        merged = ups.unionByName(dels, allowMissingColumns=True)
        res = self.table.merge(spark, merged, batch_id=batch_id)
        head = self.table.io.head_snapshot_id()
        prev_sid = self.table.io.read_snapshot(head).get("parent_id")
        if res is None and head in self.store.versions():
            return  # duplicate delivery, all artifacts exist → no-op

        touched_keys = (
            batch_df.select(F.col(key)).distinct().localCheckpoint()
        )
        tk_buckets = sorted({
            r["b"] for r in touched_keys.select(
                self.table.bucket_expr(key).alias("b")).distinct().collect()
        })
        new_rows = self.assignments(spark, buckets=tk_buckets).join(
            touched_keys, key, "left_semi")
        cells_df = new_rows.select("cell")
        if prev_sid is not None:
            old_rows = self.assignments(spark, snapshot_id=prev_sid,
                                        buckets=tk_buckets).join(
                touched_keys, key, "left_semi")
            cells_df = cells_df.unionByName(old_rows.select("cell"))
        touched_cells = {r["cell"] for r in cells_df.distinct().collect()
                         if r["cell"] is not None}

        prev_slice = self.store.read(spark, self._store_schema(),
                                     part_filter=touched_cells,
                                     attach_part=True)
        members = (
            prev_slice.join(touched_keys, key, "left_anti")
            .select(F.col(key).alias("id"), F.col("vec").alias("v"), "cell")
            .unionByName(new_rows.select(
                F.col(key).alias("id"), F.col("vec").alias("v"), "cell"))
        )
        out = semdedup_keep(members, self.threshold).select(
            F.col("id").alias(key), F.col("v").alias("vec"),
            "keep", "max_dup_sim", "cell")
        self.store.write(spark, out, head, touched_cells,
                         self._store_schema())
        self.store.gc()
