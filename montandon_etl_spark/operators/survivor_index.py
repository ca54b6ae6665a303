"""Incremental survivor election: the keep-one-copy decision of the
dedup pipeline, CDC-maintained on top of ``ClusterIndex``.

Round 4 closed the dedup chain in BATCH form (pairs → components →
per-family best-quality survivor, ``dedup_survivors``); this module
makes the last stage incremental too, so the whole pipeline —
``NearDupIndex`` (O(touched buckets)) → ``ClusterIndex`` (O(affected
components)) → survivor election — advances per micro-batch without
any full recompute.

State: one ``lake/pstore`` of (cluster_id, survivor_id, best_quality,
n_members), partitioned by ``hash(cluster_id) % n_parts`` and
versioned by the SAME upstream snapshot id as the cluster index's
stores, so the exactly-once/crash-retry story is inherited unchanged.

Per refresh, the affected-family set comes for free from the cluster
index's own write pattern: the labels store records which partitions
each version rewrote, so diffing the current rows of those partitions
against the pre-refresh state (``below_version`` read) yields exactly
the (id, cluster_id) rows that changed — old families that lost
members, new/merged families that gained them. Only those families
re-elect: members resolve through the EDGES store (label-hash pruned,
the direction built for this lookup), quality attaches by a semi-
pruned join, and one ``max_by`` per family picks the winner (best
quality, ties to the smaller id — the exact ``dedup_survivors``
rule). Families that vanished drop out of the state. Catch-up across
several cluster versions unions the touched-partition sets of the
skipped versions — the matview catch-up idea applied to partitions.

Equivalence contract (tested): after any batch sequence,
``survivors()`` equals the batch election over
``cluster_index.clusters()`` joined with the same quality table.

Reference lineage: the reference picks one surviving row per
content-hash group per ingest run (apps/etl/models.py save paths); at
10^10 docs the keep-list is incrementally-maintained state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.operators.cluster_index import (
    EDGE_SCHEMA,
    LABEL_SCHEMA,
    ClusterIndex,
)
from montandon_etl_spark.operators.dedup import hash60

SURVIVOR_SCHEMA = ("cluster_id string, survivor_id string,"
                   " best_quality double, n_members bigint, sp int")


class SurvivorIndex:
    """CDC-maintained per-cluster survivor election. See module
    docstring."""

    def __init__(self, path: str, n_parts: int = 64):
        self.path = path
        self.n_parts = n_parts
        os.makedirs(path, exist_ok=True)
        self.store = VersionedPartitionStore(
            os.path.join(path, "survivors"), "sp", n_parts)

    def _sp(self, col) -> F.Column:
        return F.pmod(hash60(col), F.lit(self.n_parts)).cast("int")

    # ----------------------------------------------------------------- state
    def survivors(self, spark: SparkSession) -> DataFrame:
        """(cluster_id, survivor_id, best_quality, n_members) for
        every pair-participating family, as of the last refresh."""
        return self.store.read(spark, SURVIVOR_SCHEMA).select(
            "cluster_id", "survivor_id", "best_quality", "n_members")

    # --------------------------------------------------------------- refresh
    def _elect(self, members: DataFrame, quality: DataFrame,
               id_col: str, q_col: str) -> DataFrame:
        """Per-family winner over (cluster_id, id) member rows: best
        quality, ties to the smaller id — dedup_survivors' exact rule
        (same window shape; Spark plans the rank filter as
        WindowGroupLimit, partial top-1 below the shuffle)."""
        from pyspark.sql import Window

        q = quality.select(F.col(id_col).alias("id"),
                           F.col(q_col).alias("_q"))
        j = members.join(q, "id")
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("_q"), F.asc("id"))
        cw = Window.partitionBy("cluster_id")
        return (j.withColumn("_rn", F.row_number().over(w))
                .withColumn("n_members",
                            F.count(F.lit(1)).over(cw).cast("bigint"))
                .filter(F.col("_rn") == 1)
                .select("cluster_id", F.col("id").alias("survivor_id"),
                        F.col("_q").alias("best_quality"), "n_members"))

    def refresh(self, spark: SparkSession, cidx: ClusterIndex,
                quality: DataFrame, id_col: str = "id",
                q_col: str = "quality") -> int:
        """Advance to the cluster index's newest version; returns it.
        No-op when already there. Only families whose membership
        changed since the last refresh re-elect. Retention caveat
        (same as the matview's): the pre-refresh label state must
        still be within the cluster stores' gc window — refresh at
        least once per index generation (in-stream via
        derived_updaters it runs every batch, which trivially
        satisfies this)."""
        versions = cidx.labels.versions()
        if not versions:
            return 0
        head = versions[-1]
        done = self.store.versions()
        if head in done:
            return head
        if not done:
            # bootstrap: full election over the current cluster state
            members = cidx.clusters(spark).select("cluster_id",
                                                  F.col("id"))
            out = self._elect(members, quality, id_col, q_col)
            touched = set(range(self.n_parts))
            self.store.write(
                spark, out.withColumn("sp", self._sp(F.col("cluster_id"))),
                head, touched, SURVIVOR_SCHEMA)
            self.store.gc()
            return head
        last = done[-1]
        # label partitions rewritten by every cluster version in
        # (last, head] — bounded driver metadata from the manifests
        touched_lab = set()
        for v in versions:
            if last < v <= head:
                touched_lab |= set(cidx.labels._pmap(v))
        cur = cidx.labels.read(spark, LABEL_SCHEMA,
                               part_filter=touched_lab)
        old = cidx.labels.read(spark, LABEL_SCHEMA,
                               part_filter=touched_lab,
                               below_version=last + 1)
        ch = (cur.select("id", "cluster_id").withColumn("_s", F.lit(1))
              .unionByName(old.select("id", "cluster_id")
                           .withColumn("_s", F.lit(-1)))
              .groupBy("id", "cluster_id").agg(F.sum("_s").alias("_s"))
              .filter(F.col("_s") != 0))
        affected = (ch.select("cluster_id").distinct().localCheckpoint())
        sp_parts = {r["p"] for r in affected.select(
            self._sp(F.col("cluster_id")).alias("p")).distinct().collect()}
        lp_parts = {r["p"] for r in affected.select(
            cidx._np(F.col("cluster_id")).alias("p")).distinct().collect()}
        if not sp_parts:  # nothing changed (pure echo batch)
            self.store.write(
                spark,
                spark.createDataFrame([], SURVIVOR_SCHEMA),
                head, set(), SURVIVOR_SCHEMA)
            return head
        # members of the affected families via the edges store (the
        # label-partitioned direction built for this read)
        edges = (
            cidx.edges.read(spark, EDGE_SCHEMA, part_filter=lp_parts)
            .join(affected.withColumnRenamed("cluster_id", "clab"),
                  "clab", "left_semi")
        )
        members = (
            edges.select(F.col("clab").alias("cluster_id"),
                         F.col("id_a").alias("id"))
            .unionByName(edges.select(F.col("clab").alias("cluster_id"),
                                      F.col("id_b").alias("id")))
            .distinct()
        )
        elected = self._elect(members, quality, id_col, q_col)
        keep = (
            self.store.read(spark, SURVIVOR_SCHEMA, part_filter=sp_parts)
            .join(affected, "cluster_id", "left_anti")
            .select("cluster_id", "survivor_id", "best_quality",
                    "n_members")
        )
        out = keep.unionByName(elected)  # vanished families drop out
        self.store.write(
            spark, out.withColumn("sp", self._sp(F.col("cluster_id"))),
            head, sp_parts, SURVIVOR_SCHEMA)
        self.store.gc()
        return head
