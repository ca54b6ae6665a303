"""Incremental view maintenance: a grouped aggregate (COUNT + SUMs)
over a ``SnapshotTable``, advanced from the change data feed instead
of re-scanning the table.

The classic warehouse pattern (materialized view over a CDC table):
``refresh()`` reads ``table.changes(applied → head,
include_old_values=True)`` and applies per-group deltas —

- ``insert``  →  +1 row, +new values
- ``delete``  →  −1 row, −old values
- ``update``  →  −old contribution (under the OLD group value) and
  +new contribution (under the NEW one), so rows migrating between
  groups stay exact

— then full-outer-merges the deltas into the stored state and drops
zero-count groups. Sums use DECIMAL(28,6) so add-then-subtract
cancels EXACTLY: after any batch sequence the state is bit-identical
to a full ``groupBy`` recompute over the live table (tested), which a
float sum cannot promise. NULL measures contribute 0 (the state's sum
column is the COALESCE(x, 0) sum).

Scale story (100 TB): the CDF reads only buckets whose manifest ref
changed between the snapshots; the delta aggregation is map-side
combinable and shrinks to O(groups touched); the state rewrite is
O(|groups|) — tiny next to the table (domains, languages, sources).
For a pathological group cardinality, partition the state by
hash(group) % n and rewrite touched partitions, exactly the
``NearDupIndex`` banded-store trick.

Catch-up spans any number of commits in one refresh (the CDF is a
state diff, so intermediate churn collapses), but the applied
snapshot must still be within the table's retention window —
``expire_snapshots`` past it forces a re-bootstrap.

Exactly-once: the state is versioned by the head snapshot id it
reflects; a refresh that finds its target version already written is
a no-op, and a crash mid-refresh recomputes the same deltas against
the same two snapshots.

Reference lineage: the reference recomputes its per-source monitoring
counts from scratch each run (apps/etl/models.py aggregate queries);
at 10^10 rows those become CDF-maintained views.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.table import SnapshotTable

_DEC = "decimal(28,6)"


class MaterializedAggregate:
    """CDF-maintained ``GROUP BY group_cols`` view with ``n_rows`` and
    ``sum_<col>`` for each measure column. See module docstring."""

    def __init__(self, path: str, table: SnapshotTable):
        self.path = path
        self.table = table
        with open(os.path.join(path, "mv.json")) as f:
            cfg = json.load(f)
        # columns are pinned by FIELD ID (the lake's rename-proof
        # handle); names resolve against the CURRENT schema on access
        self.group_ids: list[int] = cfg["group_ids"]
        self.sum_ids: list[int] = cfg["sum_ids"]

    def _names(self, ids: list[int]) -> list[str]:
        by_id = {f.id: f.name for f in self.table.user_fields()}
        missing = [i for i in ids if i not in by_id]
        if missing:
            raise ValueError(
                f"materialized view at {self.path} pins field id(s) "
                f"{missing} that no longer resolve against the table's "
                f"current schema (a drop_column DDL removed them) — "
                f"drop and re-create() the view over the surviving "
                f"columns")
        return [by_id[i] for i in ids]

    @property
    def group_cols(self) -> list[str]:
        return self._names(self.group_ids)

    @property
    def sum_cols(self) -> list[str]:
        return self._names(self.sum_ids)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, spark: SparkSession, table: SnapshotTable,
               group_cols: list[str], sum_cols: list[str]) -> "MaterializedAggregate":
        """Bootstrap: one full aggregate over the table's CURRENT
        snapshot, stored as version v{head}; everything after is
        incremental."""
        os.makedirs(os.path.join(path, "state"), exist_ok=True)
        by_name = {f.name: f.id for f in table.user_fields()}
        with open(os.path.join(path, "mv.json"), "w") as f:
            json.dump({"group_ids": [by_name[c] for c in group_cols],
                       "sum_ids": [by_name[c] for c in sum_cols]}, f)
        mv = cls(path, table)
        head = table.io.head_snapshot_id()
        full = mv._aggregate(table.read(spark))
        mv._write_state(full, head)
        return mv

    # ----------------------------------------------------------------- state
    def _aggregate(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(F.coalesce(F.col(c).cast(_DEC), F.lit(0).cast(_DEC)))
              .cast(_DEC).alias(f"sum_{c}") for c in self.sum_cols],
        )

    def _versions(self) -> list[int]:
        vs = []
        for d in glob.glob(os.path.join(self.path, "state", "v*")):
            base = os.path.basename(d)
            if base[1:].isdigit() and glob.glob(os.path.join(d, "_SUCCESS")):
                vs.append(int(base[1:]))
        return sorted(vs)

    def applied_snapshot_id(self) -> int:
        vs = self._versions()
        if not vs:
            raise ValueError("materialized view has no state — create() it")
        return vs[-1]

    def _write_state(self, df: DataFrame, snapshot_id: int) -> None:
        out = os.path.join(self.path, "state", f"v{snapshot_id}")
        df.coalesce(1).write.mode("overwrite").parquet(out)
        for v in self._versions()[:-2]:  # keep previous for crash recovery
            shutil.rmtree(os.path.join(self.path, "state", f"v{v}"),
                          ignore_errors=True)

    def state(self, spark: SparkSession) -> DataFrame:
        """The maintained aggregate as of ``applied_snapshot_id()``,
        with group/sum columns renamed POSITIONALLY to their current
        schema names — state files written before a DDL rename stay
        readable without rewriting (same trick as the lake's field-id
        column resolution)."""
        raw = spark.read.parquet(
            os.path.join(self.path, "state", f"v{self.applied_snapshot_id()}")
        )
        gs, ss = self.group_cols, self.sum_cols
        cols = raw.columns  # written as [g1..gn, n_rows, sum_1..sum_m]
        return raw.select(
            *[F.col(cols[i]).alias(g) for i, g in enumerate(gs)],
            F.col("n_rows"),
            *[F.col(cols[len(gs) + 1 + i]).alias(f"sum_{c}")
              for i, c in enumerate(ss)],
        )

    # --------------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession) -> int:
        """Advance the view to the table's head snapshot; returns the
        snapshot id the state now reflects. No-op when already there
        (or when head's state version exists from a crashed retry)."""
        applied = self.applied_snapshot_id()
        head = self.table.io.head_snapshot_id()
        if head == applied:
            return head
        cdf = self.table.changes(spark, from_snapshot_id=applied,
                                 to_snapshot_id=head, include_old_values=True)
        gs = self.group_cols

        def contrib(side: str, sign: int, types: list[str]) -> DataFrame:
            return cdf.filter(F.col("change_type").isin(*types)).select(
                *[F.col(f"{side}_{g}").alias(g) for g in gs],
                F.lit(sign).cast("long").alias("d_rows"),
                *[(F.lit(sign) * F.coalesce(
                    F.col(f"{side}_{c}").cast(_DEC), F.lit(0).cast(_DEC)))
                  .cast(_DEC).alias(f"d_{c}") for c in self.sum_cols],
            )

        delta = (
            contrib("old", -1, ["delete", "update"])
            .unionByName(contrib("new", 1, ["insert", "update"]))
            .groupBy(*gs)
            .agg(F.sum("d_rows").alias("d_rows"),
                 *[F.sum(f"d_{c}").cast(_DEC).alias(f"d_{c}")
                   for c in self.sum_cols])
        )
        cur = self.state(spark)
        cond = None
        for g in gs:  # null-safe: a NULL group is a group like any other
            eq = cur[g].eqNullSafe(delta[g])
            cond = eq if cond is None else (cond & eq)
        dec0 = F.lit(0).cast(_DEC)
        merged = cur.join(delta, cond, "full_outer").select(
            *[F.coalesce(cur[g], delta[g]).alias(g) for g in gs],
            (F.coalesce(cur["n_rows"], F.lit(0))
             + F.coalesce(delta["d_rows"], F.lit(0))).alias("n_rows"),
            *[(F.coalesce(cur[f"sum_{c}"], dec0)
               + F.coalesce(delta[f"d_{c}"], dec0)).cast(_DEC)
              .alias(f"sum_{c}") for c in self.sum_cols],
        ).filter(F.col("n_rows") > 0)
        self._write_state(merged, head)
        return head
