"""Incremental view maintenance: a grouped aggregate (COUNT + SUMs,
optionally MIN/MAX) over a ``SnapshotTable``, advanced from the
change data feed instead of re-scanning the table.

The classic warehouse pattern (materialized view over a CDC table):
``refresh()`` reads ``table.changes(applied → head,
include_old_values=True)`` and applies per-group deltas —

- ``insert``  →  +1 row, +new values
- ``delete``  →  −1 row, −old values
- ``update``  →  −old contribution (under the OLD group value) and
  +new contribution (under the NEW one), so rows migrating between
  groups stay exact

— then full-outer-merges the deltas into the stored state and drops
zero-count groups. MIN/MAX measures are not self-inverting under
deletes, so they advance incrementally only on inserts
(least/greatest against the batch's candidates); a retraction whose
removed value ties-or-beats the stored extremum flags the group and
a second pass rescans ONLY the flagged groups' live rows (a
group-list semi-join against the table — the bounded fallback every
incremental-view engine needs for MIN/MAX retractions). Sums use DECIMAL(28,6) so add-then-subtract
cancels EXACTLY: after any batch sequence the state is bit-identical
to a full ``groupBy`` recompute over the live table (tested), which a
float sum cannot promise. NULL measures contribute 0 (the state's sum
column is the COALESCE(x, 0) sum).

State layout (VERDICT r3 Next #6): a ``VersionedPartitionStore``
partitioned by ``gp = hash(group tuple) % n_state_parts`` — a refresh
rewrites ONLY the partitions its delta's groups hash into, and reads
only those partitions' current state, so per-refresh state I/O is
O(touched groups' partitions) even at pathological group cardinality
(the NearDupIndex banded-store trick applied to aggregate state).
State columns are stored under POSITIONAL names (``g0..``, ``n_rows``,
``s0..``): a rename DDL needs no state rewrite — ``state()`` maps
positions to the pinned field ids' current names on read. The group
hash is computed over a fixed-name struct for the same reason.

Catch-up spans any number of commits in one refresh (the CDF is a
state diff, so intermediate churn collapses), but the applied
snapshot must still be within the table's retention window —
``expire_snapshots`` past it forces a re-bootstrap. Widening a pinned
group column's type requires a rebuild (old state partitions keep the
narrow physical type); measures are decimal-stored and unaffected.

Exactly-once: the state is versioned by the head snapshot id it
reflects; a refresh that finds its target version already written is
a no-op, a crash mid-refresh recomputes the same deltas against the
same two snapshots (reads resolve strictly below the target version),
and the store's gc always retains the previous generation.

Reference lineage: the reference recomputes its per-source monitoring
counts from scratch each run (apps/etl/models.py aggregate queries);
at 10^10 rows those become CDF-maintained views.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.dedup import hash60

_DEC = "decimal(28,6)"


def _canonical_gp(names: list[str], types: list[str],
                  n_parts: int) -> F.Column:
    """Deterministic state partition of a group tuple — hashed over a
    CANONICAL encoding, not ``to_json`` (whose output shifts with
    ``spark.sql.session.timeZone`` for timestamp groups and with
    ``spark.sql.jsonGenerator.ignoreNullFields`` for NULLs — a refresh
    under a different session config would then miss the group's
    existing state row and write a duplicate; ADVICE r4). Encoding:
    per field, ``n|`` for NULL else ``v<len>|<value>`` (length prefix
    kills boundary ambiguity between fields); timestamps render as
    ``unix_micros`` epoch integers (session-timezone-immune), every
    other type as its CAST-to-string, which is config-independent in
    Spark. Field order is pinned by position so a rename DDL never
    migrates groups. Shared by every CDF-maintained view in this
    module."""
    parts = []
    for c, t in zip(names, types):
        col = F.col(c)
        if t.lower() == "timestamp":
            s = F.unix_micros(col).cast("string")
        else:
            s = col.cast("string")
        parts.append(
            F.when(col.isNull(), F.lit("n|")).otherwise(
                F.concat(F.lit("v"), F.length(s).cast("string"),
                         F.lit("|"), s)))
    return F.pmod(hash60(F.concat(*parts)), F.lit(n_parts)).cast("int")


class MaterializedAggregate:
    """CDF-maintained ``GROUP BY group_cols`` view with ``n_rows`` and
    ``sum_<col>`` for each measure column. See module docstring."""

    GP_ALGO = 2  # canonical group-partition hash (see _gp)

    def __init__(self, path: str, table: SnapshotTable):
        self.path = path
        self.table = table
        with open(os.path.join(path, "mv.json")) as f:
            cfg = json.load(f)
        # columns are pinned by FIELD ID (the lake's rename-proof
        # handle); names resolve against the CURRENT schema on access
        self.group_ids: list[int] = cfg["group_ids"]
        self.sum_ids: list[int] = cfg["sum_ids"]
        self.min_ids: list[int] = cfg.get("min_ids", [])
        self.max_ids: list[int] = cfg.get("max_ids", [])
        self.n_state_parts: int = cfg.get("n_state_parts", 16)
        # gp algo 2 = canonical (session-config-independent) group
        # hash; a state partitioned by the old to_json hash would be
        # silently mis-pruned — fail loudly instead
        algo = cfg.get("gp_algo", 1)
        if algo != self.GP_ALGO:
            raise ValueError(
                f"materialized view at {path} was partitioned with "
                f"group-hash algo {algo}, this build uses "
                f"{self.GP_ALGO} — drop and re-create() the view")
        self.store = VersionedPartitionStore(
            os.path.join(path, "state"), "gp", self.n_state_parts)

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

    @property
    def min_cols(self) -> list[str]:
        return self._names(self.min_ids)

    @property
    def max_cols(self) -> list[str]:
        return self._names(self.max_ids)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, spark: SparkSession, table: SnapshotTable,
               group_cols: list[str], sum_cols: list[str],
               min_cols: list[str] | None = None,
               max_cols: list[str] | None = None,
               n_state_parts: int = 16) -> "MaterializedAggregate":
        """Bootstrap: one full aggregate over the table's CURRENT
        snapshot, stored as version v{head}; everything after is
        incremental. ``min_cols``/``max_cols`` add per-group MIN/MAX
        measures (maintained incrementally on inserts; a retraction of
        the current extremum rescans ONLY that group's live rows —
        VERDICT r4 Next #5)."""
        os.makedirs(os.path.join(path, "state"), exist_ok=True)
        by_name = {f.name: f.id for f in table.user_fields()}
        with open(os.path.join(path, "mv.json"), "w") as f:
            json.dump({"gp_algo": cls.GP_ALGO,
                       "group_ids": [by_name[c] for c in group_cols],
                       "sum_ids": [by_name[c] for c in sum_cols],
                       "min_ids": [by_name[c] for c in (min_cols or [])],
                       "max_ids": [by_name[c] for c in (max_cols or [])],
                       "n_state_parts": n_state_parts}, f)
        mv = cls(path, table)
        head = table.io.head_snapshot_id()
        full = mv._positional(mv._aggregate(table.read(spark)))
        touched = {r["gp"] for r in full.select("gp").distinct().collect()}
        mv.store.write(spark, full, head, touched, mv._state_schema())
        return mv

    # ----------------------------------------------------------------- state
    def _aggregate(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(F.coalesce(F.col(c).cast(_DEC), F.lit(0).cast(_DEC)))
              .cast(_DEC).alias(f"sum_{c}") for c in self.sum_cols],
            *[F.min(c).alias(f"min_{c}") for c in self.min_cols],
            *[F.max(c).alias(f"max_{c}") for c in self.max_cols],
        )

    def _group_types(self) -> list[str]:
        by_id = {f.id: f.type for f in self.table.user_fields()}
        return [by_id[i] for i in self.group_ids]

    def _measure_types(self, ids: list[int]) -> list[str]:
        by_id = {f.id: f.type for f in self.table.user_fields()}
        return [by_id[i] for i in ids]

    def _state_schema(self) -> str:
        return ", ".join(
            [f"g{i} {t}" for i, t in enumerate(self._group_types())]
            + ["n_rows bigint"]
            + [f"s{i} {_DEC}" for i in range(len(self.sum_ids))]
            + [f"mn{i} {t}" for i, t in
               enumerate(self._measure_types(self.min_ids))]
            + [f"mx{i} {t}" for i, t in
               enumerate(self._measure_types(self.max_ids))]
            + ["gp int"]
        )

    def _gp(self, names: list[str]) -> F.Column:
        """See ``_canonical_gp`` — session-config-independent group
        partition hash (ADVICE r4)."""
        return _canonical_gp(names, self._group_types(),
                             self.n_state_parts)

    def _positional(self, df: DataFrame) -> DataFrame:
        """(group..., n_rows, sum_..., min_..., max_...) under current
        names → stored positional layout + gp."""
        gs, ss = self.group_cols, self.sum_cols
        return df.select(
            *[F.col(g).alias(f"g{i}") for i, g in enumerate(gs)],
            F.col("n_rows"),
            *[F.col(f"sum_{c}").alias(f"s{i}") for i, c in enumerate(ss)],
            *[F.col(f"min_{c}").alias(f"mn{i}")
              for i, c in enumerate(self.min_cols)],
            *[F.col(f"max_{c}").alias(f"mx{i}")
              for i, c in enumerate(self.max_cols)],
            self._gp(gs).alias("gp"),
        )

    def applied_snapshot_id(self) -> int:
        vs = self.store.versions()
        if not vs:
            raise ValueError("materialized view has no state — create() it")
        return vs[-1]

    def _current_names(self, raw: DataFrame) -> DataFrame:
        gs, ss = self.group_cols, self.sum_cols
        return raw.select(
            *[F.col(f"g{i}").alias(g) for i, g in enumerate(gs)],
            F.col("n_rows"),
            *[F.col(f"s{i}").alias(f"sum_{c}") for i, c in enumerate(ss)],
            *[F.col(f"mn{i}").alias(f"min_{c}")
              for i, c in enumerate(self.min_cols)],
            *[F.col(f"mx{i}").alias(f"max_{c}")
              for i, c in enumerate(self.max_cols)],
        )

    def state(self, spark: SparkSession,
              part_filter: set[int] | None = None,
              below_version: int | None = None) -> DataFrame:
        """The maintained aggregate as of ``applied_snapshot_id()``,
        positional state columns mapped to the pinned field ids'
        CURRENT names — state written before a DDL rename stays
        readable without rewriting."""
        raw = self.store.read(spark, self._state_schema(),
                              part_filter=part_filter,
                              below_version=below_version)
        return self._current_names(raw)

    # --------------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession) -> int:
        """Advance the view to the table's head snapshot; returns the
        snapshot id the state now reflects. No-op when already there
        (or when head's state version exists from a crashed retry).
        Reads and rewrites ONLY the state partitions the delta's
        groups hash into."""
        applied = self.applied_snapshot_id()
        head = self.table.io.head_snapshot_id()
        if head == applied or head in self.store.versions():
            return head
        cdf = self.table.changes(spark, from_snapshot_id=applied,
                                 to_snapshot_id=head, include_old_values=True)
        gs = self.group_cols
        mm_cols = list(dict.fromkeys(self.min_cols + self.max_cols))

        def contrib(side: str, sign: int, types: list[str]) -> DataFrame:
            return cdf.filter(F.col("change_type").isin(*types)).select(
                *[F.col(f"{side}_{g}").alias(g) for g in gs],
                F.lit(sign).cast("long").alias("d_rows"),
                *[(F.lit(sign) * F.coalesce(
                    F.col(f"{side}_{c}").cast(_DEC), F.lit(0).cast(_DEC)))
                  .cast(_DEC).alias(f"d_{c}") for c in self.sum_cols],
                *[F.col(f"{side}_{c}").alias(f"v_{c}") for c in mm_cols],
            )

        def _ins(agg, c):  # extremum candidate among this batch's inserts
            return agg(F.when(F.col("d_rows") == 1, F.col(f"v_{c}")))

        def _rem(agg, c):  # extremum among this batch's removals
            return agg(F.when(F.col("d_rows") == -1, F.col(f"v_{c}")))

        delta = (
            contrib("old", -1, ["delete", "update"])
            .unionByName(contrib("new", 1, ["insert", "update"]))
            .groupBy(*gs)
            .agg(F.sum("d_rows").alias("d_rows"),
                 *[F.sum(f"d_{c}").cast(_DEC).alias(f"d_{c}")
                   for c in self.sum_cols],
                 *[_ins(F.min, c).alias(f"i_mn_{c}") for c in self.min_cols],
                 *[_rem(F.min, c).alias(f"r_mn_{c}") for c in self.min_cols],
                 *[_ins(F.max, c).alias(f"i_mx_{c}") for c in self.max_cols],
                 *[_rem(F.max, c).alias(f"r_mx_{c}") for c in self.max_cols])
            # lazy: the gp_parts collect below materializes it in the
            # same job (one job per refresh instead of two)
            .localCheckpoint(eager=False)
        )
        # the delta's state partitions: bounded driver metadata
        # (≤ n_state_parts ints) — everything else stays untouched.
        # The same job also answers "does ANY group carry a removal
        # candidate": when a refresh is insert-only (the common
        # streaming case) no group can flag a rescan, so the whole
        # live-table rescan subplan is skipped below — smaller plan,
        # no table scan in the write job.
        rm_flag = F.lit(False)
        for c in self.min_cols:
            rm_flag = rm_flag | F.col(f"r_mn_{c}").isNotNull()
        for c in self.max_cols:
            rm_flag = rm_flag | F.col(f"r_mx_{c}").isNotNull()
        gp_rows = (delta.select(self._gp(gs).alias("gp"),
                                rm_flag.alias("_rm"))
                   .groupBy("gp").agg(F.max("_rm").alias("rm")).collect())
        gp_parts = {r["gp"] for r in gp_rows}
        any_removal = any(bool(r["rm"]) for r in gp_rows)
        cur = self.state(spark, part_filter=gp_parts, below_version=head)
        cond = None
        for g in gs:  # null-safe: a NULL group is a group like any other
            eq = cur[g].eqNullSafe(delta[g])
            cond = eq if cond is None else (cond & eq)
        dec0 = F.lit(0).cast(_DEC)
        # min/max advance incrementally on inserts (least/greatest with
        # the batch's candidates); a retraction that could have removed
        # the current extremum (removed value ⋚ stored extremum) flags
        # the group for a rescan of ONLY its live rows below
        rescan = F.lit(False)
        for c in self.min_cols:
            rescan = rescan | (delta[f"r_mn_{c}"].isNotNull()
                               & cur[f"min_{c}"].isNotNull()
                               & (delta[f"r_mn_{c}"] <= cur[f"min_{c}"]))
        for c in self.max_cols:
            rescan = rescan | (delta[f"r_mx_{c}"].isNotNull()
                               & cur[f"max_{c}"].isNotNull()
                               & (delta[f"r_mx_{c}"] >= cur[f"max_{c}"]))
        merged = cur.join(delta, cond, "full_outer").select(
            *[F.coalesce(cur[g], delta[g]).alias(g) for g in gs],
            (F.coalesce(cur["n_rows"], F.lit(0))
             + F.coalesce(delta["d_rows"], F.lit(0))).alias("n_rows"),
            *[(F.coalesce(cur[f"sum_{c}"], dec0)
               + F.coalesce(delta[f"d_{c}"], dec0)).cast(_DEC)
              .alias(f"sum_{c}") for c in self.sum_cols],
            *[F.least(cur[f"min_{c}"], delta[f"i_mn_{c}"])
              .alias(f"min_{c}") for c in self.min_cols],
            *[F.greatest(cur[f"max_{c}"], delta[f"i_mx_{c}"])
              .alias(f"max_{c}") for c in self.max_cols],
            rescan.alias("_rescan"),
        ).filter(F.col("n_rows") > 0)
        if mm_cols and not any_removal:
            # insert-only delta: no group can flag a rescan (the flag
            # requires a removal candidate), so min/max advanced purely
            # incrementally above — drop the all-False marker
            merged = merged.drop("_rescan")
        elif mm_cols:
            # lazy: materialized by the store write's single action;
            # both consumers below share the one checkpointed RDD
            merged = merged.localCheckpoint(eager=False)
            resc = merged.filter(F.col("_rescan")).select(*gs).distinct()
            live = self.table.read(spark)
            jc = None
            for g in gs:
                eq = live[g].eqNullSafe(resc[g])
                jc = eq if jc is None else (jc & eq)
            rc = (live.join(resc, jc, "inner")
                  .select(*[live[g] for g in gs],
                          *[live[c] for c in mm_cols])
                  .groupBy(*gs)
                  .agg(*[F.min(c).alias(f"rc_mn_{c}")
                         for c in self.min_cols],
                       *[F.max(c).alias(f"rc_mx_{c}")
                         for c in self.max_cols]))
            jc2 = None
            for g in gs:
                eq = merged[g].eqNullSafe(rc[g])
                jc2 = eq if jc2 is None else (jc2 & eq)
            merged = merged.join(rc, jc2, "left").select(
                *[merged[g] for g in gs],
                merged["n_rows"],
                *[merged[f"sum_{c}"] for c in self.sum_cols],
                *[F.when(merged["_rescan"], rc[f"rc_mn_{c}"])
                  .otherwise(merged[f"min_{c}"]).alias(f"min_{c}")
                  for c in self.min_cols],
                *[F.when(merged["_rescan"], rc[f"rc_mx_{c}"])
                  .otherwise(merged[f"max_{c}"]).alias(f"max_{c}")
                  for c in self.max_cols],
            )
        else:
            merged = merged.drop("_rescan")
        self.store.write(spark, self._positional(merged), head, gp_parts,
                         self._state_schema())
        self.store.gc()
        return head


class DistinctCountView:
    """CDF-maintained per-group APPROX-DISTINCT view — the aggregate
    ``MaterializedAggregate`` cannot express (COUNT DISTINCT is not
    self-inverting under deletes, and exact per-group value sets are
    O(data) state). State = the deterministic-HLL register table
    ``(group..., j, mj)`` from ``operators/sketches.hll_registers``:
    m = 2^p rows per group REGARDLESS of data volume, partitioned by
    the same canonical group hash as ``MaterializedAggregate`` so a
    refresh reads/rewrites only the partitions its delta's groups hash
    into.

    Maintenance semantics (the sketch-IVM split production systems
    use — HLL unions are exact, retractions are not):

    - insert of (group, value) → per-register MAX-merge of the value's
      (j, rank) cell: EXACT (register state after any insert sequence
      ≡ recompute, by max's commutativity/idempotence).
    - delete → a register max cannot be un-maxed without knowing
      whether another LIVE value still achieves it, so a retraction
      whose (j, rank) TIES the stored register max flags the group and
      a second pass rebuilds ONLY flagged groups' registers from their
      live rows (a group-list join against the table — the same
      bounded fallback ``MaterializedAggregate`` uses for MIN/MAX).
      A retraction strictly below the stored max provably cannot
      change the register and is skipped. A (group, j, rank) cell that
      ALSO has an insert in the same batch is guaranteed live at head
      (the CDF is a state diff), so it never flags — value-unchanged
      updates and same-batch re-inserts cost nothing.
    - update → retraction under the old (group, value) + insert under
      the new one, so group migrations stay exact.

    After ANY batch sequence the register table is bit-identical to
    ``hll_registers`` recomputed over the live table (tested), hence
    ``estimate()`` is bit-identical to a from-scratch
    ``hll_distinct`` — the view is oracle-checkable end to end.

    Exactly-once / crash-retry / rename-proofing follow
    ``MaterializedAggregate``: versions keyed by the reflected
    snapshot id, reads resolve strictly below the target version,
    group and value columns pinned by FIELD ID, positional state
    column names.

    Reference lineage: the reference's monitoring counts distinct
    dimensions with exact SQL per run (apps/etl/models.py); at 10^10
    rows per-group distinct users/domains become a maintained sketch.
    """

    GP_ALGO = 2

    def __init__(self, path: str, table: SnapshotTable):
        self.path = path
        self.table = table
        with open(os.path.join(path, "dv.json")) as f:
            cfg = json.load(f)
        algo = cfg.get("gp_algo", 1)
        if algo != self.GP_ALGO:
            raise ValueError(
                f"distinct-count view at {path} was partitioned with "
                f"group-hash algo {algo}, this build uses "
                f"{self.GP_ALGO} — drop and re-create() the view")
        self.group_ids: list[int] = cfg["group_ids"]
        self.value_id: int = cfg["value_id"]
        self.p: int = cfg["p"]
        self.n_state_parts: int = cfg.get("n_state_parts", 16)
        self.store = VersionedPartitionStore(
            os.path.join(path, "state"), "gp", self.n_state_parts)

    def _names(self, ids: list[int]) -> list[str]:
        by_id = {f.id: f.name for f in self.table.user_fields()}
        missing = [i for i in ids if i not in by_id]
        if missing:
            raise ValueError(
                f"distinct-count view at {self.path} pins field id(s) "
                f"{missing} that no longer resolve against the table's "
                f"current schema — drop and re-create() the view")
        return [by_id[i] for i in ids]

    @property
    def group_cols(self) -> list[str]:
        return self._names(self.group_ids)

    @property
    def value_col(self) -> str:
        return self._names([self.value_id])[0]

    def _group_types(self) -> list[str]:
        by_id = {f.id: f.type for f in self.table.user_fields()}
        return [by_id[i] for i in self.group_ids]

    def _gp(self, names: list[str]) -> F.Column:
        return _canonical_gp(names, self._group_types(),
                             self.n_state_parts)

    def _state_schema(self) -> str:
        return ", ".join(
            [f"g{i} {t}" for i, t in enumerate(self._group_types())]
            + ["j int", "mj int", "gp int"])

    def _positional(self, reg: DataFrame) -> DataFrame:
        gs = self.group_cols
        return reg.select(
            *[F.col(g).alias(f"g{i}") for i, g in enumerate(gs)],
            "j", "mj", self._gp(gs).alias("gp"))

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, spark: SparkSession, table: SnapshotTable,
               group_cols: list[str], value_col: str, p: int = 6,
               n_state_parts: int = 16) -> "DistinctCountView":
        """Bootstrap: one ``hll_registers`` pass over the table's
        CURRENT snapshot, stored as version v{head}; everything after
        is incremental."""
        from montandon_etl_spark.operators.sketches import (
            _hll_dims, hll_registers)

        _hll_dims(p)  # validate
        os.makedirs(os.path.join(path, "state"), exist_ok=True)
        by_name = {f.name: f.id for f in table.user_fields()}
        with open(os.path.join(path, "dv.json"), "w") as f:
            json.dump({"gp_algo": cls.GP_ALGO,
                       "group_ids": [by_name[c] for c in group_cols],
                       "value_id": by_name[value_col], "p": p,
                       "n_state_parts": n_state_parts}, f)
        dv = cls(path, table)
        head = table.io.head_snapshot_id()
        full = dv._positional(hll_registers(
            table.read(spark), group_cols, value_col, p))
        touched = {r["gp"] for r in full.select("gp").distinct().collect()}
        dv.store.write(spark, full, head, touched, dv._state_schema())
        return dv

    def applied_snapshot_id(self) -> int:
        vs = self.store.versions()
        if not vs:
            raise ValueError("distinct-count view has no state — "
                             "create() it")
        return vs[-1]

    def state(self, spark: SparkSession,
              part_filter: set[int] | None = None,
              below_version: int | None = None) -> DataFrame:
        """The register table as of ``applied_snapshot_id()``, state
        columns mapped to the pinned field ids' CURRENT names."""
        gs = self.group_cols
        raw = self.store.read(spark, self._state_schema(),
                              part_filter=part_filter,
                              below_version=below_version)
        return raw.select(
            *[F.col(f"g{i}").alias(g) for i, g in enumerate(gs)],
            "j", "mj")

    def estimate(self, spark: SparkSession) -> DataFrame:
        """(group..., est_distinct) from the maintained registers —
        bit-identical to ``hll_distinct`` over the live table."""
        from montandon_etl_spark.operators.sketches import hll_estimate

        return hll_estimate(self.state(spark), self.group_cols, self.p)

    # --------------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession) -> int:
        """Advance the view to the table's head snapshot; returns the
        snapshot id the state now reflects. No-op when already there.
        Reads and rewrites ONLY the state partitions the delta's
        groups hash into; rebuilds registers ONLY for groups where a
        retraction tied a stored register max."""
        from montandon_etl_spark.operators.sketches import (
            _hll_dims, hll_registers)

        applied = self.applied_snapshot_id()
        head = self.table.io.head_snapshot_id()
        if head == applied or head in self.store.versions():
            return head
        cdf = self.table.changes(spark, from_snapshot_id=applied,
                                 to_snapshot_id=head,
                                 include_old_values=True)
        gs = self.group_cols
        vc = self.value_col
        m, kmax, _ = _hll_dims(self.p)

        def side(prefix: str, types: list[str], sign: int) -> DataFrame:
            return cdf.filter(F.col("change_type").isin(*types)).select(
                *[F.col(f"{prefix}_{g}").alias(g) for g in gs],
                F.col(f"{prefix}_{vc}").alias("_v"),
                F.lit(sign).alias("_sign"))

        rows = (side("old", ["delete", "update"], -1)
                .unionByName(side("new", ["insert", "update"], 1))
                .filter(F.col("_v").isNotNull()))
        w = F.expr(f"h div {m}")
        cells = (rows
                 .select(*gs, "_sign",
                         hash60(F.col("_v").cast("string")).alias("h"))
                 .select(*gs, "_sign",
                         F.pmod(F.col("h"), F.lit(m)).cast("int")
                         .alias("j"),
                         F.when(w == 0, F.lit(kmax))
                         .otherwise(F.lit(kmax) - F.length(F.bin(w)))
                         .cast("int").alias("mjc"))
                 .groupBy(*gs, "j", "mjc")
                 .agg(F.max(F.col("_sign") == 1).alias("any_ins"),
                      F.max(F.col("_sign") == -1).alias("any_del"))
                 # lazy: the gp_parts collect materializes it
                 .localCheckpoint(eager=False))
        # the delta's state partitions: bounded driver metadata
        # (≤ n_state_parts ints) — everything else stays untouched.
        # The same job also answers "does ANY cell carry a delete
        # without an insert": only such cells can tie a stored register
        # max, so an insert-only refresh (the common streaming case)
        # skips the flagged-group probe action AND the rebuild branch.
        gp_rows = (cells.select(
            self._gp(gs).alias("gp"),
            (F.col("any_del") & ~F.col("any_ins")).alias("_d"))
            .groupBy("gp").agg(F.max("_d").alias("d")).collect())
        gp_parts = {r["gp"] for r in gp_rows}
        any_del_only = any(bool(r["d"]) for r in gp_rows)
        cur = self.state(spark, part_filter=gp_parts, below_version=head)
        ins = (cells.filter(F.col("any_ins"))
               .groupBy(*gs, "j").agg(F.max("mjc").alias("imj")))
        cond = None
        for g in gs:  # null-safe: a NULL group is a group like any other
            eq = cur[g].eqNullSafe(ins[g])
            cond = eq if cond is None else (cond & eq)
        cond = (cond & (cur["j"] == ins["j"])) if cond is not None \
            else (cur["j"] == ins["j"])
        merged = cur.join(ins, cond, "full_outer").select(
            *[F.coalesce(cur[g], ins[g]).alias(g) for g in gs],
            F.coalesce(cur["j"], ins["j"]).alias("j"),
            F.greatest(cur["mj"], ins["imj"]).alias("mj"))
        # retractions that TIE a stored register max flag the group;
        # delete-only cells strictly below the stored max are skipped.
        # any_del_only (from the gp_parts job) gates the whole probe:
        # an insert-only delta has no delete-only cell, so no group can
        # flag — skip the probe action and the rebuild branch outright.
        flagged = None
        if any_del_only:
            rem = cells.filter(F.col("any_del") & ~F.col("any_ins"))
            jc = None
            for g in gs:
                eq = cur[g].eqNullSafe(rem[g])
                jc = eq if jc is None else (jc & eq)
            jc = jc & (cur["j"] == rem["j"]) & (cur["mj"] == rem["mjc"])
            flagged = (rem.join(cur, jc, "leftsemi")
                       .select(*gs).distinct().localCheckpoint(eager=False))
        if flagged is not None and flagged.limit(1).count() > 0:
            live = self.table.read(spark)
            fc = None
            for g in gs:
                eq = live[g].eqNullSafe(flagged[g])
                fc = eq if fc is None else (fc & eq)
            rebuilt = hll_registers(
                live.join(flagged, fc, "leftsemi"), gs, vc, self.p)
            ac = None
            for g in gs:
                eq = merged[g].eqNullSafe(flagged[g])
                ac = eq if ac is None else (ac & eq)
            merged = (merged.join(flagged, ac, "leftanti")
                      .unionByName(rebuilt))
        self.store.write(spark, self._positional(merged), head, gp_parts,
                         self._state_schema())
        self.store.gc()
        return head
