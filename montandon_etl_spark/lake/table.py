"""SnapshotTable: bucket-partitioned, snapshot-logged table with MERGE.

The engine's durable target table (the ``pages`` table of
BASELINE.json's input_hint). Replaces the reference's Postgres ledger
rows + filesystem blobs (apps/etl/models.py:40-97 + models.py:72) with
one columnar table whose payload lives *in* the data files and whose
change history lives in an append-only snapshot log.

Internal row schema = user schema + two system columns:

- ``seq: long``   — source sequence of the winning event (lineage +
  deterministic LWW tie-break; replaces the reference's autoincrement
  id ordering, apps/common/models.py:13);
- ``op: string``  — 'upsert' | 'delete'. Deletes are kept as
  **tombstones** so a late-arriving older upsert in a later batch
  cannot resurrect a deleted url (cross-batch LWW correctness);
  ``read()`` filters them out by default.

MERGE is copy-on-write per bucket: incoming events only rewrite the
buckets (``pmod(xxhash64(url), B)``) they touch; untouched data files
carry over into the new manifest unchanged.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.functions.extract import EXTRACTOR_VERSION
from montandon_etl_spark.lake.format import Field, TableMetadataIO
from montandon_etl_spark.operators.lww import lww_latest, lww_latest_salted

# The canonical pages-table user schema (field ids fixed at creation).
PAGES_FIELDS = [
    Field(1, "url", "string", False),
    Field(2, "warc_ts", "timestamp", False),
    Field(3, "html", "binary", True),
    Field(4, "text", "string", True),
    Field(5, "lang", "string", True),
]
_SYSTEM_FIELDS = [Field(1000, "seq", "bigint", False), Field(1001, "op", "string", False)]
_BUCKET_COL = "_bucket"


class SnapshotTable:
    """One snapshot-logged table rooted at ``path``."""

    def __init__(self, path: str):
        self.io = TableMetadataIO(path)
        self.path = path

    # ------------------------------------------------------------------ create
    @classmethod
    def create(
        cls,
        path: str,
        fields: list[Field] | None = None,
        n_buckets: int = 64,
        key_col: str = "url",
        order_cols: tuple[str, str] = ("warc_ts", "seq"),
        write_mode: str = "mor",
        compact_threshold: int = 8,
    ) -> "SnapshotTable":
        """Create an empty table: snapshot 0 with schema, no data files.

        ``write_mode``:
        - ``"mor"`` (merge-on-read, default): MERGE appends per-bucket
          delta files of batch winners; reads resolve LWW across
          deltas; buckets exceeding ``compact_threshold`` delta files
          are compacted (the LSM/Hudi-MOR shape — write-optimized,
          the right default for a 10^10-event ingest firehose);
        - ``"cow"`` (copy-on-write): MERGE rewrites affected buckets to
          exactly one resolved row per key — read-optimized.
        """
        if write_mode not in ("mor", "cow"):
            raise ValueError(f"write_mode must be mor|cow, got {write_mode}")
        t = cls(path)
        if t.io.exists():
            raise FileExistsError(f"table already exists at {path}")
        t.io.init_dirs()
        fields = list(fields if fields is not None else PAGES_FIELDS) + list(_SYSTEM_FIELDS)
        snap = {
            "snapshot_id": 0,
            "parent_id": None,
            "type": "create",
            "batch_id": None,
            "schema_version": 0,
            "schemas": {"0": TableMetadataIO.fields_to_json(fields)},
            "manifest": [],
            "properties": {
                "n_buckets": n_buckets,
                "key_col": key_col,
                "order_cols": list(order_cols),
                "write_mode": write_mode,
                "compact_threshold": compact_threshold,
                "extractor_version": EXTRACTOR_VERSION,
            },
            "offsets": None,
            "metrics": {"rows_written": 0, "buckets_rewritten": 0},
            "committed_max_batch_id": -1,
        }
        t.io.write_snapshot_and_swap_head(snap)
        return t

    # -------------------------------------------------------------- inspection
    def snapshot(self, snapshot_id: int | None = None) -> dict:
        return self.io.read_snapshot(snapshot_id)

    def history(self) -> list[dict]:
        """All snapshots, oldest first (the table's commit log)."""
        snaps = []
        sid = self.io.head_snapshot_id()
        while sid is not None:
            s = self.io.read_snapshot(sid)
            snaps.append(s)
            sid = s["parent_id"]
        return list(reversed(snaps))

    def current_fields(self, snap: dict | None = None) -> list[Field]:
        snap = snap or self.snapshot()
        return TableMetadataIO.fields_from_json(snap["schemas"][str(snap["schema_version"])])

    def user_fields(self, snap: dict | None = None) -> list[Field]:
        return [f for f in self.current_fields(snap) if f.id < 1000]

    @property
    def properties(self) -> dict:
        return self.snapshot()["properties"]

    # ------------------------------------------------------------------- read
    def _select_exprs_for_version(
        self, file_version: int, snap: dict
    ) -> list:
        """Column expressions mapping a file written under schema
        ``file_version`` to the snapshot's current schema, resolved by
        field id (Iceberg-style name mapping): renamed columns alias
        old name → new name; later-added columns materialize as NULL."""
        current = self.current_fields(snap)
        old = {
            f.id: f for f in TableMetadataIO.fields_from_json(snap["schemas"][str(file_version)])
        }
        exprs = []
        for f in current:
            if f.id in old:
                exprs.append(F.col(old[f.id].name).cast(f.type).alias(f.name))
            else:
                exprs.append(F.lit(None).cast(f.type).alias(f.name))
        return exprs

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        include_tombstones: bool = False,
        buckets: Iterable[int] | None = None,
        resolve: bool = True,
    ) -> DataFrame:
        """Read table state at a snapshot (HEAD by default).

        Only manifest files are read; bucket pruning (``buckets=``)
        skips files whose bucket can't match — the lake-format
        equivalent of partition pruning.

        On a merge-on-read table, ``resolve=True`` (default) applies
        the read-side LWW across delta files (one hash-agg keyed by
        url — partial-agg pre-reduces per delta file before the
        shuffle); ``resolve=False`` exposes the raw delta rows.
        """
        snap = self.snapshot(snapshot_id)
        manifest = snap["manifest"]
        if buckets is not None:
            bset = set(buckets)
            manifest = [m for m in manifest if m["bucket"] in bset]

        current = self.current_fields(snap)
        ddl = ", ".join(f"`{f.name}` {f.type}" for f in current)
        if not manifest:
            out = spark.createDataFrame([], schema=ddl)
        else:
            # group files by the schema version they were written under
            by_version: dict[int, list[str]] = {}
            for m in manifest:
                by_version.setdefault(m["schema_version"], []).append(
                    os.path.join(self.path, m["path"])
                )
            parts = []
            for ver, paths in sorted(by_version.items()):
                df = spark.read.parquet(*paths)
                parts.append(df.select(*self._select_exprs_for_version(ver, snap)))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        props = snap["properties"]
        if resolve and props.get("write_mode", "cow") == "mor":
            out = lww_latest(out, keys=props["key_col"], order_cols=props["order_cols"])
        if not include_tombstones:
            out = out.filter(F.col("op") == F.lit("upsert")).drop("op")
        return out

    # ------------------------------------------------------------------ merge
    def bucket_expr(self, col: str = "url"):
        n = self.properties["n_buckets"]
        return F.pmod(F.xxhash64(F.col(col)), F.lit(n)).cast("int")

    def merge(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int | None = None,
        use_salted: bool = False,
        n_salts: int = 16,
        enrich=None,
    ) -> dict | None:
        """MERGE a change-event batch into the table (LWW per key).

        ``batch_df`` columns: seq, url, warc_ts, op, html [, extra user
        columns]. ``seq`` must be unique per event (the changelog's
        global sequence — the contract a binlog/WAL gives you).
        ``enrich``, if given, is a DataFrame→DataFrame derivation (the
        text/lang extractor) applied ONLY to rows that win the merge —
        losers never pay the UDF.

        Exactly-once: with a monotonic ``batch_id`` (Structured
        Streaming epoch id), a batch at or below the committed
        high-water mark is a no-op (returns None) — the re-delivery
        dedup the reference approximates with instance_id reuse
        (apps/etl/etl_tasks/gdacs.py:39-53).

        Plan shape (the scale story):
          1. one columnar agg over the batch (seq range, affected
             buckets) — html is never read here (column pruning);
          2. LWW winner election on (key, order, side) KEYS ONLY —
             the single shuffle in the merge moves ~24 B/row, not
             payloads; map-side partial max_by pre-reduces hot urls;
          3. payload resolution by broadcast left-semi joins against
             the elected keys — wide columns (html/text) never enter
             a shuffle; the current side is read and rewritten in
             place (one-bucket-per-file layout → narrow write);
          4. copy-on-write of affected buckets only; untouched files
             carry over in the manifest.
        At 10^10 events the winner-key set of one micro-batch is what
        must fit in a broadcast (~batch size + matched keys); beyond
        that, swap the broadcast hint for a shuffle semi-join of keys —
        still payload-free.
        """
        snap = self.snapshot()
        if batch_id is not None and batch_id <= snap["committed_max_batch_id"]:
            return None  # duplicate delivery → no-op

        props = snap["properties"]
        key = props["key_col"]
        order_cols = props["order_cols"]
        seqk = order_cols[-1]  # unique event id → exact row match
        next_sid = snap["snapshot_id"] + 1

        write_mode = props.get("write_mode", "cow")
        elect = lww_latest_salted if use_salted else lww_latest
        kwargs = {"n_salts": n_salts} if use_salted else {}
        out_dir = self.io.commit_data_dir(next_sid)

        if write_mode == "mor":
            # ---- merge-on-read: append batch winners as delta files.
            # Election is within-batch only (no current-state read at
            # all — the read side resolves LWW across deltas). The
            # whole merge is ONE Spark job: scan → observe (lineage
            # offsets ride the same pass, no separate agg job) →
            # map-side partial LWW → one batch-bounded shuffle →
            # extract winners → write per-bucket deltas. Ingest cost
            # is O(batch), independent of table size — the property
            # that holds at 10^10 events.
            from pyspark.sql import Observation

            obs = Observation(f"merge-{next_sid}")
            observed = batch_df.observe(
                obs,
                F.min(seqk).alias("lo"),
                F.max(seqk).alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            # Repartition by BUCKET first, then elect per (bucket, key):
            # hash(bucket) partitioning already clusters every key (a
            # key's bucket is a pure function of it), so Catalyst plans
            # the groupBy WITHOUT a second exchange — payloads cross
            # the wire exactly once, and election + extraction + file
            # write fuse into the single post-shuffle stage.
            # 4 waves per core: hashing 64 buckets into exactly `cores`
            # partitions leaves ±30% bucket-skew stragglers; 4x width
            # load-balances the reduce+extract stage at small task cost
            n_part = max(
                1,
                min(
                    props["n_buckets"],
                    4 * int(spark.conf.get("spark.sql.shuffle.partitions")),
                ),
            )
            bucketed = observed.withColumn(
                _BUCKET_COL, self.bucket_expr(key)
            ).repartition(n_part, F.col(_BUCKET_COL))
            winners = elect(
                bucketed, keys=[_BUCKET_COL, key], order_cols=order_cols, **kwargs
            )
            if enrich is not None:
                winners = enrich(winners)
            winners = self._conform(winners, snap).withColumn(
                _BUCKET_COL, self.bucket_expr(key)
            )
            (
                winners.write.mode("overwrite")
                .partitionBy(_BUCKET_COL)
                .parquet(out_dir)
            )
            try:
                stats = obs.get
            except Exception:
                # empty input: the observed node saw no rows (e.g. a
                # zero-row DDL segment) and never published metrics
                stats = {"lo": None, "hi": None, "n": 0}
            if stats["n"] == 0:
                return None
            new_entries = self._scan_commit_dir(next_sid, snap["schema_version"])
            manifest = snap["manifest"] + new_entries
            buckets_rewritten = 0
        else:
            # 1. one columnar pass: offsets + affected buckets (html pruned)
            row = batch_df.agg(
                F.min(seqk).alias("lo"),
                F.max(seqk).alias("hi"),
                F.count("*").alias("n"),
                F.collect_set(self.bucket_expr(key)).alias("buckets"),
            ).collect()[0]
            if row["n"] == 0:
                return None
            affected = sorted(row["buckets"])
            stats = {"lo": row["lo"], "hi": row["hi"], "n": row["n"]}
            # ---- copy-on-write: rewrite affected buckets resolved.
            # 2. current state of affected buckets only (file pruning)
            current = self.read(
                spark, include_tombstones=True, buckets=affected
            ).withColumn(_BUCKET_COL, self.bucket_expr(key))

            # 3. LWW winner election on keys only. '_side' breaks exact
            #    (warc_ts, seq) ties in favor of the batch copy
            #    (idempotent re-delivery of the same event).
            keys_cur = current.select(
                F.col(key), *[F.col(c) for c in order_cols], F.lit(0).alias("_side")
            )
            keys_bat = batch_df.select(
                F.col(key), *[F.col(c) for c in order_cols], F.lit(1).alias("_side")
            )
            winkeys = elect(
                keys_cur.unionByName(keys_bat),
                keys=key,
                order_cols=order_cols + ["_side"],
                **kwargs,
            ).persist()
            try:
                keep_cur = winkeys.filter(F.col("_side") == 0).select(key, seqk)
                keep_bat = winkeys.filter(F.col("_side") == 1).select(key, seqk)
                kept_current = current.join(
                    F.broadcast(keep_cur), [key, seqk], "left_semi"
                )
                kept_batch = batch_df.join(
                    F.broadcast(keep_bat), [key, seqk], "left_semi"
                )
                # 4. derive payload columns for winners only
                if enrich is not None:
                    kept_batch = enrich(kept_batch)
                kept_batch = self._conform(kept_batch, snap).withColumn(
                    _BUCKET_COL, self.bucket_expr(key)
                )
                # 5. rewrite affected buckets: current side narrow
                #    (one-bucket-per-file), batch side one small shuffle
                merged = kept_current.unionByName(
                    kept_batch.repartition(
                        max(1, min(len(affected), 32)), F.col(_BUCKET_COL)
                    )
                )
                merged.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(out_dir)
            finally:
                winkeys.unpersist()
            new_entries = self._scan_commit_dir(next_sid, snap["schema_version"])
            carried = [m for m in snap["manifest"] if m["bucket"] not in set(affected)]
            manifest = carried + new_entries
            buckets_rewritten = len(affected)

        new_snap = {
            "snapshot_id": next_sid,
            "parent_id": snap["snapshot_id"],
            "type": "merge",
            "batch_id": batch_id,
            "schema_version": snap["schema_version"],
            "schemas": snap["schemas"],
            "manifest": manifest,
            "properties": props,
            "offsets": {"min_seq": stats["lo"], "max_seq": stats["hi"], "events": stats["n"]},
            "metrics": {
                "rows_written": sum(e["rows"] for e in new_entries),
                "buckets_rewritten": buckets_rewritten,
                "bucket_rows": {str(e["bucket"]): e["rows"] for e in new_entries},
            },
            "committed_max_batch_id": (
                max(snap["committed_max_batch_id"], batch_id)
                if batch_id is not None
                else snap["committed_max_batch_id"]
            ),
        }
        self.io.write_snapshot_and_swap_head(new_snap)

        # amortized compaction: any bucket over the delta-file budget
        # gets rewritten to one resolved file set (its own snapshot)
        if write_mode == "mor":
            counts: dict[int, int] = {}
            for m in manifest:
                counts[m["bucket"]] = counts.get(m["bucket"], 0) + 1
            over = sorted(
                b for b, c in counts.items() if c > props.get("compact_threshold", 8)
            )
            if over:
                self.compact(spark, buckets=over)
        return self.snapshot()

    def compact(self, spark: SparkSession, buckets: list[int] | None = None) -> dict:
        """Rewrite buckets' delta files to one resolved file each
        (read-side LWW materialized). Tombstones are preserved — a
        compaction must not forget deletes, or a late older upsert
        could resurrect a deleted key."""
        snap = self.snapshot()
        props = snap["properties"]
        if buckets is None:
            counts: dict[int, int] = {}
            for m in snap["manifest"]:
                counts[m["bucket"]] = counts.get(m["bucket"], 0) + 1
            buckets = sorted(b for b, c in counts.items() if c > 1)
        if not buckets:
            return snap
        next_sid = snap["snapshot_id"] + 1
        resolved = self.read(
            spark, include_tombstones=True, buckets=buckets, resolve=True
        ).withColumn(_BUCKET_COL, self.bucket_expr(props["key_col"]))
        out_dir = self.io.commit_data_dir(next_sid)
        (
            resolved.repartition(max(1, min(len(buckets), 32)), F.col(_BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(_BUCKET_COL)
            .parquet(out_dir)
        )
        new_entries = self._scan_commit_dir(next_sid, snap["schema_version"])
        carried = [m for m in snap["manifest"] if m["bucket"] not in set(buckets)]
        new_snap = {
            "snapshot_id": next_sid,
            "parent_id": snap["snapshot_id"],
            "type": "compact",
            "batch_id": None,
            "schema_version": snap["schema_version"],
            "schemas": snap["schemas"],
            "manifest": carried + new_entries,
            "properties": props,
            "offsets": snap["offsets"],
            "metrics": {
                "rows_written": sum(e["rows"] for e in new_entries),
                "buckets_rewritten": len(buckets),
                "bucket_rows": {str(e["bucket"]): e["rows"] for e in new_entries},
            },
            "committed_max_batch_id": snap["committed_max_batch_id"],
        }
        self.io.write_snapshot_and_swap_head(new_snap)
        return new_snap

    def _conform(self, df: DataFrame, snap: dict) -> DataFrame:
        """Project ``df`` onto the snapshot's internal schema. A field
        missing by its current name may arrive under a historical name
        (a producer that predates a RENAME) — resolved via field-id
        name history; otherwise NULL."""
        history: dict[int, list[str]] = {}
        for ver_fields in snap["schemas"].values():
            for fj in ver_fields:
                names = history.setdefault(fj["id"], [])
                if fj["name"] not in names:
                    names.append(fj["name"])
        exprs = []
        for f in self.current_fields(snap):
            cands = [f.name] + [n for n in history.get(f.id, []) if n != f.name]
            src = next((n for n in cands if n in df.columns), None)
            exprs.append((F.col(src) if src else F.lit(None)).cast(f.type).alias(f.name))
        return df.select(*exprs)

    def _scan_commit_dir(self, snapshot_id: int, schema_version: int) -> list[dict]:
        """Enumerate data files a commit just wrote, with bucket + rows.
        Footer reads fan out over a thread pool — this runs on the
        driver between jobs, so serial I/O here is Amdahl overhead."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        out_dir = self.io.commit_data_dir(snapshot_id)
        paths = sorted(glob.glob(os.path.join(out_dir, f"{_BUCKET_COL}=*", "*.parquet")))

        def entry(p: str) -> dict | None:
            rows = pq.ParquetFile(p).metadata.num_rows
            if rows == 0:
                return None
            m = re.search(rf"{_BUCKET_COL}=(\d+)", p)
            return {
                "path": os.path.relpath(p, self.path),
                "bucket": int(m.group(1)),
                "rows": rows,
                "schema_version": schema_version,
            }

        with ThreadPoolExecutor(max_workers=16) as ex:
            return [e for e in ex.map(entry, paths) if e is not None]

    # -------------------------------------------------------------------- ddl
    def apply_ddl(self, op: str, field: str, new_name: str | None = None,
                  dtype: str | None = None, batch_id: int | None = None) -> dict:
        """Apply a schema-evolution event as a schema-only snapshot.

        add_column: new field gets the next unused user field id.
        rename_column: same field id, new name — existing data files
        remain readable (id-based mapping), no rewrite.
        """
        snap = self.snapshot()
        fields = self.current_fields(snap)
        if op == "add_column":
            if any(f.name == field for f in fields):
                raise ValueError(f"column {field} already exists")
            next_id = max([f.id for f in fields if f.id < 1000], default=0) + 1
            fields = fields[:-2] + [Field(next_id, field, dtype or "string", True)] + fields[-2:]
        elif op == "rename_column":
            hits = [f for f in fields if f.name == field]
            if not hits:
                raise ValueError(f"no such column {field}")
            hits[0].name = new_name
        else:
            raise ValueError(f"unknown ddl op {op}")

        next_version = snap["schema_version"] + 1
        schemas = dict(snap["schemas"])
        schemas[str(next_version)] = TableMetadataIO.fields_to_json(fields)
        new_snap = {
            "snapshot_id": snap["snapshot_id"] + 1,
            "parent_id": snap["snapshot_id"],
            "type": "schema",
            "ddl": {"op": op, "field": field, "new_name": new_name, "dtype": dtype},
            "batch_id": batch_id,
            "schema_version": next_version,
            "schemas": schemas,
            "manifest": snap["manifest"],
            "properties": snap["properties"],
            "offsets": snap["offsets"],
            "metrics": {"rows_written": 0, "buckets_rewritten": 0},
            "committed_max_batch_id": snap["committed_max_batch_id"],
        }
        self.io.write_snapshot_and_swap_head(new_snap)
        return new_snap
