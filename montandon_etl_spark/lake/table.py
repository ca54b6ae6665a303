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
    ) -> "SnapshotTable":
        """Create an empty table: snapshot 0 with schema, no data files."""
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
    ) -> DataFrame:
        """Read table state at a snapshot (HEAD by default).

        Only manifest files are read; bucket pruning (``buckets=``)
        skips files whose bucket can't match — the lake-format
        equivalent of partition pruning.
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
    ) -> dict | None:
        """MERGE a change-event batch into the table (LWW per key).

        ``batch_df`` columns: seq, url, warc_ts, op, html [, extra
        user columns e.g. text/lang/title if pre-extracted].

        Exactly-once: with a monotonic ``batch_id`` (Structured
        Streaming epoch id), a batch at or below the committed
        high-water mark is a no-op (returns None) — the re-delivery
        dedup the reference approximates with instance_id reuse
        (apps/etl/etl_tasks/gdacs.py:39-53).

        Plan shape (scale rationale):
          batch → map-side partial LWW → shuffle by url → final LWW
          (one shuffle); affected-bucket file pruning bounds the
          current-state scan; union + second LWW per url resolves
          batch-vs-table; one write per touched bucket.
        """
        snap = self.snapshot()
        if batch_id is not None and batch_id <= snap["committed_max_batch_id"]:
            return None  # duplicate delivery → no-op

        props = snap["properties"]
        key = props["key_col"]
        order_cols = props["order_cols"]
        next_sid = snap["snapshot_id"] + 1

        current_fields = self.current_fields(snap)
        # 1. conform batch to internal schema. A field missing by its
        #    current name may arrive under a historical name (a producer
        #    that predates a RENAME) — resolve via field-id name history;
        #    otherwise NULL.
        history: dict[int, list[str]] = {}
        for ver_fields in snap["schemas"].values():
            for fj in ver_fields:
                names = history.setdefault(fj["id"], [])
                if fj["name"] not in names:
                    names.append(fj["name"])
        exprs = []
        for f in current_fields:
            candidates = [f.name] + [n for n in history.get(f.id, []) if n != f.name]
            src = next((n for n in candidates if n in batch_df.columns), None)
            if src is None:
                exprs.append(F.lit(None).cast(f.type).alias(f.name))
            else:
                exprs.append(F.col(src).cast(f.type).alias(f.name))
        batch = batch_df.select(*exprs)

        # 2. within-batch LWW winners per key
        reduce = lww_latest_salted if use_salted else lww_latest
        kwargs = {"n_salts": n_salts} if use_salted else {}
        winners = reduce(batch, keys=key, order_cols=order_cols, **kwargs)
        winners = winners.withColumn(_BUCKET_COL, self.bucket_expr(key))
        winners.persist()
        try:
            # 3. affected buckets (small: bounded by n_buckets)
            affected = sorted(
                r[0] for r in winners.select(_BUCKET_COL).distinct().collect()
            )
            if not affected:
                winners.unpersist()
                return None

            # 4. current state of affected buckets only (file pruning);
            #    bucket is a pure function of the key, recompute on read
            current = self.read(
                spark, include_tombstones=True, buckets=affected
            ).withColumn(_BUCKET_COL, self.bucket_expr(key))

            # 5. batch ∪ current, LWW again per key (tombstones compete,
            #    so a delete beats an older upsert across batches)
            merged = lww_latest(
                current.unionByName(winners), keys=key, order_cols=order_cols
            )

            # 6. copy-on-write: write merged rows of affected buckets
            out_dir = self.io.commit_data_dir(next_sid)
            (
                merged.repartition(max(1, min(len(affected), 32)), F.col(_BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(_BUCKET_COL)
                .parquet(out_dir)
            )
        finally:
            winners.unpersist()

        # 7. build manifest: carried-over files + new files
        new_entries = self._scan_commit_dir(next_sid, snap["schema_version"])
        carried = [m for m in snap["manifest"] if m["bucket"] not in set(affected)]
        manifest = carried + new_entries

        stats = batch_df.agg(
            F.min("seq").alias("lo"), F.max("seq").alias("hi"), F.count("*").alias("n")
        ).collect()[0]
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
                "buckets_rewritten": len(affected),
                "bucket_rows": {str(e["bucket"]): e["rows"] for e in new_entries},
            },
            "committed_max_batch_id": (
                max(snap["committed_max_batch_id"], batch_id)
                if batch_id is not None
                else snap["committed_max_batch_id"]
            ),
        }
        self.io.write_snapshot_and_swap_head(new_snap)
        return new_snap

    def _scan_commit_dir(self, snapshot_id: int, schema_version: int) -> list[dict]:
        """Enumerate data files a commit just wrote, with bucket + rows."""
        import pyarrow.parquet as pq

        out_dir = self.io.commit_data_dir(snapshot_id)
        entries = []
        for p in sorted(glob.glob(os.path.join(out_dir, f"{_BUCKET_COL}=*", "*.parquet"))):
            m = re.search(rf"{_BUCKET_COL}=(\d+)", p)
            rows = pq.ParquetFile(p).metadata.num_rows
            if rows == 0:
                continue
            entries.append(
                {
                    "path": os.path.relpath(p, self.path),
                    "bucket": int(m.group(1)),
                    "rows": rows,
                    "schema_version": schema_version,
                }
            )
        return entries

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
