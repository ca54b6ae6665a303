"""On-disk metadata format: schemas with field ids, snapshots, HEAD.

Layout of a table directory::

    <table>/
      data/s<snapshot>/_bucket=<b>/part-*.parquet   # immutable data files
      _meta/snapshot-<n>.json                        # immutable snapshots
      _meta/HEAD                                     # atomic pointer

A snapshot json is self-contained: it embeds the full schema history
(version → fields) and the full manifest (every live data file with
its bucket, row count and the schema version it was written under), so
reading any snapshot needs exactly one metadata file. At 10^10-event
scale the manifest would be split into Iceberg-style manifest files +
a manifest list; the single-json form keeps the same information
content and commit protocol.

Commit protocol (crash-safe, single-writer):
  1. data files are written under ``data/s<next>/`` (never referenced
     until the snapshot commits — a crash leaves ignorable orphans);
  2. ``snapshot-<n>.json`` is written to a temp name and ``os.replace``d;
  3. ``HEAD`` is swapped by ``os.replace`` (atomic on POSIX).
A reader always follows HEAD → snapshot json → manifest, so it sees
either the old or the new snapshot, never a torn state.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass


@dataclass
class Field:
    """A schema field with a stable id (survives renames)."""

    id: int
    name: str
    type: str  # Spark DDL type string, e.g. "string", "binary", "timestamp"
    nullable: bool = True


class TableMetadataIO:
    """Reads/writes the _meta directory of one table."""

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.meta_dir = os.path.join(table_path, "_meta")
        self.data_dir = os.path.join(table_path, "data")

    # -- paths ---------------------------------------------------------------
    def snapshot_path(self, snapshot_id: int) -> str:
        return os.path.join(self.meta_dir, f"snapshot-{snapshot_id:08d}.json")

    def head_path(self) -> str:
        return os.path.join(self.meta_dir, "HEAD")

    def commit_data_dir(self, snapshot_id: int) -> str:
        return os.path.join(self.data_dir, f"s{snapshot_id:08d}")

    # -- io ------------------------------------------------------------------
    def init_dirs(self) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    def exists(self) -> bool:
        return os.path.exists(self.head_path())

    def head_snapshot_id(self) -> int:
        with open(self.head_path(), encoding="utf-8") as f:
            return int(f.read().strip())

    def read_snapshot(self, snapshot_id: int | None = None) -> dict:
        if snapshot_id is None:
            snapshot_id = self.head_snapshot_id()
        with open(self.snapshot_path(snapshot_id), encoding="utf-8") as f:
            return json.load(f)

    def write_snapshot_and_swap_head(self, snap: dict) -> None:
        """Steps 2+3 of the commit protocol: immutable snapshot json,
        then atomic HEAD swap."""
        sid = snap["snapshot_id"]
        snap_path = self.snapshot_path(sid)
        tmp = snap_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(snap, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, snap_path)

        head_tmp = self.head_path() + ".tmp"
        with open(head_tmp, "w", encoding="utf-8") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.replace(head_tmp, self.head_path())

    # -- schema helpers ------------------------------------------------------
    @staticmethod
    def fields_to_json(fields: list[Field]) -> list[dict]:
        return [asdict(f) for f in fields]

    @staticmethod
    def fields_from_json(raw: list[dict]) -> list[Field]:
        return [Field(**f) for f in raw]
