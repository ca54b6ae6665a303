"""On-disk metadata format: schemas with field ids, snapshots,
per-bucket manifest files, HEAD.

Layout of a table directory::

    <table>/
      data/s<snapshot>/_bucket=<b>/part-*.parquet   # immutable data files
      _meta/manifests/m-<snapshot>-b<bucket>.json    # immutable manifests
      _meta/snapshot-<n>.json                        # immutable snapshots
      _meta/HEAD                                     # atomic pointer

A snapshot json embeds the full schema history (version → fields) and a
``manifest_files`` map ``{bucket: manifest path}`` — the Iceberg
manifest-list shape. Each manifest file lists one bucket's live data
files (path, rows, schema version, key min/max). A commit writes NEW
manifest files only for the buckets it touched and carries the rest BY
REFERENCE, so per-commit metadata is O(touched buckets), not O(total
files): with 10^6 data files and a 10-bucket micro-batch, the old
inline form rewrote a million-entry json every commit (O(files²)
metadata bytes over the table's life); this form writes ~10 small
files. Reading a snapshot is HEAD → snapshot json → the bucket
manifests the query's pruning actually needs.

Commit protocol (crash-safe, optimistic-concurrency):
  1. data files are written under ``data/s<next>/``, manifest files
     under ``_meta/manifests/m-<next>-*`` (neither is referenced until
     the snapshot commits — a crash leaves ignorable orphans);
  2. under ``_meta/COMMIT.lock`` (O_EXCL; stale locks from crashed
     writers are broken after a grace period) the writer verifies
     HEAD still equals the snapshot's ``parent_id`` and atomically
     CLAIMS ``snapshot-<n>.json`` via ``os.link`` (EEXIST = another
     writer took this id) — a lost-update race raises
     :class:`CommitConflict` instead of silently clobbering HEAD;
  3. ``HEAD`` is swapped by ``os.replace`` (atomic on POSIX).
A reader always follows HEAD → snapshot json → manifests, so it sees
either the old or the new snapshot, never a torn state. A conflicted
writer re-reads HEAD and retries its commit; MERGE's batchId-keyed
idempotency makes the retry exactly-once. (On an object store the
lock+link pair maps to a catalog conditional-put / compare-and-swap —
the same shape Iceberg and Delta use; local POSIX primitives here.)
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


class CommitConflict(RuntimeError):
    """Another writer committed since this snapshot's parent was read
    (or claimed the same snapshot id). Re-read HEAD, rebuild the
    commit against it, and retry — MERGE retries are exactly-once via
    the committed-batchId check."""


class TableMetadataIO:
    """Reads/writes the _meta directory of one table."""

    #: a COMMIT.lock older than this is treated as left by a crashed
    #: writer and broken (a live commit holds it for milliseconds)
    LOCK_STALE_SEC = 60.0
    LOCK_WAIT_SEC = 10.0

    def __init__(self, table_path: str):
        self.table_path = table_path
        self.meta_dir = os.path.join(table_path, "_meta")
        self.data_dir = os.path.join(table_path, "data")

    # -- paths ---------------------------------------------------------------
    def snapshot_path(self, snapshot_id: int) -> str:
        return os.path.join(self.meta_dir, f"snapshot-{snapshot_id:08d}.json")

    def head_path(self) -> str:
        return os.path.join(self.meta_dir, "HEAD")

    def commit_data_dir(self, snapshot_id: int, token: str | None = None) -> str:
        """Staging/data directory of one commit ATTEMPT. ``token``
        (unique per attempt) keeps two writers racing the same next
        snapshot id in disjoint directories — without it the loser's
        overwrite-mode Spark write could clobber the winner's files
        before the winner even commits. Readers never construct these
        paths; they follow manifest entries."""
        name = f"s{snapshot_id:08d}" + (f"-{token}" if token else "")
        return os.path.join(self.data_dir, name)

    def manifests_dir(self) -> str:
        return os.path.join(self.meta_dir, "manifests")

    def refs_dir(self) -> str:
        return os.path.join(self.meta_dir, "refs")

    def bucket_manifest_relpath(
        self, snapshot_id: int, bucket: int, token: str | None = None
    ) -> str:
        tok = f"-{token}" if token else ""
        return os.path.join(
            "_meta", "manifests", f"m-{snapshot_id:08d}{tok}-b{bucket:05d}.json"
        )

    # -- io ------------------------------------------------------------------
    def init_dirs(self) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifests_dir(), exist_ok=True)

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

    def _acquire_commit_lock(self) -> int:
        import time

        lock = os.path.join(self.meta_dir, "COMMIT.lock")
        deadline = time.monotonic() + self.LOCK_WAIT_SEC
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                return fd
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                    if age > self.LOCK_STALE_SEC:
                        os.unlink(lock)  # crashed writer; race here is
                        continue  # re-resolved by the O_EXCL open
                except OSError:
                    continue  # holder released between stat and unlink
                if time.monotonic() > deadline:
                    raise CommitConflict(
                        f"commit lock held for >{self.LOCK_WAIT_SEC}s "
                        f"by another writer: {lock}"
                    )
                time.sleep(0.05)

    def write_snapshot_and_swap_head(self, snap: dict) -> None:
        """Steps 2+3 of the commit protocol: verify parent under the
        commit lock, atomically claim the immutable snapshot json,
        then swap HEAD. Raises :class:`CommitConflict` on a lost-update
        race with a concurrent writer."""
        from uuid import uuid4

        sid = snap["snapshot_id"]
        snap_path = self.snapshot_path(sid)
        # unique per ATTEMPT (pid is not enough: two writer threads in
        # one process would interleave writes into a shared tmp and the
        # winner could publish the loser's bytes)
        tmp = snap_path + f".tmp.{os.getpid()}.{uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(snap, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())

        fd = self._acquire_commit_lock()
        try:
            parent = snap.get("parent_id")
            if parent is not None:
                cur = self.head_snapshot_id()
                if cur != parent:
                    raise CommitConflict(
                        f"HEAD moved to {cur} while this commit was built "
                        f"against parent {parent}; re-read and retry"
                    )
            try:
                os.link(tmp, snap_path)  # atomic claim: EEXIST = taken
            except FileExistsError:
                # claimed but never published (HEAD behind sid) = a
                # writer crashed between claim and swap; the orphan is
                # unreachable (readers follow HEAD), so a retry may
                # reclaim it. HEAD at/past sid = genuinely committed.
                if self.head_snapshot_id() >= sid:
                    raise CommitConflict(
                        f"snapshot id {sid} already committed by another "
                        f"writer"
                    ) from None
                os.unlink(snap_path)
                os.link(tmp, snap_path)

            head_tmp = self.head_path() + ".tmp"
            with open(head_tmp, "w", encoding="utf-8") as f:
                f.write(str(sid))
                f.flush()
                os.fsync(f.fileno())
            os.replace(head_tmp, self.head_path())
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            os.close(fd)
            try:
                os.unlink(os.path.join(self.meta_dir, "COMMIT.lock"))
            except OSError:
                pass

    # -- tags ----------------------------------------------------------------
    _TAG_NAME = r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}"

    def write_tag(self, name: str, snapshot_id: int) -> None:
        """Create an immutable named ref → snapshot id. O_EXCL makes
        tag creation atomic and first-writer-wins (re-tagging raises
        FileExistsError — drop first)."""
        import re as _re

        if not _re.fullmatch(self._TAG_NAME, name):
            raise ValueError(f"invalid tag name {name!r}")
        os.makedirs(self.refs_dir(), exist_ok=True)
        fd = os.open(
            os.path.join(self.refs_dir(), name),
            os.O_CREAT | os.O_EXCL | os.O_WRONLY,
        )
        try:
            os.write(fd, str(snapshot_id).encode())
            os.fsync(fd)
        finally:
            os.close(fd)

    def read_tags(self) -> dict:
        refs = self.refs_dir()
        if not os.path.isdir(refs):
            return {}
        out = {}
        for name in os.listdir(refs):
            try:
                with open(os.path.join(refs, name), encoding="utf-8") as f:
                    out[name] = int(f.read().strip())
            except (OSError, ValueError):
                continue  # torn ref: ignorable, recreate it
        return out

    def delete_tag(self, name: str) -> None:
        os.unlink(os.path.join(self.refs_dir(), name))

    # -- manifests -------------------------------------------------------------
    def write_bucket_manifest(
        self, snapshot_id: int, bucket: int, entries: list[dict],
        token: str | None = None,
    ) -> str:
        """Write one bucket's manifest file (immutable — the name embeds
        the committing snapshot id and attempt token). Returns the
        table-relative path stored in the snapshot's manifest_files
        map."""
        rel = self.bucket_manifest_relpath(snapshot_id, bucket, token)
        path = os.path.join(self.table_path, rel)
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(entries, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return rel

    def read_bucket_manifest(self, relpath: str) -> list[dict]:
        with open(os.path.join(self.table_path, relpath), encoding="utf-8") as f:
            return json.load(f)

    def load_manifest(
        self, snap: dict, buckets: set[int] | None = None
    ) -> list[dict]:
        """All live data-file entries of a snapshot (optionally only for
        ``buckets`` — bucket pruning then never opens the other
        manifests). Accepts the legacy inline ``manifest`` list form."""
        if "manifest" in snap:  # legacy inline form
            entries = snap["manifest"]
            if buckets is not None:
                entries = [m for m in entries if m["bucket"] in buckets]
            return entries
        out: list[dict] = []
        for b_str, rel in sorted(snap.get("manifest_files", {}).items()):
            if buckets is not None and int(b_str) not in buckets:
                continue
            out.extend(self.read_bucket_manifest(rel))
        return out

    # -- schema helpers ------------------------------------------------------
    @staticmethod
    def fields_to_json(fields: list[Field]) -> list[dict]:
        return [asdict(f) for f in fields]

    @staticmethod
    def fields_from_json(raw: list[dict]) -> list[Field]:
        return [Field(**f) for f in raw]
