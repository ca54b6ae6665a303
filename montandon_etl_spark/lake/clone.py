"""Portable snapshot export / import — ship a consistent table
snapshot between lakes without replaying its changelog.

``export_snapshot`` copies exactly the manifest-listed data files of
one committed snapshot (parquet needs no rewrite — the clone is
byte-identical by construction) plus everything a reader needs —
every schema version (older files conform at read through the same
field-id machinery as in the source), table properties, and the
per-file manifest entries with their pruning stats — into one
self-contained directory. ``clone.json`` is written LAST via atomic
rename: it is the commit marker, so a torn export is invisible to
``import_snapshot`` (the pstore/manifest discipline used everywhere
else in this lake).

``import_snapshot`` materializes the clone as a NEW table: snapshot 0
(create) carrying the source's schemas/properties, then snapshot 1
(type ``import``) whose bucket manifests list the copied files. The
imported table is fully live — it reads identically to the source
snapshot and accepts further merges/DDL that diverge independently.
The batch ledger restarts (``committed_max_batch_id = -1``): a clone
is a new stream consumer, not a resumed one.

Scale note: export/import move file BYTES and O(files) metadata —
no Spark job, no row rewrite, no shuffle; at 100 TB this is a pure
(parallelizable) object-store copy, which is the point.

Reference lineage: the reference's export surface is per-source dumps
re-ingested elsewhere (apps/etl management commands); this is the
transactional-table equivalent.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from montandon_etl_spark.lake.table import SnapshotTable

CLONE_FORMAT = "montandon-clone"
CLONE_VERSION = 1


def export_snapshot(table: SnapshotTable, dest: str,
                    snapshot_id: int | str | None = None) -> dict:
    """Export one committed snapshot (by id, tag name, or None=head)
    into ``dest``. Returns the clone descriptor."""
    snap = table.snapshot(snapshot_id)
    entries = table.manifest_entries(snap["snapshot_id"])
    os.makedirs(os.path.join(dest, "data"), exist_ok=True)
    new_entries = []
    for i, e in enumerate(entries):
        src = os.path.join(table.path, e["path"])
        rel = os.path.join(
            "data", f"f{i:06d}-{os.path.basename(e['path'])}")
        tmp = os.path.join(dest, rel + ".tmp")
        shutil.copyfile(src, tmp)
        os.replace(tmp, os.path.join(dest, rel))
        new_entries.append({**e, "path": rel})
    desc = {
        "format": CLONE_FORMAT,
        "version": CLONE_VERSION,
        "source_snapshot_id": snap["snapshot_id"],
        "schema_version": snap["schema_version"],
        "schemas": snap["schemas"],
        "properties": snap["properties"],
        "entries": new_entries,
    }
    tmp = os.path.join(dest, "clone.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(desc, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(dest, "clone.json"))
    return desc


def import_snapshot(src: str, path: str) -> SnapshotTable:
    """Materialize an exported clone as a new, fully-live table at
    ``path``. A directory without ``clone.json`` (torn export) is
    rejected.

    Crash recovery: the import commits through the lake's atomic
    head swap, so a crash mid-import leaves either no table or a
    valid empty table (snapshot 0) plus unreferenced file copies —
    never a half-readable import. Re-running against the leftover
    directory fails with FileExistsError by design (an import is not
    resumable state): delete the target directory and re-import.
    """
    marker = os.path.join(src, "clone.json")
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"{src}: no clone.json — not a committed export "
            f"(torn or foreign directory)")
    with open(marker, encoding="utf-8") as f:
        desc = json.load(f)
    if desc.get("format") != CLONE_FORMAT:
        raise ValueError(f"{src}: format {desc.get('format')!r} is not "
                         f"{CLONE_FORMAT!r}")
    if desc.get("version") != CLONE_VERSION:
        raise ValueError(f"{src}: clone version {desc.get('version')!r}"
                         f" != {CLONE_VERSION} — rebuild the export")

    t = SnapshotTable(path)
    if t.io.exists():
        raise FileExistsError(f"table already exists at {path}")
    t.io.init_dirs()
    snap0 = {
        "snapshot_id": 0,
        "parent_id": None,
        "type": "create",
        "batch_id": None,
        "schema_version": desc["schema_version"],
        "schemas": desc["schemas"],
        "manifest_files": {},
        "properties": dict(desc["properties"]),
        "offsets": None,
        "metrics": {"rows_written": 0, "buckets_rewritten": 0},
        "committed_max_batch_id": -1,
    }
    t.io.write_snapshot_and_swap_head(snap0)

    # copy data files into this table's own commit-attempt layout
    token = uuid.uuid4().hex[:8]
    ddir = t.io.commit_data_dir(1, token)
    os.makedirs(ddir, exist_ok=True)
    by_bucket: dict[int, list[dict]] = {}
    total_rows = 0
    for e in desc["entries"]:
        base = os.path.basename(e["path"])
        rel = os.path.relpath(os.path.join(ddir, base), path)
        tmp = os.path.join(path, rel + ".tmp")
        shutil.copyfile(os.path.join(src, e["path"]), tmp)
        os.replace(tmp, os.path.join(path, rel))
        by_bucket.setdefault(int(e["bucket"]), []).append(
            {**e, "path": rel})
        total_rows += int(e.get("rows") or 0)
    manifest_files = {
        str(b): t.io.write_bucket_manifest(1, b, ents, token=token)
        for b, ents in sorted(by_bucket.items())
    }
    snap1 = {
        "snapshot_id": 1,
        "parent_id": 0,
        "type": "import",
        "batch_id": None,
        "schema_version": desc["schema_version"],
        "schemas": desc["schemas"],
        "manifest_files": manifest_files,
        "properties": dict(desc["properties"]),
        "offsets": None,
        "metrics": {"rows_written": total_rows,
                    "buckets_rewritten": len(by_bucket),
                    "imported_from_snapshot": desc["source_snapshot_id"]},
        "committed_max_batch_id": -1,
    }
    t.io.write_snapshot_and_swap_head(snap1)
    return t
