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
from montandon_etl_spark.lake.format import CommitConflict, Field, TableMetadataIO
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
        key_bloom_bits: int = 0,
        key_bloom_hashes: int = 4,
        ndv_cols: list[str] | None = None,
        ndv_p: int = 8,
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

        ``key_bloom_bits`` (opt-in, 0 = off): every commit additionally
        stamps a per-data-file Bloom filter over the key column into
        its manifest entries (``key_bloom_hashes`` Kirsch–Mitzenmacher
        probes into a ``key_bloom_bits``-bit filter of 60-bit words).
        ``read(point_lookup=key)`` then skips files whose filter proves
        the key absent — the data-skipping min/max stats can't give for
        UN-compacted MOR deltas, whose key ranges are essentially the
        whole keyspace. Cost: one extra key-column-only Spark job per
        commit (breaks the one-job-per-batch MOR property — that's why
        it's opt-in; enable it on tables serving point reads).

        ``ndv_cols`` (opt-in): per-file deterministic-HLL registers
        (precision ``ndv_p``) over the listed columns land in the
        manifest — the ANALYZE-style distinct-count statistic beside
        min/max and the key Bloom. ``column_ndv(col)`` then estimates
        a column's NDV metadata-only (registers are max-mergeable
        across files). Same opt-in cost shape as the key Bloom.
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
            "manifest_files": {},
            "properties": {
                "n_buckets": n_buckets,
                "key_col": key_col,
                "order_cols": list(order_cols),
                "write_mode": write_mode,
                "compact_threshold": compact_threshold,
                "extractor_version": EXTRACTOR_VERSION,
                **({"key_bloom_bits": int(key_bloom_bits),
                    "key_bloom_hashes": int(key_bloom_hashes)}
                   if key_bloom_bits else {}),
                **({"ndv_cols": list(ndv_cols), "ndv_p": int(ndv_p)}
                   if ndv_cols else {}),
            },
            "offsets": None,
            "metrics": {"rows_written": 0, "buckets_rewritten": 0},
            "committed_max_batch_id": -1,
        }
        t.io.write_snapshot_and_swap_head(snap)
        return t

    # -------------------------------------------------------------- inspection
    def snapshot(self, snapshot_id: int | str | None = None) -> dict:
        """Snapshot by id, by TAG NAME (str), or HEAD (None)."""
        if isinstance(snapshot_id, str):
            tags = self.io.read_tags()
            if snapshot_id not in tags:
                raise KeyError(
                    f"no tag {snapshot_id!r}; have {sorted(tags)}")
            snapshot_id = tags[snapshot_id]
        return self.io.read_snapshot(snapshot_id)

    # -------------------------------------------------------------------- tags
    def tag(self, name: str, snapshot_id: int | None = None) -> int:
        """Pin a snapshot under an immutable name (HEAD by default).
        Tagged snapshots survive ``expire_snapshots`` — together with
        OCC commits this is the write-audit-publish primitive: commit,
        validate the snapshot, then tag it "published"; readers resolve
        the tag and never see an unaudited state. Re-tagging an
        existing name raises (tags are immutable; ``drop_tag`` first)."""
        sid = snapshot_id if snapshot_id is not None else self.io.head_snapshot_id()
        self.io.read_snapshot(sid)  # must exist (and not be expired)
        self.io.write_tag(name, sid)
        return sid

    def tags(self) -> dict:
        return self.io.read_tags()

    def drop_tag(self, name: str) -> None:
        self.io.delete_tag(name)

    def diff(
        self,
        spark: SparkSession,
        from_snapshot_id: int | str,
        to_snapshot_id: int | str | None = None,
        columns: Iterable[str] | None = None,
    ) -> DataFrame:
        """Row-level change feed between two snapshots: one row per
        key whose WINNING version changed, with ``change`` in
        added | deleted | updated and the payload columns twice
        (``old_<c>`` / ``new_<c>``; order columns always included).

        Scale shape: only buckets whose manifest file differs between
        the two snapshots are read AT ALL (carried-by-reference
        buckets are provably untouched — the same metadata diff that
        drives the incremental shard export), and both sides are
        column-projected, so the cost is O(changed data), not
        O(table). A compaction-only rewrite yields zero rows: the
        winning (order-cols) version of every key is unchanged, and
        unchanged keys are filtered out, not reported.

        Both snapshots must expose the requested columns (pass
        ``columns=`` to restrict after a schema change). Accepts
        snapshot ids or tag names.

        Reference parity: the reference's per-run "what changed"
        reporting (transform summaries) — here as a first-class
        time-travel operator over the snapshot log.
        """
        new_snap = self.snapshot(to_snapshot_id)
        old_snap = self.snapshot(from_snapshot_id)
        props = new_snap["properties"]
        key = props["key_col"]
        order_cols = list(props["order_cols"])
        a_mf = old_snap.get("manifest_files", {})
        b_mf = new_snap.get("manifest_files", {})
        changed = sorted({int(k) for k in set(a_mf) | set(b_mf)
                          if a_mf.get(k) != b_mf.get(k)})
        if columns is None:
            cols = [f.name for f in self.current_fields(new_snap)
                    if f.name not in (key, "op")]
        else:
            cols = list(columns)
        cols = list(dict.fromkeys([*order_cols, *cols]))
        types = {f.name: f.type for f in self.current_fields(new_snap)}
        out_ddl = (f"`{key}` {types[key]}, `change` string, "
                   + ", ".join(f"`old_{c}` {types[c]}, `new_{c}` {types[c]}"
                               for c in cols))
        if not changed:
            return spark.createDataFrame([], schema=out_ddl)

        to_ids = {f.name: f.id for f in self.current_fields(new_snap)}

        def side(sid: int | str | None, tag: str) -> DataFrame:
            # resolve the requested (to-side) names onto THIS side's
            # schema by field id — a key/column rename between the two
            # snapshots must not break the comparison
            snap_side = self.snapshot(sid)
            by_id = {f.id: f.name for f in self.current_fields(snap_side)}
            loc = {n: by_id.get(to_ids[n]) for n in [key, *cols]}
            want = [loc[n] for n in [key, *cols] if loc[n] is not None]
            d = self.read(spark, snapshot_id=sid, buckets=changed,
                          columns=want)
            return d.select(
                F.col(loc[key]).alias(key),
                F.lit(True).alias(f"_{tag}_present"),
                *[(F.col(loc[c]) if loc[c] is not None
                   else F.lit(None).cast(types[c])).alias(f"{tag}_{c}")
                  for c in cols])

        o = side(old_snap["snapshot_id"], "old")
        n = side(new_snap["snapshot_id"], "new")
        j = o.join(n, key, "full_outer")
        version_moved = None
        for c in order_cols:
            neq = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            version_moved = neq if version_moved is None \
                else (version_moved | neq)
        change = (
            F.when(F.col("_old_present").isNull(), F.lit("added"))
            .when(F.col("_new_present").isNull(), F.lit("deleted"))
            .when(version_moved, F.lit("updated")))
        return (j.withColumn("change", change)
                .filter(F.col("change").isNotNull())
                .select(key, "change",
                        *[x for c in cols
                          for x in (f"old_{c}", f"new_{c}")]))

    def history(self) -> list[dict]:
        """Retained snapshots, oldest first (the table's commit log).
        Stops at the expiry horizon: a parent pruned by
        ``expire_snapshots`` ends the walk instead of erroring."""
        snaps = []
        sid = self.io.head_snapshot_id()
        while sid is not None:
            try:
                s = self.io.read_snapshot(sid)
            except FileNotFoundError:
                break  # expired beyond the retention window
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
        self, file_version: int, snap: dict, current: list | None = None
    ) -> list:
        """Column expressions mapping a file written under schema
        ``file_version`` to the snapshot's current schema, resolved by
        field id (Iceberg-style name mapping): renamed columns alias
        old name → new name; later-added columns materialize as NULL.
        ``current`` (optionally pre-narrowed by ``read(columns=)``)
        bounds what the scan projects."""
        if current is None:
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

    def manifest_entries(
        self,
        snapshot_id: int | None = None,
        buckets: Iterable[int] | None = None,
        point_lookup: str | None = None,
        range_filters: dict | None = None,
    ) -> list[dict]:
        """The manifest after pruning: bucket pruning (partition-level —
        only the matching buckets' manifest files are even OPENED) then
        per-file key min/max pruning (file-level, Iceberg-style). A file
        written before stats existed (key_min/key_max absent or None) is
        conservatively kept.

        ``range_filters`` ({col: (lo, hi)}, either bound None for
        open-ended) prunes on the ``col_stats`` a Z-ordered compaction
        harvested. MOR-correctness guard: files are pruned ONLY inside
        buckets where every entry (a) came from ONE commit — i.e. the
        bucket was fully rewritten by that commit and holds exactly one
        live row per key — and (b) carries stats for every filtered
        column. With any later delta present, dropping a non-matching
        z-file could orphan the OLD version of a key the delta moved
        out of range... except the delta is exactly the file that would
        out-vote it, and if the delta itself is pruned the old in-range
        row resurfaces. One-commit buckets have no second version to
        resurrect, so file pruning there commutes with LWW. Mixed
        buckets are scanned whole (conservative, correct).
        """
        snap = self.snapshot(snapshot_id)
        bset = set(buckets) if buckets is not None else None
        manifest = self.io.load_manifest(snap, buckets=bset)
        if point_lookup is not None:
            from montandon_etl_spark.operators.sketches import bloom_test_sparse

            def _maybe_has_key(m: dict) -> bool:
                # min/max range test (sorted/compacted files), then the
                # per-file key Bloom (un-compacted MOR deltas, whose
                # ranges span the keyspace). Either proof of absence
                # skips the file; a file with neither stat is kept.
                # Safe under MOR without the one-commit guard: a pruned
                # file provably holds ZERO rows of this key (tombstones
                # included), so LWW over the remainder is unchanged.
                if (m.get("key_min") is not None
                        and m.get("key_max") is not None
                        and not (m["key_min"] <= point_lookup
                                 <= m["key_max"])):
                    return False
                kb = m.get("key_bloom")
                if kb:
                    return bloom_test_sparse(
                        dict((int(w), int(bits)) for w, bits in kb["w"]),
                        int(kb["m"]), int(kb["k"]), point_lookup)
                return True

            manifest = [m for m in manifest if _maybe_has_key(m)]
        if range_filters:
            norm = {
                c: (self._stat_norm(lo), self._stat_norm(hi))
                for c, (lo, hi) in range_filters.items()
            }
            by_bucket: dict[int, list[dict]] = {}
            for m in manifest:
                by_bucket.setdefault(m["bucket"], []).append(m)

            def matches(m: dict) -> bool:
                for c, (lo, hi) in norm.items():
                    mn, mx = m["col_stats"][c]
                    if mn is None or mx is None:
                        continue
                    if (lo is not None and mx < lo) or (hi is not None and mn > hi):
                        return False
                return True

            manifest = []
            for b, ents in sorted(by_bucket.items()):
                commits = {m["path"].split(os.sep)[1] for m in ents}
                prunable = len(commits) == 1 and all(
                    all(c in (m.get("col_stats") or {}) for c in norm)
                    for m in ents
                )
                manifest.extend(
                    [m for m in ents if matches(m)] if prunable else ents
                )
        return manifest

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        include_tombstones: bool = False,
        buckets: Iterable[int] | None = None,
        resolve: bool = True,
        point_lookup: str | None = None,
        range_filters: dict | None = None,
        columns: Iterable[str] | None = None,
    ) -> DataFrame:
        """Read table state at a snapshot (HEAD by default).

        ``columns``: project to these user columns AT THE SCAN. The
        LWW resolution packs every selected column into a max_by
        struct, which blocks Catalyst's own column pruning through
        ``read()`` — so without this, "give me (url, lang)" still
        reads the html payload bytes of every file. With it, the scan
        ReadSchema carries only the requested columns plus the
        key/order/op system columns the resolution itself needs
        (pruning is plan-audited). The projected result resolves LWW
        identically: winners are decided by (key, order) alone.

        ``range_filters`` ({col: (lo, hi)}): file-level pruning on the
        col_stats a Z-ordered compaction harvested (see
        ``manifest_entries`` for the MOR-correctness guard), plus the
        equivalent row filter applied AFTER LWW resolution — the
        predicate selects keys whose CURRENT version matches, exactly
        as filtering a fully-materialized table would.

        Only manifest files are read; bucket pruning (``buckets=``)
        skips files whose bucket can't match — the lake-format
        equivalent of partition pruning. ``point_lookup=<key>``
        additionally prunes files by their manifest key min/max stats
        and filters the scan to that key — "latest text for url X"
        reads only the files inside the key's bucket that can actually
        contain it, not the whole bucket.

        On a merge-on-read table, ``resolve=True`` (default) applies
        the read-side LWW across delta files (one hash-agg keyed by
        url — partial-agg pre-reduces per delta file before the
        shuffle); ``resolve=False`` exposes the raw delta rows.
        """
        snap = self.snapshot(snapshot_id)
        manifest = self.manifest_entries(
            snapshot_id=snap["snapshot_id"], buckets=buckets,
            point_lookup=point_lookup, range_filters=range_filters,
        )

        current = self.current_fields(snap)
        props_ = snap["properties"]
        if columns is not None:
            want = set(columns)
            unknown = want - {f.name for f in current}
            if unknown:
                raise ValueError(f"unknown column(s) {sorted(unknown)}")
            need = (want | {props_["key_col"], *props_["order_cols"], "op"}
                    | set(range_filters or {}))
            keep_order = [f for f in current if f.name in need]
            current = keep_order
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
                # a file written under version ``ver`` physically
                # carries exactly that version's fields plus ``op`` —
                # hand the scan that schema so Spark skips the
                # footer-inference job every read otherwise pays
                # (parquet columns resolve by name, order-independent)
                vf = TableMetadataIO.fields_from_json(
                    snap["schemas"][str(ver)])
                ddl_v = ", ".join(f"`{f.name}` {f.type}" for f in vf)
                if not any(f.name == "op" for f in vf):
                    ddl_v += ", `op` string"
                df = spark.read.schema(ddl_v).parquet(*paths)
                parts.append(df.select(
                    *self._select_exprs_for_version(ver, snap, current)))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        props = snap["properties"]
        if point_lookup is not None:
            # exact-key filter on top of the file pruning (a pruned-in
            # file can still hold other keys in the same range)
            out = out.filter(F.col(props["key_col"]) == F.lit(point_lookup))
        if resolve and props.get("write_mode", "cow") == "mor":
            # single-delta-file fast path: every commit's per-bucket
            # output is key-unique (the merge elects per (bucket, key)
            # before writing, compaction writes resolved rows), and a
            # key lives in exactly one bucket — so when every selected
            # bucket has ONE data file there is nothing to resolve
            # ACROSS and the election exchange is skipped outright
            # (guide §2.4). Post-compaction reads — the common state
            # of a mature table — never pay the election shuffle.
            per_bucket: dict[int, int] = {}
            for m in manifest:
                per_bucket[m["bucket"]] = per_bucket.get(m["bucket"], 0) + 1
            if any(c > 1 for c in per_bucket.values()):
                out = lww_latest(out, keys=props["key_col"],
                                 order_cols=props["order_cols"])
            else:
                # keep the elected column order (key first) so both
                # paths hand downstream the identical schema
                kc = props["key_col"]
                out = out.select(
                    kc, *[c for c in out.columns if c != kc])
        if not include_tombstones:
            out = out.filter(F.col("op") == F.lit("upsert")).drop("op")
        if range_filters:
            for c, (lo, hi) in range_filters.items():
                if lo is not None:
                    out = out.filter(F.col(c) >= F.lit(lo))
                if hi is not None:
                    out = out.filter(F.col(c) <= F.lit(hi))
        if columns is not None:
            final = [f.name for f in current if f.name in want]
            if include_tombstones and "op" not in final:
                final.append("op")
            out = out.select(*final)
        return out

    # ------------------------------------------------------------------ merge
    def _commit_manifests(
        self,
        next_sid: int,
        parent_snap: dict,
        new_entries: list[dict],
        replaced_buckets: Iterable[int] | None = None,
        token: str | None = None,
    ) -> tuple[dict, dict]:
        """Write manifest files for the buckets this commit touched and
        carry every other bucket's manifest BY REFERENCE — per-commit
        metadata is O(touched buckets), not O(total files).

        ``replaced_buckets``: buckets whose previous entries this commit
        supersedes (COW rewrite / compaction); a touched bucket NOT in
        the set appends to its parent entries (MOR delta). Returns
        (manifest_files map, per-written-bucket entry counts — the only
        buckets whose delta-file count can newly exceed the compaction
        threshold).
        """
        by_bucket: dict[int, list[dict]] = {}
        for e in new_entries:
            by_bucket.setdefault(e["bucket"], []).append(e)
        replaced = set(replaced_buckets or ())
        touched = set(by_bucket) | replaced
        legacy = parent_snap.get("manifest")  # pre-split inline form
        parent_files: dict[str, str] = parent_snap.get("manifest_files", {})

        files: dict[str, str] = {}
        # carry untouched buckets
        if legacy is not None:
            leg_by_bucket: dict[int, list[dict]] = {}
            for m in legacy:
                leg_by_bucket.setdefault(m["bucket"], []).append(m)
            for b, ents in leg_by_bucket.items():
                if b not in touched:
                    files[str(b)] = self.io.write_bucket_manifest(next_sid, b, ents, token=token)
        else:
            for b_str, rel in parent_files.items():
                if int(b_str) not in touched:
                    files[b_str] = rel

        sizes: dict[int, int] = {}
        for b, ents in by_bucket.items():
            if b not in replaced:  # MOR append: keep the parent deltas
                if legacy is not None:
                    prev = [m for m in legacy if m["bucket"] == b]
                elif str(b) in parent_files:
                    prev = self.io.read_bucket_manifest(parent_files[str(b)])
                else:
                    prev = []
                ents = prev + ents
            files[str(b)] = self.io.write_bucket_manifest(next_sid, b, ents, token=token)
            sizes[b] = len(ents)
        return files, sizes

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
        broadcast_keys: bool | None = None,
        gc_tombstones: bool = False,
        commit_retries: int = 2,
    ) -> dict | None:
        """MERGE with optimistic-concurrency retry: each attempt stages
        data/manifests under a unique token (two writers racing the
        same next snapshot id never share a directory), and a
        :class:`CommitConflict` at the HEAD swap recomputes the merge
        against the new HEAD — correct in both MOR and COW modes by
        construction, because nothing staged under the loser's token is
        reachable and the retry re-reads state. The batchId high-water
        check re-runs per attempt, so a retry of a batch the winner
        already committed degrades to the no-op path (exactly-once).
        See :meth:`_merge_once` for the single-attempt plan story."""
        from uuid import uuid4

        for attempt in range(commit_retries + 1):
            try:
                return self._merge_once(
                    spark, batch_df, batch_id=batch_id, use_salted=use_salted,
                    n_salts=n_salts, enrich=enrich,
                    broadcast_keys=broadcast_keys,
                    gc_tombstones=gc_tombstones, token=uuid4().hex[:8],
                )
            except CommitConflict:
                if attempt == commit_retries:
                    raise

    def _merge_once(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int | None = None,
        use_salted: bool = False,
        n_salts: int = 16,
        enrich=None,
        broadcast_keys: bool | None = None,
        gc_tombstones: bool = False,
        token: str | None = None,
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
        that, ``broadcast_keys=False`` swaps the broadcast hint for a
        shuffle semi-join of keys — still payload-free (the shuffled
        side is (url, seq) pairs, never html/text). ``broadcast_keys``:
        True forces the hint, False forces the shuffle semi-join, None
        (default) auto-selects by batch size.
        """
        snap = self.snapshot()
        if batch_id is not None and batch_id <= snap["committed_max_batch_id"]:
            return None  # duplicate delivery → no-op

        props = snap["properties"]
        key = props["key_col"]
        order_cols = props["order_cols"]
        # a producer that predates a key/order-column RENAME still
        # sends the historical name — resolve it up front by field-id
        # name history (payload columns get the same treatment inside
        # _conform on the winners)
        ids_by_name = {f.name: f.id for f in self.current_fields(snap)}
        hist: dict[int, list[str]] = {}
        for ver_fields in snap["schemas"].values():
            for fj in ver_fields:
                ns = hist.setdefault(fj["id"], [])
                if fj["name"] not in ns:
                    ns.append(fj["name"])
        for c in [key, *order_cols]:
            if c not in batch_df.columns:
                src = next(
                    (n for n in hist.get(ids_by_name.get(c), [])
                     if n in batch_df.columns), None)
                if src is not None:
                    batch_df = batch_df.withColumnRenamed(src, c)
        # fail loudly on a malformed producer: a batch missing the key
        # or order columns would otherwise _conform to NULL keys —
        # NULL-bucketed rows silently corrupting the table
        missing = [c for c in [key, *order_cols, "op"] if c not in batch_df.columns]
        if missing:
            raise ValueError(
                f"batch is missing required column(s) {missing}; "
                f"changelog contract: ({key}, {', '.join(order_cols)}, op, payload...)"
            )
        seqk = order_cols[-1]  # unique event id → exact row match
        next_sid = snap["snapshot_id"] + 1

        write_mode = props.get("write_mode", "cow")
        elect = lww_latest_salted if use_salted else lww_latest
        kwargs = {"n_salts": n_salts} if use_salted else {}
        out_dir = self.io.commit_data_dir(next_sid, token)

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
            new_entries = self._scan_commit_dir(
                next_sid, snap["schema_version"], token=token
            )
            self._harvest_key_blooms(spark, new_entries)
            self._harvest_ndv_regs(spark, new_entries)
            manifest_files, bucket_sizes = self._commit_manifests(
                next_sid, snap, new_entries, token=token
            )
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
            # winner-key resolution strategy: broadcast is right while
            # the elected key set (~batch + matched keys, ~tens of bytes
            # per key) fits executor memory; a 10^8+-event mega-batch
            # flips to a shuffle semi-join — keys-only, still payload-free
            if broadcast_keys is None:
                broadcast_keys = stats["n"] <= 2_000_000
            hint = F.broadcast if broadcast_keys else (lambda d: d)
            try:
                keep_cur = winkeys.filter(F.col("_side") == 0).select(key, seqk)
                keep_bat = winkeys.filter(F.col("_side") == 1).select(key, seqk)
                kept_current = current.join(
                    hint(keep_cur), [key, seqk], "left_semi"
                )
                kept_batch = batch_df.join(
                    hint(keep_bat), [key, seqk], "left_semi"
                )
                # 4. within-batch physical dedup: an at-least-once source
                #    can deliver the SAME event (url, seq) twice inside one
                #    micro-batch; the semi-join keeps both copies, so drop
                #    exact duplicates before writing. Ordered after the
                #    repartition-by-bucket: hash(bucket) clusters every
                #    (bucket, key, seq) group, so the dedup aggregate plans
                #    WITHOUT a second exchange — payloads still cross the
                #    wire exactly once. Enrichment runs after dedup so the
                #    extractor never pays for a duplicate copy.
                kept_batch = (
                    kept_batch.withColumn(_BUCKET_COL, self.bucket_expr(key))
                    .repartition(
                        max(1, min(len(affected), 32)), F.col(_BUCKET_COL)
                    )
                    .dropDuplicates([_BUCKET_COL, key, seqk])
                )
                if enrich is not None:
                    kept_batch = enrich(kept_batch)
                kept_batch = self._conform(kept_batch, snap).withColumn(
                    _BUCKET_COL, self.bucket_expr(key)
                )
                # 5. rewrite affected buckets: current side narrow
                #    (one-bucket-per-file), batch side already bucketed
                merged = kept_current.unionByName(kept_batch)
                merged.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(out_dir)
            finally:
                winkeys.unpersist()
            new_entries = self._scan_commit_dir(
                next_sid, snap["schema_version"], token=token
            )
            self._harvest_key_blooms(spark, new_entries)
            self._harvest_ndv_regs(spark, new_entries)
            manifest_files, bucket_sizes = self._commit_manifests(
                next_sid, snap, new_entries, replaced_buckets=affected,
                token=token,
            )
            buckets_rewritten = len(affected)

        new_snap = {
            "snapshot_id": next_sid,
            "parent_id": snap["snapshot_id"],
            "type": "merge",
            "batch_id": batch_id,
            "schema_version": snap["schema_version"],
            "schemas": snap["schemas"],
            "manifest_files": manifest_files,
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
        try:
            self.io.write_snapshot_and_swap_head(new_snap)
        except CommitConflict:
            self._abort_commit_attempt(next_sid, token, manifest_files)
            raise

        # amortized compaction: any bucket over the delta-file budget
        # gets rewritten to one resolved file set (its own snapshot).
        # ``gc_tombstones`` (caller asserts a seq-ordered source — a
        # WAL/binlog tail) additionally drops tombstones at or below
        # this batch's committed max_seq during the rewrite: with a
        # monotone source no future event can carry a smaller seq, so
        # the tombstone has nothing left to defeat.
        if write_mode == "mor":
            # only buckets this commit appended to can newly exceed the
            # budget — their sizes came back from the manifest write, so
            # no full-manifest scan is needed here
            over = sorted(
                b for b, c in bucket_sizes.items()
                if c > props.get("compact_threshold", 8)
            )
            if over:
                horizon = stats["hi"] if gc_tombstones else None
                try:
                    self.compact(spark, buckets=over, tombstone_horizon=horizon)
                except CommitConflict:
                    # advisory maintenance lost a race — the buckets
                    # stay over budget and the next batch re-triggers
                    pass
        return self.snapshot()

    def compact(self, spark: SparkSession, buckets: list[int] | None = None,
                tombstone_horizon: int | None = None,
                cluster_by: list[str] | None = None,
                cluster_bits: int = 8,
                target_file_rows: int | None = None) -> dict:
        """Rewrite buckets' delta files to one resolved file each
        (read-side LWW materialized). Tombstones are preserved by
        default — a compaction must not forget deletes, or a late older
        upsert could resurrect a deleted key.

        ``cluster_by``: Z-order the rewrite on these columns (numeric /
        timestamp) instead of the 1-D key sort: bits interleave so each
        output file covers a tight hyper-rectangle of the value space,
        per-file min/max stats land in the manifest (``col_stats``),
        and ``read(range_filters=...)`` prunes files the filter cannot
        match — the Delta OPTIMIZE ZORDER BY / Iceberg sort-order move.
        Combine with ``target_file_rows`` (maxRecordsPerFile) so a
        bucket splits into several z-contiguous files; one giant file
        per bucket has full-range stats and prunes nothing. The z-sort
        rides the compaction shuffle's sortWithinPartitions slot and
        the range agg is one 1-row job — no extra shuffle either way.

        Clustering is STICKY: a clustered compaction records its
        columns in table properties (``stats_cols``), and later
        compactions — including the amortized auto-compactions MERGE
        triggers — default to the same layout, so churned buckets
        regain their pruning power without the caller re-specifying.
        Pass ``cluster_by=[]`` to explicitly rewrite key-sorted.

        ``tombstone_horizon`` is the delete-GC knob: a tombstone whose
        winning ``seq`` is <= the horizon is physically dropped during
        the rewrite. Correctness contract: the caller guarantees no
        FUTURE batch can carry an event with seq <= horizon for any key
        (e.g. the source's monotone WAL position / the committed
        ``max_seq`` of an ordered changelog). Under that guarantee the
        tombstone has no event left to defeat: any later event for the
        key has a larger seq and would win LWW regardless. Without GC,
        at 10^10 events with 5% deletes the table carries 5x10^8
        permanent tombstone rows.
        """
        snap = self.snapshot()
        props = snap["properties"]
        if cluster_by is None:
            cluster_by = list(props.get("stats_cols", [])) or None
        if target_file_rows is None:
            # sticky with the layout: one giant file per bucket would
            # carry full-range stats and prune nothing
            target_file_rows = props.get("target_file_rows")
        if buckets is None:
            counts: dict[int, int] = {}
            for m in self.io.load_manifest(snap):
                counts[m["bucket"]] = counts.get(m["bucket"], 0) + 1
            # plain compaction targets multi-file buckets; a tombstone-GC
            # pass must visit single-file buckets too (their one file can
            # still hold droppable tombstones), and a clustered rewrite
            # must too (re-laying-out one big file into z-contiguous
            # splits is the whole point)
            min_files = 1 if (tombstone_horizon is not None or cluster_by) else 2
            buckets = sorted(b for b, c in counts.items() if c >= min_files)
        if not buckets:
            return snap
        next_sid = snap["snapshot_id"] + 1
        resolved = self.read(
            spark, include_tombstones=True, buckets=buckets, resolve=True
        ).withColumn(_BUCKET_COL, self.bucket_expr(props["key_col"]))
        if tombstone_horizon is not None:
            seqk = props["order_cols"][-1]
            resolved = resolved.filter(
                ~((F.col("op") == F.lit("delete")) & (F.col(seqk) <= tombstone_horizon))
            )
        sort_cols = [_BUCKET_COL, props["key_col"]]
        drop_cols: list[str] = []
        if cluster_by:
            from montandon_etl_spark.lake.zorder import quantize, zvalue

            longs = [self._stats_long_col(c, snap) for c in cluster_by]
            rng = resolved.agg(*[
                f for i, c in enumerate(longs)
                for f in (F.min(c).alias(f"_lo{i}"), F.max(c).alias(f"_hi{i}"))
            ]).first()  # 1 row: bounded driver work
            qs = [
                quantize(c, rng[f"_lo{i}"] or 0, rng[f"_hi{i}"] or 0, cluster_bits)
                for i, c in enumerate(longs)
            ]
            resolved = resolved.withColumn("_zv", zvalue(qs, cluster_bits))
            sort_cols = [_BUCKET_COL, "_zv"]
            drop_cols = ["_zv"]
        from uuid import uuid4

        token = uuid4().hex[:8]
        out_dir = self.io.commit_data_dir(next_sid, token)
        writer = (
            resolved.repartition(max(1, min(len(buckets), 32)), F.col(_BUCKET_COL))
            # clustered layout: the 1-D key sort tightens key min/max
            # for point-lookup pruning; the z-variant instead tightens
            # cluster_by col stats for range pruning. Either way the
            # sort rides the compaction shuffle's sort slot — no extra
            # exchange
            .sortWithinPartitions(*sort_cols)
            .drop(*drop_cols)
            .write.mode("overwrite")
        )
        if target_file_rows:
            writer = writer.option("maxRecordsPerFile", target_file_rows)
        writer.partitionBy(_BUCKET_COL).parquet(out_dir)
        new_entries = self._scan_commit_dir(
            next_sid, snap["schema_version"],
            stats_cols=list(cluster_by) if cluster_by else None,
            token=token,
        )
        self._harvest_key_blooms(spark, new_entries)
        self._harvest_ndv_regs(spark, new_entries)
        manifest_files, _ = self._commit_manifests(
            next_sid, snap, new_entries, replaced_buckets=buckets, token=token
        )
        props_out = dict(props)
        if cluster_by:
            # future MOR deltas harvest the same col stats, so later
            # clustered compactions keep their pruning power
            props_out["stats_cols"] = list(cluster_by)
            if target_file_rows:
                props_out["target_file_rows"] = int(target_file_rows)
        new_snap = {
            "snapshot_id": next_sid,
            "parent_id": snap["snapshot_id"],
            "type": "compact",
            "batch_id": None,
            "schema_version": snap["schema_version"],
            "schemas": snap["schemas"],
            "manifest_files": manifest_files,
            "properties": props_out,
            "offsets": snap["offsets"],
            "metrics": {
                "rows_written": sum(e["rows"] for e in new_entries),
                "buckets_rewritten": len(buckets),
                "bucket_rows": {str(e["bucket"]): e["rows"] for e in new_entries},
                "tombstone_horizon": tombstone_horizon,
            },
            "committed_max_batch_id": snap["committed_max_batch_id"],
        }
        try:
            self.io.write_snapshot_and_swap_head(new_snap)
        except CommitConflict:
            self._abort_commit_attempt(next_sid, token, manifest_files)
            raise
        return new_snap

    def rebucket(self, spark: SparkSession, n_buckets: int,
                 tombstone_horizon: int | None = None) -> dict:
        """Partition-spec evolution: rewrite the table under a new
        bucket count (Iceberg's ``ALTER TABLE ... WRITE DISTRIBUTED BY``
        / partition-spec-evolution move). A table sized for 10^8 keys
        at 64 buckets drowns at 10^10 — each bucket becomes a 100-GB
        shuffle target and compaction unit; respec'ing to 1024 restores
        bounded per-bucket work without touching the key contract.

        Semantics:

        - full LWW-resolved rewrite into ``pmod(xxhash64(key), new_B)``
          layout, committed as ONE snapshot of type ``rebucket`` whose
          ``properties.n_buckets`` carries the new count. Tombstones
          are preserved (``tombstone_horizon`` GC knob as ``compact``).
        - ``n_buckets`` rides each snapshot's own properties, so time
          travel to pre-rebucket snapshots keeps resolving the OLD
          layout; subsequent MERGE / compact / point reads pick up the
          new count from HEAD automatically.
        - ONE exchange: raw delta rows repartition by the NEW bucket
          (bucket = f(key) co-locates every version of a key), then
          ``groupBy(bucket, key)`` reduces in place — hash(bucket)
          satisfies the clustered distribution, same one-job shape as
          MERGE. Sticky z-order stats (``stats_cols``) re-harvest on
          the rewrite, so range pruning survives the respec.
        - crash/conflict safe: token-staged data + manifests, OCC
          commit; a losing attempt aborts clean (``CommitConflict``
          surfaces to the caller like ``compact``).
        """
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        snap = self.snapshot()
        props = snap["properties"]
        if int(n_buckets) == int(props["n_buckets"]):
            return snap
        key = props["key_col"]
        next_sid = snap["snapshot_id"] + 1
        raw = self.read(spark, include_tombstones=True, resolve=False)
        # same wave logic as MERGE: hash(new bucket) partitioning already
        # clusters (bucket, key), so the groupBy reduces with NO second
        # exchange; width follows the session's shuffle parallelism
        n_part = max(1, min(int(n_buckets),
                            4 * int(spark.conf.get(
                                "spark.sql.shuffle.partitions"))))
        resolved = lww_latest(
            raw.withColumn(
                _BUCKET_COL,
                F.pmod(F.xxhash64(F.col(key)), F.lit(int(n_buckets))).cast("int"),
            ).repartition(n_part, F.col(_BUCKET_COL)),
            keys=[_BUCKET_COL, key], order_cols=props["order_cols"],
        )
        if tombstone_horizon is not None:
            seqk = props["order_cols"][-1]
            resolved = resolved.filter(
                ~((F.col("op") == F.lit("delete"))
                  & (F.col(seqk) <= tombstone_horizon)))
        cluster_by = list(props.get("stats_cols", []))
        sort_cols, drop_cols = [_BUCKET_COL, key], []
        if cluster_by:
            from montandon_etl_spark.lake.zorder import quantize, zvalue

            longs = [self._stats_long_col(c, snap) for c in cluster_by]
            rng = resolved.agg(*[
                f for i, c in enumerate(longs)
                for f in (F.min(c).alias(f"_lo{i}"), F.max(c).alias(f"_hi{i}"))
            ]).first()  # 1 row: bounded driver work
            qs = [
                quantize(c, rng[f"_lo{i}"] or 0, rng[f"_hi{i}"] or 0, 8)
                for i, c in enumerate(longs)
            ]
            resolved = resolved.withColumn("_zv", zvalue(qs, 8))
            sort_cols, drop_cols = [_BUCKET_COL, "_zv"], ["_zv"]
        from uuid import uuid4

        token = uuid4().hex[:8]
        out_dir = self.io.commit_data_dir(next_sid, token)
        writer = (resolved.sortWithinPartitions(*sort_cols)
                  .drop(*drop_cols).write.mode("overwrite"))
        if props.get("target_file_rows"):
            writer = writer.option(
                "maxRecordsPerFile", int(props["target_file_rows"]))
        writer.partitionBy(_BUCKET_COL).parquet(out_dir)
        new_entries = self._scan_commit_dir(
            next_sid, snap["schema_version"],
            stats_cols=cluster_by or None, token=token)
        self._harvest_key_blooms(spark, new_entries)
        self._harvest_ndv_regs(spark, new_entries)
        legacy = snap.get("manifest")
        replaced = ({m["bucket"] for m in legacy} if legacy is not None
                    else {int(b) for b in snap.get("manifest_files", {})})
        manifest_files, _ = self._commit_manifests(
            next_sid, snap, new_entries,
            replaced_buckets=sorted(replaced), token=token)
        new_snap = {
            "snapshot_id": next_sid,
            "parent_id": snap["snapshot_id"],
            "type": "rebucket",
            "batch_id": None,
            "schema_version": snap["schema_version"],
            "schemas": snap["schemas"],
            "manifest_files": manifest_files,
            "properties": {**props, "n_buckets": int(n_buckets)},
            "offsets": snap["offsets"],
            "metrics": {
                "rows_written": sum(e["rows"] for e in new_entries),
                "buckets_rewritten": len(replaced),
                "n_buckets_from": int(props["n_buckets"]),
                "n_buckets_to": int(n_buckets),
                "tombstone_horizon": tombstone_horizon,
            },
            "committed_max_batch_id": snap["committed_max_batch_id"],
        }
        try:
            self.io.write_snapshot_and_swap_head(new_snap)
        except CommitConflict:
            self._abort_commit_attempt(next_sid, token, manifest_files)
            raise
        return new_snap

    def _abort_commit_attempt(self, next_sid: int, token: str | None,
                              manifest_files: dict | None) -> None:
        """Remove everything a LOSING commit attempt staged: its
        token-unique data directory and the manifest files it wrote
        (identified by the token in their names — carried-by-reference
        manifests from the parent are never touched). The winner's
        files are untouchable by construction: different token."""
        import shutil

        shutil.rmtree(self.io.commit_data_dir(next_sid, token),
                      ignore_errors=True)
        if token:
            for rel in (manifest_files or {}).values():
                if f"-{token}-" in os.path.basename(rel):
                    try:
                        os.remove(os.path.join(self.path, rel))
                    except OSError:
                        pass

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

    def _stats_long_col(self, name: str, snap: dict) -> F.Column:
        """A cluster/stats column normalized to bigint for quantizing:
        timestamps → epoch micros (cast to TIMESTAMP first —
        unix_micros rejects TIMESTAMP_NTZ), numerics → bigint."""
        typed = {f.name: f.type for f in self.current_fields(snap)}
        c = F.col(name)
        if typed.get(name, "").startswith("timestamp"):
            c = F.unix_micros(c.cast("timestamp"))
        return c.cast("bigint")

    @staticmethod
    def _stat_norm(v):
        """Footer stat → JSON-storable comparable: datetimes become
        epoch micros (int), bytes decode, numerics/strings pass."""
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            import pandas as pd

            return int(pd.Timestamp(v).value // 1000)
        if isinstance(v, (bytes, bytearray)):
            return v.decode("utf-8", "replace")
        return v

    def _scan_commit_dir(self, snapshot_id: int, schema_version: int,
                         stats_cols: list[str] | None = None,
                         token: str | None = None) -> list[dict]:
        """Enumerate data files a commit just wrote, with bucket + rows
        + per-file key min/max (Iceberg-style file stats, harvested from
        the parquet footers' column statistics — zero extra data reads).
        Point lookups prune on these WITHIN a bucket: a key's bucket may
        hold hundreds of files but only those whose [key_min, key_max]
        covers the key are scanned. ``stats_cols`` (defaults to the
        table's ``stats_cols`` property, set by a clustered compaction)
        additionally harvests per-file min/max for those columns into
        ``col_stats`` — the range-pruning metadata behind
        ``read(range_filters=...)``. Footer reads fan out over a thread
        pool — this runs on the driver between jobs, so serial I/O here
        is Amdahl overhead."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        key_col = self.properties["key_col"]
        if stats_cols is None:
            stats_cols = list(self.properties.get("stats_cols", []))
        out_dir = self.io.commit_data_dir(snapshot_id, token)
        paths = sorted(glob.glob(os.path.join(out_dir, f"{_BUCKET_COL}=*", "*.parquet")))

        def col_minmax(md, name: str):
            """(min, max) across row groups for a leaf column, or None."""
            rg0 = md.row_group(0)
            idx = next(
                (i for i in range(rg0.num_columns)
                 if rg0.column(i).path_in_schema == name), -1)
            if idx < 0:
                return None
            mn = mx = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            return (self._stat_norm(mn), self._stat_norm(mx))

        def entry(p: str) -> dict | None:
            md = pq.ParquetFile(p).metadata
            rows = md.num_rows
            if rows == 0:
                return None
            key_min = key_max = None
            try:
                # Resolve the LEAF column index by path_in_schema:
                # row_group(rg).column(i) indexes flattened leaf columns,
                # which diverges from the top-level field index as soon
                # as any struct/list column precedes the key column —
                # matching by name avoids harvesting another column's
                # min/max and wrongly pruning files.
                idx = -1
                if md.num_row_groups > 0:
                    rg0 = md.row_group(0)
                    for i in range(rg0.num_columns):
                        if rg0.column(i).path_in_schema == key_col:
                            idx = i
                            break
                if idx >= 0:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            key_min = key_max = None
                            break
                        key_min = st.min if key_min is None else min(key_min, st.min)
                        key_max = st.max if key_max is None else max(key_max, st.max)
            except Exception:
                key_min = key_max = None  # stats are an optimization, never a failure
            col_stats = {}
            for c in stats_cols:
                try:
                    mm = col_minmax(md, c)
                except Exception:
                    mm = None  # stats are an optimization, never a failure
                if mm is not None:
                    col_stats[c] = [mm[0], mm[1]]
            m = re.search(rf"{_BUCKET_COL}=(\d+)", p)
            out = {
                "path": os.path.relpath(p, self.path),
                "bucket": int(m.group(1)),
                "rows": rows,
                "schema_version": schema_version,
                "key_min": key_min,
                "key_max": key_max,
            }
            if col_stats:
                out["col_stats"] = col_stats
            return out

        with ThreadPoolExecutor(max_workers=16) as ex:
            return [e for e in ex.map(entry, paths) if e is not None]

    def _harvest_key_blooms(self, spark: SparkSession,
                            new_entries: list[dict]) -> None:
        """Stamp a per-file key Bloom into each new manifest entry
        (mutates in place; no-op unless the table's ``key_bloom_bits``
        property is set). ONE distributed job over the just-written
        files' KEY COLUMN ONLY (columnar scan — ~1% of bytes for a
        payload-heavy table): per file, explode the Kirsch–Mitzenmacher
        positions and bit_or into 60-bit words; the collect is bounded
        by files × m_bits/60 words, configuration × file count, never
        row count. Runs before the manifest commit, so the filter is
        atomic with the entry (a crash mid-harvest = no commit).

        The filter uses the same portable md5-prefix layout as
        ``operators/sketches.bloom_build``, so the driver-side pruning
        probe (``bloom_test_sparse``) can never see a false negative.
        """
        m_bits = int(self.properties.get("key_bloom_bits", 0) or 0)
        if not m_bits or not new_entries:
            return
        from montandon_etl_spark.operators.sketches import (
            _BLOOM_WORD, _bit_mask, _bloom_positions)

        n_hashes = int(self.properties.get("key_bloom_hashes", 4))
        key_col = self.properties["key_col"]

        def tail(p: str) -> str:
            return "/".join(p.replace("\\", "/").split("/")[-3:])

        by_tail = {tail(e["path"]): e for e in new_entries}
        paths = [os.path.join(self.path, e["path"]) for e in new_entries]
        df = spark.read.parquet(*paths).select(
            F.col(key_col).cast("string").alias("_k"),
            F.input_file_name().alias("_f"))
        pos = F.explode(F.array(
            *_bloom_positions("_k", m_bits, n_hashes))).alias("pos")
        rows = (df.select("_f", pos)
                .select("_f",
                        (F.col("pos") / _BLOOM_WORD).cast("bigint")
                        .alias("w"),
                        _bit_mask(F.pmod(F.col("pos"),
                                         F.lit(_BLOOM_WORD)).cast("int"))
                        .alias("m"))
                .groupBy("_f", "w")
                .agg(F.bit_or("m").alias("bits"))
                .collect())
        from urllib.parse import unquote

        sparse: dict[str, dict[int, int]] = {}
        for r in rows:
            sparse.setdefault(tail(unquote(r["_f"])), {})[int(r["w"])] = \
                int(r["bits"])
        for t, e in by_tail.items():
            # a tail with no harvested words means the URI didn't match
            # the entry path — leave the entry unstamped (conservative
            # keep at read time) rather than stamp an always-False
            # filter that would prune a live file
            if t in sparse:
                e["key_bloom"] = {
                    "m": m_bits, "k": n_hashes,
                    "w": sorted(sparse[t].items()),
                }

    def _harvest_ndv_regs(self, spark: SparkSession,
                          new_entries: list[dict]) -> None:
        """Stamp per-file HLL registers for the table's ``ndv_cols``
        into each new manifest entry (mutates in place; no-op unless
        the property is set). ONE job over the just-written files
        reading ONLY the tracked columns: each row explodes to one
        (col, value-string) pair per tracked column, hashes with the
        portable md5-prefix, and max-aggregates ranks to the
        (file, col, register) grain — exactly
        ``operators/sketches.hll_registers``' arithmetic, so registers
        merged across any file subset are bit-identical to a one-shot
        sketch of those files' rows. Collect is bounded by
        files × cols × 2^p rows — configuration, never data."""
        cols = list(self.properties.get("ndv_cols", []) or [])
        if not cols or not new_entries:
            return
        from urllib.parse import unquote

        from montandon_etl_spark.operators.dedup import hash60

        p = int(self.properties.get("ndv_p", 8))
        m, kmax = 1 << p, 61 - p

        def tail(pth: str) -> str:
            return "/".join(pth.replace("\\", "/").split("/")[-3:])

        paths = [os.path.join(self.path, e["path"]) for e in new_entries]
        pairs = F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.col(c).cast("string").alias("v")) for c in cols
        ])).alias("cv")
        rows = (spark.read.parquet(*paths)
                .select(F.input_file_name().alias("_f"), pairs)
                .select("_f", F.col("cv.c").alias("c"),
                        hash60(F.col("cv.v")).alias("h"))
                .filter(F.col("h").isNotNull())
                .select("_f", "c",
                        F.pmod(F.col("h"), F.lit(m)).cast("int").alias("j"),
                        F.expr(f"h div {m}").alias("w"))
                .groupBy("_f", "c", "j")
                .agg(F.max(
                    F.when(F.col("w") == 0, F.lit(kmax))
                    .otherwise(F.lit(kmax) - F.length(F.bin(F.col("w"))))
                ).cast("int").alias("mj"))
                .collect())
        regs: dict[str, dict[str, dict[int, int]]] = {}
        for r in rows:
            regs.setdefault(tail(unquote(r["_f"])), {}) \
                .setdefault(r["c"], {})[int(r["j"])] = int(r["mj"])
        for e in new_entries:
            t = tail(e["path"])
            if t in regs:
                e["ndv"] = {"p": p,
                            "r": {c: sorted(jm.items())
                                  for c, jm in regs[t].items()}}

    def column_ndv(self, col: str,
                   snapshot_id: int | str | None = None) -> float | None:
        """Metadata-only NDV estimate for a tracked column: max-merge
        the per-file registers across the snapshot's manifest and run
        the standard HLL estimator (exact-integer denominator,
        micro-snapped result — the ``sketches.hll_estimate`` math).
        Returns None when no file carries registers for the column.

        Caveat (same as Iceberg's NDV stats): registers cover every
        row in every live FILE — in a MOR table that includes
        superseded versions and tombstones, so this upper-bounds the
        live-state NDV; after a full compaction it is the state's NDV.
        """
        import math

        snap = self.snapshot(snapshot_id)
        merged: dict[int, int] = {}
        p = None
        for e in self.io.load_manifest(snap):
            nd = e.get("ndv")
            if not nd or col not in nd["r"]:
                continue
            p = int(nd["p"])
            for j, mj in nd["r"][col]:
                j, mj = int(j), int(mj)
                if mj > merged.get(j, 0):
                    merged[j] = mj
        if p is None:
            return None
        m, kmax = 1 << p, 61 - p
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
            m, 0.7213 / (1 + 1.079 / m))
        cnt = len(merged)
        s = sum(1 << (kmax - mj) for mj in merged.values()) \
            + (m - cnt) * (1 << kmax)
        v = m - cnt
        e_raw = (alpha * m * m * float(1 << kmax)) / float(s)
        est = (float(m) * math.log(float(m) / v)
               if (e_raw <= 2.5 * m and v > 0) else e_raw)
        return math.floor(est * 1_000_000 + 0.5) / 1_000_000

    # ------------------------------------------------------------- change feed
    def changes(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
        include_old_values: bool = False,
    ) -> DataFrame:
        """Change data feed between two snapshots (Delta-CDF / Iceberg
        changelog-scan shape): one row per key whose VISIBLE state
        differs, classified insert | update | delete, carrying the old
        and new (warc_ts, seq) plus the new payload columns — the
        contract a downstream incremental consumer reads instead of
        re-scanning the table.

        ``include_old_values=True`` adds ``old_<col>`` preimage columns
        (the Delta-CDF update_preimage shape) so an incremental
        aggregate can SUBTRACT a deleted/updated row's old contribution
        without re-reading the table. Preimages resolve by FIELD ID
        against the from-snapshot's schema, so renames map correctly
        and columns added after from_snapshot read as NULL.

        Scale story: the manifest list makes this cheap — a bucket
        untouched between the snapshots carries the IDENTICAL manifest
        file by reference, so only buckets whose manifest ref changed
        are read at all. Both sides then resolve LWW and full-outer
        join on the key within those buckets only.
        """
        s_from = self.snapshot(from_snapshot_id)
        s_to = self.snapshot(to_snapshot_id)
        props = s_to["properties"]
        key = props["key_col"]
        order_cols = props["order_cols"]
        seqk = order_cols[-1]
        tsk = order_cols[0]

        mf_from = s_from.get("manifest_files", {})
        mf_to = s_to.get("manifest_files", {})
        if "manifest" in s_from or "manifest" in s_to:  # legacy inline form
            changed = None  # no ref identity to compare — read everything
        else:
            changed = sorted(
                int(b)
                for b in set(mf_from) | set(mf_to)
                if mf_from.get(b) != mf_to.get(b)
            )
            # changed == [] reads zero files on both sides and falls
            # through to an empty, full-schema change feed

        from_names = {f.id: f.name for f in self.user_fields(s_from)}
        to_ids = {f.name: f.id for f in self.user_fields(s_to)}

        def side(sid: int, tag: str) -> DataFrame:
            df = self.read(
                spark, snapshot_id=sid, include_tombstones=True,
                buckets=changed, resolve=True,
            )
            # key/ts resolve by field id against THIS side's schema —
            # a rename between the snapshots must not break the feed
            # (seq/op are system columns, names fixed)
            if tag == "new":
                k_src, ts_src = key, tsk
            else:
                k_src = from_names.get(to_ids[key], key)
                ts_src = from_names.get(to_ids[tsk], tsk)
            payloads = []
            if tag == "new":
                payloads = [F.col(f.name).alias(f"new_{f.name}")
                            for f in self.user_fields(s_to)
                            if f.name not in (key, tsk)]
            elif include_old_values:
                for f in self.user_fields(s_to):
                    if f.name in (key, tsk):
                        continue
                    src = from_names.get(f.id)
                    col = (F.col(src) if src is not None
                           else F.lit(None)).cast(f.type)
                    payloads.append(col.alias(f"old_{f.name}"))
            return df.select(
                F.col(k_src).alias(key),
                F.col(ts_src).alias(f"{tag}_{tsk}"),
                F.col(seqk).alias(f"{tag}_seq"),
                (F.col("op") == F.lit("upsert")).alias(f"{tag}_live"),
                *payloads,
            )

        old = side(s_from["snapshot_id"], "old")
        new = side(s_to["snapshot_id"], "new")
        j = old.join(new, key, "full_outer")
        old_live = F.coalesce("old_live", F.lit(False))
        new_live = F.coalesce("new_live", F.lit(False))
        change = (
            F.when(~old_live & new_live, F.lit("insert"))
            .when(old_live & ~new_live, F.lit("delete"))
            .when(old_live & new_live & (F.col("old_seq") != F.col("new_seq")),
                  F.lit("update"))
        )
        return (
            j.withColumn("change_type", change)
            .filter(F.col("change_type").isNotNull())
            .drop("old_live", "new_live")
        )

    # --------------------------------------------------------------- lifecycle
    def purge_keys(self, spark: SparkSession, keys: Iterable[str]) -> dict:
        """Physically erase keys from EVERY retained snapshot — the
        right-to-erasure escape hatch from time travel. A tombstone
        delete hides a key at HEAD but its bytes stay readable at
        older snapshots; compliance requires the bytes gone.

        Under the commit lock (no concurrent writer):

        1. the keys' buckets name the only manifests to open; per-file
           key min/max stats then prune to the files that can contain
           them (same pruning as a point lookup);
        2. each affected data file is rewritten WITHOUT the keys' rows
           (a file emptied entirely drops out), per that file's own
           schema version — a key renamed by DDL is resolved by field
           id, and MOR delta files lose the keys' tombstone rows too;
        3. every manifest referencing a rewritten file gets a new
           immutable manifest file; every retained snapshot json
           pointing at an old manifest is atomically re-pointed (the
           one sanctioned mutation of the snapshot log — history stays
           time-travelable, minus the purged keys);
        4. old data files and manifests are deleted LAST, so a crash
           anywhere earlier leaves a consistent table and a re-run
           converges (files already clean are left untouched).

        Scope: this table's files. Upstream changelogs/WARCs and
        crashed-commit orphan dirs (``vacuum_orphans``) are separate
        cleanups. Batch-id ledger is untouched — a purged key can be
        re-ingested later. Cost is O(files containing the keys), not
        O(table).
        """
        import json as _json
        import shutil
        from uuid import uuid4

        keyset = sorted({k for k in keys})
        report = {"files_rewritten": 0, "files_dropped": 0,
                  "rows_purged": 0, "snapshots_updated": 0}
        if not keyset:
            return report
        props = self.properties
        key_col = props["key_col"]
        fd = self.io._acquire_commit_lock()
        try:
            head_snap = self.io.read_snapshot()
            key_id = next(f.id for f in self.current_fields(head_snap)
                          if f.name == key_col)

            def key_name(ver: int) -> str:
                fields = TableMetadataIO.fields_from_json(
                    head_snap["schemas"][str(ver)])
                return next(f.name for f in fields if f.id == key_id)

            snaps = self.history()
            # a rebucket changes which bucket a key lives in, so the
            # bucket prune must use each snapshot's OWN n_buckets —
            # head's bucket ids would miss the keys' pre-respec files.
            bs_needed = sorted({
                int(s["properties"]["n_buckets"]) for s in snaps})
            brows = spark.createDataFrame(
                [(k,) for k in keyset], f"`{key_col}` string"
            ).select(*[
                F.pmod(F.xxhash64(F.col(key_col)), F.lit(b))
                .cast("int").alias(f"b{b}") for b in bs_needed
            ]).collect()  # |keys| x |distinct B| — bounded driver work
            buckets_by_b = {
                b: {r[f"b{b}"] for r in brows} for b in bs_needed}
            rel_entries: dict[str, list[dict]] = {}
            for s in snaps:
                bset = buckets_by_b[int(s["properties"]["n_buckets"])]
                for b_str, rel in s.get("manifest_files", {}).items():
                    if int(b_str) in bset and rel not in rel_entries:
                        rel_entries[rel] = self.io.read_bucket_manifest(rel)
            cand: dict[str, dict] = {}
            for ents in rel_entries.values():
                for e in ents:
                    lo, hi = e.get("key_min"), e.get("key_max")
                    if lo is not None and hi is not None and \
                            not any(lo <= k <= hi for k in keyset):
                        continue
                    cand[e["path"]] = e
            tok = uuid4().hex[:8]
            out_dir = os.path.join(self.path, "data", f"purge-{tok}")
            path_map: dict[str, tuple[str, int]] = {}
            dropped: set[str] = set()
            # TWO Spark jobs per key-column name (one name in the
            # common no-rename history), never O(files) serialized
            # driver-loop jobs: job 1 counts the keys' rows per
            # candidate file (key column only — columnar scan), job 2
            # rewrites every affected file without those rows in one
            # pass, one output file per input file via a file-index
            # partition column. At 100x, a purge key resident in
            # hundreds of files across retained history costs two job
            # latencies, not hundreds.
            from urllib.parse import unquote, urlparse

            ordered = sorted(cand.items())
            file_idx = {relp: i for i, (relp, _) in enumerate(ordered)}
            by_kname: dict[str, list[tuple[str, dict]]] = {}
            for relp, e in ordered:
                by_kname.setdefault(
                    key_name(e.get("schema_version", 0)), []).append((relp, e))
            for kname, group in sorted(by_kname.items()):
                # job 1: per-file count of rows to purge
                bad_rows = (
                    spark.read.parquet(
                        *[os.path.join(self.path, r) for r, _ in group])
                    .select(F.input_file_name().alias("_f"), F.col(kname))
                    .filter(F.col(kname).isin(keyset))
                    .groupBy("_f").agg(F.count(F.lit(1)).alias("bad"))
                    .collect()
                )
                bad_by_rel: dict[str, int] = {}
                uri_by_rel: dict[str, str] = {}
                for r in bad_rows:
                    p = unquote(urlparse(r["_f"]).path)
                    rel = os.path.relpath(p, self.path)
                    bad_by_rel[rel] = int(r["bad"])
                    uri_by_rel[rel] = r["_f"]
                rewrite: list[tuple[str, int]] = []  # (relp, n_keep)
                for relp, e in group:
                    bad = bad_by_rel.get(relp, 0)
                    if bad == 0:
                        continue  # clean file: untouched (idempotent re-run)
                    report["rows_purged"] += bad
                    n_keep = e["rows"] - bad
                    if n_keep <= 0:
                        dropped.add(relp)
                    else:
                        rewrite.append((relp, n_keep))
                if not rewrite:
                    continue
                os.makedirs(out_dir, exist_ok=True)
                staging = os.path.join(out_dir, "_tmp")
                # job 2: the join key is the exact input_file_name
                # string job 1 produced, so the file→index mapping can
                # never miss on URI-encoding differences
                mapping = spark.createDataFrame(
                    [(uri_by_rel[relp], file_idx[relp])
                     for relp, _ in rewrite], "_f string, _fi int")
                (
                    spark.read.parquet(
                        *[os.path.join(self.path, r) for r, _ in rewrite])
                    .withColumn("_f", F.input_file_name())
                    .filter(~F.col(kname).isin(keyset))
                    .join(F.broadcast(mapping), "_f")
                    .drop("_f")
                    .repartition(max(1, min(len(rewrite), 32)), "_fi")
                    .write.mode("overwrite").partitionBy("_fi")
                    .parquet(staging)
                )
                for relp, n_keep in rewrite:
                    i = file_idx[relp]
                    fdir = os.path.join(staging, f"_fi={i}")
                    part = next(f for f in sorted(os.listdir(fdir))
                                if f.endswith(".parquet"))
                    newrel = os.path.join("data", f"purge-{tok}",
                                          f"f-{i:05d}.parquet")
                    os.replace(os.path.join(fdir, part),
                               os.path.join(self.path, newrel))
                    path_map[relp] = (newrel, n_keep)
                shutil.rmtree(staging, ignore_errors=True)
            report["files_rewritten"] = len(path_map)
            report["files_dropped"] = len(dropped)
            if not path_map and not dropped:
                return report
            rel_map: dict[str, str] = {}
            for j, (rel, ents) in enumerate(sorted(rel_entries.items())):
                if not any(e["path"] in path_map or e["path"] in dropped
                           for e in ents):
                    continue
                new_ents = []
                for e in ents:
                    if e["path"] in dropped:
                        continue
                    if e["path"] in path_map:
                        newrel, n_keep = path_map[e["path"]]
                        e2 = dict(e, path=newrel, rows=n_keep,
                                  key_min=None, key_max=None)
                        e2.pop("col_stats", None)
                        new_ents.append(e2)
                    else:
                        new_ents.append(e)
                bucket = ents[0]["bucket"] if ents else 0
                rel_map[rel] = self.io.write_bucket_manifest(
                    head_snap["snapshot_id"], bucket, new_ents,
                    token=f"purge{tok}x{j}")
            for s in snaps:
                mf = s.get("manifest_files", {})
                hit = {b: rel_map[r] for b, r in mf.items()
                       if r in rel_map}
                if not hit:
                    continue
                s2 = dict(s)
                s2["manifest_files"] = {**mf, **hit}
                p = self.io.snapshot_path(s["snapshot_id"])
                with open(p + ".tmp", "w", encoding="utf-8") as f:
                    _json.dump(s2, f, sort_keys=True)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(p + ".tmp", p)
                report["snapshots_updated"] += 1
            for relp in sorted(set(path_map) | dropped):
                try:
                    os.unlink(os.path.join(self.path, relp))
                except OSError:
                    pass
            for rel in rel_map:
                try:
                    os.unlink(os.path.join(self.path, rel))
                except OSError:
                    pass
            return report
        finally:
            os.close(fd)
            try:
                os.unlink(os.path.join(self.io.meta_dir, "COMMIT.lock"))
            except OSError:
                pass

    def expire_snapshots(self, keep_n: int = 2) -> dict:
        """Expire snapshots older than the newest ``keep_n``: delete
        their snapshot jsons and every data file referenced ONLY by
        expired snapshots. Time travel within the retention window
        stays byte-identical (a file carried forward into any retained
        manifest is live and untouched).

        Without this, every MOR merge and compaction leaves its
        superseded delta files on disk forever — a continuously
        ingesting table grows without bound. Mirrors the reference's
        reuse-don't-restore payload policy (payload blobs are shared,
        never duplicated — extraction/sources/gdacs/extract.py:128-139)
        extended with an explicit retention horizon.

        Single-writer assumption (same as commit): no concurrent merge
        while expiring. Directories of ids above HEAD are left for
        ``vacuum_orphans`` — they belong to a crashed in-flight commit,
        a different lifecycle event.
        """
        import shutil

        head = self.io.head_snapshot_id()
        retained: list[int] = []
        sid: int | None = head
        while sid is not None and len(retained) < keep_n:
            try:
                s = self.io.read_snapshot(sid)
            except FileNotFoundError:
                break
            retained.append(sid)
            sid = s["parent_id"]
        # tagged snapshots are pinned: their json, manifests and data
        # files stay live regardless of age (their ANCESTORS may still
        # expire — a tagged snapshot's manifests are self-contained)
        for tname, tsid in sorted(self.io.read_tags().items()):
            if tsid not in retained:
                try:
                    self.io.read_snapshot(tsid)
                except FileNotFoundError:
                    continue  # tag points past an earlier expiry
                retained.append(tsid)

        live = set()
        keep_manifests = set()
        for rid in retained:
            rs = self.io.read_snapshot(rid)
            for m in self.io.load_manifest(rs):
                live.add(os.path.normpath(m["path"]))
            for rel in rs.get("manifest_files", {}).values():
                keep_manifests.add(os.path.normpath(rel))

        # dead files come from a MANIFEST DIFF (expired ∖ retained), not
        # a walk of the whole data directory — expiry IO is proportional
        # to what is being expired, not to table size. Only the commit
        # dirs that actually lose files get a local sweep (which also
        # catches stranded zero-row part files the manifests never
        # referenced); untouched commit dirs are never opened.
        dead: set[str] = set()
        for sp in glob.glob(os.path.join(self.io.meta_dir, "snapshot-*.json")):
            m = re.fullmatch(r"snapshot-(\d+)\.json", os.path.basename(sp))
            if m is None or int(m.group(1)) in set(retained):
                continue
            es = self.io.read_snapshot(int(m.group(1)))
            for e in self.io.load_manifest(es):
                p = os.path.normpath(e["path"])
                if p not in live:
                    dead.add(p)

        removed_files = 0
        affected_dirs = set()
        for rel in dead:
            p = os.path.join(self.path, rel)
            if os.path.exists(p):
                os.remove(p)
                removed_files += 1
            crc = os.path.join(os.path.dirname(p), f".{os.path.basename(p)}.crc")
            if os.path.exists(crc):
                os.remove(crc)
            # data/sNNNNNNNN is the commit dir two levels up
            affected_dirs.add(os.path.dirname(os.path.dirname(p)))
        for sdir in sorted(affected_dirs):
            base = re.fullmatch(r"s(\d+)(?:-[0-9a-f]+)?", os.path.basename(sdir))
            if base is None or int(base.group(1)) > head:
                continue  # never touch an in-flight commit dir
            for p in glob.glob(os.path.join(sdir, "**", "*.parquet"), recursive=True):
                rel = os.path.normpath(os.path.relpath(p, self.path))
                if rel not in live:
                    os.remove(p)
                    removed_files += 1
            if not glob.glob(os.path.join(sdir, "**", "*.parquet"), recursive=True):
                shutil.rmtree(sdir, ignore_errors=True)
            else:
                for bdir in glob.glob(os.path.join(sdir, f"{_BUCKET_COL}=*")):
                    if not glob.glob(os.path.join(bdir, "*.parquet")):
                        shutil.rmtree(bdir, ignore_errors=True)

        removed_snaps = 0
        keep = set(retained)
        for sp in glob.glob(os.path.join(self.io.meta_dir, "snapshot-*.json")):
            m = re.fullmatch(r"snapshot-(\d+)\.json", os.path.basename(sp))
            if m and int(m.group(1)) not in keep:
                os.remove(sp)
                removed_snaps += 1
        removed_manifests = 0
        for mf in glob.glob(os.path.join(self.io.manifests_dir(), "*.json")):
            rel = os.path.normpath(os.path.relpath(mf, self.path))
            if rel not in keep_manifests:
                os.remove(mf)
                removed_manifests += 1
        return {
            "retained_snapshots": sorted(retained),
            "removed_snapshots": removed_snaps,
            "removed_data_files": removed_files,
            "removed_manifest_files": removed_manifests,
        }

    def vacuum_orphans(self) -> list[str]:
        """Startup sweep for crash debris: delete data directories of
        commits that wrote files but never swapped HEAD (``data/s<id>``
        with id above HEAD — step 1 of the commit protocol completed,
        steps 2-3 did not), plus torn ``_meta/*.tmp`` files. Safe by
        construction: files under ``data/s<id>`` are first referenced
        by snapshot ``id`` itself, so an id above HEAD is referenced by
        nothing. Returns the removed paths.

        Run this with NO writer in flight (startup / maintenance): an
        active concurrent writer's staging dir is indistinguishable
        from crash debris until its commit publishes."""
        import shutil

        removed: list[str] = []
        head = self.io.head_snapshot_id()
        for sdir in sorted(glob.glob(os.path.join(self.io.data_dir, "s*"))):
            m = re.fullmatch(r"s(\d+)(?:-[0-9a-f]+)?", os.path.basename(sdir))
            if m and int(m.group(1)) > head:
                shutil.rmtree(sdir, ignore_errors=True)
                removed.append(sdir)
        # manifest files written by the crashed commit (their name embeds
        # the committing snapshot id, which never reached HEAD)
        for mf in glob.glob(os.path.join(self.io.manifests_dir(), "m-*.json")):
            m = re.fullmatch(r"m-(\d+)(?:-[0-9a-f]+)?-b\d+\.json", os.path.basename(mf))
            if m and int(m.group(1)) > head:
                os.remove(mf)
                removed.append(mf)
        # loser-attempt debris at or below HEAD: a writer that lost a
        # commit race and crashed before its own abort leaves a
        # token-suffixed dir whose id the WINNER published. Such a dir
        # (and its token's manifest files) is removable iff no retained
        # snapshot references it — the token makes the check exact
        # (the winner's files live in a different-token dir).
        tokened = [
            d for d in glob.glob(os.path.join(self.io.data_dir, "s*-*"))
            if (m := re.fullmatch(r"s(\d+)-[0-9a-f]+", os.path.basename(d)))
            and int(m.group(1)) <= head
        ]
        tok_mfs = [
            mf for mf in glob.glob(os.path.join(self.io.manifests_dir(), "m-*-*-b*.json"))
            if (m := re.fullmatch(r"m-(\d+)-[0-9a-f]+-b\d+\.json", os.path.basename(mf)))
            and int(m.group(1)) <= head
        ]
        if tokened or tok_mfs:
            live_dirs: set[str] = set()
            live_mfs: set[str] = set()
            for s in self.history():
                for rel in s.get("manifest_files", {}).values():
                    live_mfs.add(os.path.basename(rel))
                for e in self.io.load_manifest(s):
                    parts = os.path.normpath(e["path"]).split(os.sep)
                    if len(parts) > 1:
                        live_dirs.add(parts[1])
            for d in tokened:
                if os.path.basename(d) not in live_dirs:
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
            for mf in tok_mfs:
                if os.path.basename(mf) not in live_mfs:
                    os.remove(mf)
                    removed.append(mf)
        # *.tmp (manifest/HEAD temps) and *.tmp.<pid> (snapshot temps)
        for tmp in glob.glob(os.path.join(self.io.meta_dir, "*.tmp*")) + glob.glob(
            os.path.join(self.io.manifests_dir(), "*.tmp*")
        ):
            os.remove(tmp)
            removed.append(tmp)
        return removed

    # -------------------------------------------------------------------- ddl
    # widenings where EVERY value of the narrow type maps losslessly —
    # the only type changes applicable without rewriting data files.
    # bigint→double is deliberately absent: ids above 2^53 do not
    # round-trip through a double.
    _WIDENINGS = {
        ("int", "bigint"), ("smallint", "int"), ("smallint", "bigint"),
        ("float", "double"), ("int", "double"),
    }

    def commit_batch_id(self, batch_id: int, commit_retries: int = 4) -> dict | None:
        """Retrying wrapper: metadata-only commit, so a CommitConflict
        retry simply rebuilds against the new HEAD (and the batchId
        no-op check re-runs, keeping redeliveries exactly-once)."""
        for attempt in range(commit_retries + 1):
            try:
                return self._commit_batch_id_once(batch_id)
            except CommitConflict:
                if attempt == commit_retries:
                    raise

    def _commit_batch_id_once(self, batch_id: int) -> dict | None:
        """Record an epoch that changed neither data nor schema (e.g. a
        DDL-only micro-batch whose DDLs were all already applied) as an
        empty commit carrying the batch high-water mark — so the
        standard duplicate-epoch check covers it like any other epoch.
        No-op (returns None) when the mark is already at or past it."""
        snap = self.snapshot()
        if batch_id <= snap["committed_max_batch_id"]:
            return None
        new_snap = {
            "snapshot_id": snap["snapshot_id"] + 1,
            "parent_id": snap["snapshot_id"],
            "type": "noop",
            "batch_id": batch_id,
            "schema_version": snap["schema_version"],
            "schemas": snap["schemas"],
            **(
                {"manifest": snap["manifest"]}
                if "manifest" in snap
                else {"manifest_files": snap.get("manifest_files", {})}
            ),
            "properties": snap["properties"],
            "offsets": snap["offsets"],
            "metrics": {"rows_written": 0, "buckets_rewritten": 0},
            "committed_max_batch_id": batch_id,
        }
        self.io.write_snapshot_and_swap_head(new_snap)
        return new_snap

    def rollback(self, snapshot_id: int | str,
                 commit_retries: int = 4) -> dict:
        """Undo bad commits by rolling the table FORWARD: commit a NEW
        snapshot carrying the target's logical state — schema, bucket
        manifests (by reference), offsets, properties and the batch-id
        ledger — with no data movement. History is preserved (the
        undone snapshots stay time-travelable until they expire, after
        which ``expire_snapshots`` + ``vacuum_orphans`` reclaim the bad
        batch's files). ``snapshot_id`` may be an id or a TAG name and
        must still be retained; commits are linear under OCC, so every
        retained snapshot is an ancestor — no chain walk needed.

        Restoring ``committed_max_batch_id`` is deliberate: after
        rolling back past a bad batch, redelivering that batch id (the
        FIXED payload, or the original on crash-replay) MERGES instead
        of no-opping — the undo-and-redeliver recovery flow this
        exists for. Composes with tags as audit-publish's inverse:
        tag "published" → audit fails later → ``rollback("published")``.

        Metadata-only, so a ``CommitConflict`` retry just rebuilds
        against the new HEAD (same policy as ``commit_batch_id`` /
        ``apply_ddl``). Reference analogue: the reference recovers a
        bad day's load by re-running over the same idempotency keys
        (apps/etl/extraction pipelines); with snapshots the undo is
        O(1) metadata instead of a compensating delete pass.
        """
        for attempt in range(commit_retries + 1):
            try:
                return self._rollback_once(snapshot_id)
            except CommitConflict:
                if attempt == commit_retries:
                    raise

    def _rollback_once(self, snapshot_id: int | str) -> dict:
        target = self.snapshot(snapshot_id)
        snap = self.snapshot()
        if target["snapshot_id"] == snap["snapshot_id"]:
            return snap  # already there — no-op, no empty commit
        new_snap = {
            "snapshot_id": snap["snapshot_id"] + 1,
            "parent_id": snap["snapshot_id"],
            "type": "rollback",
            "batch_id": None,
            "schema_version": target["schema_version"],
            "schemas": target["schemas"],
            **(
                {"manifest": target["manifest"]}
                if "manifest" in target
                else {"manifest_files": target.get("manifest_files", {})}
            ),
            "properties": target["properties"],
            "offsets": target["offsets"],
            "metrics": {"rows_written": 0, "buckets_rewritten": 0,
                        "rolled_back_to": target["snapshot_id"]},
            "committed_max_batch_id": target["committed_max_batch_id"],
        }
        self.io.write_snapshot_and_swap_head(new_snap)
        return new_snap

    def apply_ddl(self, op: str, field: str, new_name: str | None = None,
                  dtype: str | None = None, batch_id: int | None = None,
                  commit_retries: int = 4) -> dict:
        """Retrying wrapper (see :meth:`_apply_ddl_once`): DDL commits
        are schema-only, so a CommitConflict retry revalidates and
        rebuilds the schema change against the new HEAD."""
        for attempt in range(commit_retries + 1):
            try:
                return self._apply_ddl_once(op, field, new_name=new_name,
                                            dtype=dtype, batch_id=batch_id)
            except CommitConflict:
                if attempt == commit_retries:
                    raise

    def _apply_ddl_once(self, op: str, field: str, new_name: str | None = None,
                  dtype: str | None = None, batch_id: int | None = None) -> dict:
        """Apply a schema-evolution event as a schema-only snapshot —
        no data file is touched by any of these (Iceberg-style id-based
        column mapping):

        - add_column: new field gets the next unused user field id;
          pre-DDL files read it as NULL.
        - rename_column: same field id, new name — old files stay
          readable through the id → current-name mapping.
        - drop_column: field removed from the current schema; old files
          still physically hold the column but reads project it away.
          The id is never reused, so a later add of the same NAME is a
          distinct column (old values do not leak into it).
        - widen_column: in-place lossless type widening (int→bigint,
          float→double, ...); reads cast old files' narrow values up.
        """
        snap = self.snapshot()
        fields = self.current_fields(snap)
        if op == "add_column":
            if any(f.name == field for f in fields):
                raise ValueError(f"column {field} already exists")
            used = set()
            for ver_fields in snap["schemas"].values():
                used.update(fj["id"] for fj in ver_fields if fj["id"] < 1000)
            next_id = max(used, default=0) + 1
            fields = fields[:-2] + [Field(next_id, field, dtype or "string", True)] + fields[-2:]
        elif op == "rename_column":
            hits = [f for f in fields if f.name == field]
            if not hits:
                raise ValueError(f"no such column {field}")
            if hits[0].id >= 1000:
                # seq/op are wired into LWW + tombstone filtering by
                # name — renaming them would brick every read
                raise ValueError(f"cannot rename system column {field}")
            if any(f.name == new_name for f in fields):
                raise ValueError(f"column {new_name} already exists")
            hits[0].name = new_name
        elif op == "drop_column":
            hits = [f for f in fields if f.name == field]
            if not hits:
                raise ValueError(f"no such column {field}")
            protected = {snap["properties"]["key_col"], *snap["properties"]["order_cols"]}
            if hits[0].id >= 1000 or field in protected:
                raise ValueError(f"cannot drop system/key/order column {field}")
            fields = [f for f in fields if f.name != field]
        elif op == "widen_column":
            hits = [f for f in fields if f.name == field]
            if not hits:
                raise ValueError(f"no such column {field}")
            protected = {snap["properties"]["key_col"], *snap["properties"]["order_cols"]}
            if hits[0].id >= 1000 or field in protected:
                # the LWW/exactly-once contract types (key, warc_ts, seq)
                # are load-bearing — no type surgery on them
                raise ValueError(f"cannot widen system/key/order column {field}")
            if (hits[0].type, dtype) not in self._WIDENINGS:
                raise ValueError(
                    f"not a lossless widening: {hits[0].type} -> {dtype}"
                )
            hits[0].type = dtype
        else:
            raise ValueError(f"unknown ddl op {op}")

        next_version = snap["schema_version"] + 1
        schemas = dict(snap["schemas"])
        schemas[str(next_version)] = TableMetadataIO.fields_to_json(fields)
        props = snap["properties"]
        if op == "rename_column":
            # the key/order/stats contracts follow the NAME (ids are a
            # storage detail): renaming the key column must rename the
            # key_col property too, or every later read/merge resolves
            # a column that no longer exists.
            # Known degradation (ADVICE r5, accepted): historical
            # manifest entries keep col_stats/bloom keyed under the OLD
            # name, so range_filters pruning on the renamed column
            # conservatively keeps those files (full-bucket scan, never
            # a wrong result) until the next compaction re-harvests
            # stats under the new name.
            def _ren(x: str) -> str:
                return new_name if x == field else x

            props = dict(props)
            props["key_col"] = _ren(props["key_col"])
            props["order_cols"] = [_ren(c) for c in props["order_cols"]]
            for lk in ("stats_cols", "ndv_cols"):
                if lk in props:
                    props[lk] = [_ren(c) for c in props[lk]]
        new_snap = {
            "snapshot_id": snap["snapshot_id"] + 1,
            "parent_id": snap["snapshot_id"],
            "type": "schema",
            "ddl": {"op": op, "field": field, "new_name": new_name, "dtype": dtype},
            "batch_id": batch_id,
            "schema_version": next_version,
            "schemas": schemas,
            # schema-only snapshot: data unchanged, carry by reference
            # (legacy inline-manifest parents keep their inline form)
            **(
                {"manifest": snap["manifest"]}
                if "manifest" in snap
                else {"manifest_files": snap.get("manifest_files", {})}
            ),
            "properties": props,
            "offsets": snap["offsets"],
            "metrics": {"rows_written": 0, "buckets_rewritten": 0},
            # a DDL-ONLY micro-batch has no data commit to carry its
            # epoch id, so the schema snapshot itself advances the
            # high-water mark — duplicate-delivery safety then rests on
            # the same committed-batch-id check as every data epoch,
            # not on inferring applied-ness from the live schema (which
            # breaks for rename A->B later followed by rename B->A)
            "committed_max_batch_id": (
                max(snap["committed_max_batch_id"], batch_id)
                if batch_id is not None
                else snap["committed_max_batch_id"]
            ),
        }
        self.io.write_snapshot_and_swap_head(new_snap)
        return new_snap
