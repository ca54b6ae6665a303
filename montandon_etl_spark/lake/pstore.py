"""Versioned, partition-pruned derived-state store.

The storage primitive shared by the engine's incremental indexes
(``NearDupIndex``'s banded/pair stores, ``AnnIndex``'s postings): a
directory of immutable version dirs ``v{snapshot_id}/``, each holding
parquet files under ``{part_col}={p}/`` partition dirs for ONLY the
partitions that version rewrote. Reads resolve each partition to the
NEWEST version that rewrote it (the lake's manifest-carry-over trick
applied to derived state), so

- a batch WRITES only the partitions it touches (one file per
  partition per version via an explicit repartition — without it every
  upstream task writes a sliver into every partition dir and the
  open-cost of O(tasks × partitions) tiny files makes later reads
  scheduling-bound);
- a reader with a partition filter READS only those partitions'
  newest files;
- an empty ``{part_col}={p}`` dir is a TOMBSTONE: the newest rewrite
  of that partition produced zero rows, superseding older versions
  without resurrecting retracted entries;
- versions are keyed by the snapshot id they reflect, so duplicate
  delivery is a no-op check (`version in versions()`) and a crashed
  retry rewrites identical content;
- GC deletes a version dir once every partition it carries has been
  rewritten by a newer version.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedPartitionStore:
    def __init__(self, root: str, part_col: str, n_parts: int):
        self.root, self.part_col, self.n_parts = root, part_col, n_parts
        os.makedirs(root, exist_ok=True)

    def versions(self) -> list[int]:
        vs = []
        for d in glob.glob(os.path.join(self.root, "v*")):
            base = os.path.basename(d)
            if base[1:].isdigit() and glob.glob(os.path.join(d, "_SUCCESS")):
                vs.append(int(base[1:]))
        return sorted(vs)

    def _dirs(self, part_filter: set[int] | None = None,
              below_version: int | None = None) -> list[str]:
        """Current data dirs: for each partition, the newest version
        that rewrote it. ``below_version`` resolves against versions
        STRICTLY BELOW the given id — the pre-state view a crash-retry
        needs (safe because gc always retains the previous
        generation)."""
        latest: dict[int, str] = {}
        vs = self.versions()
        if below_version is not None:
            vs = [v for v in vs if v < below_version]
        for v in vs:
            vd = os.path.join(self.root, f"v{v}")
            for pd in glob.glob(os.path.join(vd, f"{self.part_col}=*")):
                p = int(os.path.basename(pd).split("=")[1])
                latest[p] = pd  # versions ascend → last wins
        if part_filter is not None:
            latest = {p: d for p, d in latest.items() if p in part_filter}
        return [latest[p] for p in sorted(latest)]

    def read(self, spark: SparkSession, schema: str,
             part_filter: set[int] | None = None,
             attach_part: bool = False,
             below_version: int | None = None) -> DataFrame:
        """Current content. ``schema`` is the full schema INCLUDING the
        partition column. Leaf dirs are read as plain files, so the
        partition column is absent by default; ``attach_part=True``
        tags each dir's rows with its partition value (one lit per
        dir — the dir count is bounded by n_parts)."""
        dirs = [d for d in self._dirs(part_filter, below_version)
                if glob.glob(os.path.join(d, "*.parquet"))]
        cols = [c.split()[0] for c in schema.split(",")
                if c.split()[0] != self.part_col]
        out_cols = cols + ([self.part_col] if attach_part else [])
        if not dirs:
            return spark.createDataFrame([], schema).select(*out_cols)
        if not attach_part:
            return spark.read.parquet(*dirs).select(*cols)
        parts = []
        for d in dirs:
            p = int(os.path.basename(d).split("=")[1])
            parts.append(
                spark.read.parquet(d).select(*cols)
                .withColumn(self.part_col, F.lit(p).cast("int"))
            )
        df = parts[0]
        for x in parts[1:]:
            df = df.unionByName(x)
        return df

    def write(self, spark: SparkSession, df: DataFrame, version: int,
              touched: set[int], schema: str) -> None:
        """One versioned rewrite of the touched partitions; stamps
        tombstone dirs for touched partitions whose new content is
        empty. ``df`` must carry the partition column."""
        ver_dir = os.path.join(self.root, f"v{version}")
        if touched:
            # guard: a row outside the touched set would silently write
            # a partition holding ONLY that row, truncating the
            # partition's other content on the next read — correct
            # callers never produce such rows, so this filter is a
            # no-op that turns a drift bug into missing data the
            # equivalence tests catch immediately
            df = df.filter(F.col(self.part_col).isin(*touched))
            (df.repartition(self.n_parts, self.part_col)
             .write.mode("overwrite").partitionBy(self.part_col)
             .parquet(ver_dir))
        else:  # nothing touched: stamp an empty version for idempotency
            spark.createDataFrame([], schema).write.mode(
                "overwrite").partitionBy(self.part_col).parquet(ver_dir)
        for p in touched:
            os.makedirs(os.path.join(ver_dir, f"{self.part_col}={p}"),
                        exist_ok=True)

    def gc(self) -> None:
        """Delete versions that are both (a) older than the newest two
        — the previous generation is ALWAYS retained so a torn/lost
        newest version can be recovered by re-delivery — and (b) fully
        superseded: every partition they carry has been rewritten by a
        newer version (a version still carrying a live partition is
        never deletable, however old)."""
        live = set(self._dirs())
        for v in self.versions()[:-2]:
            vd = os.path.join(self.root, f"v{v}")
            if not any(d.startswith(vd + os.sep) or d == vd for d in live):
                shutil.rmtree(vd, ignore_errors=True)
