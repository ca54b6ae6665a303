"""Incremental near-duplicate index: minhash signatures as a lake
side-table maintained per CDC merge batch.

``minhash_lsh_pairs`` recomputes signatures over the whole corpus —
O(corpus) per call. A CDC engine ingesting batches forever should pay
O(batch) to keep the near-dup view current (reference analogue: the
content-hash dedup check runs per ingested item, apps/etl/models.py
hash columns, not per corpus). This module maintains:

- a **signature table**: a ``SnapshotTable`` keyed like the corpus
  (url), whose payload columns are the k minhash values — so signature
  maintenance inherits the lake's LWW MERGE, exactly-once batch ids,
  tombstones, compaction and time travel for free;
- a **materialized candidate-pair set**: per batch, pairs involving a
  touched key are retracted and the batch's winners are band-bucket
  joined against the post-merge index — new-pair WORK is
  O(batch x bucket), never O(corpus²).

Scale notes (100 TB): the signature table is ~16 bigints/key — the
index for 10^10 docs is ~1.3 TB, a narrow scan. The per-batch bucket
join reads the index once; to prune that scan too, store the banded
projection bucket-partitioned (same trick as the corpus bucket layout)
— noted here, not needed at sandbox scale. The pair store is rewritten
filtered per batch (pairs are orders of magnitude smaller than the
corpus); at extreme pair counts you would partition it by
hash(id_a) and rewrite only touched partitions.

Equivalence contract (tested): after any sequence of upsert/delete
batches, ``pairs()`` equals a full-corpus ``minhash_lsh_pairs``
recompute over the surviving LWW state — for the uncapped setting.
A ``max_bucket`` cap is size-dependent global state (a bucket crossing
the cap must RETRACT pairs), so the incremental index pins
``max_bucket=None`` and leaves capping to the downstream verifier.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.dedup import _banded, minhash_signatures


class NearDupIndex:
    """Incrementally-maintained minhash-LSH candidate-pair index over a
    CDC change stream. See module docstring."""

    def __init__(self, path: str, n: int = 3, k: int = 16, bands: int = 4):
        assert k % bands == 0
        self.path = path
        self.n, self.k, self.bands = n, k, bands
        self.table = SnapshotTable(os.path.join(path, "sig"))

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, n: int = 3, k: int = 16, bands: int = 4,
               key_col: str = "url", n_buckets: int = 16) -> "NearDupIndex":
        idx = cls(path, n=n, k=k, bands=bands)
        fields = [
            Field(1, key_col, "string", False),
            Field(2, "warc_ts", "timestamp", False),
            *[Field(10 + i, f"mh{i}", "bigint", True) for i in range(k)],
        ]
        SnapshotTable.create(
            os.path.join(path, "sig"), fields=fields, key_col=key_col,
            n_buckets=n_buckets,
        )
        os.makedirs(os.path.join(path, "pairs"), exist_ok=True)
        return idx

    @property
    def key_col(self) -> str:
        return self.table.properties["key_col"]

    # ----------------------------------------------------------------- state
    def signatures(self, spark: SparkSession) -> DataFrame:
        """Live signature rows (key, mh0..mh{k-1})."""
        cols = [self.key_col] + [f"mh{i}" for i in range(self.k)]
        return self.table.read(spark).select(*cols)

    def _pair_versions(self) -> list[int]:
        vs = []
        for d in glob.glob(os.path.join(self.path, "pairs", "v*")):
            base = os.path.basename(d)
            if base[1:].isdigit() and glob.glob(os.path.join(d, "_SUCCESS")):
                vs.append(int(base[1:]))
        return sorted(vs)

    def pairs(self, spark: SparkSession) -> DataFrame:
        """Current candidate pairs (id_a < id_b) — the materialized
        equivalent of a full-corpus minhash_lsh_pairs recompute."""
        vs = self._pair_versions()
        if not vs:
            return spark.createDataFrame([], "id_a string, id_b string")
        return spark.read.parquet(os.path.join(self.path, "pairs", f"v{vs[-1]}"))

    # ---------------------------------------------------------------- update
    def update(self, spark: SparkSession, batch_df: DataFrame,
               text_col: str = "text", batch_id: int | None = None) -> None:
        """Apply one changelog micro-batch (key, warc_ts, seq, op,
        text) to the index: signatures for the batch's upserts merge
        into the signature table (deletes tombstone), then the pair set
        is advanced — retract pairs touching batch keys, add pairs from
        the batch winners' band buckets against the post-merge index.

        Exactly-once: the signature merge dedups on ``batch_id``; the
        pair store is versioned by the resulting snapshot id, so a
        re-delivered batch that already produced both artifacts is a
        full no-op, and a crash between the two is repaired on
        re-delivery (the pair write re-runs against the same snapshot).
        """
        key = self.key_col
        ups = batch_df.filter(F.col("op") == "upsert")
        sigs = (
            minhash_signatures(ups, id_col="seq", text_col=text_col,
                               n=self.n, k=self.k)
            .withColumnRenamed("id", "seq")
            .join(ups.select("seq", key, "warc_ts", "op"), "seq")
        )
        dels = batch_df.filter(F.col("op") == "delete").select(
            "seq", key, "warc_ts", "op"
        )
        merged = sigs.unionByName(dels, allowMissingColumns=True)
        res = self.table.merge(spark, merged, batch_id=batch_id)
        head = self.table.io.head_snapshot_id()
        pair_dir = os.path.join(self.path, "pairs", f"v{head}")
        if res is None and head in self._pair_versions():
            return  # duplicate delivery, both artifacts exist → no-op

        # the keys whose pairs must be rebuilt are the batch's touched
        # keys that are STILL ALIVE after the merge — reading them back
        # from the index (not from batch ops) makes stale events safe:
        # a late-arriving delete/upsert that LOSES the LWW election
        # re-derives pairs from the surviving signature, not from the
        # stale batch row
        touched_keys = batch_df.select(F.col(key).alias("id")).distinct()
        index_sigs = self.signatures(spark).withColumnRenamed(key, "id")
        batch_sigs = index_sigs.join(touched_keys, "id", "left_semi")
        # band-bucket join: batch buckets vs full-index buckets —
        # O(batch x bucket) pair work, one narrow index scan
        bb = _banded(batch_sigs, self.k, self.bands).withColumnRenamed("id", "bid")
        ib = _banded(index_sigs, self.k, self.bands)
        new_pairs = (
            bb.join(ib, ["band", "bucket"])
            .filter(F.col("bid") != F.col("id"))
            .select(
                F.least("bid", "id").alias("id_a"),
                F.greatest("bid", "id").alias("id_b"),
            )
            .distinct()
        )
        touched = batch_df.select(F.col(key).alias("id_a")).distinct()
        kept = (
            self.pairs(spark)
            .join(touched, "id_a", "left_anti")
            .join(touched.withColumnRenamed("id_a", "id_b"), "id_b", "left_anti")
            .select("id_a", "id_b")
        )
        out = kept.unionByName(new_pairs).distinct()
        out.write.mode("overwrite").parquet(pair_dir)
        # retain only the previous version for crash recovery
        import shutil

        for v in self._pair_versions()[:-2]:
            shutil.rmtree(os.path.join(self.path, "pairs", f"v{v}"),
                          ignore_errors=True)
