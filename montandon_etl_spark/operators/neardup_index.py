"""Incremental near-duplicate index: minhash signatures as a lake
side-table maintained per CDC merge batch.

``minhash_lsh_pairs`` recomputes signatures over the whole corpus —
O(corpus) per call. A CDC engine ingesting batches forever should pay
O(batch) to keep the near-dup view current (reference analogue: the
content-hash dedup check runs per ingested item, apps/etl/models.py
hash columns, not per corpus). This module maintains three artifacts:

- a **signature table**: a ``SnapshotTable`` keyed like the corpus
  (url), whose payload columns are the k minhash values — so signature
  maintenance inherits the lake's LWW MERGE, exactly-once batch ids,
  tombstones, compaction and time travel for free;
- a **banded store**: the (band, bucket, id) projection of every live
  signature, physically partitioned by ``pfx = hash(band|bucket) %
  n_pfx`` with per-prefix versioning — a batch rewrites ONLY the
  prefixes its old+new buckets hash into, and the candidate join reads
  ONLY those prefixes (the lake's bucket-pruning trick applied to the
  LSH keyspace). Per-batch I/O is O(touched prefixes), never
  O(corpus);
- a **materialized candidate-pair set**: per batch, pairs involving a
  touched key are retracted and the batch keys' surviving signatures
  are band-bucket joined against the touched-prefix slice of the
  banded store — new-pair WORK is O(batch x bucket).

Scale notes (100 TB): the signature table is ~16 bigints/key (~1.3 TB
at 10^10 docs); the banded store is bands x that, spread over n_pfx
partitions so a batch touching B buckets reads ~B/n_pfx of it. The
pair store is rewritten filtered per batch (pairs are orders of
magnitude smaller than the corpus); at extreme pair counts you would
partition it the same way and rewrite only touched partitions.

Equivalence contract (tested): after any sequence of upsert/delete
batches, ``pairs()`` equals a full-corpus ``minhash_lsh_pairs``
recompute over the surviving LWW state — for the uncapped setting.
A ``max_bucket`` cap is size-dependent global state (a bucket crossing
the cap must RETRACT pairs), so the incremental index pins
``max_bucket=None`` and leaves capping to the downstream verifier.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.dedup import _banded, hash60, minhash_signatures

BANDED_SCHEMA = "id string, band int, bucket string, pfx int"


class NearDupIndex:
    """Incrementally-maintained minhash-LSH candidate-pair index over a
    CDC change stream. See module docstring."""

    def __init__(self, path: str, n: int = 3, k: int = 16, bands: int = 4,
                 n_pfx: int = 64):
        self.path = path
        cfg_path = os.path.join(path, "index.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            n, k, bands, n_pfx = cfg["n"], cfg["k"], cfg["bands"], cfg["n_pfx"]
        assert k % bands == 0
        self.n, self.k, self.bands, self.n_pfx = n, k, bands, n_pfx
        self.table = SnapshotTable(os.path.join(path, "sig"))

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, n: int = 3, k: int = 16, bands: int = 4,
               key_col: str = "url", n_buckets: int = 16,
               n_pfx: int = 64) -> "NearDupIndex":
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
        os.makedirs(os.path.join(path, "banded"), exist_ok=True)
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump({"n": n, "k": k, "bands": bands, "n_pfx": n_pfx}, f)
        return cls(path)

    @property
    def key_col(self) -> str:
        return self.table.properties["key_col"]

    # ----------------------------------------------------------------- state
    def signatures(self, spark: SparkSession,
                   snapshot_id: int | None = None) -> DataFrame:
        """Live signature rows (key, mh0..mh{k-1})."""
        cols = [self.key_col] + [f"mh{i}" for i in range(self.k)]
        return self.table.read(spark, snapshot_id=snapshot_id).select(*cols)

    def _with_pfx(self, banded: DataFrame) -> DataFrame:
        pfx = F.pmod(
            hash60(F.concat_ws("|", F.col("band").cast("string"),
                               F.col("bucket"))),
            F.lit(self.n_pfx),
        ).cast("int")
        return banded.withColumn("pfx", pfx)

    def _versions(self, store: str) -> list[int]:
        vs = []
        for d in glob.glob(os.path.join(self.path, store, "v*")):
            base = os.path.basename(d)
            if base[1:].isdigit() and glob.glob(os.path.join(d, "_SUCCESS")):
                vs.append(int(base[1:]))
        return sorted(vs)

    def _banded_dirs(self, pfx_filter: set[int] | None = None) -> list[str]:
        """Current data dirs of the banded store: for each prefix, the
        newest version that rewrote it (per-prefix versioning — exactly
        the manifest-carry-over trick the lake uses for buckets)."""
        latest: dict[int, str] = {}
        for v in self._versions("banded"):
            vd = os.path.join(self.path, "banded", f"v{v}")
            for pd in glob.glob(os.path.join(vd, "pfx=*")):
                p = int(os.path.basename(pd).split("=")[1])
                latest[p] = pd  # versions ascend → last wins
        if pfx_filter is not None:
            latest = {p: d for p, d in latest.items() if p in pfx_filter}
        return [latest[p] for p in sorted(latest)]

    def _read_banded(self, spark: SparkSession,
                     pfx_filter: set[int] | None = None) -> DataFrame:
        # an empty `pfx=N` dir is a tombstone: the newest rewrite of
        # that prefix produced zero rows (every entry retracted) — it
        # supersedes older versions in _banded_dirs but reads as nothing
        dirs = [d for d in self._banded_dirs(pfx_filter)
                if glob.glob(os.path.join(d, "*.parquet"))]
        if not dirs:
            return spark.createDataFrame([], BANDED_SCHEMA).drop("pfx")
        # leaf `pfx=N` dirs are read as plain files (the partition
        # column is re-derived by _with_pfx when needed)
        return spark.read.parquet(*dirs).select("id", "band", "bucket")

    def pairs(self, spark: SparkSession) -> DataFrame:
        """Current candidate pairs (id_a < id_b) — the materialized
        equivalent of a full-corpus minhash_lsh_pairs recompute."""
        vs = self._versions("pairs")
        if not vs:
            return spark.createDataFrame([], "id_a string, id_b string")
        return spark.read.parquet(os.path.join(self.path, "pairs", f"v{vs[-1]}"))

    # ---------------------------------------------------------------- update
    def update(self, spark: SparkSession, batch_df: DataFrame,
               text_col: str = "text", batch_id: int | None = None) -> None:
        """Apply one changelog micro-batch (key, warc_ts, seq, op,
        text) to the index: signatures for the batch's upserts merge
        into the signature table (deletes tombstone); the banded store
        rewrites only the prefixes hit by the touched keys' OLD and NEW
        buckets; the pair set retracts pairs touching batch keys and
        adds pairs from the surviving signatures' buckets joined
        against those same touched prefixes.

        Exactly-once: the signature merge dedups on ``batch_id``; the
        banded and pair stores are versioned by the resulting snapshot
        id, so a re-delivered batch that already produced all artifacts
        is a full no-op, and a crash between them is repaired on
        re-delivery (the derived writes re-run against the same
        snapshot).
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
        # the pre-batch snapshot is head's PARENT in the commit log —
        # never the pre-call head: on a re-delivered batch the merge
        # no-ops and pre-call head == head, which would make "old
        # buckets" read post-merge state and lose the retraction
        # prefixes (stale banded entries would resurrect)
        prev_sid = self.table.io.read_snapshot(head).get("parent_id")
        pair_dir = os.path.join(self.path, "pairs", f"v{head}")
        banded_dir = os.path.join(self.path, "banded", f"v{head}")
        if (res is None and head in self._versions("pairs")
                and head in self._versions("banded")):
            return  # duplicate delivery, all artifacts exist → no-op

        # keys whose index entries must be rebuilt = the batch's touched
        # keys; their SURVIVING signatures come from the post-merge
        # table (stale events that lose the LWW election re-derive from
        # the winner, never the stale row)
        touched_keys = (
            batch_df.select(F.col(key).alias("id")).distinct().localCheckpoint()
        )
        new_sigs = (
            self.signatures(spark).withColumnRenamed(key, "id")
            .join(touched_keys, "id", "left_semi")
        )
        new_banded = self._with_pfx(_banded(new_sigs, self.k, self.bands))
        # old buckets (pre-merge signatures) determine which prefixes
        # hold entries that must be RETRACTED
        old_banded = None
        if prev_sid is not None:
            old_sigs = (
                self.signatures(spark, snapshot_id=prev_sid)
                .withColumnRenamed(key, "id")
                .join(touched_keys, "id", "left_semi")
            )
            old_banded = self._with_pfx(_banded(old_sigs, self.k, self.bands))

        # touched prefixes: bounded metadata (≤ bands × |touched keys|)
        pfx_df = new_banded.select("pfx")
        if old_banded is not None:
            pfx_df = pfx_df.unionByName(old_banded.select("pfx"))
        touched_pfx = {r["pfx"] for r in pfx_df.distinct().collect()}

        # rewrite ONLY the touched prefixes: previous content of those
        # prefixes minus touched ids, plus the new entries
        prev_slice = self._read_banded(spark, pfx_filter=touched_pfx)
        idx_slice = (
            self._with_pfx(prev_slice.join(touched_keys, "id", "left_anti"))
            .unionByName(new_banded)
            .persist()
        )
        if touched_pfx:
            (idx_slice.write.mode("overwrite").partitionBy("pfx")
             .parquet(banded_dir))
        else:  # nothing touched: stamp an empty version for idempotency
            spark.createDataFrame([], BANDED_SCHEMA).write.mode(
                "overwrite").partitionBy("pfx").parquet(banded_dir)
        # a touched prefix whose new content is EMPTY gets no partition
        # dir from the write — stamp an empty tombstone dir so it still
        # supersedes older versions (otherwise retracted entries would
        # resurrect through the stale older partition)
        for p in touched_pfx:
            os.makedirs(os.path.join(banded_dir, f"pfx={p}"), exist_ok=True)

        # candidate pairs: batch-side buckets vs the SAME touched-prefix
        # slice — O(batch x bucket) work, O(touched prefixes) read
        bb = new_banded.select(
            F.col("id").alias("bid"), "band", "bucket"
        )
        new_pairs = (
            bb.join(idx_slice, ["band", "bucket"])
            .filter(F.col("bid") != F.col("id"))
            .select(
                F.least("bid", "id").alias("id_a"),
                F.greatest("bid", "id").alias("id_b"),
            )
            .distinct()
        )
        touched_a = touched_keys.withColumnRenamed("id", "id_a")
        kept = (
            self.pairs(spark)
            .join(touched_a, "id_a", "left_anti")
            .join(touched_a.withColumnRenamed("id_a", "id_b"), "id_b", "left_anti")
            .select("id_a", "id_b")
        )
        out = kept.unionByName(new_pairs).distinct()
        out.write.mode("overwrite").parquet(pair_dir)
        idx_slice.unpersist()

        # retain only the previous version for crash recovery; a banded
        # version dir is deletable once every prefix it carries has been
        # rewritten by a newer version
        for v in self._versions("pairs")[:-2]:
            shutil.rmtree(os.path.join(self.path, "pairs", f"v{v}"),
                          ignore_errors=True)
        live = set(self._banded_dirs())
        for v in self._versions("banded")[:-1]:
            vd = os.path.join(self.path, "banded", f"v{v}")
            if not any(d.startswith(vd + os.sep) or d == vd for d in live):
                shutil.rmtree(vd, ignore_errors=True)
