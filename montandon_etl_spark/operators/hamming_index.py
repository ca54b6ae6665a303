"""Incremental banded-Hamming near-dup index — the multimodal
(image dHash / audio energy-gradient) analogue of the minhash
``NearDupIndex``, maintained per CDC batch.

Input batches carry a 64-bit perceptual fingerprint as four 16-bit
band ints (the exact output of ``phash.image_dhash`` and
``wav.audio_fingerprint``), so ONE index serves every modality that
speaks the band format. Design is the proven NearDupIndex shape
(operators/neardup_index.py):

- a **fingerprint table** (``SnapshotTable`` keyed like the corpus):
  LWW MERGE, exactly-once batch ids, tombstones, time travel for
  free; undecodable payloads (NULL bands) stay as rows but produce no
  index entries — record-not-drop;
- ONE **fused store** (``VersionedPartitionStore`` over ``pfx =
  hash60(band|value) % n_pfx``) holding banded entries (kind 'b')
  AND verified pairs (kind 'p') with (band, value) provenance.
  Banded rows CARRY the full 4-band fingerprint, so the pair
  derivation verifies Hamming distance inside the bucket join —
  no lookup back into the corpus, no second table read.

Incremental correctness is the same provenance argument: a pair is
live iff some band bucket still produces it, bucket contents change
only when a touched key enters or leaves, so each batch retracts the
touched buckets' rows and re-derives them from the post-merge slice.
Per-batch I/O is O(touched prefixes), never O(corpus) — and
``pairs()`` equals a full recompute over the surviving fingerprints
(banded blocking is EXACT for max_hamming <= 3 by pigeonhole, so
"candidate recall" is not probabilistic here).

Exactly-once: fingerprint merge dedups on batch_id; the store is
versioned by the resulting snapshot id; derived reads resolve
strictly below head — a redelivered batch is a no-op end-to-end, a
crash between artifacts repairs on redelivery.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.dedup import hash60

N_BANDS = 4
ROWS_SCHEMA = ("kind string, id string, id_a string, id_b string,"
               " hamming int, band int, value int,"
               " f0 int, f1 int, f2 int, f3 int, pfx int")


class HammingIndex:
    """CDC-maintained banded-Hamming fingerprint index."""

    LAYOUT = 1

    def __init__(self, path: str, n_pfx: int = 64, max_hamming: int = 3):
        self.path = path
        cfg_path = os.path.join(path, "index.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            if cfg.get("layout") != self.LAYOUT:
                raise ValueError(
                    f"HammingIndex at {path} has layout "
                    f"{cfg.get('layout')!r}; this build reads "
                    f"{self.LAYOUT}")
            n_pfx, max_hamming = cfg["n_pfx"], cfg["max_hamming"]
        self.n_pfx, self.max_hamming = n_pfx, max_hamming
        self.table = SnapshotTable(os.path.join(path, "fp"))
        self.store = VersionedPartitionStore(
            os.path.join(path, "lsh"), "pfx", n_pfx)

    @classmethod
    def create(cls, path: str, key_col: str = "url", n_buckets: int = 16,
               n_pfx: int = 64, max_hamming: int = 3) -> "HammingIndex":
        fields = [
            Field(1, key_col, "string", False),
            Field(2, "warc_ts", "timestamp", False),
            *[Field(10 + i, f"b{i}", "int", True) for i in range(N_BANDS)],
        ]
        SnapshotTable.create(os.path.join(path, "fp"), fields=fields,
                             key_col=key_col, n_buckets=n_buckets)
        os.makedirs(os.path.join(path, "lsh"), exist_ok=True)
        with open(os.path.join(path, "index.json"), "w") as f:
            json.dump({"layout": cls.LAYOUT, "n_pfx": n_pfx,
                       "max_hamming": max_hamming}, f)
        return cls(path)

    @property
    def key_col(self) -> str:
        return self.table.properties["key_col"]

    # ----------------------------------------------------------- state
    def fingerprints(self, spark: SparkSession,
                     snapshot_id: int | None = None,
                     buckets: list[int] | None = None) -> DataFrame:
        cols = [self.key_col] + [f"b{i}" for i in range(N_BANDS)]
        return self.table.read(spark, snapshot_id=snapshot_id,
                               buckets=buckets).select(*cols)

    def pairs(self, spark: SparkSession) -> DataFrame:
        """(id_a, id_b, hamming) — the materialized equivalent of a
        full banded-Hamming recompute over the surviving corpus."""
        return (self.store.read(spark, ROWS_SCHEMA)
                .filter(F.col("kind") == "p")
                .select("id_a", "id_b", "hamming").distinct())

    # ---------------------------------------------------------- update
    def _with_pfx(self, df: DataFrame) -> DataFrame:
        pfx = F.pmod(
            hash60(F.concat_ws("|", F.col("band").cast("string"),
                               F.col("value").cast("string"))),
            F.lit(self.n_pfx)).cast("int")
        return df.withColumn("pfx", pfx)

    def _ents(self, fps: DataFrame) -> DataFrame:
        """Fingerprint rows → 4 banded entries each, carrying the
        full fingerprint (NULL fingerprints contribute nothing)."""
        fps = fps.filter(F.col("b0").isNotNull())
        ent = fps.select(
            F.col("id"),
            F.posexplode(F.array(*[F.col(f"b{i}")
                                   for i in range(N_BANDS)])
                         ).alias("band", "value"),
            *[F.col(f"b{i}").alias(f"f{i}") for i in range(N_BANDS)])
        return self._with_pfx(ent)

    def update(self, spark: SparkSession, batch_df: DataFrame,
               batch_id: int | None = None) -> None:
        """Apply one micro-batch (key, warc_ts, seq, op, b0..b3)."""
        key = self.key_col
        band_cols = [f"b{i}" for i in range(N_BANDS)]
        ups = batch_df.filter(F.col("op") == "upsert").select(
            "seq", key, "warc_ts", "op", *band_cols)
        dels = batch_df.filter(F.col("op") == "delete").select(
            "seq", key, "warc_ts", "op")
        merged = ups.unionByName(dels, allowMissingColumns=True)
        res = self.table.merge(spark, merged, batch_id=batch_id)
        head = self.table.io.head_snapshot_id()
        prev_sid = self.table.io.read_snapshot(head).get("parent_id")
        if res is None and head in self.store.versions():
            return  # duplicate delivery, artifacts exist → no-op

        touched_keys = (batch_df.select(F.col(key).alias("id"))
                        .distinct().localCheckpoint(eager=False))
        tk_buckets = sorted({
            r["b"] for r in touched_keys.select(
                self.table.bucket_expr("id").alias("b"))
            .distinct().collect()})
        new_ents = self._ents(
            self.fingerprints(spark, buckets=tk_buckets)
            .withColumnRenamed(key, "id")
            .join(touched_keys, "id", "left_semi")).persist()
        if prev_sid is not None and not self.table.manifest_entries(
                snapshot_id=prev_sid, buckets=tk_buckets):
            prev_sid = None
        tb = new_ents.select("band", "value", "pfx")
        if prev_sid is not None:
            old_ents = self._ents(
                self.fingerprints(spark, snapshot_id=prev_sid,
                                  buckets=tk_buckets)
                .withColumnRenamed(key, "id")
                .join(touched_keys, "id", "left_semi"))
            tb = tb.unionByName(old_ents.select("band", "value", "pfx"))
        tb = tb.distinct().localCheckpoint(eager=False)
        touched_pfx = {r["pfx"] for r in
                       tb.select("pfx").distinct().collect()}

        prev = self.store.read(spark, ROWS_SCHEMA,
                               part_filter=touched_pfx,
                               below_version=head)
        prev_banded = prev.filter(F.col("kind") == "b").select(
            "id", "band", "value", "f0", "f1", "f2", "f3")
        idx_slice = (
            self._with_pfx(
                prev_banded.join(touched_keys, "id", "left_anti"))
            .unionByName(new_ents).persist())
        # tb rows are already distinct and pfx is a pure function of
        # (band, value); ONE explicit repartition feeds both sides of
        # the pair self-join (reused exchange) — guide §2.4
        tbb = tb.select("band", "value")
        n_w = max(1, min(
            self.n_pfx,
            int(spark.conf.get("spark.sql.shuffle.partitions"))))
        ents = (idx_slice.join(tbb, ["band", "value"], "left_semi")
                .repartition(n_w, "band", "value"))
        a = ents.select(F.col("id").alias("id_a"), "band", "value",
                        "pfx",
                        *[F.col(f"f{i}").alias(f"a{i}")
                          for i in range(N_BANDS)])
        b = ents.select(F.col("id").alias("id_b"), "band", "value",
                        *[F.col(f"f{i}").alias(f"bb{i}")
                          for i in range(N_BANDS)])
        ham = None
        for i in range(N_BANDS):
            d = F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"bb{i}")))
            ham = d if ham is None else (ham + d)
        new_pairs = (
            a.join(b, ["band", "value"])
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= self.max_hamming)
            .select("id_a", "id_b", "hamming", "band", "value", "pfx"))
        prev_pairs = prev.filter(F.col("kind") == "p").select(
            "id_a", "id_b", "hamming", "band", "value")
        kept = prev_pairs.join(tbb, ["band", "value"], "left_anti")
        pair_rows = self._with_pfx(kept).unionByName(new_pairs)
        null_s = F.lit(None).cast("string")
        null_i = F.lit(None).cast("int")
        out = (
            idx_slice.select(
                F.lit("b").alias("kind"), "id", null_s.alias("id_a"),
                null_s.alias("id_b"), null_i.alias("hamming"),
                "band", "value", "f0", "f1", "f2", "f3", "pfx")
            .unionByName(pair_rows.select(
                F.lit("p").alias("kind"), null_s.alias("id"),
                "id_a", "id_b", "hamming", "band", "value",
                *[null_i.alias(f"f{i}") for i in range(N_BANDS)],
                "pfx")))
        self.store.write(spark, out, head, touched_pfx, ROWS_SCHEMA)
        idx_slice.unpersist()
        new_ents.unpersist()
        self.store.gc()
