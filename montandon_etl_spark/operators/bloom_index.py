"""Incrementally-maintained Bloom filter — the decontamination
blocklist as a CDC-maintained derived artifact (VERDICT r4 Next #7).

``sketches.bloom_build`` computes a (word_idx, bits) filter in one
shot; a pipeline that streams its benchmark/blocklist corpus wants
the filter kept current per micro-batch instead. Bloom filters are
bit_or-MERGEABLE, so an insert batch is trivial: build the batch's
partial filter (bounded by the batch, map-side combinable) and OR it
into the stored words. Deletes are NOT invertible — a plain Bloom
filter cannot clear bits — so a batch containing deletes marks the
index REBUILD-NEEDED (a durable dirty stamp); the filter stays a
correct superset (its contract — no false negatives against
everything ever added — still holds, at a drifting false-positive
rate) until ``rebuild()`` recomputes it from the live set and clears
the stamp. This add-merge/rebuild-on-delete split is exactly how
production blocklist filters are operated.

Storage: a ``lake/pstore.VersionedPartitionStore`` keyed by the epoch
id, word rows partitioned by ``word_idx % n_parts``. The filter's
total size is bounded by CONFIG (m_bits/60 bigint rows — a few MB at
production m_bits), never by data, so each version rewrites the whole
filter; versioning buys the same exactly-once/idempotent-redelivery
contract as the other incremental indexes (duplicate epoch → no-op,
torn write → uncommitted and retried).

Reference lineage: the reference re-derives its blocklists per run
(apps/etl/transform filters); at 10^10 docs the blocklist filter is
stream-maintained state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.lake.pstore import VersionedPartitionStore
from montandon_etl_spark.operators.sketches import bloom_build

_SCHEMA = "word_idx bigint, bits bigint, wp int"


class BloomIndex:
    """CDC-maintained Bloom filter over a value column. See module
    docstring."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "bloom.json")) as f:
            cfg = json.load(f)
        self.m_bits: int = cfg["m_bits"]
        self.n_hashes: int = cfg["n_hashes"]
        self.n_parts: int = cfg["n_parts"]
        self.store = VersionedPartitionStore(
            os.path.join(path, "words"), "wp", self.n_parts)

    @classmethod
    def create(cls, path: str, m_bits: int = 1 << 18, n_hashes: int = 4,
               n_parts: int = 4) -> "BloomIndex":
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "bloom.json"), "w") as f:
            json.dump({"m_bits": m_bits, "n_hashes": n_hashes,
                       "n_parts": n_parts}, f)
        return cls(path)

    # ----------------------------------------------------------------- state
    def filter_df(self, spark: SparkSession) -> DataFrame:
        """Current (word_idx, bits) rows — the shape ``bloom_probe`` /
        ``bloom_dense`` consume."""
        return self.store.read(spark, _SCHEMA).select("word_idx", "bits")

    @property
    def dirty(self) -> bool:
        """True when a delete passed through since the last rebuild:
        the filter is a correct superset but its FP rate has drifted."""
        return os.path.exists(os.path.join(self.path, "dirty.json"))

    def _mark_dirty(self, version: int) -> None:
        tmp = os.path.join(self.path, "dirty.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"since_version": version}, f)
        os.replace(tmp, os.path.join(self.path, "dirty.json"))

    # ---------------------------------------------------------------- update
    def update(self, spark: SparkSession, values: DataFrame,
               value_col: str, epoch_id: int,
               has_deletes: bool = False) -> None:
        """Merge one micro-batch's ADDED values into the filter
        (partial build → bit_or with the stored words — the mergeable
        path); ``has_deletes=True`` durably marks the index
        rebuild-needed FIRST (crash-safe order: a torn update can
        only leave an extra dirty stamp, never a missed one).
        Duplicate epoch delivery is a no-op once its version is
        committed."""
        version = epoch_id + 1  # pstore versions start at 1
        if has_deletes and not self.dirty:
            self._mark_dirty(version)
        if version in self.store.versions():
            return
        part = bloom_build(values, value_col, self.m_bits, self.n_hashes)
        merged = (
            self.filter_df(spark).unionByName(part)
            .groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
            .withColumn("wp", F.pmod(F.col("word_idx"),
                                     F.lit(self.n_parts)).cast("int"))
        )
        self.store.write(spark, merged, version, set(range(self.n_parts)),
                         _SCHEMA)
        self.store.gc()

    def rebuild(self, spark: SparkSession, values: DataFrame,
                value_col: str) -> None:
        """Recompute the filter from the full live value set and clear
        the dirty stamp (after the committed write, so a crash between
        the two re-runs the rebuild rather than losing it). Takes the
        next free version — content is a pure function of the live
        set, so a repeated rebuild is idempotent in effect."""
        vs = self.store.versions()
        version = (vs[-1] + 1) if vs else 1
        full = bloom_build(values, value_col, self.m_bits,
                           self.n_hashes).withColumn(
            "wp", F.pmod(F.col("word_idx"),
                         F.lit(self.n_parts)).cast("int"))
        self.store.write(spark, full, version,
                         set(range(self.n_parts)), _SCHEMA)
        self.store.gc()
        try:
            os.remove(os.path.join(self.path, "dirty.json"))
        except FileNotFoundError:
            pass
