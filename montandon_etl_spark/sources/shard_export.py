"""Incremental trainer-shard export — the CDC lake's bucket layout
doubled as the trainer's shard layout.

A ``SnapshotTable`` already partitions rows by ``pmod(xxhash64(key),
n_buckets)`` and its per-commit manifests say exactly which buckets a
commit rewrote (untouched buckets carry BY REFERENCE — same manifest
file path). ``ShardExport.refresh`` therefore:

1. diffs ``manifest_files`` between the last exported snapshot and
   HEAD — the changed buckets are the ONLY shards whose membership
   can have changed;
2. reads just those buckets (partition-pruned, column-projected to
   the key + the tokenizer's input), resolves LWW as any read does;
3. rewrites those shards' ``.bin``/``.idx`` files (sources/tokbin.py)
   and deletes shards whose bucket emptied.

Because shard files are a deterministic function of bucket content
(seq_id = hash60(key) ascending, fixed headers), the incremental
product is BYTE-IDENTICAL to a from-scratch export of the final
state — the same invariant the index family (neardup/ann/survivors/
text) maintains, now extended to the very last hop of the pipeline.

Crash-safety: shard files land first (each atomic via tmp+replace),
``export.json`` last (atomic). A crash between them re-runs the same
deterministic rewrite on the next refresh — convergent, no torn
state. Multi-version catch-up is free: the diff is against whatever
``last_sid`` the state file holds; if that snapshot has expired, the
export degrades to a full rewrite (correct, just not incremental).

100-TB shape: refresh cost is O(changed buckets), not O(corpus) —
the property that makes continuous "corpus → trainer shards" feasible
at all. Reads are bucket-pruned at the manifest level (no file even
opens for untouched shards) and column-projected so the scan never
deserializes payloads the tokenizer doesn't use.

Reference lineage: the reference's transform targets ledger upserts
(apps/etl/...); a training pipeline's terminal sink is the trainer's
mmap shards, kept fresh the same incremental way.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.sources import tokbin

STATE_FILE = "export.json"
LAYOUT = 1


def changed_buckets(table, head: dict, last_sid) -> set[int] | None:
    """Buckets whose manifest file moved between ``last_sid`` and
    ``head`` — the ONLY shards an incremental export can need to
    rewrite. None means "everything" (first export, or the baseline
    snapshot expired past retention). Shared by every bucket-aligned
    exporter (tokbin shards here, WET sidecars in wet_export.py)."""
    if last_sid is None:
        return None
    if last_sid == head["snapshot_id"]:
        return set()
    try:
        old = table.io.read_snapshot(last_sid)
    except FileNotFoundError:
        return None  # expired past the retention window
    a = old.get("manifest_files", {})
    b = head.get("manifest_files", {})
    return {int(k) for k in set(a) | set(b) if a.get(k) != b.get(k)}


def default_token_sql(text_col: str = "text", vocab: int = 50000) -> str:
    """The md5-word tokenizer used by the oracle-replayable queries."""
    return (f"transform(split(trim(coalesce({text_col}, '')), '\\\\s+'),"
            f" w -> CAST(conv(substring(md5(w), 1, 15), 16, 10)"
            f" AS BIGINT) % {vocab})")


class ShardExport:
    """Incremental token-shard export bound to one SnapshotTable."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, STATE_FILE)) as f:
            self.state = json.load(f)
        if self.state.get("layout") != LAYOUT:
            raise ValueError(
                f"shard export at {path} has layout "
                f"{self.state.get('layout')!r}, this build writes {LAYOUT}")

    # ---------------------------------------------------------- setup
    @classmethod
    def create(cls, path: str, vocab_size: int,
               token_sql: str | None = None,
               input_cols: tuple[str, ...] = ("text",)) -> "ShardExport":
        os.makedirs(path, exist_ok=True)
        state = {
            "layout": LAYOUT,
            "vocab_size": vocab_size,
            "token_sql": token_sql or default_token_sql(vocab=vocab_size),
            "input_cols": list(input_cols),
            "last_sid": None,
            "shards": {},
        }
        cls._write_state(path, state)
        return cls(path)

    @staticmethod
    def _write_state(path: str, state: dict) -> None:
        tmp = os.path.join(path, STATE_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(path, STATE_FILE))

    # -------------------------------------------------------- refresh
    def _changed_buckets(self, table, head: dict) -> set[int] | None:
        return changed_buckets(table, head, self.state["last_sid"])

    def refresh(self, spark: SparkSession, table,
                snapshot_id: int | None = None) -> list[dict]:
        """Bring the export up to the table's HEAD (or a pinned
        snapshot); returns the manifest rows of rewritten shards."""
        head = table.snapshot(snapshot_id)
        sid = head["snapshot_id"]
        changed = self._changed_buckets(table, head)
        if changed is not None and not changed:
            return []
        props = head["properties"]
        key = props["key_col"]
        rows = table.read(
            spark, snapshot_id=sid,
            buckets=sorted(changed) if changed is not None else None,
            columns=[key, *self.state["input_cols"]])
        from montandon_etl_spark.operators.dedup import hash60

        # shard by the TARGET snapshot's own bucket count (≠ HEAD's
        # after a rebucket when pinned to an older snapshot)
        shard = F.pmod(F.xxhash64(F.col(key)),
                       F.lit(int(props["n_buckets"]))).cast("int")
        sel = rows.select(
            shard.alias("shard"),
            hash60(F.col(key)).alias("sid"),
            F.expr(self.state["token_sql"]).alias("toks"))
        man = tokbin.to_token_shards(
            sel, self.path, id_col="sid", tokens_col="toks",
            vocab_size=self.state["vocab_size"], shard_col="shard")
        written = {r["shard"]: r.asDict() for r in man.collect()}
        shards = dict(self.state["shards"])
        for b, m in written.items():
            shards[str(b)] = {k: v for k, v in m.items() if k != "shard"}
        # changed buckets that came back empty: the shard is gone
        universe = (changed if changed is not None
                    else {int(k) for k in shards} | set(written))
        for b in universe:
            if b in written:
                continue
            prefix = os.path.join(self.path, f"shard-{b:05d}")
            for ext in (".bin", ".idx"):
                if os.path.exists(prefix + ext):
                    os.remove(prefix + ext)
            shards.pop(str(b), None)
        self.state["shards"] = shards
        self.state["last_sid"] = sid
        self._write_state(self.path, self.state)
        out = []
        for k, v in sorted(shards.items(), key=lambda kv: int(kv[0])):
            b = int(k)
            if b in written or changed is None:
                out.append(dict(v, shard=b))
        return out

    # ----------------------------------------------------------- read
    def read(self, spark: SparkSession) -> DataFrame:
        return tokbin.read_token_shards(spark, self.path)

    # ------------------------------------------------------ streaming
    def updater(self, table):
        """A ``run_stream(derived_updaters=[...])`` hook: refresh the
        export after every micro-batch commit, so the trainer shards
        ride the live CDC stream like the other derived artifacts
        (NearDupIndex, TextIndex, MaterializedAggregate). Idempotent
        on redelivery: a re-run epoch commits no new snapshot, the
        manifest diff is empty, and refresh is a no-op."""
        def upd(spark: SparkSession, batch_df, epoch_id: int) -> None:
            self.refresh(spark, table)
        return upd
