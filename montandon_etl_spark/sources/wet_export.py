"""Incremental WET sidecar export — the Common-Crawl conversion
artifact kept fresh off the CDC lake the same way the trainer shards
are (sources/shard_export.py): the lake's bucket layout IS the WET
shard layout, a commit's manifest diff names exactly the shards whose
membership can have changed, and only those rewrite.

Byte-determinism: each shard's records are url-sorted and every header
derives from row content (sha record ids; ``WARC-Refers-To`` =
sha(uri|date|payload) — the id the original response record carries),
so the incremental product is BYTE-IDENTICAL to a from-scratch export
of the final state (pytest-pinned, like every other derived artifact).

Crash-safety: shard files land first (atomic tmp+replace each),
``export.json`` last (atomic). A crash between them re-runs the same
deterministic rewrite next refresh — convergent. Multi-version
catch-up rides the manifest diff; an expired baseline degrades to a
full rewrite.

100-TB shape: refresh is O(changed buckets); reads are bucket-pruned
at the manifest level and column-projected (url, order-ts, text —
the html payload is NOT read unless it is the refers basis).
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montandon_etl_spark.sources.shard_export import changed_buckets
from montandon_etl_spark.sources.wet import build_wet, response_record_id

STATE_FILE = "export.json"
LAYOUT = 1


class WetExport:
    """Incremental WET export bound to one SnapshotTable."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, STATE_FILE)) as f:
            self.state = json.load(f)
        if self.state.get("layout") != LAYOUT:
            raise ValueError(
                f"wet export at {path} has layout "
                f"{self.state.get('layout')!r}, this build writes {LAYOUT}")

    @classmethod
    def create(cls, path: str, text_col: str = "text",
               payload_col: str | None = None) -> "WetExport":
        """``payload_col``: the column whose BYTES the original
        response record id was computed over (html for pages tables);
        None means the text itself is the payload basis (text-only
        tables)."""
        os.makedirs(path, exist_ok=True)
        state = {"layout": LAYOUT, "last_sid": None,
                 "text_col": text_col, "payload_col": payload_col,
                 "shards": {}}
        cls._write_state(path, state)
        return cls(path)

    @staticmethod
    def _write_state(path: str, state: dict) -> None:
        tmp = os.path.join(path, STATE_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, os.path.join(path, STATE_FILE))

    # -------------------------------------------------------- refresh
    def refresh(self, spark: SparkSession, table,
                snapshot_id: int | None = None) -> list[dict]:
        head = table.snapshot(snapshot_id)
        sid = head["snapshot_id"]
        changed = changed_buckets(table, head, self.state["last_sid"])
        if changed is not None and not changed:
            return []
        props = head["properties"]
        key = props["key_col"]
        ts_col = props["order_cols"][0]
        text_col = self.state["text_col"]
        pay_col = self.state["payload_col"]
        cols = [key, ts_col, text_col] + ([pay_col] if pay_col else [])
        rows = table.read(
            spark, snapshot_id=sid,
            buckets=sorted(changed) if changed is not None else None,
            columns=cols)
        # shard by the TARGET snapshot's own bucket count (≠ HEAD's
        # after a rebucket when pinned to an older snapshot)
        shard = F.pmod(F.xxhash64(F.col(key)),
                       F.lit(int(props["n_buckets"]))).cast("int")
        sel = rows.select(
            shard.alias("shard"),
            F.col(key).alias("_u"), F.col(ts_col).alias("_t"),
            F.col(text_col).alias("_x"),
            (F.col(pay_col) if pay_col
             else F.encode(F.col(text_col), "utf-8")).alias("_p"))
        out_dir = self.path

        def mux(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("_u", kind="mergesort")
            recs = []
            for u, t, x, p in zip(pdf["_u"], pdf["_t"], pdf["_x"],
                                  pdf["_p"]):
                date = pd.Timestamp(t).strftime("%Y-%m-%dT%H:%M:%SZ")
                refers = response_record_id(str(u), date, bytes(p))
                recs.append((str(u), date, refers,
                             "" if x is None else str(x)))
            blob = build_wet(recs)
            shard = int(pdf["shard"].iloc[0])
            final = os.path.join(out_dir, f"wet-{shard:05d}.warc.wet")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, final)
            return pd.DataFrame([{
                "shard": shard, "n_records": len(recs),
                "n_bytes": len(blob),
                "sha256": hashlib.sha256(blob).hexdigest()}])

        man = sel.groupBy("shard").applyInPandas(
            mux, "shard int, n_records bigint, n_bytes bigint,"
                 " sha256 string")
        written = {r["shard"]: r.asDict() for r in man.collect()}
        shards = dict(self.state["shards"])
        for b, m in written.items():
            shards[str(b)] = {k: v for k, v in m.items() if k != "shard"}
        universe = (changed if changed is not None
                    else {int(k) for k in shards} | set(written))
        for b in universe:
            if b in written:
                continue
            f = os.path.join(self.path, f"wet-{b:05d}.warc.wet")
            if os.path.exists(f):
                os.remove(f)
            shards.pop(str(b), None)
        self.state["shards"] = shards
        self.state["last_sid"] = sid
        self._write_state(self.path, self.state)
        return [dict(v, shard=int(k))
                for k, v in sorted(shards.items(), key=lambda kv: int(kv[0]))
                if int(k) in written or changed is None]

    # ----------------------------------------------------------- read
    def read(self, spark: SparkSession) -> DataFrame:
        """Parse every live shard back to one row per conversion
        record (warc_records' mapInPandas over the shard blobs)."""
        from montandon_etl_spark.sources.warc import warc_records

        files = sorted(
            f for f in os.listdir(self.path)
            if f.startswith("wet-") and f.endswith(".warc.wet"))
        if not files:
            return spark.createDataFrame(
                [], "asset_id bigint, uri string, payload binary")
        rows = [(int(f[4:9]), open(os.path.join(self.path, f), "rb").read())
                for f in files]
        blobs = spark.createDataFrame(rows, "shard bigint, wet binary")
        return warc_records(blobs, "shard", "wet")

    # ------------------------------------------------------ streaming
    def updater(self, table):
        """``run_stream(derived_updaters=[...])`` hook — the WET
        sidecar rides the live CDC stream like the index family.
        Idempotent on redelivery (empty manifest diff → no-op)."""
        def upd(spark: SparkSession, batch_df, epoch_id: int) -> None:
            self.refresh(spark, table)
        return upd
