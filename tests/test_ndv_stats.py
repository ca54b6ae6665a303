"""Per-file NDV register stats: metadata-merged registers must be
BIT-IDENTICAL to a one-shot sketch of the same files' rows (the
deterministic-HLL contract), and column_ndv must reproduce
hll_estimate's micro-snapped value exactly."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.operators.sketches import hll_estimate, hll_registers
from montandon_etl_spark.streaming.pipeline import enrich_batch

from pyspark.sql import functions as F


def _merge_pdf(spark, table, pdf, batch_id=None, **kw):
    sdf = spark.createDataFrame(pdf[["seq", "url", "warc_ts", "op", "html"]])
    return table.merge(spark, enrich_batch(sdf), batch_id=batch_id, **kw)


def _batch(seq0, urls, ts):
    return pd.DataFrame(
        [(seq0 + i, u, ts, "upsert",
          f"<p>body {seq0 + i}</p>".encode()) for i, u in enumerate(urls)],
        columns=["seq", "url", "warc_ts", "op", "html"])


def _raw_file_rows(spark, t):
    paths = [os.path.join(t.path, e["path"]) for e in t.manifest_entries()]
    return spark.read.parquet(*paths)


def _expected_ndv(spark, t, col, p):
    raw = _raw_file_rows(spark, t).select(F.lit(1).alias("g"), col)
    reg = hll_registers(raw, "g", col, p=p)
    return hll_estimate(reg, "g", p=p).collect()[0]["est_distinct"], reg


def test_column_ndv_equals_one_shot_sketch(spark, tmp_path):
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "ndv"), n_buckets=2,
                             write_mode="mor", compact_threshold=100,
                             ndv_cols=["url", "lang"], ndv_p=8)
    for b in range(3):
        # overlapping url sets across batches: merged registers must
        # dedupe across files exactly like a one-shot sketch would
        urls = [f"https://n.org/{(37 * b + i) % 90}" for i in range(60)]
        _merge_pdf(spark, t, _batch(1000 * b, urls, ts), batch_id=b)

    entries = t.manifest_entries()
    assert all("ndv" in e for e in entries)

    for col in ("url", "lang"):
        want, reg = _expected_ndv(spark, t, col, p=8)
        got = t.column_ndv(col)
        assert got == want, (col, got, want)
        # register-level identity, not just the estimate
        merged: dict[int, int] = {}
        for e in entries:
            for j, mj in e["ndv"]["r"][col]:
                merged[j] = max(merged.get(j, 0), mj)
        one_shot = {r["j"]: r["mj"] for r in reg.collect()}
        assert merged == one_shot, col

    # ballpark sanity: 90 distinct urls at p=8 → within ±20%
    assert 72 <= t.column_ndv("url") <= 108


def test_column_ndv_untracked_and_default_off(spark, tmp_path):
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "ndv2"), n_buckets=1,
                             write_mode="mor", compact_threshold=100,
                             ndv_cols=["url"], ndv_p=8)
    _merge_pdf(spark, t, _batch(0, ["https://a.org/1"], ts), batch_id=0)
    assert t.column_ndv("lang") is None         # untracked column
    t2 = SnapshotTable.create(str(tmp_path / "ndv_off"), n_buckets=1,
                              write_mode="mor", compact_threshold=100)
    _merge_pdf(spark, t2, _batch(0, ["https://a.org/1"], ts), batch_id=0)
    assert all("ndv" not in e for e in t2.manifest_entries())
    assert t2.column_ndv("url") is None


def test_column_ndv_after_compaction_is_state_ndv(spark, tmp_path):
    """MOR deltas carry superseded versions (sketch upper-bounds the
    state); after full compaction the files ARE the state, so the
    metadata estimate equals a sketch of the resolved table."""
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "ndv3"), n_buckets=1,
                             write_mode="mor", compact_threshold=100,
                             ndv_cols=["url"], ndv_p=8)
    urls = [f"https://c.org/{i}" for i in range(40)]
    _merge_pdf(spark, t, _batch(0, urls, ts), batch_id=0)
    _merge_pdf(spark, t, _batch(100, urls, ts + pd.Timedelta("1h")),
               batch_id=1)  # same keys again → superseded versions
    t.compact(spark)
    state = t.read(spark).select(F.lit(1).alias("g"), "url")
    want = hll_estimate(hll_registers(state, "g", "url", p=8),
                        "g", p=8).collect()[0]["est_distinct"]
    assert t.column_ndv("url") == want
