"""Per-file key Bloom data-skipping: opt-in manifest filters that let
point lookups skip un-compacted MOR delta files whose key MIN/MAX
ranges span the whole keyspace (where range stats prune nothing)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.streaming.pipeline import enrich_batch


def _merge_pdf(spark, table, pdf, batch_id=None, **kw):
    sdf = spark.createDataFrame(pdf[["seq", "url", "warc_ts", "op", "html"]])
    return table.merge(spark, enrich_batch(sdf), batch_id=batch_id, **kw)


def _batch(seq0, urls, ts, op="upsert"):
    return pd.DataFrame(
        [(seq0 + i, u, ts, op, b"<p>x</p>") for i, u in enumerate(urls)],
        columns=["seq", "url", "warc_ts", "op", "html"])


def _file_keys(table_path: str, rel: str) -> set:
    tbl = pq.read_table(os.path.join(table_path, rel), columns=["url"])
    return set(tbl["url"].to_pylist())


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_bloom_prunes_interleaved_deltas_no_false_negatives(
        spark, tmp_path, mode):
    """Batches with INTERLEAVED key ranges (min/max stats prune
    nothing) across 3 commits: with key blooms on, every present key's
    pruned manifest (a) keeps every file that truly contains the key —
    exhaustively checked against the files' actual contents — and
    (b) skips at least one file somewhere; reads stay correct."""
    ts = pd.Timestamp("2024-06-01")
    path = str(tmp_path / f"kb_{mode}")
    t = SnapshotTable.create(path, n_buckets=2, write_mode=mode,
                             compact_threshold=100, key_bloom_bits=4096)
    # interleaved ranges: every batch spans a…z so min/max can't prune
    batches = [
        [f"https://{c}.example.org/b0/{i}" for i in range(12)
         for c in ("aaa", "mmm", "zzz")],
        [f"https://{c}.example.org/b1/{i}" for i in range(12)
         for c in ("abc", "mno", "zyx")],
        [f"https://{c}.example.org/b2/{i}" for i in range(12)
         for c in ("azz", "mzz", "zzz")],
    ]
    for bi, urls in enumerate(batches):
        _merge_pdf(spark, t, _batch(1000 * bi, urls, ts), batch_id=bi)

    entries = t.manifest_entries()
    assert entries and all("key_bloom" in m for m in entries)
    truth = {m["path"]: _file_keys(path, m["path"]) for m in entries}

    pruned_somewhere = 0
    probe = [u for b in batches for u in b[::5]]
    for url in probe:
        pl = t.manifest_entries(point_lookup=url)
        kept = {m["path"] for m in pl}
        for rel, keys in truth.items():
            if url in keys:
                assert rel in kept, (url, rel)  # NEVER a false negative
        pruned_somewhere += len(entries) - len(pl)
    assert pruned_somewhere > 0  # the filters actually skip files

    url = batches[1][7]
    got = t.read(spark, point_lookup=url).toPandas()
    assert list(got["url"]) == [url]


def test_bloom_skips_absent_key_entirely(spark, tmp_path):
    """A key that was never written: in its bucket, every stamped file
    should be Bloom-pruned (up to the FP rate — with 36 keys in a
    4096-bit filter the chance any file survives is ~0)."""
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "kb_abs"), n_buckets=1,
                             write_mode="mor", compact_threshold=100,
                             key_bloom_bits=4096)
    _merge_pdf(spark, t, _batch(
        0, [f"https://x.org/{i}" for i in range(36)], ts), batch_id=0)
    pl = t.manifest_entries(point_lookup="https://never.example.org/nope")
    assert pl == []
    got = t.read(spark, point_lookup="https://never.example.org/nope")
    assert got.count() == 0


def test_bloom_sees_tombstones(spark, tmp_path):
    """A delete-tombstone file must stay visible to the point lookup
    (pruning it would resurrect the old version)."""
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "kb_del"), n_buckets=1,
                             write_mode="mor", compact_threshold=100,
                             key_bloom_bits=4096)
    url = "https://del.example.org/a"
    _merge_pdf(spark, t, _batch(0, [url, "https://other.org/b"], ts),
               batch_id=0)
    _merge_pdf(spark, t, _batch(10, [url], ts + pd.Timedelta("1h"),
                                op="delete"), batch_id=1)
    pl = t.manifest_entries(point_lookup=url)
    assert len(pl) == 2  # both the upsert file and the tombstone file
    assert t.read(spark, point_lookup=url).count() == 0


def test_bloom_survives_compaction_and_default_off(spark, tmp_path):
    ts = pd.Timestamp("2024-06-01")
    t = SnapshotTable.create(str(tmp_path / "kb_cmp"), n_buckets=1,
                             write_mode="mor", compact_threshold=100,
                             key_bloom_bits=2048)
    for b in range(3):
        _merge_pdf(spark, t, _batch(
            100 * b, [f"https://c.org/{b}/{i}" for i in range(10)], ts),
            batch_id=b)
    t.compact(spark)
    entries = t.manifest_entries()
    assert all("key_bloom" in m for m in entries)
    url = "https://c.org/1/3"
    got = t.read(spark, point_lookup=url).toPandas()
    assert list(got["url"]) == [url]

    # default table: no blooms stamped, point lookup still correct
    t2 = SnapshotTable.create(str(tmp_path / "kb_off"), n_buckets=1,
                              write_mode="mor", compact_threshold=100)
    _merge_pdf(spark, t2, _batch(0, ["https://p.org/1"], ts), batch_id=0)
    assert all("key_bloom" not in m for m in t2.manifest_entries())
    assert t2.read(spark, point_lookup="https://p.org/1").count() == 1
