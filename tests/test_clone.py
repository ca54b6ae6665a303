"""Portable snapshot export/import: byte-identical clone reads,
historical-snapshot export, independent divergence after import,
schema-evolution fidelity, torn-export rejection."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.lake.clone import export_snapshot, import_snapshot
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.sources.changelog import gen_changelog, write_changelog
from montandon_etl_spark.streaming.pipeline import (
    CHANGELOG_SPARK_SCHEMA,
    merge_microbatch,
    run_stream,
)


def _read_sorted(spark, table, **kw):
    df = table.read(spark, **kw).toPandas()
    return df.sort_values("url").reset_index(drop=True)


def _assert_same(a, b):
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        assert all(x == y or (x != x and y != y)
                   for x, y in zip(a[c], b[c])), c


@pytest.fixture()
def source_table(spark, tmp_path):
    log = gen_changelog(n_events=700, n_urls=160, seed=13, n_domains=12)
    write_changelog(log, str(tmp_path / "chg"), n_chunks=3)
    t = SnapshotTable.create(str(tmp_path / "src"), n_buckets=4)
    run_stream(spark, t, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               max_files_per_trigger=1).awaitTermination(300)
    return t


def test_clone_head_reads_byte_identical(spark, tmp_path, source_table):
    export_snapshot(source_table, str(tmp_path / "exp"))
    clone = import_snapshot(str(tmp_path / "exp"), str(tmp_path / "dst"))
    _assert_same(_read_sorted(spark, source_table),
                 _read_sorted(spark, clone))


def test_clone_of_tagged_old_snapshot(spark, tmp_path, source_table):
    hist = source_table.history()
    old = hist[1]["snapshot_id"]  # first merge commit
    source_table.tag("audited", old)
    export_snapshot(source_table, str(tmp_path / "exp"),
                    snapshot_id="audited")
    clone = import_snapshot(str(tmp_path / "exp"), str(tmp_path / "dst"))
    _assert_same(_read_sorted(spark, source_table, snapshot_id=old),
                 _read_sorted(spark, clone))


def test_clone_diverges_independently(spark, tmp_path, source_table):
    export_snapshot(source_table, str(tmp_path / "exp"))
    clone = import_snapshot(str(tmp_path / "exp"), str(tmp_path / "dst"))
    before_src = _read_sorted(spark, source_table)
    extra = gen_changelog(n_events=120, n_urls=40, seed=99, n_domains=6)
    write_changelog(extra, str(tmp_path / "chg2"), n_chunks=1)
    batch = (
        spark.read.schema(CHANGELOG_SPARK_SCHEMA)
        .parquet(str(tmp_path / "chg2"))
        .filter(F.col("op") == "upsert")
        # land strictly after every source event so each upsert wins
        # LWW even against existing tombstones
        .withColumn("warc_ts", F.col("warc_ts")
                    + F.expr("INTERVAL 3650 DAYS")))
    merge_microbatch(spark, clone, batch, batch_id=0)
    after_clone = _read_sorted(spark, clone)
    # source untouched; clone advanced with every upserted url live
    _assert_same(_read_sorted(spark, source_table), before_src)
    assert clone.io.head_snapshot_id() >= 2
    assert set(extra[extra.op == "upsert"].url) <= set(after_clone["url"])


def test_clone_preserves_schema_evolution(spark, tmp_path, source_table):
    source_table.apply_ddl("rename_column", "lang", new_name="language")
    extra = gen_changelog(n_events=100, n_urls=30, seed=5, n_domains=5)
    write_changelog(extra, str(tmp_path / "chg3"), n_chunks=1)
    batch = spark.read.schema(CHANGELOG_SPARK_SCHEMA).parquet(
        str(tmp_path / "chg3"))
    merge_microbatch(spark, source_table, batch, batch_id=77)
    export_snapshot(source_table, str(tmp_path / "exp"))
    clone = import_snapshot(str(tmp_path / "exp"), str(tmp_path / "dst"))
    a, b = _read_sorted(spark, source_table), _read_sorted(spark, clone)
    assert "language" in a.columns  # renamed everywhere, old files too
    _assert_same(a, b)


def test_torn_export_rejected(tmp_path, source_table):
    export_snapshot(source_table, str(tmp_path / "exp"))
    os.remove(str(tmp_path / "exp" / "clone.json"))
    with pytest.raises(FileNotFoundError, match="clone.json"):
        import_snapshot(str(tmp_path / "exp"), str(tmp_path / "dst"))
