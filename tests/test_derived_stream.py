"""End-to-end: derived artifacts (near-dup index, materialized
aggregate) maintained INSIDE the streaming foreachBatch must, after
the stream drains, equal their full recomputes over the live table —
and a checkpoint re-run must be a no-op for table AND derivatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from montandon_etl_spark.lake.matview import MaterializedAggregate
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.functions.extract import extract_text_udf
from montandon_etl_spark.operators.dedup import minhash_lsh_pairs
from montandon_etl_spark.operators.neardup_index import NearDupIndex
from montandon_etl_spark.sources.changelog import gen_changelog, write_changelog
from montandon_etl_spark.streaming.pipeline import run_stream

PARAMS = dict(n=3, k=8, bands=4)


def test_stream_maintains_derived_artifacts(spark, tmp_path):
    log = gen_changelog(n_events=400, n_urls=120, seed=7, n_domains=10)
    write_changelog(log, str(tmp_path / "chg"), n_chunks=3)
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    idx = NearDupIndex.create(str(tmp_path / "ndi"), n_pfx=16, **PARAMS)
    mv = MaterializedAggregate.create(str(tmp_path / "mv"), spark, table,
                                      group_cols=["lang"], sum_cols=[])

    def update_index(s, df, epoch_id):
        # index over the SAME extracted text the pipeline itself merges
        idx.update(s, df.withColumn("text", extract_text_udf(F.col("html")).text),
                   batch_id=epoch_id)

    updaters = [update_index, lambda s, df, e: mv.refresh(s)]
    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=updaters).awaitTermination(300)

    live = table.read(spark)
    assert live.count() > 0

    # near-dup index ≡ full LSH recompute over the live corpus
    corpus = live.select("url", "text")  # the merged extractor output
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(corpus, "url", "text",
                                   max_bucket=None, **PARAMS).collect()
    }
    got = {(r["id_a"], r["id_b"]) for r in idx.pairs(spark).collect()}
    assert got == want
    assert want  # the fixture must actually produce near-dups

    # materialized aggregate ≡ full groupBy recompute
    want_mv = {(r["lang"], r["n"]) for r in
               live.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    got_mv = {(r["lang"], r["n_rows"]) for r in mv.state(spark).collect()}
    assert got_mv == want_mv
    assert mv.applied_snapshot_id() == table.io.head_snapshot_id()

    # checkpoint re-run: everything is exactly-once, nothing moves
    head = table.io.head_snapshot_id()
    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=updaters).awaitTermination(300)
    assert table.io.head_snapshot_id() == head
    assert {(r["id_a"], r["id_b"]) for r in idx.pairs(spark).collect()} == want
    assert {(r["lang"], r["n_rows"]) for r in mv.state(spark).collect()} == want_mv
