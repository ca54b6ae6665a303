"""End-to-end: derived artifacts (near-dup index, materialized
aggregate) maintained INSIDE the streaming foreachBatch must, after
the stream drains, equal their full recomputes over the live table —
and a checkpoint re-run must be a no-op for table AND derivatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from montandon_etl_spark.lake.matview import (
    DistinctCountView, MaterializedAggregate)
from montandon_etl_spark.operators.sketches import hll_registers
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
    dv = DistinctCountView.create(str(tmp_path / "dv"), spark, table,
                                  group_cols=["lang"], value_col="text",
                                  p=4)

    def update_index(s, df, epoch_id):
        # index over the SAME extracted text the pipeline itself merges
        idx.update(s, df.withColumn("text", extract_text_udf(F.col("html")).text),
                   batch_id=epoch_id)

    updaters = [update_index, lambda s, df, e: mv.refresh(s),
                lambda s, df, e: dv.refresh(s)]
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

    # distinct-count view ≡ hll_registers recompute over the live table
    want_dv = {(r["lang"], r["j"], r["mj"]) for r in
               hll_registers(live, ["lang"], "text", 4).collect()}
    got_dv = {(r["lang"], r["j"], r["mj"]) for r in dv.state(spark).collect()}
    assert got_dv == want_dv and want_dv
    assert dv.applied_snapshot_id() == table.io.head_snapshot_id()

    # checkpoint re-run: everything is exactly-once, nothing moves
    head = table.io.head_snapshot_id()
    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=updaters).awaitTermination(300)
    assert table.io.head_snapshot_id() == head
    assert {(r["id_a"], r["id_b"]) for r in idx.pairs(spark).collect()} == want
    assert {(r["lang"], r["n_rows"]) for r in mv.state(spark).collect()} == want_mv
    assert {(r["lang"], r["j"], r["mj"])
            for r in dv.state(spark).collect()} == want_dv


def test_stream_maintains_bloom_index(spark, tmp_path):
    """Incremental Bloom blocklist (VERDICT r4 Next #7): adds merge
    in-stream via bit_or; the derived filter equals a one-shot
    bloom_build over every value ever upserted; a delete in the
    stream durably marks rebuild-needed; rebuild() over the live set
    matches the from-scratch filter and clears the mark; checkpoint
    re-run is a no-op."""
    from montandon_etl_spark.operators.bloom_index import BloomIndex
    from montandon_etl_spark.operators.sketches import bloom_build

    M, H = 1 << 12, 3
    log = gen_changelog(n_events=300, n_urls=100, seed=11, n_domains=8)
    assert (log.op == "delete").any()  # fixture must exercise deletes
    write_changelog(log, str(tmp_path / "chg"), n_chunks=3)
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    bidx = BloomIndex.create(str(tmp_path / "bloom"), m_bits=M, n_hashes=H)

    def update_bloom(s, df, epoch_id):
        ups = df.filter(F.col("op") == "upsert").select("url").distinct()
        n_dels = df.filter(F.col("op") == "delete").limit(1).count()
        bidx.update(s, ups, "url", epoch_id, has_deletes=n_dels > 0)

    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=[update_bloom]).awaitTermination(300)

    def rows(df):
        return {(r["word_idx"], r["bits"]) for r in df.collect()}

    ever = spark.createDataFrame(
        log[log.op == "upsert"][["url"]].drop_duplicates())
    assert rows(bidx.filter_df(spark)) == rows(
        bloom_build(ever, "url", M, H))
    assert bidx.dirty  # deletes passed through

    # no false negatives against the live set (superset contract)
    from montandon_etl_spark.operators.sketches import (
        bloom_dense,
        bloom_member_col,
    )
    words = bloom_dense(bidx.filter_df(spark), M)
    live = table.read(spark)
    misses = live.filter(~bloom_member_col("url", words, M, H)).count()
    assert misses == 0

    # rebuild over the live set == from-scratch build; dirty cleared
    bidx.rebuild(spark, live.select("url"), "url")
    assert not bidx.dirty
    assert rows(bidx.filter_df(spark)) == rows(
        bloom_build(live.select("url"), "url", M, H))

    # checkpoint re-run: no-op for the filter (dirty stays cleared —
    # no new batches run, the stream is drained)
    before = rows(bidx.filter_df(spark))
    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=[update_bloom]).awaitTermination(300)
    assert rows(bidx.filter_df(spark)) == before
    assert not bidx.dirty


def test_stream_maintains_cluster_and_survivor_indexes(spark, tmp_path):
    """The full incremental dedup pipeline inside foreachBatch:
    near-dup index → cluster index → survivor election all advance
    per epoch; after the stream drains, clusters equal the
    from-scratch recompute and the keep-list equals the batch
    election; checkpoint re-run is a no-op for all three."""
    from montandon_etl_spark.operators.cluster_index import ClusterIndex
    from montandon_etl_spark.operators.dedup import dedup_clusters
    from montandon_etl_spark.operators.survivor_index import SurvivorIndex
    from montandon_etl_spark.operators.textstats import quality_score

    PAR = dict(n=3, k=8, bands=4)
    log = gen_changelog(n_events=400, n_urls=120, seed=7, n_domains=10)
    write_changelog(log, str(tmp_path / "chg"), n_chunks=3)
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    idx = NearDupIndex.create(str(tmp_path / "ndi"), n_pfx=16, **PAR)
    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=8)
    sidx = SurvivorIndex(str(tmp_path / "si"), n_parts=8)

    def quality_of(df):
        return (quality_score(df, "url", "text")
                .select("url", "quality"))

    def update_all(s, df, epoch_id):
        batch = df.withColumn("text",
                              extract_text_udf(F.col("html")).text)
        idx.update(s, batch, batch_id=epoch_id, cluster_index=cidx)
        # quality over the CURRENT live corpus (bounded: the election
        # only reads changed families' members)
        live = table.read(s).select("url", "text")
        sidx.refresh(s, cidx, quality_of(live), id_col="url",
                     q_col="quality")

    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=[update_all]).awaitTermination(300)

    live = table.read(spark)
    corpus = live.select("url", "text")
    pairs = minhash_lsh_pairs(corpus, "url", "text", max_bucket=None,
                              **PAR)
    # clusters ≡ recompute over PAIR-PARTICIPATING nodes (the index's
    # scope; singletons never enter the pair graph)
    nodes = (pairs.select(F.col("id_a").alias("id"))
             .unionByName(pairs.select(F.col("id_b").alias("id")))
             .distinct())
    want_cl = {tuple(r) for r in dedup_clusters(
        nodes, pairs.select("id_a", "id_b"), id_col="id").collect()}
    got_cl = {tuple(r) for r in cidx.clusters(spark).collect()}
    assert got_cl == want_cl and want_cl

    # keep-list ≡ batch election over the final cluster state
    from pyspark.sql import Window
    j = (cidx.clusters(spark).select(F.col("id").alias("url"),
                                     "cluster_id")
         .join(quality_of(corpus), "url"))
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"),
                                                 F.asc("url"))
    cw = Window.partitionBy("cluster_id")
    want_sv = {(r["cluster_id"], r["url"], r["quality"], r["n"])
               for r in (j.withColumn("rn", F.row_number().over(w))
                         .withColumn("n", F.count(F.lit(1)).over(cw)
                                     .cast("bigint"))
                         .filter(F.col("rn") == 1)).collect()}
    got_sv = {tuple(r) for r in sidx.survivors(spark).collect()}
    assert got_sv == want_sv and want_sv

    # checkpoint re-run: exactly-once across all three artifacts
    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=[update_all]).awaitTermination(300)
    assert {tuple(r) for r in cidx.clusters(spark).collect()} == want_cl
    assert {tuple(r) for r in sidx.survivors(spark).collect()} == want_sv


def test_stream_maintains_text_index(spark, tmp_path):
    """BM25 inverted index maintained INSIDE the streaming
    foreachBatch (multi-event batches: several upserts of one url in
    an epoch, deletes, re-inserts): after the stream drains, query()
    must equal the one-shot bm25_topk over the live table's extracted
    text, and a checkpoint re-run must move nothing."""
    from montandon_etl_spark.operators.text_index import TextIndex, bm25_topk

    log = gen_changelog(n_events=400, n_urls=120, seed=7, n_domains=10)
    write_changelog(log, str(tmp_path / "chg"), n_chunks=3)
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    tix = TextIndex.create(str(tmp_path / "tix"), key_col="url",
                           key_type="string", n_parts=8, n_buckets=4)

    def update_tix(s, df, epoch_id):
        tix.update(
            s, df.withColumn("text", extract_text_udf(F.col("html")).text),
            batch_id=epoch_id)

    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=[update_tix]).awaitTermination(300)

    live = table.read(spark)
    queries = spark.createDataFrame(
        [(0, "spark merge batch window"), (1, "the and a of")],
        "query_id bigint, qtext string")
    want = sorted(tuple(r) for r in bm25_topk(
        live, queries, id_col="url", k=10).collect())
    got = sorted(tuple(r) for r in tix.query(spark, queries, k=10).collect())
    assert got == want
    assert want  # the fixture text must actually hit the query terms
    n, sumdl = tix.stats()
    assert n == live.count()

    head = table.io.head_snapshot_id()
    run_stream(spark, table, str(tmp_path / "chg"), str(tmp_path / "ckpt"),
               derived_updaters=[update_tix]).awaitTermination(300)
    assert table.io.head_snapshot_id() == head
    assert sorted(tuple(r) for r in
                  tix.query(spark, queries, k=10).collect()) == want
