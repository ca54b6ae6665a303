"""Plan audits: the properties that make queries survive a 100x
scale-up, asserted mechanically on the physical plans of every driver
query (not just eyeballed once).

- no CartesianProduct anywhere (a broadcast nested-loop against a
  1-row scalar aggregate is fine and expected; an unbounded cartesian
  is never fine);
- column pruning reaches the parquet scan for scan-shaped operators
  (reading all columns for a 2-column projection is wrong);
- partial aggregation (map-side combine) is planned for the LWW reduce.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

# dedup_clusters executes eagerly while building (iterative loop with
# convergence counts) — audited separately in its unit tests
_EAGER = {"dedup_clusters", "dedup_survivors"}

QUERY_NAMES = sorted(n for n in entry_mod.queries() if n not in _EAGER)


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_cartesian_product(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_scan_column_pruning(spark):
    """Scan-shaped text operators must read ONLY the columns they use —
    at 100 TB the difference between scanning (doc_id, text) and
    scanning every column is the whole job."""
    for name in ["token_stats", "quality_score", "repetition_stats",
                 "doc_fingerprint", "lang_id"]:
        df = entry_mod.queries()[name](spark, SF_DIR)
        plan = _physical_plan(df)
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read, f"{name}: no parquet ReadSchema found"
        schema_line = read[0]
        assert "doc_id" in schema_line and "text" in schema_line
        assert "source" not in schema_line, (
            f"{name} scans unused column 'source': {schema_line}"
        )


def test_lww_has_partial_aggregation(spark):
    """The LWW reduce must plan map-side partial max_by (two
    HashAggregate/SortAggregate levels around one exchange) — hot urls
    pre-reduce before the shuffle."""
    df = entry_mod.queries()["cdc_lww_latest_state"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert plan.count("Aggregate") >= 2 and "Exchange" in plan
    assert "partial_max_by" in plan or "partial_" in plan.lower()


def test_filter_pushdown_reaches_scan(spark):
    """A selective filter on a scanned column must appear as a parquet
    PushedFilters entry, not a post-scan Filter only."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    df = ev.filter(F.col("event_type") == "purchase").select("event_id", "value")
    plan = _physical_plan(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in plan \
        or "EqualTo(event_type,purchase)" in plan, plan[:2000]


def test_neardup_index_update_plan(spark, tmp_path):
    """The incremental index's per-batch pair join must be a hash join
    on (band, bucket) — never a cartesian — and the signature-table
    read that feeds it must scan only the key + signature columns."""
    import pandas as pd
    from pyspark.sql import functions as F

    from montandon_etl_spark.operators.neardup_index import NearDupIndex
    from montandon_etl_spark.operators.dedup import _banded

    idx = NearDupIndex.create(str(tmp_path / "ndi"), n=2, k=8, bands=4)
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    batch = spark.createDataFrame(
        [(1, "u/a", ts, "upsert", "alpha beta gamma"),
         (2, "u/b", ts, "upsert", "alpha beta delta")],
        "seq bigint, url string, warc_ts timestamp, op string, text string",
    )
    idx.update(spark, batch, batch_id=0)

    # rebuild the pair-join plan exactly as update() shapes it
    index_sigs = idx.signatures(spark).withColumnRenamed("url", "id")
    touched = batch.select(F.col("url").alias("id")).distinct()
    bb = _banded(index_sigs.join(touched, "id", "left_semi"), 8, 4) \
        .withColumnRenamed("id", "bid")
    ib = _banded(index_sigs, 8, 4)
    joined = bb.join(ib, ["band", "bucket"]).filter(F.col("bid") != F.col("id"))
    plan = _physical_plan(joined)
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # equi-join on the bucket key


def test_star_cc_rounds_are_joins_not_cartesians(spark):
    """One large-star + small-star round over an edge list must plan as
    aggregations + equi-joins (groupBy u, join on u) — the primitives
    that scale; no cartesian, no driver-side loop inside a round."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "u bigint, v bigint"
    )
    mins = e.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    out = (e.filter(F.col("v") > F.col("u")).join(mins, "u")
           .select(F.col("v").alias("u"), F.col("m").alias("v")))
    plan = _physical_plan(out)
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_ngram_lm_model_broadcasts_no_ngram_shuffle(spark):
    """The trigram model must reach the scoring pass as two broadcast
    joins — a sort-merge join here would shuffle the exploded n-grams
    (corpus x len rows) instead of the charset^3-bounded model."""
    df = entry_mod.queries()["ngram_lm_score"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan  # both model joins
    assert "SortMergeJoin" not in plan


def test_kmv_bottom_k_is_window_group_limit(spark):
    """The per-group bottom-k must plan as WindowGroupLimit (top-k
    pushed into the shuffle) — a full per-group sort materializes
    every distinct hash instead of k of them."""
    df = entry_mod.queries()["kmv_distinct_users"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_index_side_table_reads_are_bucket_pruned(spark, tmp_path):
    """Per-batch signature/assignment reads in the incremental indexes
    must pass a bucket filter derived from the batch's touched keys —
    O(touched buckets) files scanned, never the full side table
    (VERDICT r3 Next #1). Asserted two ways: every SnapshotTable.read
    during update() carries buckets=, and the pruned manifest is a
    strict subset of the full one."""
    import pandas as pd
    from pyspark.sql import functions as F

    from montandon_etl_spark.lake.table import SnapshotTable
    from montandon_etl_spark.operators.neardup_index import NearDupIndex

    idx = NearDupIndex.create(str(tmp_path / "ndi"), n=2, k=8, bands=4,
                              n_buckets=8, n_pfx=8)
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    seed = [(i, f"u/{i}", ts, "upsert", f"alpha beta doc {i} {i*7}")
            for i in range(32)]  # spread over all 8 buckets
    idx.update(spark, spark.createDataFrame(
        seed, "seq bigint, url string, warc_ts timestamp, op string, text string"),
        batch_id=0)

    calls: list[tuple] = []
    orig = SnapshotTable.read

    def spy(self, spark_, snapshot_id=None, include_tombstones=False,
            buckets=None, resolve=True, point_lookup=None):
        calls.append((tuple(sorted(buckets)) if buckets is not None else None,))
        return orig(self, spark_, snapshot_id=snapshot_id,
                    include_tombstones=include_tombstones, buckets=buckets,
                    resolve=resolve, point_lookup=point_lookup)

    one = [(100, "u/3", pd.Timestamp("2024-01-02").to_pydatetime(),
            "upsert", "alpha beta doc 3 changed")]
    SnapshotTable.read = spy
    try:
        idx.update(spark, spark.createDataFrame(
            one, "seq bigint, url string, warc_ts timestamp, op string, text string"),
            batch_id=1)
    finally:
        SnapshotTable.read = orig

    # the merge itself reads affected buckets internally (already
    # pruned); the two signature reads update() issues must BOTH be
    # pruned to exactly the one touched key's bucket
    want_bucket = idx.table.bucket_expr("url")
    b = spark.createDataFrame([("u/3",)], "url string").select(
        want_bucket.alias("b")).collect()[0]["b"]
    sig_reads = [c[0] for c in calls if c[0] is not None]
    assert sig_reads, f"no bucket-pruned reads recorded: {calls}"
    assert all(bs == (b,) for bs in sig_reads), (calls, b)
    assert not any(c[0] is None for c in calls), \
        f"unpruned full-table read during update: {calls}"

    # pruned manifest is a strict subset of the full manifest
    full = idx.table.manifest_entries()
    pruned = idx.table.manifest_entries(buckets=[b])
    assert 0 < len(pruned) < len(full), (len(pruned), len(full))


def test_bloom_decontamination_is_join_free(spark):
    """The Bloom filter must compile into the corpus scan as an array
    literal: membership = element_at + mask tests inside codegen — the
    plan may contain NO join of any kind and no exchange beyond the
    per-doc count plus (r6) the optional round-robin scan fan-out for
    unsplittable single-row-group inputs (`_tp`, guide §2.5)."""
    df = entry_mod.queries()["bloom_decontamination"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "Join" not in plan, plan[:1500]
    # formatted mode prints each Exchange twice (tree + details) but
    # its RoundRobinPartitioning argument once
    non_fanout = (plan.count("Exchange")
                  - 2 * plan.count("RoundRobinPartitioning"))
    assert non_fanout <= 2, plan[:1500]  # agg partial+final


def test_pps_sample_no_global_sort(spark):
    """The PPS cumulative sum must be the two-phase bucketed shape:
    the window is PARTITIONED by hash-range bucket, so the plan
    contains no single-partition exchange (the r4 scale-killer was a
    global Window.orderBy funneling every row through one task)."""
    df = entry_mod.queries()["pps_sample"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "SinglePartition" not in plan, plan[:1500]
    assert "Window" in plan, plan[:1500]


def test_image_near_dup_is_band_equi_join(spark):
    """The dHash pair join must block on band equality — an equi-join
    (SortMerge/Hash), never a cartesian/BroadcastNestedLoop product of
    the corpus with itself."""
    df = entry_mod.queries()["image_near_dup"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_semantic_dedup_is_cell_equi_join(spark):
    """SemDeDup's pair comparison must be the k-means-cell equi-join
    (sum-of-cell-squared work), not an all-pairs product."""
    df = entry_mod.queries()["semantic_dedup"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]


def test_range_join_is_bucketed_equi_join(spark):
    """bucketed_range_join must plan as a bucket-key equi-join — the
    whole point vs the BroadcastNestedLoopJoin a raw range predicate
    produces."""
    df = entry_mod.queries()["range_join_windows"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan, plan[:1500]
    assert "Join" in plan


def test_mixture_resample_is_broadcast_join(spark):
    """The weights join must broadcast (a handful of strata) — the
    documents must never shuffle for a mixing pass; the only wide op
    allowed is the broadcast exchange of the weights table."""
    df = entry_mod.queries()["mixture_resample"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan, plan[:1500]
    assert "ShuffledHashJoin" not in plan, plan[:1500]
    # no doc-side shuffle: every Exchange in the plan is the broadcast
    import re

    widths = re.findall(r"Exchange (\w+)", plan)
    assert all(w.startswith("SinglePartition") is False for w in widths)
    assert "Exchange hashpartitioning" not in plan, plan[:1500]


def test_sequence_pack_single_shard_exchange(spark):
    """Packing is one shuffle on the shard key feeding the
    metadata-only applyInPandas — no second exchange, no global sort."""
    import re

    df = entry_mod.queries()["sequence_pack"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]
    assert "SinglePartition" not in plan, plan[:1500]
    assert "FlatMapGroupsInPandas" in plan, plan[:1500]


def test_zorder_pruned_scan_is_manifest_level(spark):
    """Range pruning happens at the manifest (file list) before Spark
    ever sees a path — the remaining plan is the plain LWW read plus
    scan-adjacent filters; no join, no cartesian."""
    df = entry_mod.queries()["zorder_pruned_scan"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "Join" not in plan, plan[:1500]


def test_bm25_topk_plan(spark):
    """The corpus never sort-merge-shuffles against anything: the
    query-vocabulary semi-join, the df table, and the query fan-out
    are all broadcasts; the top-k window is a group-limit, not a
    global sort."""
    import re

    df = entry_mod.queries()["bm25_topk"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "SortMergeJoin" not in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "WindowGroupLimit" in plan, plan[:1500]
    # ONE corpus pass: df comes from a term window over the candidate
    # set, never a broadcast re-aggregation that re-scans the corpus
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:2000]


def test_curation_gate_single_exchange(spark):
    """The whole curation funnel is one scan + ONE shuffle (the
    content-hash window for canonical election) — no joins, no
    per-stage materializations."""
    import re

    df = entry_mod.queries()["curation_gate"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "Join" not in plan, plan[:1500]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]


def test_hll_two_phase_aggregation(spark):
    """HLL reduces to the (group, register) grain with a map-side
    partial max, then an O(groups) aggregate — two exchanges max, no
    join, no window."""
    import re

    df = entry_mod.queries()["hll_distinct_users"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "Join" not in plan, plan[:1500]
    assert "partial_max" in plan or "HashAggregate" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan[:2000]


def test_shuffle_shards_single_exchange(spark):
    """One hash-shuffle to the shard grain; the per-shard rank window
    rides the same partitioning — no global sort, no SinglePartition."""
    import re

    df = entry_mod.queries()["shuffle_shards"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "SinglePartition" not in plan, plan[:1500]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]


def test_corpus_report_one_scan_one_exchange(spark):
    """The CUBE expands grouping sets INSIDE one aggregation: one
    parquet scan, an Expand node, and a single hash exchange between
    partial and final aggregates — not four scans for four
    granularities."""
    import re

    df = entry_mod.queries()["corpus_report"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "Join" not in plan, plan[:1500]
    assert "Expand" in plan, plan[:1500]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan[:1500]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]


def test_dsir_is_broadcast_scored_takeordered(spark):
    """DSIR: the log-ratio table (bounded by B buckets) must BROADCAST
    into the scoring join — the corpus never shuffles for scoring —
    and top-k selection must plan TakeOrderedAndProject (per-partition
    heaps), never a global Sort."""
    df = entry_mod.queries()["dsir_select"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan, "corpus-sized shuffle join crept in"


def test_semantic_contamination_probe_broadcasts(spark):
    """The benchmark probe join must broadcast (eval sets are small by
    nature); the only SortMergeJoins allowed are the id-keyed result
    joins (big-big on the corpus key — the correct plan); never a
    cartesian."""
    df = entry_mod.queries()["semantic_contamination"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the pair comparison itself is the broadcast join on 'cell' —
    # assert no SMJ consumes the benchmark side
    import re
    smj_keys = re.findall(r"SortMergeJoin \[([a-z_]+)", plan)
    assert all(k == "id" for k in smj_keys), smj_keys


def test_wordpiece_word_table_broadcasts(spark):
    """WordPiece: distinct words encode in ONE Arrow pass
    (MapInPandas) and the word→tokens table broadcasts back into the
    corpus — document text never shuffles through a join."""
    df = entry_mod.queries()["wordpiece_encode"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fim_transform_is_pure_projection(spark):
    """FIM must stay a scan-side projection: zero exchanges, zero
    joins, zero windows — the whole transform rides whole-stage
    codegen on the scan that produced the rows."""
    import re

    df = entry_mod.queries()["fim_transform"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan[:2000]
    assert "Join" not in plan and "Window" not in plan, plan[:2000]


def test_gapfill_no_global_sort(spark):
    """The LOCF carry-forward window must be PARTITIONED by key — a
    key's grid sorts in one task, never the whole table."""
    df = entry_mod.queries()["gapfill_locf"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "SinglePartition" not in plan, plan[:1500]
    assert "Window" in plan


def test_sequence_gap_audit_no_global_sort(spark):
    """Adjacency via the two-phase range buckets: the lead() window is
    partitioned by bucket; the ≤n_buckets boundary pairs were closed
    driver-side during the build — no single-task sort anywhere."""
    df = entry_mod.queries()["sequence_gap_audit"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "SinglePartition" not in plan, plan[:1500]


def test_bucket_checksums_two_exchanges_max(spark):
    """LWW reduce + checksum groupBy: two hash exchanges, nothing
    single-partition — replica comparison stays a linear scan shape."""
    import re

    df = entry_mod.queries()["bucket_checksums"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "SinglePartition" not in plan, plan[:1500]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan[:2000]


def test_debounce_single_key_exchange(spark):
    """Greedy debounce = ONE shuffle to the key grain feeding the
    Arrow group map — no second exchange, no sort-by-everything."""
    import re

    df = entry_mod.queries()["debounce_events"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "FlatMapGroupsInPandas" in plan, plan[:1500]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]
    assert "SinglePartition" not in plan, plan[:1500]


def test_unigram_word_table_broadcasts(spark):
    """Unigram encoding must join documents' words against the
    segmented DISTINCT-word table by BROADCAST — document text never
    shuffles (the vocab-derivation ranking runs eagerly during the
    build over the bounded substring table and is not in this plan)."""
    df = entry_mod.queries()["unigram_encode"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SinglePartition" not in plan, plan[:1500]


def test_frontier_schedule_single_exchange(spark):
    """Politeness scheduling is ONE host-partitioned window: exactly
    one hash exchange, no join — the minimum the semantics allow."""
    df = entry_mod.queries()["frontier_schedule"](spark, SF_DIR)
    plan = _physical_plan(df)
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_anchor_text_no_join_two_aggs(spark):
    """Anchor rollup is two hash aggregations (each with a map-side
    partial) and nothing else — no window sort, no join."""
    df = entry_mod.queries()["anchor_text"](spark, SF_DIR)
    plan = _physical_plan(df)
    import re
    assert "Join" not in plan, plan[:2000]
    assert "Window" not in plan, plan[:2000]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan[:2000]
