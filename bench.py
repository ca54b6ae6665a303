"""Benchmark harness. Prints ONE JSON line:

  {"metric": "cdc_events_per_sec", "value": N, "unit": "events/sec",
   "queries": {...per-query seconds...}, "sf": ..., ...}

Headline: the CDC pipeline itself — a seeded changelog (cached in
/tmp, deterministic) replayed through extract → LWW MERGE → snapshot
commits; value = change-events/sec to committed upserts (the
BASELINE.json metric). The queries dict adds representative operator
timings at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] cores (default 32)
  BENCH_CDC_EVENTS     changelog size (default 300000)
  BENCH_CDC_URLS       keyspace size (default 100000)
  BENCH_JSON_OUT       also write the JSON line to this path
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("PYTHONPATH", REPO)


def _ensure_changelog(n_events: int, n_urls: int, seed: int = 42) -> str:
    """Generate-once, cache in /tmp keyed by parameters."""
    out = f"/tmp/montandon_bench/chg_{n_events}_{n_urls}_{seed}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    from montandon_etl_spark.sources.changelog import gen_changelog, write_changelog

    df = gen_changelog(n_events=n_events, n_urls=n_urls, seed=seed, n_domains=2000)
    write_changelog(df, out, n_chunks=8)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def bench_cdc(spark, n_events: int, n_urls: int, work_dir: str) -> dict:
    """Replay the changelog through the full pipeline; return timings."""
    import shutil

    from pyspark.sql import functions as F

    from montandon_etl_spark.lake.table import SnapshotTable
    from montandon_etl_spark.streaming.pipeline import (
        CHANGELOG_SPARK_SCHEMA,
        merge_microbatch,
    )

    log_dir = _ensure_changelog(n_events, n_urls)
    table_path = os.path.join(work_dir, "pages")
    shutil.rmtree(table_path, ignore_errors=True)
    table = SnapshotTable.create(table_path, n_buckets=64)

    chunks = sorted(
        os.path.join(log_dir, f) for f in os.listdir(log_dir) if f.endswith(".parquet")
    )
    # untimed warmup of the MERGE path itself: the operator-query warmup
    # above never touches the extractor pandas UDF or the parquet commit
    # writer, so the first timed batch would otherwise pay python-worker
    # spawn + Arrow serializer init + JIT (~2-3s, ~15% of the run).
    # Standard steady-state methodology — the 10^10-event target runs
    # for days, where warmup is noise.
    warm_path = os.path.join(work_dir, "pages_warm")
    shutil.rmtree(warm_path, ignore_errors=True)
    warm_table = SnapshotTable.create(warm_path, n_buckets=64)
    warm_df = (
        spark.read.schema(CHANGELOG_SPARK_SCHEMA).parquet(chunks[0]).limit(4000)
    )
    merge_microbatch(spark, warm_table, warm_df, batch_id=0)
    shutil.rmtree(warm_path, ignore_errors=True)

    t0 = time.time()
    for i, chunk in enumerate(chunks):
        df = spark.read.schema(CHANGELOG_SPARK_SCHEMA).parquet(chunk)
        merge_microbatch(spark, table, df, batch_id=i)
    wall = time.time() - t0
    final_rows = table.read(spark).count()
    return {
        "cdc_wall_sec": round(wall, 3),
        "cdc_events": n_events,
        "cdc_events_per_sec": round(n_events / wall, 1),
        "cdc_final_rows": final_rows,
        "cdc_batches": len(chunks),
    }


# operator queries worth timing at bench scale (subset of the driver
# queries: the scale-relevant ones; ngram_jaccard excluded — it is the
# verify stage of near-dup, LSH is the scale path)
BENCH_QUERIES = [
    "cdc_lww_latest_state",
    "dedup_exact_content",
    "minhash_lsh_candidates",
    "incremental_neardup_pairs_capped",  # 3-batch CDC-maintained LSH index
    "mv_source_stats",  # CDF-maintained materialized aggregate
    "mv_distinct_users",  # CDF-maintained HLL distinct-count view
    "video_frame_index",  # MP4 sample-table demux, per-frame rows
    "pdf_text_extract",  # PDF build+parse: xref, Flate, TJ text interp
    "sitemap_scan",  # sitemap/sitemapindex discovery, W3C date lowering
    "feed_scan",  # RSS/Atom normalization, RFC822+ISO dates
    "avro_ocf_roundtrip",  # Avro OCF write+scan, deflate/null codecs
    "debezium_avro_decode",  # Confluent-framed binary Debezium decode
    "debezium_proto_decode",  # proto3 wire decode w/ unknown-field skip
    "kafka_segment_decode",  # RecordBatch v2 wire: lz4/snappy/gzip + crc32c
    "cdc_relay_roundtrip",  # change feed -> Debezium-Avro frames -> decode
    "main_content_extract",  # jusText block classification per page
    "fix_mojibake",  # ftfy-style encoding repair, Arrow UDF pair
    "image_near_dup",  # PNG decode -> dHash -> banded Hamming pairs
    "image_near_dup_jpeg",  # same pipeline across the lossy baseline-JPEG path
    "h264_pcm_decode",  # distributed H.264 encode->decode round trip
    "simhash",
    "token_stats",
    "quality_score",
    "ngram_lm_score",  # self-trained char-trigram LM fluency scoring
    "perplexity_buckets",  # CCNet head/middle/tail fluency terciles
    "redact_pii",
    "dedup_paragraphs",
    "dup_spans",  # ExactSubstr: corpus-wide duplicated k-token spans
    "classifier_score",  # hashed-ngram linear classifier, broadcast weights
    "countmin_freq",  # count-min sketch build + probe
    "ngram_contamination",
    "bloom_decontamination",  # sketch-compressed blocklist, join-free probe
    "bpe_tokenize",  # BPE train (distinct-word table) + broadcast encode
    "wordpiece_encode",  # greedy longest-match vs a fixed vocab (BERT shape)
    "unigram_encode",  # SentencePiece Viterbi vs derived scored vocab
    "fim_transform",  # fill-in-middle objective, pure projection
    "gapfill_locf",  # per-key regular grid + carry-forward
    "chunk_documents",  # token-budget packing over the same vocab
    "pps_sample",  # two-phase bucketed PPS cumsum (no global sort)
    "weighted_sample",  # A-ES weighted draw, TakeOrderedAndProject
    "zorder_pruned_scan",  # CDC merges -> z-clustered compact -> pruned range read
    "sequence_pack_stats",  # cross-doc greedy packing + per-sequence utilization
    "mixture_resample",  # per-stratum corpus reweighting (down/up-sample)
    "dsir_select",  # hashed-ngram importance resampling (DSIR top-k)
    "semantic_contamination",  # embedding-space benchmark leakage gate
    "ann_topk_ivfpq",  # coarse-cell prune + product-quantization scoring
    "ann_topk_pq_rerank",  # ADC shortlist + exact-cosine rerank (two-stage)
    "incremental_ann_topk_pq",  # CDC-maintained PQ-code postings
    "bm25_topk",  # one-shot lexical BM25, broadcast query vocabulary
    "incremental_bm25_topk",  # CDC-maintained inverted index, pruned probes
    "curation_gate",  # quality+lang+dedup funnel: one scan, one shuffle
    "gopher_rules",  # Gopher quality heuristics, integer-exact thresholds
    "host_boilerplate",  # cross-doc site-template strip, (host,line) agg
    "fuzzy_contamination",  # cross-corpus MinHash near-dup gate (bench broadcast)
    "scd2_history",  # SCD2 validity intervals, one per-key window
    "log_compaction",  # Kafka-style minimal changelog, max_by reduce
    "column_churn",  # per-column change freq, one window + one rollup
    "schema_drift_report",  # unannounced-drift profile: 1 agg, no join
    "recrawl_schedule",  # crawl-freshness policy, one map-combinable agg
    "incremental_scd2",  # CDC-maintained SCD2 intervals, O(touched parts)
    "table_clone",  # portable snapshot export/import, zero-replay file copy
    "rebucket_roundtrip",  # partition-spec evolution mid-stream, 8->16
    "stream_stream_join",  # watermarked interval join, bounded state
    "temporal_join",  # AS-OF enrichment: equi-join + interval predicate
    "anchor_text",  # per-target anchor rollup, two map-combinable aggs
    "frontier_schedule",  # per-host politeness window, no global sort
    "train_quality_classifier",  # logistic GD, exact micro-unit trajectory
    "hll_distinct_users",  # deterministic HyperLogLog, exact registers
    "shuffle_shards",  # hash-permuted training shards, no global sort
    "mv_source_extremes",  # CDF-maintained MIN/MAX w/ retraction rescan
    "doc_fingerprint",
    "dedup_clusters",
    "repetition_stats",
    "embedding_near_dup_lsh",
    "semantic_dedup",  # SemDeDup: k-means-cell-blocked keep rule
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_ivf_computed",  # seeded sampled k-means quantizer path
    "incremental_ann_topk",  # CDC-maintained IVF postings
    "asof_join",
    "link_pagerank",  # integer-unit power method, one join+agg per round
    "range_join_windows",  # bucket-explode equi-join, no BNLJ
    "heavy_hitters",
    "kmv_distinct_users",
    "wav_pcm_decode",  # RIFF/WAVE PCM16 container decode (audio arm)
    "adpcm_roundtrip",  # IMA-ADPCM integer codec encode->decode
    "audio_near_dup",  # energy-gradient fingerprint, banded Hamming join
    "audio_segments",  # VAD gaps-and-islands over frame energies
    "token_shards_roundtrip",  # trainer .bin/.idx export + re-read
    "incremental_token_shards",  # manifest-diff-driven shard rewrites
    "snapshot_diff",  # time-travel change feed, manifest-pruned
    "h264_p_decode",  # H.264 inter (P-slice) MC decode round trip
    "h264_p_multiref",  # two-reference P, te(v) ref selection per MB
    "h264_b_temporal",  # B temporal direct: POC-scaled colocated MVs
    "flac_roundtrip",  # FLAC lossless codec round trip (Rice + CRCs)
    "gif_decode",  # GIF LZW + interlace round trip
    "video_gop_pixels",  # whole-GOP container decode, chained P frames
    "robots_gate",  # RFC 9309 parse + broadcast longest-match gate
    "corpus_report",  # CUBE grouping sets, one scan one shuffle
    "incremental_image_near_dup",  # CDC-maintained banded-Hamming index
    "purge_time_travel",  # physical key erasure across retained history
    "split_leakage",  # cross-split near-dup contamination audit
    "hash_split_report",  # deterministic integer-grid split census
    "q1_pricing_summary",
    "order_revenue",
    "region_revenue",
    "sessionize",
    "topk_per_user",
    "tumbling_window_agg",
    "metrics_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("BENCH_CDC_EVENTS", "300000"))
    n_urls = int(os.environ.get("BENCH_CDC_URLS", "100000"))

    from montandon_etl_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # untimed warmup: JVM JIT + python UDF worker spawn
    qs["metrics_rollup"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # best-of-2 per query (VERDICT r3 Next #5): one in-suite run pays
    # first-plan codegen/JIT for that query's shapes and inherits GC
    # pressure from whatever ran before it — r3 measured up to 3.6x
    # inflation on unchanged plans. The second run re-executes the
    # FULL query (fixture-building queries rebuild their index/view in
    # a fresh tempdir — nothing is memoized), so min(walls) is an
    # honest warm wall that tracks isolated runs.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        walls = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        timings[name] = round(min(walls), 3)

    work_dir = f"/tmp/montandon_bench/work_{cpus}"
    cdc = bench_cdc(spark, n_events, n_urls, work_dir)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    scaling = None
    sp = os.path.join(REPO, "BENCH", "scaling_result.json")
    if os.path.exists(sp):
        with open(sp) as f:
            scaling = json.load(f)
    out = {
        "metric": "cdc_events_per_sec",
        "value": cdc["cdc_events_per_sec"],
        "unit": "events/sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "cdc": cdc,
        "suite_sec": round(sum(timings.values()), 3),
        "scaling": scaling,
    }
    line = json.dumps(out)
    print(line)
    path = os.environ.get("BENCH_JSON_OUT")
    if path:
        with open(path, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
