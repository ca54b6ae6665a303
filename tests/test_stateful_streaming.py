"""Watermarked windowed aggs + applyInPandasWithState LWW compactor."""

from __future__ import annotations

import pandas as pd

from montandon_etl_spark.sources.changelog import write_changelog
from montandon_etl_spark.streaming.pipeline import CHANGELOG_SPARK_SCHEMA
from montandon_etl_spark.streaming.stateful import (
    dedup_within_watermark,
    session_window_stats,
    streaming_lww_state,
    windowed_event_counts,
)


def test_dedup_within_watermark_drops_redelivered(spark, tmp_path, small_changelog):
    """An at-least-once feed with every event delivered twice dedups to
    exactly the distinct (url, seq) set, with watermark-bounded state."""
    doubled = pd.concat([small_changelog, small_changelog]).reset_index(drop=True)
    log_dir = str(tmp_path / "dups")
    write_changelog(doubled.sample(frac=1.0, random_state=7), log_dir, n_chunks=2)
    stream = spark.readStream.schema(CHANGELOG_SPARK_SCHEMA).parquet(log_dir)
    q = (
        dedup_within_watermark(stream, keys=["url", "seq"], watermark="365 days")
        .writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT url, seq FROM deduped").toPandas()
    assert len(got) == len(small_changelog)
    assert not got.duplicated(["url", "seq"]).any()


def test_windowed_counts_match_batch(spark, tmp_path, small_changelog):
    log_dir = str(tmp_path / "log")
    write_changelog(small_changelog, log_dir, n_chunks=3)
    stream = spark.readStream.schema(CHANGELOG_SPARK_SCHEMA).parquet(log_dir)
    q = (
        windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT op, sum(n) AS n FROM win_counts GROUP BY op").toPandas()
    want = small_changelog.groupby("op").size()
    for r in got.itertuples():
        assert r.n == want[r.op], f"{r.op}: {r.n} != {want[r.op]}"


def test_session_window_matches_batch_sessionize(spark, tmp_path, small_changelog):
    """Streaming session_window sessions must agree with the batch
    sessionize operator: same session count and same per-session event
    counts per key (ids vs windows differ by representation only)."""
    from montandon_etl_spark.operators.relational import sessionize

    log_dir = str(tmp_path / "sess_log")
    write_changelog(small_changelog, log_dir, n_chunks=2)
    stream = spark.readStream.schema(CHANGELOG_SPARK_SCHEMA).parquet(log_dir)
    q = (
        session_window_stats(stream, key="url", ts_col="warc_ts",
                             gap="30 minutes", watermark="100000 days")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT url, n_events FROM sessions").toPandas()

    batch = spark.read.schema(CHANGELOG_SPARK_SCHEMA).parquet(log_dir)
    want = (
        sessionize(batch, "url", "warc_ts", gap_minutes=30, tiebreak="seq")
        .groupBy("url", "session_id")
        .count()
        .toPandas()
    )
    assert len(got) == len(want)  # same number of sessions overall
    g = got.groupby("url").n_events.apply(lambda s: sorted(s)).to_dict()
    w = want.groupby("url")["count"].apply(lambda s: sorted(s)).to_dict()
    assert g == w


def test_streaming_lww_state_matches_oracle(spark, tmp_path, small_changelog):
    """The stateful compactor's last emission per url must be the LWW
    winner key — same oracle as the table merge."""
    log_dir = str(tmp_path / "log2")
    write_changelog(small_changelog, log_dir, n_chunks=4)
    stream = (
        spark.readStream.schema(CHANGELOG_SPARK_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(log_dir)
    )
    q = (
        streaming_lww_state(stream)
        .writeStream.format("memory")
        .queryName("lww_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql("SELECT * FROM lww_state").toPandas()
    assert len(emitted) > 0
    # last emission per url (max seq among emissions) == oracle winner
    last = emitted.sort_values(["url", "warc_ts", "seq"]).groupby("url").tail(1)
    from montandon_etl_spark.oracle import replay_oracle

    want = replay_oracle(small_changelog)  # live urls only
    want_keys = {(r.url, r.warc_ts, r.seq) for r in want.itertuples()}
    got_live = {
        (r.url, pd.Timestamp(r.warc_ts), r.seq)
        for r in last.itertuples()
        if r.op == "upsert"
    }
    # every live oracle winner must be exactly the compactor's last emission
    for k in want_keys:
        assert k in got_live, f"missing/incorrect winner for {k[0]}"
    # deleted urls: compactor's last emission is the delete
    deleted_last = {r.url for r in last.itertuples() if r.op == "delete"}
    live_urls = {k[0] for k in want_keys}
    assert deleted_last.isdisjoint(live_urls)
