"""Structured Streaming CDC pipeline."""

from montandon_etl_spark.streaming.pipeline import (  # noqa: F401
    CHANGELOG_SPARK_SCHEMA,
    enrich_batch,
    merge_microbatch,
    run_stream,
)
