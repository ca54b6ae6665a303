"""Structured Streaming CDC pipeline."""

from montandon_etl_spark.streaming.pipeline import (  # noqa: F401
    CHANGELOG_DDL_SPARK_SCHEMA,
    CHANGELOG_SPARK_SCHEMA,
    apply_trailing_ddl,
    enrich_batch,
    merge_microbatch,
    run_stream,
)
