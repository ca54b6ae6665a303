"""Scalar / vectorized functions for the engine."""

from montandon_etl_spark.functions.extract import (  # noqa: F401
    EXTRACTOR_VERSION,
    extract_text_bytes,
    extract_text_udf,
    language_id,
)
