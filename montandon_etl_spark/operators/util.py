"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import functions as F


def stable_round6(col) -> F.Column:
    """Cross-engine-deterministic 6-decimal rounding: floor(x*1e6+0.5)
    has no round-half tie-break ambiguity (Spark HALF_UP vs DuckDB can
    disagree on exact .5 doubles — observed once in 60k rows at sf0.1);
    identical input doubles → identical output, always. SQL twin:
    ``floor(x * 1000000 + 0.5) / 1000000``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000
