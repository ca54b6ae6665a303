"""Last-writer-wins reduction — the engine's core dedup/merge operator.

Reference semantics being generalized: every table carries a default
latest-first ordering (apps/common/models.py:13 ``ordering=["-id"]``)
and dedup lookups take ``.first()`` under it
(apps/etl/extraction/sources/gdacs/extract.py:135-136) — i.e.
"latest id wins". The engine's ordering key is ``(warc_ts, seq)``:
event time first, global sequence number as the deterministic
tie-break (so replay is order-insensitive: LWW over a total order is
commutative and idempotent).

Two implementations, equal by construction (property-tested):

- ``lww_latest`` — ``max_by(struct(payload), struct(order))`` hash
  aggregation. Catalyst plans this with a *partial* (map-side)
  aggregate before the shuffle, so each input partition pre-reduces
  its local rows per key: a hot url that dominates one partition
  shrinks to one row before it ever crosses the wire. This is the
  default — at 100 TB the partial-agg property is what keeps hot
  domains from melting a reducer.

- ``lww_latest_salted`` — explicit two-phase reduce for the extreme
  skew case (one key ≫ one executor's input): phase 1 reduces per
  ``(key, salt)`` where salt spreads a hot key over S reducers,
  phase 2 reduces the ≤S survivors per key. Correct because LWW is
  associative+commutative; the per-salt winners reduced again per key
  give the same winner (tested: salted ≡ unsalted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _winner(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    payload = [c for c in df.columns if c not in keys]
    return (
        df.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("_w")
        )
        .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )


def lww_latest(
    df: DataFrame,
    keys: list[str] | str = "url",
    order_cols: list[str] | str = ("warc_ts", "seq"),
) -> DataFrame:
    """Keep, per key, the row with the greatest (order_cols) tuple."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    return _winner(df, keys, order_cols)


def lww_latest_salted(
    df: DataFrame,
    keys: list[str] | str = "url",
    order_cols: list[str] | str = ("warc_ts", "seq"),
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted LWW for hot keys.

    salt = pmod(xxhash64(order_cols...), n_salts) — derived from the
    *ordering* columns so rows of one key scatter uniformly; phase-2
    input is bounded by n_salts rows per key.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in order_cols]), F.lit(n_salts))
    )
    phase1 = _winner(salted, keys + ["_salt"], order_cols).drop("_salt")
    # phase1 dropped _salt from payload via drop after reduce; reduce again per key
    return _winner(phase1, keys, order_cols)
