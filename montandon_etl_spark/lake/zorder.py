"""Z-order (Morton) multi-dimensional clustering for compaction.

The lake's compaction already key-clusters (1-D sort on the table key,
table.py compact()); that prunes point lookups but nothing else. A
range-scan workload over OTHER columns — "English pages crawled last
week" on a url-keyed table — reads every file. Z-ordering the
compaction rewrite interleaves the bits of several columns so that a
file holding a contiguous z-range covers a small HYPER-RECTANGLE of
the value space: per-file min/max stats on each clustered column
become tight, and a range filter prunes most files (the same layout
trick Delta OPTIMIZE ZORDER BY and Iceberg's sort orders use).

Everything is int64 bit arithmetic inside whole-stage codegen — no
Python, no extra shuffle (the z-sort rides the compaction shuffle's
sortWithinPartitions slot, exactly like the 1-D key sort it replaces).

Determinism contract: quantization is INTEGER math (floor-div by a
precomputed integer span), so the same row always gets the same
z-value on any engine — a DuckDB oracle replays the interleave
bit-for-bit (see the zorder_interleave query).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an int64 column with known [lo, hi] range onto a contiguous
    prefix of [0, 2^bits-1] by a pure right-shift (cell size = the
    smallest power of two that makes the range fit) — engine-portable
    integer math, no float rounding anywhere. At least half the cells
    are used (the shift doubles cell size each step); under-using the
    tail cells only coarsens the sort a little and never affects
    pruning correctness, which reads raw per-file min/max stats.
    Values outside the advertised range clamp to the edge cells."""
    span = max(1, hi - lo + 1)
    shift = max(0, (span - 1).bit_length() - bits)
    q = F.shiftright((col - F.lit(lo)).cast("bigint"), shift)
    return F.least(F.lit((1 << bits) - 1), F.greatest(F.lit(0), q))


def zvalue(cols: list[Column], bits: int = 8) -> Column:
    """Morton interleave: bit b of column i lands at position
    b*len(cols) + i. Inputs must already be in [0, 2^bits-1]
    (:func:`quantize`). len(cols)*bits must fit in 62 bits."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds int64")
    out = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            out = out + F.shiftleft(
                F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1)),
                b * n + i,
            )
    return out


def quantize_sql(expr: str, lo: int, hi: int, bits: int) -> str:
    """The identical quantizer as an ANSI-SQL string (DuckDB oracle):
    same precomputed shift, same clamp, arithmetic >> both engines."""
    span = max(1, hi - lo + 1)
    shift = max(0, (span - 1).bit_length() - bits)
    return (f"least({(1 << bits) - 1}, greatest(0, "
            f"((({expr}) - {lo}) >> {shift})))")


def zvalue_sql(exprs: list[str], bits: int = 8) -> str:
    """The identical interleave as an ANSI-SQL string (DuckDB oracle /
    documentation of the exact bit layout)."""
    n = len(exprs)
    # each term fully parenthesized: << binds LOOSER than + in both
    # Spark SQL and DuckDB, so `a << 3 + b << 5` would misparse
    terms = [
        f"(((({e}) >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, e in enumerate(exprs)
    ]
    return "(" + " + ".join(terms) + ")"
