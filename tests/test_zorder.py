"""Z-order clustered compaction: interleave math, state preservation,
file-level range pruning, and the MOR-correctness guard."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.table import SnapshotTable
from montandon_etl_spark.lake.zorder import quantize, zvalue, zvalue_sql


def _ref_z(vals: list[int], bits: int) -> int:
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out += ((v >> b) & 1) << (b * len(vals) + i)
    return out


def test_zvalue_matches_reference(spark):
    rng = random.Random(4)
    rows = [(rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    got = df.select(
        "x", "y", "w",
        zvalue([F.col("x"), F.col("y"), F.col("w")], 8).alias("z"),
    ).collect()
    for r in got:
        assert r.z == _ref_z([r.x, r.y, r.w], 8)


def test_zvalue_sql_same_layout(spark):
    """The SQL-string form (oracle side) is the same bit layout."""
    df = spark.createDataFrame([(i, 255 - i) for i in range(256)], "x long, y long")
    got = df.select(
        zvalue([F.col("x"), F.col("y")], 8).alias("a"),
        F.expr(zvalue_sql(["x", "y"], 8)).alias("b"),
    ).collect()
    assert all(r.a == r.b for r in got)


def test_quantize_properties(spark):
    df = spark.createDataFrame([(v,) for v in range(-50, 1100)], "v long")
    q = df.select("v", quantize(F.col("v"), 0, 999, 8).alias("q")).collect()
    byv = {r.v: r.q for r in q}
    assert byv[-50] == 0 and byv[0] == 0          # clamp low
    assert byv[1099] == 255                        # out-of-range clamps to top cell
    vals = [byv[v] for v in range(0, 1000)]
    assert vals == sorted(vals)                    # monotone
    used = set(vals)
    # shift-quantizer contract: a contiguous prefix of cells, at least
    # half of them used (1000-wide range / cell size 4 → cells 0..249)
    assert used == set(range(max(used) + 1))
    assert len(used) >= 128
    assert max(used) <= 255


@pytest.fixture
def ztable(tmp_path):
    return SnapshotTable.create(
        str(tmp_path / "zt"),
        fields=[
            Field(1, "url", "string", False),
            Field(2, "warc_ts", "timestamp", False),
            Field(3, "x", "bigint", True),
            Field(4, "y", "bigint", True),
        ],
        n_buckets=2,
    )


def _seed(spark, ztable, n=3000, seed=7):
    rng = random.Random(seed)
    ts = pd.Timestamp("2024-06-01")
    rows = [
        (i, f"https://d{i % 97}.com/p{i}", (ts + pd.Timedelta(minutes=i)).to_pydatetime(),
         "upsert", rng.randint(0, 1023), rng.randint(0, 1023))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "seq long, url string, warc_ts timestamp, op string, x long, y long"
    )
    ztable.merge(spark, df, batch_id=0)
    return rows


def test_clustered_compact_preserves_state(spark, ztable):
    _seed(spark, ztable)
    before = sorted(map(tuple, ztable.read(spark).collect()))
    ztable.compact(spark, cluster_by=["x", "y"], target_file_rows=200)
    after = sorted(map(tuple, ztable.read(spark).collect()))
    assert before == after
    assert ztable.snapshot()["type"] == "compact"


def test_range_pruning_files_and_values(spark, ztable):
    rows = _seed(spark, ztable)
    ztable.compact(spark, cluster_by=["x", "y"], target_file_rows=200)
    total = len(ztable.manifest_entries())
    assert total >= 10  # target_file_rows split the buckets
    filt = {"x": (0, 127), "y": (0, 127)}
    pruned = ztable.manifest_entries(range_filters=filt)
    # a 1/8 x 1/8 box after z-clustering should drop most files
    assert len(pruned) < total / 2, (len(pruned), total)
    got = sorted(
        (r.url, r.x, r.y) for r in ztable.read(spark, range_filters=filt).collect()
    )
    want = sorted(
        (u, x, y) for (_, u, _, op, x, y) in rows
        if x <= 127 and y <= 127
    )
    assert got == want


def test_range_pruning_timestamp(spark, ztable):
    _seed(spark, ztable, n=2000)
    ztable.compact(spark, cluster_by=["warc_ts"], target_file_rows=150)
    lo = pd.Timestamp("2024-06-01").to_pydatetime()
    hi = (pd.Timestamp("2024-06-01") + pd.Timedelta(minutes=199)).to_pydatetime()
    filt = {"warc_ts": (lo, hi)}
    total = len(ztable.manifest_entries())
    pruned = ztable.manifest_entries(range_filters=filt)
    assert len(pruned) < total / 3, (len(pruned), total)
    assert ztable.read(spark, range_filters=filt).count() == 200


def test_sticky_clustering_auto_recompact(spark, ztable):
    """A later compact() with NO layout args (the auto-compaction
    path) reuses the recorded cluster columns + file-split target, so
    churned buckets regain range-pruning power."""
    rows = _seed(spark, ztable, n=1500)
    ztable.compact(spark, cluster_by=["x", "y"], target_file_rows=150)
    # churn: re-upsert a third of the keys with new coordinates
    upd = spark.createDataFrame(
        [(100_000 + i, u, ts, "upsert", (x + 512) % 1024, y)
         for i, (_, u, ts, _, x, y) in enumerate(rows) if i % 3 == 0],
        "seq long, url string, warc_ts timestamp, op string, x long, y long",
    )
    ztable.merge(spark, upd, batch_id=1)
    ztable.compact(spark)  # no layout args
    assert ztable.properties.get("stats_cols") == ["x", "y"]
    total = len(ztable.manifest_entries())
    pruned = ztable.manifest_entries(
        range_filters={"x": (0, 127), "y": (0, 127)})
    assert total >= 10
    assert len(pruned) < total / 2, (len(pruned), total)
    # and values match the LWW truth
    cur = {}
    for seq, u, ts, _, x, y in rows:
        cur[u] = (seq, x, y)
    for i, (seq0, u, ts, _, x, y) in enumerate(rows):
        if i % 3 == 0:
            cur[u] = (100_000 + i, (x + 512) % 1024, y)
    want = sorted((u, x, y) for u, (_, x, y) in cur.items()
                  if x <= 127 and y <= 127)
    got = sorted(
        (r.url, r.x, r.y)
        for r in ztable.read(
            spark, range_filters={"x": (0, 127), "y": (0, 127)}).collect()
    )
    assert got == want


def test_mixed_bucket_guard_no_stale_resurrection(spark, ztable):
    """A post-compaction delta without col_stats disables pruning for
    its bucket, so a key UPDATED OUT of the filter range never
    resurfaces with its old in-range value."""
    rows = _seed(spark, ztable, n=1000)
    ztable.compact(spark, cluster_by=["x", "y"], target_file_rows=100)
    # move every key of domain d3 out of the box with a newer version
    moved = [r for r in rows if "https://d3.com/" in r[1]]
    assert moved
    upd = spark.createDataFrame(
        [(10_000 + i, u, ts, "upsert", 5000, 5000)
         for i, (_, u, ts, _, _, _) in enumerate(moved)],
        "seq long, url string, warc_ts timestamp, op string, x long, y long",
    )
    ztable.merge(spark, upd, batch_id=1)
    got = {r.url for r in
           ztable.read(spark, range_filters={"x": (0, 2000), "y": (0, 2000)}).collect()}
    assert not any(u in got for (_, u, *_rest) in moved)
    # and the untouched keys still answer
    untouched = [r for r in rows if "https://d3.com/" not in r[1]
                 and r[4] <= 2000 and r[5] <= 2000]
    assert len(got) == len({u for (_, u, *_r) in untouched})
