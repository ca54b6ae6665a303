"""dedup_clusters (connected components) and asof_join semantics on
adversarial shapes the fixture queries can't guarantee to cover."""

from __future__ import annotations

from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import dedup_clusters
from montandon_etl_spark.operators.relational import asof_join


def test_dedup_clusters_long_chain_converges(spark):
    """A 200-node path graph has diameter 199 — far beyond the round
    cap. Pointer jumping must still converge it to ONE cluster."""
    n = 200
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    )
    out = dedup_clusters(nodes, pairs, id_col="doc_id", max_iters=20).toPandas()
    assert len(out) == n
    assert set(out.cluster_id) == {0}
    assert out[out.is_canonical].id.tolist() == [0]


def test_dedup_clusters_components_and_singletons(spark):
    nodes = spark.range(10).select(F.col("id").alias("doc_id"))
    # two components {0,1,2}, {5,6}; the rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a bigint, id_b bigint"
    )
    out = dedup_clusters(nodes, pairs, id_col="doc_id").toPandas()
    got = dict(zip(out.id, out.cluster_id))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}
    assert out.is_canonical.sum() == 7  # one canonical per cluster


def test_dedup_clusters_empty_pairs(spark):
    nodes = spark.range(4).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    out = dedup_clusters(nodes, pairs, id_col="doc_id").toPandas()
    assert (out.id == out.cluster_id).all() and out.is_canonical.all()


def test_asof_join_semantics(spark):
    """<= semantics (same-instant right row is visible), no-match NULL,
    atomic struct carry (no cross-row column mixing), per-key reset."""
    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 15, 4), ("c", 30, 5)],
        "k string, ts bigint, ev bigint")
    right = spark.createDataFrame(
        [("a", 10, 100, "x"), ("a", 18, 200, None), ("b", 15, 300, "z")],
        "k string, ts bigint, rv bigint, tag string")
    out = asof_join(left, right, keys=["k"], ts_col="ts",
                    right_cols=["rv", "tag"], tiebreak="ev").toPandas()
    got = {r.ev: (r.rv, r.tag) for r in out.itertuples()}
    assert got[1] == (100, "x")          # same-instant right row visible
    assert got[2] == (200, None)         # latest right wins; its NULL tag
    # must NOT leak 'x' from the older row (atomic struct carry)
    assert out[out.ev == 3].rv.isna().all()  # no prior right row → NULL
    assert got[4] == (300, "z")          # keys partition independently
    assert out[out.ev == 5].rv.isna().all()  # key with no right rows
    assert len(out) == 5                 # every left row survives
