"""Incremental survivor election: after ANY edge-delta sequence the
maintained keep-list must equal the batch election (best quality,
ties to the smaller id) over the cluster index's current state —
through merges, splits, parallel-edge retraction, vanishing families,
multi-version catch-up, and duplicate refresh delivery."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from montandon_etl_spark.operators.cluster_index import ClusterIndex
from montandon_etl_spark.operators.survivor_index import SurvivorIndex


def _edges_df(spark, rows):
    return spark.createDataFrame(
        rows or [], "id_a string, id_b string, band int, bucket string"
    )


def _quality(spark):
    # deterministic quality scores with a deliberate tie (a == e)
    rows = [("a", 0.9), ("b", 0.7), ("c", 0.9), ("d", 0.2),
            ("e", 0.9), ("f", 0.5), ("g", 0.8)]
    return spark.createDataFrame(rows, "id string, quality double")


def _want(spark, cidx, quality):
    """Batch election over the cluster index's CURRENT state."""
    j = cidx.clusters(spark).select("id", "cluster_id").join(quality, "id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"),
                                                 F.asc("id"))
    cw = Window.partitionBy("cluster_id")
    out = (j.withColumn("rn", F.row_number().over(w))
           .withColumn("n", F.count(F.lit(1)).over(cw).cast("bigint"))
           .filter(F.col("rn") == 1))
    return {(r["cluster_id"], r["id"], r["quality"], r["n"])
            for r in out.collect()}


def _got(spark, sidx):
    return {tuple(r) for r in sidx.survivors(spark).collect()}


def test_incremental_equals_batch_election(spark, tmp_path):
    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=8)
    sidx = SurvivorIndex(str(tmp_path / "si"), n_parts=8)
    q = _quality(spark)

    def step(version, added=(), removed=()):
        cidx.apply(spark, version, _edges_df(spark, list(added)),
                   _edges_df(spark, list(removed)))
        sidx.refresh(spark, cidx, q)
        assert _got(spark, sidx) == _want(spark, cidx, q), version

    e_ab1 = ("a", "b", 0, "x")
    e_ab2 = ("a", "b", 1, "y")
    e_cd = ("c", "d", 0, "z")
    e_ae = ("a", "e", 3, "v")  # ties a (0.9) with e (0.9) → a wins
    # bootstrap on a non-empty index (two families already there)
    cidx.apply(spark, 1, _edges_df(spark, [e_ab1, e_ab2, e_cd]),
               _edges_df(spark, []))
    sidx.refresh(spark, cidx, q)
    assert _got(spark, sidx) == _want(spark, cidx, q)
    # survivor of {a,b} is a; of {c,d} is c
    got = {c: s for c, s, _, _ in _got(spark, sidx)}
    assert got == {"a": "a", "c": "c"}

    # merge via bridge: one family, c (0.9) ties a → 'a' (smaller id)
    step(2, added=[("b", "c", 2, "w")])
    got = {c: s for c, s, _, _ in _got(spark, sidx)}
    assert got == {"a": "a"}

    # quality tie within the family after adding e
    step(3, added=[e_ae])
    # retract one parallel edge: membership unchanged → same survivors
    step(4, removed=[e_ab1])
    # split the bridge: families re-elect independently
    step(5, removed=[("b", "c", 2, "w")])
    got = {c: s for c, s, _, _ in _got(spark, sidx)}
    assert got["c"] == "c"
    # retract the last a-b edge AND a-e: the a-family vanishes
    step(6, removed=[e_ab2, e_ae])
    assert {c for c, _, _, _ in _got(spark, sidx)} == {"c"}

    # echo batch (same row removed and added) keeps everything
    step(7, added=[e_cd], removed=[e_cd])

    # duplicate refresh delivery is a no-op
    before = _got(spark, sidx)
    sidx.refresh(spark, cidx, q)
    assert _got(spark, sidx) == before


def test_multi_version_catchup(spark, tmp_path):
    """refresh() skipped for several index versions must still land on
    the batch-election state (touched-partition union across the
    skipped versions)."""
    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=8)
    sidx = SurvivorIndex(str(tmp_path / "si"), n_parts=8)
    q = _quality(spark)
    cidx.apply(spark, 1, _edges_df(spark, [("a", "b", 0, "x")]),
               _edges_df(spark, []))
    sidx.refresh(spark, cidx, q)
    # two more versions without a refresh in between
    cidx.apply(spark, 2, _edges_df(spark, [("c", "d", 0, "z")]),
               _edges_df(spark, []))
    cidx.apply(spark, 3, _edges_df(spark, [("f", "g", 1, "y")]),
               _edges_df(spark, []))
    sidx.refresh(spark, cidx, q)
    assert _got(spark, sidx) == _want(spark, cidx, q)
    got = {c: s for c, s, _, _ in _got(spark, sidx)}
    assert got == {"a": "a", "c": "c", "f": "g"}  # g: 0.8 > f: 0.5
