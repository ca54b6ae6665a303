"""Incremental connected components: after ANY edge-delta sequence
(merges, splits, parallel-edge retraction, vanishing components) the
maintained clusters must equal dedup_clusters recomputed from scratch
over the current edge multiset — standalone AND driven end-to-end
through NearDupIndex batches, including crash-retries."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from montandon_etl_spark.operators.cluster_index import ClusterIndex
from montandon_etl_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs
from montandon_etl_spark.operators.neardup_index import NearDupIndex

EKEY = ["id_a", "id_b", "band", "bucket"]


def _edges_df(spark, rows):
    """rows: (id_a, id_b, band, bucket)"""
    return spark.createDataFrame(
        rows or [], "id_a string, id_b string, band int, bucket string"
    )


def _want_clusters(spark, edge_rows):
    if not edge_rows:
        return set()
    e = _edges_df(spark, sorted(edge_rows))
    nodes = (e.select(F.col("id_a").alias("id"))
             .unionByName(e.select(F.col("id_b").alias("id"))).distinct())
    out = dedup_clusters(nodes, e.select("id_a", "id_b").distinct(), id_col="id")
    return {(r["id"], r["cluster_id"], r["is_canonical"]) for r in out.collect()}


def _got_clusters(cidx, spark):
    return {tuple(r) for r in cidx.clusters(spark).collect()}


def test_standalone_merge_split_parallel_edges(spark, tmp_path):
    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=8)
    state: set = set()

    def step(version, added=(), removed=()):
        cidx.apply(spark, version, _edges_df(spark, list(added)),
                   _edges_df(spark, list(removed)))
        state.difference_update(removed)
        state.update(added)
        assert _got_clusters(cidx, spark) == _want_clusters(spark, state)

    # two components + a parallel edge (same pair, two buckets)
    e_ab1 = ("a", "b", 0, "x")
    e_ab2 = ("a", "b", 1, "y")
    e_cd = ("c", "d", 0, "z")
    step(1, added=[e_ab1, e_ab2, e_cd])
    assert len({c for _, c, _ in _got_clusters(cidx, spark)}) == 2

    # bridge merges the components
    e_bc = ("b", "c", 2, "w")
    step(2, added=[e_bc])
    assert {c for _, c, _ in _got_clusters(cidx, spark)} == {"a"}

    # retract ONE of the parallel a-b edges: nothing splits
    step(3, removed=[e_ab1])
    assert {c for _, c, _ in _got_clusters(cidx, spark)} == {"a"}

    # retract the bridge: split back into two components
    step(4, removed=[e_bc])
    assert len({c for _, c, _ in _got_clusters(cidx, spark)}) == 2

    # retract the LAST a-b edge: that component vanishes entirely
    step(5, removed=[e_ab2])
    ids = {i for i, _, _ in _got_clusters(cidx, spark)}
    assert ids == {"c", "d"}

    # unchanged edge rebuilt (same row removed AND added) is a no-op
    step(6, added=[e_cd], removed=[e_cd])
    assert ids == {"c", "d"}


def test_standalone_crash_retry_between_stores(spark, tmp_path):
    import shutil

    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=4)
    cidx.apply(spark, 1, _edges_df(spark, [("a", "b", 0, "x")]),
               _edges_df(spark, []))
    add2 = [("b", "c", 0, "y")]
    cidx.apply(spark, 2, _edges_df(spark, add2), _edges_df(spark, []))
    want = _got_clusters(cidx, spark)
    # crash after labels v2 but before edges v2 → edges store lost it
    shutil.rmtree(str(tmp_path / "ci" / "edges" / "v2"))
    cidx.apply(spark, 2, _edges_df(spark, add2), _edges_df(spark, []))
    assert _got_clusters(cidx, spark) == want
    # and the inverse: labels v2 lost, edges intact
    shutil.rmtree(str(tmp_path / "ci" / "labels" / "v2"))
    cidx.apply(spark, 2, _edges_df(spark, add2), _edges_df(spark, []))
    assert _got_clusters(cidx, spark) == want


TS = pd.Timestamp("2024-03-01")
PARAMS = dict(n=2, k=8, bands=4)
DOCS = {
    "a": "the quick brown fox jumps over the lazy dog",
    "a2": "the quick brown fox jumps over the lazy cat",
    "b": "pack my box with five dozen liquor jugs",
    "b2": "pack my box with five dozen liquor mugs",
    "c": "completely unrelated text about spark engines",
}


def _batch(spark, rows):
    data = [(s, u, (TS + pd.Timedelta(hours=h)).to_pydatetime(), op, t)
            for (s, u, h, op, t) in rows]
    return spark.createDataFrame(
        data, "seq bigint, url string, warc_ts timestamp, op string, text string"
    )


def test_through_neardup_index(spark, tmp_path):
    idx = NearDupIndex.create(str(tmp_path / "ndi"), n_pfx=8, **PARAMS)
    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=8)

    def check():
        pairs = idx.pairs(spark)
        nodes = (pairs.select(F.col("id_a").alias("id"))
                 .unionByName(pairs.select(F.col("id_b").alias("id"))).distinct())
        want = {
            tuple(r) for r in dedup_clusters(nodes, pairs, id_col="id").collect()
        }
        assert _got_clusters(cidx, spark) == want

    b0 = [(1, "u/a", 0, "upsert", DOCS["a"]), (2, "u/x", 0, "upsert", DOCS["a2"]),
          (3, "u/b", 0, "upsert", DOCS["b"]), (4, "u/y", 0, "upsert", DOCS["b2"]),
          (5, "u/c", 0, "upsert", DOCS["c"])]
    idx.update(spark, _batch(spark, b0), batch_id=0, cluster_index=cidx)
    check()

    # u/a's text changes family (a-family → b-family): one component
    # shrinks, the other grows
    b1 = [(6, "u/a", 1, "upsert", DOCS["b2"])]
    idx.update(spark, _batch(spark, b1), batch_id=1, cluster_index=cidx)
    check()

    # delete u/y; stale echo for u/a must lose
    b2 = [(7, "u/y", 2, "delete", None), (8, "u/a", 0, "upsert", DOCS["a"])]
    idx.update(spark, _batch(spark, b2), batch_id=2, cluster_index=cidx)
    check()

    # crash-retry: lose the cluster stores' newest version, re-deliver
    import shutil

    head = idx.table.io.head_snapshot_id()
    shutil.rmtree(str(tmp_path / "ci" / "labels" / f"v{head}"))
    shutil.rmtree(str(tmp_path / "ci" / "edges" / f"v{head}"))
    idx.update(spark, _batch(spark, b2), batch_id=2, cluster_index=cidx)
    check()

    # full no-op on redelivery once all artifacts exist
    idx.update(spark, _batch(spark, b2), batch_id=2, cluster_index=cidx)
    check()


def test_random_delta_sequences_property(spark, tmp_path):
    """Seeded random add/remove delta sequences over a small edge pool
    (parallel edges included): every step must equal the from-scratch
    recompute — the unstructured counterpart of the scenario tests."""
    import random

    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(12)]
    pool = []
    for i in range(30):
        a, b = rng.sample(nodes, 2)
        if a > b:
            a, b = b, a
        pool.append((a, b, i % 3, f"k{i % 7}"))  # some parallel pairs
    pool = sorted(set(pool))

    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=8)
    state: set = set()
    for v in range(1, 9):
        absent = [e for e in pool if e not in state]
        add = rng.sample(absent, min(len(absent), rng.randint(1, 5)))
        rem = rng.sample(sorted(state), min(len(state), rng.randint(0, 3)))
        cidx.apply(spark, v, _edges_df(spark, add), _edges_df(spark, rem))
        state.difference_update(rem)
        state.update(add)
        assert _got_clusters(cidx, spark) == _want_clusters(spark, state), \
            f"diverged at version {v}"
