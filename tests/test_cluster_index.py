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


def test_add_only_giant_component_bounded_work(spark, tmp_path):
    """VERDICT r3 Next #2 'done' criterion: one giant family (10^4-node
    star), then small ADD-ONLY batches. Per-batch work must be bounded
    by the delta neighborhood — the giant component's edges are never
    pulled while its label is stable — and every state equals the
    from-scratch recompute."""
    import json
    import os

    from montandon_etl_spark.lake.pstore import VersionedPartitionStore

    cidx = ClusterIndex(str(tmp_path / "ci"), n_parts=64)
    hub = "a0000"
    giant = [(hub, f"m{i:05d}", 0, f"b{i}") for i in range(1, 10_000)]
    state = set(giant)
    cidx.apply(spark, 1, _edges_df(spark, giant), _edges_df(spark, []))

    # spy on edge-store reads to pin the comp-pull cost
    read_filters = []
    orig_read = VersionedPartitionStore.read

    def spy(self, spark_, schema, part_filter=None, attach_part=False,
            below_version=None):
        if self is cidx.edges:
            read_filters.append(
                None if part_filter is None else set(part_filter))
        return orig_read(self, spark_, schema, part_filter=part_filter,
                         attach_part=attach_part, below_version=below_version)

    # batch 2: larger-id nodes attach to the giant + a fresh 2-node
    # component — NO label changes, so zero component edges are pulled
    b2 = [("m00001", "z0001", 1, "q1"), ("z0002", "z0003", 1, "q2")]
    VersionedPartitionStore.read = spy
    try:
        cidx.apply(spark, 2, _edges_df(spark, b2), _edges_df(spark, []))
    finally:
        VersionedPartitionStore.read = orig_read
    state.update(b2)
    assert _got_clusters(cidx, spark) == _want_clusters(spark, state)
    # nothing relabeled → the component pull is skipped outright; the
    # only edge read is the touched-partition keep-slice — every read
    # must carry a part filter bounded by the delta neighborhood
    assert read_filters, "no edge-store reads recorded"
    assert all(f is not None for f in read_filters), read_filters
    assert max(len(f) for f in read_filters) <= 4, read_filters
    # and the versioned rewrite touched only the delta neighborhood's
    # partitions: v2 manifests carry a handful of partitions, v1 (the
    # giant build) carries many
    lab_v2 = json.load(open(
        os.path.join(str(tmp_path / "ci"), "labels", "v2", "manifest.json")))
    lab_v1 = json.load(open(
        os.path.join(str(tmp_path / "ci"), "labels", "v1", "manifest.json")))
    assert len(lab_v2["parts"]) <= 6 < len(lab_v1["parts"])
    edge_v2 = json.load(open(
        os.path.join(str(tmp_path / "ci"), "edges", "v2", "manifest.json")))
    assert len(edge_v2["parts"]) <= 6

    # batch 3: a SMALLER id joins the giant → label must migrate to it
    # (the expensive relabel path, still correct)
    b3 = [("a!new", "m00002", 2, "r1")]
    cidx.apply(spark, 3, _edges_df(spark, b3), _edges_df(spark, []))
    state.update(b3)
    got = _got_clusters(cidx, spark)
    assert got == _want_clusters(spark, state)
    assert ("a!new", "a!new", True) in got  # new canonical

    # batch 4: bridge merges the fresh z-component into the giant
    b4 = [("z0001", "z0002", 3, "s1")]
    cidx.apply(spark, 4, _edges_df(spark, b4), _edges_df(spark, []))
    state.update(b4)
    assert _got_clusters(cidx, spark) == _want_clusters(spark, state)
