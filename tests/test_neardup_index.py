"""Incremental near-dup index: after ANY sequence of upsert/delete
batches (including stale/out-of-order events), the materialized pair
set must equal a full-corpus minhash_lsh_pairs recompute over the
surviving LWW state — plus exactly-once re-delivery semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from montandon_etl_spark.operators.dedup import minhash_lsh_pairs
from montandon_etl_spark.operators.neardup_index import NearDupIndex

TS = pd.Timestamp("2024-03-01")
PARAMS = dict(n=2, k=8, bands=4)

# a tiny vocabulary so near-dup shingle collisions actually happen
DOCS = {
    "a": "the quick brown fox jumps over the lazy dog",
    "a2": "the quick brown fox jumps over the lazy cat",
    "b": "pack my box with five dozen liquor jugs",
    "b2": "pack my box with five dozen liquor mugs",
    "c": "completely unrelated text about spark engines",
}


def _batch(spark, rows):
    """rows: (seq, url, hours_offset, op, text)"""
    data = [(s, u, (TS + pd.Timedelta(hours=h)).to_pydatetime(), op, t)
            for (s, u, h, op, t) in rows]
    return spark.createDataFrame(
        data, "seq bigint, url string, warc_ts timestamp, op string, text string"
    )


def _expected_pairs(spark, state: dict[str, str], max_bucket=None):
    if not state:
        return set()
    df = spark.createDataFrame(list(state.items()), "url string, text string")
    out = minhash_lsh_pairs(df, "url", "text", max_bucket=max_bucket, **PARAMS)
    return {(r["id_a"], r["id_b"]) for r in out.collect()}


def _got_pairs(idx, spark):
    return {(r["id_a"], r["id_b"]) for r in idx.pairs(spark).collect()}


def test_incremental_index_equals_full_recompute(spark, tmp_path):
    idx = NearDupIndex.create(str(tmp_path / "ndi"), **PARAMS)

    # batch 0: initial inserts
    b0 = [(1, "u/a", 0, "upsert", DOCS["a"]),
          (2, "u/b", 0, "upsert", DOCS["b"]),
          (3, "u/c", 0, "upsert", DOCS["c"]),
          (4, "u/d", 0, "upsert", DOCS["a2"])]
    idx.update(spark, _batch(spark, b0), batch_id=0)
    state = {"u/a": DOCS["a"], "u/b": DOCS["b"], "u/c": DOCS["c"], "u/d": DOCS["a2"]}
    assert _got_pairs(idx, spark) == _expected_pairs(spark, state)
    assert _got_pairs(idx, spark)  # sanity: the fixture produces pairs

    # batch 1: update u/b to a near-dup of itself, insert u/e, delete u/c
    b1 = [(5, "u/b", 1, "upsert", DOCS["b2"]),
          (6, "u/e", 1, "upsert", DOCS["b"]),
          (7, "u/c", 1, "delete", None)]
    idx.update(spark, _batch(spark, b1), batch_id=1)
    state.update({"u/b": DOCS["b2"], "u/e": DOCS["b"]})
    del state["u/c"]
    assert _got_pairs(idx, spark) == _expected_pairs(spark, state)

    # batch 2: STALE events — an older upsert and an older delete for
    # u/b must lose the LWW election and leave pairs derived from the
    # surviving (newer) signature; also change u/a away from u/d
    b2 = [(8, "u/b", 0, "upsert", DOCS["c"]),     # stale: hour 0 < hour 1
          (9, "u/b", 0, "delete", None),          # stale delete
          (10, "u/a", 2, "upsert", DOCS["c"])]    # real change
    idx.update(spark, _batch(spark, b2), batch_id=2)
    state["u/a"] = DOCS["c"]
    assert _got_pairs(idx, spark) == _expected_pairs(spark, state)

    # batch 3: delete everything that still pairs
    b3 = [(11, "u/b", 3, "delete", None),
          (12, "u/e", 3, "delete", None),
          (13, "u/d", 3, "delete", None)]
    idx.update(spark, _batch(spark, b3), batch_id=3)
    for u in ("u/b", "u/e", "u/d"):
        del state[u]
    assert _got_pairs(idx, spark) == _expected_pairs(spark, state)

    # signature table state mirrors the surviving corpus
    live = {r["url"] for r in idx.signatures(spark).collect()}
    assert live == set(state)


def test_capped_index_cap_crossing(spark, tmp_path):
    """max_bucket is pinned at create time and maintained incrementally:
    a bucket crossing the cap retracts its pairs; dropping back under
    (via delete) restores them — each step ≡ a capped full recompute.
    An unrelated pair must survive every rewrite untouched."""
    cap = 2
    idx = NearDupIndex.create(str(tmp_path / "ndi"), max_bucket=cap, **PARAMS)
    T = DOCS["a"]
    b0 = [(1, "u/1", 0, "upsert", T), (2, "u/2", 0, "upsert", T),
          (3, "u/p", 0, "upsert", DOCS["b"]), (4, "u/q", 0, "upsert", DOCS["b2"])]
    idx.update(spark, _batch(spark, b0), batch_id=0)
    state = {"u/1": T, "u/2": T, "u/p": DOCS["b"], "u/q": DOCS["b2"]}
    got = _got_pairs(idx, spark)
    assert got == _expected_pairs(spark, state, max_bucket=cap)
    assert ("u/1", "u/2") in got  # bucket size 2 == cap: qualifies

    # grow the identical-text bucket past the cap → its pairs retract
    idx.update(spark, _batch(spark, [(5, "u/3", 1, "upsert", T)]), batch_id=1)
    state["u/3"] = T
    got = _got_pairs(idx, spark)
    assert got == _expected_pairs(spark, state, max_bucket=cap)
    assert ("u/1", "u/2") not in got
    assert ("u/p", "u/q") in got  # unrelated pair untouched

    # shrink back under the cap → the pair returns
    idx.update(spark, _batch(spark, [(6, "u/3", 2, "delete", None)]), batch_id=2)
    del state["u/3"]
    got = _got_pairs(idx, spark)
    assert got == _expected_pairs(spark, state, max_bucket=cap)
    assert {("u/1", "u/2"), ("u/p", "u/q")} <= got

    # below pair threshold → gone
    idx.update(spark, _batch(spark, [(7, "u/2", 3, "delete", None)]), batch_id=3)
    del state["u/2"]
    assert _got_pairs(idx, spark) == _expected_pairs(spark, state, max_bucket=cap)


def _crash_recovery_scenario(spark, tmp_path, torn: bool):
    """Crash between the signature merge and the derived LSH write
    (``torn=True`` leaves a half-written uncommitted version dir
    instead of none), then re-deliver. The trap: u/b's OLD buckets
    must stay retracted across the retry — a later doc with u/b's old
    text must NOT pair with u/b (whose live text changed)."""
    idx = NearDupIndex.create(str(tmp_path / "ndi"), **PARAMS)
    b0 = [(1, "u/b", 0, "upsert", DOCS["b"]),
          (2, "u/x", 0, "upsert", DOCS["b2"])]
    idx.update(spark, _batch(spark, b0), batch_id=0)
    assert _got_pairs(idx, spark) == {("u/b", "u/x")}

    b1 = [(3, "u/b", 1, "upsert", DOCS["c"])]  # retracts u/b's old buckets
    idx.update(spark, _batch(spark, b1), batch_id=1)
    head = idx.table.io.head_snapshot_id()
    import os as _os
    import shutil as sh
    vdir = str(tmp_path / "ndi" / "lsh" / f"v{head}")
    sh.rmtree(vdir)
    if torn:  # half-written version: dir exists, no _SUCCESS/manifest
        _os.makedirs(_os.path.join(vdir, "pfx=0"))
    # a fresh instance (no cached version/partition maps) re-delivers
    idx2 = NearDupIndex(str(tmp_path / "ndi"))
    idx2.update(spark, _batch(spark, b1), batch_id=1)  # repairs

    # u/e arrives with u/b's OLD text: pairs with u/x only — a stale
    # banded entry for u/b would wrongly add (u/b, u/e)
    b2 = [(4, "u/e", 2, "upsert", DOCS["b"])]
    idx2.update(spark, _batch(spark, b2), batch_id=2)
    state = {"u/b": DOCS["c"], "u/x": DOCS["b2"], "u/e": DOCS["b"]}
    assert _got_pairs(idx2, spark) == _expected_pairs(spark, state)
    assert ("u/b", "u/e") not in _got_pairs(idx2, spark)


def test_crash_before_lsh_write(spark, tmp_path):
    _crash_recovery_scenario(spark, tmp_path, torn=False)


def test_crash_torn_lsh_write(spark, tmp_path):
    _crash_recovery_scenario(spark, tmp_path, torn=True)


def test_incremental_index_redelivery_noop(spark, tmp_path):
    idx = NearDupIndex.create(str(tmp_path / "ndi"), **PARAMS)
    b0 = [(1, "u/a", 0, "upsert", DOCS["a"]),
          (2, "u/d", 0, "upsert", DOCS["a2"])]
    idx.update(spark, _batch(spark, b0), batch_id=0)
    head = idx.table.io.head_snapshot_id()
    before = _got_pairs(idx, spark)
    idx.update(spark, _batch(spark, b0), batch_id=0)  # re-delivery
    assert idx.table.io.head_snapshot_id() == head
    assert _got_pairs(idx, spark) == before == {("u/a", "u/d")}


def test_legacy_layout_fails_loudly(spark, tmp_path):
    """A pre-fusion index dir (no layout stamp in index.json) must
    refuse to open instead of silently reading an empty pair state
    (ADVICE r4)."""
    import json
    import os

    import pytest

    from montandon_etl_spark.operators.neardup_index import NearDupIndex

    idx = NearDupIndex.create(str(tmp_path / "i"), k=8, bands=2)
    cfg_path = os.path.join(str(tmp_path / "i"), "index.json")
    cfg = json.load(open(cfg_path))
    del cfg["layout"]  # what a round-3 build wrote
    json.dump(cfg, open(cfg_path, "w"))
    with pytest.raises(ValueError, match="layout"):
        NearDupIndex(str(tmp_path / "i"))
