"""CDF-maintained materialized aggregate: after ANY batch sequence
(inserts, group-migrating updates, deletes, stale events, NULL groups
and NULL measures), refresh() must make the state EXACTLY equal a
full groupBy recompute over the live table — plus exactly-once
refresh semantics."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from montandon_etl_spark.lake.format import Field
from montandon_etl_spark.lake.matview import MaterializedAggregate
from montandon_etl_spark.lake.table import SnapshotTable

TS = pd.Timestamp("2024-03-01")

FIELDS = [
    Field(1, "url", "string", False),
    Field(2, "warc_ts", "timestamp", False),
    Field(10, "source", "string", True),
    Field(11, "n_chars", "bigint", True),
]


def _batch(spark, rows):
    """rows: (seq, url, hours_offset, op, source, n_chars)"""
    data = [(s, u, (TS + pd.Timedelta(hours=h)).to_pydatetime(), op, src, nc)
            for (s, u, h, op, src, nc) in rows]
    return spark.createDataFrame(
        data,
        "seq bigint, url string, warc_ts timestamp, op string,"
        " source string, n_chars bigint",
    )


def _recompute(mv, spark, table):
    live = table.read(spark)
    return {
        (r["source"],): (r["n"], float(r["s"]))
        for r in live.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("n_chars").cast("decimal(28,6)"),
                             F.lit(0).cast("decimal(28,6)"))).alias("s"),
        ).collect()
    }


def _state(mv, spark):
    return {
        (r["source"],): (r["n_rows"], float(r["sum_n_chars"]))
        for r in mv.state(spark).collect()
    }


def test_matview_tracks_live_table(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                                 key_col="url", n_buckets=4)
    # bootstrap over a non-empty table
    table.merge(spark, _batch(spark, [
        (1, "u/a", 0, "upsert", "web", 100),
        (2, "u/b", 0, "upsert", "web", 50),
        (3, "u/c", 0, "upsert", "pdf", 30),
    ]), batch_id=0)
    mv = MaterializedAggregate.create(str(tmp_path / "mv"), spark, table,
                                      group_cols=["source"],
                                      sum_cols=["n_chars"])
    assert _state(mv, spark) == _recompute(mv, spark, table)

    # update migrating groups (web→pdf), insert with NULL measure,
    # insert with NULL group, delete
    table.merge(spark, _batch(spark, [
        (4, "u/a", 1, "upsert", "pdf", 110),   # group migration
        (5, "u/d", 1, "upsert", "web", None),  # NULL measure → +0
        (6, "u/e", 1, "upsert", None, 7),      # NULL group is a group
        (7, "u/b", 1, "delete", None, None),
    ]), batch_id=1)
    mv.refresh(spark)
    assert _state(mv, spark) == _recompute(mv, spark, table)

    # stale events lose LWW and must not perturb the view
    table.merge(spark, _batch(spark, [
        (8, "u/a", 0, "upsert", "web", 999),   # stale: hour 0 < hour 1
        (9, "u/c", 2, "delete", None, None),
    ]), batch_id=2)
    mv.refresh(spark)
    got = _state(mv, spark)
    assert got == _recompute(mv, spark, table)
    assert ("pdf",) in got  # u/a migrated and survived the stale echo

    # delete a whole group → its row disappears from the state
    table.merge(spark, _batch(spark, [
        (10, "u/a", 3, "delete", None, None),
    ]), batch_id=3)
    mv.refresh(spark)
    got = _state(mv, spark)
    assert got == _recompute(mv, spark, table)
    assert ("pdf",) not in got


def test_matview_multi_commit_catchup_and_idempotency(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                                 key_col="url", n_buckets=4)
    mv = MaterializedAggregate.create(str(tmp_path / "mv"), spark, table,
                                      group_cols=["source"],
                                      sum_cols=["n_chars"])
    # three commits, ONE refresh catches up across all of them
    for i, rows in enumerate([
        [(1, "u/a", 0, "upsert", "web", 10)],
        [(2, "u/b", 1, "upsert", "web", 20), (3, "u/a", 1, "upsert", "pdf", 11)],
        [(4, "u/b", 2, "delete", None, None)],
    ]):
        table.merge(spark, _batch(spark, rows), batch_id=i)
    head = mv.refresh(spark)
    assert head == table.io.head_snapshot_id()
    assert _state(mv, spark) == _recompute(mv, spark, table)

    # refresh with no new commits: no-op, same applied id
    assert mv.refresh(spark) == head
    assert mv.applied_snapshot_id() == head

    # crash-retry: lose the freshest state version, refresh repairs it
    import shutil

    shutil.rmtree(str(tmp_path / "mv" / "state" / f"v{head}"))
    assert mv.refresh(spark) == head
    assert _state(mv, spark) == _recompute(mv, spark, table)


def test_matview_survives_group_column_rename(spark, tmp_path):
    """The view pins its columns by FIELD ID: a DDL rename of the
    group column between refreshes must neither break the CDF preimage
    mapping nor orphan state files written under the old name."""
    table = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                                 key_col="url", n_buckets=4)
    table.merge(spark, _batch(spark, [
        (1, "u/a", 0, "upsert", "web", 100),
        (2, "u/b", 0, "upsert", "pdf", 30),
    ]), batch_id=0)
    mv = MaterializedAggregate.create(str(tmp_path / "mv"), spark, table,
                                      group_cols=["source"],
                                      sum_cols=["n_chars"])

    table.apply_ddl("rename_column", "source", new_name="origin")
    assert mv.group_cols == ["origin"]  # resolved live from the schema

    # post-rename batch arrives under the NEW column name; one refresh
    # catches up across the DDL snapshot and the merge
    rows = [(3, "u/c", 1, "upsert", "web", 7),
            (4, "u/a", 1, "upsert", "pdf", 110)]
    data = [(s, u, (TS + pd.Timedelta(hours=h)).to_pydatetime(), op, src, nc)
            for (s, u, h, op, src, nc) in rows]
    table.merge(spark, spark.createDataFrame(
        data,
        "seq bigint, url string, warc_ts timestamp, op string,"
        " origin string, n_chars bigint",
    ), batch_id=1)
    mv.refresh(spark)

    live = table.read(spark)
    want = {
        (r["origin"],): (r["n"], float(r["s"]))
        for r in live.groupBy("origin").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("n_chars").cast("decimal(28,6)"),
                             F.lit(0).cast("decimal(28,6)"))).alias("s"),
        ).collect()
    }
    got = {
        (r["origin"],): (r["n_rows"], float(r["sum_n_chars"]))
        for r in mv.state(spark).collect()
    }
    assert got == want


def test_partitioned_state_rewrites_strict_subset(spark, tmp_path):
    """VERDICT r3 Next #6 'done' criterion: on a HIGH-cardinality group
    column, a refresh after a small batch rewrites a strict subset of
    the state partitions (only those the delta's groups hash into) and
    the state still equals the full recompute."""
    import json as _json
    import os as _os

    import pandas as pd
    from montandon_etl_spark.lake.format import Field
    from montandon_etl_spark.lake.matview import MaterializedAggregate
    from montandon_etl_spark.lake.table import SnapshotTable

    table = SnapshotTable.create(
        str(tmp_path / "t"),
        fields=[Field(1, "url", "string", False),
                Field(2, "warc_ts", "timestamp", False),
                Field(3, "grp", "string", True),
                Field(4, "val", "double", True)],
        key_col="url", n_buckets=8)
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    schema = ("seq bigint, url string, warc_ts timestamp, op string,"
              " grp string, val double")
    # 500 distinct groups → every one of the 32 state partitions hit
    seed = [(i, f"u/{i}", ts, "upsert", f"g{i % 500}", float(i))
            for i in range(1000)]
    table.merge(spark, spark.createDataFrame(seed, schema), batch_id=0)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), spark, table, ["grp"], ["val"],
        n_state_parts=32)
    v0 = table.io.head_snapshot_id()
    m0 = _json.load(open(_os.path.join(
        str(tmp_path / "mv"), "state", f"v{v0}", "manifest.json")))
    assert len(m0["parts"]) == 32  # bootstrap touches everything

    # small batch: 3 groups change
    batch = [(2000, "u/1", pd.Timestamp("2024-01-02").to_pydatetime(),
              "upsert", "g1", 100.0),
             (2001, "u/2", pd.Timestamp("2024-01-02").to_pydatetime(),
              "delete", None, None),
             (2002, "u/new", pd.Timestamp("2024-01-02").to_pydatetime(),
              "upsert", "g_new", 7.5)]
    table.merge(spark, spark.createDataFrame(batch, schema), batch_id=1)
    mv.refresh(spark)
    v1 = table.io.head_snapshot_id()
    m1 = _json.load(open(_os.path.join(
        str(tmp_path / "mv"), "state", f"v{v1}", "manifest.json")))
    # the delta touches ≤ 4 groups (g1 old+new, u/2's old group, g_new)
    # → at most 4 of 32 partitions rewritten
    assert 0 < len(m1["parts"]) <= 4, m1["parts"]

    got = {tuple(r) for r in mv.state(spark).collect()}
    want = {tuple(r) for r in mv._aggregate(table.read(spark)).collect()}
    assert got == want


def test_gp_hash_is_session_timezone_independent(spark, tmp_path):
    """ADVICE r4: the state-partition hash of a TIMESTAMP group must
    not depend on spark.sql.session.timeZone — a refresh under a
    different session timezone must find the group's existing state
    row (same gp → pruned read hits it) instead of writing a
    duplicate row into another partition."""
    table = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                                 key_col="url", n_buckets=4)
    table.merge(spark, _batch(spark, [
        (1, "u1", 0, "upsert", "a", 10),
        (2, "u2", 0, "upsert", "a", 20),  # same hour → same ts group
        (3, "u3", 5, "upsert", "b", 30),
    ]), batch_id=0)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), spark, table,
        group_cols=["warc_ts"], sum_cols=["n_chars"], n_state_parts=8)

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        table.merge(spark, _batch(spark, [
            (4, "u4", 0, "upsert", "a", 40),   # existing ts group grows
            (5, "u3", 5, "delete", "b", None),  # existing ts group drains
        ]), batch_id=1)
        mv.refresh(spark)
        rows = mv.state(spark).collect()
        got = {r["warc_ts"]: (r["n_rows"], float(r["sum_n_chars"]))
               for r in rows}
        assert len(rows) == len(got), "duplicate group rows in state"
        live = {r["warc_ts"]: (r["n"], float(r["s"])) for r in
                table.read(spark).groupBy("warc_ts").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("n_chars").cast("decimal(28,6)")).alias("s"),
                ).collect()}
        assert got == live
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_legacy_gp_algo_fails_loudly(spark, tmp_path):
    """A state partitioned by the old to_json group hash must refuse
    to open rather than mis-prune reads."""
    import json
    import os

    import pytest

    table = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                                 key_col="url", n_buckets=4)
    table.merge(spark, _batch(spark, [(1, "u1", 0, "upsert", "a", 10)]),
                batch_id=0)
    MaterializedAggregate.create(
        str(tmp_path / "mv"), spark, table,
        group_cols=["source"], sum_cols=["n_chars"])
    cfg_path = os.path.join(str(tmp_path / "mv"), "mv.json")
    cfg = json.load(open(cfg_path))
    del cfg["gp_algo"]  # what a round-4 build wrote
    json.dump(cfg, open(cfg_path, "w"))
    with pytest.raises(ValueError, match="group-hash algo"):
        MaterializedAggregate(str(tmp_path / "mv"), table)


def test_minmax_incremental_with_retraction_rescan(spark, tmp_path):
    """MIN/MAX measures (VERDICT r4 Next #5): inserts advance them
    incrementally; deleting or updating away the current extremum of
    a group triggers a rescan of ONLY that group and the state equals
    a full recompute after every batch — including NULL measures,
    group migrations, and a group whose min and max coincide."""
    table = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                                 key_col="url", n_buckets=4)
    table.merge(spark, _batch(spark, [
        (1, "u1", 0, "upsert", "a", 10),
        (2, "u2", 0, "upsert", "a", 50),
        (3, "u3", 0, "upsert", "b", 30),
        (4, "u4", 0, "upsert", "b", None),  # NULL measure
    ]), batch_id=0)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), spark, table,
        group_cols=["source"], sum_cols=["n_chars"],
        min_cols=["n_chars"], max_cols=["n_chars"])

    def check():
        got = {(r["source"],): (r["n_rows"], r["min_n_chars"],
                                r["max_n_chars"])
               for r in mv.state(spark).collect()}
        want = {(r["source"],): (r["n"], r["mn"], r["mx"]) for r in
                table.read(spark).groupBy("source").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min("n_chars").alias("mn"),
                    F.max("n_chars").alias("mx")).collect()}
        assert got == want

    check()  # bootstrap
    batches = [
        # insert below current min, above current max (no rescan path)
        [(5, "u5", 1, "upsert", "a", 5), (6, "u6", 1, "upsert", "a", 99)],
        # delete the current min of 'a' (5) → rescan recovers 10
        [(7, "u5", 2, "delete", "a", None)],
        # re-upsert away the current max of 'a' (99 → 20): the CDF
        # reports an update = old-side retraction of the extremum +
        # a new insert in one event
        [(8, "u6", 3, "upsert", "a", 20)],
        # migrate u3 from b to a: b loses its only non-null row (min
        # and max both from the retracted row), a gains one
        [(9, "u3", 4, "upsert", "a", 30)],
        # delete a NULL-measure row (never an extremum)
        [(10, "u4", 5, "delete", "b", None)],
    ]
    for i, rows in enumerate(batches, start=1):
        table.merge(spark, _batch(spark, rows), batch_id=i)
        mv.refresh(spark)
        check()


def test_minmax_rescan_touches_same_partitions(spark, tmp_path):
    """The retraction rescan must not widen the rewritten state
    partitions: the flagged group is already in the delta, so the
    touched-gp set is identical with and without the rescan."""
    table = SnapshotTable.create(str(tmp_path / "t"), fields=FIELDS,
                                 key_col="url", n_buckets=4)
    seed = [(i, f"u{i}", 0, "upsert", f"s{i % 6}", i * 10)
            for i in range(1, 25)]
    table.merge(spark, _batch(spark, seed), batch_id=0)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), spark, table,
        group_cols=["source"], sum_cols=["n_chars"],
        min_cols=["n_chars"], max_cols=["n_chars"], n_state_parts=16)
    head0 = mv.applied_snapshot_id()
    full0 = set(mv.store._pmap(head0))
    # delete the global max row (s5 group's extremum, u24: 240)
    table.merge(spark, _batch(spark, [(30, "u24", 1, "delete", "s5", None)]),
                batch_id=1)
    head = mv.refresh(spark)
    touched = set(mv.store._pmap(head))
    # only the one group's partition rewritten — strict subset
    assert 0 < len(touched) < len(full0), (touched, full0)
    got = {(r["source"],): (r["min_n_chars"], r["max_n_chars"])
           for r in mv.state(spark).collect()}
    want = {(r["source"],): (r["mn"], r["mx"]) for r in
            table.read(spark).groupBy("source").agg(
                F.min("n_chars").alias("mn"),
                F.max("n_chars").alias("mx")).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# DistinctCountView: CDF-maintained per-group HLL distinct sketch
# ---------------------------------------------------------------------------

DV_FIELDS = [
    Field(1, "url", "string", False),
    Field(2, "warc_ts", "timestamp", False),
    Field(10, "source", "string", True),
    Field(11, "author", "string", True),
]


def _dv_batch(spark, rows):
    """rows: (seq, url, op, source, author)"""
    data = [(s, u, TS.to_pydatetime(), op, src, a)
            for (s, u, op, src, a) in rows]
    return spark.createDataFrame(
        data,
        "seq bigint, url string, warc_ts timestamp, op string,"
        " source string, author string",
    )


def _dv_check(dv, spark, table, p):
    """Maintained registers AND the estimate must be bit-identical to
    a from-scratch recompute over the live table."""
    from montandon_etl_spark.operators.sketches import (
        hll_distinct, hll_registers)

    got = {(r["source"], r["j"], r["mj"])
           for r in dv.state(spark).collect()}
    want = {(r["source"], r["j"], r["mj"]) for r in hll_registers(
        table.read(spark), ["source"], "author", p).collect()}
    assert got == want
    ge = {(r["source"],): r["est_distinct"]
          for r in dv.estimate(spark).collect()}
    we = {(r["source"],): r["est_distinct"] for r in hll_distinct(
        table.read(spark), "source", "author", p).collect()}
    assert ge == we


def _rank_of(value: str, p: int) -> tuple[int, int]:
    """Python twin of the register mapping: (j, rank)."""
    import hashlib

    m = 1 << p
    kmax = 61 - p
    h = int(hashlib.md5(value.encode()).hexdigest()[:15], 16)
    w = h // m
    return h % m, (kmax if w == 0 else kmax - w.bit_length())


def test_distinct_view_tracks_live_table(spark, tmp_path):
    """After ANY batch sequence — duplicate values, champion and
    non-champion deletes, group migration, NULL group, NULL value,
    value-changing updates — the register state equals hll_registers
    recomputed over the live table, and the estimate equals
    hll_distinct."""
    from montandon_etl_spark.lake.matview import DistinctCountView

    p = 4
    table = SnapshotTable.create(str(tmp_path / "t"), fields=DV_FIELDS,
                                 key_col="url", n_buckets=4)
    table.merge(spark, _dv_batch(spark, [
        (1, "u1", "upsert", "web", "alice"),
        (2, "u2", "upsert", "web", "bob"),
        (3, "u3", "upsert", "web", "alice"),   # duplicate value
        (4, "u4", "upsert", "pdf", "carol"),
        (5, "u5", "upsert", None, "dave"),     # NULL group is a group
        (6, "u6", "upsert", "pdf", None),      # NULL value ignored
    ]), batch_id=0)
    dv = DistinctCountView.create(str(tmp_path / "dv"), spark, table,
                                  group_cols=["source"],
                                  value_col="author", p=p)
    _dv_check(dv, spark, table, p)

    batches = [
        # new values + same-batch delete/re-insert of one value
        [(7, "u7", "upsert", "web", "erin"),
         (8, "u3", "delete", None, None),       # alice still on u1
         (9, "u8", "upsert", "pdf", "frank")],
        # delete the only holder of a value (register may retract)
        [(10, "u2", "delete", None, None)],
        # group migration: carol moves pdf→web
        [(11, "u4", "upsert", "web", "carol")],
        # value-changing update on an existing key
        [(12, "u1", "upsert", "web", "grace")],
        # empty a whole group: pdf loses its last valued row
        [(13, "u8", "delete", None, None)],
    ]
    for i, rows in enumerate(batches, start=1):
        table.merge(spark, _dv_batch(spark, rows), batch_id=i)
        dv.refresh(spark)
        _dv_check(dv, spark, table, p)
    # the emptied group carries no register rows
    srcs = {r["source"] for r in dv.state(spark).collect()}
    live_pdf = table.read(spark).filter(
        (F.col("source") == "pdf") & F.col("author").isNotNull()).count()
    assert live_pdf == 0 and "pdf" not in srcs


def test_distinct_view_below_max_delete_skips_rescan(spark, tmp_path):
    """A retraction whose (register, rank) sits STRICTLY BELOW the
    stored register max provably cannot change the sketch — refresh
    must not touch the live table at all (the bounded-fallback read
    only fires on a tie)."""
    from montandon_etl_spark.lake.matview import DistinctCountView

    p = 4
    # find two values in the same register with different ranks
    vals = [f"v{i}" for i in range(4000)]
    by_j = {}
    lo = hi = None
    for v in vals:
        j, r = _rank_of(v, p)
        if j in by_j and by_j[j][1] != r:
            (v0, r0) = by_j[j]
            lo, hi = ((v, v0) if r < r0 else (v0, v))
            break
        by_j.setdefault(j, (v, r))
    assert lo is not None
    table = SnapshotTable.create(str(tmp_path / "t"), fields=DV_FIELDS,
                                 key_col="url", n_buckets=4)
    table.merge(spark, _dv_batch(spark, [
        (1, "u1", "upsert", "web", lo),
        (2, "u2", "upsert", "web", hi),
    ]), batch_id=0)
    dv = DistinctCountView.create(str(tmp_path / "dv"), spark, table,
                                  group_cols=["source"],
                                  value_col="author", p=p)
    table.merge(spark, _dv_batch(spark, [(3, "u1", "delete", None, None)]),
                batch_id=1)

    # the rebuild path is the only caller of hll_registers inside
    # refresh() — spy on it (table.read can't be the probe: changes()
    # legitimately reads both snapshots to build the CDF)
    import montandon_etl_spark.operators.sketches as sk

    orig_reg = sk.hll_registers
    calls = {"n": 0}

    def spy(*a, **kw):
        calls["n"] += 1
        return orig_reg(*a, **kw)

    try:
        sk.hll_registers = spy
        dv.refresh(spark)
    finally:
        sk.hll_registers = orig_reg
    assert calls["n"] == 0, "below-max retraction must not rescan"
    _dv_check(dv, spark, table, p)

    # and the tie case DOES rescan (delete the champion)
    table.merge(spark, _dv_batch(spark, [(4, "u2", "delete", None, None)]),
                batch_id=2)
    try:
        sk.hll_registers = spy
        dv.refresh(spark)
    finally:
        sk.hll_registers = orig_reg
    assert calls["n"] > 0, "champion retraction must rescan its group"
    _dv_check(dv, spark, table, p)


def test_distinct_view_partition_pruning_and_idempotency(spark, tmp_path):
    """A one-group delta rewrites a strict subset of state partitions;
    a refresh at head is a no-op; a crashed-retry (version already
    committed) is a no-op."""
    from montandon_etl_spark.lake.matview import DistinctCountView

    p = 4
    table = SnapshotTable.create(str(tmp_path / "t"), fields=DV_FIELDS,
                                 key_col="url", n_buckets=4)
    seed = [(i, f"u{i}", "upsert", f"s{i % 12}", f"a{i % 37}")
            for i in range(1, 80)]
    table.merge(spark, _dv_batch(spark, seed), batch_id=0)
    dv = DistinctCountView.create(str(tmp_path / "dv"), spark, table,
                                  group_cols=["source"],
                                  value_col="author", p=p,
                                  n_state_parts=16)
    head0 = dv.applied_snapshot_id()
    full0 = set(dv.store._pmap(head0))
    table.merge(spark, _dv_batch(spark,
                                 [(100, "u100", "upsert", "s3", "zz")]),
                batch_id=1)
    head = dv.refresh(spark)
    touched = set(dv.store._pmap(head))
    assert 0 < len(touched) < len(full0), (touched, full0)
    _dv_check(dv, spark, table, p)
    assert dv.refresh(spark) == head  # at head → no-op
    # duplicate delivery: the committed version short-circuits
    assert head in dv.store.versions()
    assert dv.refresh(spark) == head
