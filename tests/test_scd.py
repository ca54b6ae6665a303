"""CDC history reshapes: SCD2 intervals, log compaction (with the
replay-equivalence pin against the lake's MERGE), column churn."""
from __future__ import annotations

import datetime as dt

from montandon_etl_spark.operators.scd import (
    column_churn,
    compact_changelog,
    scd2_history,
)

T = [dt.datetime(2024, 1, 1, 0, 0, m) for m in range(10)]
SCHEMA = "k bigint, ts timestamp, seq bigint, v string, op string"


def test_scd2_intervals_tombstone_and_versions(spark):
    rows = [
        (1, T[0], 0, "a", "upsert"),
        (1, T[2], 1, "b", "upsert"),
        (1, T[4], 2, None, "delete"),   # closes b, emits nothing
        (1, T[6], 3, "c", "upsert"),    # reinsert after a hole
        (2, T[1], 4, "x", "upsert"),
    ]
    out = scd2_history(spark.createDataFrame(rows, SCHEMA),
                       "k", ["ts", "seq"], op_col="op")
    got = {(r["k"], r["version"]): r for r in out.collect()}
    # key 1: a valid [T0, T2), b valid [T2, T4) closed BY the delete,
    # c valid [T6, None) current; the tombstone consumed version 3
    assert set(got) == {(1, 1), (1, 2), (1, 4), (2, 1)}
    assert got[(1, 1)]["valid_to"] == T[2] and not got[(1, 1)]["is_current"]
    assert got[(1, 2)]["valid_to"] == T[4] and not got[(1, 2)]["is_current"]
    assert got[(1, 4)]["valid_to"] is None and got[(1, 4)]["is_current"]
    assert got[(2, 1)]["is_current"]


def test_scd2_deleted_key_has_no_current_row(spark):
    rows = [(1, T[0], 0, "a", "upsert"), (1, T[1], 1, None, "delete")]
    out = scd2_history(spark.createDataFrame(rows, SCHEMA),
                       "k", ["ts", "seq"], op_col="op").collect()
    assert len(out) == 1
    assert out[0]["valid_to"] == T[1] and not out[0]["is_current"]


def test_compaction_keeps_latest_and_tombstones(spark):
    rows = [
        (1, T[0], 0, "a", "upsert"),
        (1, T[1], 1, "b", "upsert"),
        (2, T[0], 2, "x", "upsert"),
        (2, T[3], 3, None, "delete"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["k"]: r for r in compact_changelog(
        df, "k", ["ts", "seq"], op_col="op").collect()}
    assert got[1]["v"] == "b" and got[1]["op"] == "upsert"
    assert got[2]["op"] == "delete"  # trailing tombstone retained
    cleaned = compact_changelog(df, "k", ["ts", "seq"], op_col="op",
                                retain_tombstones=False).collect()
    assert {r["k"] for r in cleaned} == {1}


def test_compaction_replay_equivalence_through_lake_merge(tmp_path, spark):
    """THE compaction contract: merging the compacted changelog into a
    fresh table produces byte-identical state to merging the full log."""
    from montandon_etl_spark.lake.table import SnapshotTable
    from montandon_etl_spark.sources.changelog import (
        gen_changelog,
        write_changelog,
    )
    from montandon_etl_spark.streaming.pipeline import (
        CHANGELOG_SPARK_SCHEMA,
        merge_microbatch,
    )

    log = gen_changelog(n_events=800, n_urls=150, seed=11, n_domains=20)
    write_changelog(log, str(tmp_path / "chg"), n_chunks=1)
    full = spark.read.schema(CHANGELOG_SPARK_SCHEMA).parquet(
        str(tmp_path / "chg"))
    compacted = compact_changelog(full, "url", ["warc_ts", "seq"],
                                  op_col="op")
    assert compacted.count() < full.count()

    t_full = SnapshotTable.create(str(tmp_path / "full"), n_buckets=4)
    merge_microbatch(spark, t_full, full, batch_id=0)
    t_cmp = SnapshotTable.create(str(tmp_path / "cmp"), n_buckets=4)
    merge_microbatch(spark, t_cmp, compacted.select(*full.columns),
                     batch_id=0)

    a = t_full.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    b = t_cmp.read(spark).toPandas().sort_values("url").reset_index(drop=True)
    assert list(a["url"]) == list(b["url"])
    for c in a.columns:
        assert all(x == y or (x != x and y != y)
                   for x, y in zip(a[c], b[c])), c


def test_column_churn_counts_nullsafe(spark):
    rows = [
        # key 1: v changes a->a (no), a->b (yes), b->NULL (yes)
        (1, T[0], 0, "a", "upsert"),
        (1, T[1], 1, "a", "upsert"),
        (1, T[2], 2, "b", "upsert"),
        (1, T[3], 3, None, "upsert"),
        # key 2: single event, no transitions
        (2, T[0], 4, "z", "upsert"),
    ]
    out = {r["col_name"]: r for r in column_churn(
        spark.createDataFrame(rows, SCHEMA),
        "k", ["ts", "seq"], ["v", "op"]).collect()}
    assert out["v"]["n_transitions"] == 3
    assert out["v"]["n_changes"] == 2
    assert out["v"]["churn_pct"] == 66
    assert out["op"]["n_changes"] == 0 and out["op"]["churn_pct"] == 0


def test_temporal_join_exactly_one_version_per_fact(spark):
    from montandon_etl_spark.operators.scd import temporal_join

    hist = scd2_history(
        spark.createDataFrame(
            [(1, T[0], 0, "v1", "upsert"), (1, T[4], 1, "v2", "upsert"),
             (1, T[6], 2, None, "delete"), (1, T[8], 3, "v3", "upsert")],
            SCHEMA),
        "k", ["ts", "seq"], op_col="op")
    facts = spark.createDataFrame(
        [(10, 1, T[1]), (11, 1, T[4]),   # inside v1; exactly at v2 start
         (12, 1, T[7]),                  # inside the deletion hole
         (13, 1, T[9]),                  # current version
         (14, 2, T[1])],                 # unknown key
        "fid bigint, k bigint, ts timestamp")
    got = {r["fid"]: r for r in temporal_join(
        facts, hist.select("k", "v", "valid_from", "valid_to"),
        "k", "ts").collect()}
    assert got[10]["dim_v"] == "v1"
    assert got[11]["dim_v"] == "v2"   # boundary ts joins the NEW version
    assert 12 not in got              # deletion hole: no dimension
    assert got[13]["dim_v"] == "v3"
    assert 14 not in got
    left = temporal_join(
        facts, hist.select("k", "v", "valid_from", "valid_to"),
        "k", "ts", how="left").collect()
    assert len(left) == 5             # NULL-padded instead of dropped
    assert sum(1 for r in left if r["dim_v"] is None) == 2
