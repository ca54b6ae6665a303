"""DDL hardening (ADVICE r3 #1/#3/#4): poison in-band DDL frames
quarantine instead of wedging the stream; DDL-only batches advance the
epoch high-water mark; a matview pinned to a dropped field raises a
descriptive error."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.lake import SnapshotTable
from montandon_etl_spark.lake.matview import MaterializedAggregate
from montandon_etl_spark.oracle import replay_oracle
from tests.conftest import assert_state_equals_oracle
from montandon_etl_spark.sources import (
    embed_ddl_events,
    gen_changelog,
    write_changelog,
)
from montandon_etl_spark.sources.kafka import decode_json_changelog
from montandon_etl_spark.streaming import merge_microbatch, run_stream

DDL_CHANGELOG = ("seq bigint, url string, warc_ts timestamp, op string,"
                 " html binary, ddl string")


def _frame(spark, payloads):
    rows = [(b"k", json.dumps(p).encode(), "pages", 0, i, None)
            for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int,"
              " offset bigint, timestamp timestamp")


def test_kafka_decode_rejects_malformed_ddl_specs(spark):
    """A DDL frame whose spec is unparseable or lacks its op's required
    fields must FAIL decode_ok (quarantine), never reach the driver's
    apply loop."""
    cases = [
        # (payload, want_ok)
        ({"seq": 1, "op": "add_column",
          "ddl": json.dumps({"field": "x", "dtype": "string"})}, True),
        ({"seq": 2, "op": "rename_column",
          "ddl": json.dumps({"field": "x", "new_name": "y"})}, True),
        ({"seq": 3, "op": "drop_column",
          "ddl": json.dumps({"field": "x"})}, True),
        ({"seq": 4, "op": "add_column", "ddl": "{not json"}, False),
        ({"seq": 5, "op": "add_column",
          "ddl": json.dumps({"field": "x"})}, False),        # no dtype
        ({"seq": 6, "op": "rename_column",
          "ddl": json.dumps({"field": "x"})}, False),        # no new_name
        ({"seq": 7, "op": "widen_column",
          "ddl": json.dumps({"field": "x"})}, False),        # no dtype
        ({"seq": 8, "op": "add_column",
          "ddl": json.dumps({"field": "", "dtype": "string"})}, False),
        ({"seq": 9, "op": "add_column", "ddl": "42"}, False),  # non-object
        ({"seq": 10, "op": "add_column"}, False),              # ddl absent
    ]
    out = decode_json_changelog(_frame(spark, [c[0] for c in cases]))
    got = {r["seq"]: r["decode_ok"] for r in out.collect()}
    for payload, want in cases:
        assert got[payload["seq"]] == want, (payload, got[payload["seq"]])


def test_inband_poison_ddl_quarantines_stream_continues(spark, tmp_path):
    """File-source in-band stream: one poisoned DDL row (valid op,
    garbage spec) is diverted to quarantine_dir/ddl_epoch=N; every DML
    row still merges and the good DDL still applies."""
    log = gen_changelog(200, 80, seed=11, n_domains=6)
    mid = int(log["seq"].iloc[len(log) // 2])
    good_ddl = pd.DataFrame(
        [(mid, "add_column", "title", None, "string")],
        columns=["seq", "op", "field", "new_name", "dtype"])
    dml = log[~log.seq.isin([mid, mid + 1])].reset_index(drop=True)
    inband = embed_ddl_events(dml, good_ddl)
    # poison row: op says add_column, spec is not JSON
    poison = pd.DataFrame(
        [{"seq": mid + 1, "url": "ddl:poison",
          "warc_ts": inband.warc_ts.iloc[0], "op": "add_column",
          "html": None, "ddl": "{definitely not json"}])
    inband = (pd.concat([inband, poison], ignore_index=True)
              .sort_values("seq").reset_index(drop=True))
    log_dir = str(tmp_path / "changelog")
    write_changelog(inband, log_dir, n_chunks=4)

    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=8)
    qdir = str(tmp_path / "quarantine")
    q = run_stream(spark, table, log_dir, str(tmp_path / "ckpt"),
                   in_band_ddl=True, quarantine_dir=qdir)
    q.awaitTermination(300)

    got = table.read(spark).toPandas()
    assert "title" in got.columns  # good DDL applied
    assert_state_equals_oracle(
        got, replay_oracle(dml, good_ddl),
        value_cols=["warc_ts", "seq", "html", "text", "lang"])
    qdirs = [d for d in os.listdir(qdir) if d.startswith("ddl_epoch=")]
    assert qdirs, f"no ddl quarantine dir under {qdir}"
    qrows = spark.read.parquet(*[os.path.join(qdir, d) for d in qdirs])
    assert [r["seq"] for r in qrows.collect()] == [mid + 1]


def test_poison_ddl_without_quarantine_raises_descriptively(spark, tmp_path):
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    batch = spark.createDataFrame(
        [(1, "ddl:x", pd.Timestamp("2024-01-01").to_pydatetime(),
          "add_column", None, "{bad")], DDL_CHANGELOG)
    with pytest.raises(ValueError, match="malformed in-band DDL"):
        merge_microbatch(spark, table, batch, batch_id=0)


def test_ddl_only_batch_advances_batch_high_water(spark, tmp_path):
    """rename A→B (epoch 0), rename B→A (epoch 1), then REDELIVER
    epoch 0: schema-inference would see 'lang exists' and re-apply the
    first rename; the committed batch id must catch it instead."""
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    ts = pd.Timestamp("2024-01-01").to_pydatetime()

    def ddl_batch(seq, field, new_name):
        return spark.createDataFrame(
            [(seq, f"ddl:{field}", ts, "rename_column", None,
              json.dumps({"field": field, "new_name": new_name}))],
            DDL_CHANGELOG)

    b0 = ddl_batch(1, "lang", "language")
    merge_microbatch(spark, table, b0, batch_id=0)
    assert table.snapshot()["committed_max_batch_id"] == 0
    merge_microbatch(spark, table, ddl_batch(2, "language", "lang"),
                     batch_id=1)
    assert table.snapshot()["committed_max_batch_id"] == 1
    names0 = {f.name for f in table.user_fields()}
    assert "lang" in names0 and "language" not in names0

    merge_microbatch(spark, table, b0, batch_id=0)  # redelivery
    names1 = {f.name for f in table.user_fields()}
    assert names1 == names0, "redelivered DDL-only epoch re-applied"


def test_ddl_only_all_applied_still_commits_epoch(spark, tmp_path):
    """A DDL-only epoch whose DDLs are ALL already applied (same DDL
    arrived twice under different seqs) records an empty commit so the
    epoch never reprocesses."""
    table = SnapshotTable.create(str(tmp_path / "pages"), n_buckets=4)
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    spec = json.dumps({"field": "title", "dtype": "string"})
    b0 = spark.createDataFrame(
        [(1, "ddl:title", ts, "add_column", None, spec)], DDL_CHANGELOG)
    merge_microbatch(spark, table, b0, batch_id=0)
    # same DDL again, new seq, next epoch → nothing pending, but the
    # epoch must still advance the high-water mark
    b1 = spark.createDataFrame(
        [(2, "ddl:title", ts, "add_column", None, spec)], DDL_CHANGELOG)
    merge_microbatch(spark, table, b1, batch_id=1)
    assert table.snapshot()["committed_max_batch_id"] == 1
    assert table.snapshot()["type"] == "noop"


def test_matview_dropped_pinned_field_raises_descriptively(spark, tmp_path):
    from montandon_etl_spark.lake.format import Field
    table = SnapshotTable.create(
        str(tmp_path / "t"),
        fields=[Field(1, "url", "string", False),
                Field(2, "warc_ts", "timestamp", False),
                Field(3, "grp", "string", True),
                Field(4, "val", "double", True)],
        key_col="url", n_buckets=4)
    ts = pd.Timestamp("2024-01-01").to_pydatetime()
    batch = spark.createDataFrame(
        [(1, "u/1", ts, "upsert", "a", 1.0)],
        "seq bigint, url string, warc_ts timestamp, op string,"
        " grp string, val double")
    table.merge(spark, batch, batch_id=0)
    mv = MaterializedAggregate.create(
        str(tmp_path / "mv"), spark, table, ["grp"], ["val"])
    table.apply_ddl("drop_column", "val")
    with pytest.raises(ValueError, match="re-create"):
        mv.refresh(spark)
