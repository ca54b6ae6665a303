"""VersionedPartitionStore unit tests: fail-fast write guard
(ADVICE r3 #2) and manifest-cached resolution (VERDICT r3 Next #7)."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from montandon_etl_spark.lake.pstore import VersionedPartitionStore

SCHEMA = "id string, p int"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_write_guard_raises_on_stray_partition(spark, tmp_path):
    st = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    st.write(spark, _df(spark, [("a", 0), ("b", 1)]), 1, {0, 1}, SCHEMA)
    with pytest.raises(ValueError, match=r"outside the touched"):
        # row in partition 1 while only {0} is declared touched
        st.write(spark, _df(spark, [("c", 0), ("d", 1)]), 2, {0}, SCHEMA)
    # the torn version must not exist — store state is still v1
    assert st.versions() == [1]
    got = {(r["id"], r["p"]) for r in
           st.read(spark, SCHEMA, attach_part=True).collect()}
    assert got == {("a", 0), ("b", 1)}


def test_write_guard_raises_on_null_partition(spark, tmp_path):
    st = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    bad = _df(spark, [("a", 0)]).unionByName(
        spark.createDataFrame([("b", None)], SCHEMA))
    with pytest.raises(ValueError, match=r"outside the touched"):
        st.write(spark, bad, 1, {0}, SCHEMA)
    assert st.versions() == []


def test_manifest_written_and_resolution_needs_no_globs(spark, tmp_path):
    st = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    st.write(spark, _df(spark, [("a", 0), ("b", 1)]), 1, {0, 1}, SCHEMA)
    # tombstone partition 1 in v2
    st.write(spark, _df(spark, [("a2", 0)]), 2, {0, 1}, SCHEMA)
    mf = json.load(open(tmp_path / "s" / "v2" / "manifest.json"))
    assert mf["parts"] == {"0": True, "1": False}

    # a fresh instance resolves purely from manifests (there is no
    # glob fallback anymore — the module does not even import glob)
    import montandon_etl_spark.lake.pstore as pstore_mod
    assert not hasattr(pstore_mod, "glob")
    st2 = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    got = {(r["id"], r["p"]) for r in
           st2.read(spark, SCHEMA, attach_part=True).collect()}
    assert got == {("a2", 0)}  # partition 1 tombstoned, no stale "b"


def test_torn_write_is_uncommitted_and_retryable(spark, tmp_path):
    """ADVICE r4: the manifest is the commit point. A crash after the
    parquet _SUCCESS but before the tombstone/manifest stamp must
    leave the version UNCOMMITTED (so the previous generation's
    tombstones never resurface) and a caller's
    `version in versions()` idempotency check must re-run the write,
    which fully repairs the store."""
    st = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    st.write(spark, _df(spark, [("a", 0), ("b", 1)]), 1, {0, 1}, SCHEMA)
    # v2 empties partition 1 (tombstone) — simulate the crash window by
    # deleting what write() stamps after the parquet job finished
    st.write(spark, _df(spark, [("a2", 0)]), 2, {0, 1}, SCHEMA)
    os.remove(tmp_path / "s" / "v2" / "manifest.json")
    import shutil
    shutil.rmtree(tmp_path / "s" / "v2" / "p=1")
    assert os.path.exists(tmp_path / "s" / "v2" / "_SUCCESS")

    st2 = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    assert st2.versions() == [1]  # torn v2 is not committed
    got = {(r["id"], r["p"]) for r in
           st2.read(spark, SCHEMA, attach_part=True).collect()}
    assert got == {("a", 0), ("b", 1)}  # pre-crash state, no half-read
    # retry (caller sees 2 not in versions()) repairs everything
    st2.write(spark, _df(spark, [("a2", 0)]), 2, {0, 1}, SCHEMA)
    assert st2.versions() == [1, 2]
    got = {(r["id"], r["p"]) for r in
           st2.read(spark, SCHEMA, attach_part=True).collect()}
    assert got == {("a2", 0)}  # and the tombstone for p=1 holds


def test_below_version_and_gc_keep_previous_generation(spark, tmp_path):
    st = VersionedPartitionStore(str(tmp_path / "s"), "p", 2)
    st.write(spark, _df(spark, [("a", 0)]), 1, {0}, SCHEMA)
    st.write(spark, _df(spark, [("b", 1)]), 2, {1}, SCHEMA)
    st.write(spark, _df(spark, [("a3", 0)]), 3, {0}, SCHEMA)
    pre = {(r["id"],) for r in
           st.read(spark, SCHEMA, below_version=3).select("id").collect()}
    assert pre == {("a",), ("b",)}
    st.write(spark, _df(spark, [("a4", 0), ("b4", 1)]), 4, {0, 1}, SCHEMA)
    st.gc()
    # v1 superseded (v3/v4 rewrote 0) and older than newest two → gone;
    # v3 is the previous generation → retained
    assert st.versions() == [2, 3, 4] or st.versions() == [3, 4]
    assert 1 not in st.versions()
    got = {r["id"] for r in st.read(spark, SCHEMA).collect()}
    assert got == {"a4", "b4"}
