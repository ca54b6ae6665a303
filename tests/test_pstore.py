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

    # a fresh instance resolves purely from manifests: break the glob
    # fallback by asserting _pmap never globs (monkeypatch glob.glob)
    st2 = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    import montandon_etl_spark.lake.pstore as pstore_mod
    orig = pstore_mod.glob.glob
    calls = []
    pstore_mod.glob.glob = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
    try:
        got = {(r["id"], r["p"]) for r in
               st2.read(spark, SCHEMA, attach_part=True).collect()}
    finally:
        pstore_mod.glob.glob = orig
    assert got == {("a2", 0)}  # partition 1 tombstoned, no stale "b"
    assert calls == []  # resolution used manifests only


def test_fallback_glob_for_manifestless_version(spark, tmp_path):
    st = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    st.write(spark, _df(spark, [("a", 0), ("b", 2)]), 1, {0, 2}, SCHEMA)
    os.remove(tmp_path / "s" / "v1" / "manifest.json")  # pre-manifest store
    st2 = VersionedPartitionStore(str(tmp_path / "s"), "p", 4)
    got = {(r["id"], r["p"]) for r in
           st2.read(spark, SCHEMA, attach_part=True).collect()}
    assert got == {("a", 0), ("b", 2)}
    # and the fallback result is memoized (second read, no new state)
    assert st2._pmaps[1] == {0: True, 2: True}


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
