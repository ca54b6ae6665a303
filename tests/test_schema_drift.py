"""Schema-drift detection (operators/schema_drift.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from montandon_etl_spark.operators.schema_drift import (
    drift_ddl_frames,
    schema_drift_report,
)

DECLARED = {"seq": "bigint", "url": "string", "score": "double",
            "legacy_id": "bigint"}


def _fixture(spark):
    rows = [
        '{"seq": 1, "url": "https://a", "score": 1.5}',
        '{"seq": 2, "url": "https://b", "score": 2}',      # int promotes
        '{"seq": 3, "url": "https://c", "flags": true}',   # new bool key
        '{"seq": "x4", "url": "https://d"}',               # seq drifts
        '{"seq": 5, "meta": {"a":1}, "tags": [1,2]}',      # new obj/arr
        '{"seq": 6, "url": null}',
        "{broken",                                          # corrupt
        "{}",                                               # empty
    ]
    return spark.createDataFrame([(r,) for r in rows], "payload string")


def test_report_counts_and_statuses(spark):
    rep = schema_drift_report(_fixture(spark), "payload", DECLARED)
    by = {r["key"]: r.asDict() for r in rep.collect()}
    assert by["seq"]["n_obs"] == 6 and by["seq"]["n_int"] == 5
    assert by["seq"]["n_str"] == 1  # the non-numeral "x4"
    assert by["seq"]["inferred"] == "string"
    assert by["seq"]["status"] == "drift"
    assert by["url"]["status"] == "ok" and by["url"]["n_null"] == 1
    assert by["score"]["inferred"] == "double"  # 1.5 + int 2 promote
    assert by["score"]["status"] == "ok"
    assert by["flags"]["inferred"] == "boolean"
    assert by["flags"]["status"] == "new"
    assert by["meta"]["inferred"] == "object"
    assert by["tags"]["inferred"] == "array"
    assert by["legacy_id"]["status"] == "missing"
    assert by["legacy_id"]["n_obs"] == 0
    assert by["_corrupt"]["n_obs"] == 1
    assert by["_empty"]["n_obs"] == 1
    assert by["_corrupt"]["status"] == by["_empty"]["status"] == "payload"
    assert len(by) == 9


def test_all_null_key_infers_null(spark):
    df = spark.createDataFrame([('{"x": null}',), ('{"x": null}',)],
                               "payload string")
    rep = schema_drift_report(df, "payload", {}).collect()
    row = {r["key"]: r for r in rep}["x"]
    assert row["inferred"] == "null" and row["status"] == "new"


def test_ddl_frames_vocabulary(spark):
    df = spark.createDataFrame([(json.dumps(
        {"seq": 1, "known_int": 2, "nn": 7, "nd": 0.5, "ns": "t",
         "nb": True, "nest": {"a": 1}}),),
        (json.dumps({"seq": 2, "known_int": 2.5}),)], "payload string")
    rep = schema_drift_report(df, "payload",
                              {"seq": "bigint", "known_int": "bigint"})
    ddl = {r["key"]: r.asDict() for r in drift_ddl_frames(rep).collect()}
    # new scalar keys -> add_column with elected dtype
    for k, t in [("nn", "bigint"), ("nd", "double"), ("ns", "string"),
                 ("nb", "boolean")]:
        assert ddl[k]["op"] == "add_column"
        assert json.loads(ddl[k]["ddl"]) == {"field": k, "dtype": t}
    # bigint -> double drift is a widen proposal
    assert ddl["known_int"]["op"] == "widen_column"
    # structural drift needs a human
    assert ddl["nest"]["op"] == "review" and ddl["nest"]["ddl"] is None
    # ok rows emit nothing
    assert "seq" not in ddl


def test_ddl_frame_passes_decoder_gate(spark):
    """An add_column frame the detector proposes must satisfy the
    ingest decoder's DDL-spec validity predicate."""
    from montandon_etl_spark.sources.kafka import decode_json_changelog

    df = spark.createDataFrame([('{"seq": 1, "brand_new": 3}',)],
                               "payload string")
    rep = schema_drift_report(df, "payload", {"seq": "bigint"})
    frame = drift_ddl_frames(rep).where("key = 'brand_new'").first()
    msg = json.dumps({"seq": 99, "url": None, "warc_ts_us": None,
                      "op": "add_column", "ddl": frame["ddl"]})
    decoded = decode_json_changelog(
        spark.createDataFrame([(msg.encode(),)], "value binary"))
    row = decoded.first()
    assert row["decode_ok"] is True and row["op"] == "add_column"


def test_report_is_one_shuffle(spark):
    """Plan shape: declared keys ride the aggregation as seed rows,
    so the report is ONE exchange and ZERO joins."""
    rep = schema_drift_report(_fixture(spark), "payload", DECLARED)
    plan = rep._sc._jvm.PythonSQLUtils.explainString(
        rep._jdf.queryExecution(), "formatted")
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan
