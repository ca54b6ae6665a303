"""Watermarked stream-stream interval join (request/response shape)."""

from __future__ import annotations

import pandas as pd
import pytest

from montandon_etl_spark.streaming.stateful import stream_stream_join

REQ_SCHEMA = "user_id bigint, req_id bigint, req_ts timestamp"
RSP_SCHEMA = "user_id bigint, rsp_id bigint, rsp_ts timestamp, status string"


def _write(spark, pdf, schema, path):
    rows = [
        tuple(v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
              for v in r)
        for r in pdf.itertuples(index=False)
    ]
    spark.createDataFrame(rows, schema).repartition(2) \
        .write.mode("overwrite").parquet(path)


def _fixture():
    t0 = pd.Timestamp("2024-06-01 00:00:00")
    reqs, rsps = [], []
    for u in range(20):
        for i in range(3):
            reqs.append((u, u * 10 + i, t0 + pd.Timedelta(minutes=u * 7 + i * 11)))
    for u in range(20):
        for j in range(4):
            rsps.append((u, u * 100 + j,
                         t0 + pd.Timedelta(minutes=u * 7 + j * 9 + 2),
                         "ok" if j % 3 else "err"))
    # requests with no response at all (the unmatched-left cases)
    for u in range(900, 906):
        reqs.append((u, u, t0 + pd.Timedelta(minutes=u - 880)))
    # and one whose only response misses the 10-minute bound
    reqs.append((950, 950, t0))
    rsps.append((950, 9500, t0 + pd.Timedelta(minutes=25), "ok"))
    # a far-future sentinel on both sides advances the watermark past
    # every real event so leftOuter can prove no-match
    reqs.append((999, 9999, t0 + pd.Timedelta(days=30)))
    rsps.append((999, 99999, t0 + pd.Timedelta(days=30), "ok"))
    req = pd.DataFrame(reqs, columns=["user_id", "req_id", "req_ts"])
    rsp = pd.DataFrame(rsps, columns=["user_id", "rsp_id", "rsp_ts", "status"])
    return req, rsp


def _batch_oracle(spark, req_dir, rsp_dir, how):
    req = spark.read.parquet(req_dir).alias("l")
    rsp = spark.read.parquet(rsp_dir).alias("r")
    from pyspark.sql import functions as F

    cond = ((F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.rsp_ts") >= F.col("l.req_ts"))
            & (F.col("r.rsp_ts") <= F.col("l.req_ts")
               + F.expr("INTERVAL 10 minutes")))
    return (req.join(rsp, cond, how)
            .select("l.user_id", "req_id", "req_ts", "rsp_id", "rsp_ts",
                    "status").toPandas())


def _run_stream(spark, req_dir, rsp_dir, how, name):
    lq = spark.readStream.schema(REQ_SCHEMA).parquet(req_dir)
    rq = spark.readStream.schema(RSP_SCHEMA).parquet(rsp_dir)
    out = stream_stream_join(
        lq, rq, key="user_id", left_ts="req_ts", right_ts="rsp_ts",
        watermark="5 minutes", max_delay="10 minutes", how=how)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def _key(df):
    return sorted(
        (int(r.user_id), int(r.req_id),
         -1 if pd.isna(r.rsp_id) else int(r.rsp_id))
        for r in df.itertuples())


def test_inner_join_matches_batch(spark, tmp_path):
    req, rsp = _fixture()
    rd, sd = str(tmp_path / "req"), str(tmp_path / "rsp")
    _write(spark, req, REQ_SCHEMA, rd)
    _write(spark, rsp, RSP_SCHEMA, sd)
    got = _run_stream(spark, rd, sd, "inner", "ssj_inner")
    want = _batch_oracle(spark, rd, sd, "inner")
    assert len(want) > 0
    assert _key(got) == _key(want)


def test_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    req, rsp = _fixture()
    rd, sd = str(tmp_path / "reqo"), str(tmp_path / "rspo")
    _write(spark, req, REQ_SCHEMA, rd)
    _write(spark, rsp, RSP_SCHEMA, sd)
    got = _run_stream(spark, rd, sd, "leftOuter", "ssj_outer")
    want = _batch_oracle(spark, rd, sd, "leftOuter")
    # matched rows must be exactly the batch matches
    assert _key(got[got.rsp_id.notna()]) == _key(want[want.rsp_id.notna()])
    # the sentinel advanced the watermark past every real event, so
    # every real unmatched request must have emitted its NULL row
    real_want = want[(want.user_id != 999) & want.rsp_id.isna()]
    real_got = got[(got.user_id != 999) & got.rsp_id.isna()]
    assert len(real_want) >= 7  # six no-response users + the late one
    assert len(real_want) > 0
    assert _key(real_got) == _key(real_want)


def test_collision_and_how_validation(spark):
    l = spark.createDataFrame([], "user_id bigint, ts timestamp, x int")
    r = spark.createDataFrame([], "user_id bigint, ts2 timestamp, x int")
    with pytest.raises(ValueError, match="collision"):
        stream_stream_join(l, r, "user_id", "ts", "ts2")
    r2 = spark.createDataFrame([], "user_id bigint, ts2 timestamp, y int")
    with pytest.raises(ValueError, match="how"):
        stream_stream_join(l, r2, "user_id", "ts", "ts2", how="full")
