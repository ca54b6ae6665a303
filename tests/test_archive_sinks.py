"""Zip source fan-out + external sink retry/idempotency-key semantics."""

from __future__ import annotations

import glob
import io
import json
import os
import zipfile

import pytest

from montandon_etl_spark.sources.archive import unzip_members
from montandon_etl_spark.streaming.sinks import deliver_batch, with_idempotency_key


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in members.items():
            zf.writestr(name, content)
    return buf.getvalue()


def test_unzip_members_fanout_and_filter(spark):
    z1 = _zip_bytes({"a.xml": b"<x/>", "b.txt": b"hi", "dir/c.xml": b"<y/>"})
    df = spark.createDataFrame(
        [(1, z1), (2, b"not a zip"), (3, None)], "id long, blob binary"
    )
    out = unzip_members(df, "id", "blob").toPandas()
    assert len(out) == 3 and set(out["member_name"]) == {"a.xml", "b.txt", "dir/c.xml"}
    xml_only = unzip_members(df, "id", "blob", name_filter=".xml").toPandas()
    assert len(xml_only) == 2
    assert bytes(xml_only.sort_values("member_name")["content"].iloc[0]) == b"<x/>"


def test_idempotency_key_deterministic_and_content_derived(spark):
    df = spark.createDataFrame(
        [("u1", 1, 10), ("u1", 1, 11), ("u2", 1, 10)], "url string, warc_ts long, seq long"
    )
    a = with_idempotency_key(df, ["url", "warc_ts", "seq"]).toPandas()
    b = with_idempotency_key(df, ["url", "warc_ts", "seq"]).toPandas()
    assert sorted(a["etl_id"]) == sorted(b["etl_id"])  # replayable (not uuid4)
    assert a["etl_id"].nunique() == 3  # distinct content → distinct keys


def test_deliver_batch_retries_then_succeeds(spark, tmp_path):
    """Transport fails on first attempt per chunk, succeeds on retry —
    bounded-retry semantics (reference: max 3 retries, 5 s delay)."""
    out_dir = str(tmp_path / "delivered")
    os.makedirs(out_dir)
    flag_dir = str(tmp_path / "flags")
    os.makedirs(flag_dir)

    def transport(chunk: list[dict]) -> None:
        key = chunk[0]["etl_id"][:16]
        flag = os.path.join(flag_dir, key)
        if not os.path.exists(flag):
            open(flag, "w").write("x")
            raise RuntimeError("transient failure")
        with open(os.path.join(out_dir, f"{key}.json"), "w") as f:
            json.dump(chunk, f)

    df = spark.createDataFrame(
        [(f"https://x/{i}", i, i) for i in range(20)],
        "url string, warc_ts long, seq long",
    ).repartition(2)
    deliver_batch(df, transport, key_cols=["url", "warc_ts", "seq"],
                  max_retries=2, retry_delay_s=0.01, chunk_size=7)
    delivered = []
    for p in glob.glob(os.path.join(out_dir, "*.json")):
        delivered.extend(json.load(open(p)))
    assert len(delivered) == 20
    assert len({d["etl_id"] for d in delivered}) == 20


def test_deliver_batch_exhausted_retries_raises(spark, tmp_path):
    def transport(chunk):
        raise RuntimeError("endpoint down")

    df = spark.createDataFrame([("u", 1, 1)], "url string, warc_ts long, seq long")
    with pytest.raises(Exception, match="endpoint down|RuntimeError|Python"):
        deliver_batch(df, transport, max_retries=1, retry_delay_s=0.01)
