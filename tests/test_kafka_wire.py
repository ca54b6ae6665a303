"""Kafka RecordBatch v2 wire format (sources/kafka_wire.py).

No third-party Kafka/codec lib exists in this container, so the pins
are (a) the public CRC32C known-answer vector, (b) hand-assembled
byte-layout checks against the protocol spec's field table, and
(c) randomized round-trips through every codec path.
"""

from __future__ import annotations

import random
import struct

import pytest

from montandon_etl_spark.sources.kafka_wire import (
    crc32c,
    decode_record_batches,
    encode_record_batch,
    segment_records,
    xerial_frame,
    xerial_unframe,
)


def test_crc32c_known_answers():
    # the classic check value for CRC-32/ISCSI
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 zero bytes — second public vector (RFC 3720 B.4)
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(bytes([0xFF]) * 32) == 0x62A8AB43


def test_xerial_roundtrip_and_raw_fallback():
    data = b"the quick brown fox " * 4000
    framed = xerial_frame(data, chunk=8 << 10)
    assert framed.startswith(b"\x82SNAPPY\x00")
    assert xerial_unframe(framed) == data
    # some producers ship raw snappy blocks without the stream header
    from montandon_etl_spark.sources.snappy import snappy_compress
    assert xerial_unframe(snappy_compress(data)) == data


def _mk_records(n, seed=0):
    rng = random.Random(seed)
    recs = []
    for i in range(n):
        key = None if i % 5 == 4 else f"k{i}".encode()
        value = (None if i % 7 == 6
                 else rng.randbytes(rng.randrange(0, 400)) * rng.randrange(1, 4))
        headers = []
        if i % 3 == 0:
            headers = [("trace", f"t-{i}".encode()), ("tomb", None)]
        recs.append({"timestamp": 1_700_000_000_000 + i * 13,
                     "key": key, "value": value, "headers": headers})
    return recs


@pytest.mark.parametrize("codec", ["none", "gzip", "snappy", "lz4",
                                   "zstd"])
def test_batch_roundtrip_all_codecs(codec):
    recs = _mk_records(40, seed=hash(codec) & 0xFFFF)
    blob = encode_record_batch(recs, base_offset=1000, codec=codec)
    got = list(decode_record_batches(blob))
    assert [g["offset"] for g in got] == list(range(1000, 1040))
    for g, r in zip(got, recs):
        assert g["timestamp"] == r["timestamp"]
        assert g["key"] == r["key"]
        assert g["value"] == r["value"]
        assert g["headers"] == r["headers"]


def test_header_layout_matches_spec():
    """Hand-unpack the fixed header per the protocol field table."""
    recs = [{"timestamp": 123456, "key": b"k", "value": b"v",
             "headers": []}]
    blob = encode_record_batch(recs, base_offset=7, codec="none",
                               partition_leader_epoch=3)
    base_offset, batch_len = struct.unpack_from(">qi", blob, 0)
    assert base_offset == 7
    assert 12 + batch_len == len(blob)  # length excludes first 12 bytes
    leader_epoch, magic = struct.unpack_from(">ib", blob, 12)
    assert (leader_epoch, magic) == (3, 2)
    crc = struct.unpack_from(">I", blob, 17)[0]
    assert crc == crc32c(blob[21:])  # covers attributes..end
    (attrs, last_delta, base_ts, max_ts, pid, pep, bseq,
     count) = struct.unpack_from(">hiqqqhii", blob, 21)
    assert attrs == 0 and last_delta == 0 and count == 1
    assert base_ts == max_ts == 123456
    assert (pid, pep, bseq) == (-1, -1, -1)


def test_segment_concatenation_and_offsets():
    b1 = encode_record_batch(_mk_records(3), base_offset=0, codec="lz4")
    b2 = encode_record_batch(_mk_records(5, seed=1), base_offset=3,
                             codec="gzip")
    got = list(decode_record_batches(b1 + b2))
    assert [g["offset"] for g in got] == list(range(8))


def test_crc_corruption_detected():
    blob = bytearray(encode_record_batch(_mk_records(4), codec="none"))
    blob[-1] ^= 0x01  # flip a record byte; crc must catch it
    with pytest.raises(ValueError, match="crc mismatch"):
        list(decode_record_batches(bytes(blob)))
    ok = bytes(blob)
    assert len(list(decode_record_batches(ok, verify_crc=False))) == 4


def test_bad_magic_and_unknown_codec():
    blob = bytearray(encode_record_batch(_mk_records(2), codec="none"))
    blob[16] = 1  # magic v1
    with pytest.raises(ValueError, match="magic"):
        list(decode_record_batches(bytes(blob)))
    with pytest.raises(ValueError, match="unsupported codec"):
        encode_record_batch(_mk_records(2), codec="brotli")
    # codec bits 5+ are unassigned in the protocol: decode must refuse
    blob2 = bytearray(encode_record_batch(_mk_records(2), codec="none"))
    attrs = struct.unpack_from(">h", blob2, 21)[0]
    struct.pack_into(">h", blob2, 21, attrs | 5)
    struct.pack_into(">I", blob2, 17, crc32c(bytes(blob2[21:])))
    with pytest.raises(ValueError, match="unknown codec"):
        list(decode_record_batches(bytes(blob2)))


def test_control_batch_skipped_but_crc_checked():
    ctrl = encode_record_batch(
        [{"timestamp": 1, "key": struct.pack(">hh", 0, 1), "value": b""}],
        base_offset=50, control=True)
    data = encode_record_batch(_mk_records(2), base_offset=51)
    got = list(decode_record_batches(ctrl + data))
    assert [g["offset"] for g in got] == [51, 52]
    bad = bytearray(ctrl)
    bad[-1] ^= 1
    with pytest.raises(ValueError, match="crc"):
        list(decode_record_batches(bytes(bad) + data))


def test_log_append_time_resolution():
    recs = _mk_records(4)
    blob = bytearray(encode_record_batch(recs, codec="none"))
    attrs = struct.unpack_from(">h", blob, 21)[0]
    struct.pack_into(">h", blob, 21, attrs | 0x08)  # logAppendTime
    struct.pack_into(">I", blob, 17, crc32c(bytes(blob[21:])))
    got = list(decode_record_batches(bytes(blob)))
    max_ts = max(r["timestamp"] for r in recs)
    assert all(g["timestamp"] == max_ts for g in got)


def test_varint_continuation_paths():
    """Lengths > 127 exercise multi-byte zigzag varints everywhere."""
    recs = [{"timestamp": 1_700_000_000_000 + i,
             "key": bytes([i & 0xFF]) * 200,
             "value": bytes([(i * 7) & 0xFF]) * 5000,
             "headers": [("h" * 70, b"x" * 300)]}
            for i in range(3)]
    blob = encode_record_batch(recs, codec="snappy")
    got = list(decode_record_batches(blob))
    assert [len(g["value"]) for g in got] == [5000] * 3
    assert got[0]["headers"][0] == ("h" * 70, b"x" * 300)


def test_randomized_roundtrip_dense():
    rng = random.Random(42)
    for trial in range(20):
        n = rng.randrange(1, 60)
        recs = _mk_records(n, seed=trial)
        codec = ["none", "gzip", "snappy", "lz4"][trial % 4]
        base = rng.randrange(0, 1 << 40)
        blob = encode_record_batch(recs, base_offset=base, codec=codec,
                                   producer_id=trial, base_sequence=trial)
        got = list(decode_record_batches(blob))
        assert len(got) == n
        assert got[-1]["offset"] == base + n - 1
        assert all(g["value"] == r["value"] for g, r in zip(got, recs))


# ---------------------------------------------------------------- spark ----
def test_segment_records_spark(spark, tmp_path):
    import pandas as pd

    segs = []
    off = 0
    for s in range(6):
        recs = [{"timestamp": 1_700_000_000_000 + off + i,
                 "key": f"k{off + i}".encode(),
                 "value": f'{{"n": {off + i}}}'.encode()}
                for i in range(10)]
        segs.append(encode_record_batch(
            recs, base_offset=off, codec=["none", "gzip", "snappy",
                                          "lz4", "zstd"][s % 5]))
        off += 10
    df = spark.createDataFrame([(bytearray(b),) for b in segs],
                               "segment binary")
    out = segment_records(df).toPandas().sort_values("offset")
    assert list(out["offset"]) == list(range(60))
    assert out["value"].iloc[5] == b'{"n": 5}'
    assert out["timestamp"].iloc[59] == 1_700_000_000_000 + 59


def test_kafka_segment_dir_source_json_dialect(spark, tmp_path):
    """Segment dump → record decode → JSON changelog dialect, end to
    end through the same decode tree the live stream uses."""
    import json

    from montandon_etl_spark.sources.kafka_wire import (
        kafka_segment_dir_source,
    )

    segdir = tmp_path / "segments"
    segdir.mkdir()
    events = []
    for i in range(30):
        v = {"seq": i, "url": f"https://ex.org/{i}",
             "warc_ts_us": 1_000_000 + i,
             "op": "delete" if i % 9 == 8 else "upsert"}
        if v["op"] == "upsert":
            import base64
            v["html_b64"] = base64.b64encode(f"<p>{i}</p>".encode()).decode()
        events.append(v)
    for part in range(3):
        recs = [{"timestamp": 1_700_000_000_000 + e["seq"],
                 "key": e["url"].encode(),
                 "value": json.dumps(e).encode()}
                for e in events[part * 10:(part + 1) * 10]]
        blob = encode_record_batch(recs, base_offset=part * 10,
                                   codec=["lz4", "snappy", "gzip"][part])
        (segdir / f"{part:020d}.log").write_bytes(blob)
    decoded = kafka_segment_dir_source(str(segdir), dialect="json")(spark)
    pdf = decoded.orderBy("seq").toPandas()
    assert len(pdf) == 30
    assert bool(pdf["decode_ok"].all())
    assert list(pdf["seq"]) == list(range(30))
    assert pdf["op"].iloc[8] == "delete"
    assert bytes(pdf["html"].iloc[1]) == b"<p>1</p>"


# ------------------------------------------------------- transactions ------
def _txn_segment():
    """Two interleaved transactional producers: pid 1 commits, pid 2
    aborts, then pid 1 leaves a transaction open (no marker)."""
    from montandon_etl_spark.sources.kafka_wire import (
        CTRL_ABORT,
        CTRL_COMMIT,
        control_marker,
    )

    def data(pid, seq, base, tag, n=3):
        recs = [{"timestamp": 1000 + base + i,
                 "key": f"{tag}{i}".encode(),
                 "value": f"{tag}-v{i}".encode()} for i in range(n)]
        return encode_record_batch(recs, base_offset=base, codec="lz4",
                                   producer_id=pid, producer_epoch=0,
                                   base_sequence=seq, transactional=True)

    def marker(pid, base, kind):
        return encode_record_batch([control_marker(kind)], base_offset=base,
                                   producer_id=pid, producer_epoch=0,
                                   control=True, transactional=True)

    seg = (data(1, 0, 0, "a")          # pid1 txn#1: offsets 0-2
           + data(2, 0, 3, "b")        # pid2 txn:   offsets 3-5
           + data(1, 3, 6, "c")        # pid1 txn#1 continued: 6-8
           + marker(1, 9, CTRL_COMMIT)   # pid1 commits (a,c visible)
           + marker(2, 10, CTRL_ABORT)   # pid2 aborts (b dropped)
           + data(1, 6, 11, "d")       # pid1 txn#2: OPEN (no marker)
           )
    return seg


def test_read_committed_filters_aborted_and_open():
    seg = _txn_segment()
    uncommitted = [r["key"].decode() for r in decode_record_batches(seg)]
    assert uncommitted == ["a0", "a1", "a2", "b0", "b1", "b2",
                           "c0", "c1", "c2", "d0", "d1", "d2"]
    committed = [r["key"].decode()
                 for r in decode_record_batches(seg, read_committed=True)]
    # aborted pid-2 batch AND the open pid-1 tail are invisible
    assert committed == ["a0", "a1", "a2", "c0", "c1", "c2"]


def test_multi_txn_same_pid_marker_scoping():
    """A second transaction of the same producer scopes to ITS next
    marker, not the first one."""
    from montandon_etl_spark.sources.kafka_wire import (
        CTRL_ABORT,
        CTRL_COMMIT,
        control_marker,
    )

    def data(seq, base, tag):
        return encode_record_batch(
            [{"timestamp": 1, "key": tag.encode(), "value": tag.encode()}],
            base_offset=base, producer_id=9, producer_epoch=2,
            base_sequence=seq, transactional=True)

    def marker(base, kind):
        return encode_record_batch([control_marker(kind)], base_offset=base,
                                   producer_id=9, producer_epoch=2,
                                   control=True, transactional=True)

    seg = (data(0, 0, "x") + marker(1, CTRL_COMMIT)
           + data(1, 2, "y") + marker(3, CTRL_ABORT)
           + data(2, 4, "z") + marker(5, CTRL_COMMIT))
    got = [r["key"].decode()
           for r in decode_record_batches(seg, read_committed=True)]
    assert got == ["x", "z"]


def test_idempotent_producer_dedup():
    """A redelivered (pid, epoch, baseSequence) batch is skipped; a
    new sequence from the same producer is not; pid=-1 batches are
    never deduped."""
    recs = _mk_records(4)
    b = encode_record_batch(recs, base_offset=0, producer_id=5,
                            producer_epoch=1, base_sequence=0)
    b_retry = encode_record_batch(recs, base_offset=0, producer_id=5,
                                  producer_epoch=1, base_sequence=0)
    b_next = encode_record_batch(_mk_records(2, seed=9), base_offset=4,
                                 producer_id=5, producer_epoch=1,
                                 base_sequence=4)
    got = list(decode_record_batches(b + b_retry + b_next))
    assert len(got) == 6
    plain = encode_record_batch(recs, base_offset=0)  # pid -1
    assert len(list(decode_record_batches(plain + plain))) == 8


def test_segment_records_read_committed_spark(spark):
    seg = _txn_segment()
    df = spark.createDataFrame([(bytearray(seg),)], "segment binary")
    got = segment_records(df, read_committed=True).toPandas()
    assert sorted(bytes(k).decode() for k in got["key"]) == [
        "a0", "a1", "a2", "c0", "c1", "c2"]
    assert sorted(got["offset"]) == [0, 1, 2, 6, 7, 8]
