"""MP4 container demuxer: the sample table reconstructed from a muxed
file must recover every frame's exact byte range, pts, and keyframe
flag — verified by slicing the file bytes and comparing to the frame
payloads that went in."""

from __future__ import annotations

import pytest

from montandon_etl_spark.operators.mp4 import (
    build_mp4,
    decode_frame_rgb,
    parse_mp4,
    video_features,
    video_frame_index,
)


def _frames(n, base=11):
    # deterministic, distinct sizes so offset bugs can't cancel out
    return [bytes([i]) * (base + 7 * i) for i in range(n)]


def _video_track(b):
    meta = parse_mp4(b)
    return next(t for t in meta["tracks"] if t["handler"] == "vide")


def test_roundtrip_frame_bytes_exact():
    fr = _frames(7)
    b = build_mp4(fr, fps=4, width=64, height=48, keyframes=[0, 5])
    t = _video_track(b)
    assert t["codec"] == "avc1" and (t["width"], t["height"]) == (64, 48)
    assert t["timescale"] == 4 and t["duration"] == 7
    assert len(t["frames"]) == 7
    for i, (off, sz, pts, key) in enumerate(t["frames"]):
        assert b[off : off + sz] == fr[i]
        assert pts == i
        assert key == (i in (0, 5))


@pytest.mark.parametrize("chunk_plan", [[3, 3, 1], [1, 2, 4], [7]])
def test_multi_sample_chunks_stsc_runs(chunk_plan):
    fr = _frames(7)
    b = build_mp4(fr, chunk_plan=chunk_plan)
    t = _video_track(b)
    for i, (off, sz, _pts, key) in enumerate(t["frames"]):
        assert b[off : off + sz] == fr[i]
        assert key  # no stss box → every frame is sync


def test_co64_offsets():
    fr = _frames(5)
    b = build_mp4(fr, use_co64=True, chunk_plan=[2, 3])
    t = _video_track(b)
    assert [b[o : o + s] for o, s, _, _ in t["frames"]] == fr


def test_not_an_mp4_raises():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(Exception):
        parse_mp4(b"garbage")


def test_decode_gate_is_honest():
    # decode is REAL for baseline-intra (test_h264.py end-to-end);
    # out-of-subset tools still gate as NotImplementedError, and a
    # payload with no parameter sets is a plain decode error
    from montandon_etl_spark.operators.h264 import H264Error

    with pytest.raises(H264Error):
        decode_frame_rgb(b"\x00\x00\x01\x65")


def test_video_frame_index_sampling(spark):
    fr = _frames(10)
    b = build_mp4(fr, fps=5, keyframes=[0, 4, 8])
    df = spark.createDataFrame(
        [(1, bytearray(b)), (2, bytearray(b"not a video"))],
        "asset_id bigint, payload binary",
    )
    out = video_frame_index(df, "asset_id", "payload").toPandas()
    good = out[out.asset_id == 1].sort_values("frame_idx")
    assert list(good.frame_idx) == list(range(10))
    assert list(good.pts_sec) == [i / 5 for i in range(10)]
    assert list(good.is_keyframe) == [i in (0, 4, 8) for i in range(10)]
    # byte ranges recover the exact frame payloads through Spark
    for _, r in good.iterrows():
        assert b[int(r.byte_offset) : int(r.byte_offset) + int(r.n_bytes)] \
            == fr[int(r.frame_idx)]
    bad = out[out.asset_id == 2]
    assert len(bad) == 1 and bad.frame_idx.isna().all()  # record-not-drop

    kf = video_frame_index(df, "asset_id", "payload", keyframes_only=True)
    kf = kf.toPandas()
    assert sorted(kf[kf.asset_id == 1].frame_idx) == [0, 4, 8]
    nth = video_frame_index(df, "asset_id", "payload", every_nth=3).toPandas()
    assert sorted(nth[nth.asset_id == 1].frame_idx) == [0, 3, 6, 9]


def test_video_features(spark):
    b1 = build_mp4(_frames(8), fps=4, width=320, height=240, keyframes=[0, 4])
    df = spark.createDataFrame(
        [(1, bytearray(b1)), (2, None)], "asset_id bigint, payload binary"
    )
    out = {r["asset_id"]: r for r in video_features(df, "asset_id", "payload").collect()}
    r = out[1]
    assert (r["codec"], r["width"], r["height"]) == ("avc1", 320, 240)
    assert r["duration_sec"] == 2.0 and r["n_frames"] == 8
    assert r["fps"] == 4.0 and r["n_keyframes"] == 2
    assert out[2]["codec"] is None


def test_frame_slicing_via_builtin_substring(spark):
    """The promised downstream pattern: join the frame index back and
    slice frames with the JVM-side substring — byte-exact."""
    from pyspark.sql import functions as F

    fr = _frames(6)
    b = build_mp4(fr, fps=3)
    assets = spark.createDataFrame(
        [(1, bytearray(b))], "asset_id bigint, payload binary"
    )
    idx = video_frame_index(assets, "asset_id", "payload", keyframes_only=False)
    sliced = (
        idx.join(assets, "asset_id")
        .select(
            "frame_idx",
            F.substring(
                "payload", F.col("byte_offset").cast("int") + 1, F.col("n_bytes")
            ).alias("frame"),
        )
        .collect()
    )
    got = {r["frame_idx"]: bytes(r["frame"]) for r in sliced}
    assert got == {i: fr[i] for i in range(6)}
