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


def test_video_gop_features_ip_chain(spark):
    """3-frame GOP (I_PCM + two residual-free even-integer-MV P
    frames) through the real container: decoded means must equal the
    numpy clamp-shift chain, and the divisions are by powers of two
    so the doubles are exact."""
    import numpy as np

    from montandon_etl_spark.operators import h264 as Hc
    from montandon_etl_spark.operators.mp4 import (
        build_mp4, make_avcc, video_gop_features)

    rng = np.random.default_rng(31)
    y0 = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    cb0 = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    cr0 = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    nals = Hc.split_annexb(Hc.encode_ipcm_annexb(y0, cb0, cr0))
    sps_nal, pps_nal, idr_nal = nals

    def lp(nal):
        return len(nal).to_bytes(4, "big") + nal

    mv1 = np.array([[[8, -8], [0, 8]], [[-8, 0], [8, 8]]])
    mv2 = np.array([[[-8, 8], [8, 0]], [[0, -8], [-8, -8]]])
    frames = [lp(idr_nal),
              lp(Hc.encode_p16_rbsp(mv1, frame_num=1)),
              lp(Hc.encode_p16_rbsp(mv2, frame_num=2))]
    avcc = make_avcc(sps_nal, pps_nal)
    mp4 = build_mp4(frames, width=32, height=32, keyframes=[0],
                    avcc=avcc)
    df = spark.createDataFrame([(1, bytearray(mp4)),
                                (2, bytearray(b"junk"))],
                               "asset_id bigint, payload binary")
    out = {(r["asset_id"], r["frame_idx"]): r
           for r in video_gop_features(df, "asset_id",
                                       "payload").collect()}
    assert out[(2, None)]["mean_y"] is None  # record-not-drop

    def shift(plane, mvs, scale):
        h, w = plane.shape
        out_p = np.empty_like(plane)
        for yy in range(h):
            for xx in range(w):
                mbx, mby = xx // (16 // scale), yy // (16 // scale)
                dx = int(mvs[mby, mbx, 0]) // 4 // scale
                dy = int(mvs[mby, mbx, 1]) // 4 // scale
                sy = min(max(yy + dy, 0), h - 1)
                sx = min(max(xx + dx, 0), w - 1)
                out_p[yy, xx] = plane[sy, sx]
        return out_p

    y1 = shift(y0, mv1, 1)
    y2 = shift(y1, mv2, 1)
    cb1 = shift(cb0, mv1, 2)
    cb2 = shift(cb1, mv2, 2)
    assert out[(1, 0)]["is_key"] is True
    assert out[(1, 1)]["is_key"] is False
    assert out[(1, 0)]["mean_y"] == y0.astype(np.int64).sum() / 1024
    assert out[(1, 1)]["mean_y"] == y1.astype(np.int64).sum() / 1024
    assert out[(1, 2)]["mean_y"] == y2.astype(np.int64).sum() / 1024
    assert out[(1, 2)]["mean_cb"] == cb2.astype(np.int64).sum() / 256
    assert out[(1, 1)]["mean_cb"] == cb1.astype(np.int64).sum() / 256
