"""H.264 baseline I-frame decoder: CAVLC table structure pins, a
spec-following test ENCODER (bit-writer direction of the same syntax)
round-tripped through the decoder — the decoded frame must equal the
encoder's own reconstruction EXACTLY (entropy layer, prediction,
dequant, IDCT, and bitstream framing all exercised), plus NAL/EP3B
and container-integration checks. No Spark needed."""

from __future__ import annotations

import numpy as np
import pytest

from montandon_etl_spark.operators import h264 as H

# ------------------------------------------------------------- table pins


def test_cavlc_tables_structurally_sound():
    """Every VLC table section must be prefix-free (no code is a
    prefix of another) and carry the spec's exact entry count."""
    def check_prefix_free(tbl, name):
        codes = sorted(tbl.values(), key=len)
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not b.startswith(a), (name, a, b)

    for name, tbl, n in [
        ("coeff_token nC<2", H._CT_NC0, 62),
        ("coeff_token 2<=nC<4", H._CT_NC2, 62),
        ("coeff_token 4<=nC<8", H._CT_NC4, 62),
        ("coeff_token chromaDC", H._CT_CHROMA_DC, 14),
    ]:
        assert len(tbl) == n, name
        check_prefix_free(tbl, name)
        # every (tc, t1) combination the spec defines is present
        maxtc = 4 if tbl is H._CT_CHROMA_DC else 16
        want = {(tc, t1) for tc in range(maxtc + 1)
                for t1 in range(min(tc, 3) + 1)}
        assert set(tbl) == want, name
    for tc, tbl in H._TZ_4x4.items():
        assert len(tbl) == 17 - tc, tc  # total_zeros ∈ [0, 16 − tc]
        check_prefix_free(tbl, f"total_zeros tc={tc}")
    for tc, tbl in H._TZ_CHROMA_DC.items():
        assert len(tbl) == 4 - tc + 1, tc
        check_prefix_free(tbl, f"tz chroma tc={tc}")
    for zl, tbl in H._RUN_BEFORE.items():
        check_prefix_free(tbl, f"run_before zl={zl}")
        if zl < 7:
            assert set(tbl) == set(range(zl + 1)), zl
        else:
            assert set(tbl) == set(range(15)), zl


def test_bitreader_expgolomb():
    w = BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 1023]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 17, -31]
    for v in svals:
        w.se(v)
    r = H.BitReader(w.rbsp())
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_ep3b_roundtrip():
    raw = bytes([0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 7, 0, 0])
    esc = _ep3b_escape(raw)
    # escaped stream never contains 00 00 0x with x in {0,1,2}
    for i in range(len(esc) - 2):
        if esc[i] == 0 and esc[i + 1] == 0:
            assert esc[i + 2] >= 3, esc.hex()
    assert H.strip_ep3b(esc) == raw


# ----------------------------------------------------------- test encoder


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        assert 0 <= v < (1 << n), (v, n)
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def put(self, bitstr: str):
        self.bits.extend(1 if c == "1" else 0 for c in bitstr)

    def ue(self, v: int):
        v1 = v + 1
        n = v1.bit_length()
        self.u(0, n - 1)
        self.u(v1, n)

    def se(self, v: int):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def byte_align_zero(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def rbsp(self, trailing: bool = False) -> bytes:
        bits = list(self.bits)
        if trailing:  # rbsp_stop_one_bit + alignment zeros
            bits.append(1)
            while len(bits) % 8:
                bits.append(0)
        else:
            while len(bits) % 8:
                bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def _ep3b_escape(b: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for byte in b:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def _annexb(nal_rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + _ep3b_escape(nal_rbsp)


# forward transform/quant (encoder side — quality-only, any quantized
# level is a valid stream; correctness is defined by the decoder-math
# reconstruction the encoder mirrors)
_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2],
                [1, -1, -1, 1], [1, -2, 2, -1]], dtype=np.int64)
_MF = [(13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
       (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559)]


def _mf(qp):
    m = np.empty((4, 4), dtype=np.int64)
    v0, v1, v2 = _MF[qp % 6]
    for i in range(4):
        for j in range(4):
            m[i, j] = v0 if (i % 2, j % 2) == (0, 0) else (
                v1 if (i % 2, j % 2) == (1, 1) else v2)
    return m


def _fwd4x4(x: np.ndarray) -> np.ndarray:
    return _CF @ x.astype(np.int64) @ _CF.T


def _quant(w: np.ndarray, qp: int) -> np.ndarray:
    qbits = 15 + qp // 6
    f = (1 << qbits) // 3
    z = (np.abs(w) * _mf(qp) + f) >> qbits
    return (np.sign(w) * z).astype(np.int64)


def _quant_dc(w: np.ndarray, qp: int) -> np.ndarray:
    qbits = 16 + qp // 6
    f = 2 * ((1 << (qbits - 1)) // 3)
    mf0 = _MF[qp % 6][0]
    z = (np.abs(w) * mf0 + f) >> qbits
    return (np.sign(w) * z).astype(np.int64)


def _block_zigzag(b: np.ndarray) -> list[int]:
    return [int(b[i, j]) for (i, j) in H._ZIGZAG_4x4]


def _write_residual(w: BitWriter, levels: list[int], nC: int):
    """Encode one residual block (levels in zig-zag order) — the
    writer direction of H.read_residual_block."""
    n = len(levels)
    nz = [(i, l) for i, l in enumerate(levels) if l != 0]
    total_coeff = len(nz)
    # trailing ones: run of |1| at the high-frequency end, max 3
    t1 = 0
    for i in range(total_coeff - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    if nC >= 8:
        w.u(3 if total_coeff == 0 else ((total_coeff - 1) << 2) | t1, 6)
    else:
        key = -1 if nC < 0 else (0 if nC < 2 else (2 if nC < 4 else 4))
        w.put(H._CT_TABLES[key][(total_coeff, t1)])
    if total_coeff == 0:
        return 0
    hi_first = nz[::-1]
    suffix_len = 1 if (total_coeff > 10 and t1 < 3) else 0
    for i, (pos, level) in enumerate(hi_first):
        if i < t1:
            w.u(0 if level > 0 else 1, 1)
            continue
        lc = 2 * level - 2 if level > 0 else -2 * level - 1
        if i == t1 and t1 < 3:
            lc -= 2
        if suffix_len == 0:
            if lc < 14:
                w.u(0, lc)
                w.u(1, 1)
            elif lc < 30:
                w.u(0, 14)
                w.u(1, 1)
                w.u(lc - 14, 4)
            else:
                assert lc - 30 < (1 << 12), "level beyond test range"
                w.u(0, 15)
                w.u(1, 1)
                w.u(lc - 30, 12)
        else:
            if lc < (15 << suffix_len):
                w.u(0, lc >> suffix_len)
                w.u(1, 1)
                w.u(lc & ((1 << suffix_len) - 1), suffix_len)
            else:
                lc2 = lc - (15 << suffix_len)
                assert lc2 < (1 << 12), "level beyond test range"
                w.u(0, 15)
                w.u(1, 1)
                w.u(lc2, 12)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if total_coeff < n:
        tz = nz[-1][0] + 1 - total_coeff
        if nC < 0:
            w.put(H._TZ_CHROMA_DC[total_coeff][tz])
        else:
            w.put(H._TZ_4x4[total_coeff][tz])
    else:
        tz = 0
    zeros_left = tz
    for i in range(total_coeff - 1, 0, -1):
        run = nz[i][0] - nz[i - 1][0] - 1
        if zeros_left > 0:
            w.put(H._RUN_BEFORE[min(zeros_left, 7)][run])
        zeros_left -= run
    return total_coeff


def _make_sps_pps(wmb: int, hmb: int, qp: int):
    w = BitWriter()
    w.u(0x67, 8)  # nal: ref_idc=3, type=7
    w.u(66, 8)  # baseline
    w.u(0xC0, 8)  # constraint_set0/1
    w.u(30, 8)  # level 3.0
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # poc type 2
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps
    w.ue(wmb - 1)
    w.ue(hmb - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(0, 1)  # direct_8x8
    w.u(0, 1)  # no cropping
    w.u(0, 1)  # no vui
    sps = w.rbsp(trailing=True)

    w = BitWriter()
    w.u(0x68, 8)  # nal type 8
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(0, 1)  # CAVLC
    w.u(0, 1)  # bottom_field_poc
    w.ue(0)  # one slice group
    w.ue(0)
    w.ue(0)
    w.u(0, 1)  # weighted_pred
    w.u(0, 2)
    w.se(qp - 26)  # pic_init_qp
    w.se(0)  # pic_init_qs
    w.se(0)  # chroma_qp_index_offset
    w.u(1, 1)  # deblocking_filter_control_present
    w.u(0, 1)  # constrained_intra
    w.u(0, 1)  # redundant_pic_cnt
    pps = w.rbsp(trailing=True)
    return sps, pps


def _encode_i4_mb(w, plan, src_y, src_cb, src_cr, Y, Cb, Cr,
                  nzY, nzC, i4m, mbx, mby, wmb, mb, cur_qp):
    """Encode one I_NxN macroblock (writer mirror of
    h264._decode_i4x4_mb); returns the updated slice QP."""
    _, want_mode, cmode, qpd = plan
    ox, oy, cx, cy = mbx * 16, mby * 16, mbx * 8, mby * 8
    gx, gy = mbx * 4, mby * 4
    n_blk_cols = wmb * 4
    qp2 = (cur_qp + qpd + 52) % 52
    qpc = H.qp_chroma(qp2, 0)

    # phase A: per-block mode choice, quant, decoder-math recon
    modes, mpms, levels = [], [], []
    scale = H._dequant_scale(qp2)
    for bi, (bx, by) in enumerate(H._BLK_SCAN):
        fx, fy = gx + bx, gy + by
        px, py = ox + bx * 4, oy + by * 4
        have_l, have_t = fx > 0, fy > 0
        have_c = have_l and have_t
        if fx > 0 and fy > 0:
            a = i4m[fy, fx - 1]
            b = i4m[fy - 1, fx]
            mpm = min(int(a) if a >= 0 else 2, int(b) if b >= 0 else 2)
        else:
            mpm = 2
        m = want_mode if H.i4_mode_available(
            want_mode, have_l, have_t, have_c) else 2
        modes.append(m)
        mpms.append(mpm)
        i4m[fy, fx] = m
        lref = Y[py:py + 4, px - 1].astype(np.int64) if have_l else None
        cref = int(Y[py - 1, px - 1]) if have_c else None
        tref = None
        if have_t:
            t4 = Y[py - 1, px:px + 4].astype(np.int64)
            ar_ok = False
            if fx + 1 < n_blk_cols:
                ar_mb = (fy - 1) // 4 * wmb + (fx + 1) // 4
                if ar_mb < mb:
                    ar_ok = True
                elif ar_mb == mb:
                    rel = (fx + 1 - gx, fy - 1 - gy)
                    ar_ok = rel in H._BLK_SCAN and \
                        H._BLK_SCAN.index(rel) < bi
            tr = Y[py - 1, px + 4:px + 8].astype(np.int64) if ar_ok \
                else np.full(4, t4[3], dtype=np.int64)
            tref = np.concatenate([t4, tr])
        pred = H.pred_4x4(m, lref, tref, cref)
        resid = src_y[py:py + 4, px:px + 4].astype(np.int64) - pred
        z = _quant(_fwd4x4(resid), qp2)
        levels.append(z)
        d = (z * scale) << (qp2 // 6)
        res = H.idct4x4(d)
        Y[py:py + 4, px:px + 4] = np.clip(pred + ((res + 32) >> 6),
                                          0, 255)
    cbp_luma = 0
    for quad in range(4):
        if any(np.any(levels[quad * 4 + k]) for k in range(4)):
            cbp_luma |= 1 << quad
    # quads with bit 0 decode as all-zero: recompute those blocks'
    # recon with zero residual (they ARE zero — assert the invariant)
    for quad in range(4):
        if not (cbp_luma & (1 << quad)):
            for k in range(4):
                assert not np.any(levels[quad * 4 + k])

    # chroma (same shapes as the I_16x16 branch)
    ctop = {0: Cb[cy - 1, cx:cx + 8] if mby > 0 else None,
            1: Cr[cy - 1, cx:cx + 8] if mby > 0 else None}
    cleft = {0: Cb[cy:cy + 8, cx - 1] if mbx > 0 else None,
             1: Cr[cy:cy + 8, cx - 1] if mbx > 0 else None}
    ccorner = {0: int(Cb[cy - 1, cx - 1]) if mbx and mby else None,
               1: int(Cr[cy - 1, cx - 1]) if mbx and mby else None}
    cpred, cz, czdc = {}, {}, {}
    for c, srcp in ((0, src_cb), (1, src_cr)):
        cpred[c] = H.pred_chroma(cmode, cleft[c], ctop[c], ccorner[c])
        cresid = srcp[cy:cy + 8, cx:cx + 8].astype(np.int64) - cpred[c]
        dc2 = np.empty((2, 2), dtype=np.int64)
        for bi in range(4):
            bx, by = bi % 2, bi // 2
            wt = _fwd4x4(cresid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4])
            z = _quant(wt, qpc)
            dc2[by, bx] = wt[0, 0]
            z[0, 0] = 0
            cz[(c, bi)] = z
        czdc[c] = _quant_dc(H.ihadamard2x2(dc2) // 2, qpc)
    any_cac = any(np.any(z) for z in cz.values())
    any_cdc = any(np.any(czdc[c]) for c in (0, 1))
    cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)
    cbp = cbp_luma | (cbp_chroma << 4)
    if cbp == 0:
        qp2 = cur_qp  # decoder parses no mb_qp_delta; qp unchanged

    # phase B: syntax
    w.ue(0)  # mb_type I_NxN
    for m, mpm in zip(modes, mpms):
        if m == mpm:
            w.u(1, 1)
        else:
            w.u(0, 1)
            w.u(m if m < mpm else m - 1, 3)
    w.ue(cmode)
    w.ue(H._CBP_INTRA_INV[cbp])
    if cbp:
        w.se(qpd)
    for bi, (bx, by) in enumerate(H._BLK_SCAN):
        fx, fy = gx + bx, gy + by
        if cbp_luma & (1 << (bi // 4)):
            tc = _write_residual(w, _block_zigzag(levels[bi]),
                                 H._nc_from(nzY, fx, fy))
            nzY[fy, fx] = tc
        else:
            nzY[fy, fx] = 0
    for c in (0, 1):
        if cbp_chroma:
            dz = [int(czdc[c][0, 0]), int(czdc[c][0, 1]),
                  int(czdc[c][1, 0]), int(czdc[c][1, 1])]
            _write_residual(w, dz, -1)
    for c in (0, 1):
        for bi in range(4):
            bx, by = bi % 2, bi // 2
            fx, fy = mbx * 2 + bx, mby * 2 + by
            if cbp_chroma == 2:
                tc = _write_residual(w, _block_zigzag(cz[(c, bi)])[1:],
                                     H._nc_from(nzC[c], fx, fy))
                nzC[c][fy, fx] = tc
            else:
                nzC[c][fy, fx] = 0

    # chroma recon with decoder math
    for c, plane in ((0, Cb), (1, Cr)):
        use_dc = czdc[c] if cbp_chroma else np.zeros((2, 2),
                                                     dtype=np.int64)
        dccr = H.dequant_dc_chroma(H.ihadamard2x2(use_dc), qpc)
        csc = H._dequant_scale(qpc)
        for bi in range(4):
            bx, by = bi % 2, bi // 2
            zz = cz[(c, bi)] if cbp_chroma == 2 else \
                np.zeros((4, 4), dtype=np.int64)
            d = (zz * csc) << (qpc // 6)
            d[0, 0] = dccr[by, bx]
            res = H.idct4x4(d)
            py, px = cy + by * 4, cx + bx * 4
            plane[py:py + 4, px:px + 4] = np.clip(
                cpred[c][by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                + ((res + 32) >> 6), 0, 255)
    return qp2


def encode_iframe(src_y, src_cb, src_cr, qp: int, mb_plan):
    """Minimal spec-syntax I-frame encoder. ``mb_plan[(mbx,mby)]`` =
    ("pcm",), ("i16", luma_mode, chroma_mode, qp_delta), or
    ("i4", preferred_4x4_mode, chroma_mode, qp_delta) — the 4x4 mode
    falls back to DC per-block where its references are unavailable.
    Returns (slice_rbsp, recon_y, recon_cb, recon_cr) where recon is
    the decoder-math reconstruction the bitstream must reproduce."""
    hmb, wmb = src_y.shape[0] // 16, src_y.shape[1] // 16
    Y = np.zeros_like(src_y, dtype=np.int64)
    Cb = np.zeros_like(src_cb, dtype=np.int64)
    Cr = np.zeros_like(src_cr, dtype=np.int64)
    nzY = np.full((hmb * 4, wmb * 4), -1, dtype=np.int64)
    nzC = {0: np.full((hmb * 2, wmb * 2), -1, dtype=np.int64),
           1: np.full((hmb * 2, wmb * 2), -1, dtype=np.int64)}
    i4m = np.full((hmb * 4, wmb * 4), -1, dtype=np.int64)

    w = BitWriter()
    w.u(0x65, 8)  # nal: ref_idc=3, type=5 (IDR)
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I (all slices)
    w.ue(0)  # pps_id
    w.u(0, 4)  # frame_num (log2=4)
    w.ue(0)  # idr_pic_id
    w.u(1, 1)  # no_output_of_prior_pics
    w.u(0, 1)  # long_term_reference
    w.se(0)  # slice_qp_delta
    w.ue(1)  # disable_deblocking_filter_idc = 1

    cur_qp = qp
    for mby in range(hmb):
        for mbx in range(wmb):
            plan = mb_plan.get((mbx, mby), ("i16", 2, 0, 0))
            ox, oy, cx, cy = mbx * 16, mby * 16, mbx * 8, mby * 8
            if plan[0] == "pcm":
                w.ue(25)
                w.byte_align_zero()
                for y in range(16):
                    for x in range(16):
                        v = int(src_y[oy + y, ox + x])
                        w.u(v, 8)
                        Y[oy + y, ox + x] = v
                for plane, src in ((Cb, src_cb), (Cr, src_cr)):
                    for y in range(8):
                        for x in range(8):
                            v = int(src[cy + y, cx + x])
                            w.u(v, 8)
                            plane[cy + y, cx + x] = v
                nzY[mby * 4:mby * 4 + 4, mbx * 4:mbx * 4 + 4] = 16
                for c in (0, 1):
                    nzC[c][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 16
                continue

            if plan[0] == "i4":
                cur_qp = _encode_i4_mb(
                    w, plan, src_y, src_cb, src_cr, Y, Cb, Cr,
                    nzY, nzC, i4m, mbx, mby, wmb, mby * wmb + mbx,
                    cur_qp)
                continue
            _, lmode, cmode, qpd = plan
            cur_qp = (cur_qp + qpd + 52) % 52
            qpc = H.qp_chroma(cur_qp, 0)

            # ---- luma: predict from recon, transform+quant residual
            top = Y[oy - 1, ox:ox + 16] if mby > 0 else None
            left = Y[oy:oy + 16, ox - 1] if mbx > 0 else None
            if lmode == 3:
                top17 = np.concatenate(([Y[oy - 1, ox - 1]], top))
                left17 = np.concatenate(([Y[oy - 1, ox - 1]], left))
                pred = H.pred_16x16_plane(left17, top17)
            else:
                pred = H.pred_16x16(lmode, left, top)
            resid = src_y[oy:oy + 16, ox:ox + 16].astype(np.int64) - pred
            coefs = {}
            dcs = np.empty((4, 4), dtype=np.int64)
            for bi, (bx, by) in enumerate(H._BLK_SCAN):
                blk = resid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                wt = _fwd4x4(blk)
                z = _quant(wt, cur_qp)
                dcs[by, bx] = wt[0, 0]  # DC taken pre-quant
                z[0, 0] = 0
                coefs[bi] = z
            # forward 4x4 Hadamard is the same ±1 butterfly as the
            # inverse; the encoder normalizes by /2 (informative spec
            # encoder) — encoder-side quant only shapes quality, the
            # round-trip contract is decoder-math reconstruction
            wdc = H.ihadamard4x4(dcs.astype(np.int64)) // 2
            zdc = _quant_dc(wdc, cur_qp)
            dc_zig = _block_zigzag(zdc)
            any_ac = any(np.any(z) for z in coefs.values())
            cbp_luma = 15 if any_ac else 0

            # ---- chroma
            ctop = {0: Cb[cy - 1, cx:cx + 8] if mby > 0 else None,
                    1: Cr[cy - 1, cx:cx + 8] if mby > 0 else None}
            cleft = {0: Cb[cy:cy + 8, cx - 1] if mbx > 0 else None,
                     1: Cr[cy:cy + 8, cx - 1] if mbx > 0 else None}
            ccorner = {0: int(Cb[cy - 1, cx - 1]) if mbx and mby else None,
                       1: int(Cr[cy - 1, cx - 1]) if mbx and mby else None}
            cpred, cz, czdc = {}, {}, {}
            for c, srcp in ((0, src_cb), (1, src_cr)):
                cpred[c] = H.pred_chroma(cmode, cleft[c], ctop[c],
                                         ccorner[c])
                cresid = srcp[cy:cy + 8, cx:cx + 8].astype(np.int64) \
                    - cpred[c]
                dc2 = np.empty((2, 2), dtype=np.int64)
                for bi in range(4):
                    bx, by = bi % 2, bi // 2
                    wt = _fwd4x4(cresid[by * 4:by * 4 + 4,
                                        bx * 4:bx * 4 + 4])
                    z = _quant(wt, qpc)
                    dc2[by, bx] = wt[0, 0]
                    z[0, 0] = 0
                    cz[(c, bi)] = z
                wdc2 = H.ihadamard2x2(dc2)
                czdc[c] = _quant_dc(wdc2 // 2, qpc)
            any_cac = any(np.any(z) for z in cz.values())
            any_cdc = any(np.any(czdc[c]) for c in (0, 1))
            cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)

            # ---- write MB syntax
            mb_type = 1 + lmode + 4 * cbp_chroma + (12 if cbp_luma else 0)
            w.ue(mb_type)
            w.ue(cmode)
            w.se(qpd)
            gx, gy = mbx * 4, mby * 4
            _write_residual(w, dc_zig, H._nc_from(nzY, gx, gy))
            for bi, (bx, by) in enumerate(H._BLK_SCAN):
                fx, fy = gx + bx, gy + by
                if cbp_luma:
                    lv = _block_zigzag(coefs[bi])[1:]
                    tc = _write_residual(w, lv, H._nc_from(nzY, fx, fy))
                    nzY[fy, fx] = tc
                else:
                    nzY[fy, fx] = 0
            for c in (0, 1):
                if cbp_chroma:
                    dz = [int(czdc[c][0, 0]), int(czdc[c][0, 1]),
                          int(czdc[c][1, 0]), int(czdc[c][1, 1])]
                    _write_residual(w, dz, -1)
            for c in (0, 1):
                for bi in range(4):
                    bx, by = bi % 2, bi // 2
                    fx, fy = mbx * 2 + bx, mby * 2 + by
                    if cbp_chroma == 2:
                        lv = _block_zigzag(cz[(c, bi)])[1:]
                        tc = _write_residual(
                            w, lv, H._nc_from(nzC[c], fx, fy))
                        nzC[c][fy, fx] = tc
                    else:
                        nzC[c][fy, fx] = 0

            # ---- reconstruct with DECODER math (the expected output)
            if not cbp_luma:
                for bi in coefs:
                    coefs[bi] = np.zeros((4, 4), dtype=np.int64)
            dcr = H.dequant_dc_luma(H.ihadamard4x4(zigzag4(dc_zig)),
                                    cur_qp)
            scale = H._dequant_scale(cur_qp)
            for bi, (bx, by) in enumerate(H._BLK_SCAN):
                d = (coefs[bi] * scale) << (cur_qp // 6)
                d[0, 0] = dcr[by, bx]
                res = H.idct4x4(d)
                py, px = oy + by * 4, ox + bx * 4
                Y[py:py + 4, px:px + 4] = np.clip(
                    pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                    + ((res + 32) >> 6), 0, 255)
            for c, plane in ((0, Cb), (1, Cr)):
                use_dc = czdc[c] if cbp_chroma else \
                    np.zeros((2, 2), dtype=np.int64)
                dccr = H.dequant_dc_chroma(H.ihadamard2x2(use_dc), qpc)
                csc = H._dequant_scale(qpc)
                for bi in range(4):
                    bx, by = bi % 2, bi // 2
                    zz = cz[(c, bi)] if cbp_chroma == 2 else \
                        np.zeros((4, 4), dtype=np.int64)
                    d = (zz * csc) << (qpc // 6)
                    d[0, 0] = dccr[by, bx]
                    res = H.idct4x4(d)
                    py, px = cy + by * 4, cx + bx * 4
                    plane[py:py + 4, px:px + 4] = np.clip(
                        cpred[c][by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                        + ((res + 32) >> 6), 0, 255)

    return (w.rbsp(trailing=True), Y.astype(np.uint8),
            Cb.astype(np.uint8), Cr.astype(np.uint8))


def zigzag4(levels):
    return H.zigzag_to_block(levels)


def _src_planes(wmb, hmb, seed=3):
    rng = np.random.RandomState(seed)
    H_, W_ = hmb * 16, wmb * 16
    yy, xx = np.mgrid[0:H_, 0:W_]
    y = ((xx * 3 + yy * 2) % 200 + 28
         + rng.randint(-6, 7, (H_, W_))).clip(0, 255).astype(np.uint8)
    cb = ((xx[::2, ::2] * 2) % 160 + 48
          + rng.randint(-4, 5, (H_ // 2, W_ // 2))).clip(0, 255
                                                         ).astype(np.uint8)
    cr = ((yy[::2, ::2] * 2) % 160 + 48
          + rng.randint(-4, 5, (H_ // 2, W_ // 2))).clip(0, 255
                                                         ).astype(np.uint8)
    return y, cb, cr


def test_iframe_roundtrip_exact():
    """decode(encode(frame)) must equal the encoder's decoder-math
    reconstruction BIT-EXACTLY, across all luma/chroma prediction
    modes, an I_PCM macroblock, and mb_qp_delta changes."""
    wmb, hmb, qp = 4, 3, 28
    src_y, src_cb, src_cr = _src_planes(wmb, hmb)
    plan = {
        (0, 0): ("i16", 2, 0, 0),   # DC / chroma DC (edge MB)
        (1, 0): ("i16", 1, 1, 0),   # H pred / chroma H
        (2, 0): ("pcm",),           # raw samples
        (3, 0): ("i16", 1, 1, 2),   # qp_delta +2
        (0, 1): ("i16", 0, 2, 0),   # V pred / chroma V
        (1, 1): ("i16", 3, 3, 0),   # Plane / chroma Plane
        (2, 1): ("i16", 2, 0, -4),  # qp_delta -4
        (3, 1): ("i16", 0, 2, 0),
        (0, 2): ("i16", 2, 0, 0),
        (1, 2): ("i16", 3, 3, 0),
        (2, 2): ("i16", 1, 2, 0),
        (3, 2): ("i16", 2, 1, 0),
    }
    slice_rbsp, ry, rcb, rcr = encode_iframe(src_y, src_cb, src_cr,
                                             qp, plan)
    sps, pps = _make_sps_pps(wmb, hmb, qp)
    y, cb, cr = H.decode_i_frame(H.parse_sps(sps), H.parse_pps(pps),
                                 slice_rbsp)
    assert np.array_equal(y, ry), np.argwhere(y != ry)[:5]
    assert np.array_equal(cb, rcb)
    assert np.array_equal(cr, rcr)
    # PCM macroblock reproduces the SOURCE exactly (spec-trivial path)
    assert np.array_equal(y[0:16, 32:48], src_y[0:16, 32:48])
    # lossy MBs should still be close to source at qp 28 (sanity that
    # the transform chain is a real codec, not identity)
    err = np.abs(y[0:16, 0:16].astype(int) - src_y[0:16, 0:16].astype(int))
    assert err.mean() < 12.0, err.mean()


def test_decode_keyframe_annexb_and_avcc():
    wmb, hmb, qp = 2, 2, 30
    src_y, src_cb, src_cr = _src_planes(wmb, hmb, seed=9)
    plan = {(x, y): ("i16", 2, 0, 0) for x in range(2) for y in range(2)}
    slice_rbsp, ry, rcb, rcr = encode_iframe(src_y, src_cb, src_cr,
                                             qp, plan)
    sps, pps = _make_sps_pps(wmb, hmb, qp)
    want_rgb = H.yuv420_to_rgb(ry, rcb, rcr)
    # Annex B with in-band SPS/PPS
    stream = _annexb(sps) + _annexb(pps) + _annexb(slice_rbsp)
    got = H.decode_keyframe(stream)
    assert np.array_equal(got, want_rgb)
    # AVCC with out-of-band parameter sets (the avcC/mp4 shape)
    payload = len(slice_rbsp).to_bytes(4, "big") + slice_rbsp
    got2 = H.decode_keyframe(payload, sps_rbsp=sps, pps_rbsp=pps,
                             length_size=4)
    assert np.array_equal(got2, want_rgb)


def test_unsupported_paths_gate_loudly():
    sps, pps = _make_sps_pps(2, 2, 30)
    # CABAC PPS
    w = BitWriter()
    w.u(0x68, 8)
    w.ue(0)
    w.ue(0)
    w.u(1, 1)  # entropy_coding_mode = CABAC
    with pytest.raises(H.H264Unsupported, match="CABAC"):
        H.parse_pps(w.rbsp(trailing=True))
    # SP slice (I, P and B are supported now; SP/SI still gate)
    w = BitWriter()
    w.u(0x61, 8)  # non-IDR slice
    w.ue(0)  # first_mb
    w.ue(3)  # slice_type SP
    with pytest.raises(H.H264Unsupported, match="slice_type"):
        H.parse_slice_header(w.rbsp(trailing=True), H.parse_sps(sps),
                             H.parse_pps(pps))
    # multi-reference P now parses (decode needs a matching ref list:
    # handing fewer references than the slice demands is an error)
    w = BitWriter()
    w.u(0x61, 8)
    w.ue(0)  # first_mb
    w.ue(0)  # slice_type P
    w.ue(0)  # pps_id
    w.u(0, 4)  # frame_num
    w.u(1, 1)  # num_ref_idx_active_override
    w.ue(1)  # num_ref_idx_l0_active_minus1 = 1 -> 2 refs
    w.u(0, 1)  # no list modification
    w.u(0, 1)  # dec_ref_pic_marking
    w.se(0)
    w.ue(1)  # deblocking off
    _, shm = H.parse_slice_header(w.rbsp(trailing=True),
                                  H.parse_sps(sps), H.parse_pps(pps))
    assert shm["n_ref_l0"] == 2
    one_ref = (np.zeros((32, 32), np.uint8),
               np.zeros((16, 16), np.uint8),
               np.zeros((16, 16), np.uint8))
    with pytest.raises(H.H264Error, match="references"):
        H.decode_p_frame(H.parse_sps(sps), H.parse_pps(pps),
                         w.rbsp(trailing=True), [one_ref])
    # deblocking filter left enabled
    w = BitWriter()
    w.u(0x65, 8)
    w.ue(0)
    w.ue(7)
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(1, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(0)  # disable_deblocking_filter_idc = 0 (filter ON)
    with pytest.raises(H.H264Unsupported, match="deblocking"):
        H.parse_slice_header(w.rbsp(trailing=True), H.parse_sps(sps),
                             H.parse_pps(pps))


def test_mp4_container_to_pixels_end_to_end():
    """The full multimodal path: encode an I-frame, mux it into an
    MP4 with an avcC record, re-parse the container, pull the frame's
    byte range from the sample table, and decode_frame_rgb it — the
    pixels must equal the encoder's reconstruction."""
    from montandon_etl_spark.operators.mp4 import (
        build_mp4,
        decode_frame_rgb,
        parse_mp4,
    )

    wmb, hmb, qp = 3, 2, 27
    src_y, src_cb, src_cr = _src_planes(wmb, hmb, seed=5)
    plan = {(1, 1): ("i16", 3, 3, 0), (2, 1): ("pcm",)}
    slice_rbsp, ry, rcb, rcr = encode_iframe(src_y, src_cb, src_cr,
                                             qp, plan)
    sps, pps = _make_sps_pps(wmb, hmb, qp)
    esc = _ep3b_escape(slice_rbsp)
    payload = len(esc).to_bytes(4, "big") + esc

    from montandon_etl_spark.operators.mp4 import make_avcc
    mp4 = build_mp4([payload], width=wmb * 16, height=hmb * 16,
                    keyframes=[0],
                    avcc=make_avcc(_ep3b_escape(sps), _ep3b_escape(pps)))
    meta = parse_mp4(mp4)
    t = next(x for x in meta["tracks"] if x["handler"] == "vide")
    assert t["avcc"] is not None
    off, size, pts, key = t["frames"][0]
    assert key
    rgb = decode_frame_rgb(mp4[off:off + size], avcc=t["avcc"])
    assert rgb.shape == (hmb * 16, wmb * 16, 3)
    assert np.array_equal(rgb, H.yuv420_to_rgb(ry, rcb, rcr))


def test_i4x4_roundtrip_all_modes_exact():
    """I_NxN macroblocks: decode(encode(frame)) equals the encoder's
    decoder-math reconstruction bit-exactly across ALL NINE 4x4
    prediction modes (with per-block DC fallback at unavailable
    edges), most-probable-mode coding, Table 9-4 CBP gating, and
    mixed I_16x16 / I_NxN / I_PCM pictures."""
    wmb, hmb, qp = 4, 3, 26
    src_y, src_cb, src_cr = _src_planes(wmb, hmb, seed=17)
    plan = {}
    mode_cycle = list(range(9))
    k = 0
    for mby in range(hmb):
        for mbx in range(wmb):
            cm = k % 4  # chroma mode needs its references available
            if (cm in (2, 3) and mby == 0) or (cm in (1, 3) and mbx == 0):
                cm = 0
            plan[(mbx, mby)] = ("i4", mode_cycle[k % 9], cm, 0)
            k += 1
    # mix in the other MB types to stress cross-type neighbor state
    plan[(2, 1)] = ("pcm",)
    plan[(3, 1)] = ("i16", 2, 0, 2)
    plan[(1, 2)] = ("i4", 4, 3, -3)  # qp_delta on an I_NxN MB
    slice_rbsp, ry, rcb, rcr = encode_iframe(src_y, src_cb, src_cr,
                                             qp, plan)
    sps, pps = _make_sps_pps(wmb, hmb, qp)
    y, cb, cr = H.decode_i_frame(H.parse_sps(sps), H.parse_pps(pps),
                                 slice_rbsp)
    assert np.array_equal(y, ry), np.argwhere(y != ry)[:5]
    assert np.array_equal(cb, rcb)
    assert np.array_equal(cr, rcr)
    # lossy sanity at qp 26
    err = np.abs(y.astype(int) - src_y.astype(int))
    assert err.mean() < 12.0, err.mean()


def test_cbp_intra_table_is_permutation():
    assert sorted(H._CBP_INTRA) == list(range(48))
    assert all(H._CBP_INTRA[H._CBP_INTRA_INV[v]] == v for v in range(48))


def test_cavlc_tables_kraft_complete():
    """Kraft-sum pins: a VLC table transcription typo that lengthens,
    shortens, or drops a code almost surely changes the code-space
    mass. Every total_zeros table (except tc=1) and run_before table
    (except the zl>=7 escape table) is a COMPLETE prefix code
    (sum 2^-len == 1); the remaining tables miss exactly the
    all-zeros-codeword-sized gap the spec leaves unused (the decoder
    must never see an all-zero string of table length — level_prefix
    parsing depends on bounded zero runs)."""
    from fractions import Fraction

    def kraft(tbl):
        return sum(Fraction(1, 2 ** len(b)) for b in tbl.values())

    assert kraft(H._CT_NC0) == Fraction(32767, 32768)
    assert kraft(H._CT_NC2) == Fraction(8191, 8192)
    assert kraft(H._CT_NC4) == Fraction(1023, 1024)
    assert kraft(H._CT_CHROMA_DC) == 1
    for tc, tbl in H._TZ_4x4.items():
        assert kraft(tbl) == (Fraction(511, 512) if tc == 1 else 1), tc
    for tc, tbl in H._TZ_CHROMA_DC.items():
        assert kraft(tbl) == 1, tc
    for zl, tbl in H._RUN_BEFORE.items():
        assert kraft(tbl) == (Fraction(2047, 2048) if zl == 7 else 1), zl


def test_decoder_robust_to_corruption():
    """Randomly corrupted streams must either decode or raise a
    H264Error/H264Unsupported (what the mapInPandas record-not-drop
    wrappers catch) — never escape with an arbitrary crash. Numpy
    index/value errors from garbage syntax counting as crashes is
    exactly what this hunts."""
    import random

    wmb, hmb, qp = 2, 2, 28
    src_y, src_cb, src_cr = _src_planes(wmb, hmb, seed=23)
    plan = {(0, 0): ("i16", 2, 0, 0), (1, 0): ("i4", 3, 0, 0),
            (0, 1): ("pcm",), (1, 1): ("i16", 1, 1, 0)}
    slice_rbsp, *_ = encode_iframe(src_y, src_cb, src_cr, qp, plan)
    sps, pps = _make_sps_pps(wmb, hmb, qp)
    stream = _annexb(sps) + _annexb(pps) + _annexb(slice_rbsp)
    rng = random.Random(20260817)
    ok = failed = 0
    for _ in range(200):
        b = bytearray(stream)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            H.decode_keyframe(bytes(b))
            ok += 1
        except (H.H264Error, H.H264Unsupported, ValueError):
            failed += 1
        # any OTHER exception type propagates and fails the test
    assert ok + failed == 200
    assert failed > 0  # corruption is actually being exercised


# ------------------------------------------------------------- P slices
# Scalar spec-literal luma interpolation (8.4.2.2.x), written
# independently of the decoder's vectorized path so the two cannot
# co-sign a bug: every sample fetch clamps its absolute coordinate,
# half-pels are per-pixel 6-taps, j is built from RAW b half-pels.

def _fp(ref, y, x):
    Hh, Ww = ref.shape
    return int(ref[min(max(y, 0), Hh - 1), min(max(x, 0), Ww - 1)])


_T6 = ((1, -2), (-5, -1), (20, 0), (20, 1), (-5, 2), (1, 3))


def _braw(ref, y, x):  # horizontal half between (y,x) and (y,x+1)
    return sum(c * _fp(ref, y, x + d) for c, d in _T6)


def _hraw(ref, y, x):  # vertical half between (y,x) and (y+1,x)
    return sum(c * _fp(ref, y + d, x) for c, d in _T6)


def _jraw(ref, y, x):  # center: vertical 6-tap over RAW b halves
    return sum(c * _braw(ref, y + d, x) for c, d in _T6)


def _c5(v):
    return min(max((v + 16) >> 5, 0), 255)


def _c10(v):
    return min(max((v + 512) >> 10, 0), 255)


def scalar_mc_luma(ref, x0, y0, w, h, mvx, mvy):
    out = np.zeros((h, w), dtype=np.int64)
    fx, fy = mvx & 3, mvy & 3
    for yy in range(h):
        for xx in range(w):
            xi, yi = x0 + xx + (mvx >> 2), y0 + yy + (mvy >> 2)
            G = _fp(ref, yi, xi)
            if (fx, fy) == (0, 0):
                out[yy, xx] = G
                continue
            Hn = _fp(ref, yi, xi + 1)
            M = _fp(ref, yi + 1, xi)
            b = _c5(_braw(ref, yi, xi))
            s = _c5(_braw(ref, yi + 1, xi))
            hh = _c5(_hraw(ref, yi, xi))
            m = _c5(_hraw(ref, yi, xi + 1))
            j = _c10(_jraw(ref, yi, xi))
            tbl = {
                (1, 0): (G + b + 1) >> 1, (2, 0): b,
                (3, 0): (Hn + b + 1) >> 1,
                (0, 1): (G + hh + 1) >> 1, (0, 2): hh,
                (0, 3): (M + hh + 1) >> 1,
                (1, 1): (b + hh + 1) >> 1, (3, 1): (b + m + 1) >> 1,
                (1, 3): (hh + s + 1) >> 1, (3, 3): (m + s + 1) >> 1,
                (2, 1): (b + j + 1) >> 1, (2, 2): j,
                (2, 3): (j + s + 1) >> 1, (1, 2): (hh + j + 1) >> 1,
                (3, 2): (j + m + 1) >> 1,
            }
            out[yy, xx] = tbl[(fx, fy)]
    return out


def scalar_mc_chroma(ref, x0, y0, w, h, mvx, mvy):
    out = np.zeros((h, w), dtype=np.int64)
    fx, fy = mvx & 7, mvy & 7
    for yy in range(h):
        for xx in range(w):
            xi, yi = x0 + xx + (mvx >> 3), y0 + yy + (mvy >> 3)
            A, B = _fp(ref, yi, xi), _fp(ref, yi, xi + 1)
            C, D = _fp(ref, yi + 1, xi), _fp(ref, yi + 1, xi + 1)
            out[yy, xx] = ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B
                           + (8 - fx) * fy * C + fx * fy * D + 32) >> 6
    return out


def test_cbp_inter_table():
    assert sorted(H._CBP_INTER) == list(range(48))
    # spec-known leading entries (Table 9-4 Inter column)
    assert H._CBP_INTER[:13] == [0, 16, 1, 2, 4, 8, 32, 3, 5, 10,
                                 12, 15, 47]


def test_interp_luma_matches_scalar_reference():
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 256, size=(40, 44)).astype(np.int64)
    cases = [(8, 8, mvx, mvy) for mvx in range(-3, 5) for mvy in
             range(-3, 5)]  # all 16 frac combos, both signs
    cases += [(0, 0, -9, -11), (28, 24, 9, 13), (36, 36, 50, 41)]
    for x0, y0, mvx, mvy in cases:
        got = H.interp_luma(ref, x0, y0, 8, 8, mvx, mvy)
        want = scalar_mc_luma(ref, x0, y0, 8, 8, mvx, mvy)
        assert np.array_equal(got, want), (x0, y0, mvx, mvy)


def test_interp_chroma_matches_scalar_reference():
    rng = np.random.default_rng(12)
    ref = rng.integers(0, 256, size=(20, 22)).astype(np.int64)
    for mvx in (-13, -4, 0, 3, 7, 9, 21):
        for mvy in (-9, 0, 5, 8, 17):
            got = H.interp_chroma(ref, 4, 4, 8, 8, mvx, mvy)
            want = scalar_mc_chroma(ref, 4, 4, 8, 8, mvx, mvy)
            assert np.array_equal(got, want), (mvx, mvy)


def test_mv_pred_spec_cases():
    mvg = np.zeros((8, 8, 2), dtype=np.int64)
    refg = np.full((8, 8), H._NOT_DECODED, dtype=np.int64)
    # only-A rule: B/C/D unavailable (top row), A inter
    refg[0:4, 0:4] = 0
    mvg[0:4, 0:4] = (12, -8)
    assert H._mv_pred(mvg, refg, 4, 0, 4, 4, 0) == (12, -8)
    # unique-ref rule: A inter, B intra, C intra -> A wins even if
    # median would differ
    refg[:] = H._NOT_DECODED
    refg[4:8, 0:4] = 0
    mvg[4:8, 0:4] = (40, 4)
    refg[0:4, 0:8] = -1  # intra row above (decoded, not matching)
    assert H._mv_pred(mvg, refg, 4, 4, 4, 4, 0) == (40, 4)
    # median rule: all three inter with distinct mvs
    refg[0:4, 0:8] = 0
    mvg[0:4, 0:4] = (0, 100)   # B region covers (4,3)->B=(0,100)
    mvg[0:4, 4:8] = (99, 0)    # but C at (8,3) is out of grid -> D
    assert H._mv_pred(mvg, refg, 4, 4, 4, 4, 0) == (
        np.median([40, 99, 0]), np.median([4, 0, 100]))
    # directional shortcuts
    assert H._mv_pred(mvg, refg, 4, 4, 4, 2, 0, "16x8_top") == (99, 0)
    assert H._mv_pred(mvg, refg, 4, 6, 4, 2, 0, "16x8_bot") == (40, 4)


def _encode_pframe(wmb, hmb, plan, qp=26, frame_num=1):
    """Test-side P-slice writer. ``plan`` is a list over MBs in
    raster order; entries:
      ("skip",)
      ("16x16", mv, res)   ("16x8", mv0, mv1, res)
      ("8x16", mv0, mv1, res)   ("ipcm", y16, cb8, cr8)
    ``res`` is None or {"luma": {bi: levels16}, "cdc": {c: [4]},
    "cac": {(c, bi): levels15}, "cbp": int}. MVs are quarter-pel."""
    w = BitWriter()
    w.u(0x61, 8)
    w.ue(0)
    w.ue(0)  # P
    w.ue(0)  # pps
    w.u(frame_num & 15, 4)
    w.u(0, 1)  # no num_ref override
    w.u(0, 1)  # no list modification
    w.u(0, 1)  # dec_ref_pic_marking
    w.se(qp - 26)
    w.ue(1)  # deblocking off
    mvg = np.zeros((hmb * 4, wmb * 4, 2), dtype=np.int64)
    refg = np.full((hmb * 4, wmb * 4), H._NOT_DECODED, dtype=np.int64)
    nzY = np.full((hmb * 4, wmb * 4), -1, dtype=np.int64)
    nzC = {0: np.full((hmb * 2, wmb * 2), -1, dtype=np.int64),
           1: np.full((hmb * 2, wmb * 2), -1, dtype=np.int64)}

    def nc(nz, x, y):
        return H._nc_from(nz, x, y)

    run = 0
    for mb, entry in enumerate(plan):
        mbx, mby = mb % wmb, mb // wmb
        gx, gy = mbx * 4, mby * 4
        if entry[0] == "skip":
            mv = H._pskip_mv(mvg, refg, gx, gy)
            run += 1
            mvg[gy:gy + 4, gx:gx + 4] = mv
            refg[gy:gy + 4, gx:gx + 4] = 0
            nzY[gy:gy + 4, gx:gx + 4] = 0
            for c in (0, 1):
                nzC[c][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 0
            continue
        w.ue(run)
        run = 0
        if entry[0] == "ipcm":
            _, y16, cb8, cr8 = entry
            w.ue(30)  # 25 + 5
            w.byte_align_zero()
            for yy in range(16):
                for xx in range(16):
                    w.u(int(y16[yy, xx]), 8)
            for pl in (cb8, cr8):
                for yy in range(8):
                    for xx in range(8):
                        w.u(int(pl[yy, xx]), 8)
            refg[gy:gy + 4, gx:gx + 4] = -1
            nzY[gy:gy + 4, gx:gx + 4] = 16
            for c in (0, 1):
                nzC[c][mby * 2:mby * 2 + 2, mbx * 2:mbx * 2 + 2] = 16
            continue
        kind = entry[0]
        res = entry[-1]
        if kind == "8x8":
            # ("8x8", [sub_mb_type x4], [mvs in part order], res)
            _, subs, submvs, res = entry
            w.ue(3)  # P_8x8
            for s in subs:
                w.ue(s)
            parts = []
            k = 0
            for i8, s in enumerate(subs):
                bx, by = (i8 % 2) * 2, (i8 // 2) * 2
                for (sx, sy, sw, sh) in H._SUB_PARTS[s]:
                    parts.append(((bx + sx, by + sy, sw, sh, ""),
                                  submvs[k]))
                    k += 1
        elif kind == "16x16":
            parts = [((0, 0, 4, 4, ""), entry[1])]
            w.ue(0)
        elif kind == "16x8":
            parts = [((0, 0, 4, 2, "16x8_top"), entry[1]),
                     ((0, 2, 4, 2, "16x8_bot"), entry[2])]
            w.ue(1)
        else:
            parts = [((0, 0, 2, 4, "8x16_left"), entry[1]),
                     ((2, 0, 2, 4, "8x16_right"), entry[2])]
            w.ue(2)
        for (px4, py4, w4, h4, shape), mv in parts:
            p = H._mv_pred(mvg, refg, gx + px4, gy + py4, w4, h4, 0,
                           shape)
            w.se(mv[0] - p[0])
            w.se(mv[1] - p[1])
            mvg[gy + py4:gy + py4 + h4, gx + px4:gx + px4 + w4] = mv
            refg[gy + py4:gy + py4 + h4, gx + px4:gx + px4 + w4] = 0
        cbp = (res or {}).get("cbp", 0)
        w.ue(H._CBP_INTER_INV[cbp])
        if cbp:
            w.se(0)  # mb_qp_delta
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        for bi, (bx, by) in enumerate(H._BLK_SCAN):
            fx, fy = gx + bx, gy + by
            if cbp_luma & (1 << (bi // 4)):
                lv = (res.get("luma", {}) or {}).get(bi, [0] * 16)
                tc = _write_residual(w, lv, nc(nzY, fx, fy))
                nzY[fy, fx] = tc
            else:
                nzY[fy, fx] = 0
        if cbp_chroma:
            for c in (0, 1):
                _write_residual(
                    w, (res.get("cdc", {}) or {}).get(c, [0] * 4), -1)
        for c in (0, 1):
            for bi in range(4):
                bx, by = bi % 2, bi // 2
                fx, fy = mbx * 2 + bx, mby * 2 + by
                if cbp_chroma == 2:
                    lv = (res.get("cac", {}) or {}).get((c, bi), [0] * 15)
                    tc = _write_residual(w, lv, nc(nzC[c], fx, fy))
                    nzC[c][fy, fx] = tc
                else:
                    nzC[c][fy, fx] = 0
    if run:
        w.ue(run)
    return w.rbsp(trailing=True)


def test_p16_integer_mv_is_exact_shift():
    rng = np.random.default_rng(21)
    wmb, hmb = 3, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mvs[mby, mbx] = (4 * ((mbx + mby) % 5 - 2) * 2,
                             4 * ((mbx * 2 + mby) % 3 - 1) * 2)
    stream = H.encode_ip_stream(y, cb, cr, mvs)
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 2
    assert np.array_equal(frames[0][0], y)
    f1y, f1cb, f1cr = frames[1]
    Hh, Ww = y.shape
    for mby in range(hmb):
        for mbx in range(wmb):
            dx, dy = int(mvs[mby, mbx, 0]) // 4, int(mvs[mby, mbx, 1]) // 4
            for yy in range(mby * 16, mby * 16 + 16):
                for xx in range(mbx * 16, mbx * 16 + 16):
                    sy = min(max(yy + dy, 0), Hh - 1)
                    sx = min(max(xx + dx, 0), Ww - 1)
                    assert f1y[yy, xx] == y[sy, sx], (yy, xx)
            cyr = range(mby * 8, mby * 8 + 8)
            for yy in cyr:
                for xx in range(mbx * 8, mbx * 8 + 8):
                    sy = min(max(yy + dy // 2, 0), Hh // 2 - 1)
                    sx = min(max(xx + dx // 2, 0), Ww // 2 - 1)
                    assert f1cb[yy, xx] == cb[sy, sx]
                    assert f1cr[yy, xx] == cr[sy, sx]


def test_pframe_fractional_mv_matches_scalar_mc():
    rng = np.random.default_rng(22)
    wmb, hmb = 2, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps_r, pps_r = _make_sps_pps(wmb, hmb, 26)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    mvs = [(-5, 3), (7, -6), (1, 2), (-9, -11)]
    plan = [("16x16", mv, None) for mv in mvs]
    rbsp = _encode_pframe(wmb, hmb, plan)
    f1 = H.decode_p_frame(sps, pps, rbsp, (y, cb, cr))
    yl = y.astype(np.int64)
    for mb, mv in enumerate(mvs):
        mbx, mby = mb % wmb, mb // wmb
        want = scalar_mc_luma(yl, mbx * 16, mby * 16, 16, 16, *mv)
        got = f1[0][mby * 16:mby * 16 + 16,
                    mbx * 16:mbx * 16 + 16].astype(np.int64)
        assert np.array_equal(got, want), (mb, mv)
        wcb = scalar_mc_chroma(cb.astype(np.int64), mbx * 8, mby * 8,
                               8, 8, *mv)
        assert np.array_equal(
            f1[1][mby * 8:mby * 8 + 8, mbx * 8:mbx * 8 + 8], wcb)


def test_pframe_skip_runs_and_partitions_with_residual():
    rng = np.random.default_rng(23)
    wmb, hmb = 3, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps_r, pps_r = _make_sps_pps(wmb, hmb, 26)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    res = {"cbp": 0x2F,  # luma 8x8s 0..3 except #... (1111 low) + chroma DC+AC
           "luma": {0: [3, 0, -1, 1, 0, 0, 1] + [0] * 9,
                    5: [0, 2, 0, 0, -1] + [0] * 11},
           "cdc": {0: [1, 0, -1, 0], 1: [0, 1, 0, 0]},
           "cac": {(0, 0): [1] + [0] * 14, (1, 3): [-1, 1] + [0] * 13}}
    pcm_y = rng.integers(0, 256, (16, 16))
    pcm_cb = rng.integers(0, 256, (8, 8))
    pcm_cr = rng.integers(0, 256, (8, 8))
    plan = [("skip",),
            ("16x8", (8, 4), (-4, 0), None),
            ("ipcm", pcm_y, pcm_cb, pcm_cr),
            ("8x16", (2, 2), (6, -2), res),
            ("skip",), ("skip",)]
    rbsp = _encode_pframe(wmb, hmb, plan)
    f1y, f1cb, f1cr = H.decode_p_frame(sps, pps, rbsp, (y, cb, cr))
    yl = y.astype(np.int64)
    # MB0: skip at picture corner -> mv (0,0) -> copy
    assert np.array_equal(f1y[0:16, 0:16], y[0:16, 0:16])
    # MB1: 16x8 with explicit mvs, no residual
    assert np.array_equal(
        f1y[0:8, 16:32], scalar_mc_luma(yl, 16, 0, 16, 8, 8, 4))
    assert np.array_equal(
        f1y[8:16, 16:32], scalar_mc_luma(yl, 16, 8, 16, 8, -4, 0))
    # MB2: I_PCM inside P
    assert np.array_equal(f1y[0:16, 32:48], pcm_y)
    assert np.array_equal(f1cb[0:8, 16:24], pcm_cb)
    assert np.array_equal(f1cr[0:8, 16:24], pcm_cr)
    # MB3 (mbx 0, mby 1): 8x16 + residual
    scale, shift = H._dequant_scale(26), 26 // 6
    pred = np.zeros((16, 16), dtype=np.int64)
    pred[:, 0:8] = scalar_mc_luma(yl, 0, 16, 8, 16, 2, 2)
    pred[:, 8:16] = scalar_mc_luma(yl, 8, 16, 8, 16, 6, -2)
    want = pred.copy()
    for bi, (bx, by) in enumerate(H._BLK_SCAN):
        lv = res["luma"].get(bi, [0] * 16) if (res["cbp"] & 15) & (
            1 << (bi // 4)) else [0] * 16
        d = (H.zigzag_to_block(lv) * scale) << shift
        r4 = H.idct4x4(d)
        want[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = np.clip(
            pred[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
            + ((r4 + 32) >> 6), 0, 255)
    assert np.array_equal(f1y[16:32, 0:16], want)
    # MB4: skip AFTER a coded MB with nonzero left-neighbor MV ->
    # median predictor, not forced zero... A=(6,-2) B unavail? mby=1 ->
    # B is MB1 bottom (=(-4,0), ref 0, nonzero) and A=(6,-2): both
    # nonzero -> predictor = median over A,B,C(D)
    a = (6, -2)
    b = (-4, 0)
    cD = (8, 4)  # D substitution: above-left = MB1 top? no: C = above
    # -right of MB4 = MB2 (intra) -> (0,0) ref -1; all refs: A=0,B=0,
    # C=-1 -> two matches -> median of (6,-4,0) and (-2,0,0)
    mvsk = (int(np.median([a[0], b[0], 0])), int(np.median([a[1], b[1], 0])))
    assert np.array_equal(
        f1y[16:32, 16:32],
        scalar_mc_luma(yl, 16, 16, 16, 16, mvsk[0], mvsk[1]))
    # MB5: trailing skip
    prev = (mvsk[0], mvsk[1])
    a2 = prev
    # B for MB5 = MB2 intra -> zero/ref-1 -> skip mv rule: B not
    # available-for-match but IS available (decoded) with ref -1 !=0 ->
    # not the zero-forcing case; predictor: A=prev(ref0), B=(ref -1),
    # C/D: D=MB1 bottom (-4,0) ref0? C = above-right of MB5 is out of
    # picture -> D = above-left = MB1 bottom -> refs A=0,D... compute:
    # matches = [A] and [D?] -> D ref==0 -> two matches -> median with
    # B=(0,0): median(x of a2, -4, 0), median(y of a2, 0, 0)
    mvsk2 = (int(np.median([a2[0], -4, 0])), int(np.median([a2[1], 0, 0])))
    assert np.array_equal(
        f1y[16:32, 32:48],
        scalar_mc_luma(yl, 32, 16, 16, 16, mvsk2[0], mvsk2[1]))


def test_p8x8_all_sub_partition_shapes():
    rng = np.random.default_rng(24)
    wmb, hmb = 2, 1
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps_r, pps_r = _make_sps_pps(wmb, hmb, 26)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    # MB0: sub types 8x8, 8x4, 4x8, 4x4 -> 1+2+2+4 = 9 sub-parts
    submvs = [(-3, 2), (5, 5), (0, -7), (2, 1), (-6, 0),
              (1, 1), (-1, 3), (4, -4), (0, 0)]
    plan = [("8x8", [0, 1, 2, 3], submvs, None),
            ("16x16", (0, 0), None)]
    rbsp = _encode_pframe(wmb, hmb, plan)
    f1y, f1cb, _ = H.decode_p_frame(sps, pps, rbsp, (y, cb, cr))
    yl = y.astype(np.int64)
    # reconstruct expected sub-partition layout
    parts = []
    k = 0
    for i8, s in enumerate([0, 1, 2, 3]):
        bx, by = (i8 % 2) * 2, (i8 // 2) * 2
        for (sx, sy, sw, sh) in H._SUB_PARTS[s]:
            parts.append(((bx + sx, by + sy, sw, sh), submvs[k]))
            k += 1
    assert k == 9
    for (px4, py4, w4, h4), mv in parts:
        got = f1y[py4 * 4:(py4 + h4) * 4, px4 * 4:(px4 + w4) * 4]
        want = scalar_mc_luma(yl, px4 * 4, py4 * 4, w4 * 4, h4 * 4, *mv)
        assert np.array_equal(got.astype(np.int64), want), (px4, py4, mv)
        gotc = f1cb[py4 * 2:(py4 + h4) * 2, px4 * 2:(px4 + w4) * 2]
        wantc = scalar_mc_chroma(cb.astype(np.int64), px4 * 2, py4 * 2,
                                 w4 * 2, h4 * 2, *mv)
        assert np.array_equal(gotc.astype(np.int64), wantc), (px4, py4)
    # MB1 (plain 16x16, mv 0): exact copy
    assert np.array_equal(f1y[0:16, 16:32], y[0:16, 16:32])


# ------------------------------------------------------------ B slices
def _b_expected_part(refs, used, mv0, mv1, x0, y0, w, h, chroma=False):
    """Expected B prediction via the INDEPENDENT scalar interpolator:
    single-list = the scalar MC; bi = rounded average of both."""
    mc = scalar_mc_chroma if chroma else scalar_mc_luma
    acc = []
    if 0 in used:
        acc.append(mc(refs[0], x0, y0, w, h, *mv0))
    if 1 in used:
        acc.append(mc(refs[1], x0, y0, w, h, *mv1))
    if len(acc) == 1:
        return acc[0]
    return (acc[0] + acc[1] + 1) >> 1


def test_b_frame_all_types_match_scalar_mc():
    """Every supported B mb_type family (16x16/16x8/8x16 × L0/L1/Bi
    combos) with fractional MVs, decoded through the full IPB stream,
    vs the independent scalar interpolator over the two anchors."""
    rng = np.random.default_rng(31)
    wmb, hmb = 4, 3
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs_p = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mvs_p[mby, mbx] = ((mbx * 3 + mby) % 7 - 3,
                               (mbx - mby * 2) % 5 - 2)
    shapes = ["16x16", "16x8", "8x16"]
    combos = [{0}, {1}, {0, 1}]
    specs = []
    k = 0
    for mb in range(wmb * hmb):
        shape = shapes[mb % 3]
        nparts = 1 if shape == "16x16" else 2
        parts = []
        for _ in range(nparts):
            used = combos[k % 3]
            mv0 = ((k * 5) % 13 - 6, (k * 7) % 11 - 5)
            mv1 = ((k * 3) % 9 - 4, (k * 11) % 15 - 7)
            parts.append((used, mv0, mv1))
            k += 1
        specs.append((shape, parts))
    stream = H.encode_ipb_stream(y, cb, cr, mvs_p, specs)
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 3
    assert np.array_equal(frames[0][0], y)
    ref0 = tuple(pl.astype(np.int64) for pl in frames[0])
    ref1 = tuple(pl.astype(np.int64) for pl in frames[1])
    fy, fcb, fcr = (pl.astype(np.int64) for pl in frames[2])
    geom = {"16x16": [(0, 0, 16, 16)],
            "16x8": [(0, 0, 16, 8), (0, 8, 16, 8)],
            "8x16": [(0, 0, 8, 16), (8, 0, 8, 16)]}
    for mb, (shape, parts) in enumerate(specs):
        mbx, mby = mb % wmb, mb // wmb
        for (px, py, w, h), (used, mv0, mv1) in zip(geom[shape], parts):
            x0, y0 = mbx * 16 + px, mby * 16 + py
            want = _b_expected_part((ref0[0], ref1[0]), used, mv0, mv1,
                                    x0, y0, w, h)
            got = fy[y0:y0 + h, x0:x0 + w]
            assert np.array_equal(got, want), (mb, shape, used)
            cx0, cy0, cw, ch = x0 // 2, y0 // 2, w // 2, h // 2
            wantb = _b_expected_part((ref0[1], ref1[1]), used, mv0,
                                     mv1, cx0, cy0, cw, ch, chroma=True)
            wantr = _b_expected_part((ref0[2], ref1[2]), used, mv0,
                                     mv1, cx0, cy0, cw, ch, chroma=True)
            assert np.array_equal(fcb[cy0:cy0 + ch, cx0:cx0 + cw], wantb)
            assert np.array_equal(fcr[cy0:cy0 + ch, cx0:cx0 + cw], wantr)


def test_b_frame_nonref_does_not_shift_p_reference():
    """A non-reference B between two anchors must NOT become a
    reference: a second P after the B still predicts from the P
    anchor, not the B."""
    rng = np.random.default_rng(32)
    wmb, hmb = 2, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs0 = np.zeros((hmb, wmb, 2), dtype=np.int64)
    specs = [("16x16", [({0, 1}, (4, 0), (0, 4))])] * (wmb * hmb)
    stream = H.encode_ipb_stream(y, cb, cr, mvs0, specs)
    # append another residual-free P (frame_num 2) — ref must be the
    # FIRST P (identical to I since mvs0 = 0), giving back the planes
    sc = b"\x00\x00\x00\x01"
    stream += sc + H._ep3b_escape(H.encode_p16_rbsp(
        np.zeros((hmb, wmb, 2), dtype=np.int64), frame_num=2,
        poc_lsb=8))
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 4
    assert np.array_equal(frames[3][0], frames[1][0])
    assert np.array_equal(frames[3][0], y)


def test_b_gates_direct_skip_and_8x8():
    rng = np.random.default_rng(33)
    wmb, hmb = 1, 1
    y = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    cbp = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2, poc_type=0)
    sps, pps = H.parse_sps(b"\x00" * 0 + sps_r), H.parse_pps(pps_r)
    ref = (y, cbp, cbp)

    def bslice(skip_run, mb_type):
        w = BitWriter()
        w.u(0x01, 8)
        w.ue(0)
        w.ue(1)  # B
        w.ue(0)
        w.u(2, 4)  # frame_num
        w.u(2, 4)  # poc_lsb
        w.u(1, 1)  # direct_spatial (temporal gates separately)
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        w.se(0)
        w.ue(1)
        w.ue(skip_run)
        if mb_type is not None:
            w.ue(mb_type)
        return w.rbsp(trailing=True)

    # direct modes decode only when the caller supplies the
    # colocated motion — the default sentinel gates loudly
    with pytest.raises(H.H264Unsupported, match="colocated motion"):
        H.decode_b_frame(sps, pps, bslice(1, None), ref, ref)
    with pytest.raises(H.H264Unsupported, match="colocated motion"):
        H.decode_b_frame(sps, pps, bslice(0, 0), ref, ref)
    # (B_8x8 is decoded now — its remaining gate, B_Direct_8x8, is
    # pinned in test_b_8x8_sub_partitions_match_scalar_mc)

    # temporal direct (direct_spatial_mv_pred_flag = 0) gates even
    # WITH colocated motion supplied
    w = BitWriter()
    w.u(0x01, 8)
    w.ue(0)
    w.ue(1)
    w.ue(0)
    w.u(2, 4)
    w.u(2, 4)
    w.u(0, 1)  # temporal direct
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)
    w.ue(1)  # skip run 1
    mv0 = np.zeros((4, 4, 2), dtype=np.int64)
    rf0 = np.zeros((4, 4), dtype=np.int64)
    with pytest.raises(H.H264Unsupported, match="temporal direct"):
        H.decode_b_frame(sps, pps, w.rbsp(trailing=True), ref, ref,
                         col_motion=(mv0, rf0))


def test_weighted_prediction_explicit_p():
    """Explicit WP (8.4.2.3.3) on a residual-free P frame with zero
    MVs: every sample must equal the closed form
    clip(((p*w + 2^(logWD-1)) >> logWD) + o), checked per plane with
    distinct weights, plus the logWD=0 path and the identity default
    when the per-ref flags are off."""
    rng = np.random.default_rng(41)
    wmb, hmb = 2, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, weighted_pred=True)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    mv0 = np.zeros((hmb, wmb, 2), dtype=np.int64)

    def dec(wp):
        rbsp = H.encode_p16_rbsp(mv0, wp=wp)
        return H.decode_p_frame(sps, pps, rbsp, (y, cb, cr))

    wp = {"log_y": 5, "wy": 48, "oy": -10,
          "log_c": 2, "wc": [3, 9], "oc": [7, -128]}
    fy, fcb, fcr = dec(wp)

    def wexp(p, l, w, o):
        p = p.astype(np.int64)
        v = ((p * w + (1 << (l - 1))) >> l) + o if l >= 1 else p * w + o
        return np.clip(v, 0, 255)

    assert np.array_equal(fy, wexp(y, 5, 48, -10))
    assert np.array_equal(fcb, wexp(cb, 2, 3, 7))
    assert np.array_equal(fcr, wexp(cr, 2, 9, -128))
    # logWD = 0 (no rounding shift)
    wp0 = {"log_y": 0, "wy": 2, "oy": 3,
           "log_c": 0, "wc": [1, 1], "oc": [0, 0]}
    fy0, fcb0, fcr0 = dec(wp0)
    assert np.array_equal(fy0, wexp(y, 0, 2, 3))
    assert np.array_equal(fcb0, cb) and np.array_equal(fcr0, cr)
    # default weights (w = 2^logWD, o = 0) are the identity
    wpid = {"log_y": 3, "wy": 8, "oy": 0,
            "log_c": 1, "wc": [2, 2], "oc": [0, 0]}
    fyi, fcbi, fcri = dec(wpid)
    assert np.array_equal(fyi, y)
    assert np.array_equal(fcbi, cb) and np.array_equal(fcri, cr)


def _b_weighted_expected(refs, used, mv0, mv1, x0, y0, w, h, wp,
                         plane, chroma=False):
    """Expected explicit-weighted B prediction via the INDEPENDENT
    scalar interpolator: uni = ((p*w + 2^(logWD-1)) >> logWD) + o
    (logWD >= 1; p*w + o at 0), bi = ((p0*w0 + p1*w1 + 2^logWD) >>
    (logWD+1)) + ((o0+o1+1) >> 1), clipped. ``plane`` selects the
    (logWD, w, o) tuple: 0 = luma, 1 = Cb, 2 = Cr."""
    mc = scalar_mc_chroma if chroma else scalar_mc_luma

    def _wo(d):
        if plane == 0:
            return d["wy"], d["oy"]
        return d["wc"][plane - 1], d["oc"][plane - 1]

    logwd = wp["log_y"] if plane == 0 else wp["log_c"]
    acc, wos = [], []
    if 0 in used:
        acc.append(mc(refs[0], x0, y0, w, h, *mv0))
        wos.append(_wo(wp["l"][0]))
    if 1 in used:
        acc.append(mc(refs[1], x0, y0, w, h, *mv1))
        wos.append(_wo(wp["l"][1]))
    if len(acc) == 1:
        (ww, oo), p = wos[0], acc[0]
        v = ((p * ww + (1 << (logwd - 1))) >> logwd) + oo \
            if logwd >= 1 else p * ww + oo
        return np.clip(v, 0, 255)
    (w0, o0), (w1, o1) = wos
    v = ((acc[0] * w0 + acc[1] * w1 + (1 << logwd)) >> (logwd + 1)) \
        + ((o0 + o1 + 1) >> 1)
    return np.clip(v, 0, 255)


def test_weighted_biprediction_explicit_b():
    """Explicit weighted bi-prediction (PPS weighted_bipred_idc = 1,
    8.4.2.3.2 eq. 8-274) through the full IPB stream: uni-L0 / uni-L1
    parts weight by their own list's entry exactly like a weighted P,
    bi parts combine at logWD+1 with the rounded offset average —
    per plane with distinct weights, fractional MVs, vs the
    independent scalar interpolator."""
    rng = np.random.default_rng(47)
    wmb, hmb = 3, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs_p = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mvs_p[mby, mbx] = ((mbx * 5 - mby) % 7 - 3,
                               (mby * 3 + mbx) % 5 - 2)
    combos = [{0}, {1}, {0, 1}]
    specs = []
    for mb in range(wmb * hmb):
        used = combos[mb % 3]
        mv0 = ((mb * 5) % 13 - 6, (mb * 7) % 11 - 5)
        mv1 = ((mb * 3) % 9 - 4, (mb * 11) % 15 - 7)
        specs.append(("16x16", [(used, mv0, mv1)]))
    wp = {"log_y": 5, "log_c": 2,
          "l": ({"wy": 40, "oy": -6, "wc": [3, 9], "oc": [5, -8]},
                {"wy": 20, "oy": 12, "wc": [5, 2], "oc": [-3, 4]})}
    stream = H.encode_ipb_stream(y, cb, cr, mvs_p, specs, b_wp=wp)
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 3
    ref0 = tuple(pl.astype(np.int64) for pl in frames[0])
    ref1 = tuple(pl.astype(np.int64) for pl in frames[1])
    fpl = [pl.astype(np.int64) for pl in frames[2]]
    for mb, (_, [(used, mv0, mv1)]) in enumerate(specs):
        mbx, mby = mb % wmb, mb // wmb
        x0, y0 = mbx * 16, mby * 16
        want = _b_weighted_expected((ref0[0], ref1[0]), used, mv0,
                                    mv1, x0, y0, 16, 16, wp, 0)
        assert np.array_equal(fpl[0][y0:y0 + 16, x0:x0 + 16], want), \
            (mb, used)
        for plane in (1, 2):
            wantc = _b_weighted_expected(
                (ref0[plane], ref1[plane]), used, mv0, mv1,
                x0 // 2, y0 // 2, 8, 8, wp, plane, chroma=True)
            got = fpl[plane][y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8]
            assert np.array_equal(got, wantc), (mb, used, plane)
    # identity weights (w = 2^logWD, o = 0 on both lists) must
    # reproduce the unweighted decode bit-exactly — eq. 8-274 with
    # identity weights reduces to the default rounded average
    wid = {"log_y": 3, "log_c": 1,
           "l": ({"wy": 8, "oy": 0, "wc": [2, 2], "oc": [0, 0]},
                 {"wy": 8, "oy": 0, "wc": [2, 2], "oc": [0, 0]})}
    f_id = H.decode_annexb_video(
        H.encode_ipb_stream(y, cb, cr, mvs_p, specs, b_wp=wid))[2]
    f_un = H.decode_annexb_video(
        H.encode_ipb_stream(y, cb, cr, mvs_p, specs))[2]
    for a, b in zip(f_id, f_un):
        assert np.array_equal(a, b)
    # logWD = 0 bi path: ((p0*w0 + p1*w1 + 1) >> 1) + offsets
    w0 = {"log_y": 0, "log_c": 0,
          "l": ({"wy": 1, "oy": 4, "wc": [1, 2], "oc": [0, -5]},
                {"wy": 2, "oy": -3, "wc": [1, 0], "oc": [6, 1]})}
    f0 = H.decode_annexb_video(
        H.encode_ipb_stream(y, cb, cr, mvs_p, specs, b_wp=w0))[2]
    fpl0 = [pl.astype(np.int64) for pl in f0]
    for mb, (_, [(used, mv0, mv1)]) in enumerate(specs):
        mbx, mby = mb % wmb, mb // wmb
        x0, y0 = mbx * 16, mby * 16
        want = _b_weighted_expected((ref0[0], ref1[0]), used, mv0,
                                    mv1, x0, y0, 16, 16, w0, 0)
        assert np.array_equal(fpl0[0][y0:y0 + 16, x0:x0 + 16], want)


def test_weighted_b_direct_and_skip():
    """Weights apply to B_Skip prediction too: a direct-zero-
    prediction MB (no usable neighbours ⇒ zero-MV bi with refIdx 0 on
    both lists) under explicit weights must equal the weighted bi
    combination of the two colocated reference blocks."""
    rng = np.random.default_rng(48)
    wmb, hmb = 2, 1
    y = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    cb = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    cr = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2,
                                       poc_type=0,
                                       weighted_bipred_idc=1)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    wp = {"log_y": 4, "log_c": 3,
          "l": ({"wy": 24, "oy": 2, "wc": [8, 4], "oc": [1, 0]},
                {"wy": 8, "oy": -4, "wc": [8, 16], "oc": [0, 3]})}
    # hand-write a B slice of two skips with the weight table present
    w = BitWriter()
    w.u(0x01, 8)
    w.ue(0)
    w.ue(1)  # slice_type B
    w.ue(0)
    w.u(2, 4)  # frame_num
    w.u(2, 4)  # poc_lsb
    w.u(1, 1)  # spatial direct
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.ue(wp["log_y"])
    w.ue(wp["log_c"])
    for d in wp["l"]:
        w.u(1, 1)
        w.se(d["wy"])
        w.se(d["oy"])
        w.u(1, 1)
        for c in (0, 1):
            w.se(d["wc"][c])
            w.se(d["oc"][c])
    w.se(0)  # qp delta
    w.ue(1)  # disable deblocking
    w.ue(2)  # mb_skip_run = 2 (both MBs skip)
    rbsp = w.rbsp()
    ref0 = (y, cb, cr)
    y1 = (y.astype(np.int64) // 2).astype(np.uint8)
    ref1 = (y1, cb, cr)
    fy, fcb, fcr = H.decode_b_frame(
        sps, pps, rbsp, ref0, ref1,
        col_motion=None)  # intra-style anchor: colZero false
    d0, d1 = wp["l"]

    def bi(a, b, logwd, w0_, w1_, o0, o1):
        a, b = a.astype(np.int64), b.astype(np.int64)
        return np.clip(((a * w0_ + b * w1_ + (1 << logwd))
                        >> (logwd + 1)) + ((o0 + o1 + 1) >> 1), 0, 255)

    assert np.array_equal(fy, bi(y, y1, wp["log_y"],
                                 d0["wy"], d1["wy"],
                                 d0["oy"], d1["oy"]))
    assert np.array_equal(fcb, bi(cb, cb, wp["log_c"],
                                  d0["wc"][0], d1["wc"][0],
                                  d0["oc"][0], d1["oc"][0]))
    assert np.array_equal(fcr, bi(cr, cr, wp["log_c"],
                                  d0["wc"][1], d1["wc"][1],
                                  d0["oc"][1], d1["oc"][1]))


def test_multislice_ipcm_picture():
    """An I_PCM picture split across 3 slices must reconstruct the
    exact planes (slices tile the macroblock raster; each slice's
    first_mb_in_slice drives the canvas placement)."""
    rng = np.random.default_rng(71)
    wmb, hmb = 4, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    stream = H.encode_ipcm_annexb(y, cb, cr, n_slices=3)
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 1  # ONE picture despite three slice NALs
    assert np.array_equal(frames[0][0], y)
    assert np.array_equal(frames[0][1], cb)
    assert np.array_equal(frames[0][2], cr)
    # the avcC/keyframe path must composite ALL slices, not just the
    # first: an AVCC sample whose payload is the 3-slice access unit
    nals = H.split_annexb(stream)
    payload = b"".join(len(s).to_bytes(4, "big") + s
                       for s in nals if s[0] & 0x1F == 5)
    rgb = H.decode_keyframe(payload, sps_rbsp=nals[0],
                            pps_rbsp=nals[1], length_size=4)
    want_rgb = H.yuv420_to_rgb(y, cb, cr)
    assert np.array_equal(rgb, want_rgb)


def test_multislice_p_picture_boundary_availability():
    """A P picture split into 2 slices: MV prediction must NOT see
    the first slice's macroblocks from the second slice (fresh
    per-slice grids on both sides), yet the reconstructed motion is
    the intended one — every MB equals the scalar MC resample."""
    rng = np.random.default_rng(72)
    wmb, hmb = 4, 3
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mvs[mby, mbx] = ((mbx * 5 + mby * 3) % 11 - 5,
                             (mby * 7 - mbx) % 9 - 4)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb)
    sc = b"\x00\x00\x00\x01"
    split = 5  # mid-row boundary: slice 2 starts inside row 1
    stream = (sc + H._ep3b_escape(sps_r) + sc + H._ep3b_escape(pps_r)
              + sc + H._ep3b_escape(H._ipcm_slice_rbsp(y, cb, cr))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(
                  mvs, frame_num=1, first_mb=0, n_mbs=split))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(
                  mvs, frame_num=1, first_mb=split)))
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 2  # I picture + ONE two-slice P picture
    ref = frames[0][0].astype(np.int64)
    fy = frames[1][0].astype(np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mv = tuple(int(v) for v in mvs[mby, mbx])
            x0, y0 = mbx * 16, mby * 16
            want = scalar_mc_luma(ref, x0, y0, 16, 16, *mv)
            assert np.array_equal(fy[y0:y0 + 16, x0:x0 + 16], want), \
                (mbx, mby)
    # single-slice decode of the same motion must agree exactly
    one = H.decode_annexb_video(
        sc + H._ep3b_escape(sps_r) + sc + H._ep3b_escape(pps_r)
        + sc + H._ep3b_escape(H._ipcm_slice_rbsp(y, cb, cr))
        + sc + H._ep3b_escape(H.encode_p16_rbsp(mvs, frame_num=1)))
    assert np.array_equal(one[1][0], frames[1][0])
    assert np.array_equal(one[1][1], frames[1][1])


def test_multislice_i16_dc_boundary_unavailability():
    """Slice boundaries make intra neighbours UNAVAILABLE: a 2-MB
    picture of DC-mode I_16x16 where MB0 carries a DC residual. In
    one slice, MB1's DC predicts from MB0's reconstructed left
    column; split into two slices, MB1 must fall back to 128."""
    wmb, hmb = 2, 1
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)

    def i16_dc_slice(first_mb, n_mbs, dc_levels_by_mb):
        w = BitWriter()
        w.u(0x65, 8)  # IDR
        w.ue(first_mb)
        w.ue(7)  # I slice
        w.ue(0)
        w.u(0, 4)
        w.ue(0)  # idr_pic_id
        w.u(1, 1)
        w.u(0, 1)
        w.se(0)  # slice_qp_delta (qp 26)
        w.ue(1)  # deblocking off
        nzY = np.full((hmb * 4, wmb * 4), -1, dtype=np.int64)
        for mb in range(first_mb, first_mb + n_mbs):
            mbx = mb % wmb
            w.ue(3)  # I_16x16: DC luma, cbp_chroma 0, cbp_luma 0
            w.ue(0)  # chroma DC mode
            w.se(0)  # mb_qp_delta
            gx, gy = mbx * 4, 0
            # Intra16x16DCLevel block (always present)
            nc = H._nc_from(nzY, gx, gy)
            tc = _write_residual(
                w, dc_levels_by_mb.get(mb, [0] * 16), nc)
            nzY[gy:gy + 4, gx:gx + 4] = tc  # decoder mirrors per-MB
        return w.rbsp(trailing=True)

    dc = {0: [40] + [0] * 15}  # a DC offset on MB0 only
    # single slice: MB1 sees MB0
    one = H.decode_i_frame(sps, pps, i16_dc_slice(0, 2, dc))
    # two slices: MB1 must NOT see MB0
    canvas = (np.zeros((16, 32), np.int64), np.zeros((8, 16), np.int64),
              np.zeros((8, 16), np.int64))
    H.decode_i_frame(sps, pps, i16_dc_slice(0, 1, dc), canvas=canvas)
    H.decode_i_frame(sps, pps, i16_dc_slice(1, 1, dc), canvas=canvas)
    two_y = canvas[0].astype(np.uint8)
    # MB0 identical either way, and NOT 128 (the residual moved it)
    assert np.array_equal(one[0][:, :16], two_y[:, :16])
    assert one[0][0, 0] != 128
    # MB1: single-slice predicts from MB0's column; split = flat 128
    assert np.all(two_y[:, 16:] == 128)
    assert not np.array_equal(one[0][:, 16:], two_y[:, 16:])
    # the stream decoder assembles the same two-slice picture
    sc = b"\x00\x00\x00\x01"
    frames = H.decode_annexb_video(
        sc + H._ep3b_escape(sps_r) + sc + H._ep3b_escape(pps_r)
        + sc + H._ep3b_escape(i16_dc_slice(0, 1, dc))
        + sc + H._ep3b_escape(i16_dc_slice(1, 1, dc)))
    assert len(frames) == 1
    assert np.array_equal(frames[0][0], two_y)


def test_multislice_tiling_errors():
    rng = np.random.default_rng(73)
    wmb, hmb = 2, 2
    y = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    c8 = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb)
    sc = b"\x00\x00\x00\x01"
    head = sc + H._ep3b_escape(sps_r) + sc + H._ep3b_escape(pps_r)
    # gap: slices 0..1 then 3.. (MB 2 missing)
    bad = (head
           + sc + H._ep3b_escape(H._ipcm_slice_rbsp(
               y, c8, c8, first_mb=0, n_mbs=2))
           + sc + H._ep3b_escape(H._ipcm_slice_rbsp(
               y, c8, c8, first_mb=3, n_mbs=1)))
    with pytest.raises(H.H264Error, match="tile|covered"):
        H.decode_annexb_video(bad)
    # short picture: trailing slice missing entirely
    short = head + sc + H._ep3b_escape(H._ipcm_slice_rbsp(
        y, c8, c8, first_mb=0, n_mbs=3))
    with pytest.raises(H.H264Error, match="covered"):
        H.decode_annexb_video(short)
    # continuation with no start
    orphan = head + sc + H._ep3b_escape(H._ipcm_slice_rbsp(
        y, c8, c8, first_mb=2, n_mbs=2))
    with pytest.raises(H.H264Error, match="without a start"):
        H.decode_annexb_video(orphan)


def _encode_p_multiref_slice(wmb, hmb, plan, n_refs, frame_num=1):
    """Test-side multi-reference P-slice writer (residual-free).
    ``plan`` per MB: ("16x16", [(ref, mv)]), ("16x8"/"8x16",
    [(ref0, mv0), (ref1, mv1)]), or ("8x8", [(sub_shape_idx, ref,
    [mv, ...]) x4]). Bit order per 7.3.5.1/2: all ref_idx (te),
    then all mvds."""
    w = BitWriter()
    w.u(0x61, 8)
    w.ue(0)
    w.ue(0)  # P
    w.ue(0)
    w.u(frame_num & 15, 4)
    w.u(1, 1)  # num_ref_idx_active_override_flag
    w.ue(n_refs - 1)
    w.u(0, 1)  # no list modification
    w.u(0, 1)  # dec_ref_pic_marking
    w.se(0)
    w.ue(1)  # deblocking off
    mvg = np.zeros((hmb * 4, wmb * 4, 2), dtype=np.int64)
    refg = np.full((hmb * 4, wmb * 4), H._NOT_DECODED, dtype=np.int64)

    def te(v):
        if n_refs == 2:
            w.u(1 - v, 1)
        else:
            w.ue(v)

    geom = {"16x16": [(0, 0, 4, 4, "")],
            "16x8": [(0, 0, 4, 2, "16x8_top"), (0, 2, 4, 2, "16x8_bot")],
            "8x16": [(0, 0, 2, 4, "8x16_left"),
                     (2, 0, 2, 4, "8x16_right")]}
    for mb, spec in enumerate(plan):
        mbx, mby = mb % wmb, mb // wmb
        gx, gy = mbx * 4, mby * 4
        w.ue(0)  # mb_skip_run
        shape = spec[0]
        if shape == "8x8":
            w.ue(3)  # P_8x8
            parts, prefs = [], []
            for i8, (shi, ref, mvs8) in enumerate(spec[1]):
                w.ue(shi)
                bx, by = (i8 % 2) * 2, (i8 // 2) * 2
                for (sx, sy, sw, shh), mv in zip(H._SUB_PARTS[shi],
                                                 mvs8):
                    parts.append((bx + sx, by + sy, sw, shh, ""))
                    prefs.append((ref, mv))
            for (_, ref, _) in spec[1]:
                te(ref)
        else:
            w.ue({"16x16": 0, "16x8": 1, "8x16": 2}[shape])
            parts = geom[shape]
            prefs = list(spec[1])
            for (ref, _) in prefs:
                te(ref)
        for (px4, py4, w4, h4, shp), (ref, mv) in zip(parts, prefs):
            p = H._mv_pred(mvg, refg, gx + px4, gy + py4, w4, h4,
                           ref, shp)
            w.se(mv[0] - p[0])
            w.se(mv[1] - p[1])
            mvg[gy + py4:gy + py4 + h4, gx + px4:gx + px4 + w4] = mv
            refg[gy + py4:gy + py4 + h4, gx + px4:gx + px4 + w4] = ref
        w.ue(H._CBP_INTER_INV[0])  # cbp 0
    return w.rbsp()


def test_p_multiref_16x16_end_to_end():
    """Two-reference P through the full stream decoder: I, P1, then
    P2 whose MBs alternate ref 0 (= P1, most recent) and ref 1 (= I)
    with fractional MVs — each MB must equal the scalar MC resample
    of the reference its te(v)-coded ref_idx picked."""
    rng = np.random.default_rng(61)
    wmb, hmb = 4, 3
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mv1 = np.zeros((hmb, wmb, 2), dtype=np.int64)
    mv2 = np.zeros((hmb, wmb, 2), dtype=np.int64)
    ri2 = np.zeros((hmb, wmb), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mv1[mby, mbx] = ((mbx * 3 - mby) % 9 - 4,
                             (mby * 5 + mbx) % 7 - 3)
            mv2[mby, mbx] = ((mbx * 7 + mby * 2) % 11 - 5,
                             (mbx - mby * 3) % 13 - 6)
            ri2[mby, mbx] = (mbx + mby) % 2
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2)
    sc = b"\x00\x00\x00\x01"
    stream = (sc + H._ep3b_escape(sps_r) + sc + H._ep3b_escape(pps_r)
              + sc + H._ep3b_escape(H._ipcm_slice_rbsp(y, cb, cr))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(mv1,
                                                      frame_num=1))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(
                  mv2, frame_num=2, n_refs=2, refs_idx=ri2)))
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 3
    refs = [tuple(pl.astype(np.int64) for pl in frames[1]),
            tuple(pl.astype(np.int64) for pl in frames[0])]
    f2 = [pl.astype(np.int64) for pl in frames[2]]
    for mby in range(hmb):
        for mbx in range(wmb):
            ri = int(ri2[mby, mbx])
            mv = tuple(int(v) for v in mv2[mby, mbx])
            x0, y0 = mbx * 16, mby * 16
            want = scalar_mc_luma(refs[ri][0], x0, y0, 16, 16, *mv)
            assert np.array_equal(f2[0][y0:y0 + 16, x0:x0 + 16],
                                  want), (mbx, mby, ri)
            wantc = scalar_mc_chroma(refs[ri][1], x0 // 2, y0 // 2,
                                     8, 8, *mv)
            assert np.array_equal(
                f2[1][y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8], wantc)


def test_p_multiref_partitions_three_refs():
    """Three active references (te(v) falls back to ue) across every
    partition shape, decoded directly against a 3-entry RefPicList0 —
    per-partition refs differ inside one MB, so the 8.4.1.3
    predictor's ref-match rules are exercised across refs."""
    rng = np.random.default_rng(62)
    wmb, hmb = 3, 2
    refs = []
    for k in range(3):
        y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
        cbp = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
        crp = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
        refs.append((y, cbp, crp))
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=3)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    plan = [
        ("16x16", [(2, (3, -5))]),
        ("16x8", [(0, (1, 2)), (2, (-3, 1))]),
        ("8x16", [(1, (4, 4)), (0, (-1, -2))]),
        ("8x8", [(0, 1, [(1, 0)]), (1, 0, [(0, 1), (2, -1)]),
                 (2, 2, [(3, 3), (1, -2)]), (3, 1, [(1, 1), (-1, 0),
                                                    (0, -1), (2, 2)])]),
        ("16x16", [(1, (0, 0))]),
        ("16x8", [(1, (5, -2)), (1, (5, -2))]),
    ]
    rbsp = _encode_p_multiref_slice(wmb, hmb, plan, n_refs=3)
    fy, fcb, fcr = H.decode_p_frame(sps, pps, rbsp, list(refs))
    fy = fy.astype(np.int64)
    geom = {"16x16": [(0, 0, 16, 16, "")],
            "16x8": [(0, 0, 16, 8, ""), (0, 8, 16, 8, "")],
            "8x16": [(0, 0, 8, 16, ""), (8, 0, 8, 16, "")]}
    for mb, spec in enumerate(plan):
        mbx, mby = mb % wmb, mb // wmb
        if spec[0] == "8x8":
            parts, prefs = [], []
            for i8, (shi, ref, mvs8) in enumerate(spec[1]):
                bx, by = (i8 % 2) * 2, (i8 // 2) * 2
                for (sx, sy, sw, shh), mv in zip(H._SUB_PARTS[shi],
                                                 mvs8):
                    parts.append(((bx + sx) * 4, (by + sy) * 4,
                                  sw * 4, shh * 4))
                    prefs.append((ref, mv))
        else:
            parts = [(px, py, w, h) for (px, py, w, h, _)
                     in geom[spec[0]]]
            prefs = list(spec[1])
        for (px, py, w, h), (ref, mv) in zip(parts, prefs):
            x0, y0 = mbx * 16 + px, mby * 16 + py
            want = scalar_mc_luma(refs[ref][0].astype(np.int64),
                                  x0, y0, w, h, *mv)
            got = fy[y0:y0 + h, x0:x0 + w]
            assert np.array_equal(got, want), (mb, spec[0], ref, mv)


def test_p_multiref_gates():
    """What stays gated or errors: a multi-reference B slice handed
    fewer references than it activates, weighted prediction over
    multiple references, temporal direct whose colocated block
    predicts from ref_idx > 0."""
    wmb, hmb = 1, 1
    y = np.zeros((16, 16), dtype=np.uint8)
    c8 = np.zeros((8, 8), dtype=np.uint8)
    ref = (y, c8, c8)
    # B activating 2 L0 refs but handed single-entry lists
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2,
                                       poc_type=0)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    w = BitWriter()
    w.u(0x01, 8)
    w.ue(0)
    w.ue(1)  # B
    w.ue(0)
    w.u(2, 4)
    w.u(2, 4)
    w.u(1, 1)
    w.u(1, 1)  # override
    w.ue(1)  # n_l0 = 2
    w.ue(0)  # n_l1 = 1
    w.u(0, 1)  # no list modification l0
    w.u(0, 1)  # no list modification l1
    w.se(0)  # qp delta
    w.ue(1)  # deblocking off
    with pytest.raises(H.H264Error, match="references"):
        H.decode_b_frame(sps, pps, w.rbsp(trailing=True), ref, ref)
    # weighted P with 2 refs
    sps_w, pps_w = H._seq_header_rbsps(wmb, hmb, max_ref=2,
                                       weighted_pred=True)
    spsw, ppsw = H.parse_sps(sps_w), H.parse_pps(pps_w)
    w2 = BitWriter()
    w2.u(0x61, 8)
    w2.ue(0)
    w2.ue(0)  # P
    w2.ue(0)
    w2.u(1, 4)
    w2.u(1, 1)
    w2.ue(1)  # n_l0 = 2
    with pytest.raises(H.H264Unsupported):
        H.decode_p_frame(spsw, ppsw, w2.rbsp(), [ref, ref])
    # temporal direct over colocated refIdx > 0
    cmv = np.zeros((4, 4, 2), dtype=np.int64)
    cref = np.zeros((4, 4), dtype=np.int64)
    cref[0, 0] = 1
    with pytest.raises(H.H264Unsupported):
        H._temporal_direct((cmv, cref), 0, 0, (2, 0, 4))


def test_b_multiref_explicit():
    """Multi-reference B lists end-to-end: I(0), P1(4), P2(8) then a
    B at POC 6 with n_refs (2, 2) — RefPicList0 = [P1, I] (past by
    POC descending), RefPicList1 = [P2, P1] (future ascending, then
    past). Each partition's te(v)-coded per-list ref_idx picks its
    reference; every MB must equal the scalar-MC combination over the
    SELECTED references."""
    rng = np.random.default_rng(81)
    wmb, hmb = 4, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mv1 = np.zeros((hmb, wmb, 2), dtype=np.int64)
    mv2 = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mv1[mby, mbx] = ((mbx * 3 + mby) % 7 - 3,
                             (mbx - mby) % 5 - 2)
            mv2[mby, mbx] = ((mby * 5 - mbx) % 9 - 4,
                             (mbx * 2 + mby) % 7 - 3)
    combos = [{0}, {1}, {0, 1}]
    specs = []
    for mb in range(wmb * hmb):
        used = combos[mb % 3]
        mv0 = ((mb * 5) % 13 - 6, (mb * 7) % 11 - 5)
        mvb = ((mb * 3) % 9 - 4, (mb * 11) % 15 - 7)
        ri0, ri1 = mb % 2, (mb // 2) % 2
        specs.append(("16x16", [(used, mv0, mvb, ri0, ri1)]))
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=3,
                                       poc_type=0)
    sc = b"\x00\x00\x00\x01"
    stream = (sc + H._ep3b_escape(sps_r) + sc + H._ep3b_escape(pps_r)
              + sc + H._ep3b_escape(H._ipcm_slice_rbsp(y, cb, cr,
                                                       poc_lsb=0))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(
                  mv1, frame_num=1, poc_lsb=4))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(
                  mv2, frame_num=2, poc_lsb=8))
              + sc + H._ep3b_escape(H.encode_b_rbsp(
                  specs, wmb, hmb, frame_num=3, poc_lsb=6,
                  n_refs=(2, 2))))
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 4
    l0 = [tuple(pl.astype(np.int64) for pl in frames[1]),  # P1
          tuple(pl.astype(np.int64) for pl in frames[0])]  # I
    l1 = [tuple(pl.astype(np.int64) for pl in frames[2]),  # P2
          tuple(pl.astype(np.int64) for pl in frames[1])]  # P1
    fy = frames[3][0].astype(np.int64)
    fcb = frames[3][1].astype(np.int64)
    for mb, (_, [(used, mv0, mvb, ri0, ri1)]) in enumerate(specs):
        mbx, mby = mb % wmb, mb // wmb
        x0, y0 = mbx * 16, mby * 16
        acc = []
        if 0 in used:
            acc.append(scalar_mc_luma(l0[ri0][0], x0, y0, 16, 16,
                                      *mv0))
        if 1 in used:
            acc.append(scalar_mc_luma(l1[ri1][0], x0, y0, 16, 16,
                                      *mvb))
        want = acc[0] if len(acc) == 1 else (acc[0] + acc[1] + 1) >> 1
        assert np.array_equal(fy[y0:y0 + 16, x0:x0 + 16], want), \
            (mb, used, ri0, ri1)
        accc = []
        if 0 in used:
            accc.append(scalar_mc_chroma(l0[ri0][1], x0 // 2,
                                         y0 // 2, 8, 8, *mv0))
        if 1 in used:
            accc.append(scalar_mc_chroma(l1[ri1][1], x0 // 2,
                                         y0 // 2, 8, 8, *mvb))
        wantc = accc[0] if len(accc) == 1 \
            else (accc[0] + accc[1] + 1) >> 1
        assert np.array_equal(
            fcb[y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8], wantc)


def test_spatial_direct_minpositive_refidx():
    """8.4.1.2.2 with multi-reference neighbours: refIdxLX =
    MinPositive over A/B/C — a lone L0 neighbour at ref 1 makes the
    direct block predict from list0[1] (not 0), and colZeroFlag must
    NOT zero a non-zero refIdx list."""
    mvg = {lx: np.zeros((8, 8, 2), dtype=np.int64) for lx in (0, 1)}
    refg = {lx: np.full((8, 8), H._NOT_DECODED, dtype=np.int64)
            for lx in (0, 1)}
    # left neighbour MB (grid cols 0..3): L0 ref 1, mv (6, -2)
    refg[0][:4, :4] = 1
    mvg[0][:4, :4] = (6, -2)
    refg[1][:4, :4] = -1
    # colocated motion says "still" everywhere (would colZero ref-0)
    cmv = np.zeros((8, 8, 2), dtype=np.int64)
    cref = np.zeros((8, 8), dtype=np.int64)
    rid, mv4 = H._spatial_direct(mvg, refg, (cmv, cref), 4, 0)
    assert rid == {0: 1, 1: -1}
    # refIdx 1: colZero does not apply — the only-A candidate holds
    assert tuple(mv4[0][0, 0]) == (6, -2)
    # at (4,4): A and B unavailable, C outside → D substitution
    # reaches the seeded block's corner (3,3) with ref 1 — the
    # refIdx rides the substitution
    rid2, mv42 = H._spatial_direct(mvg, refg, (cmv, cref), 4, 4)
    assert rid2 == {0: 1, 1: -1}
    assert tuple(mv42[0][0, 0]) == (6, -2)
    # fully isolated position: every neighbour unavailable →
    # directZeroPrediction (refIdx 0 both lists, zero MVs)
    mvg0 = {lx: np.zeros((8, 8, 2), dtype=np.int64) for lx in (0, 1)}
    refg0 = {lx: np.full((8, 8), H._NOT_DECODED, dtype=np.int64)
             for lx in (0, 1)}
    rid3, mv43 = H._spatial_direct(mvg0, refg0, (cmv, cref), 4, 4)
    assert rid3 == {0: 0, 1: 0}
    assert (mv43[0] == 0).all() and (mv43[1] == 0).all()


def test_implicit_weights_unit():
    """8.4.2.3.1 weight derivation: symmetric anchors give (32, 32)
    — which also makes eq. (p0·32 + p1·32 + 32) >> 6 equal the
    default rounded average; a B twice as close to ref0 gives
    (48, 16); td = 0 and out-of-range scaled weights default."""
    assert H._implicit_weights((2, 0, 4)) == (32, 32)
    assert H._implicit_weights((2, 0, 8)) == (48, 16)
    assert H._implicit_weights((6, 0, 8)) == (16, 48)
    assert H._implicit_weights((2, 4, 4)) == (32, 32)   # td = 0
    assert H._implicit_weights((100, 0, 1)) == (32, 32)  # w1 > 128


def test_implicit_biprediction_b():
    """Implicit weighted bi-prediction end-to-end (PPS
    weighted_bipred_idc = 2): POCs I 0, B 2, P 8 give (w0, w1) =
    (48, 16); bi parts must equal ((p0·48 + p1·16 + 32) >> 6) over
    the scalar-MC interpolations, uni parts stay UNWEIGHTED."""
    rng = np.random.default_rng(53)
    wmb, hmb = 3, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs_p = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mvs_p[mby, mbx] = ((mbx * 3 + mby) % 7 - 3,
                               (mbx - mby * 2) % 5 - 2)
    combos = [{0}, {1}, {0, 1}]
    specs = []
    for mb in range(wmb * hmb):
        used = combos[mb % 3]
        mv0 = ((mb * 5) % 13 - 6, (mb * 7) % 11 - 5)
        mv1 = ((mb * 3) % 9 - 4, (mb * 11) % 15 - 7)
        specs.append(("16x16", [(used, mv0, mv1)]))
    stream = H.encode_ipb_stream(y, cb, cr, mvs_p, specs,
                                 implicit_bipred=True,
                                 poc_lsbs=(0, 8, 2))
    frames = H.decode_annexb_video(stream)
    ref0 = tuple(pl.astype(np.int64) for pl in frames[0])
    ref1 = tuple(pl.astype(np.int64) for pl in frames[1])
    fpl = [pl.astype(np.int64) for pl in frames[2]]
    for mb, (_, [(used, mv0, mv1)]) in enumerate(specs):
        mbx, mby = mb % wmb, mb // wmb
        x0, y0 = mbx * 16, mby * 16
        for plane, (cx0, cy0, cw, chroma) in (
                (0, (x0, y0, 16, False)),
                (1, (x0 // 2, y0 // 2, 8, True)),
                (2, (x0 // 2, y0 // 2, 8, True))):
            mc = scalar_mc_chroma if chroma else scalar_mc_luma
            px, py = cx0, cy0
            if used == {0, 1}:
                p0 = mc(ref0[plane], px, py, cw, cw, *mv0)
                p1 = mc(ref1[plane], px, py, cw, cw, *mv1)
                want = np.clip((p0 * 48 + p1 * 16 + 32) >> 6, 0, 255)
            elif used == {0}:
                want = mc(ref0[plane], px, py, cw, cw, *mv0)
            else:
                want = mc(ref1[plane], px, py, cw, cw, *mv1)
            got = fpl[plane][py:py + cw, px:px + cw]
            assert np.array_equal(got, want), (mb, used, plane)


def _temporal_expected_mvs(mvcol, poc_c, poc0, poc1):
    """Independent transcription of 8.4.1.2.3 for the tests."""
    tb = min(127, max(-128, poc_c - poc0))
    td = min(127, max(-128, poc1 - poc0))
    if td == 0:
        return mvcol, (0, 0)
    q = 16384 + (abs(td) >> 1)
    tx = q // td if td > 0 else -(q // (-td))
    dsf = min(1023, max(-1024, (tb * tx + 32) >> 6))
    l0 = ((dsf * mvcol[0] + 128) >> 8, (dsf * mvcol[1] + 128) >> 8)
    return l0, (l0[0] - mvcol[0], l0[1] - mvcol[1])


def test_temporal_direct_unit():
    """_temporal_direct against hand-computed spec values: tb=2 td=4
    gives DistScaleFactor 128; odd mvCol components round per
    (128·mv + 128) >> 8; intra colocated blocks contribute mvCol 0;
    td=0 takes the mvL0=mvCol / mvL1=0 fallback."""
    cmv = np.zeros((4, 4, 2), dtype=np.int64)
    cref = np.zeros((4, 4), dtype=np.int64)
    cmv[0, 0] = (5, -7)
    cmv[0, 1] = (8, 8)
    cref[1, 1] = -1  # intra colocated
    cmv[1, 1] = (99, 99)  # must be ignored
    rid, mv4 = H._temporal_direct((cmv, cref), 0, 0, (2, 0, 4))
    assert rid == {0: 0, 1: 0}
    # (5,-7): mvL0 = ((128*5+128)>>8, (128*-7+128)>>8) = (3, -3)
    assert tuple(mv4[0][0, 0]) == (3, -3)
    assert tuple(mv4[1][0, 0]) == (3 - 5, -3 + 7)
    assert tuple(mv4[0][0, 1]) == (4, 4)
    assert tuple(mv4[1][0, 1]) == (-4, -4)
    assert tuple(mv4[0][1, 1]) == (0, 0)
    assert tuple(mv4[1][1, 1]) == (0, 0)
    # td = 0 fallback
    used0, mv40 = H._temporal_direct((cmv, cref), 0, 0, (2, 4, 4))
    assert tuple(mv40[0][0, 0]) == (5, -7)
    assert tuple(mv40[1][0, 0]) == (0, 0)
    # col None: zero motion everywhere
    usedn, mv4n = H._temporal_direct(None, 0, 0, (2, 0, 4))
    assert (mv4n[0] == 0).all() and (mv4n[1] == 0).all()


def test_b_temporal_direct_end_to_end():
    """Temporal direct through the full stream decoder
    (encode_ipb_direct_stream spatial=False): per MB, the derived
    (mvL0, mvL1) come from the spec scaling of the colocated P MV
    (incl. fractional results from odd-qpel colocated MVs), the
    prediction is the rounded average of both anchors' scalar-MC
    resamples — POCs tracked from the slice headers (I 0, P 4, B 2:
    tb=2, td=4, DSF=128)."""
    rng = np.random.default_rng(51)
    wmb, hmb = 4, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs_p = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            # a mix of even/odd qpel so derived MVs hit fractional taps
            mvs_p[mby, mbx] = ((mbx * 7 + mby * 3) % 17 - 8,
                               (mbx * 5 - mby * 9) % 13 - 6)
    stream = H.encode_ipb_direct_stream(y, cb, cr, mvs_p,
                                        spatial=False)
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 3
    ref0 = tuple(pl.astype(np.int64) for pl in frames[0])
    ref1 = tuple(pl.astype(np.int64) for pl in frames[1])
    fy, fcb, fcr = (pl.astype(np.int64) for pl in frames[2])
    for mb in range(wmb * hmb):
        mbx, mby = mb % wmb, mb // wmb
        mvcol = tuple(int(v) for v in mvs_p[mby, mbx])
        l0, l1 = _temporal_expected_mvs(mvcol, 2, 0, 4)
        x0, y0 = mbx * 16, mby * 16
        w0 = scalar_mc_luma(ref0[0], x0, y0, 16, 16, *l0)
        w1 = scalar_mc_luma(ref1[0], x0, y0, 16, 16, *l1)
        assert np.array_equal(fy[y0:y0 + 16, x0:x0 + 16],
                              (w0 + w1 + 1) >> 1), (mb, mvcol, l0, l1)
        for plane, got in ((1, fcb), (2, fcr)):
            c0 = scalar_mc_chroma(ref0[plane], x0 // 2, y0 // 2,
                                  8, 8, *l0)
            c1 = scalar_mc_chroma(ref1[plane], x0 // 2, y0 // 2,
                                  8, 8, *l1)
            assert np.array_equal(
                got[y0 // 2:y0 // 2 + 8, x0 // 2:x0 // 2 + 8],
                (c0 + c1 + 1) >> 1), (mb, plane)


def test_b_temporal_direct_poc_wrap():
    """POC MSB wrap (8.2.1.1): a stream whose poc_lsb wraps its 4-bit
    range — I lsb 0, P lsb 14, P lsb 2 (⇒ poc 18), B lsb 0 (⇒ poc 16,
    between the anchors at 14 and 18: tb=2, td=4) — must decode the
    temporal-direct B against the correct anchors with DSF 128."""
    rng = np.random.default_rng(52)
    wmb, hmb = 2, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2, poc_type=0)
    sc = b"\x00\x00\x00\x01"
    mv1 = np.zeros((hmb, wmb, 2), dtype=np.int64)
    mv2 = np.zeros((hmb, wmb, 2), dtype=np.int64)
    for mby in range(hmb):
        for mbx in range(wmb):
            mv1[mby, mbx] = (4 * (mbx - 1), 4 * (mby - 1))
            mv2[mby, mbx] = ((mbx * 9 + mby) % 11 - 5,
                             (mby * 7 - mbx) % 9 - 4)
    stream = (sc + H._ep3b_escape(sps_r) + sc + H._ep3b_escape(pps_r)
              + sc + H._ep3b_escape(H._ipcm_slice_rbsp(y, cb, cr,
                                                       poc_lsb=0))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(
                  mv1, frame_num=1, poc_lsb=14))
              + sc + H._ep3b_escape(H.encode_p16_rbsp(
                  mv2, frame_num=2, poc_lsb=2))
              + sc + H._ep3b_escape(H.encode_b_skip_rbsp(
                  wmb, hmb, spatial=False, frame_num=3, poc_lsb=0)))
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 4
    refa = frames[1][0].astype(np.int64)  # P at poc 14 = list 0
    refb = frames[2][0].astype(np.int64)  # P at poc 18 = list 1
    fy = frames[3][0].astype(np.int64)
    for mb in range(wmb * hmb):
        mbx, mby = mb % wmb, mb // wmb
        mvcol = tuple(int(v) for v in mv2[mby, mbx])
        l0, l1 = _temporal_expected_mvs(mvcol, 16, 14, 18)
        x0, y0 = mbx * 16, mby * 16
        w0 = scalar_mc_luma(refa, x0, y0, 16, 16, *l0)
        w1 = scalar_mc_luma(refb, x0, y0, 16, 16, *l1)
        assert np.array_equal(fy[y0:y0 + 16, x0:x0 + 16],
                              (w0 + w1 + 1) >> 1), (mb, mvcol)


def _encode_b_direct_slice(wmb, hmb, plan, frame_num=2, poc_lsb=2):
    """Minimal B-slice writer for direct-mode tests: plan entries are
    ("skip",), ("direct",), or ("l0"/"l1"/"bi", mv0, mv1) 16x16 MBs.
    Residual-free. Mirrors the decoder's grids for explicit mvds only
    (direct MBs consume no MV bits)."""
    w = BitWriter()
    w.u(0x01, 8)
    w.ue(0)
    w.ue(1)  # B
    w.ue(0)
    w.u(frame_num & 15, 4)
    w.u(poc_lsb & 15, 4)
    w.u(1, 1)  # direct_spatial_mv_pred_flag = 1 (spatial)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)
    mvg = {lx: np.zeros((hmb * 4, wmb * 4, 2), dtype=np.int64)
           for lx in (0, 1)}
    refg = {lx: np.full((hmb * 4, wmb * 4), H._NOT_DECODED,
                        dtype=np.int64) for lx in (0, 1)}
    run = 0
    for mb, spec in enumerate(plan):
        mbx, mby = mb % wmb, mb // wmb
        gx, gy = mbx * 4, mby * 4
        if spec[0] == "skip":
            run += 1
            rid, mv4 = H._spatial_direct(mvg, refg, None, gx, gy)
            for lx in (0, 1):
                if rid[lx] >= 0:
                    mvg[lx][gy:gy + 4, gx:gx + 4] = mv4[lx]
                    refg[lx][gy:gy + 4, gx:gx + 4] = rid[lx]
                else:
                    refg[lx][gy:gy + 4, gx:gx + 4] = -1
            continue
        w.ue(run)
        run = 0
        if spec[0] == "direct":
            w.ue(0)  # B_Direct_16x16
            rid, mv4 = H._spatial_direct(mvg, refg, None, gx, gy)
            for lx in (0, 1):
                if rid[lx] >= 0:
                    mvg[lx][gy:gy + 4, gx:gx + 4] = mv4[lx]
                    refg[lx][gy:gy + 4, gx:gx + 4] = rid[lx]
                else:
                    refg[lx][gy:gy + 4, gx:gx + 4] = -1
            w.ue(H._CBP_INTER_INV[0])
            continue
        mode, mv0, mv1 = spec
        used = {"l0": {0}, "l1": {1}, "bi": {0, 1}}[mode]
        w.ue({"l0": 1, "l1": 2, "bi": 3}[used == {0} and "l0"
                                         or (used == {1} and "l1")
                                         or "bi"])
        for lx in (0, 1):
            if lx not in used:
                refg[lx][gy:gy + 4, gx:gx + 4] = -1
                mvg[lx][gy:gy + 4, gx:gx + 4] = 0
        for lx in (0, 1):
            if lx not in used:
                continue
            mv = mv0 if lx == 0 else mv1
            pmv = H._mv_pred(mvg[lx], refg[lx], gx, gy, 4, 4, 0)
            w.se(mv[0] - pmv[0])
            w.se(mv[1] - pmv[1])
            mvg[lx][gy:gy + 4, gx:gx + 4] = mv
            refg[lx][gy:gy + 4, gx:gx + 4] = 0
        w.ue(H._CBP_INTER_INV[0])
    if run:
        w.ue(run)
    return w.rbsp()


def test_b_spatial_direct_and_skip():
    """Spatial direct on hand-computable cases: (1) a first-MB B_Skip
    has no neighbors → zero-MV bi (average of the anchors in place);
    (2) a direct MB whose only neighbor is an L0 MB inherits L0-only
    prediction with the neighbor's MV as candidate; (3) colZeroFlag —
    colocated P blocks with refIdx 0 and |mv| ≤ 1 qpel — zeroes the
    candidate, larger colocated MVs keep it."""
    rng = np.random.default_rng(51)
    wmb, hmb = 3, 1
    y = rng.integers(0, 256, (16, wmb * 16)).astype(np.uint8)
    cbp = rng.integers(0, 256, (8, wmb * 8)).astype(np.uint8)
    crp = rng.integers(0, 256, (8, wmb * 8)).astype(np.uint8)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2, poc_type=0)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    # P anchor: MB0 mv (0,0) [colZero true], MB1 mv (8,4) [false],
    # MB2 mv (0,1) [|mv|<=1 qpel → colZero true]
    mvs_p = np.array([[[0, 0], [8, 4], [0, 1]]], dtype=np.int64)
    p_rbsp = H.encode_p16_rbsp(mvs_p, frame_num=1, poc_lsb=4)
    ref0 = (y, cbp, crp)
    f1, col = H.decode_p_frame(sps, pps, p_rbsp, ref0,
                               return_motion=True)

    # B: MB0 = skip (no neighbors → zero-MV bi);
    #    MB1 = explicit L0 with mv (4,0);
    #    MB2 = direct (neighbor A = MB1: L0-only, candidate (4,0);
    #          colocated P MB2 has colZero TRUE → mv zeroed → copy f0)
    plan = [("skip",), ("l0", (4, 0), None), ("direct",)]
    rbsp = _encode_b_direct_slice(wmb, hmb, plan)
    fb = H.decode_b_frame(sps, pps, rbsp, ref0, f1, col_motion=col)

    y0 = y.astype(np.int64)
    f1y = f1[0].astype(np.int64)
    # MB0: zero-MV bi = rounded average of the two anchors in place
    want0 = (y0[:, :16] + f1y[:, :16] + 1) >> 1
    assert np.array_equal(fb[0][:, :16].astype(np.int64), want0)
    # MB2: direct L0-only, colZero zeroes the MV → copy of ref0
    assert np.array_equal(fb[0][:, 32:48], y[:, 32:48])

    # flip the colocated condition: P MB2 mv large → candidate kept
    mvs_p2 = np.array([[[0, 0], [8, 4], [16, 0]]], dtype=np.int64)
    p2 = H.encode_p16_rbsp(mvs_p2, frame_num=1, poc_lsb=4)
    f1b, col2 = H.decode_p_frame(sps, pps, p2, ref0,
                                 return_motion=True)
    fb2 = H.decode_b_frame(sps, pps, rbsp, ref0, f1b, col_motion=col2)
    # candidate (4,0) = full-pel (1,0) shift of ref0, edge-clamped
    want2 = scalar_mc_luma(y0, 32, 0, 16, 16, 4, 0)
    assert np.array_equal(fb2[0][:, 32:48].astype(np.int64), want2)

    # end-to-end through the stream decoder (motion rides the refs)
    stream = H.encode_ipb_stream(
        y, cbp, crp, mvs_p,
        [("16x16", [({0, 1}, (0, 0), (0, 0))])] * wmb)
    sc = b"\x00\x00\x00\x01"
    stream += sc + H._ep3b_escape(rbsp)
    frames = H.decode_annexb_video(stream)
    assert len(frames) == 4
    assert np.array_equal(frames[3][0], fb[0])


def test_b_8x8_sub_partitions_match_scalar_mc():
    """B_8x8 with every sub shape (8x8/8x4/4x8/4x4) across L0/L1/Bi,
    fractional MVs, vs the independent scalar interpolator."""
    rng = np.random.default_rng(61)
    wmb, hmb = 2, 2
    y = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    mvs_p = np.zeros((hmb, wmb, 2), dtype=np.int64)
    mvs_p[:, :] = (6, -3)
    combos = [{0}, {1}, {0, 1}]
    specs = []
    k = 0
    for mb in range(wmb * hmb):
        sub = []
        for i8 in range(4):
            shi = (mb + i8) % 4
            used = combos[k % 3]
            nparts = len(H._SUB_PARTS[shi])
            mvs8 = []
            for _ in range(nparts):
                mvs8.append((((k * 5) % 13 - 6, (k * 7) % 11 - 5),
                             ((k * 3) % 9 - 4, (k * 11) % 15 - 7)))
                k += 1
            sub.append((used, shi, mvs8))
        specs.append(("8x8", sub))
    stream = H.encode_ipb_stream(y, cb, cr, mvs_p, specs)
    frames = H.decode_annexb_video(stream)
    ref0 = tuple(pl.astype(np.int64) for pl in frames[0])
    ref1 = tuple(pl.astype(np.int64) for pl in frames[1])
    fy = frames[2][0].astype(np.int64)
    fcb = frames[2][1].astype(np.int64)
    for mb, (_, sub) in enumerate(specs):
        mbx, mby = mb % wmb, mb // wmb
        for i8, (used, shi, mvs8) in enumerate(sub):
            bx0, by0 = (i8 % 2) * 8, (i8 // 2) * 8
            for (sx, sy, sw, sh), (mv0, mv1) in zip(
                    H._SUB_PARTS[shi], mvs8):
                x0 = mbx * 16 + bx0 + sx * 4
                y0 = mby * 16 + by0 + sy * 4
                want = _b_expected_part(
                    (ref0[0], ref1[0]), used, mv0, mv1,
                    x0, y0, sw * 4, sh * 4)
                got = fy[y0:y0 + sh * 4, x0:x0 + sw * 4]
                assert np.array_equal(got, want), (mb, i8, shi, used)
                wantc = _b_expected_part(
                    (ref0[1], ref1[1]), used, mv0, mv1,
                    x0 // 2, y0 // 2, sw * 2, sh * 2, chroma=True)
                assert np.array_equal(
                    fcb[y0 // 2:y0 // 2 + sh * 2,
                        x0 // 2:x0 // 2 + sw * 2], wantc)

    # sub-MB direct still gates
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2, poc_type=0)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    w = BitWriter()
    w.u(0x01, 8)
    w.ue(0)
    w.ue(1)
    w.ue(0)
    w.u(2, 4)
    w.u(2, 4)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)
    w.ue(0)   # skip run
    w.ue(22)  # B_8x8
    for _ in range(4):
        w.ue(0)  # sub_mb_type B_Direct_8x8
    # sub-MB direct decodes only with colocated motion supplied
    with pytest.raises(H.H264Unsupported, match="colocated motion"):
        H.decode_b_frame(sps, pps, w.rbsp(trailing=True),
                         (y, cb, cr), (y, cb, cr))


def test_b_direct_8x8_mixed_quadrants():
    """B_8x8 with two B_Direct_8x8 quadrants and two explicit ones:
    the MB-level spatial derivation feeds the direct quads (colZero
    per 4x4 against the P anchor), explicit quads parse mvds whose
    predictors SEE the direct quads' grids (raster neighbors)."""
    rng = np.random.default_rng(71)
    wmb, hmb = 2, 1
    y = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    cbp = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    crp = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    sps_r, pps_r = H._seq_header_rbsps(wmb, hmb, max_ref=2, poc_type=0)
    sps, pps = H.parse_sps(sps_r), H.parse_pps(pps_r)
    ref0 = (y, cbp, crp)

    def build_and_check(p_mv_mb1, want_direct_from):
        mvs_p = np.array([[[0, 0], list(p_mv_mb1)]], dtype=np.int64)
        f1, col = H.decode_p_frame(
            sps, pps, H.encode_p16_rbsp(mvs_p, frame_num=1, poc_lsb=4),
            ref0, return_motion=True)
        # hand-write: MB0 = B_L0_16x16 mv (4,0); MB1 = B_8x8 with
        # subs [direct, L1_8x8, direct, Bi_8x8]
        w = BitWriter()
        w.u(0x01, 8)
        w.ue(0)
        w.ue(1)
        w.ue(0)
        w.u(2, 4)
        w.u(2, 4)
        w.u(1, 1)  # spatial direct
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        w.se(0)
        w.ue(1)
        mvg = {lx: np.zeros((4, 8, 2), dtype=np.int64) for lx in (0, 1)}
        refg = {lx: np.full((4, 8), H._NOT_DECODED, dtype=np.int64)
                for lx in (0, 1)}
        # MB0 explicit L0 (4,0)
        w.ue(0)
        w.ue(1)
        w.se(4 - 0)
        w.se(0 - 0)
        mvg[0][0:4, 0:4] = (4, 0)
        refg[0][0:4, 0:4] = 0
        refg[1][0:4, 0:4] = -1
        w.ue(H._CBP_INTER_INV[0])
        # MB1: B_8x8
        gx = 4
        w.ue(0)
        w.ue(22)
        for t in (0, 2, 0, 3):
            w.ue(t)
        rid_d, mv4_d = H._spatial_direct(mvg, refg, col, gx, 0)
        assert rid_d == {0: 0, 1: -1}   # only-A neighbor is L0-only
        used_d, mv4_d = {0}, mv4_d
        for i8 in (0, 2):               # direct quads: write grids
            qx, qy = (i8 % 2) * 2, (i8 // 2) * 2
            for sy in range(2):
                for sx in range(2):
                    mvg[0][qy + sy, gx + qx + sx] = \
                        mv4_d[0][qy + sy, qx + sx]
                    refg[0][qy + sy, gx + qx + sx] = 0
                    refg[1][qy + sy, gx + qx + sx] = -1
        # pre-mark explicit quads' unused lists
        refg[0][0:2, gx + 2:gx + 4] = -1   # quad1 = L1 only
        mvg[0][0:2, gx + 2:gx + 4] = 0
        # quad3 = bi: uses both
        # mvd_l0 pass: only quad3
        mv3_l0 = (6, -2)
        p = H._mv_pred(mvg[0], refg[0], gx + 2, 2, 2, 2, 0)
        w.se(mv3_l0[0] - p[0])
        w.se(mv3_l0[1] - p[1])
        mvg[0][2:4, gx + 2:gx + 4] = mv3_l0
        refg[0][2:4, gx + 2:gx + 4] = 0
        # mvd_l1 pass: quad1 then quad3
        mv1_l1 = (-3, 5)
        p = H._mv_pred(mvg[1], refg[1], gx + 2, 0, 2, 2, 0)
        w.se(mv1_l1[0] - p[0])
        w.se(mv1_l1[1] - p[1])
        mvg[1][0:2, gx + 2:gx + 4] = mv1_l1
        refg[1][0:2, gx + 2:gx + 4] = 0
        mv3_l1 = (2, 7)
        p = H._mv_pred(mvg[1], refg[1], gx + 2, 2, 2, 2, 0)
        w.se(mv3_l1[0] - p[0])
        w.se(mv3_l1[1] - p[1])
        mvg[1][2:4, gx + 2:gx + 4] = mv3_l1
        refg[1][2:4, gx + 2:gx + 4] = 0
        w.ue(H._CBP_INTER_INV[0])
        fb = H.decode_b_frame(sps, pps, w.rbsp(), ref0, f1,
                              col_motion=col)
        y0 = y.astype(np.int64)
        f1y = f1[0].astype(np.int64)
        # direct quads (MB1 quad0 @ (16,0) 8x8, quad2 @ (16,8))
        for (qx0, qy0) in ((16, 0), (16, 8)):
            if want_direct_from == "zero":   # colZero → copy ref0
                want = y0[qy0:qy0 + 8, qx0:qx0 + 8]
            else:                            # candidate (4,0) kept
                want = scalar_mc_luma(y0, qx0, qy0, 8, 8, 4, 0)
            assert np.array_equal(
                fb[0][qy0:qy0 + 8, qx0:qx0 + 8].astype(np.int64),
                want), (p_mv_mb1, qx0, qy0)
        # explicit quads
        w1 = scalar_mc_luma(f1y, 24, 0, 8, 8, *mv1_l1)
        assert np.array_equal(fb[0][0:8, 24:32].astype(np.int64), w1)
        w3 = (scalar_mc_luma(y0, 24, 8, 8, 8, *mv3_l0)
              + scalar_mc_luma(f1y, 24, 8, 8, 8, *mv3_l1) + 1) >> 1
        assert np.array_equal(fb[0][8:16, 24:32].astype(np.int64), w3)

    build_and_check((0, 0), "zero")     # colZero true → zeroed MVs
    build_and_check((16, 0), "cand")    # large col MV → candidate kept
