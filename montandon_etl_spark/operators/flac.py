"""FLAC (Free Lossless Audio Codec) — dependency-free decoder and a
spec-following encoder, the lossless arm of the audio family
(``wav`` carries PCM16 + IMA ADPCM; this adds the compressed-lossless
format a crawl actually serves), implemented from the public FLAC
format spec (RFC 9639) with no codec library.

Decoder scope (honest): fLaC marker + STREAMINFO (other metadata
blocks skipped), fixed-blocksize frames, all four stereo channel
assignments (independent, left/side, right/side, mid/side — side
subframes carry bps+1 bits), subframe types CONSTANT / VERBATIM /
FIXED orders 0–4 / LPC orders 1–32, both Rice residual methods
(4- and 5-bit parameters) with partition orders 0–15 and escaped
raw partitions, wasted-bits shifting, and both frame CRCs verified
(CRC-8 header, CRC-16 frame — mismatch raises ``FlacError``, never a
wrong sample); both blocking strategies (fixed and variable) and bit
depths 8–32 decode, and up to 8 channels (decorrelation is the
2-channel modes; 3+ channels code independently, per the format).

Losslessness is the oracle lever: ``decode(encode(x)) == x``
bit-exactly, so a Spark query that synthesizes a closed-form signal,
round-trips it through the REAL bit-level codec (Rice coding, CRCs,
channel decorrelation and all) and checksums the output can be
replayed by DuckDB directly on the closed form — any codec bug
breaks equality (same strategy as the H.264 I_PCM and WAV paths).

100-TB shape: clips are opaque ``binary`` columns; decode is
scan-local inside ``mapInPandas`` batches (no shuffle, no per-sample
Python in the Spark plan) and emits fixed-width feature rows.

Reference lineage: the reference stores media URLs/typed metadata
per event (apps/etl/models.py); content-level decode is what a
multimodal curation engine adds on top.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame

_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1],
               4: [4, -6, 4, -1]}

_BLOCK_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                8192: 13, 16384: 14, 32768: 15}
_BPS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODES.items()}


class FlacError(ValueError):
    """Malformed or unsupported FLAC data."""


class _BW:
    """MSB-first bit writer."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, val: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (val & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def s(self, val: int, bits: int) -> None:
        self.u(val & ((1 << bits) - 1), bits)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.u(0, 32)
            q -= 32
        self.u(1, q + 1)  # q zero bits then a one

    def align(self) -> None:
        if self.n:
            self.u(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BR:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def u(self, bits: int) -> int:
        v = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise FlacError("truncated stream")
            avail = 8 - self.bit
            take = min(avail, bits)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take))
                              & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def s(self, bits: int) -> int:
        v = self.u(bits)
        if v >= (1 << (bits - 1)):
            v -= 1 << bits
        return v

    def unary(self) -> int:
        q = 0
        while self.u(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_num(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index): an N-byte
    sequence carries 5N+1 payload bits (lead byte = N one-bits, a
    zero, then 7−N payload bits; continuations 10xxxxxx)."""
    if n < 0x80:
        return bytes([n])
    nbytes = 2
    while n.bit_length() > 5 * nbytes + 1:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out = [lead | (n >> (6 * (nbytes - 1)))]
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_num(r: _BR) -> int:
    b0 = r.u(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise FlacError("bad UTF-8 coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.u(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _zigzag(n: int) -> int:
    return (n << 1) if n >= 0 else (-(n << 1) - 1)


# ------------------------------------------------------------ encode

def _best_rice_param(res: list[int]) -> int:
    z = [_zigzag(v) for v in res]
    total = sum(z)
    if not z:
        return 0
    k = 0
    # standard estimator: smallest k with mean(z) < 2^k, then refine
    while k < 14 and (total >> k) > len(z):
        k += 1
    best_k, best_bits = k, len(z) * (k + 1) + sum(v >> k for v in z)
    for kk in (k - 1, k + 1):
        if 0 <= kk <= 14:
            bits = len(z) * (kk + 1) + sum(v >> kk for v in z)
            if bits < best_bits:
                best_k, best_bits = kk, bits
    return best_k


def _signed_bits(v: int) -> int:
    """Smallest two's-complement width holding v."""
    return (v.bit_length() + 1) if v >= 0 \
        else ((-v - 1).bit_length() + 1)


def _write_residual(w: _BW, res: list[int], block_size: int,
                    pred_order: int, partition_order: int) -> None:
    if block_size % (1 << partition_order) or \
            (block_size >> partition_order) <= pred_order:
        raise FlacError("invalid rice partition order for block")
    w.u(0, 2)  # residual method 0 (4-bit rice)
    w.u(partition_order, 4)
    nper = block_size >> partition_order
    pos = 0
    for p in range(1 << partition_order):
        n = nper - pred_order if p == 0 else nper
        part = res[pos:pos + n]
        pos += n
        k = _best_rice_param(part)
        zz = [_zigzag(v) for v in part]
        raw_bits = max((_signed_bits(v) for v in part), default=1)
        rice_bits = len(part) * (k + 1) + sum(v >> k for v in zz)
        if raw_bits < 32 and raw_bits * len(part) < rice_bits:
            w.u(15, 4)  # escape: raw signed partition
            w.u(raw_bits, 5)
            for v in part:
                w.s(v, raw_bits)
        else:
            w.u(k, 4)
            for v in zz:
                w.unary(v >> k)
                w.u(v & ((1 << k) - 1), k)


def _subframe_bits(w: _BW, ch: list[int], bps: int,
                   fixed_order: int | None,
                   partition_order: int,
                   lpc: tuple | None,
                   verbatim: bool) -> None:
    """Write one subframe (header + payload)."""
    block = len(ch)
    nz = [v for v in ch if v]
    if nz:
        wasted = min((v & -v).bit_length() - 1 for v in nz)
        wasted = max(0, min(wasted, bps - 1))
    else:
        wasted = 0
    eff = bps - wasted
    sh = [v >> wasted for v in ch]
    order_guess = len(lpc[0]) if lpc is not None else 4
    if block % (1 << partition_order) or \
            (block >> partition_order) <= order_guess:
        partition_order = 0

    def _header(tbits: int) -> None:
        w.u(0, 1)  # padding
        w.u(tbits, 6)
        if wasted:
            w.u(1, 1)
            w.unary(wasted - 1)  # k-1 in unary => wasted = k
        else:
            w.u(0, 1)

    if not verbatim and all(v == sh[0] for v in sh):  # CONSTANT
        _header(0)
        w.s(sh[0], eff)
        return
    if verbatim:
        _header(1)
        for v in sh:
            w.s(v, eff)
        return
    if lpc is not None:
        coefs, shift, prec = lpc
        order = len(coefs)
        _header(0x20 | (order - 1))
        for v in sh[:order]:
            w.s(v, eff)
        w.u(prec - 1, 4)
        w.s(shift, 5)
        for c in coefs:
            w.s(c, prec)
        res = []
        for i in range(order, block):
            pred = sum(c * sh[i - 1 - j] for j, c in enumerate(coefs))
            res.append(sh[i] - (pred >> shift))
        _write_residual(w, res, block, order, partition_order)
        return
    order = fixed_order
    if order is None:  # pick the fixed order with smallest |residual|
        best = None
        for o in range(5):
            if block <= o:
                continue
            cf = _FIXED_COEF[o]
            cost = 0
            for i in range(o, block):
                pred = sum(c * sh[i - 1 - j] for j, c in enumerate(cf))
                cost += abs(sh[i] - pred)
            if best is None or cost < best[1]:
                best = (o, cost)
        order = best[0]
    cf = _FIXED_COEF[order]
    _header(0x08 | order)
    for v in sh[:order]:
        w.s(v, eff)
    res = []
    for i in range(order, block):
        pred = sum(c * sh[i - 1 - j] for j, c in enumerate(cf))
        res.append(sh[i] - pred)
    _write_residual(w, res, block, order, partition_order)


def encode_flac(samples: np.ndarray, sample_rate: int = 44100,
                bps: int = 16, block_size: int = 4096,
                stereo_mode: str = "indep",
                fixed_order: int | None = None,
                partition_order: int = 0,
                lpc: tuple | None = None,
                verbatim: bool = False,
                block_plan: list | None = None) -> bytes:
    """Encode integer samples (shape (n,) mono or (n, 2) stereo) into
    a FLAC stream: STREAMINFO + frames. ``stereo_mode``
    in {"indep", "left_side", "right_side", "mid_side"};
    ``fixed_order`` pins the fixed predictor (None = best per
    subframe); ``lpc`` = (coefs, shift, precision) switches every
    subframe to LPC; ``verbatim`` forces VERBATIM subframes.
    ``block_plan`` switches to the VARIABLE blocksize strategy: a
    list of per-frame block sizes (consumed in order, last frame
    truncated to the remaining samples; the coded number becomes the
    frame's first-sample index). decode_flac(encode_flac(x)) == x
    bit-exactly (lossless)."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if not 1 <= ch <= 8:
        raise FlacError("1-8 channels only")
    if stereo_mode != "indep" and ch != 2:
        raise FlacError("stereo_mode needs 2 channels")
    lim = 1 << (bps - 1)
    if arr.min() < -lim or arr.max() >= lim:
        raise FlacError("samples out of range for bps")
    # frame layout: (first_sample, size) per frame
    if block_plan is not None:
        layout = []
        pos = 0
        for b in block_plan:
            if pos >= n:
                break
            layout.append((pos, min(int(b), n - pos)))
            pos += int(b)
        if pos < n:
            raise FlacError("block_plan does not cover the samples")
        min_bs = min(s for _, s in layout)
        max_bs = max(s for _, s in layout)
    else:
        layout = [(p, min(block_size, n - p))
                  for p in range(0, n, block_size)]
        min_bs = max_bs = block_size
    # STREAMINFO
    w = _BW()
    w.u(min_bs, 16)
    w.u(max_bs, 16)
    w.u(0, 24)
    w.u(0, 24)
    w.u(sample_rate, 20)
    w.u(ch - 1, 3)
    w.u(bps - 1, 5)
    w.u(n, 36)
    if bps in (8, 16):
        dt = "<i2" if bps == 16 else "i1"
        md5 = hashlib.md5(
            arr.astype(dt).tobytes(order="C")).digest()
    else:
        md5 = b"\x00" * 16
    info = w.bytes() + md5
    out = bytearray(b"fLaC")
    out.append(0x80)  # last metadata block, type 0 = STREAMINFO
    out += len(info).to_bytes(3, "big")
    out += info

    variable = block_plan is not None
    for fi, (start, bs) in enumerate(layout):
        blk = arr[start:start + bs]
        hw = _BW()
        hw.u(0b11111111111110, 14)
        hw.u(0, 1)
        hw.u(1 if variable else 0, 1)  # blocksize strategy
        bcode = None if variable else _BLOCK_CODES.get(bs)
        tail16 = bcode is None
        hw.u(7 if tail16 else bcode, 4)
        hw.u(0, 4)  # sample rate from STREAMINFO
        if ch == 1 or stereo_mode == "indep":
            ca = ch - 1
        else:
            ca = {"left_side": 8, "right_side": 9,
                  "mid_side": 10}[stereo_mode]
        hw.u(ca, 4)
        hw.u(_BPS_CODES.get(bps, 0), 3)
        hw.u(0, 1)
        head = hw.bytes() + _utf8_num(start if variable else fi)
        if tail16:
            head += (bs - 1).to_bytes(2, "big")
        head += bytes([_crc8(head)])
        fw = _BW()
        for b in head:
            fw.u(b, 8)
        # channel decorrelation
        if ch == 1:
            subs = [(list(int(v) for v in blk[:, 0]), bps)]
        elif stereo_mode == "indep":
            subs = [(list(int(v) for v in blk[:, c]), bps)
                    for c in range(ch)]
        else:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [a - b for a, b in zip(left, right)]
            if stereo_mode == "left_side":
                subs = [(left, bps), (side, bps + 1)]
            elif stereo_mode == "right_side":
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = [(a + b) >> 1 for a, b in zip(left, right)]
                subs = [(mid, bps), (side, bps + 1)]
        for data_ch, cbps in subs:
            _subframe_bits(fw, data_ch, cbps, fixed_order,
                           partition_order, lpc, verbatim)
        fw.align()
        body = fw.bytes()
        out += body + _crc16(body).to_bytes(2, "big")
    return bytes(out)


# ------------------------------------------------------------ decode

def _read_subframe(r: _BR, bs: int, bps: int) -> list[int]:
    if r.u(1):
        raise FlacError("subframe padding bit set")
    t = r.u(6)
    wasted = 0
    if r.u(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if t == 0:  # CONSTANT
        v = r.s(eff)
        out = [v] * bs
    elif t == 1:  # VERBATIM
        out = [r.s(eff) for _ in range(bs)]
    elif 8 <= t <= 12:  # FIXED order 0-4
        order = t & 7
        out = [r.s(eff) for _ in range(order)]
        res = _read_residual(r, bs, order)
        cf = _FIXED_COEF[order]
        for i in range(order, bs):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(cf))
            out.append(pred + res[i - order])
    elif t & 0x20:  # LPC
        order = (t & 0x1F) + 1
        out = [r.s(eff) for _ in range(order)]
        prec = r.u(4) + 1
        if prec == 16:
            raise FlacError("invalid qlp precision")
        shift = r.s(5)
        if shift < 0:
            raise FlacError("negative qlp shift")
        coefs = [r.s(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        for i in range(order, bs):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append((pred >> shift) + res[i - order])
    else:
        raise FlacError(f"reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _read_residual(r: _BR, bs: int, order: int) -> list[int]:
    method = r.u(2)
    if method > 1:
        raise FlacError("reserved residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = r.u(4)
    if bs % (1 << po):
        raise FlacError("block size not divisible by partitions")
    nper = bs >> po
    res: list[int] = []
    for p in range(1 << po):
        n = nper - order if p == 0 else nper
        if n < 0:
            raise FlacError("predictor order exceeds partition")
        k = r.u(pbits)
        if k == esc:
            rb = r.u(5)
            res.extend(r.s(rb) if rb else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                u = (q << k) | r.u(k)
                res.append((u >> 1) ^ -(u & 1))
    return res


def decode_flac(data: bytes, verify_md5: bool = False):
    """Decode a FLAC stream into (samples int32 (n, channels), meta
    dict). Verifies both frame CRCs; ``verify_md5`` additionally
    checks the STREAMINFO MD5 (8/16-bit streams)."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata")
        hdr = data[pos]
        ln = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + ln]
        if hdr & 0x7F == 0:
            info = body
        pos += 4 + ln
        if hdr & 0x80:
            break
    if info is None or len(info) < 34:
        raise FlacError("missing STREAMINFO")
    ir = _BR(info)
    ir.u(16)
    ir.u(16)
    ir.u(24)
    ir.u(24)
    rate = ir.u(20)
    nch = ir.u(3) + 1
    bps0 = ir.u(5) + 1
    total = ir.u(36)
    md5 = info[18:34]
    chans: list[list[int]] = [[] for _ in range(nch)]
    got = 0
    while got < total:
        frame_start = pos
        r = _BR(data, pos)
        if r.u(14) != 0b11111111111110:
            raise FlacError("lost frame sync")
        r.u(1)
        r.u(1)  # blocking strategy: the coded number is a frame
        # index (fixed) or first-sample index (variable) — either
        # way the block size comes from the size fields below, so
        # both strategies decode through the same path
        bcode = r.u(4)
        scode = r.u(4)
        ca = r.u(4)
        bps_code = r.u(3)
        r.u(1)
        _read_utf8_num(r)
        if bcode == 0:
            raise FlacError("reserved block size code")
        elif bcode == 1:
            bs = 192
        elif bcode <= 5:
            bs = 576 << (bcode - 2)
        elif bcode == 6:
            bs = r.u(8) + 1
        elif bcode == 7:
            bs = r.u(16) + 1
        else:
            bs = 256 << (bcode - 8)
        if scode == 15:
            raise FlacError("invalid sample rate code")
        if scode == 12:
            r.u(8)
        elif scode in (13, 14):
            r.u(16)
        bps = bps0 if bps_code == 0 else _BPS_FROM_CODE.get(bps_code)
        if bps is None:
            raise FlacError("reserved sample size code")
        r.align()
        if _crc8(data[frame_start:r.byte]) != data[r.byte]:
            raise FlacError("frame header CRC-8 mismatch")
        r.u(8)  # consume the CRC-8 byte
        if ca <= 7:
            if ca + 1 != nch:
                raise FlacError("channel assignment != STREAMINFO")
            subs = [_read_subframe(r, bs, bps) for _ in range(nch)]
        elif ca in (8, 9, 10):
            if nch != 2:
                raise FlacError("stereo assignment on non-stereo")
            b0 = bps + (1 if ca == 9 else 0)
            b1 = bps + (1 if ca in (8, 10) else 0)
            c0 = _read_subframe(r, bs, b0)
            c1 = _read_subframe(r, bs, b1)
            if ca == 8:  # left/side
                subs = [c0, [a - b for a, b in zip(c0, c1)]]
            elif ca == 9:  # right/side
                subs = [[a + b for a, b in zip(c0, c1)], c1]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(c0, c1):
                    m2 = (m << 1) | (s & 1)
                    left.append((m2 + s) >> 1)
                    right.append((m2 - s) >> 1)
                subs = [left, right]
        else:
            raise FlacError("reserved channel assignment")
        r.align()
        if _crc16(data[frame_start:r.byte]) != int.from_bytes(
                data[r.byte:r.byte + 2], "big"):
            raise FlacError("frame CRC-16 mismatch")
        pos = r.byte + 2
        take = min(bs, total - got)
        for c in range(nch):
            chans[c].extend(subs[c][:take])
        got += take
    out = np.array(chans, dtype=np.int64).T.copy()
    if verify_md5 and bps0 in (8, 16) and md5 != b"\x00" * 16:
        dt = "<i2" if bps0 == 16 else "i1"
        if hashlib.md5(out.astype(dt).tobytes(order="C")).digest() \
                != md5:
            raise FlacError("MD5 mismatch")
    meta = {"sample_rate": rate, "channels": nch, "bps": bps0,
            "total_samples": total}
    return out.astype(np.int32), meta


def flac_features(df: DataFrame, id_col: str = "id",
                  data_col: str = "data") -> DataFrame:
    """Per-clip FLAC decode + integer aggregates, scan-local
    (Arrow-batched ``mapInPandas``, zero shuffle): n_samples /
    channels / bps plus per-first/second-channel sum, position-
    weighted sum (Σ s[i]·(i+1)) and peak |s| — the fixed-width
    feature row downstream curation joins against instead of the
    audio bytes. Mono clips report channel-2 aggregates as 0."""
    import pandas as pd

    def run(it):
        for pdf in it:
            rows = []
            for cid, blob in zip(pdf[id_col], pdf[data_col]):
                s, meta = decode_flac(bytes(blob), verify_md5=True)
                s64 = s.astype(np.int64)
                wts = np.arange(1, s.shape[0] + 1, dtype=np.int64)
                def agg(c):
                    if c >= s.shape[1]:
                        return 0, 0, 0
                    col = s64[:, c]
                    return (int(col.sum()), int((col * wts).sum()),
                            int(np.abs(col).max(initial=0)))
                s1, w1, p1 = agg(0)
                s2, w2, p2 = agg(1)
                rows.append((cid, int(meta["total_samples"]),
                             int(meta["channels"]), int(meta["bps"]),
                             s1, w1, p1, s2, w2, p2))
            yield pd.DataFrame(rows, columns=[
                "id", "n_samples", "channels", "bps",
                "c1_sum", "c1_wsum", "c1_peak",
                "c2_sum", "c2_wsum", "c2_peak"])

    return df.mapInPandas(
        run, "id bigint, n_samples bigint, channels int, bps int,"
        " c1_sum bigint, c1_wsum bigint, c1_peak bigint,"
        " c2_sum bigint, c2_wsum bigint, c2_peak bigint")
