"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT,
Huffman entropy coding).

Decoder: SOI/DQT/SOF0/DHT/DRI/SOS parsing, byte-unstuffed canonical-
Huffman block decode (DC prediction, AC run/size with ZRL + EOB,
restart markers), dequantization in zigzag order, float IDCT,
level-shift, general sampling factors with nearest-neighbor chroma
upsampling (4:4:4, 4:2:0, 4:2:2, grayscale), JFIF YCbCr -> RGB.
Progressive (SOF2) and arithmetic-coded JPEGs are rejected with a
ValueError — the feature-extraction layer keeps those rows as NULLs
(record-not-drop).

Encoder (for round-trip tests and thumbnails): 4:4:4 / grayscale,
float FDCT, canonical Huffman with simple fixed-length tables (valid
per the standard — BITS/HUFFVAL are carried in DHT, so any compliant
decoder reads the output). Quality is controlled by the quantization
table (default all-ones ≈ near-lossless, so round-trip error is only
FDCT/IDCT rounding).

Performance shape: the Huffman stream is inherently serial per scan,
so the decoder spends O(1) Python ops per SYMBOL, not per bit — a
16-bit-prefix LUT plus a rolling integer bit accumulator over
pre-split, pre-unstuffed restart intervals (~4x over the bit-at-a-time
baseline); dequant + IDCT then run as ONE batched einsum per
component. The remaining cost is per-coefficient Python — fine for
the thumbnail/stats sizes of a curation pipeline, and the mapInPandas
wrapper parallelizes across images, which is where the real
parallelism lives at corpus scale.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables ----


def _zigzag() -> list[tuple[int, int]]:
    """The standard zigzag scan order, generated (not hand-typed):
    anti-diagonals s = r + c, even diagonals walked bottom-left →
    top-right, odd ones top-right → bottom-left."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(8, s + 1))]
        order.extend(diag[::-1] if s % 2 == 0 else diag)
    return order


_ZZ = _zigzag()


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c[k, n] = np.cos((2 * n + 1) * k * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0, :] /= np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---------------------------------------------------------------- huffman ---


class _HuffTable:
    """Canonical Huffman per T.81 Annex C: BITS[1..16] code-length
    counts + HUFFVAL symbols in code order."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.bits, self.vals = bits, vals
        self.lookup: dict[tuple[int, int], int] = {}
        self.enc: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                self.enc[vals[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        self._lut: list[int] | None = None

    def lut(self) -> list[int]:
        """16-bit-prefix lookup table: lut[next16bits] =
        (code_length << 8) | symbol, 0 for invalid prefixes. One list
        index replaces the bit-by-bit tree walk — the classic O(1)
        Huffman decode. A plain Python list beats a numpy array here:
        scalar indexing is the hot operation."""
        if self._lut is None:
            arr = np.zeros(65536, dtype=np.int32)
            for (length, code), sym in self.lookup.items():
                start = code << (16 - length)
                arr[start : start + (1 << (16 - length))] = (length << 8) | sym
            self._lut = arr.tolist()
        return self._lut


def _split_entropy(data: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded scan starting at ``pos`` into restart
    intervals, unstuffing as it goes: 0xFF 0x00 is a literal 0xFF
    (including a stuffed FF produced by all-ones flush padding right
    before a restart marker — entropy data, not the marker); 0xFF
    0xD0-D7 ends an interval; any other 0xFF-escape ends the scan.
    ``bytes.find`` does the byte scanning at C speed."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j == -1 or j + 1 >= n:
            cur += data[i : j if j != -1 else n]
            segs.append(bytes(cur))
            return segs
        cur += data[i:j]
        nxt = data[j + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:  # a real marker: end of scan
            segs.append(bytes(cur))
            return segs


# ---------------------------------------------------------------- decoder ---


def decode_jpeg(data: bytes):
    """Baseline sequential JPEG → (width, height, mode, ndarray[h,w,c]).
    mode is "RGB" (YCbCr 3-component) or "L" (grayscale)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps = None
    w = h = None
    restart_interval = 0
    scan = None
    while pos < len(data):
        assert data[pos] == 0xFF, f"expected marker at {pos}"
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros((8, 8))
                for i, (r, c) in enumerate(_ZZ):
                    tbl[r, c] = seg[p + i]
                qt[tq] = tbl
                p += 64
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(ext) sequential
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0x{marker:02x} "
                             "(progressive/arithmetic/lossless)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "dc": tables >> 4, "ac": tables & 0xF})
            pos = pos + seg_len
            break
        pos += seg_len
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["dc_t"], c["ac_t"] = s["dc"], s["ac"]
        c["pw"] = mcus_x * 8 * c["h"]  # padded plane size
        c["ph"] = mcus_y * 8 * c["v"]
        c["plane"] = np.zeros((c["ph"], c["pw"]), dtype=np.float64)
        c["pred"] = 0

    # --- entropy decode: LUT Huffman over a rolling bit accumulator ---
    # One list-index per symbol and one shift/mask per coefficient
    # (O(1) Python ops) instead of per-BIT function calls; restart
    # intervals are pre-split and unstuffed so the hot loop never
    # checks for markers. Coefficient blocks accumulate in zigzag
    # order per component and the dequant+IDCT runs as ONE batched
    # einsum per component afterwards.
    segs = _split_entropy(data, pos)
    for c in comps:
        c["lut_dc"] = huff[(0, c["dc_t"])].lut()
        c["lut_ac"] = huff[(1, c["ac_t"])].lut()
        c["blocks"] = []
    try:
        seg_i = 0
        buf = segs[0] + b"\x00\x00\x00"
        acc = nbits = bi = 0
        mcu_count = 0
        for _my in range(mcus_y):
            for _mx in range(mcus_x):
                if (restart_interval and mcu_count
                        and mcu_count % restart_interval == 0):
                    seg_i += 1
                    buf = segs[seg_i] + b"\x00\x00\x00"
                    acc = nbits = bi = 0
                    for c in comps:
                        c["pred"] = 0
                for c in comps:
                    lut_dc, lut_ac = c["lut_dc"], c["lut_ac"]
                    pred = c["pred"]
                    for _blk in range(c["v"] * c["h"]):
                        coeffs = [0.0] * 64
                        while nbits < 16:
                            acc = ((acc & 0xFFFFFF) << 8) | buf[bi]
                            bi += 1
                            nbits += 8
                        e = lut_dc[(acc >> (nbits - 16)) & 0xFFFF]
                        if e == 0:
                            raise ValueError("invalid Huffman code")
                        nbits -= e >> 8
                        t = e & 0xFF
                        if t:
                            while nbits < t:
                                acc = ((acc & 0xFFFFFF) << 8) | buf[bi]
                                bi += 1
                                nbits += 8
                            v = (acc >> (nbits - t)) & ((1 << t) - 1)
                            nbits -= t
                            # T.81 F.2.2.1 EXTEND: signed coefficient
                            pred += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                        coeffs[0] = pred
                        k = 1
                        while k < 64:
                            while nbits < 16:
                                acc = ((acc & 0xFFFFFF) << 8) | buf[bi]
                                bi += 1
                                nbits += 8
                            e = lut_ac[(acc >> (nbits - 16)) & 0xFFFF]
                            if e == 0:
                                raise ValueError("invalid Huffman code")
                            nbits -= e >> 8
                            rs = e & 0xFF
                            if rs == 0:
                                break  # EOB
                            s = rs & 0xF
                            if s == 0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            k += rs >> 4
                            while nbits < s:
                                acc = ((acc & 0xFFFFFF) << 8) | buf[bi]
                                bi += 1
                                nbits += 8
                            v = (acc >> (nbits - s)) & ((1 << s) - 1)
                            nbits -= s
                            coeffs[k] = (
                                v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            )
                            k += 1
                        c["blocks"].append(coeffs)
                    c["pred"] = pred
                mcu_count += 1
    except IndexError:
        raise ValueError("truncated JPEG entropy stream") from None

    # batched dequant + IDCT + placement, one einsum per component
    zz_flat = np.array([r * 8 + cc for (r, cc) in _ZZ])
    perm = np.empty(64, dtype=np.int64)
    perm[zz_flat] = np.arange(64)
    for c in comps:
        zz = np.asarray(c["blocks"], dtype=np.float64)  # (nblk, 64)
        blk = zz[:, perm].reshape(-1, 8, 8) * qt[c["tq"]][None]
        px = np.einsum("ij,njk,kl->nil", _C.T, blk, _C) + 128.0
        i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        c["plane"][y0 : y0 + 8, x0 : x0 + 8] = px[i]
                        i += 1

    # upsample each plane to full resolution (nearest) and crop
    planes = []
    for c in comps:
        p = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, "L", out[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return w, h, "RGB", np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder ---

# simple valid canonical tables: 12 DC symbols at 5 bits, 162 AC
# symbols at 8 bits (no all-ones code at max length; carried in DHT so
# any compliant decoder reads them)
_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc, self.nbits = 0, 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.nbits = 0, 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.nbits = 0, 0


def _csize(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def encode_jpeg(
    arr: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG encoder: 8-bit grayscale (h,w,1) or RGB
    (h,w,3) as YCbCr; flat quantization table of ``quant`` (1 =
    near-lossless, larger = lossier). ``subsample=True`` emits 4:2:0
    chroma (2x2-mean downsampled); ``restart_interval`` emits DRI +
    RSTn markers — both exist chiefly so the DECODER's real-world
    paths are exercised by round-trip tests."""
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg wants 1 or 3 channels")
    a = arr.astype(np.float64)
    if nc == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [a[:, :, 0]]
    samps = [(1, 1)] * nc
    if subsample and nc == 3:
        samps = [(2, 2), (1, 1), (1, 1)]
        for ci in (1, 2):
            p = planes[ci]
            ph, pw = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
            pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                         mode="edge")
            planes[ci] = pad.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    qtbl = np.full((8, 8), float(quant))
    dc_t, ac_t = _HuffTable(_DC_BITS, _DC_VALS), _HuffTable(_AC_BITS, _AC_VALS)

    def chunk(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    zz_q = bytes([0]) + bytes(int(qtbl[r, c]) for (r, c) in _ZZ)
    out += chunk(0xDB, zz_q)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += bytes([i + 1, (samps[i][0] << 4) | samps[i][1], 0])
    out += chunk(0xC0, sof)
    for tc, tbl in ((0, (_DC_BITS, _DC_VALS)), (1, (_AC_BITS, _AC_VALS))):
        out += chunk(0xC4, bytes([tc << 4]) + bytes(tbl[0]) + bytes(tbl[1]))
    if restart_interval:
        out += chunk(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(bytes([i + 1, 0x00]) for i in range(nc)) + bytes(
        [0, 63, 0]
    )
    out += chunk(0xDA, sos)

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    bw = _BitWriter()
    mbx = (w + 8 * hmax - 1) // (8 * hmax)
    mby = (h + 8 * vmax - 1) // (8 * vmax)
    preds = [0] * nc

    def put_block(ci: int, blk: np.ndarray) -> None:
        coeffs = _fdct2(blk - 128.0) / qtbl
        q = np.round(coeffs).astype(int)
        zz = [q[r, c] for (r, c) in _ZZ]
        diff = zz[0] - preds[ci]
        preds[ci] = zz[0]
        t = _csize(diff)
        ln, code = dc_t.enc[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_t.enc[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _csize(zz[k])
            ln, code = ac_t.enc[(run << 4) | s]
            bw.write(code, ln)
            v = zz[k]
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, code = ac_t.enc[0x00]  # EOB
            bw.write(code, ln)

    rst = 0
    mcu_count = 0
    for my in range(mby):
        for mx in range(mbx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out_rst = 0xD0 + (rst % 8)
                bw.out += bytes([0xFF, out_rst])
                rst += 1
                preds[:] = [0] * nc
            for ci, plane in enumerate(planes):
                sh, sv = samps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        ys = (my * sv + by) * 8
                        xs = (mx * sh + bx) * 8
                        sub = plane[ys : min(ys + 8, plane.shape[0]),
                                    xs : min(xs + 8, plane.shape[1])]
                        if sub.size:
                            # edge-replicate partial blocks (not a 128
                            # fill): keeps flat images flat per block,
                            # so they round-trip exactly at quant=1 and
                            # edges don't ring at higher quants
                            blk = np.pad(
                                sub,
                                ((0, 8 - sub.shape[0]), (0, 8 - sub.shape[1])),
                                mode="edge",
                            ).astype(np.float64)
                        else:
                            blk = np.full((8, 8), 128.0)
                        put_block(ci, blk)
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
