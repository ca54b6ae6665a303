"""LZ4 block + frame format and xxHash32, from scratch (stdlib only).

LZ4 is the wire compression Kafka brokers speak (compression.type=lz4
wraps record batches in LZ4 FRAMES) and the fastest common codec in
the lake ecosystem. Both public specs are implemented end-to-end:

**Block format** (lz4_Block_format.md): sequences of
``token | literals | 2-byte LE offset | match-length extension`` —
token high nibble = literal length (15 ⇒ 255-continuation bytes), low
nibble = match length − 4 (same extension), offsets 1..65535, matches
may overlap their output (offset < length ⇒ byte-at-a-time repeat).
The final sequence is literals-only. The encoder honours the spec's
end conditions (last 5 bytes are literals; no match begins within the
last 12 bytes); the decoder accepts any spec-valid stream.

**Frame format** (lz4_Frame_format.md): magic ``0x184D2204`` LE, FLG
(version 01, block-independence, content-checksum and content-size
bits), BD (block max size), header checksum ``(xxh32(FLG..) >> 8) &
0xFF``, data blocks as 4-byte LE lengths whose HIGH BIT marks a block
stored uncompressed (the required fallback when compression expands),
the ``0x00000000`` EndMark, and an optional xxh32 content checksum.

**xxHash32** per the public spec: 4-lane rotl-multiply stripes of 16
bytes, tail mixing, final avalanche. Pinned against the reference
known-answer ``xxh32(b"") == 0x02CC5D05`` and structural properties.
"""

from __future__ import annotations

import struct

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while i + 16 <= n:
            lanes = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl((v1 + lanes[0] * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + lanes[1] * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + lanes[2] * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + lanes[3] * _P2) & _M32, 13) * _P1) & _M32
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (h + struct.unpack_from("<I", data, i)[0] * _P3) & _M32
        h = (_rotl(h, 17) * _P4) & _M32
        i += 4
    while i < n:
        h = (h + data[i] * _P5) & _M32
        h = (_rotl(h, 11) * _P1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


# -------------------------------------------------------------- block -------
def lz4_block_decompress(data: bytes, max_out: int | None = None) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated literal length")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("truncated literals")
        out += data[pos:pos + lit]
        pos += lit
        if pos == n:
            break  # last sequence: literals only
        if pos + 2 > n:
            raise ValueError("truncated match offset")
        off = struct.unpack_from("<H", data, pos)[0]
        pos += 2
        if off == 0 or off > len(out):
            raise ValueError(f"match offset {off} out of range")
        ml = token & 0xF
        if ml == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated match length")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(out) - off
        for k in range(ml):  # overlap-safe
            out.append(out[start + k])
        if max_out is not None and len(out) > max_out:
            raise ValueError("decompressed output exceeds declared size")
    return bytes(out)


def _write_len(out: bytearray, v: int) -> None:
    while v >= 255:
        out.append(255)
        v -= 255
    out.append(v)


def lz4_block_compress(data: bytes) -> bytes:
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)
        return bytes(out)

    def emit(lit_start: int, lit_end: int, off: int | None,
             ml: int) -> None:
        nonlocal out
        lit = lit_end - lit_start
        token_lit = 15 if lit >= 15 else lit
        token_ml = 0 if off is None else (15 if ml - 4 >= 15 else ml - 4)
        out.append((token_lit << 4) | token_ml)
        if lit >= 15:
            _write_len(out, lit - 15)
        out += data[lit_start:lit_end]
        if off is not None:
            out += struct.pack("<H", off)
            if ml - 4 >= 15:
                _write_len(out, ml - 4 - 15)

    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    # spec end conditions: no match starts within the last 12 bytes,
    # and the last 5 bytes are always literals
    match_limit = n - 12
    while i < match_limit:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535 and \
                data[cand:cand + 4] == key:
            ml = 4
            # matches must end >= 5 bytes before the end (mflimit)
            hard_end = n - 5
            while i + ml < hard_end and \
                    data[cand + ml] == data[i + ml]:
                ml += 1
            emit(lit_start, i, i - cand, ml)
            i += ml
            lit_start = i
        else:
            i += 1
    emit(lit_start, n, None, 0)
    return bytes(out)


# -------------------------------------------------------------- frame -------
_MAGIC = 0x184D2204


def lz4_frame_compress(data: bytes, block_size: int = 4 << 20,
                       content_checksum: bool = True,
                       content_size: bool = True) -> bytes:
    out = bytearray(struct.pack("<I", _MAGIC))
    flg = (1 << 6) | (1 << 5)  # version 01, block independence
    if content_checksum:
        flg |= 1 << 2
    if content_size:
        flg |= 1 << 3
    bd_code = {64 << 10: 4, 256 << 10: 5, 1 << 20: 6, 4 << 20: 7}.get(
        block_size)
    if bd_code is None:
        raise ValueError("block_size must be 64KB/256KB/1MB/4MB")
    header = bytearray([flg, bd_code << 4])
    if content_size:
        header += struct.pack("<Q", len(data))
    out += header
    out.append((xxh32(bytes(header)) >> 8) & 0xFF)
    for i in range(0, len(data), block_size):
        chunk = data[i:i + block_size]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # stored uncompressed, high bit set
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    if len(data) < 7 or struct.unpack_from("<I", data, 0)[0] != _MAGIC:
        raise ValueError("bad LZ4 frame magic")
    pos = 4
    flg = data[pos]
    if (flg >> 6) != 1:
        raise ValueError("unsupported LZ4 frame version")
    has_csum = bool(flg & (1 << 2))
    has_size = bool(flg & (1 << 3))
    has_dict = bool(flg & 1)
    if has_dict:
        raise ValueError("dictionary frames unsupported")
    header_len = 2 + (8 if has_size else 0)
    header = data[pos:pos + header_len]
    pos += header_len
    if data[pos] != (xxh32(bytes(header)) >> 8) & 0xFF:
        raise ValueError("LZ4 frame header checksum mismatch")
    pos += 1
    declared = struct.unpack_from("<Q", header, 2)[0] if has_size else None
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated block length")
        bl = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if bl == 0:
            break
        uncompressed = bool(bl & 0x80000000)
        bl &= 0x7FFFFFFF
        if pos + bl > len(data):
            raise ValueError("truncated block body")
        chunk = data[pos:pos + bl]
        pos += bl
        out += chunk if uncompressed else lz4_block_decompress(chunk)
        if flg & (1 << 4):  # per-block checksum
            pos += 4
    if has_csum:
        if pos + 4 > len(data):
            raise ValueError("missing content checksum")
        want = struct.unpack_from("<I", data, pos)[0]
        if xxh32(bytes(out)) != want:
            raise ValueError("LZ4 content checksum mismatch")
    if declared is not None and declared != len(out):
        raise ValueError("content size mismatch")
    return bytes(out)
