"""Snappy raw-format codec, from scratch (stdlib only) — the
compression half the CDC interchange stack still needed: Avro OCFs in
the wild ship ``avro.codec: snappy`` at least as often as deflate
(it is the Hadoop-ecosystem default), and sources/avro.py wires this
module in as that codec (block body + 4-byte big-endian CRC32 of the
UNCOMPRESSED data, per the Avro spec).

The public format (github.com/google/snappy format_description.txt):

- preamble: uncompressed length as a little-endian base-128 varint
  (plain, not zigzag);
- elements, by the tag byte's low 2 bits:
  - ``00`` literal — length-1 in the high 6 bits; values 60..63 mean
    the length-1 follows in 1..4 little-endian bytes;
  - ``01`` copy — length 4..11 in bits 2..4, offset's high 3 bits in
    bits 5..7 plus one trailing byte (11-bit offsets, the hot case);
  - ``10`` copy — length-1 in the high 6 bits, 2-byte LE offset;
  - ``11`` copy — same with a 4-byte LE offset.
- copies may reach back less than their length (offset < len):
  the output repeats — decode must copy byte-at-a-time, which is also
  how RLE is expressed in snappy.

The encoder is the reference scheme's greedy core: a hash table of
4-byte sequences over a 64 KiB-windowed scan, emitting the pending
literal then the longest match at the candidate (capped at 64 per
element, as ``10``/``11`` copies require). Any output it produces is
spec-valid; the decoder accepts ANY spec-valid stream — tests pin
hand-assembled byte vectors (overlapping copies, 4-byte offsets,
long literals) the encoder itself would not emit.
"""

from __future__ import annotations

import struct


def _write_uvarint(out: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated snappy length preamble")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy length varint too long")


def snappy_decompress(data: bytes) -> bytes:
    want, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > n:
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise ValueError("truncated literal body")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise ValueError("truncated copy1 offset")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("truncated copy2 offset")
            off = struct.unpack_from("<H", data, pos)[0]
            pos += 2
        else:
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("truncated copy4 offset")
            off = struct.unpack_from("<I", data, pos)[0]
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError(f"copy offset {off} out of range")
        start = len(out) - off
        for i in range(ln):  # offset < len ⇒ overlapping self-copy
            out.append(out[start + i])
    if len(out) != want:
        raise ValueError(f"decompressed {len(out)} bytes, preamble said "
                         f"{want}")
    return bytes(out)


def _emit_literal(out: bytearray, lit: bytes) -> None:
    i = 0
    while i < len(lit):
        chunk = lit[i:i + 65536]
        i += len(chunk)
        lm1 = len(chunk) - 1
        if lm1 < 60:
            out.append(lm1 << 2)
        elif lm1 < 256:
            out.append(60 << 2)
            out.append(lm1)
        else:
            out.append(61 << 2)
            out += struct.pack("<H", lm1)
        out += chunk


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    # spec: copy1 handles len 4..11 / off < 2048; copy2 len 1..64 /
    # off < 65536; the encoder window is 64 KiB so copy4 never needed
    while ln > 0:
        step = min(ln, 64)
        if 4 <= step <= 11 and off < 2048:
            out.append(1 | ((step - 4) << 2) | ((off >> 8) << 5))
            out.append(off & 0xFF)
        else:
            out.append(2 | ((step - 1) << 2))
            out += struct.pack("<H", off)
        ln -= step


def snappy_compress(data: bytes) -> bytes:
    out = bytearray()
    _write_uvarint(out, len(data))
    n = len(data)
    if n < 4:
        if n:
            _emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand < 65536 and data[cand:cand + 4] == key:
            # extend the match
            ln = 4
            while i + ln < n and data[cand + ln:cand + ln + 1] == \
                    data[i + ln:i + ln + 1] and ln < 65536:
                ln += 1
            if lit_start < i:
                _emit_literal(out, data[lit_start:i])
            _emit_copy(out, i - cand, ln)
            i += ln
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)
