"""GIF decode/encode (GIF87a/89a + LZW) — the remaining common web
image format beside PNG (``multimodal``) and baseline JPEG
(``jpeg``), implemented dependency-free from the public GIF89a
specification. Crawled corpora are full of GIFs; an image-curation
pass that cannot decode them silently drops a modality slice.

Scope: logical screen + global/local color tables, the full variable-
width LZW decompressor (LSB-first packing, code widths 3..12,
clear/end codes, the KwKwK case, dictionary-full streams that keep
coding without adds until a clear), interlaced images (the four-pass
row schedule), multi-frame animations with graphic-control
extensions — transparency index and disposal methods 0/1 (keep),
2 (restore background), 3 (restore previous) — and a spec-following
LZW *encoder* whose width schedule mirrors the decoder's (emitting a
clear and resetting when the table fills), so

    decode_gif(encode_gif(indices, palette)) == palette[indices]

bit-exactly. Losslessness is again the oracle lever (FLAC, I_PCM,
PCM16 use the same strategy): a Spark query synthesizes closed-form
index frames, round-trips them through the real bit-level codec and
checksums the RGB output; DuckDB replays the closed form directly —
any LZW/palette/interlace bug breaks value equality.

100-TB shape: images are opaque ``binary`` lake columns; decode is
scan-local inside Arrow batches (no shuffle, no per-pixel Python in
the plan), emitting fixed-width feature rows.

Reference lineage: the reference stores media URLs per event
(apps/etl/models.py); content decode is the curation-engine layer
above it, matching the PNG/JPEG/MP4/WAV/FLAC arms.
"""

from __future__ import annotations

import numpy as np


class GifError(ValueError):
    """Malformed or unsupported GIF data."""


# ------------------------------------------------------------- LZW

def lzw_decode(min_code: int, data: bytes, expect: int) -> list[int]:
    """Decode a GIF LZW stream into ``expect`` pixel indices."""
    if not 2 <= min_code <= 8:
        raise GifError(f"bad LZW minimum code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    out: list[int] = []
    table: list[tuple[int, ...]] = []

    def reset():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code + 1
        prev = None

    width = min_code + 1
    prev: tuple[int, ...] | None = None
    reset()
    bitpos = 0
    total_bits = len(data) * 8
    while True:
        if bitpos + width > total_bits:
            raise GifError("LZW stream ran out before end code")
        byte = bitpos >> 3
        shift = bitpos & 7
        window = int.from_bytes(data[byte:byte + 3], "little")
        code = (window >> shift) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("first code after clear not literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + (entry[0],))
        elif code == len(table) and len(table) < 4096:
            entry = prev + (prev[0],)  # KwKwK
            table.append(entry)
        else:
            raise GifError(f"LZW code {code} out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expect:
            # image fully covered; consume up to the end code lazily
            break
    if len(out) < expect:
        raise GifError("LZW produced too few pixels")
    return out[:expect]


def lzw_encode(min_code: int, indices) -> bytes:
    """GIF LZW compressor whose code-width schedule mirrors the
    decoder's (the decoder is one dictionary add behind the encoder,
    so width bumps and the full-table clear are driven by a simulated
    decoder state, keeping both in lockstep)."""
    if not 2 <= min_code <= 8:
        raise GifError(f"bad LZW minimum code size {min_code}")
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    # simulated decoder state: width used to READ the next code
    dec_n = [end + 1]
    width = [min_code + 1]
    first_after_clear = [True]

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width[0]
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        # decoder processes this code: adds an entry unless it is the
        # first code after a clear (or a control code, handled below)
        if code == clear:
            dec_n[0] = end + 1
            width[0] = min_code + 1
            first_after_clear[0] = True
            return
        if code == end:
            return
        if first_after_clear[0]:
            first_after_clear[0] = False
        elif dec_n[0] < 4096:
            dec_n[0] += 1
        if dec_n[0] == (1 << width[0]) and width[0] < 12:
            width[0] += 1

    emit(clear)
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    prefix = None
    for s in indices:
        s = int(s)
        if not 0 <= s < clear:
            raise GifError("pixel index out of palette range")
        if prefix is None:
            prefix = s
            continue
        key = (prefix, s)
        if key in table:
            prefix = table[key]
            continue
        emit(prefix)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            prefix = s
        else:  # table full: clear and restart
            emit(clear)
            table = {}
            next_code = end + 1
            prefix = s
    if prefix is not None:
        emit(prefix)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace_order(h: int) -> list[int]:
    return [y for start, step in _INTERLACE
            for y in range(start, h, step)]


# ------------------------------------------------------------ decode

def decode_gif(data: bytes):
    """Decode a GIF into (frames, meta): ``frames`` a list of
    (H, W, 3) uint8 RGB canvases after compositing (transparency +
    disposal methods 0–3), ``meta`` = {width, height, n_frames,
    version}."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    version = data[3:6].decode()
    W = int.from_bytes(data[6:8], "little")
    H = int.from_bytes(data[8:10], "little")
    packed = data[10]
    bg_idx = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3).copy()
        pos += 3 * n
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg_idx < gct.shape[0]:
        canvas[:, :] = gct[bg_idx]
    bg_fill = canvas[0, 0].copy() if H and W else np.zeros(3, np.uint8)
    frames: list[np.ndarray] = []
    transparent = None
    dispose = 0
    while True:
        if pos >= len(data):
            raise GifError("missing trailer")
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos]
            pos += 1
            blocks = []
            while data[pos] != 0:
                ln = data[pos]
                blocks.append(data[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            if label == 0xF9 and blocks:
                gce = blocks[0]
                flags = gce[0]
                dispose = (flags >> 2) & 7
                transparent = gce[3] if flags & 1 else None
            continue
        if b != 0x2C:
            raise GifError(f"unknown block 0x{b:02x}")
        left = int.from_bytes(data[pos:pos + 2], "little")
        top = int.from_bytes(data[pos + 2:pos + 4], "little")
        w = int.from_bytes(data[pos + 4:pos + 6], "little")
        h = int.from_bytes(data[pos + 6:pos + 8], "little")
        ipack = data[pos + 8]
        pos += 9
        pal = gct
        if ipack & 0x80:
            n = 2 << (ipack & 7)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3).copy()
            pos += 3 * n
        if pal is None:
            raise GifError("image with no color table")
        interlaced = bool(ipack & 0x40)
        min_code = data[pos]
        pos += 1
        chunks = []
        while data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.array(lzw_decode(min_code, b"".join(chunks), w * h),
                       dtype=np.int64).reshape(h, w)
        if idx.max(initial=0) >= pal.shape[0]:
            raise GifError("pixel index outside color table")
        if interlaced:
            idx = _deinterlace(idx)
        if left + w > W or top + h > H:
            raise GifError("image rectangle outside logical screen")
        saved = canvas[top:top + h, left:left + w].copy()
        region = canvas[top:top + h, left:left + w]
        rgb = pal[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(canvas.copy())
        if dispose == 2:
            canvas[top:top + h, left:left + w] = bg_fill
        elif dispose == 3:
            canvas[top:top + h, left:left + w] = saved
        transparent = None
        dispose = 0
    if not frames:
        raise GifError("no image data")
    return frames, {"width": W, "height": H, "n_frames": len(frames),
                    "version": version}


# ------------------------------------------------------------ encode

def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames, palette, interlace: bool = False,
               gce=None, bg_index: int = 0) -> bytes:
    """Encode index frames into a GIF89a. ``frames``: list of (H, W)
    integer arrays (all full-canvas, or (top, left, idx) tuples for
    sub-rectangle frames); ``palette``: (N, 3) uint8, N a power of
    two in 4..256; ``gce``: None or a list (per frame) of None /
    (transparent_index | None, dispose) enabling the 89a graphic
    control extension. Real LZW compression (dictionary growth,
    width schedule, full-table clears)."""
    pal = np.asarray(palette, dtype=np.uint8)
    n = pal.shape[0]
    if n < 4 or n > 256 or n & (n - 1):
        raise GifError("palette size must be a power of two in 4..256")
    size_bits = n.bit_length() - 2  # 2^(size+1) = n
    norm = []
    for f in frames:
        if isinstance(f, tuple):
            top, left, idx = f
        else:
            top, left, idx = 0, 0, f
        norm.append((top, left, np.asarray(idx, dtype=np.int64)))
    H = max(t + f.shape[0] for t, _, f in norm)
    W = max(left + f.shape[1] for _, left, f in norm)
    out = bytearray(b"GIF89a")
    out += W.to_bytes(2, "little") + H.to_bytes(2, "little")
    out.append(0x80 | ((size_bits & 7) << 4) | (size_bits & 7))
    out.append(bg_index)
    out.append(0)
    out += pal.tobytes()
    min_code = max(2, (n - 1).bit_length())
    for fi, (top, left, idx) in enumerate(norm):
        ctl = gce[fi] if gce is not None else None
        if ctl is not None:
            trans, dispose = ctl
            flags = ((dispose & 7) << 2) | (1 if trans is not None
                                            else 0)
            out += bytes([0x21, 0xF9, 4, flags, 0, 0,
                          trans if trans is not None else 0, 0])
        h, w = idx.shape
        out.append(0x2C)
        out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0x40 if interlace else 0)
        rows = idx[_interlace_order(h)] if interlace else idx
        out.append(min_code)
        out += _sub_blocks(lzw_encode(min_code, rows.reshape(-1)))
    out.append(0x3B)
    return bytes(out)


def decode_gif_first_frame(data: bytes):
    """(w, h, mode, pixels) adapter for the image-features dispatch."""
    frames, meta = decode_gif(data)
    return meta["width"], meta["height"], "RGB", frames[0]
