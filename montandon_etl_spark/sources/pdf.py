"""PDF text extraction: a dependency-free parser for the web's other
document format (web crawls are full of PDFs; Common-Crawl-scale
curation pipelines extract their text alongside HTML), plus a
deterministic writer so every byte the reader must understand is
produced — and pinned — in-repo, the same writer/reader contract as
the PNG/JPEG/GIF/FLAC/H.264 codecs (operators/multimodal.py et al).

Reader scope (documented, fails loudly outside it):

- classic cross-reference TABLES, including incremental updates
  chained via ``/Prev`` (later sections override earlier object
  generations — the PDF append-only update model);
- object syntax: dictionaries, arrays, names (with ``#xx`` escapes),
  numbers, booleans, null, literal strings (all escape forms:
  ``\\n \\r \\t \\b \\f \\( \\) \\\\``, 1–3 digit octal, line
  continuations, nested balanced parens) and hex strings;
- streams with ``/Length`` direct or indirect, ``/Filter`` absent or
  ``FlateDecode`` (zlib);
- the document structure walk ``/Root → /Pages`` with nested
  ``/Kids`` page trees, per-page ``/Contents`` as a single stream or
  an array of streams (concatenated in order, per spec);
- the text-showing subset of the content-stream language: ``BT/ET``
  blocks, ``Tj`` / ``'`` / ``\"`` string shows, ``TJ`` arrays
  (strings concatenated, kerning numbers ignored), and the
  line-advance operators ``Td TD T* Tm`` — a vertical move emits a
  newline, a pure horizontal move does not.

Not supported (raise ``ValueError``, record-not-drop at the Spark
layer): cross-reference STREAMS and compressed object streams
(PDF 1.5 ``/ObjStm``), encryption, and non-Flate filters. Text bytes
are decoded latin-1 → str; real-world font ``/Encoding`` remapping is
out of scope and documented as such (the writer emits WinAnsi-coded
Helvetica, identity on ASCII).

Scale shape: extraction is an Arrow-batched ``mapInPandas`` over
opaque payload bytes — per-file Python like the WARC/image decoders,
zero row-at-a-time UDFs, one output row per page so downstream text
operators (quality, dedup, tokenize) see the same ``documents`` shape
the rest of the engine speaks.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug only
        return f"{self.num} {self.gen} R"

    def __eq__(self, o):
        return isinstance(o, Ref) and (self.num, self.gen) == (o.num, o.gen)

    def __hash__(self):
        return hash((self.num, self.gen))


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.d, self.pos = data, pos

    def _skip_ws(self) -> None:
        d = self.d
        while self.pos < len(d):
            c = d[self.pos:self.pos + 1]
            if c in (b"%",):  # comment to EOL
                nl = d.find(b"\n", self.pos)
                self.pos = len(d) if nl == -1 else nl + 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def peek_byte(self) -> bytes:
        self._skip_ws()
        return self.d[self.pos:self.pos + 1]

    def token(self) -> bytes:
        """Next regular token (name-char run) — not strings/dicts."""
        self._skip_ws()
        d, p = self.d, self.pos
        if p >= len(d):
            raise ValueError("unexpected EOF in PDF tokens")
        if d[p:p + 2] in (b"<<", b">>"):
            self.pos = p + 2
            return d[p:p + 2]
        if d[p:p + 1] in _DELIM:
            self.pos = p + 1
            return d[p:p + 1]
        q = p
        while q < len(d) and d[q:q + 1] not in _WS and d[q:q + 1] not in _DELIM:
            q += 1
        self.pos = q
        return d[p:q]


def _parse_literal_string(d: bytes, pos: int) -> tuple[bytes, int]:
    """pos points just past the opening ``(``."""
    out = bytearray()
    depth = 1
    while True:
        if pos >= len(d):
            raise ValueError("unterminated literal string")
        c = d[pos]
        if c == 0x5C:  # backslash
            pos += 1
            e = d[pos:pos + 1]
            if e in b"nrtbf":
                out += {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                        b"b": b"\b", b"f": b"\f"}[e]
                pos += 1
            elif e in b"()\\":
                out += e
                pos += 1
            elif e == b"\r":  # line continuation
                pos += 2 if d[pos:pos + 2] == b"\r\n" else 1
            elif e == b"\n":
                pos += 1
            elif e.isdigit():
                o = d[pos:pos + 3]
                m = re.match(rb"[0-7]{1,3}", o)
                out.append(int(m.group(), 8) & 0xFF)
                pos += len(m.group())
            else:  # unknown escape: backslash dropped per spec
                out += e
                pos += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1


def _parse_hex_string(d: bytes, pos: int) -> tuple[bytes, int]:
    end = d.find(b">", pos)
    if end == -1:
        raise ValueError("unterminated hex string")
    hx = re.sub(rb"\s", b"", d[pos:end])
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit padded with 0
    return bytes.fromhex(hx.decode("ascii")), end + 1


def _parse_name(d: bytes, pos: int) -> tuple[str, int]:
    q = pos
    while q < len(d) and d[q:q + 1] not in _WS and d[q:q + 1] not in _DELIM:
        q += 1
    raw = d[pos:q]
    raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                 lambda m: bytes([int(m.group(1), 16)]), raw)
    return raw.decode("latin-1"), q


_NUM_RE = re.compile(rb"[+-]?(\d+\.\d*|\.\d+|\d+)")


def parse_object(d: bytes, pos: int) -> tuple[Any, int]:
    """Parse one PDF object starting at pos; returns (value, new_pos).
    Indirect references come back as ``Ref``."""
    lx = _Lexer(d, pos)
    lx._skip_ws()
    pos = lx.pos
    c = d[pos:pos + 1]
    if c == b"(":
        return _parse_literal_string(d, pos + 1)
    if d[pos:pos + 2] == b"<<":
        pos += 2
        out: dict[str, Any] = {}
        while True:
            lx = _Lexer(d, pos)
            lx._skip_ws()
            pos = lx.pos
            if d[pos:pos + 2] == b">>":
                return out, pos + 2
            if d[pos:pos + 1] != b"/":
                raise ValueError("dict key must be a name")
            k, pos = _parse_name(d, pos + 1)
            out[k], pos = parse_object(d, pos)
    if c == b"<":
        return _parse_hex_string(d, pos + 1)
    if c == b"[":
        pos += 1
        arr = []
        while True:
            lx = _Lexer(d, pos)
            lx._skip_ws()
            pos = lx.pos
            if d[pos:pos + 1] == b"]":
                return arr, pos + 1
            v, pos = parse_object(d, pos)
            arr.append(v)
    if c == b"/":
        return _parse_name(d, pos + 1)
    m = _NUM_RE.match(d, pos)
    if m and m.start() == pos:
        # try "<num> <gen> R" indirect reference
        mr = re.match(rb"(\d+)\s+(\d+)\s+R(?![a-zA-Z0-9])", d[pos:pos + 32])
        if mr:
            return Ref(int(mr.group(1)), int(mr.group(2))), pos + mr.end()
        tok = m.group()
        v = float(tok) if b"." in tok else int(tok)
        return v, m.end()
    word = _Lexer(d, pos).token()
    if word == b"true":
        return True, pos + 4
    if word == b"false":
        return False, pos + 5
    if word == b"null":
        return None, pos + 4
    raise ValueError(f"cannot parse object at byte {pos}: {d[pos:pos+16]!r}")


class PdfDocument:
    """Random-access reader over one PDF byte string."""

    def __init__(self, data: bytes):
        self.d = data
        if not data.startswith(b"%PDF-"):
            raise ValueError("missing %PDF header")
        self.xref: dict[int, int] = {}
        self.trailer: dict[str, Any] = {}
        self._load_xref()
        self._cache: dict[int, Any] = {}

    # -- xref ------------------------------------------------------------
    def _load_xref(self) -> None:
        d = self.d
        tail = d[-256:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("missing startxref")
        start = int(m.group(1))
        seen = set()
        while True:
            if start in seen:
                raise ValueError("xref /Prev cycle")
            seen.add(start)
            if not d[start:start + 4] == b"xref":
                raise ValueError(
                    "cross-reference streams are not supported (classic "
                    "xref tables only)")
            lx = _Lexer(d, start + 4)
            while True:
                lx._skip_ws()
                if d[lx.pos:lx.pos + 7] == b"trailer":
                    lx.pos += 7
                    break
                first = int(lx.token())
                count = int(lx.token())
                lx._skip_ws()
                for i in range(count):
                    ent = d[lx.pos:lx.pos + 20]
                    off = int(ent[0:10])
                    kind = ent[17:18]
                    num = first + i
                    # earlier sections in the /Prev chain must NOT
                    # override later ones (we walk newest → oldest)
                    if num not in self.xref and kind == b"n":
                        self.xref[num] = off
                    elif num not in self.xref:
                        self.xref[num] = -1  # free
                    lx.pos += 20
            trailer, _ = parse_object(d, lx.pos)
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            if "Prev" in trailer and trailer["Prev"] not in seen:
                start = int(trailer["Prev"])
            else:
                return

    # -- objects ---------------------------------------------------------
    def resolve(self, v: Any) -> Any:
        while isinstance(v, Ref):
            v = self.get_object(v.num)
        return v

    def get_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        off = self.xref.get(num, -1)
        if off < 0:
            return None
        d = self.d
        m = re.match(rb"(\d+)\s+(\d+)\s+obj", d[off:off + 48])
        if not m or int(m.group(1)) != num:
            raise ValueError(f"xref offset for obj {num} does not point "
                             f"at an obj header")
        pos = off + m.end()
        val, pos = parse_object(d, pos)
        lx = _Lexer(d, pos)
        lx._skip_ws()
        if d[lx.pos:lx.pos + 6] == b"stream":
            p = lx.pos + 6
            if d[p:p + 2] == b"\r\n":
                p += 2
            elif d[p:p + 1] == b"\n":
                p += 1
            if not isinstance(val, dict):
                raise ValueError("stream without a dict")
            length = self.resolve(val.get("Length"))
            if not isinstance(length, int):
                raise ValueError("stream /Length missing or non-integer")
            raw = d[p:p + length]
            if len(raw) != length:
                raise ValueError("truncated stream")
            val = ("stream", val, raw)
        self._cache[num] = val
        return val

    def stream_data(self, obj: Any) -> bytes:
        obj = self.resolve(obj)
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise ValueError("expected a stream object")
        _, sd, raw = obj
        filt = self.resolve(sd.get("Filter"))
        if filt is None:
            return raw
        filts = filt if isinstance(filt, list) else [filt]
        for f_ in filts:
            f_ = self.resolve(f_)
            if f_ == "FlateDecode":
                raw = zlib.decompress(raw)
            else:
                raise ValueError(f"unsupported filter {f_!r}")
        return raw

    # -- document structure ------------------------------------------------
    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("missing /Root catalog")
        out: list[dict] = []

        def walk(node_ref: Any) -> None:
            node = self.resolve(node_ref)
            t = self.resolve(node.get("Type"))
            if t == "Pages":
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid)
            elif t == "Page":
                out.append(node)
            else:
                raise ValueError(f"unexpected page-tree node type {t!r}")

        walk(root.get("Pages"))
        return out

    def page_content(self, page: dict) -> bytes:
        c = self.resolve(page.get("Contents"))
        if c is None:
            return b""
        parts = c if isinstance(c, list) else [c]
        # spec: multiple content streams form ONE stream, whitespace-joined
        return b"\n".join(self.stream_data(p) for p in parts)


# ------------------------------------------------------- text extraction ----
_OPERAND_STARTS = b"([</+-.0123456789"


def extract_page_text(content: bytes) -> str:
    """Interpret the text-showing subset of a content stream. Vertical
    line moves (Td/TD with ty != 0, T*, Tm with a new y) emit ``\\n``."""
    pos = 0
    d = content
    out: list[str] = []
    stack: list[Any] = []
    in_text = False
    last_emitted_nl = True

    def show(s: bytes) -> None:
        nonlocal last_emitted_nl
        out.append(s.decode("latin-1"))
        last_emitted_nl = False

    def newline() -> None:
        nonlocal last_emitted_nl
        if not last_emitted_nl:
            out.append("\n")
            last_emitted_nl = True

    while pos < len(d):
        lx = _Lexer(d, pos)
        c = lx.peek_byte()
        pos = lx.pos
        if pos >= len(d):
            break
        if c in b"(<[/" or (c in b"+-.0123456789"):
            v, pos = parse_object(d, pos)
            stack.append(v)
            continue
        tok = _Lexer(d, pos).token()
        pos += len(tok)
        op = tok.decode("latin-1")
        if op == "BT":
            in_text = True
        elif op == "ET":
            in_text = False
        elif in_text and op == "Tj":
            show(stack[-1] if isinstance(stack[-1], bytes) else b"")
        elif in_text and op == "'":
            newline()
            show(stack[-1] if isinstance(stack[-1], bytes) else b"")
        elif in_text and op == '"':
            newline()
            show(stack[-1] if isinstance(stack[-1], bytes) else b"")
        elif in_text and op == "TJ":
            arr = stack[-1] if isinstance(stack[-1], list) else []
            show(b"".join(x for x in arr if isinstance(x, bytes)))
        elif in_text and op in ("Td", "TD"):
            ty = stack[-1] if len(stack) >= 1 else 0
            if isinstance(ty, (int, float)) and ty != 0:
                newline()
        elif in_text and op == "T*":
            newline()
        elif in_text and op == "Tm":
            # a fresh text matrix starts a new line unless nothing shown
            newline()
        # operands always precede their operator: consume them
        stack = []
    return "".join(out)


def extract_pdf_text(data: bytes) -> list[str]:
    """All pages' text, in page-tree order — the document-level API."""
    doc = PdfDocument(data)
    return [extract_page_text(doc.page_content(p)) for p in doc.pages()]


# ------------------------------------------------------------------ writer --
def _esc_literal(s: bytes) -> bytes:
    out = bytearray(b"(")
    for b in s:
        if b in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([b])
        elif b == 0x0A:
            out += b"\\n"
        elif b == 0x0D:
            out += b"\\r"
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def build_pdf(pages: list[list[str]], compress: bool = True,
              kern_every: int = 0, use_hex: bool = False) -> bytes:
    """Deterministic minimal PDF: one content stream per page, one
    shared Helvetica font. ``pages`` is a list of pages, each a list of
    text lines. ``kern_every > 0`` emits lines as TJ arrays split into
    chunks of that many chars with kerning numbers between (the
    extractor must reassemble); ``use_hex`` emits hex strings."""

    def strbytes(s: str) -> bytes:
        b = s.encode("latin-1")
        if use_hex:
            return b"<" + b.hex().encode() + b">"
        return _esc_literal(b)

    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Count %d /Kids [ %s ] >>"
               % (n_pages, kids))
    for i, lines in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objs[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_num, cnum))
        ops = [b"BT", b"/F1 12 Tf", b"1 0 0 1 72 720 Tm"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append(b"0 -14 Td")
            if kern_every > 0 and line:
                parts = [strbytes(line[k:k + kern_every])
                         for k in range(0, len(line), kern_every)]
                ops.append(b"[ " + b" -12 ".join(parts) + b" ] TJ")
            else:
                ops.append(strbytes(line) + b" Tj")
        ops.append(b"ET")
        body = b"\n".join(ops)
        if compress:
            z = zlib.compress(body, 9)
            objs[cnum] = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                          % len(z)) + z + b"\nendstream"
        else:
            objs[cnum] = (b"<< /Length %d >>\nstream\n" % len(body)) \
                + body + b"\nendstream"
    objs[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (n, xref_at))
    return bytes(out)


def append_update(pdf: bytes, obj_num: int, new_body: bytes) -> bytes:
    """Incremental update: append a replacement for one object plus a
    new xref section chaining to the previous one via /Prev — the PDF
    append-only revision model the reader's /Prev walk must honour."""
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", pdf[-256:]):
        pass
    if m is None:
        raise ValueError("missing startxref in base PDF")
    prev = int(m.group(1))
    tm = re.search(rb"/Size (\d+)", pdf[prev:prev + 512])
    size = int(tm.group(1)) if tm else obj_num + 1
    out = bytearray(pdf)
    off = len(out)
    out += b"%d 0 obj\n" % obj_num + new_body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n%d 1\n%010d 00000 n \n" % (obj_num, off)
    out += (b"trailer\n<< /Size %d /Root 1 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (max(size, obj_num + 1), prev,
                                           xref_at))
    return bytes(out)


# ------------------------------------------------------------ Spark layer ---
PDF_PAGE_SCHEMA = ("asset_id bigint, page_idx int, text string,"
                   " n_chars int")


def pdf_pages(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """One row per page per PDF blob; a malformed/unsupported document
    yields one NULL-page row (record-not-drop), never a failed task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "page_idx", "text", "n_chars"]
        for pdf_ in it:
            rows = []
            for aid, p in zip(pdf_[id_col], pdf_[bin_col]):
                try:
                    for i, t in enumerate(extract_pdf_text(bytes(p))):
                        rows.append((aid, i, t, len(t)))
                except Exception:
                    rows.append((aid, None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(batches,
                                                  schema=PDF_PAGE_SCHEMA)
