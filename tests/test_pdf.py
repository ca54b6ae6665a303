"""PDF text extraction (sources/pdf.py): object-syntax unit vectors,
writer/reader round-trips across every writer option, incremental
updates through the /Prev chain, unsupported-feature gates, and the
Spark page-extraction layer."""

from __future__ import annotations

import re
import zlib

import pytest

from montandon_etl_spark.sources.pdf import (
    PdfDocument,
    Ref,
    append_update,
    build_pdf,
    extract_page_text,
    extract_pdf_text,
    parse_object,
    pdf_pages,
)


# ------------------------------------------------------------- syntax -------
def test_parse_object_vectors():
    cases = [
        (b"42 ", 42), (b"-7 ", -7), (b"3.5 ", 3.5), (b"-.25 ", -0.25),
        (b"true ", True), (b"false ", False), (b"null ", None),
        (b"/Name ", "Name"), (b"/A#20B ", "A B"),
        (b"(simple) ", b"simple"),
        (rb"(esc \( \) \\ \n \t) ", b"esc ( ) \\ \n \t"),
        (rb"(octal \101\12\0053) ", b"octal A\n\x053"),
        (b"(nested (parens) ok) ", b"nested (parens) ok"),
        (b"(line \\\ncontinued) ", b"line continued"),
        (b"<48690A> ", b"Hi\n"),
        (b"<48 69 7> ", b"Hip"),  # odd digit padded with 0 -> 0x70
        (b"[ 1 (a) /B ] ", [1, b"a", "B"]),
        (b"<< /A 1 /B (x) /C << /D [ 2 ] >> >> ",
         {"A": 1, "B": b"x", "C": {"D": [2]}}),
        (b"12 0 R ", Ref(12, 0)),
    ]
    for raw, want in cases:
        got, pos = parse_object(raw, 0)
        assert got == want, raw
    # "12 0 RG" must NOT lex as a reference (RG is an operator)
    got, _ = parse_object(b"12 0 RG", 0)
    assert got == 12


def test_comments_and_whitespace():
    got, _ = parse_object(b"% comment\n  << /A % inline\n 5 >>", 0)
    assert got == {"A": 5}


# ----------------------------------------------------------- round-trip -----
PAGES = [
    ["hello world", "second line", "third (line) with \\ specials"],
    ["page two only line"],
    ["a" * 90, "", "tail"],
]


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("kern", [0, 7])
@pytest.mark.parametrize("use_hex", [False, True])
def test_roundtrip_matrix(compress, kern, use_hex):
    data = build_pdf(PAGES, compress=compress, kern_every=kern,
                     use_hex=use_hex)
    texts = extract_pdf_text(data)
    assert texts == ["\n".join(p) for p in PAGES]


def test_deterministic_bytes():
    assert build_pdf(PAGES) == build_pdf(PAGES)


def test_multiple_content_streams_concatenate(tmp_path):
    """A /Contents ARRAY of streams is one logical stream."""
    base = build_pdf([["first"]], compress=False)
    doc = PdfDocument(base)
    page = doc.pages()[0]
    # rebuild page 3 0 obj with two content streams (4 0 R + new 9 0 R)
    extra = b"BT /F1 12 Tf 0 -14 Td (more) Tj ET"
    upd = append_update(
        base, 9,
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(extra), extra))
    upd = append_update(
        upd, 3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] "
        b"/Resources << /Font << /F1 5 0 R >> >> "
        b"/Contents [ 4 0 R 9 0 R ] >>")
    assert extract_pdf_text(upd) == ["first\nmore"]
    assert page is not None


def test_incremental_update_prev_chain():
    """append_update replaces one page's content; untouched objects
    still resolve through the /Prev chain."""
    base = build_pdf([["old text"], ["keep me"]], compress=False)
    new = b"BT /F1 12 Tf (new text) Tj ET"
    upd = append_update(
        base, 4,
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(new), new))
    assert extract_pdf_text(upd) == ["new text", "keep me"]
    # the base document is untouched (append-only)
    assert upd.startswith(base)
    assert extract_pdf_text(base) == ["old text", "keep me"]


def test_indirect_length():
    """/Length may be an indirect reference."""
    body = b"BT (via indirect length) Tj ET"
    raw = bytearray(b"%PDF-1.4\n")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Count 1 /Kids [ 3 0 R ] >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 5 0 R >>\nstream\n" + body + b"\nendstream",
        5: str(len(body)).encode(),
    }
    offs = {}
    for n in sorted(objs):
        offs[n] = len(raw)
        raw += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xa = len(raw)
    raw += b"xref\n0 6\n0000000000 65535 f \n"
    for n in range(1, 6):
        raw += b"%010d 00000 n \n" % offs[n]
    raw += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF" % xa
    assert extract_pdf_text(bytes(raw)) == ["via indirect length"]


def test_unsupported_gates():
    with pytest.raises(ValueError, match="%PDF"):
        PdfDocument(b"not a pdf at all")
    data = build_pdf([["x"]])
    # point startxref at a non-table (simulates an xref STREAM doc)
    broken = re.sub(rb"startxref\n\d+", b"startxref\n9", data)
    with pytest.raises(ValueError, match="cross-reference streams"):
        PdfDocument(broken)
    # unknown filter
    # same byte length (11-char filter name) so xref offsets stay valid
    bad = data.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecodeXX")
    with pytest.raises(ValueError, match="unsupported filter"):
        extract_pdf_text(bad)


def test_text_operators_newline_semantics():
    content = (b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (a) Tj 10 0 Td (b) Tj "
               b"0 -14 Td (c) Tj T* (d) Tj (e) ' 1 2 (f) \" ET")
    # horizontal Td: no newline between a and b; vertical moves break
    assert extract_page_text(content) == "ab\nc\nd\ne\nf"


def test_flate_roundtrip_content():
    data = build_pdf([["z" * 200]], compress=True)
    assert b"FlateDecode" in data
    assert extract_pdf_text(data) == ["z" * 200]
    # compression actually happened
    doc = PdfDocument(data)
    obj = doc.get_object(4)
    assert len(obj[2]) < 200
    assert zlib.decompress(obj[2]).startswith(b"BT")


# ------------------------------------------------------------ Spark layer ---
def test_pdf_pages_spark(spark):
    import pandas as pd
    blobs = []
    want = []
    for d in range(40):
        pages = [[f"doc {d} page {p} line {ln}" for ln in range(1 + d % 3)]
                 for p in range(1 + d % 4)]
        blobs.append((d, build_pdf(pages, compress=d % 2 == 0,
                                   kern_every=(5 if d % 3 == 0 else 0))))
        for p, lines in enumerate(pages):
            want.append((d, p, "\n".join(lines)))
    blobs.append((999, b"corrupt pdf bytes"))
    df = spark.createDataFrame(blobs, "asset_id bigint, payload binary")
    got = pdf_pages(df, "asset_id", "payload").collect()
    good = sorted((r.asset_id, r.page_idx, r.text)
                  for r in got if r.page_idx is not None)
    assert good == sorted(want)
    assert [r.asset_id for r in got if r.page_idx is None] == [999]
    for r in got:
        if r.page_idx is not None:
            assert r.n_chars == len(r.text)
