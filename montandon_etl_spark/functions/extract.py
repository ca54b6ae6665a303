"""The reference HTML→text extractor, in two byte-identical forms.

The reference scrapes HTML payloads into structured values with pandas
(apps/etl/extraction/sources/gdacs/extract.py:69-79 uses
``pd.read_html`` over population-exposure tables) and stores derived
text documents per extraction row (apps/etl/models.py:112). This module
is the engine's generalization: a *pure, versioned, deterministic*
``bytes → (text, lang)`` function with

- a plain-Python oracle form (``extract_text_bytes``) used by the
  replay-equivalence oracle and tests, and
- an Arrow-vectorized ``pandas_udf`` form (``extract_text_udf``) used
  on the hot path — Arrow batches in/out, no Spark row-at-a-time
  Python UDF.

Both forms call the exact same pure function on the same ``bytes``
values, so output is byte-identical by construction; the test suite
additionally asserts element-wise equality on every fixture (the
``input_hint`` per-row invariant in BASELINE.json).

Determinism contract: bytes in → str out. No locale, no wall clock, no
float formatting. Invalid UTF-8 is decoded with U+FFFD replacement
(explicit policy, pinned by tests with invalid-byte fixtures).
"""

from __future__ import annotations

import html as _htmlmod
import re
from collections import Counter

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

# Bump whenever extraction semantics change: the version participates in
# snapshot metadata so a replay can detect extractor drift.
EXTRACTOR_VERSION = "1.0.0"

# --- tag stripping -----------------------------------------------------------
# Drop these elements *with their content*.
_DROP_CONTENT_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# Block-level elements become newlines so document structure survives.
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|hr|h[1-6]|li|ul|ol|table|tr|td|th|thead|tbody|section|"
    r"article|header|footer|nav|aside|blockquote|pre|form|figure|figcaption|"
    r"main|title)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
# Whitespace-run collapse, output-identical to s/[ \t\r\f\v\xa0]+/ /
# but ~10x faster: a lone regular space maps to itself, so only runs
# of >=2 and lone NON-space whitespace need rewriting (few matches
# instead of one per space).
_HSPACE_MULTI_RE = re.compile(r"[ \t\r\f\v\xa0]{2,}")
_HSPACE_ODD_RE = re.compile(r"[\t\r\f\v\xa0]")
# output-identical to s/ ?\n ?/\n/ but a bare \n maps to itself, so
# only space-adjacent newlines need matching
_NL_SPACE_RE = re.compile(r" \n ?|\n ")
_MULTI_NL_RE = re.compile(r"\n{2,}")

# --- language id -------------------------------------------------------------
# Deterministic n-gram/stopword heuristic; insertion order breaks ties.
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in is that it for on with as was at by an be this have from or".split()
    ),
    "es": frozenset(
        "el la de que y en los del se las por un para con una su al es lo como".split()
    ),
    "fr": frozenset(
        "le la de et les des en un du une que est pour qui dans par sur au plus".split()
    ),
    "de": frozenset(
        "der die und das von zu den mit ist des sich nicht ein eine auf als auch".split()
    ),
}
_TOKEN_RE = re.compile(r"[a-zàâçéèêëîïôùûüáíóúñäöß]+")
# inverted stopword index: token -> langs containing it (one dict
# lookup per token instead of 4 set scans; hit counts identical)
_STOP_LANGS: dict[str, tuple[str, ...]] = {}
for _lang, _stops in _LANG_STOPWORDS.items():
    for _w in _stops:
        _STOP_LANGS[_w] = _STOP_LANGS.get(_w, ()) + (_lang,)


def language_id(text: str) -> str:
    """Deterministic language tag: en/es/fr/de, else 'und'.

    Counts stopword hits over lowercase alpha tokens; requires >= 2 hits
    and > 12% stopword ratio. First-declared language wins ties.
    """
    tokens = _TOKEN_RE.findall(text.lower())
    if not tokens:
        return "und"
    counts: dict[str, int] = {}
    get = _STOP_LANGS.get
    # count unique tokens once (vocabulary is Zipf — far fewer uniques
    # than tokens), multiply by multiplicity: identical hit counts
    for t, c in Counter(tokens).items():
        langs = get(t)
        if langs:
            for lang in langs:
                counts[lang] = counts.get(lang, 0) + c
    best_lang, best_hits = "und", 0
    for lang in _LANG_STOPWORDS:  # declaration order breaks ties
        hits = counts.get(lang, 0)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits >= 2 and best_hits / len(tokens) > 0.12:
        return best_lang
    return "und"


def extract_text_bytes(html: bytes | None) -> tuple[str, str]:
    """Pure oracle form: html bytes → (text, lang).

    Policy (pinned, versioned):
    1. decode utf-8 with U+FFFD replacement;
    2. strip comments and script/style/noscript/template with content;
    3. block-level tags → newline, all other tags → removed;
    4. HTML entities unescaped;
    5. horizontal whitespace runs → single space, blank lines collapsed,
       result stripped;
    6. lang = stopword-heuristic language id over the text.
    """
    if html is None:
        return "", "und"
    s = html.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", s)
    s = _DROP_CONTENT_RE.sub("", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _ANY_TAG_RE.sub("", s)
    s = _htmlmod.unescape(s)
    s = _HSPACE_MULTI_RE.sub(" ", s)
    s = _HSPACE_ODD_RE.sub(" ", s)
    s = _NL_SPACE_RE.sub("\n", s)
    s = _MULTI_NL_RE.sub("\n", s)
    text = s.strip()
    return text, language_id(text)


_RESULT_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)


@F.pandas_udf(_RESULT_TYPE)
def extract_text_udf(html: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized engine form. Same pure function per element →
    byte-identical to the oracle; Arrow moves batches, not rows."""
    pairs = [extract_text_bytes(h) for h in html]
    return pd.DataFrame(pairs, columns=["text", "lang"])


# --- main-content extraction (within-page boilerplate removal) ---------------
# The jusText/trafilatura problem: a page's TEXT is not its CONTENT —
# navigation, link farms, and chrome survive tag-stripping. This is the
# within-page complement to the cross-doc (host, line) document-
# frequency strip in operators/textstats.strip_host_boilerplate: block
# segmentation + per-block link-density / length / stopword-density
# classification (the deterministic jusText core, WITHOUT the
# neighbour-smoothing context pass — documented subset). Same
# byte-identical pure/Arrow pair contract as the extractor above.

_BLOCK_SPLIT_RE = re.compile(
    r"</?(?:p|div|br|hr|h[1-6]|li|ul|ol|table|tr|td|th|thead|tbody|section|"
    r"article|header|footer|nav|aside|blockquote|pre|form|figure|figcaption|"
    r"main|title)\b[^>]*/?>",
    re.IGNORECASE,
)
_A_CONTENT_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)


def _clean_inline(s: str) -> str:
    """inline fragment → collapsed visible text (tags stripped FIRST,
    then entities unescaped so &lt; cannot fabricate a tag)."""
    s = _ANY_TAG_RE.sub("", s)
    s = _htmlmod.unescape(s)
    return " ".join(s.split())


def main_content_blocks(html: bytes | None,
                        stop_lang: str = "en") -> list[dict]:
    """Segment a page at block-level tags and measure each block:
    ``text`` (collapsed visible text), ``n_chars``, ``link_density``
    (anchor-text chars / block chars), ``stop_density`` (fraction of
    lower-cased words in the language's stopword list)."""
    if html is None:
        return []
    s = html.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", s)
    s = _DROP_CONTENT_RE.sub("", s)
    stops = _LANG_STOPWORDS.get(stop_lang, frozenset())
    out = []
    for seg in _BLOCK_SPLIT_RE.split(s):
        link_chars = sum(len(_clean_inline(m))
                         for m in _A_CONTENT_RE.findall(seg))
        text = _clean_inline(seg)
        if not text:
            continue
        words = text.split()
        n_stop = sum(1 for w in words if w.lower() in stops)
        out.append({
            "text": text,
            "n_chars": len(text),
            "link_density": link_chars / max(1, len(text)),
            "stop_density": n_stop / max(1, len(words)),
        })
    return out


def extract_main_content(html: bytes | None, min_len: int = 25,
                         max_link_density: float = 0.33,
                         min_stop_density: float = 0.0,
                         stop_lang: str = "en") -> tuple[str, int, int]:
    """(main_text, n_blocks, n_good): good blocks are long enough, not
    link-dominated, and (optionally) stopword-dense; main_text joins
    them with newlines. Deterministic — thresholds are exact
    comparisons on exact integer counts and one float ratio."""
    blocks = main_content_blocks(html, stop_lang)
    good = [b for b in blocks
            if b["n_chars"] >= min_len
            and b["link_density"] <= max_link_density
            and b["stop_density"] >= min_stop_density]
    return "\n".join(b["text"] for b in good), len(blocks), len(good)


_MAIN_RESULT_TYPE = T.StructType([
    T.StructField("main_text", T.StringType(), False),
    T.StructField("n_blocks", T.IntegerType(), False),
    T.StructField("n_good", T.IntegerType(), False),
])


def main_content_udf(min_len: int = 25, max_link_density: float = 0.33,
                     min_stop_density: float = 0.0, stop_lang: str = "en"):
    """Configured Arrow-vectorized form of ``extract_main_content``
    (parameters are captured, not columns — one codegen per config)."""

    @F.pandas_udf(_MAIN_RESULT_TYPE)
    def udf(html: pd.Series) -> pd.DataFrame:
        rows = [extract_main_content(h, min_len, max_link_density,
                                     min_stop_density, stop_lang)
                for h in html]
        return pd.DataFrame(rows, columns=["main_text", "n_blocks",
                                           "n_good"])

    return udf


# --- mojibake repair (ftfy-style encoding-artifact cleanup) -------------------
# The web's most common corruption: UTF-8 bytes decoded as cp1252
# somewhere upstream ("café" → "cafÃ©", "’" → "â€™"). Repair =
# re-encode through a SLOPPY cp1252 (the 5 undefined positions
# 0x81/0x8D/0x8F/0x90/0x9D pass through as their Latin-1 codepoints,
# exactly how lenient decoders produced the damage) and accept the
# pass ONLY if the bytes decode as strict UTF-8 — valid text is a
# fixed point because its sloppy-encoding is not valid UTF-8.
# Inherent ambiguity (a document LEGITIMATELY containing "Ã©") is
# resolved toward repair, the ftfy convention. max_passes bounds the
# doubly-encoded case. Pure + Arrow forms are byte-identical, the
# extractor contract.

_SLOPPY_DEC = [bytes([i]).decode("cp1252", "ignore") or chr(i)
               for i in range(256)]
_SLOPPY_ENC = {c: i for i, c in enumerate(_SLOPPY_DEC)}


def sloppy_cp1252_decode(b: bytes) -> str:
    """cp1252 with the 5 undefined bytes passed through (how lenient
    decoders actually behave — Python's strict codec would raise)."""
    return "".join(_SLOPPY_DEC[x] for x in b)


def _sloppy_cp1252_encode(s: str) -> bytes | None:
    out = bytearray()
    for c in s:
        i = _SLOPPY_ENC.get(c)
        if i is None:
            return None  # not a cp1252 view of anything — leave text alone
        out.append(i)
    return bytes(out)


def make_mojibake(s: str | None) -> str | None:
    """The corrupter (fixtures/tests): what a page looks like after
    its UTF-8 bytes were read as cp1252."""
    if s is None:
        return None
    return sloppy_cp1252_decode(s.encode("utf-8"))


def fix_mojibake(s: str | None, max_passes: int = 2) -> str | None:
    """Pure oracle form: undo up to ``max_passes`` rounds of
    UTF-8-read-as-cp1252 damage; returns the input unchanged when the
    round-trip does not validate (clean text is a fixed point)."""
    if s is None:
        return None
    out = s
    for _ in range(max_passes):
        if all(ord(c) < 0x80 for c in out):
            break  # pure ASCII can never be mojibake
        b = _sloppy_cp1252_encode(out)
        if b is None:
            break
        try:
            dec = b.decode("utf-8", "strict")
        except UnicodeDecodeError:
            break
        if dec == out:
            break
        out = dec
    return out


@F.pandas_udf(T.StringType())
def fix_mojibake_udf(text: pd.Series) -> pd.Series:
    """Arrow-vectorized engine form of ``fix_mojibake``."""
    return text.map(lambda s: fix_mojibake(s) if s is not None else None)


@F.pandas_udf(T.StringType())
def make_mojibake_udf(text: pd.Series) -> pd.Series:
    """Arrow-vectorized corrupter (fixture synthesis)."""
    return text.map(lambda s: make_mojibake(s) if s is not None else None)
