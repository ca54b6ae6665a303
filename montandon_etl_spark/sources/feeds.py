"""Crawl-discovery sources: XML sitemaps (sitemaps.org 0.9, urlset +
sitemapindex) and RSS 2.0 / Atom 1.0 feeds.

A web-scale ingest pipeline doesn't just fetch pages — it discovers
them. Sitemaps advertise a site's URL inventory with freshness hints
(``lastmod``/``changefreq``/``priority``) that feed the recrawl
scheduler (operators/scd.recrawl_schedule) and the politeness frontier
(operators/relational.frontier_schedule); feeds advertise NEW content
between crawls. This module normalizes both into flat DataFrames so
discovery output joins the frontier exactly like observed-change
signals do.

Parsing is stdlib ``ElementTree`` inside ``mapInPandas`` — the same
shape as the DesInventar XML source (sources/xmlsrc.py): Arrow batches
in/out, 1→N fan-out, malformed documents yield a single NULL row
(record-not-drop) so a broken sitemap is visible downstream, never
silently absent.

Namespace handling: sitemaps use the sitemaps.org 0.9 namespace, Atom
uses the W3 2005 namespace, RSS 2.0 none; all three are matched by
LOCAL NAME so the common real-world sins (missing/wrong/default
namespace declarations) still parse.

Date normalization happens at parse time in Python (the slow path is
already per-blob): W3C datetime (sitemaps, Atom) and RFC 822 (RSS)
both land as epoch MICROSECONDS (bigint) next to the raw string —
downstream gets an engine-comparable instant without a second
format-sniffing pass, and the raw survives for forensics.
"""

from __future__ import annotations

import email.utils
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _w3c_to_us(s: str | None) -> int | None:
    """W3C datetime (YYYY-MM-DD or full ISO-8601 with offset) → epoch
    microseconds; date-only means UTC midnight per the sitemap spec."""
    if not s:
        return None
    s = s.strip()
    try:
        if len(s) == 10:
            dt = datetime.strptime(s, "%Y-%m-%d").replace(
                tzinfo=timezone.utc)
        else:
            dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return None


def _rfc822_to_us(s: str | None) -> int | None:
    if not s:
        return None
    try:
        return int(email.utils.parsedate_to_datetime(s.strip())
                   .timestamp() * 1_000_000)
    except (ValueError, TypeError):
        return None


# ---------------------------------------------------------------- sitemaps --
def parse_sitemap(data: bytes) -> list[dict]:
    """One dict per ``<url>`` (kind='url') or per child ``<sitemap>``
    of a sitemapindex (kind='sitemap')."""
    root = ET.fromstring(data)
    kind_tag = _local(root.tag)
    if kind_tag not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root: {kind_tag!r}")
    out = []
    for el in root:
        name = _local(el.tag)
        if name not in ("url", "sitemap"):
            continue
        f = {_local(c.tag): (c.text or "").strip() for c in el}
        out.append({
            "kind": "url" if name == "url" else "sitemap",
            "loc": f.get("loc"),
            "lastmod_raw": f.get("lastmod"),
            "lastmod_us": _w3c_to_us(f.get("lastmod")),
            "changefreq": f.get("changefreq"),
            "priority": float(f["priority"]) if f.get("priority") else None,
        })
    return out


SITEMAP_SCHEMA = ("asset_id bigint, entry_idx int, kind string, loc string,"
                  " lastmod_raw string, lastmod_us bigint,"
                  " changefreq string, priority double")


def sitemap_entries(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """One row per sitemap entry per blob; malformed blobs yield one
    NULL row (record-not-drop)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "entry_idx", "kind", "loc", "lastmod_raw",
                "lastmod_us", "changefreq", "priority"]
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    for i, e in enumerate(parse_sitemap(bytes(p))):
                        rows.append((aid, i, e["kind"], e["loc"],
                                     e["lastmod_raw"], e["lastmod_us"],
                                     e["changefreq"], e["priority"]))
                except Exception:
                    rows.append((aid, None, None, None, None, None,
                                 None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(batches,
                                                  schema=SITEMAP_SCHEMA)


# ------------------------------------------------------------------- feeds --
def parse_feed(data: bytes) -> list[dict]:
    """RSS 2.0 ``<rss><channel><item>`` and Atom 1.0 ``<feed><entry>``
    normalized to one shape: (feed_kind, title, link, entry_id,
    published_raw, published_us, summary). Atom links prefer
    rel='alternate' (or unset rel); RSS dates are RFC 822, Atom dates
    ISO-8601."""
    root = ET.fromstring(data)
    kind = _local(root.tag)
    out = []
    if kind == "rss":
        chan = next((c for c in root if _local(c.tag) == "channel"), None)
        if chan is None:
            raise ValueError("rss without channel")
        for item in chan:
            if _local(item.tag) != "item":
                continue
            f = {_local(c.tag): (c.text or "").strip() for c in item}
            out.append({
                "feed_kind": "rss", "title": f.get("title"),
                "link": f.get("link"), "entry_id": f.get("guid"),
                "published_raw": f.get("pubDate"),
                "published_us": _rfc822_to_us(f.get("pubDate")),
                "summary": f.get("description"),
            })
    elif kind == "feed":
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            f: dict[str, str] = {}
            link = None
            for c in entry:
                n = _local(c.tag)
                if n == "link":
                    rel = c.get("rel")
                    if link is None or rel in (None, "alternate"):
                        link = c.get("href")
                else:
                    f[n] = (c.text or "").strip()
            pub = f.get("published") or f.get("updated")
            out.append({
                "feed_kind": "atom", "title": f.get("title"),
                "link": link, "entry_id": f.get("id"),
                "published_raw": pub,
                "published_us": _w3c_to_us(pub),
                "summary": f.get("summary"),
            })
    else:
        raise ValueError(f"not a feed root: {kind!r}")
    return out


FEED_SCHEMA = ("asset_id bigint, entry_idx int, feed_kind string,"
               " title string, link string, entry_id string,"
               " published_raw string, published_us bigint, summary string")


def feed_entries(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """One row per feed entry per blob; malformed blobs yield one NULL
    row (record-not-drop)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["asset_id", "entry_idx", "feed_kind", "title", "link",
                "entry_id", "published_raw", "published_us", "summary"]
        for pdf in it:
            rows = []
            for aid, p in zip(pdf[id_col], pdf[bin_col]):
                try:
                    for i, e in enumerate(parse_feed(bytes(p))):
                        rows.append((aid, i, e["feed_kind"], e["title"],
                                     e["link"], e["entry_id"],
                                     e["published_raw"], e["published_us"],
                                     e["summary"]))
                except Exception:
                    rows.append((aid, None, None, None, None, None,
                                 None, None, None))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, bin_col).mapInPandas(batches,
                                                  schema=FEED_SCHEMA)


# ------------------------------------------------------------------ writers -
SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
ATOM_NS = "http://www.w3.org/2005/Atom"


def build_sitemap(entries: list[dict], index: bool = False) -> bytes:
    """Deterministic sitemap writer (tests + fixtures). ``entries``
    carry loc and optional lastmod/changefreq/priority strings."""
    root_tag = "sitemapindex" if index else "urlset"
    child_tag = "sitemap" if index else "url"
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n'
             f'<{root_tag} xmlns="{SITEMAP_NS}">']
    for e in entries:
        parts.append(f"<{child_tag}>")
        parts.append(f"<loc>{e['loc']}</loc>")
        for k, tag in (("lastmod", "lastmod"), ("changefreq", "changefreq"),
                       ("priority", "priority")):
            if e.get(k) is not None:
                parts.append(f"<{tag}>{e[k]}</{tag}>")
        parts.append(f"</{child_tag}>")
    parts.append(f"</{root_tag}>")
    return "\n".join(parts).encode("utf-8")


def build_rss(items: list[dict]) -> bytes:
    parts = ['<?xml version="1.0"?>\n<rss version="2.0"><channel>',
             "<title>t</title><link>l</link><description>d</description>"]
    for e in items:
        parts.append("<item>")
        for k, tag in (("title", "title"), ("link", "link"),
                       ("guid", "guid"), ("pubDate", "pubDate"),
                       ("description", "description")):
            if e.get(k) is not None:
                parts.append(f"<{tag}>{e[k]}</{tag}>")
        parts.append("</item>")
    parts.append("</channel></rss>")
    return "\n".join(parts).encode("utf-8")


def build_atom(entries: list[dict]) -> bytes:
    parts = [f'<?xml version="1.0"?>\n<feed xmlns="{ATOM_NS}">',
             "<title>t</title><id>f</id>"]
    for e in entries:
        parts.append("<entry>")
        if e.get("title") is not None:
            parts.append(f"<title>{e['title']}</title>")
        if e.get("link") is not None:
            parts.append(f'<link rel="alternate" href="{e["link"]}"/>')
        if e.get("self") is not None:
            parts.append(f'<link rel="self" href="{e["self"]}"/>')
        if e.get("id") is not None:
            parts.append(f"<id>{e['id']}</id>")
        if e.get("published") is not None:
            parts.append(f"<published>{e['published']}</published>")
        if e.get("summary") is not None:
            parts.append(f"<summary>{e['summary']}</summary>")
        parts.append("</entry>")
    parts.append("</feed>")
    return "\n".join(parts).encode("utf-8")
