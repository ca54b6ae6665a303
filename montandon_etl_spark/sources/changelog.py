"""Deterministic synthetic CDC changelog generator (seeded, no wall clock).

The reference ingests an external change feed incrementally with a
wall-clock date window (apps/etl/etl_tasks/gdacs.py:33-35 builds a
yesterday→today URL). Wall-clock windows are non-replayable, so the
engine's source is a *totally ordered changelog*: every event carries a
global monotonic ``seq`` and an event-time ``warc_ts``; replay is a
function of the log alone.

Event shape (FIXTURES.md §2):
    seq: long, url: string, warc_ts: timestamp, op: 'upsert'|'delete',
    html: binary (null for delete)

Generator properties, each exercising an engine behavior:
- domain drawn Zipf-ish over ``n_domains`` → a few hot domains (skew
  fixture for salted merge);
- ~30% of events repeat an earlier url → LWW is exercised;
- warc_ts is jittered out of seq order (late-data fixture); LWW merge
  must be order-insensitive;
- ~5% deletes;
- html is synthetic utf-8 HTML with nested tags, entities, multibyte
  text, and a small fraction of invalid bytes (decode-policy fixture).

Everything derives from ``numpy.random.Generator(PCG64(seed))`` —
same seed → byte-identical parquet content.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

CHANGELOG_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64(), nullable=False),
        pa.field("url", pa.string(), nullable=False),
        pa.field("warc_ts", pa.timestamp("us"), nullable=False),
        pa.field("op", pa.string(), nullable=False),
        pa.field("html", pa.binary(), nullable=True),
    ]
)

# SURVEY §1.4's full change stream: DML rows plus in-band schema-
# evolution events (op = add_column|rename_column|drop_column|
# widen_column, args JSON in ``ddl``, NULL on DML rows) — the shape a
# real WAL/binlog tail delivers, where ALTERs are positioned in the
# same total order as the row changes around them.
CHANGELOG_DDL_SCHEMA = CHANGELOG_SCHEMA.append(
    pa.field("ddl", pa.string(), nullable=True)
)

_WORDS = {
    "en": "the quick brown fox jumps over lazy dog and runs to town with great speed for it is late".split(),
    "es": "el rápido zorro marrón salta sobre el perro y corre a la ciudad con una gran prisa por que es tarde".split(),
    "fr": "le renard brun rapide saute sur le chien et court à la ville avec une grande hâte car il est en retard".split(),
    "und": "zzyx qwfp vbnm kjhg trew asdf poiu lkjh mnbv cxza".split(),
}
_LANGS = list(_WORDS)
_BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _zipf_weights(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1), s)
    return w / w.sum()


def _make_html(rng: np.random.Generator, lang: str, url: str, page_scale: int = 1) -> bytes:
    """One synthetic page: nested tags, entities, a script block, and
    (2% of pages) trailing invalid bytes. ``page_scale`` multiplies the
    paragraph count (1 → ~0.2-2 KB pages; 8 → ~2-15 KB, closer to real
    web pages)."""
    words = _WORDS[lang]
    n_paras = int(rng.integers(1, 5)) * page_scale
    paras = []
    for _ in range(n_paras):
        n = int(rng.integers(8, 40))
        toks = [words[int(i)] for i in rng.integers(0, len(words), n)]
        paras.append("<p>" + " ".join(toks) + "</p>")
    title = " ".join(words[int(i)] for i in rng.integers(0, len(words), 3))
    body = "\n".join(paras)
    doc = (
        f"<!DOCTYPE html><html><head><title>{title}</title>"
        f"<script>var x = 1 &amp;&amp; 2;</script>"
        f"<style>p {{ color: red }}</style></head>"
        f"<!-- crawl of {url} -->"
        f"<body><h1>{title} &amp; more&nbsp;news</h1><div>{body}</div>"
        f"<table><tr><td>k&lt;1&gt;</td><td>v</td></tr></table>"
        f"</body></html>"
    )
    raw = doc.encode("utf-8")
    if rng.random() < 0.02:
        raw += bytes([0xFF, 0xFE, int(rng.integers(0x80, 0xC0))])
    return raw


def gen_changelog(
    n_events: int,
    n_urls: int,
    seed: int = 42,
    n_domains: int = 1000,
    zipf_s: float = 1.2,
    delete_frac: float = 0.05,
    page_scale: int = 1,
) -> pd.DataFrame:
    """Generate a deterministic changelog as a pandas DataFrame."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    n_domains = min(n_domains, max(1, n_urls // 2))

    # url keyspace: domain zipf-hot, path uniform
    dom_w = _zipf_weights(n_domains, zipf_s)
    url_domain = rng.choice(n_domains, size=n_urls, p=dom_w)
    urls = np.array(
        [f"https://d{d:04d}.example.org/p/{i:08d}" for i, d in enumerate(url_domain)]
    )
    # page language keyed by domain (deterministic)
    dom_lang = rng.choice(len(_LANGS), size=n_domains, p=[0.55, 0.2, 0.15, 0.1])

    # event → url: first n_urls events introduce each url once, the rest
    # are repeat-updates weighted toward hot domains (skew on updates too)
    upd_idx = rng.choice(n_urls, size=max(0, n_events - n_urls), p=None)
    event_url_idx = np.concatenate([np.arange(n_urls), upd_idx])[:n_events]
    rng.shuffle(event_url_idx[n_urls:])  # keep first-touch order for urls

    seq = np.arange(n_events, dtype=np.int64)
    # event time: seq-proportional with ±120 s jitter → out-of-order arrivals
    jitter = rng.integers(-120_000_000, 120_000_000, size=n_events)
    ts_us = _BASE_TS_US + seq * 1_000_000 + jitter

    is_delete = rng.random(n_events) < delete_frac
    is_delete[:n_urls] = False  # first touch of a url is always an upsert

    rows = []
    for i in range(n_events):
        u_idx = int(event_url_idx[i])
        url = urls[u_idx]
        if is_delete[i]:
            html = None
        else:
            lang = _LANGS[int(dom_lang[url_domain[u_idx]])]
            html = _make_html(rng, lang, url, page_scale)
        rows.append((int(seq[i]), url, ts_us[i], "delete" if is_delete[i] else "upsert", html))

    df = pd.DataFrame(rows, columns=["seq", "url", "warc_ts", "op", "html"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")
    return df


def gen_ddl_events(start_seq: int) -> pd.DataFrame:
    """Schema-evolution events mirroring the reference's migration
    history (add columns: apps/etl/migrations/0002,0003,0006,0007,0008;
    rename: 0005) — one ADD and one RENAME, interleaved by seq."""
    return pd.DataFrame(
        [
            (start_seq, "add_column", "title", None, "string"),
            (start_seq + 1, "rename_column", "lang", "language", None),
        ],
        columns=["seq", "op", "field", "new_name", "dtype"],
    )


def embed_ddl_events(log: pd.DataFrame, ddl_events: pd.DataFrame) -> pd.DataFrame:
    """Interleave side-channel DDL events into the changelog as in-band
    rows (SURVEY §1.4 literally): each DDL becomes a row at its seq with
    op = the DDL verb and the args as JSON in a ``ddl`` column; DML rows
    get ddl = NULL. Output is seq-sorted and carries CHANGELOG_DDL_SCHEMA.
    """
    import json

    dml = log.copy()
    dml["ddl"] = None
    rows = []
    for r in ddl_events.itertuples():
        spec = {"field": r.field, "new_name": r.new_name, "dtype": r.dtype}
        rows.append((int(r.seq), f"ddl:{r.field}",
                     pd.Timestamp(_BASE_TS_US, unit="us"), r.op, None,
                     json.dumps({k: v for k, v in spec.items() if v is not None})))
    ddl_df = pd.DataFrame(rows, columns=["seq", "url", "warc_ts", "op", "html", "ddl"])
    out = pd.concat([dml, ddl_df], ignore_index=True)
    return out.sort_values("seq", kind="stable").reset_index(drop=True)


def write_changelog(df: pd.DataFrame, out_dir: str, n_chunks: int = 8) -> list[str]:
    """Write the changelog as ``n_chunks`` parquet files in seq order —
    chunk boundaries are the micro-batch boundaries streaming tests
    replay file-by-file."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    schema = CHANGELOG_DDL_SCHEMA if "ddl" in df.columns else CHANGELOG_SCHEMA
    bounds = np.linspace(0, len(df), n_chunks + 1, dtype=int)
    for k in range(n_chunks):
        part = df.iloc[bounds[k] : bounds[k + 1]]
        if len(part) == 0:
            continue
        table = pa.Table.from_pandas(part, schema=schema, preserve_index=False)
        path = os.path.join(out_dir, f"chunk-{k:05d}.parquet")
        # small row groups so Spark can split one chunk file across
        # many tasks (a single-row-group file caps scan parallelism at 1)
        pq.write_table(table, path, row_group_size=4096)
        paths.append(path)
    return paths
