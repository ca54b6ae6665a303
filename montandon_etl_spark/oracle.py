"""Single-threaded pure-Python/pandas replay oracle.

The trivial, obviously-correct implementation of the CDC semantics the
engine must match (SURVEY.md §5.1): apply a changelog + interleaved
DDL events with LWW(warc_ts, seq) and the reference extractor; the
engine's final table state must equal this, including byte-identical
``text`` per url. Deliberately naive — a dict keyed by url — so
correctness is auditable by eye.
"""

from __future__ import annotations

import pandas as pd

from montandon_etl_spark.functions.extract import extract_text_bytes


def replay_oracle(
    changelog: pd.DataFrame, ddl_events: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Replay changelog (+ optional DDL) sequentially; return final state.

    changelog columns: seq, url, warc_ts, op, html.
    ddl_events columns: seq, op, field, new_name, dtype (interleaved by
    seq into the same total order).

    Returns one row per live url: url, warc_ts, seq, html, text, lang
    (renamed / extended per DDL), sorted by url.
    """
    events: list[tuple[int, str, dict]] = [
        (int(r.seq), "dml", {"url": r.url, "warc_ts": r.warc_ts, "op": r.op, "html": r.html})
        for r in changelog.itertuples()
    ]
    if ddl_events is not None:
        events += [
            (int(r.seq), "ddl", {"op": r.op, "field": r.field, "new_name": r.new_name,
                                 "dtype": r.dtype})
            for r in ddl_events.itertuples()
        ]
    events.sort(key=lambda e: e[0])

    state: dict[str, dict] = {}  # url -> winning event (incl. tombstones)
    columns = ["url", "warc_ts", "seq", "html", "text", "lang"]
    renames: dict[str, str] = {}  # physical (original) name -> current name
    for seq, kind, ev in events:
        if kind == "ddl":
            if ev["op"] == "add_column" and ev["field"] not in columns:
                columns.append(ev["field"])
            elif ev["op"] == "rename_column" and ev["field"] in columns:
                old = ev["field"]
                # physical name is whatever 'old' was originally called
                phys = next((p for p, c in renames.items() if c == old), old)
                renames[phys] = ev["new_name"]
                columns[columns.index(old)] = ev["new_name"]
            continue
        url = ev["url"]
        prev = state.get(url)
        key = (ev["warc_ts"], seq)
        if prev is not None and (prev["warc_ts"], prev["seq"]) >= key:
            continue  # older writer loses (any arrival order → same winner)
        row = {"url": url, "warc_ts": ev["warc_ts"], "seq": seq, "op": ev["op"],
               "html": ev["html"]}
        if ev["op"] == "upsert":
            text, lang = extract_text_bytes(ev["html"])
            row["text"], row["lang"] = text, lang
        state[url] = row

    live = [r for r in state.values() if r["op"] == "upsert"]
    out = pd.DataFrame(live) if live else pd.DataFrame(columns=columns)
    out = out.rename(columns=renames)  # apply accumulated renames
    for c in columns:
        if c not in out.columns:
            out[c] = None  # added columns with no data yet are all-NULL
    return out[columns].sort_values("url").reset_index(drop=True)
