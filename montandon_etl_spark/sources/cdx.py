"""CDXJ index lines — Common Crawl's per-capture URL index (public
cdx-toolkit / pywb CDXJ convention): one line per capture,

    <surt-key> <ts14> <json-block>

string-sorted so a domain's captures are contiguous (the SURT
property) and time-ordered within a URL. The JSON block carries the
capture's digest/length/original-url; readers range-scan by key
prefix.

Determinism: the key is ``functions/urls.surt``, ts14 is a fixed
``yyyyMMddHHmmss`` render of the capture timestamp, and the JSON is
assembled by EXPLICIT concat in fixed field order (not a struct
serializer), so Spark and a SQL oracle build byte-identical lines.

100-TB shape: a pure column program over the capture table — zero
shuffles to BUILD lines; producing the globally sorted index file is
then one range-partitioned sort (sortWithinPartitions after a range
exchange), the same shape every sorted-index writer pays.

Reference analogue: the reference keys extraction rows by source URL
(apps/etl/models.py); the CDX index is that key made range-scannable
at web scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montandon_etl_spark.functions.urls import surt


def cdx_lines(df: DataFrame, url_col: str, ts_col: str,
              payload_col: str) -> DataFrame:
    """(surt_key, ts14, digest, length, line): CDXJ rows for each
    capture. ``digest`` is the payload sha-256 (hex — the same digest
    family the WARC record ids use), ``length`` the payload byte
    count; ``line`` is the full sortable index line."""
    key = surt(F.col(url_col))
    ts14 = F.date_format(F.col(ts_col).cast("timestamp"),
                         "yyyyMMddHHmmss")
    digest = F.sha2(F.col(payload_col), 256)
    length = F.length(F.col(payload_col)).cast("bigint")
    line = F.concat(
        key, F.lit(" "), ts14, F.lit(" "),
        F.lit('{"digest":"sha256:'), digest,
        F.lit('","length":'), length.cast("string"),
        F.lit(',"url":"'), F.col(url_col), F.lit('"}'))
    return df.select(key.alias("surt_key"), ts14.alias("ts14"),
                     digest.alias("digest"), length.alias("length"),
                     line.alias("line"))


def parse_cdxj_line(line: str) -> dict:
    """Driver-side single-line parser (the read path is a plain
    3-way split; JSON handled by the stdlib)."""
    import json

    key, ts14, blob = line.split(" ", 2)
    return {"surt_key": key, "ts14": ts14, **json.loads(blob)}


def write_cdx(df: DataFrame, out_dir: str, boundaries: list[str],
              url_col: str = "url", ts_col: str = "ts",
              payload_col: str = "payload") -> list[dict]:
    """Write the servable CDX artifact: ``len(boundaries)+1`` sorted
    shard files (``cdx-00000`` …) split at the given SURT-key
    boundaries, plus ``cluster.idx`` — one line per shard with its
    first/last key and line count, the file a reader consults to pick
    the ONE shard a lookup needs (the Common Crawl index layout:
    sorted cdx shards + a cluster index).

    ``boundaries`` are caller-chosen split keys (capacity planning —
    derive them from stats or a sampling job); given the same
    boundaries the artifact is byte-deterministic on any partition
    layout: shard membership is a pure key comparison and each shard
    sorts its lines before writing. Shape: one hash-free range
    assignment (a scan-side comparison against a broadcast literal
    array), one shuffle to the shard grain, per-shard sort in its own
    task — the price every sorted-index writer pays, never a global
    single-task sort.

    Returns the cluster.idx rows as dicts."""
    lines = cdx_lines(df, url_col, ts_col, payload_col) \
        .select("surt_key", "ts14", "line")
    bl = sorted(boundaries)
    shard = F.lit(len(bl))
    for i in range(len(bl) - 1, -1, -1):
        shard = F.when(F.col("surt_key") < F.lit(bl[i]), F.lit(i)) \
            .otherwise(shard)

    def mux(pdf):
        import os

        import pandas as pd

        pdf = pdf.sort_values(["surt_key", "ts14", "line"],
                              kind="mergesort")
        sh = int(pdf["_sh"].iloc[0])
        final = os.path.join(out_dir, f"cdx-{sh:05d}")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(pdf["line"]) + "\n")
        os.replace(tmp, final)
        return pd.DataFrame([{
            "shard": sh, "first_key": pdf["surt_key"].iloc[0],
            "last_key": pdf["surt_key"].iloc[-1],
            "n_lines": len(pdf)}])

    os.makedirs(out_dir, exist_ok=True)
    rows = sorted(
        (r.asDict() for r in lines.withColumn("_sh", shard)
         .groupBy("_sh").applyInPandas(
             mux, "shard int, first_key string, last_key string,"
                  " n_lines bigint").collect()),
        key=lambda r: r["shard"])
    tmp = os.path.join(out_dir, "cluster.idx.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(f"{r['first_key']}\t{r['shard']}\t{r['last_key']}"
                    f"\t{r['n_lines']}\n")
    os.replace(tmp, os.path.join(out_dir, "cluster.idx"))
    return rows


def cdx_lookup(out_dir: str, key: str) -> list[dict]:
    """Point lookup against a written CDX artifact: given a SURT key
    (callers canonicalize through ``functions/urls.surt``), pick the
    one shard whose [first_key, last_key] covers it via cluster.idx
    and scan just that shard — the serving-tier read path (at scale
    the in-shard scan becomes a binary search over the sorted file;
    test shards read whole)."""
    idx = []
    with open(os.path.join(out_dir, "cluster.idx")) as f:
        for ln in f:
            first, shard, last, n = ln.rstrip("\n").split("\t")
            idx.append((first, int(shard), last, int(n)))
    hits = []
    for first, shard, last, _ in idx:
        if first <= key <= last:
            with open(os.path.join(out_dir, f"cdx-{shard:05d}")) as f:
                for ln in f:
                    if ln.startswith(key + " "):
                        hits.append(parse_cdxj_line(ln.rstrip("\n")))
    return hits
