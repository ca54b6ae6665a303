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
