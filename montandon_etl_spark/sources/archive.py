"""Archive (zip) payload source (SURVEY.md §2.1 S8).

The reference downloads a DesInventar zip and unzips it in memory,
skipping work when the extracted file already exists
(apps/etl/extraction/sources/desinventar/extract.py:11-48). Spark
form: binary payload column (or ``spark.read.format("binaryFile")``)
→ mapInPandas unzip fan-out (archive → one row per member), stdlib
``zipfile`` over in-memory bytes — Arrow-batched, no temp files, no
Python deps. Idempotent-skip becomes the lake's committed-batch
check, not a filesystem probe.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def unzip_members(
    df: DataFrame,
    id_col: str,
    zip_col: str,
    name_filter: str | None = None,
) -> DataFrame:
    """1→N fan-out: each zip payload emits (id, member_name, content).

    ``name_filter``: optional suffix filter (e.g. ``.xml``). Corrupt
    archives emit zero rows (record-not-crash, consistent with the
    XML source)."""
    schema = f"{id_col} long, member_name string, content binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, blob in zip(pdf[id_col], pdf[zip_col]):
                if blob is None:
                    continue
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(blob)))
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if name_filter and not info.filename.endswith(name_filter):
                            continue
                        rows.append((rid, info.filename, zf.read(info)))
                except zipfile.BadZipFile:
                    continue
            yield pd.DataFrame(rows, columns=[id_col, "member_name", "content"])

    return df.select(id_col, zip_col).mapInPandas(batches, schema=schema)
