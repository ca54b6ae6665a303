"""XML document source (SURVEY.md §2.1 S9).

The reference iterates XML row elements with XPath over DesInventar
exports (``//fichas/TR`` — transform/sources/desinventar.py:26-27,
100-107) and renames 37 fields to canonical names (dict-driven map,
desinventar.py:52-95). Spark 4's native ``from_xml`` needs the
spark-xml path for row tags; this engine ships a dependency-free
equivalent: stdlib ``ElementTree`` inside ``mapInPandas`` — Arrow
batches in/out, one task per partition, 1→N row fan-out.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def xml_records(
    df: DataFrame,
    id_col: str,
    xml_col: str,
    row_tag: str,
    field_map: dict[str, str],
) -> DataFrame:
    """Parse each document's XML payload, emit one output row per
    ``<row_tag>`` element, projecting child-element text through
    ``field_map`` ({xml_tag: output_name} — the reference's
    rename-projection P3). Malformed XML yields zero rows for that
    document rather than failing the task (record-not-crash policy).
    """
    out_names = list(field_map.values())
    schema = f"{id_col} long, " + ", ".join(f"{n} string" for n in out_names)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, xml_text in zip(pdf[id_col], pdf[xml_col]):
                if xml_text is None:
                    continue
                try:
                    root = ET.fromstring(xml_text)
                except ET.ParseError:
                    continue
                for el in root.iter(row_tag):
                    rows.append(
                        (rid, *[
                            (el.findtext(tag) if el.findtext(tag) is not None else None)
                            for tag in field_map
                        ])
                    )
            yield pd.DataFrame(rows, columns=[id_col] + out_names)

    return df.select(id_col, xml_col).mapInPandas(batches, schema=schema)
