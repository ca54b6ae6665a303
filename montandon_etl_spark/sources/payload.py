"""Payload-format dispatch + schema validation (SURVEY.md §2.1 S2,
§2.2 F1-F3, §2.3 P6/P7).

The reference GETs payloads of several content types, maps content-type
→ format (base/extract.py:14-21), validates JSON documents with
pydantic (validators/*.py) keeping failures as rows with reasons
(models.py:82-85), and fans one document out to N derived items
(transform/sources/glide.py:27-42). Spark-first equivalents:

- format dispatch = a CASE expression over the format tag;
- pydantic validation = ``from_json`` with an explicit schema in
  PERMISSIVE mode + explicit validity columns (failures recorded, not
  dropped);
- doc → N items = ``explode`` over a parsed array (JVM-side UDTF
  shape — no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_TYPE_FORMAT = {
    "application/json": "json",
    "text/html": "html",
    "application/xml": "xml",
    "text/csv": "csv",
}


def format_tag(content_type_col: str) -> F.Column:
    """content-type → format tag with 'txt' default
    (reference _get_file_extension, base/extract.py:14-21)."""
    tag = F.lit("txt")
    for ct, fmt in reversed(CONTENT_TYPE_FORMAT.items()):
        tag = F.when(F.col(content_type_col) == ct, F.lit(fmt)).otherwise(tag)
    return tag


def validate_json_payload(
    df: DataFrame, payload_col: str, schema_ddl: str
) -> DataFrame:
    """Schema-on-read validation: parse ``payload_col`` against an
    explicit schema; rows that fail stay in the output with
    ``payload_valid=false`` and the raw payload preserved (the
    reference records failures instead of dropping them,
    apps/etl/models.py:82-85 + extraction validate dispatch
    extract.py:180-186).

    Validity detection: PERMISSIVE-mode from_json returns a
    struct-of-NULLs (NOT a NULL struct) for unparseable input, so
    ``parsed.isNotNull()`` would mark garbage as valid. The reliable
    JVM-side signal is the corrupt-record column: a field appended to
    the parse schema that Spark fills with the raw malformed string
    exactly when the JSON failed to parse. ``payload_valid`` is
    therefore ``corrupt IS NULL`` (NULL input stays NULL — matching
    SQL ``json_valid(NULL)``). ``allowSingleQuotes`` is disabled so
    Spark's notion of "valid JSON" agrees with strict parsers.
    """
    parsed = F.from_json(
        F.col(payload_col),
        schema_ddl + ", _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt", "allowSingleQuotes": "false"},
    )
    return (
        df.withColumn("_p", parsed)
        .withColumn(
            "payload_valid",
            F.when(F.col(payload_col).isNull(), F.lit(None).cast("boolean"))
            .otherwise(F.col("_p._corrupt").isNull()),
        )
        .withColumn("parsed", F.col("_p").dropFields("_corrupt"))
        .drop("_p")
    )


def explode_items(
    df: DataFrame, payload_col: str, array_schema_ddl: str, id_col: str
) -> DataFrame:
    """Doc → N derived items (reference GlideTransformer.make_items,
    transform/sources/glide.py:27-42): parse an array payload and
    posexplode it — 1→N entirely in the JVM, order recorded as
    ``item_idx`` so replay is deterministic."""
    arr = F.from_json(F.col(payload_col), array_schema_ddl)
    return df.select(
        F.col(id_col),
        F.posexplode_outer(arr).alias("item_idx", "item"),
    )


def split_sentences(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """1→N text fan-out: sentence-ish segmentation with positions —
    the training-data-pipeline shape of P6 (document → derived items).
    Pure built-ins: split + posexplode."""
    sents = F.split(F.col(text_col), r"\.\s+")
    return (
        df.select(F.col(id_col), F.posexplode(sents).alias("sent_idx", "sentence"))
        .filter(F.length(F.trim(F.col("sentence"))) > 0)
    )
