"""Kafka/binlog wire-format decode → changelog schema (SURVEY §2.1 S1
generalized to the production source).

The engine's streaming contract is a DataFrame of change events
``(seq, url, warc_ts, op, html)`` delivered in micro-batches with
offsets tracked by the checkpoint (streaming/pipeline.py). The sandbox
satisfies it with a file source; a real deployment tails Kafka, whose
frames always arrive under the fixed columns ``key binary, value
binary, topic, partition, offset, timestamp``. This module is the
decode from that wire shape to the changelog schema — pure column
programs (from_json / unbase64 / timestamp arithmetic, zero Python in
the row path), so the SAME expression tree runs on
``spark.readStream.format("kafka")`` in production and on a static
DataFrame in tests: swapping the source changes one line, not the
pipeline.

Three envelope dialects:
- ``decode_json_changelog``: flat JSON values (the engine's native
  producer format);
- ``decode_debezium``: the Debezium CDC envelope (op codes c/u/r→
  upsert, d→delete; payload under ``after``, deleted key under
  ``before``) — the de-facto standard binlog/WAL tail;
- ``decode_wal2json``: raw Postgres logical decoding (wal2json
  format-version=2, one JSON per change; LSN → seq, I/U/D actions,
  DDL via ``pg_logical_emit_message`` frames) — the wire format the
  reference's own Postgres WAL speaks, without a Debezium hop.

Malformed frames follow the engine's record-not-drop policy: they come
back with ``decode_ok=false`` and NULL fields so the caller can route
them to quarantine (reference keeps failures as rows,
apps/etl/models.py:82-85).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# native producer value: html shipped base64 (Kafka JSON is text);
# schema-evolution frames carry op = add/rename/drop/widen_column and
# their args as a JSON string under ``ddl`` (the Debezium analogue is
# the schema-change topic interleaved with the data topic)
JSON_VALUE_SCHEMA = (
    "seq bigint, url string, warc_ts_us bigint, op string, html_b64 string,"
    " ddl string"
)

DDL_OPS = ("add_column", "rename_column", "drop_column", "widen_column")

DEBEZIUM_VALUE_SCHEMA = (
    "op string, ts_ms bigint,"
    " source struct<seq: bigint, ts_us: bigint>,"
    " before struct<url: string>,"
    " after struct<url: string, warc_ts_us: bigint, html_b64: string>"
)

CHANGELOG_COLS = ["seq", "url", "warc_ts", "op", "html"]


def _parse(value_col: str, schema: str) -> F.Column:
    return F.from_json(
        F.col(value_col).cast("string"),
        schema + ", _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )


DDL_SPEC_SCHEMA = "field string, new_name string, dtype string"


def _ddl_spec_ok(ddl: F.Column, op: F.Column) -> F.Column:
    """Column predicate: the DDL frame's JSON spec parses AND carries
    its op's required non-empty fields (mirrors what apply_ddl needs),
    so a poison DDL frame fails decode_ok and routes to quarantine
    instead of raising driver-side on every retry."""
    spec = F.from_json(ddl, DDL_SPEC_SCHEMA + ", _corrupt string",
                       {"columnNameOfCorruptRecord": "_corrupt"})

    def nz(c: F.Column) -> F.Column:
        return c.isNotNull() & (c != "")

    return (
        ddl.isNotNull()
        & spec.isNotNull()
        & spec["_corrupt"].isNull()
        & nz(spec["field"])
        & F.when(op.isin("add_column", "widen_column"), nz(spec["dtype"]))
        .when(op == "rename_column", nz(spec["new_name"]))
        .otherwise(F.lit(True))
    )


def decode_json_changelog(kafka_df: DataFrame, value_col: str = "value",
                          keep_raw: bool = False,
                          passthrough: tuple = ()) -> DataFrame:
    """Flat-JSON frames → changelog rows (+ ``decode_ok``).

    ``decode_ok`` requires more than parseable JSON: the changelog
    contract's key fields (url, seq, warc_ts) must be present and the
    op must be a known verb — a well-formed-but-empty frame must land
    in quarantine, never as a NULL-keyed row in the MERGE.

    ``keep_raw`` appends the undecoded frame bytes as ``_raw`` for
    quarantine forensics (run_stream strips ``_``-prefixed columns
    before the merge). ``passthrough`` names input columns to carry
    through unchanged (wire provenance: topic/partition/offset)."""
    v = _parse(value_col, JSON_VALUE_SCHEMA)
    out = kafka_df.withColumn("_v", v)
    # try_to_binary, not unbase64: under ANSI mode (Spark 4 default) a
    # malformed-base64 payload would throw and abort the whole
    # micro-batch job — the one-bad-frame-wedges-the-tail failure the
    # quarantine contract exists to prevent. NULL-on-malformed lets the
    # frame route to quarantine as a row instead.
    html = F.try_to_binary(F.col("_v.html_b64"), F.lit("base64"))
    is_ddl = F.col("_v.op").isin(*DDL_OPS)
    ok = (
        F.col(f"{value_col}").isNotNull()
        & F.col("_v._corrupt").isNull()
        & F.col("_v.seq").isNotNull()
        & F.when(
            is_ddl,
            # DDL frame: the spec must be valid at DECODE time — a
            # frame that parses but lacks its op's required fields
            # would otherwise pass decode_ok and then raise inside the
            # driver's apply loop on every retry, permanently wedging
            # the stream (ADVICE r3 #1). url is synthetic, payload
            # absent.
            _ddl_spec_ok(F.col("_v.ddl"), F.col("_v.op")),
        ).otherwise(
            F.col("_v.url").isNotNull()
            & F.col("_v.warc_ts_us").isNotNull()
            & F.col("_v.op").isin("upsert", "delete")
            # html_b64 present but undecodable → quarantine (absent is
            # fine: deletes carry no payload)
            & (F.col("_v.html_b64").isNull() | html.isNotNull())
        )
    )
    cols = [
        F.col("_v.seq").alias("seq"),
        F.coalesce(F.col("_v.url"), F.concat(F.lit("ddl:"), F.col("_v.seq").cast("string"))).alias("url"),
        F.coalesce(F.timestamp_micros(F.col("_v.warc_ts_us")),
                   F.timestamp_micros(F.lit(0))).alias("warc_ts"),
        F.col("_v.op").alias("op"),
        html.alias("html"),
        F.when(is_ddl, F.col("_v.ddl")).alias("ddl"),
        ok.alias("decode_ok"),
    ]
    if keep_raw:
        cols.append(F.col(value_col).alias("_raw"))
    cols.extend(F.col(c) for c in passthrough)
    return out.select(*cols)


DEBEZIUM_SCHEMA_CHANGE_SCHEMA = (
    "source struct<seq: bigint, ts_us: bigint>,"
    " databaseName string, ddl string"
)

# SQL type → engine type for Debezium DDL statements (identity for
# names that are already engine types)
_SQL_TYPES = {
    "varchar": "string", "text": "string", "char": "string",
    "string": "string",
    "int": "int", "integer": "int", "int4": "int",
    "bigint": "bigint", "int8": "bigint", "long": "bigint",
    "real": "float", "float4": "float", "float": "float",
    "double": "double", "float8": "double",
    "boolean": "boolean", "bool": "boolean",
    "timestamp": "timestamp", "date": "date", "binary": "binary",
}


def _sql_type_to_engine(t: F.Column) -> F.Column:
    """lower-cased base SQL type name (length args stripped) → engine
    type; NULL for an unknown type (fails decode_ok → quarantine)."""
    base = F.lower(F.regexp_extract(t, r"^\s*([A-Za-z0-9_]+)", 1))
    expr = F.lit(None).cast("string")
    for sql, eng in _SQL_TYPES.items():
        expr = F.when(base == sql, F.lit(eng)).otherwise(expr)
    return expr


def decode_debezium_schema_change(kafka_df: DataFrame,
                                  value_col: str = "value",
                                  keep_raw: bool = False) -> DataFrame:
    """Debezium SCHEMA-CHANGE-topic frames → in-band DDL changelog
    rows, the analogue of the JSON dialect's ``ddl`` frames — so a
    real binlog tail's schema history applies seq-ordered through the
    SAME ``merge_microbatch`` loop as data (VERDICT r3 Next #3).

    A schema-change value carries the raw ``ddl`` SQL statement plus
    the source position (reference for the envelope: Debezium's
    schema-change topic events, which pair ``ddl`` with
    ``source``/``tableChanges``). The four schema evolutions the lake
    supports are parsed column-side (one regexp program, zero Python
    per row):

    - ``ALTER TABLE t ADD COLUMN c <type>``      → add_column
    - ``ALTER TABLE t RENAME COLUMN a TO b``     → rename_column
    - ``ALTER TABLE t DROP COLUMN c``            → drop_column
    - ``ALTER TABLE t ALTER COLUMN c [SET DATA] TYPE <type>``
                                                 → widen_column

    Anything else (CREATE INDEX, multi-action ALTERs, unknown types)
    fails decode_ok and quarantines — record-not-drop, never a wedged
    stream."""
    v = _parse(value_col, DEBEZIUM_SCHEMA_CHANGE_SCHEMA)
    out = kafka_df.withColumn("_v", v)
    sql = F.regexp_replace(F.trim(F.col("_v.ddl")), r";\s*$", "")
    ident = r"[`\"]?([A-Za-z_][A-Za-z0-9_]*)[`\"]?"
    typ = r"([A-Za-z0-9_]+(?:\s*\(\s*\d+\s*\))?)"
    add_re = (r"(?i)^ALTER\s+TABLE\s+\S+\s+ADD\s+COLUMN\s+"
              + ident + r"\s+" + typ + r"\s*$")
    ren_re = (r"(?i)^ALTER\s+TABLE\s+\S+\s+RENAME\s+COLUMN\s+"
              + ident + r"\s+TO\s+" + ident + r"\s*$")
    drop_re = (r"(?i)^ALTER\s+TABLE\s+\S+\s+DROP\s+COLUMN\s+"
               + ident + r"\s*$")
    wide_re = (r"(?i)^ALTER\s+TABLE\s+\S+\s+ALTER\s+COLUMN\s+"
               + ident + r"\s+(?:SET\s+DATA\s+)?TYPE\s+" + typ + r"\s*$")
    is_add = sql.rlike(add_re)
    is_ren = sql.rlike(ren_re)
    is_drop = sql.rlike(drop_re)
    is_wide = sql.rlike(wide_re)
    op = (F.when(is_add, F.lit("add_column"))
          .when(is_ren, F.lit("rename_column"))
          .when(is_drop, F.lit("drop_column"))
          .when(is_wide, F.lit("widen_column")))
    field = (F.when(is_add, F.regexp_extract(sql, add_re, 1))
             .when(is_ren, F.regexp_extract(sql, ren_re, 1))
             .when(is_drop, F.regexp_extract(sql, drop_re, 1))
             .when(is_wide, F.regexp_extract(sql, wide_re, 1)))
    new_name = F.when(is_ren, F.regexp_extract(sql, ren_re, 2))
    dtype = (F.when(is_add,
                    _sql_type_to_engine(F.regexp_extract(sql, add_re, 2)))
             .when(is_wide,
                   _sql_type_to_engine(F.regexp_extract(sql, wide_re, 2))))
    spec = F.to_json(F.struct(field.alias("field"),
                              new_name.alias("new_name"),
                              dtype.alias("dtype")))
    ok = (
        F.col(value_col).isNotNull()
        & F.col("_v._corrupt").isNull()
        & F.col("_v.source.seq").isNotNull()
        & op.isNotNull()
        & _ddl_spec_ok(spec, op)
    )
    cols = [
        F.col("_v.source.seq").alias("seq"),
        F.concat(F.lit("ddl:"), F.col("_v.source.seq").cast("string"))
        .alias("url"),
        F.coalesce(F.timestamp_micros(F.col("_v.source.ts_us")),
                   F.timestamp_micros(F.lit(0))).alias("warc_ts"),
        op.alias("op"),
        F.lit(None).cast("binary").alias("html"),
        F.when(op.isNotNull(), spec).alias("ddl"),
        ok.alias("decode_ok"),
    ]
    if keep_raw:
        cols.append(F.col(value_col).alias("_raw"))
    return out.select(*cols)


def decode_debezium(kafka_df: DataFrame, value_col: str = "value",
                    keep_raw: bool = False,
                    schema_change_topic: str | None = None) -> DataFrame:
    """Debezium envelope → changelog rows (+ ``decode_ok``).

    op mapping: c(reate)/u(pdate)/r(ead, snapshot backfill) → upsert;
    d(elete) → delete with the key taken from ``before``. ``seq`` is
    the source's monotone position (LSN/GTID surrogate) — exactly the
    contract the MERGE's LWW tie-break expects.

    ``schema_change_topic``: frames on this topic are Debezium
    schema-change events (see ``decode_debezium_schema_change``) and
    decode to in-band ``ddl`` rows; data frames get ddl=NULL. The two
    decodes union into ONE stream so DDL applies seq-ordered against
    DML exactly as the JSON dialect's in-band frames do.
    """
    if schema_change_topic is not None:
        data = decode_debezium(
            kafka_df.filter(F.col("topic") != F.lit(schema_change_topic)),
            value_col, keep_raw,
        ).withColumn("ddl", F.lit(None).cast("string"))
        ddlf = decode_debezium_schema_change(
            kafka_df.filter(F.col("topic") == F.lit(schema_change_topic)),
            value_col, keep_raw,
        )
        return data.unionByName(ddlf.select(*data.columns))
    v = _parse(value_col, DEBEZIUM_VALUE_SCHEMA)
    out = kafka_df.withColumn("_v", v)
    is_del = F.col("_v.op") == F.lit("d")
    # NULL-on-malformed (see decode_json_changelog): ANSI unbase64 would
    # abort the micro-batch on one bad frame.
    html = F.try_to_binary(F.col("_v.after.html_b64"), F.lit("base64"))
    ok = (
        F.col(f"{value_col}").isNotNull()
        & F.col("_v._corrupt").isNull()
        & F.col("_v.op").isin("c", "u", "r", "d")
        & F.col("_v.source.seq").isNotNull()
        & F.when(is_del, F.col("_v.before.url").isNotNull()
                 & F.col("_v.source.ts_us").isNotNull())
        .otherwise(F.col("_v.after.url").isNotNull()
                   & F.col("_v.after.warc_ts_us").isNotNull()
                   & (F.col("_v.after.html_b64").isNull() | html.isNotNull()))
    )
    cols = [
        F.col("_v.source.seq").alias("seq"),
        F.when(is_del, F.col("_v.before.url"))
        .otherwise(F.col("_v.after.url"))
        .alias("url"),
        F.when(is_del, F.timestamp_micros(F.col("_v.source.ts_us")))
        .otherwise(F.timestamp_micros(F.col("_v.after.warc_ts_us")))
        .alias("warc_ts"),
        F.when(is_del, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        F.when(is_del, F.lit(None).cast("binary"))
        .otherwise(html)
        .alias("html"),
        ok.alias("decode_ok"),
    ]
    if keep_raw:
        cols.append(F.col(value_col).alias("_raw"))
    return out.select(*cols)


WAL2JSON_VALUE_SCHEMA = (
    "action string, lsn string, xid bigint, timestamp string,"
    " prefix string, content string,"
    " columns array<struct<name: string, type: string, value: string>>,"
    " identity array<struct<name: string, type: string, value: string>>"
)

_W2J_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSSx"  # include-timestamp format


def _w2j_val(arr: F.Column, name: str) -> F.Column:
    """Value of the named column in a wal2json columns/identity array
    (NULL when absent). from_json coerces non-string JSON scalars to
    their text for string targets, so numeric/bool values arrive as
    castable strings. try_element_at, not element_at: under ANSI mode
    an absent column (empty filter result) must be NULL → quarantine,
    not an exception that aborts the whole micro-batch."""
    return F.try_element_at(
        F.filter(arr, lambda c: c["name"] == F.lit(name)),
        F.lit(1))["value"]


def decode_wal2json(kafka_df: DataFrame, value_col: str = "value",
                    keep_raw: bool = True) -> DataFrame:
    """Postgres logical-decoding frames (wal2json, format-version=2 —
    one JSON document per CHANGE, the shape a Kafka relay of
    ``pg_recvlogical`` emits) → changelog rows (+ ``decode_ok``). The
    third source dialect next to the native JSON producer and
    Debezium: the reference's upstream database IS Postgres, so this
    is the wire format its WAL actually speaks.

    Mapping:
    - ``action`` I/U → upsert (payload under ``columns``), D → delete
      (key under ``identity`` — the REPLICA IDENTITY columns);
    - ``seq`` = the 64-bit LSN decoded from the ``X/Y`` hex pair —
      Postgres's own monotone position, exactly the MERGE tie-break
      contract;
    - event time: I/U take the payload's ``warc_ts_us`` column (table
      semantics, as the other dialects do); D has no payload, so the
      frame's ``timestamp`` (the commit time ``include-timestamp``
      stamps) is parsed — a delete must never carry an epoch-0 time
      or it would lose every LWW race against stale upserts;
    - B/C frames (transaction begin/commit) carry no row facts and are
      FILTERED, not quarantined — they are framing, not data; the LSN
      already orders events without them;
    - M frames with ``prefix='ddl'`` are in-band schema changes — the
      standard Postgres workaround for logical decoding's DDL
      blindness is an event trigger writing into
      ``pg_logical_emit_message``; ``content`` carries the engine's
      DDL spec JSON ``{"op": ..., "field": ..., ...}`` and decodes to
      the same in-band DDL rows as the other dialects. M frames with
      any other prefix are application messages: filtered.
    - T (truncate) and unknown actions fail ``decode_ok`` and
      quarantine loudly — record-not-drop, never a silently emptied
      table.
    """
    v = _parse(value_col, WAL2JSON_VALUE_SCHEMA)
    out = kafka_df.withColumn("_v", v).filter(
        # framing and foreign app messages carry no facts; everything
        # else flows on — the coalesce keeps NULL-predicate frames
        # (tombstones, corrupt JSON) on the quarantine path instead of
        # silently dropping them
        ~F.coalesce(
            F.col("_v._corrupt").isNull()
            & (F.col("_v.action").isin("B", "C")
               | ((F.col("_v.action") == "M")
                  & (F.coalesce(F.col("_v.prefix"), F.lit("")) != "ddl"))),
            F.lit(False))
    )
    act = F.col("_v.action")
    is_del = act == "D"
    is_ddl = (act == "M") & (F.col("_v.prefix") == "ddl")
    seq = (
        F.expr("cast(conv(split_part(_v.lsn, '/', 1), 16, 10) as bigint)")
        * F.lit(4294967296).cast("bigint")
        + F.expr("cast(conv(split_part(_v.lsn, '/', 2), 16, 10) as bigint)")
    )
    # a malformed LSN ('' / non-hex) must fail decode_ok, not become
    # seq 0: conv('',16,10) is 0, so require the hex shape first
    lsn_ok = F.col("_v.lsn").rlike(r"^[0-9A-Fa-f]+/[0-9A-Fa-f]+$")
    seq = F.when(lsn_ok, seq)
    url_iu = _w2j_val(F.col("_v.columns"), "url")
    url_d = _w2j_val(F.col("_v.identity"), "url")
    ts_us = _w2j_val(F.col("_v.columns"), "warc_ts_us").try_cast("bigint")
    del_ts = F.try_to_timestamp(F.col("_v.timestamp"), F.lit(_W2J_TS_FMT))
    html = F.try_to_binary(_w2j_val(F.col("_v.columns"), "html_b64"),
                           F.lit("base64"))
    ddl_spec = F.from_json(
        F.col("_v.content"),
        "op string, " + DDL_SPEC_SCHEMA + ", _corrupt string",
        {"columnNameOfCorruptRecord": "_corrupt"})
    ddl_op = F.when(is_ddl, ddl_spec["op"])
    ddl_json = F.to_json(F.struct(
        ddl_spec["field"].alias("field"),
        ddl_spec["new_name"].alias("new_name"),
        ddl_spec["dtype"].alias("dtype")))
    ok = (
        F.col(value_col).isNotNull()
        & F.col("_v._corrupt").isNull()
        & lsn_ok
        & F.when(is_ddl,
                 ddl_spec.isNotNull() & ddl_spec["_corrupt"].isNull()
                 & F.coalesce(ddl_op.isin(*DDL_OPS), F.lit(False))
                 & _ddl_spec_ok(ddl_json, ddl_op))
        .when(is_del, url_d.isNotNull() & del_ts.isNotNull())
        .when(act.isin("I", "U"),
              url_iu.isNotNull() & ts_us.isNotNull()
              & (_w2j_val(F.col("_v.columns"), "html_b64").isNull()
                 | html.isNotNull()))
        .otherwise(F.lit(False))  # T / unknown action → quarantine
    )
    op = (F.when(is_ddl, ddl_op)
          .when(is_del, F.lit("delete"))
          .when(act.isin("I", "U"), F.lit("upsert")))
    cols = [
        seq.alias("seq"),
        F.coalesce(
            F.when(is_ddl, F.concat(F.lit("ddl:"), seq.cast("string")))
            .when(is_del, url_d).otherwise(url_iu),
            F.concat(F.lit("bad:"), F.coalesce(seq.cast("string"),
                                               F.lit("?")))).alias("url"),
        F.coalesce(
            F.when(is_del, del_ts).otherwise(F.timestamp_micros(ts_us)),
            F.timestamp_micros(F.lit(0))).alias("warc_ts"),
        op.alias("op"),
        F.when(act.isin("I", "U"), html).alias("html"),
        F.when(is_ddl & ok, ddl_json).alias("ddl"),
        ok.alias("decode_ok"),
    ]
    if keep_raw:
        cols.append(F.col(value_col).alias("_raw"))
    return out.select(*cols)


def split_quarantine(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good changelog rows, quarantined frames). Good rows carry
    exactly the changelog schema the MERGE expects (plus the in-band
    ``ddl`` column when the dialect carries schema-change frames)."""
    cols = [c for c in CHANGELOG_COLS + ["ddl"] if c in decoded.columns]
    good = decoded.filter(F.col("decode_ok")).select(*cols)
    bad = decoded.filter(~F.coalesce(F.col("decode_ok"), F.lit(False)))
    return good, bad


# ------------------------------------------------------- source factories --
# ``run_stream(source=...)`` takes a factory ``spark -> streaming
# DataFrame`` (reference analogue: pluggable per-source extraction,
# apps/etl/extraction/sources/base/extract.py:10-86). Both factories
# below produce the SAME decoded shape (changelog cols + decode_ok) —
# production tails a broker, tests/sandbox tail a directory of
# kafka-frame-shaped parquet; the decode expression tree is shared.

KAFKA_FRAME_SCHEMA = (
    "key binary, value binary, topic string, partition int,"
    " offset bigint, timestamp timestamp"
)

_DIALECTS = {"json": decode_json_changelog, "debezium": decode_debezium,
             "wal2json": decode_wal2json}


def _decode_fn(dialect: str):
    if dialect == "debezium-avro":
        # Confluent-framed binary Debezium (sources/avro.py) — imported
        # lazily so the pure-JSON dialects stay pandas-free.
        from montandon_etl_spark.sources.avro import decode_debezium_avro
        return decode_debezium_avro
    if dialect == "debezium-proto":
        from montandon_etl_spark.sources.proto import decode_debezium_proto
        return decode_debezium_proto
    return _DIALECTS[dialect]


def _decode_kwargs(dialect: str, schema_change_topic: str | None,
                   registry: dict | None = None) -> dict:
    kw: dict = {}
    if schema_change_topic is not None:
        if dialect != "debezium":
            raise ValueError("schema_change_topic is a Debezium-dialect "
                             "concept (the JSON dialect carries DDL in-band)")
        kw["schema_change_topic"] = schema_change_topic
    if dialect in ("debezium-avro", "debezium-proto"):
        if registry is None:
            raise ValueError(f"{dialect} requires registry= (schema-registry"
                             " snapshot {id: schema/descriptor})")
        kw["registry"] = registry
    elif registry is not None:
        raise ValueError("registry is a binary-dialect concept "
                         "(debezium-avro / debezium-proto)")
    return kw


def kafka_source(bootstrap_servers: str, topic: str, dialect: str = "debezium",
                 starting_offsets: str = "earliest",
                 options: dict[str, str] | None = None,
                 keep_raw: bool = True,
                 schema_change_topic: str | None = None,
                 registry: dict | None = None):
    """Factory for a real Kafka tail (requires the spark-sql-kafka
    package on the cluster — not present in the sandbox, where
    ``kafka_frames_dir_source`` exercises the identical decode).

    ``schema_change_topic`` (Debezium dialect): subscribe ``topic`` to
    both the data and schema topics (comma-separated) and pass the
    schema topic's name here — its frames decode to in-band DDL.

    ``registry`` (debezium-avro dialect): schema-registry snapshot
    {schema_id: schema json} for Confluent-framed binary values."""
    decode = _decode_fn(dialect)
    kw = _decode_kwargs(dialect, schema_change_topic, registry)

    def factory(spark) -> DataFrame:
        r = (spark.readStream.format("kafka")
             .option("kafka.bootstrap.servers", bootstrap_servers)
             .option("subscribe", topic)
             .option("startingOffsets", starting_offsets))
        for k, v in (options or {}).items():
            r = r.option(k, v)
        return decode(r.load(), keep_raw=keep_raw, **kw)

    return factory


def kafka_frames_dir_source(frames_dir: str, dialect: str = "debezium",
                            max_files_per_trigger: int | None = 1,
                            keep_raw: bool = True,
                            schema_change_topic: str | None = None,
                            registry: dict | None = None):
    """Factory tailing a directory of parquet files in Kafka's fixed
    frame shape (KAFKA_FRAME_SCHEMA) — the sandbox/e2e-test stand-in
    for ``kafka_source``: micro-batches arrive wire-shaped and flow
    through the same decode → quarantine → MERGE path."""
    decode = _decode_fn(dialect)
    kw = _decode_kwargs(dialect, schema_change_topic, registry)

    def factory(spark) -> DataFrame:
        r = spark.readStream.schema(KAFKA_FRAME_SCHEMA)
        if max_files_per_trigger:
            r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return decode(r.parquet(frames_dir), keep_raw=keep_raw, **kw)

    return factory
