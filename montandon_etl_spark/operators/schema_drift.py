"""Schema-drift detection over semi-structured CDC payloads.

A long-lived changelog's JSON payloads evolve ahead of the declared
table schema: producers add keys, retype fields (int → quoted
string), nest structures. The in-band DDL path (streaming/pipeline)
handles *announced* evolution; this operator detects the
*unannounced* kind so an operator can emit the DDL — the step between
"frames started carrying `score`" and `add_column` (reference
analogue: the per-hazard payload sniffing in apps/etl/transform.py's
loose dict access, which silently tolerates drift instead of
surfacing it).

``schema_drift_report`` profiles every key observed across a payload
column: occurrence/null counts, shape votes per value (the portable
string-shape lattice below — identical in any engine that can regex
a string), an elected type, and a status against the declared schema
(``ok`` / ``drift`` / ``new`` / ``missing`` / ``payload`` rows for
corrupt or empty payloads). The whole program is one JVM-side column
pipeline: ``from_json`` to ``map<string,string>`` (Spark renders
nested values as compact JSON text — the contract the votes run on),
``explode_outer``, one hash aggregation keyed by the (few) distinct
keys, then a broadcast-size full join against the declared-schema
literals. No Python in the row path; one shuffle whose cardinality is
the key vocabulary, not the corpus.

Shape lattice (string-shape votes, engine-portable):
  boolean   value ∈ {true, false}
  bigint    ^-?[0-9]+$
  double    ^-?[0-9]+\\.[0-9]+$   (bigint promotes into double)
  object    starts with '{'     array   starts with '['
  string    anything else
Election: all-bool → boolean; all-int → bigint; all int/dec →
double; all-object / all-array → object/array; mixed → string
(the widest type every observed value round-trips through).

Known limitation, by construction: the map view UNQUOTES scalar
strings, so a producer retyping ``5`` as ``"5"`` is invisible (the
values cast loss-free, so the table is unaffected); retyping to a
non-numeral string IS caught. Declared keys ride the aggregation as
zero-weight seed rows, so the whole report is ONE exchange — no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_RE = "^-?[0-9]+$"
_DEC_RE = "^-?[0-9]+\\.[0-9]+$"

REPORT_COLS = ["key", "n_obs", "n_null", "n_bool", "n_int", "n_dec",
               "n_obj", "n_arr", "n_str", "inferred", "declared", "status"]


def schema_drift_report(df: DataFrame, json_col: str,
                        declared: dict[str, str]) -> DataFrame:
    """One row per observed-or-declared key. ``declared`` maps key →
    elected-type name it should infer as (same vocabulary as the
    lattice). Corrupt payloads (unparseable JSON) aggregate under the
    reserved key ``_corrupt``; empty objects under ``_empty``."""
    spark = df.sparkSession
    m = F.from_json(F.col(json_col), "map<string,string>")
    kv = df.select(m.alias("m")).select(
        F.explode_outer("m").alias("k", "val"), "m")
    key = F.coalesce(
        F.col("k"),
        F.when(F.col("m").isNull(), F.lit("_corrupt"))
        .otherwise(F.lit("_empty")))
    kv = kv.select(key.alias("key"), F.col("val"),
                   F.lit(1).alias("w"),
                   F.lit(None).cast("string").alias("decl"))

    decl_rows = [(k, None, 0, t) for k, t in sorted(declared.items())]
    if decl_rows:
        seeds = spark.createDataFrame(
            decl_rows, "key string, val string, w int, decl string")
        kv = kv.unionByName(seeds)

    v = F.col("val")
    live = F.col("w") == 1
    is_bool = v.isin("true", "false")
    is_int = v.rlike(_INT_RE)
    is_dec = v.rlike(_DEC_RE)
    is_obj = v.startswith("{")
    is_arr = v.startswith("[")

    def cnt(cond) -> F.Column:
        return F.count_if(live & v.isNotNull() & cond)

    agg = kv.groupBy("key").agg(
        F.sum("w").cast("bigint").alias("n_obs"),
        F.count_if(live & v.isNull()).alias("n_null"),
        cnt(is_bool).alias("n_bool"),
        cnt(is_int).alias("n_int"),
        cnt(~is_int & is_dec).alias("n_dec"),
        cnt(is_obj).alias("n_obj"),
        cnt(is_arr).alias("n_arr"),
        cnt(~is_bool & ~is_int & ~is_dec & ~is_obj & ~is_arr).alias("n_str"),
        F.max("decl").alias("declared"),
    )
    nn = F.col("n_obs") - F.col("n_null")
    inferred = (
        F.when(nn == 0, "null")
        .when(F.col("n_bool") == nn, "boolean")
        .when(F.col("n_int") == nn, "bigint")
        .when(F.col("n_int") + F.col("n_dec") == nn, "double")
        .when(F.col("n_obj") == nn, "object")
        .when(F.col("n_arr") == nn, "array")
        .otherwise("string"))
    status = (
        F.when(F.col("key").isin("_corrupt", "_empty"), "payload")
        .when(F.col("n_obs") == 0, "missing")
        .when(F.col("declared").isNull(), "new")
        .when(F.col("declared") == F.col("inferred"), "ok")
        .otherwise("drift"))
    return (agg.withColumn("inferred", inferred)
            .withColumn("status", status)
            .withColumn("declared", F.coalesce("declared", F.lit("")))
            .select(*REPORT_COLS))


def drift_ddl_frames(report: DataFrame) -> DataFrame:
    """Turn a drift report into the engine's own DDL frame vocabulary
    (sources/kafka.py DDL_OPS): ``new`` scalar keys become
    ``add_column`` proposals with the elected engine type; ``drift``
    of bigint→double becomes ``widen_column``; everything else —
    including object/array drift, which has no loss-free scalar
    widening — is left for a human (op = ``review``). Emitting
    proposals, not applying them: schema changes are an operator
    decision, the detector just writes the frame they'd approve."""
    t = {"boolean": "boolean", "bigint": "bigint", "double": "double",
         "string": "string"}
    eng = F.col("inferred")
    scalar = eng.isin(*t)
    op = (
        F.when((F.col("status") == "new") & scalar, "add_column")
        .when((F.col("status") == "drift") & (F.col("declared") == "bigint")
              & (eng == "double"), "widen_column")
        .when(F.col("status").isin("ok", "missing", "payload"), None)
        .otherwise("review"))
    return (report.withColumn("op", op).where(F.col("op").isNotNull())
            .select(
                "key", "op", "inferred", "declared",
                F.when(F.col("op") != "review",
                       F.to_json(F.struct(
                           F.col("key").alias("field"),
                           F.col("inferred").alias("dtype"))))
                .alias("ddl")))
