"""SparkSession factory with engine defaults.

Single place where execution knobs live so tests / bench / driver all
get the same tuned session. Defaults target local[N] smoke + bench,
but every knob is the one you'd set on a real multi-executor cluster:
AQE on (runtime re-plan + skew-join), Arrow on (vectorized pandas
UDFs), shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _infer_shuffle_partitions(master: str, cpus: int) -> int:
    """local[N] → N; "local[*]", "local[N,maxFailures]" (the
    threads,maxFailures form keeps only the thread count), non-local
    masters, and malformed strings → the cpus default. Never raises —
    a bad master string should fail in Spark with a clear error, not
    here with a ValueError about shuffle partitions."""
    if "[" in master and "]" in master:
        inner = master[master.find("[") + 1 : master.find("]")]
        threads = inner.split(",")[0].strip()
        if threads != "*":
            try:
                return int(threads)
            except ValueError:
                pass
    return cpus


def get_spark(
    app_name: str = "montandon_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the core count — on a real
    cluster you would size this to ~2-3x total executor cores; the
    engine's merge path additionally repartitions explicitly by
    ``hash(url)`` so the shuffle width there is controlled per-call.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _infer_shuffle_partitions(master, cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (Spark's legacy default) carries NO parquet min/max
        # statistics, which silently disables the lake's file-level
        # timestamp pruning (zorder range_filters); micros is the
        # modern interchange type and stats-complete
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # payload-heavy rows (binary html): split scans well below the
        # 128MB default so a single micro-batch file fans out across
        # cores instead of pinning one task (generator writes 4096-row
        # row groups to make the files splittable). At 100TB with many
        # large files you would raise this back toward 128MB.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        # AQE's 64MB advisory target coalesces post-shuffle partitions
        # so aggressively that Arrow-UDF stages (extraction) run on a
        # handful of tasks; 8MB keeps those stages as wide as the core
        # count while still merging truly tiny partitions.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(8 * 1024 * 1024))
        # local mode: shuffle spill dir under /tmp by default is fine
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
