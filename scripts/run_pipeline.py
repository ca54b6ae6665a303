"""spark-submit entry point for the CDC pipeline (north_rule: "runs
via spark-submit --py-files on multi-executor clusters").

Usage (local sandbox):

    python scripts/make_pyfiles.py           # builds dist/montandon_etl_spark.zip
    spark-submit --py-files dist/montandon_etl_spark.zip \\
        scripts/run_pipeline.py \\
        --changelog /path/to/changelog --table /path/to/pages \\
        --checkpoint /path/to/ckpt [--mode stream|batch] \\
        [--buckets 64] [--write-mode mor|cow] [--salted] [--rebucket N]

On a real cluster, drop the local master: spark-submit's own --master
and executor flags take over; nothing in the pipeline assumes local
mode (the package ships via --py-files to every executor).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="pages-cdc pipeline runner")
    ap.add_argument("--changelog", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--mode", choices=["stream", "batch"], default="stream")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--write-mode", choices=["mor", "cow"], default="mor")
    ap.add_argument("--salted", action="store_true")
    ap.add_argument("--batches", type=int, default=1, help="batch mode: merge count")
    ap.add_argument("--ordered-source", action="store_true",
                    help="source is globally seq-ordered (WAL tail): "
                         "enables tombstone GC at compactions")
    ap.add_argument("--retention", type=int, default=None,
                    help="expire snapshots beyond the newest N after commits")
    ap.add_argument("--rebucket", type=int, default=None,
                    help="after the run, respec the table to this bucket "
                         "count (partition-spec evolution; no-op if equal)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit owns master/deploy config; only engine-level SQL
    # knobs are set here (same values as session.get_spark)
    spark = (
        SparkSession.builder.appName("pages-cdc")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(8 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from montandon_etl_spark.plans import CdcPipelinePlan

    plan = CdcPipelinePlan(
        changelog_dir=args.changelog,
        table_path=args.table,
        checkpoint_dir=args.checkpoint,
        n_buckets=args.buckets,
        write_mode=args.write_mode,
        use_salted=args.salted,
        ordered_source=args.ordered_source,
        retention_snapshots=args.retention,
    )
    if args.mode == "stream":
        q = plan.run_streaming(spark, available_now=True)
        q.awaitTermination()
        table = plan.table()
    else:
        table = plan.run_batch(spark, n_batches=args.batches)

    if args.rebucket is not None:
        table.rebucket(spark, args.rebucket)
    head = table.snapshot()
    print(
        json.dumps(
            {
                "table": args.table,
                "snapshot_id": head["snapshot_id"],
                "committed_max_batch_id": head["committed_max_batch_id"],
                "live_rows": table.read(spark).count(),
                "offsets": head["offsets"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
