"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the driver bench — ``bench.py`` is frozen for measurement. This
tool exists to (a) time a single query noop-sinked in a fresh or warm
session without suite interference, and (b) capture
``.explain("formatted")`` plans into ``plans/r06/``.

Usage:
  python bench_extra.py time <query> [<query> ...] [--n 3]
  python bench_extra.py plan <query> [<query> ...] [--suffix before]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    args = sys.argv[1:]
    mode = args.pop(0)
    n = 2
    suffix = "before"
    if "--n" in args:
        i = args.index("--n")
        n = int(args[i + 1])
        del args[i : i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from montandon_etl_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # same warmup as bench.py: JVM JIT + python UDF worker spawn
    qs["metrics_rollup"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    out: dict[str, list[float]] = {}
    for name in names:
        if mode == "plan":
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            pdir = os.path.join(REPO, "plans", "r06")
            os.makedirs(pdir, exist_ok=True)
            path = os.path.join(pdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
            continue
        walls = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = walls
        print(json.dumps({"query": name, "walls": walls,
                          "min": min(walls)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
