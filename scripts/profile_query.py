"""Profile one registered query: run it noop-sinked, then dump the
Spark UI REST API's job list (id, description, duration, stage count)
so the wall can be attributed to jobs vs gaps (driver orchestration).

Usage: python scripts/profile_query.py <query> [<query>...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as usual.

Diagnostic tool only — not part of the bench contract.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from montandon_etl_spark.session import get_spark

    spark = get_spark(app_name="profile", master=f"local[{cpus}]",
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    qs["metrics_rollup"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(j0: int, t0: float, t1: float, name: str) -> None:
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            jobs = json.load(r)
        jobs = sorted([j for j in jobs if j["jobId"] >= j0],
                      key=lambda j: j["jobId"])
        tot = 0.0
        print(f"--- {name}: wall={t1 - t0:.2f}s, {len(jobs)} jobs")
        prev_end = None
        from datetime import datetime as _dt
        for j in jobs:
            st = _dt.strptime(j["submissionTime"][:-3],
                              "%Y-%m-%dT%H:%M:%S.%f")
            if prev_end is not None:
                g = (st - prev_end).total_seconds()
                if g > 0.3:
                    print(f"      >>> gap {g:.2f}s before job {j['jobId']}")
            en = _dt.strptime(j.get("completionTime",
                                    j["submissionTime"])[:-3],
                              "%Y-%m-%dT%H:%M:%S.%f")
            prev_end = en if prev_end is None or en > prev_end else prev_end
        for j in jobs:
            sub = j["submissionTime"]
            comp = j.get("completionTime", sub)
            from datetime import datetime
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            d = (datetime.strptime(comp[:-3], "%Y-%m-%dT%H:%M:%S.%f")
                 - datetime.strptime(sub[:-3], "%Y-%m-%dT%H:%M:%S.%f")
                 ).total_seconds()
            tot += d
            desc = (j.get("description") or j.get("name", ""))[:90]
            print(f"  job {j['jobId']:4d} {d:6.2f}s stages={len(j['stageIds'])} {desc}")
            if d > 0.5:
                for sid in sorted(j["stageIds"]):
                    try:
                        with urllib.request.urlopen(
                                f"{ui}/api/v1/applications/{app_id}"
                                f"/stages/{sid}") as r2:
                            sts = json.load(r2)
                    except Exception:
                        continue
                    for st in sts:
                        print(f"      stage {sid}: n={st['numTasks']} "
                              f"{st['name'][:70]} | "
                              f"{(st.get('details') or '').splitlines()[0][:90] if st.get('details') else ''}")
        print(f"  sum(job durations)={tot:.2f}s  gap={(t1 - t0) - tot:.2f}s")
        try:
            with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/sql?length=1000"
            ) as r:
                sqls = json.load(r)
        except Exception:
            return
        sqls = [s for s in sqls if any(j >= j0 for j in
                                       s.get("successJobIds", []))]
        print(f"  --- {len(sqls)} SQL executions")
        for s in sorted(sqls, key=lambda s: -s["duration"]):
            if s["duration"] < 300:
                continue
            print(f"  sql {s['id']:4d} {s['duration']/1000.0:6.2f}s "
                  f"jobs={s.get('successJobIds')} "
                  f"{(s.get('description') or '')[:70]!r} "
                  f"plan_head={(s.get('planDescription') or '')[:120]!r}")

    for name in names:
        j0 = 0
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            jl = json.load(r)
        j0 = (max((j["jobId"] for j in jl), default=-1)) + 1
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t1 = time.time()
        spark.sparkContext.setJobDescription(None)
        jobs_after(j0, t0, t1, name)
    spark.stop()


if __name__ == "__main__":
    main()
