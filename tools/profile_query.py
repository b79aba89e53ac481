"""Per-query profiling harness for optimization work: fresh tuned
session + the bench's warmup, then for each named query run the noop
sink ``--passes`` times (default 2) and report wall seconds (each pass
+ min), the Spark JOB COUNT the execution added, and optionally dump
``.explain("formatted")`` to ``plans/r16/<name>_<tag>.txt``.

Usage:
    python tools/profile_query.py q_foo q_bar
    python tools/profile_query.py --passes 1 --explain before q_foo
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_query.py ...

The measurement methodology matches bench.py (same warmup, same noop
sink, same clearCache/gc between queries) so numbers are comparable
to the bench's tier-2 single-pass sweep and to isolated_sec.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    os.environ.setdefault("PYTHONWARNINGS", "ignore::FutureWarning")
    from lab5_lakehouse_etl_spark import queries as Q
    from lab5_lakehouse_etl_spark.plans import job_count
    from lab5_lakehouse_etl_spark.session import DEFAULT_SF_DIR, build_session

    import bench

    args = [a for a in sys.argv[1:]]
    passes = 2
    explain_tag = None
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    if "--explain" in args:
        i = args.index("--explain")
        explain_tag = args[i + 1]
        del args[i : i + 2]
    names = [a for a in args if a.startswith("q_")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)

    Q.load_all()
    spark = build_session("lab5-profile")
    spark.sparkContext.setLogLevel("ERROR")
    bench.warmup(spark, sf_dir)

    out: dict[str, dict] = {}
    for name in names:
        fn = Q.QUERIES[name]
        walls = []
        jobs = []
        for p in range(max(1, passes)):
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            j0 = job_count(spark)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            bench.force(df)
            walls.append(round(time.perf_counter() - t0, 3))
            jobs.append(job_count(spark) - j0)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            gc.collect()
        if explain_tag:
            from lab5_lakehouse_etl_spark.plans import explain_str

            os.makedirs(os.path.join(REPO, "plans", "r16"), exist_ok=True)
            df = fn(spark, sf_dir)
            plan = explain_str(df)
            with open(
                os.path.join(
                    REPO, "plans", "r16", f"{name}_{explain_tag}.txt"
                ),
                "w",
            ) as fh:
                fh.write(plan)
        out[name] = {"walls": walls, "min": min(walls), "jobs": jobs}
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTAL_MIN", round(sum(v["min"] for v in out.values()), 3))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
