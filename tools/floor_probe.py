"""Decompose the sub-second floor (VERDICT r12 #7): where do ~0.4-0.6s
per small query go in bench conditions?

For each named query, inside ONE warmed session (same _WARM trio as
bench.py, so JVM/Arrow/Python-worker spin-up is not billed):

- t_build : Python DataFrame construction (py4j round-trips per
            expression — driver-side, before Spark sees a plan)
- t_plan  : analysis + optimization + physical planning
            (``queryExecution().executedPlan()`` forced; AQE re-planning
            happens later, inside execution)
- t_exec1 : first noop execution of a freshly rebuilt frame (codegen
            compile for this plan + job scheduling + compute) — this is
            what the bench's session-cold sample mostly sees
- t_exec2 : noop execution of ANOTHER rebuild (steady: codegen cache hit)
- n_jobs  : Spark jobs submitted by exec1 (scheduler round-trips)

Usage: python tools/floor_probe.py [--sf DIR] name...
Writes/updates docs/FLOOR_PROBE_R13.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeforge import cache
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES

_WARM = ("top_orders", "text_stats", "embedding_cosine_topk")


def _n_jobs(spark) -> int:
    """Total jobs submitted so far (DAGScheduler's counter)."""
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("lakeforge-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for w in _WARM:
        QUERIES[w](spark, args.sf).write.format("noop").mode("overwrite").save()
        cache.release_all()
        spark.catalog.clearCache()

    results = {}
    for name in args.names:
        t0 = time.time()
        df = QUERIES[name](spark, args.sf)
        t_build = time.time() - t0

        t0 = time.time()
        df._jdf.queryExecution().executedPlan()  # noqa: SLF001
        t_plan = time.time() - t0
        cache.release_all()
        spark.catalog.clearCache()

        j0 = _n_jobs(spark)
        t0 = time.time()
        QUERIES[name](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        t_exec1 = time.time() - t0
        n_jobs = _n_jobs(spark) - j0
        cache.release_all()
        spark.catalog.clearCache()

        t0 = time.time()
        QUERIES[name](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        t_exec2 = time.time() - t0
        cache.release_all()
        spark.catalog.clearCache()

        results[name] = {
            "t_build": round(t_build, 3),
            "t_plan": round(t_plan, 3),
            "t_exec_first": round(t_exec1, 3),
            "t_exec_steady": round(t_exec2, 3),
            "n_jobs_first": n_jobs,
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "FLOOR_PROBE_R13.json",
    )
    prev = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                prev = json.load(f).get("results", {})
        except Exception:
            prev = {}
    prev.update(results)
    with open(out, "w") as f:
        json.dump({"sf_dir": args.sf, "results": prev}, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
