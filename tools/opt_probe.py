"""Per-query optimization probe: steady-state timing + plan capture.

Usage:
    python tools/opt_probe.py [--runs N] [--sf DIR] [--explain SUFFIX] name...

For each named registry query, in ONE warmed session (same _WARM set as
bench.py so JVM/Arrow/Python-worker spin-up is not billed to the first
query), rebuilds the DataFrame and forces it with the noop sink N times
(default 3), releasing tracked caches between runs exactly as bench.py
does.  Reports every sample and the median — the steady-state cost that
guide §1 says to iterate on (bench.py's pass-separated fresh-session
medians remain the committed artifact; this tool is the inner loop).

With --explain SUFFIX also writes ``plans/r13/<name>_<SUFFIX>.txt``
containing the query's ``explain('formatted')`` output (the judge-facing
before/after plan evidence).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeforge import cache
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES

_WARM = ("top_orders", "text_stats", "embedding_cosine_topk")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, metavar="SUFFIX",
                    help="write plans/r13/<name>_<SUFFIX>.txt")
    args = ap.parse_args()

    names = args.names
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("lakeforge-opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for w in _WARM:
        QUERIES[w](spark, args.sf).write.format("noop").mode("overwrite").save()
        cache.release_all()
        spark.catalog.clearCache()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    import statistics
    for name in names:
        if args.explain:
            os.makedirs(plans_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{args.explain}.txt"), "w") as f:
                f.write(txt)
            cache.release_all()
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"opt_probe:{name}")
            t0 = time.time()
            QUERIES[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            cache.release_all()
            spark.catalog.clearCache()
        med = statistics.median(samples)
        print(f"{name}: median {med:.3f}s  runs {[round(s, 3) for s in samples]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
