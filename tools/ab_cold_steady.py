"""Cold-in-session vs steady-state A/B (VERDICT r11 #1).

Round 11's bench rebuild (fresh warmed SparkSession per pass) left two
cross-machine >=2x "regressions" on code git-diff-IDENTICAL at the r10
boundary (``ivfpq_recall_at_k`` 4.4->8.7-10.3s, ``synthetic_docs_stats``
0.82->2.9s) plus three same-shape watch items.  The pinned-code A/B is
the wrong instrument there — both sides would run the same bytes.  The
hypothesis to test is the METHODOLOGY: r10's bench ran each query 3x
back-to-back inside one aged session, so its median was the query's
STEADY-STATE cost (run 1 pays the one-off in-session work — PQ codebook
training materialization, Python data-source registration, first
compilation of a 2B-aggregate plan — runs 2-3 don't, and the median
keeps the cheap pair); r11's bench samples every query exactly ONCE per
fresh session, so its median is the COLD-in-session cost, one-off work
included, every time.

Method (bench-protocol-faithful):

- S fresh SparkSessions (default 3), each warmed with bench.py's exact
  3-family warmup (`bench._WARM`), all inside ONE Python process — the
  same process/JVM lifecycle bench.py uses, so any Python-module-level
  memoization amortizes here exactly as it would there.
- In each session, each query runs 1 + K times consecutively (default
  K=3) with the bench's cache release + clearCache between runs: sample
  #1 is the cold-in-session cost (what r11 bench commits), samples
  #2..K+1 are steady-state (whose median is what r10 bench committed).
- Reported per query: median cold across sessions, median steady across
  all steady samples, the cold/steady ratio, and both raw sample lists.

Reading the result against the bench trend: if a query's cold/steady
ratio ~= its r10->r11 bench ratio (and steady ~= its r10 number), the
"regression" is the methodology pricing in real one-off session cost —
attribution done, no code change indicated (the cold number is the
honest cost of running the query once in a fresh session, which is what
a scheduled production job pays).  If cold ~= steady, the movement is
NOT cold cost — bisect.

Usage:
  python tools/ab_cold_steady.py [sf_dir] [query ...]
  (defaults: /root/testdata/sf0.1 and the VERDICT r11 suspect list)
  env: AB_SESSIONS (default 3), AB_STEADY (default 3)
Writes docs/AB_COLD_STEADY_R12.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _WARM  # noqa: E402  (the exact bench warmup set)
from lakeforge import cache  # noqa: E402
from lakeforge.session import get_spark  # noqa: E402
from lakeforge.workload import QUERIES  # noqa: E402

# VERDICT r11 Performance table + watch list, in one sweep.
DEFAULT_QUERIES = [
    "ivfpq_recall_at_k",
    "synthetic_docs_stats",
    "bootstrap_price_ci",
    "bpe_train_merges",
    "active_years_bitmap",
]

SESSIONS = int(os.environ.get("AB_SESSIONS", "3"))
STEADY = int(os.environ.get("AB_STEADY", "3"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    cold: dict[str, list[float]] = {n: [] for n in names}
    steady: dict[str, list[float]] = {n: [] for n in names}
    for s in range(SESSIONS):
        spark = get_spark("lakeforge-ab-cold")
        spark.sparkContext.setLogLevel("ERROR")
        for warm in _WARM:
            QUERIES[warm](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            cache.release_all()
            spark.catalog.clearCache()
        for name in names:
            for k in range(1 + STEADY):
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.time() - t0, 3)
                (cold if k == 0 else steady)[name].append(dt)
                cache.release_all()
                spark.catalog.clearCache()
        spark.stop()
        print(f"session {s + 1}/{SESSIONS} done", flush=True)

    results = {}
    for name in names:
        c = statistics.median(cold[name])
        st = statistics.median(steady[name])
        results[name] = {
            "cold_median": round(c, 3),
            "steady_median": round(st, 3),
            "cold_over_steady": round(c / st, 3) if st else None,
            "cold_minus_steady_sec": round(c - st, 3),
            "cold_runs": cold[name],
            "steady_runs": steady[name],
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(REPO, "docs", "AB_COLD_STEADY_R12.json")
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "sessions": SESSIONS,
                "steady_runs_per_session": STEADY,
                "results": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
