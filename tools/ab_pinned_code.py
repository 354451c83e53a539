"""Pinned-code interleaved A/B: r9-boundary code vs current HEAD, one session.

VERDICT r10 #1: the round-10 bench was 1.27-1.32x slower than round 9 on
the common 334-query set ON BOTH MACHINES, with the top absolute movers on
code untouched since r9 (iterative graph family, IVM sketches).  "Machine
variance" is a hypothesis; this harness produces the evidence.  Method:

- Two checkouts share ONE SparkSession (same JVM, same heap history, same
  Python workers): the current repo root and a git worktree pinned at the
  r9 boundary commit (``.r9wt``, created with ``git worktree add``).
- Both ``lakeforge`` package instances are imported once, then their
  ``sys.modules`` entries are SWAPPED around each timed execution (lazy
  ``from lakeforge.x import y`` inside query bodies resolves through
  sys.modules, so each side always sees its own code).
- Executions interleave per query in ABBA order (default 5 pairs, the
  within-pair order flipping each pair: AB BA AB ..), so both sides
  sample the SAME session ages and neither side systematically goes
  first — any aging / GC-pressure drift hits both equally, which is
  exactly what the round-10 artifact could not separate.
- Reported per query: both medians, spreads, and the ratio.  ratio ~1 =>
  the r10 regression was session/machine state; ratio >> 1 => real code
  regression, bisect.

Usage:
  python tools/ab_pinned_code.py [sf_dir] [query ...]
  (defaults: /root/testdata/sf0.1 and the VERDICT r10 mover list)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

R10_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R9_ROOT = os.path.join(R10_ROOT, ".r9wt")

DEFAULT_QUERIES = [
    "trade_bfs_reach",
    "trade_sssp_hops",
    "pagerank_trade",
    "ivm_distinct_customers",
    "orders_ivm_revenue",
    "hard_negatives",
    "events_sessions_stateful",
    "docs_kfold",
    "events_tier_mix",
]

PAIRS = int(os.environ.get("AB_PAIRS", "5"))


def _lf_modules() -> list[str]:
    return [k for k in sys.modules if k.split(".")[0] == "lakeforge"]


class CodeSide:
    """One checkout's lakeforge package, swappable in/out of sys.modules."""

    def __init__(self, label: str, root: str):
        self.label = label
        self.root = root
        self.mods: dict = {}
        self.queries: dict = {}
        self.release_all = None

    def load(self) -> None:
        assert not _lf_modules(), "another side is active"
        sys.path.insert(0, self.root)
        import importlib

        wl = importlib.import_module("lakeforge.workload")
        cache = importlib.import_module("lakeforge.cache")
        self.queries = dict(wl.QUERIES)
        self.release_all = cache.release_all
        self.deactivate()

    def activate(self) -> None:
        assert not _lf_modules(), "another side is active"
        if self.root in sys.path:
            sys.path.remove(self.root)
        sys.path.insert(0, self.root)
        sys.modules.update(self.mods)

    def deactivate(self) -> None:
        # capture any module lazily imported during the run
        self.mods = {k: sys.modules.pop(k) for k in _lf_modules()}
        if self.root in sys.path:
            sys.path.remove(self.root)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    if not os.path.isdir(R9_ROOT):
        sys.exit(
            "pinned worktree missing (removed after each A/B to keep the "
            "tree clean) — recreate with:\n"
            f"  git -C {R10_ROOT} worktree add .r9wt <boundary-commit>\n"
            "and remove it afterwards with `git worktree remove .r9wt`."
        )

    r10 = CodeSide("r10", R10_ROOT)
    r9 = CodeSide("r9", R9_ROOT)
    r10.load()
    r9.load()

    # Session comes from the CURRENT session module (configs identical at
    # both commits; verified by diffing lakeforge/session.py if in doubt).
    r10.activate()
    from lakeforge.session import get_spark

    spark = get_spark("lakeforge-ab")
    spark.sparkContext.setLogLevel("ERROR")
    r10.deactivate()

    def run_one(side: CodeSide, name: str) -> float | None:
        fn = side.queries.get(name)
        if fn is None:
            return None
        side.activate()
        try:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            side.release_all()
            spark.catalog.clearCache()
            return dt
        finally:
            side.deactivate()

    # one warmup each so neither side pays first-action costs in a
    # measured slot
    for side in (r10, r9):
        run_one(side, "top_orders" if "top_orders" in side.queries else names[0])

    results = {}
    for name in names:
        a, b = [], []
        for i in range(PAIRS):
            # alternate which side goes first within the pair (ABBA..)
            order = (r9, r10) if i % 2 == 0 else (r10, r9)
            for side in order:
                dt = run_one(side, name)
                if dt is None:
                    continue
                (a if side is r9 else b).append(round(dt, 3))
        med9 = round(statistics.median(a), 3) if a else None
        med10 = round(statistics.median(b), 3) if b else None
        results[name] = {
            "r9_median": med9,
            "r10_median": med10,
            "ratio_r10_over_r9": round(med10 / med9, 3) if a and b else None,
            "r9_runs": a,
            "r10_runs": b,
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(R10_ROOT, "docs", "AB_PINNED_R9_R10.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "pairs": PAIRS, "results": results}, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
