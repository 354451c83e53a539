"""Interleaved A/B for the optimization rounds (r12, r13): baseline commit
vs the current working tree, one SparkSession, ABBA alternation.

Same mechanism as tools/ab_pinned_code.py (which attributed the r10/r11
bench scares): two lakeforge package instances swapped through
``sys.modules`` around each timed execution, so both sides sample the
same session ages and neither systematically goes first.  This is the
inner measurement loop for every r12 optimization — single-session
sequential probes (tools/opt_probe.py) turned out to confound change
effects with session age at the +-30% level, exactly the r10 lesson.

Usage:
  git worktree add .optbase <baseline-commit>
  python tools/ab_opt.py [sf_dir] query...        # AB_PAIRS=5 default
  git worktree remove .optbase                    # when the round closes

Output per query: base/cur medians, ratio cur/base (<1 = optimization
wins), all raw runs.  Appends artifacts to docs/AB_OPT_R13.json
(override with $AB_OUT).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

CUR_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_ROOT = os.path.join(CUR_ROOT, ".optbase")

PAIRS = int(os.environ.get("AB_PAIRS", "5"))


def _lf_modules() -> list[str]:
    return [k for k in sys.modules if k.split(".")[0] == "lakeforge"]


class CodeSide:
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
        self.mods = {k: sys.modules.pop(k) for k in _lf_modules()}
        if self.root in sys.path:
            sys.path.remove(self.root)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        sys.exit("usage: ab_opt.py [sf_dir] query...")
    if not os.path.isdir(BASE_ROOT):
        sys.exit(
            f"baseline worktree missing: git -C {CUR_ROOT} worktree add "
            ".optbase <baseline-commit>"
        )

    cur = CodeSide("cur", CUR_ROOT)
    base = CodeSide("base", BASE_ROOT)
    cur.load()
    base.load()

    cur.activate()
    from lakeforge.session import get_spark

    spark = get_spark("lakeforge-ab-opt")
    spark.sparkContext.setLogLevel("ERROR")
    cur.deactivate()

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

    for side in (cur, base):
        for w in ("top_orders", "text_stats", "embedding_cosine_topk"):
            if w in side.queries:
                run_one(side, w)

    results = {}
    for name in names:
        a, b = [], []
        # one untimed warm execution so neither side's first measured run
        # eats the query's in-session cold cost (the r11 cold/steady A/B
        # put that at 1.3-5.5x for heavy queries)
        run_one(base, name)
        for i in range(PAIRS):
            order = (base, cur) if i % 2 == 0 else (cur, base)
            for side in order:
                dt = run_one(side, name)
                if dt is None:
                    continue
                (a if side is base else b).append(round(dt, 3))
        medb = round(statistics.median(a), 3) if a else None
        medc = round(statistics.median(b), 3) if b else None
        results[name] = {
            "base_median": medb,
            "cur_median": medc,
            "ratio_cur_over_base": round(medc / medb, 3) if a and b else None,
            "base_runs": a,
            "cur_runs": b,
        }
        print(json.dumps({name: results[name]}), flush=True)

    out = os.path.join(
        CUR_ROOT, "docs", os.environ.get("AB_OUT", "AB_OPT_R13.json")
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
        json.dump({"sf_dir": sf_dir, "pairs": PAIRS, "results": prev}, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
