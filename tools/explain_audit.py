"""Explain-plan audit: prints the formatted physical plan for each query
and flags the properties that matter at scale:

- PushedFilters reaching the parquet scan
- ReadSchema column pruning (scan only what's projected)
- broadcast joins where a side is dim-sized
- exchange (shuffle) count — the scale-up cost driver

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeforge.session import get_spark
from lakeforge.workload import QUERIES


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        p = plan_of(fn(spark, sf_dir))
        # Count only the numbered detail headers ("(6) Exchange") — each node
        # appears twice in formatted output (tree + details).
        n_exchange = len(re.findall(r"\(\d+\) Exchange\b", p))
        n_bhj = len(re.findall(r"\(\d+\) BroadcastHashJoin", p))
        n_smj = len(re.findall(r"\(\d+\) SortMergeJoin", p))
        n_bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
        pushed_nonempty = [x for x in pushed if x.strip()]
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
        print(f"=== {name}")
        print(f"  exchanges={n_exchange} BHJ={n_bhj} SMJ={n_smj} BNLJ={n_bnlj}")
        for x in pushed_nonempty:
            print(f"  pushed: {x}")
        for s in schemas:
            cols = [c.split(":")[0] for c in s.split(",") if ":" in c]
            print(f"  scan cols: {cols}")
        if only:
            print(p)
    spark.stop()


if __name__ == "__main__":
    main()
