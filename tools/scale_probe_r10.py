"""Scale probe for the round-9 wave-7/8 ops + the vocab-persist A/B
(VERDICT r09 #5 and #6 — the probe-on-ship discipline held for waves 1-4
but waves 7/8 shipped with neither probe rows nor composition notes).

Same protocol as tools/scale_probe_r9b.py (1x/10x/100x synthetic corpora,
median of N runs, caches released between runs, alpha = log10(t100/t10));
reuses its docgen/TPC-H generators and extends the corpus with the
customer/region/events tables the wave-7/8 ops read (acctbal + mktsegment
on customer, l_tax on lineitem via a rewrite, view/purchase events).

Also times vocab_coverage_curve BOTH ways — the shipped persisted
single-scan shape vs the r8 lazy double-scan — at every size, to settle
whether the ADVICE-r8 persist that costs ~2x at sf0.1 pays off at 100x
(VERDICT r09 #6).

Appends/replaces its own section in docs/SCALE_PROBE.md.

Usage: python tools/scale_probe_r10.py [--runs N]
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakeforge import cache
from lakeforge.io import docgen_source
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES
from scale_probe_r9b import make_docs, make_tpch

DOC_HEADER = "## Round-9 wave-7/8 ops + vocab-persist A/B (r10 probe)"

OPS = [
    # (op, max scale, why-linear note)
    ("lateral_topk_customers",
     "Catalyst rewrites the correlated LATERAL LIMIT into a per-nation "
     "top-k (WindowGroupLimit pushdown): one shuffle of customer keyed "
     "by nation, per-partition heaps, 25x2-row result."),
    ("region_nation_share",
     "one fact aggregate to 25 nation cells (keyed equi-joins, AQE "
     "build sides); both share levels are windows over that bounded "
     "frame; decimal(38,0) totals never overflow (ADVICE r10 fix)."),
    ("events_position_attribution",
     "bounded interval join (shuffle by user, fan-out capped by the "
     "30-minute window); per-purchase U-shaped credit windows are keyed "
     "by purchase_id — group size = touches within 30 min, bounded."),
    ("multitouch_attribution",
     "same bounded interval join as the U-shaped variant, linear "
     "credit; purchase-keyed windows only."),
    ("order_total_reconciliation",
     "one lineitem aggregate to order grain (map-side combinable), one "
     "keyed join to headers, conformance CASE is row-local, output "
     "|years| x 4 classes."),
    ("duplicate_order_audit",
     "the twin screen is a LAG over (custkey, cents) partitions — "
     "group size = orders per customer at one price point (bounded); "
     "injected twins are row-local derivations."),
    ("basket_size_by_segment",
     "lines-per-order aggregate (map-side combine on the fact), keyed "
     "join order->customer, |segments x basket-band| output grid."),
    ("seasonal_index_by_segment",
     "orders aggregate to (segment, month) cells via one keyed join; "
     "the seasonal index is a window over the 5x12 bounded grid."),
    ("order_value_band_transitions",
     "per-customer consecutive-order LAG (customer-keyed partitions), "
     "band transitions counted into a bounded band x band matrix."),
]


def make_aux(spark, n_li: int, n_events: int, out_dir: str) -> None:
    """customer / region / events tables for the wave-7/8 ops, plus a
    lineitem rewrite adding l_tax (order_total_reconciliation reads it)."""
    n_cust = max(n_li // 40, 2)
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    spark.range(1, n_cust + 1).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id").cast("string")).alias("c_name"),
        (F.col("id") % 25).cast("int").alias("c_nationkey"),
        (((F.col("id") * 7919) % 1100000) / 100.0 - 999.99).alias("c_acctbal"),
        F.element_at(
            F.array(*[F.lit(s) for s in segs]), (F.col("id") % 5 + 1).cast("int")
        ).alias("c_mktsegment"),
    ).write.mode("overwrite").parquet(f"{out_dir}/customer.parquet")
    spark.range(0, 5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.concat(F.lit("REGION_"), F.col("id").cast("string")).alias("r_name"),
    ).write.mode("overwrite").parquet(f"{out_dir}/region.parquet")
    # nation needs n_regionkey for the region join; rewrite it with one.
    spark.range(0, 25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id").cast("string")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    ).write.mode("overwrite").parquet(f"{out_dir}/nation.parquet")
    # events: ~n/50 users, view-heavy with purchases; 2-year span.
    n_users = max(n_events // 50, 2)
    spark.range(1, n_events + 1).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users + 1).alias("user_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=((F.col("id") * 104729) % 63_072_000).cast("double"))
        ).alias("ts"),
        F.when((F.col("id") % 11) == 0, F.lit("purchase"))
        .when((F.col("id") % 3) == 0, F.lit("view"))
        .when((F.col("id") % 3) == 1, F.lit("click"))
        .otherwise(F.lit("scroll"))
        .alias("event_type"),
        (((F.col("id") * 31) % 99000) / 100.0 + 1.0).alias("value"),
        F.lit('{"src":"probe"}').alias("props"),
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def add_l_tax(spark, out_dir: str) -> None:
    li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
    if "l_tax" in li.columns:
        return
    li.withColumn(
        "l_tax", ((F.col("l_orderkey") % 9) / 100.0)
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem2.parquet")
    import shutil

    shutil.rmtree(f"{out_dir}/lineitem.parquet")
    os.rename(f"{out_dir}/lineitem2.parquet", f"{out_dir}/lineitem.parquet")


def vocab_lazy(spark, sf_dir: str):
    """The r8 pre-ADVICE shape: NO persist — top-V rank table and corpus
    total each re-derive the tokenized stream (two scans), kept here as
    the A/B control for the persisted production shape."""
    from lakeforge.workload_r8 import _VOCAB_CHECKPOINTS, _t

    d = _t(spark, sf_dir, "documents").select("text")
    words = d.select(
        F.explode(F.split(F.col("text"), " +")).alias("w")
    ).filter(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    top = vocab.orderBy(F.col("c").desc(), F.col("w")).limit(
        max(_VOCAB_CHECKPOINTS)
    )
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w"))
    ranked = top.select(
        F.row_number().over(w_rank).cast("bigint").alias("rank_v"),
        F.sum("c")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum_mass"),
    )
    total = words.agg(F.count(F.lit(1)).cast("bigint").alias("total_tokens"))
    return (
        ranked.filter(F.col("rank_v").isin(list(_VOCAB_CHECKPOINTS)))
        .crossJoin(F.broadcast(total))
        .select(
            "rank_v",
            "cum_mass",
            F.expr(
                "CAST(CAST(cum_mass AS DECIMAL(38,0)) * 1000000"
                " div total_tokens AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


def time_fn(spark, fn, sf_dir: str, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
        cache.release_all()
        spark.catalog.clearCache()
    return statistics.median(samples)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark("lakeforge-scale-probe-r10")
    spark.sparkContext.setLogLevel("ERROR")
    docgen_source.register(spark)

    doc_sizes = {"1x": 5_000, "10x": 50_000, "100x": 500_000}
    li_sizes = {"1x": 600_000, "10x": 6_000_000, "100x": 60_000_000}
    ev_sizes = {"1x": 200_000, "10x": 2_000_000, "100x": 20_000_000}
    order = ["1x", "10x", "100x"]
    results: dict[str, dict[str, float]] = {op: {} for op, _ in OPS}
    vocab_res: dict[str, dict[str, float]] = {"persisted": {}, "lazy": {}}
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label in order:
            d = os.path.join(tmp, label)
            os.makedirs(d)
            make_docs(spark, doc_sizes[label], d)
            make_tpch(spark, li_sizes[label], d)
            make_aux(spark, li_sizes[label], ev_sizes[label], d)
            add_l_tax(spark, d)
            dirs[label] = d
        for op, _ in OPS:
            for label in order:
                t = time_fn(spark, QUERIES[op], dirs[label], args.runs)
                results[op][label] = round(t, 3)
                print(f"{op:32s} {label:>4s}: {t:7.3f}s", flush=True)
        for label in order:
            tp = time_fn(
                spark, QUERIES["vocab_coverage_curve"], dirs[label], args.runs
            )
            tl = time_fn(spark, vocab_lazy, dirs[label], args.runs)
            vocab_res["persisted"][label] = round(tp, 3)
            vocab_res["lazy"][label] = round(tl, 3)
            print(
                f"vocab_coverage_curve {label}: persisted {tp:.3f}s"
                f" lazy {tl:.3f}s",
                flush=True,
            )

    lines = [
        DOC_HEADER,
        "",
        f"Documents at {doc_sizes['1x']:,}/{doc_sizes['10x']:,}/"
        f"{doc_sizes['100x']:,} docs; TPC-H-shaped lineitem at "
        f"{li_sizes['1x']:,}/{li_sizes['10x']:,}/{li_sizes['100x']:,} rows "
        "(+ customer with acctbal/mktsegment, region, nation with "
        "regionkey, l_tax on lineitem); events at "
        f"{ev_sizes['1x']:,}/{ev_sizes['10x']:,}/{ev_sizes['100x']:,} rows "
        f"(~50 events/user).  Median of {args.runs}, caches released, "
        "noop sink.",
        "",
        "| op | t(1x) s | t(10x) s | t(100x) s | alpha (10x->100x) |",
        "|---|---|---|---|---|",
    ]
    for op, _ in OPS:
        r = results[op]
        alpha = math.log10(r["100x"] / r["10x"])
        lines.append(
            f"| {op} | {r['1x']:.3f} | {r['10x']:.3f} | {r['100x']:.3f} "
            f"| {alpha:.2f} |"
        )
    lines += ["", "Why the wave-7/8 family stays ~linear by construction:"]
    lines += [f"- `{op}`: {why}" for op, why in OPS]
    lines += [
        "",
        "### vocab_coverage_curve: persisted single-scan vs lazy double-scan",
        "",
        "| shape | t(1x) s | t(10x) s | t(100x) s |",
        "|---|---|---|---|",
    ]
    for shape in ("persisted", "lazy"):
        r = vocab_res[shape]
        lines.append(
            f"| {shape} | {r['1x']:.3f} | {r['10x']:.3f} | {r['100x']:.3f} |"
        )
    ratio = vocab_res["lazy"]["100x"] / max(vocab_res["persisted"]["100x"], 1e-9)
    lines += [
        "",
        f"Lazy/persisted at 100x: **{ratio:.2f}x** — the ADVICE-r8 persist "
        "of the vocab-bounded (word, count) aggregate "
        + (
            "wins at scale (one tokenize+aggregate pass instead of two over "
            "the corpus-sized stream); the ~2x constant it costs at sf0.1 is "
            "the price of that scan economy."
            if ratio >= 1.1
            else "does NOT pay at 100x either — candidate for reverting to "
            "the lazy double-scan."
        ),
    ]

    doc_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "SCALE_PROBE.md",
    )
    with open(doc_path) as fh:
        existing = fh.read()
    if DOC_HEADER in existing:
        existing = existing[: existing.index(DOC_HEADER)].rstrip() + "\n"
    with open(doc_path, "w") as fh:
        fh.write(existing.rstrip() + "\n\n" + "\n".join(lines) + "\n")
    print(f"wrote section to {doc_path}")
    spark.stop()


if __name__ == "__main__":
    main()
