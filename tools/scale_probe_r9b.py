"""Scale probe for the round-9 wave-3/4 ops (probed the round they ship).

Same protocol as tools/scale_probe.py (1x/10x/100x synthetic corpora,
median of N runs, caches released between runs, alpha = log10(t100/t10))
but runs ONLY the new section and appends/replaces it in
docs/SCALE_PROBE.md — earlier sections keep their quiet-machine numbers.

Corpora: documents via the lakeforge_docgen source (5k/50k/500k docs);
TPC-H-shaped lineitem/orders/part/supplier/nation via spark.range at
600k/6M/60M lineitem rows (parts = li/30, suppliers = li/600, customers
= li/40, orders = li/4), now including l_discount / o_totalprice /
p_name / p_brand / p_retailprice / s_nationkey so the wave-3/4 join and
money ops run; embeddings with a 10-class label at 2k/20k/200k vectors.

Usage: python tools/scale_probe_r9b.py [--runs N] [--base ROWS]
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

from pyspark.sql import functions as F

from lakeforge import cache
from lakeforge.io import docgen_source
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES

DOC_HEADER = "## Round-9 wave-3/4 ops (probed the round they ship)"

OPS = [
    ("doc_mean_token_rarity", "100x"),        # token -> vocab equi-join
    ("token_branching_factor", "100x"),       # distinct bigram successors
    ("hapax_share_by_source", "100x"),        # (source, word) aggregate
    ("lsh_bucket_skew_audit", "100x"),        # minhash signatures + banding
    ("dedup_survivor_quality_shift", "100x"), # row-local TTR + fp window
    ("part_profit_trend", "100x"),            # 5-way join tree
    ("share_of_wallet_concentration", "100x"),# two keyed lineitem aggs
    ("customer_decile_migration", "100x"),    # blocked exact ntile(10)
    ("ship_lag_percentiles", "100x"),         # bounded-domain percentile
    # r10 rebuild (VERDICT r09 #4): 60-bit/4x15-bit bands (32,768 bucket
    # values per band, 256x fewer random collisions than the r9 8-bit
    # slices) + a deterministic per-bucket cap of 128 doc_ids, bounding
    # candidate volume to O(n * bands * cap) — the 10x cap is GONE.
    ("simhash_hamming_histogram", "100x"),
]

WHY = [
    "- `doc_mean_token_rarity`: the exploded token frame is NOT "
    "persisted (caching it would spill ~the corpus); vocab aggregate "
    "and per-doc join each re-derive it from the columnar scan, and "
    "the join's build side is vocab-sized with a broadcast 1-row total.",
    "- `token_branching_factor`: consecutive pairs are row-local; pairs "
    "reduce to DISTINCT (w1, w2) — vocab-bounded-ish — before the "
    "successor count, so the heavy exchange carries bigram TYPES, not "
    "occurrences.",
    "- `hapax_share_by_source`: one (source, word) partial aggregate "
    "(vocab-bounded), one per-source roll-up.",
    "- `lsh_bucket_skew_audit`: the signature groupBy is the only "
    "corpus-sized exchange (k minima per doc); banding and the bucket "
    "histogram are |docs x bands| and below.",
    "- `dedup_survivor_quality_shift`: TTR is row-local "
    "(size(array_distinct)); the fingerprint window shuffles only (fp, "
    "source, ttr) and groups are multiplicity-sized.",
    "- `part_profit_trend`: the p_name filter prunes part before any "
    "shuffle; all joins keyed equi-joins, AQE sizes the build sides; "
    "the final aggregate is nation x year bounded.",
    "- `share_of_wallet_concentration`: (cust, supp) cells then "
    "per-customer max/sum — both keyed partial aggregates; the band "
    "histogram is 11 rows.",
    "- `customer_decile_migration`: the blocked ntile decomposition — "
    "ranking windows run per (yr, spend-block) partition with a bounded "
    "block-summary broadcast; no global sort at any size.",
    "- `ship_lag_percentiles`: after the keyed join, the percentile is "
    "ONE map-side-combinable (priority, lag-day) histogram — windows run "
    "over the calendar-bounded histogram, never over fact rows.",
    "- `simhash_hamming_histogram`: rebuilt in r10 — 60-bit "
    "fingerprint, 4 bands x 15 bits (the r9 saturation came from 8-bit "
    "band WIDTH: a 256-value slice universe; 32,768-value slices cut "
    "random collisions 256x) plus a deterministic per-(band,bh) cap of "
    "128 doc_ids, so candidate volume is <= n * bands * C(cap,2)/cap — "
    "provably linear at any corpus size.  The cap binds only on dup "
    "floods (lsh_bucket_skew_audit's territory); at test SFs no bucket "
    "reaches it, so the histogram there is exact.",
]


def make_docs(spark, rows: int, out_dir: str) -> None:
    (
        spark.read.format("lakeforge_docgen")
        .option("rows", rows).option("numPartitions", 32).load()
        .select(
            "doc_id", "text", F.lit("en").alias("lang"), "source",
            F.octet_length("text").cast("long").alias("n_chars"),
        )
        .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    )


def make_tpch(spark, n_li: int, out_dir: str) -> None:
    n_part = max(n_li // 30, 5)
    n_supp = max(n_li // 600, 2)
    n_ord = max(n_li // 4, 2)
    n_cust = max(n_li // 40, 2)
    spark.range(1, n_li + 1).select(
        (F.col("id") % n_ord + 1).alias("l_orderkey"),
        (F.col("id") % n_part + 1).alias("l_partkey"),
        (F.col("id") % n_supp + 1).alias("l_suppkey"),
        (F.col("id") % 50 + 1).cast("double").alias("l_quantity"),
        (((F.col("id") * 7919) % 900000) / 100.0 + 1.0).alias("l_extendedprice"),
        ((F.col("id") % 11) / 100.0).alias("l_discount"),
        F.to_timestamp(
            F.date_add(F.lit("1995-01-01").cast("date"), (F.col("id") % 850).cast("int"))
        ).alias("l_shipdate"),
    ).write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")
    spark.range(1, n_ord + 1).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % n_cust + 1).alias("o_custkey"),
        F.to_timestamp(
            F.date_add(F.lit("1995-01-01").cast("date"), (F.col("id") % 730).cast("int"))
        ).alias("o_orderdate"),
        (((F.col("id") * 104729) % 49000000) / 100.0 + 1000.0).alias("o_totalprice"),
        F.concat(F.lit("P"), (F.col("id") % 5 + 1).cast("string")).alias(
            "o_orderpriority"
        ),
    ).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    names = ["red widget", "blue bolt", "hot gear", "small ring", "red gizmo"]
    spark.range(1, n_part + 1).select(
        F.col("id").alias("p_partkey"),
        F.element_at(
            F.array(*[F.lit(x) for x in names]), (F.col("id") % 5 + 1).cast("int")
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), (F.col("id") % 25 + 1).cast("string")).alias("p_brand"),
        (((F.col("id") * 31) % 90000) / 100.0 + 900.0).alias("p_retailprice"),
    ).write.mode("overwrite").parquet(f"{out_dir}/part.parquet")
    spark.range(1, n_supp + 1).select(
        F.col("id").alias("s_suppkey"),
        (F.col("id") % 25).cast("int").alias("s_nationkey"),
    ).write.mode("overwrite").parquet(f"{out_dir}/supplier.parquet")
    spark.range(0, 25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id").cast("string")).alias("n_name"),
    ).write.mode("overwrite").parquet(f"{out_dir}/nation.parquet")


def time_op(spark, name: str, sf_dir: str, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.time() - t0)
        cache.release_all()
        spark.catalog.clearCache()
    return statistics.median(samples)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--base", type=int, default=5000)
    args = ap.parse_args()

    spark = get_spark("lakeforge-scale-probe-r9b")
    spark.sparkContext.setLogLevel("ERROR")
    docgen_source.register(spark)

    doc_sizes = {"1x": args.base, "10x": args.base * 10, "100x": args.base * 100}
    li_sizes = {"1x": 600_000, "10x": 6_000_000, "100x": 60_000_000}
    results: dict[str, dict[str, float | str]] = {op: {} for op, _ in OPS}
    order = ["1x", "10x", "100x"]
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label in ("1x", "10x", "100x"):
            d = os.path.join(tmp, label)
            os.makedirs(d)
            make_docs(spark, doc_sizes[label], d)
            make_tpch(spark, li_sizes[label], d)
            dirs[label] = d
        for op, max_label in OPS:
            for label in order:
                if order.index(label) > order.index(max_label):
                    results[op][label] = "capped"
                    continue
                t = time_op(spark, op, dirs[label], args.runs)
                results[op][label] = round(t, 3)
                print(f"{op:32s} {label:>4s}: {t:7.3f}s", flush=True)

    lines = [
        DOC_HEADER,
        "",
        f"Documents at {doc_sizes['1x']:,}/{doc_sizes['10x']:,}/"
        f"{doc_sizes['100x']:,} docs; TPC-H-shaped lineitem at "
        f"{li_sizes['1x']:,}/{li_sizes['10x']:,}/{li_sizes['100x']:,} rows "
        "(orders = li/4, customers = li/40, parts = li/30, suppliers = "
        "li/600) with money/name/date columns so the wave-3/4 join, "
        "decile, and margin ops run.  Same protocol (median of "
        f"{args.runs}, caches released, noop sink).",
        "",
        "| op | t(1x) s | t(10x) s | t(100x) s | alpha (10x->100x) |",
        "|---|---|---|---|---|",
    ]
    def _cell(v):
        return f"{v:.3f}" if isinstance(v, float) else str(v)

    for op, _ in OPS:
        r = results[op]
        if isinstance(r.get("100x"), float) and isinstance(r.get("10x"), float):
            alpha = f"{math.log10(r['100x'] / r['10x']):.2f}"
        else:
            alpha = "capped (see note)"
        lines.append(
            f"| {op} | {_cell(r['1x'])} | {_cell(r['10x'])} | {_cell(r['100x'])} "
            f"| {alpha} |"
        )
    lines += ["", "Why the wave-3/4 family stays ~linear by construction:"]
    lines += WHY

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
