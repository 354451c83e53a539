"""Scale probe for the 13 round-10 ships (waves A and B) — probe-on-ship,
the round they ship (the discipline VERDICT r09 #5 re-affirmed).

Same protocol as the sibling probes (1x/10x/100x synthetic corpora,
median of N runs, caches released, alpha = log10(t100/t10)).  Reuses the
r9b/r10 generators and extends the corpus with what the new ops read:
o_orderstatus on orders (SCD2), l_returnflag/l_linestatus on lineitem
(compaction plan), labeled embeddings (kNN eval), multi-language docs
(cross-lingual contamination has structure to find).

Appends/replaces its own section in docs/SCALE_PROBE.md.

Usage: python tools/scale_probe_r10b.py [--runs N]
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

from pyspark.sql import functions as F

from lakeforge import cache
from lakeforge.io import docgen_source
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES
from scale_probe_r9b import make_tpch
from scale_probe_r10 import make_aux

DOC_HEADER = "## Round-10 ships (waves A+B, probed the round they ship)"

OPS = [
    ("scd2_incremental_snapshot",
     "incremental cost is |dim| + |batch| (collapsed change rows + the "
     "post-split snapshot), never |history|; one keyed shuffle for the "
     "collapse, anti/semi joins on the batch key set."),
    ("merge_manifest_pruning",
     "two map-side-combinable aggregates over orders; the manifest x "
     "batch join is |months|^2 bounded."),
    ("open_orders_month_grid",
     "each order emits two +/-1 events row-locally; the cumulative runs "
     "over the calendar-bounded month grid — O(n) with a constant-size "
     "window."),
    ("event_arrival_lateness",
     "per-user keyed running-max window (one shuffle by user_id), "
     "|event_type| rollup."),
    ("lineitem_compaction_plan",
     "row-local byte estimate + one map-side-combinable (month) "
     "aggregate."),
    ("knn_label_consistency",
     "exact top-k rides the asserted <= 20-query broadcast side; label "
     "joins key the Q x k candidate frame; |labels| output."),
    ("events_props_variant",
     "parse_json/variant_get are row-local; one (type, band) bounded "
     "aggregate."),
    ("token_length_hist_by_lang",
     "explode feeds a map-side-combinable (lang, band) aggregate — the "
     "exchange carries partials, never tokens."),
    ("event_audience_overlap",
     "per-user type set + row-local pair emission (fan-out <= C(|types|,2) "
     "per user); exchanges carry the distinct aggregate and a bounded "
     "pair rollup — no user self-join."),
    ("orders_backlog_age_waterfall",
     "one aggregate per fact + a keyed order-grain join; 4-row output."),
    ("nation_retention_matrix",
     "distinct (cust, year) then a per-customer LAG over <= |years| rows; "
     "keyed join to nation; bounded grid output."),
    ("doc_quotation_density",
     "entirely row-local regexp counting before a |sources| aggregate."),
    ("doc_crosslang_contamination",
     "top-vocab table is |langs| x topV bounded (broadcast-safe by "
     "construction); the corpus-sized token stream joins that constant "
     "build and reduces per doc."),
]

LANGS = ["en", "de", "fr", "es", "pt"]


def make_docs_multilang(spark, rows: int, out_dir: str) -> None:
    (
        spark.read.format("lakeforge_docgen")
        .option("rows", rows).option("numPartitions", 32).load()
        .select(
            "doc_id", "text",
            F.element_at(
                F.array(*[F.lit(x) for x in LANGS]),
                (F.col("doc_id") % len(LANGS) + 1).cast("int"),
            ).alias("lang"),
            "source",
            F.octet_length("text").cast("long").alias("n_chars"),
        )
        .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    )


def make_embeddings(spark, rows: int, out_dir: str) -> None:
    (
        spark.read.format("lakeforge_docgen")
        .option("kind", "embeddings").option("rows", rows)
        .option("numPartitions", 32).load()
        .withColumn("label", (F.col("vec_id") % 10).cast("int"))
        .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    )


def enrich_tpch(spark, out_dir: str) -> None:
    """Add the columns the r10 ops read that the shared generator lacks:
    o_orderstatus on orders; l_tax + l_returnflag + l_linestatus on
    lineitem."""
    o = spark.read.parquet(f"{out_dir}/orders.parquet")
    if "o_orderstatus" not in o.columns:
        o.withColumn(
            "o_orderstatus",
            F.element_at(
                F.array(F.lit("O"), F.lit("F"), F.lit("P")),
                (F.col("o_orderkey") % 3 + 1).cast("int"),
            ),
        ).write.mode("overwrite").parquet(f"{out_dir}/orders2.parquet")
        _swap(out_dir, "orders")
    li = spark.read.parquet(f"{out_dir}/lineitem.parquet")
    missing = [c for c in ("l_tax", "l_returnflag", "l_linestatus")
               if c not in li.columns]
    if missing:
        out = li
        if "l_tax" in missing:
            out = out.withColumn("l_tax", (F.col("l_orderkey") % 9) / 100.0)
        if "l_returnflag" in missing:
            out = out.withColumn(
                "l_returnflag",
                F.element_at(
                    F.array(F.lit("N"), F.lit("R"), F.lit("A")),
                    (F.col("l_orderkey") % 3 + 1).cast("int"),
                ),
            )
        if "l_linestatus" in missing:
            out = out.withColumn(
                "l_linestatus",
                F.when(F.col("l_orderkey") % 2 == 0, "O").otherwise("F"),
            )
        out.write.mode("overwrite").parquet(f"{out_dir}/lineitem2.parquet")
        _swap(out_dir, "lineitem")


def _swap(out_dir: str, name: str) -> None:
    import shutil

    shutil.rmtree(f"{out_dir}/{name}.parquet")
    os.rename(f"{out_dir}/{name}2.parquet", f"{out_dir}/{name}.parquet")


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
    args = ap.parse_args()

    spark = get_spark("lakeforge-scale-probe-r10b")
    spark.sparkContext.setLogLevel("ERROR")
    docgen_source.register(spark)

    doc_sizes = {"1x": 5_000, "10x": 50_000, "100x": 500_000}
    li_sizes = {"1x": 600_000, "10x": 6_000_000, "100x": 60_000_000}
    ev_sizes = {"1x": 200_000, "10x": 2_000_000, "100x": 20_000_000}
    emb_sizes = {"1x": 2_000, "10x": 20_000, "100x": 200_000}
    order = ["1x", "10x", "100x"]
    results: dict[str, dict[str, float]] = {op: {} for op, _ in OPS}
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label in order:
            d = os.path.join(tmp, label)
            os.makedirs(d)
            make_docs_multilang(spark, doc_sizes[label], d)
            make_tpch(spark, li_sizes[label], d)
            make_aux(spark, li_sizes[label], ev_sizes[label], d)
            enrich_tpch(spark, d)
            make_embeddings(spark, emb_sizes[label], d)
            dirs[label] = d
        for op, _ in OPS:
            for label in order:
                t = time_op(spark, op, dirs[label], args.runs)
                results[op][label] = round(t, 3)
                print(f"{op:32s} {label:>4s}: {t:7.3f}s", flush=True)

    lines = [
        DOC_HEADER,
        "",
        f"Documents at {doc_sizes['1x']:,}/{doc_sizes['10x']:,}/"
        f"{doc_sizes['100x']:,} docs (round-robin over {len(LANGS)} "
        "languages); TPC-H-shaped lineitem at "
        f"{li_sizes['1x']:,}/{li_sizes['10x']:,}/{li_sizes['100x']:,} rows "
        "(+ o_orderstatus, l_tax/returnflag/linestatus, customer, region, "
        "nation); events at "
        f"{ev_sizes['1x']:,}/{ev_sizes['10x']:,}/{ev_sizes['100x']:,}; "
        f"labeled embeddings at {emb_sizes['1x']:,}/{emb_sizes['10x']:,}/"
        f"{emb_sizes['100x']:,} vectors.  Median of {args.runs}, caches "
        "released, noop sink.",
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
    lines += ["", "Why the round-10 ships stay ~linear by construction:"]
    lines += [f"- `{op}`: {why}" for op, why in OPS]

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
