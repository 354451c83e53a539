"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation, no
write cost).  Timings include Catalyst planning but not session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakeforge.session import get_spark
from lakeforge.workload import QUERIES

HEADLINE = [
    "pricing_summary",
    "scd2_orders",
    "temporal_fact_resolve",
    "full_outer_totals",
    "broadcast_enrich",
    "cdc_merge_orders",
    "latest_order_per_customer",
    "dim_date",
    "quality_summary_orders",
    "top_orders",
    "events_hourly",
    "events_sessionize",
    "text_stats",
    "docs_exact_dedup",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "embedding_cosine_topk",
    "rp_lsh_buckets",
    "shipping_priority",
    "region_revenue",
    "returned_top_customers",
    "rollup_revenue",
    "rank_orders_top3",
    "asof_purchase_view",
    "salted_skew_revenue",
    "ivf_topk",
    "embedding_neardup",
    "revenue_forecast",
    "customer_order_histogram",
    "orders_above_cust_avg",
    "rolling_7day_spend",
    "token_counts",
    "resample_daily_spend",
    "grouping_sets_revenue",
    "percentile_ranks",
    "promo_revenue",
    "large_orders",
    "rich_inactive_customers",
    "simhash_neardup",
    "events_tier_mix",
    "events_dedup_ingest",
    "docs_sample",
    "events_train_test",
    "events_stratified",
    "docs_training_pipeline",
    "nation_trade_volume",
    "extreme_order_by_segment",
    "docs_scrub_pii",
    "mode_status_by_flag",
    "events_funnel",
    "multi_format_dates",
    "ngram_jaccard_pairs",
    "neardup_clusters",
    "media_features",
    "sketch_profile",
    "geo_mean_price",
    "docs_decontaminate",
    "docs_pack_sequences",
    "docs_repetition_score",
    "events_session_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("lakeforge-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/code paths once on the smallest query so the measured
    # numbers aren't first-action classloading noise.
    QUERIES["top_orders"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # headline set GREW round-over-round (r01: 50 queries);
                # compare per-query or mean, not bare totals.
                "n_queries": len(timings),
                "mean_sec_per_query": round(total / max(len(timings), 1), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
