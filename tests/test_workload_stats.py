"""Semantic properties of the statistics/mining workload
(lakeforge/workload_stats.py) beyond the DuckDB value-oracle equality that
tools/check_oracle.py and the driver already enforce.

Each test pins an invariant the oracle comparison alone cannot distinguish
from a shared bug on both sides (e.g. CMS one-sidedness, IV non-negativity,
MI's entropy bound, OLS against an independent NumPy solve).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from lakeforge import workload_stats as ws

SF = "/root/testdata/sf0.001"


def test_kmv_exact_below_k_and_bounded_error(spark):
    rows = ws.q_kmv_distinct_segments(spark, SF).collect()
    assert rows, "expected one row per market segment"
    for r in rows:
        if r.exact_distinct < ws._KMV_K:
            # fewer distinct hashes than k => the sketch IS the exact set
            assert r.kmv_estimate == r.exact_distinct
        else:
            # k=64 gives ~1/sqrt(62) ≈ 12.7% relative error; 3 sigma bound
            assert r.err_permille <= 400, (r.c_mktsegment, r.err_permille)


def test_association_rules_internally_consistent(spark):
    rows = ws.q_basket_brand_rules(spark, SF).collect()
    assert rows, "expected some brand pairs above min support"
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.pair_support >= ws._MIN_PAIR_SUPPORT
        assert 0.0 < r.conf_a_to_b <= 1.0
        assert 0.0 < r.conf_b_to_a <= 1.0
        assert r.lift > 0.0
        # lift is symmetric: lift = conf(a->b) / P(b) = conf(b->a) / P(a)
        # (can't recheck without marginals, but conf*support consistency holds:
        # support/conf_a_to_b = sup_a and support/conf_b_to_a = sup_b are ints)
        sup_a = r.pair_support / r.conf_a_to_b
        sup_b = r.pair_support / r.conf_b_to_a
        assert abs(sup_a - round(sup_a)) < 1e-3
        assert abs(sup_b - round(sup_b)) < 1e-3


def test_mutual_information_bounds(spark):
    r = ws.q_segment_priority_mi(spark, SF).collect()[0]
    assert r.mi_nats >= -1e-9, "MI is non-negative"
    assert r.mi_nats <= min(r.h_segment, r.h_priority) + 1e-6, (
        "MI is bounded by each marginal entropy"
    )
    # segment/priority are near-independent in the synthetic data: MI ~ 0
    assert r.mi_nats < 0.05


def test_woe_iv_contributions_nonnegative_and_totals(spark):
    rows = ws.q_woe_quantity_returns(spark, SF).collect()
    assert {r.qty_band for r in rows} == {0, 1, 2, 3, 4}
    for r in rows:
        # (a-b)*ln(a/b) >= 0 for any positive a,b
        assert r.iv_contrib >= -1e-9
        assert r.n == r.returned + r.kept
    li_n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert sum(r.n for r in rows) == li_n


def test_ols_matches_numpy_closed_form(spark):
    rows = {r.l_returnflag: r for r in ws.q_price_qty_ols(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_flag: dict[str, list[tuple[float, float]]] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(
            (float(r.l_quantity), float(r.l_extendedprice))
        )
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        got = rows[flag]
        assert got.n == len(pts)
        assert math.isclose(got.slope, slope, rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(got.intercept, intercept, rel_tol=1e-6, abs_tol=1e-2)
        r = np.corrcoef(x, y)[0, 1]
        assert math.isclose(got.r2, r * r, rel_tol=1e-5, abs_tol=1e-6)


def test_autocorr_in_valid_range(spark):
    r = ws.q_revenue_autocorr(spark, SF).collect()[0]
    assert r.n_days > 100
    assert -1.0 <= r.autocorr_lag1 <= 1.0
    assert -1.0 <= r.autocorr_lag7 <= 1.0


def test_skyline_is_pareto_optimal_and_real(spark):
    rows = ws.q_part_skyline(spark, SF).collect()
    assert rows
    pts = [(r.p_retailprice, r.p_size) for r in rows]
    for price, size in pts:
        for price2, size2 in pts:
            if (price2, size2) == (price, size):
                continue
            dominated = price2 <= price and size2 >= size and (
                price2 < price or size2 > size
            )
            assert not dominated, f"({price},{size}) dominated by ({price2},{size2})"
    part = {
        (r.p_retailprice, r.p_size)
        for r in spark.read.parquet(f"{SF}/part.parquet").collect()
    }
    for p in pts:
        assert p in part


def test_interval_coalescing_invariants(spark):
    rows = ws.q_customer_activity_intervals(spark, SF).collect()
    assert rows
    for r in rows:
        # every island is at least one 30-day interval long
        assert r.covered_days >= 30 * r.n_periods
        assert r.span_days >= r.covered_days
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert len(rows) == n_cust


def test_gini_in_unit_range(spark):
    r = ws.q_spend_gini(spark, SF).collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert r.total_spend > 0
    assert r.n > 0


def test_ks_statistic_in_unit_range(spark):
    r = ws.q_price_ks_segments(spark, SF).collect()[0]
    assert 0.0 <= r.ks_stat <= 1.0
    assert r.n_a > 0 and r.n_b > 0
    # near-identical generators => small KS at this SF
    assert r.ks_stat < 0.2


def test_changepoint_day_in_range(spark):
    r = ws.q_revenue_changepoint(spark, SF).collect()[0]
    assert r.n_days > 100
    assert r.cusum_stat > 0.0
    import datetime as dt

    assert dt.date(1992, 1, 1) <= r.changepoint_day <= dt.date(1999, 12, 31)


def test_kmv_overlap_estimates_consistent(spark):
    r = ws.q_kmv_year_overlap(spark, SF).collect()[0]
    assert r.exact_inter <= r.exact_union
    assert 0 <= r.inter_est <= r.union_est
    # k=64 KMV: generous 3-sigma-ish bound on the union estimate
    assert abs(r.union_est - r.exact_union) <= max(10, 0.5 * r.exact_union)


def test_prefix_filter_lossless_vs_full_index(spark):
    """The prefix+positional+length filter chain must return EXACTLY the
    full inverted-index join's pairs at the same threshold — in-engine
    twin of the driver's DuckDB oracle proof."""
    from lakeforge.llm.dedup import jaccard_pairs, jaccard_prefix_pairs
    from lakeforge.workload_llm import _neardup_corpus

    corpus = _neardup_corpus(spark, SF)
    got = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union, r.jaccard_permille)
        for r in jaccard_prefix_pairs(
            corpus, "text", "doc_id", shingle_n=3, df_cap=50, tau_permille=600
        ).collect()
    }
    want = {
        (r.doc_a, r.doc_b, r.n_inter, r.n_union, r.jaccard_permille)
        for r in jaccard_pairs(
            corpus, "text", "doc_id", shingle_n=3, df_cap=50, min_permille=600
        ).collect()
    }
    assert got == want
    assert got, "expected near-dup pairs in the mutated corpus"


def test_join_delta_rule_partitions_the_new_join(spark):
    """Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB must be exactly the new-join rows
    missing from the old join — no duplicates, no losses."""
    from pyspark.sql import functions as F

    from lakeforge.ops.merge import join_delta

    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderkey"
    )
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    o_old = o.filter(F.col("o_orderkey") % 10 != 0)
    o_new = o.filter(F.col("o_orderkey") % 10 == 0)
    c_old = c.filter(F.col("o_custkey") % 20 != 0)
    c_new = c.filter(F.col("o_custkey") % 20 == 0)
    delta = join_delta(o_old, o_new, c_old, c_new, "o_custkey")
    full = o.join(c, "o_custkey")
    old = o_old.join(c_old, "o_custkey")
    key = lambda r: (r.o_custkey, r.o_orderkey, r.c_nationkey)  # noqa: E731
    got = sorted(map(key, delta.collect()))
    want = sorted(
        set(map(key, full.collect())) - set(map(key, old.collect()))
    )
    assert got == want  # sorted list vs sorted set: also proves no dups


def test_survival_curve_monotone_nonincreasing(spark):
    rows = sorted(
        ws.q_reorder_survival(spark, SF).collect(), key=lambda r: r.t
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 < r.survival <= 1.0
        assert r.survival <= prev + 1e-9, "S(t) must be non-increasing"
        assert r.d_t >= 1 and r.at_risk >= r.d_t
        prev = r.survival


def test_wilson_interval_brackets_conversion(spark):
    rows = ws.q_funnel_wilson_ci(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.wilson_lo <= r.conversion <= r.wilson_hi <= 1.0
        assert r.n_buyers <= r.n_viewers


def test_bootstrap_ci_brackets_point_estimate(spark):
    r = ws.q_bootstrap_price_ci(spark, SF).collect()[0]
    assert r.n_replicates == ws._BOOT_B
    assert r.ci_lo <= r.mean_price <= r.ci_hi
    # Poisson-bootstrap SE of the mean ~ sd/sqrt(n): CI half-width should
    # be small relative to the estimate but strictly positive
    half = (r.ci_hi - r.ci_lo) / 2
    assert 0 < half < 0.2 * r.mean_price


def test_user_paths_are_valid_event_types(spark):
    rows = ws.q_user_path_3grams(spark, SF).collect()
    types = {
        r.event_type
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type")
        .distinct()
        .collect()
    }
    for r in rows:
        assert {r.step1, r.step2, r.step3} <= types
        assert r.support >= ws._PATH_MIN_SUPPORT


def test_did_identity_and_counts(spark):
    r = ws.q_did_segment_effect(spark, SF).collect()[0]
    recomputed = (r.treat_post - r.treat_pre) - (r.ctrl_post - r.ctrl_pre)
    assert abs(r.did_effect - recomputed) < 1e-5
    n = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert r.n_orders == n


def test_benford_shares_sum_to_one(spark):
    rows = ws.q_benford_price_digits(spark, SF).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.chi2_contrib >= 0.0


def test_stl_outliers_exceed_threshold(spark):
    rows = ws.q_revenue_stl_outliers(spark, SF).collect()
    n_days = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(F.to_date("o_orderdate"))
        .distinct()
        .count()
    )
    for r in rows:
        assert abs(r.z) > 2.5
    # outliers should be a small tail, not the bulk of the series
    assert len(rows) < 0.05 * n_days


def test_psi_contributions_nonnegative(spark):
    rows = ws.q_price_psi_drift(spark, SF).collect()
    assert rows
    for r in rows:
        # (a-e)ln(a/e) >= 0 for positive smoothed shares
        assert r.psi_contrib >= -1e-9
        assert r.n_1995 >= 0 and r.n_1996 >= 0


def test_js_divergence_bounded(spark):
    import math

    rows = ws.q_source_lang_js_divergence(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.js_divergence <= math.log(2) + 1e-9
        assert r.n_docs > 0


def test_cms_join_size_never_underestimates(spark):
    r = ws.q_suppkey_joinsize_estimate(spark, SF).collect()[0]
    assert r.overcount >= 0, "CMS inner product is upper-biased"
    assert r.join_size_est == r.exact_join_size + r.overcount
    assert r.exact_join_size > 0


def test_embedding_centroid_within_component_range(spark):
    rows = ws.q_lang_embedding_centroid(spark, SF).collect()
    assert rows
    dims = {}
    for r in rows:
        dims.setdefault(r.lang, set()).add(r.pos)
        # centroid component must lie within the raw component range
        assert abs(r.mean_scaled) <= 1 * ws._EMB_SCALE
        assert r.n_vectors > 0
    for lang, ps in dims.items():
        assert ps == set(range(64)), f"{lang} missing dimensions"


# ---------------------------------------------------------------------------
# Robust statistics: winsorized mean, Theil–Sen trend.
# ---------------------------------------------------------------------------

def test_winsorized_mean_is_outlier_robust(spark, tmp_path):
    # 19 orders at $10 + one $1e6 outlier, single priority group.
    rows = [(i, "1-URGENT", 10.0) for i in range(19)] + [(99, "1-URGENT", 1e6)]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = ws.q_winsorized_price_stats(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 20
    # p95 over 20 rows picks the 19th value = 1000 cents -> outlier clamped
    assert r.lo == 1000 and r.hi == 1000
    assert r.winsor_mean_cents == 1000           # robust: outlier neutralized
    assert r.raw_mean_cents == (19 * 1000 + 100_000_000) // 20  # raw: dragged


def test_theilsen_slope_resists_one_bad_year(spark, tmp_path):
    # One customer/nation; clean $100/yr growth 1995-2000 except a wild 1998.
    orders = []
    for i, yr in enumerate([1995, 1996, 1997, 1998, 1999, 2000]):
        price = 1e7 if yr == 1998 else 100.0 * (yr - 1994)
        orders.append((i, 1, f"{yr}-06-01", price))
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_orderdate string, o_totalprice double"
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, 7)], "c_custkey bigint, c_nationkey bigint"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(7, "FRANCE")], "n_nationkey bigint, n_name string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    r = ws.q_theilsen_nation_trend(spark, str(tmp_path)).collect()[0]
    assert r.n_name == "FRANCE" and r.n_pairs == 15
    # 10 of 15 pairwise slopes avoid 1998 and equal exactly 10000 cents/yr;
    # the median lands on the clean slope despite the 1e7 spike
    assert r.ts_slope_cents_per_year == 10_000


def test_auc_matches_independent_numpy_mann_whitney(spark):
    """q_embedding_auc's histogram-cumsum formulation must equal the
    classical average-rank Mann-Whitney AUC computed independently in
    NumPy on the same rows (pins tie handling — the oracle shares the
    histogram formulation, so it alone can't catch a shared tie bug)."""
    import pandas as pd

    row = ws.q_embedding_auc(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    scores = np.array([float(v[0]) for v in pdf["embedding"]], dtype=np.float64)
    pos = (pdf["label"].to_numpy() < 5).astype(np.int64)
    n_pos, n_neg = int(pos.sum()), int((1 - pos).sum())
    # average ranks (1-based) with tie groups sharing the mean rank
    order = np.argsort(scores, kind="stable")
    sorted_scores = scores[order]
    ranks = np.empty(len(scores), dtype=np.float64)
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    u = float(ranks[pos == 1].sum()) - n_pos * (n_pos + 1) / 2.0
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert row.u2 == int(round(2 * u))
    assert row.auc_permille == (1000 * row.u2) // (2 * n_pos * n_neg)
    assert 0 <= row.auc_permille <= 1000


def test_calibration_bins_partition_the_table(spark):
    rows = ws.q_score_calibration(spark, SF).collect()
    import pandas as pd

    pdf = pd.read_parquet(f"{SF}/embeddings.parquet")
    assert sum(r.n for r in rows) == len(pdf)
    bins = [r.bin for r in rows]
    assert bins == sorted(bins) and len(set(bins)) == len(bins)
    for r in rows:
        assert 0 <= r.n_pos <= r.n
        assert r.pos_permille == (1000 * r.n_pos) // r.n
        # bin invariant: every score micro-sum sits inside the bin's range
        # (bin = floor(score*20); micros = floor(score*1e6)) => mean within
        lo, hi = r.bin * 50000, (r.bin + 1) * 50000
        assert lo * r.n <= r.sum_score_micros < hi * r.n


def test_spearman_matches_numpy_rank_pearson(spark):
    """q_spearman_qty_price's histogram-join formulation must equal
    Pearson-on-average-ranks computed independently row-wise in NumPy."""
    import pandas as pd

    row = ws.q_spearman_qty_price(spark, SF).collect()[0]
    pdf = pd.read_parquet(f"{SF}/lineitem.parquet")
    x = pdf["l_quantity"].astype("int64").to_numpy()
    y = np.round(pdf["l_extendedprice"].to_numpy() * 100).astype("int64")
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(y).rank(method="average").to_numpy()
    rho = np.corrcoef(rx, ry)[0, 1]
    assert row.n == len(pdf)
    assert abs(float(row.spearman_rho) - rho) < 1e-6


def test_quantile_estimate_within_one_bin(spark):
    """The equi-width histogram estimate can be off by at most one bin
    width (interpolation stays inside the bin containing the target
    rank), and the exact side must reproduce percentile_disc."""
    import pandas as pd

    rows = {r.q_permille: r for r in
            ws.q_quantile_sketch_calibration(spark, SF).collect()}
    assert set(rows) == {500, 900, 990}
    pdf = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.round(pdf["o_totalprice"].to_numpy() * 100).astype("int64")
    width = (int(cents.max()) - int(cents.min())) // 256 + 1
    n = len(cents)
    srt = np.sort(cents)
    for q, r in rows.items():
        t = (q * n + 999) // 1000
        assert r.exact_cents == int(srt[t - 1])  # percentile_disc rank
        assert r.abs_err_cents <= width


def test_join_skew_advisor_bounds(spark):
    r = ws.q_join_skew_advisor(spark, SF).collect()[0]
    assert r.n_rows >= r.n_keys >= 1
    assert r.max_freq >= r.p99_freq >= r.p50_freq >= 1
    # hottest key is at least the mean key load => ratio >= 1000 permille
    assert r.skew_ratio_permille >= 1000
    assert r.recommended_salt >= 1
    # salting by the recommendation levels the hot key to <= p50 load
    assert (r.max_freq + r.recommended_salt - 1) // r.recommended_salt <= r.p50_freq


def test_multitouch_credit_conserves_purchases(spark):
    """Total distributed credit must equal exactly 1000 permille per
    credited purchase (remainder-to-last-touch makes splits exact)."""
    rows = ws.q_multitouch_attribution(spark, SF).collect()
    assert rows
    import duckdb

    purchases_with_touch = duckdb.connect().execute(f"""
        WITH v AS (SELECT user_id, ts FROM '{SF}/events.parquet'
                   WHERE event_type = 'view'),
        p AS (SELECT event_id, user_id, ts FROM '{SF}/events.parquet'
              WHERE event_type = 'purchase')
        SELECT COUNT(DISTINCT p.event_id) FROM p JOIN v
          ON v.user_id = p.user_id
         AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """).fetchone()[0]
    assert sum(r.credit_permille for r in rows) == 1000 * purchases_with_touch


def test_cuped_matches_pandas_reference(spark):
    import pandas as pd

    rows = {r.variant: r for r in ws.q_cuped_adjusted_lift(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.event_type == "purchase"].copy()
    es = ev.ts.astype("int64") // 10**9
    mid = (es.min() + es.max()) // 2
    ev["cents"] = (ev.value * 100).round().astype("int64")
    ev["x"] = ev.cents.where(es < mid, 0)
    ev["y"] = ev.cents.where(es >= mid, 0)
    pu = ev.groupby("user_id")[["x", "y"]].sum().reset_index()
    theta = np.cov(pu.x, pu.y, ddof=0)[0, 1] / np.var(pu.x)
    gx = pu.x.mean()
    for v in (0, 1):
        sub = pu[pu.user_id % 2 == v]
        adj = sub.y.mean() - theta * (sub.x.mean() - gx)
        assert rows[v].n_users == len(sub)
        assert abs(float(rows[v].adjusted_mean_y_cents) - adj) < 1e-3
    # CUPED must not move the pooled mean by construction of theta
    pooled_raw = pu.y.mean()
    pooled_adj = sum(
        float(rows[v].adjusted_mean_y_cents) * rows[v].n_users for v in (0, 1)
    ) / len(pu)
    assert abs(pooled_adj - pooled_raw) < 1e-3
