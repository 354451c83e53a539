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
