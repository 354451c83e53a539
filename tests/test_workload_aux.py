"""Semantic invariants for the round-6 auxiliary workload
(lakeforge/workload_aux.py) beyond the DuckDB value-oracle equality the
driver already enforces.

The oracle catches Spark-vs-SQL divergence; these tests pin properties a
bug SHARED by both sides could still violate: conservation laws (every
order lands in exactly one l-diversity group / CMS item / hash bucket),
the CMS no-undercount theorem, LOCF fill semantics on a hand-built gap,
interval-clip arithmetic against a brute-force day count, repeated-span
merging on documents with a known shared passage, and the k-core against
a hand-checkable graph."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from lakeforge import workload_aux as wa

SF = "/root/testdata/sf0.001"


def _n_orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").count()


def test_ldiversity_gate_and_conservation(spark):
    rows = wa.q_orders_ldiversity_release(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.released == (r.n >= wa._LDIV_K and r.n_priorities >= wa._LDIV_L)
        assert 1 <= r.n_priorities <= min(r.n, 5)
    assert sum(r.n for r in rows) == _n_orders(spark)


def test_cms_never_undercounts_and_conserves(spark):
    rows = wa.q_cms_heavy_status(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.overcount >= 0, r
        assert r.cms_n == r.exact_n + r.overcount
    assert sum(r.exact_n for r in rows) == _n_orders(spark)


def test_feature_hash_conserves_rows_and_bounds_sign(spark):
    rows = wa.q_feature_hash_segments(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < wa._FH_D
        assert abs(r.signed_n) <= r.n_rows
        assert 1 <= r.n_features
    assert sum(r.n_rows for r in rows) == _n_orders(spark)


def test_locf_fills_known_gap(spark, tmp_path):
    # nation 0: orders in Jan and Mar only -> Feb imputed with Jan value,
    # Apr (present globally via nation 1) imputed with Mar value.
    orders = [
        (1, 1, dt.datetime(2024, 1, 5), 10.0),
        (2, 1, dt.datetime(2024, 3, 5), 30.0),
        (3, 2, dt.datetime(2024, 2, 5), 99.0),
        (4, 2, dt.datetime(2024, 4, 5), 99.0),
    ]
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp,"
        " o_totalprice double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "c_custkey bigint, c_nationkey int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey int, n_name string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    out = {
        (r.nationkey, str(r.month)): (r.spend_cents_locf, r.imputed)
        for r in wa.q_nation_spend_locf(spark, str(tmp_path)).collect()
    }
    assert len(out) == 8  # 2 nations x 4 observed months
    assert out[(0, "2024-01-01")] == (1000, False)
    assert out[(0, "2024-02-01")] == (1000, True)   # LOCF from Jan
    assert out[(0, "2024-03-01")] == (3000, False)
    assert out[(0, "2024-04-01")] == (3000, True)   # LOCF from Mar
    assert out[(1, "2024-01-01")] == (None, True)   # leading: nothing to carry


def test_transit_occupancy_clips_months_exactly(spark, tmp_path):
    # quantity 40 -> duration 40 % 28 + 1 = 13 days; ship Jan 25 ->
    # receipt Feb 7: 7 days in Jan (25..31), 7 in Feb (1..7).
    spark.createDataFrame(
        [(1, 1, 1, 1, 40.0, dt.datetime(2024, 1, 25))],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {
        str(r.month): (r.transit_days, r.n_shipments)
        for r in wa.q_supplier_transit_occupancy(spark, str(tmp_path)).collect()
    }
    assert out == {"2024-01-01": (7, 1), "2024-02-01": (7, 1)}


def test_transit_occupancy_conserves_total_days(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    expect = li.select(
        (F.col("l_quantity").cast("int") % wa._TRANSIT_MOD + 2).alias("d")
    ).agg(F.sum("d")).collect()[0][0]  # duration+1 inclusive days
    got = (
        wa.q_supplier_transit_occupancy(spark, SF)
        .agg(F.sum("transit_days")).collect()[0][0]
    )
    assert got == expect


def test_repeated_spans_finds_shared_passage(spark, tmp_path):
    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"{shared} epsilon zeta eta theta iota kappa"),
        (3, "completely unrelated text with no overlap at all here now"),
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in wa.q_docs_repeated_spans(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}  # doc 3 shares nothing
    # the shared 10-token passage is one maximal span in each doc
    for d in (1, 2):
        assert out[d].n_spans == 1
        assert out[d].repeated_tokens == 10
        assert out[d].max_span_tokens == 10


def test_kcore_recovers_planted_clique(spark):
    # Bipartite-ish clique: nodes 0..3 all-to-all (deg 3 each) with k=3
    # survives; pendant chain 4-5 peels (deg 1 < 3), and after its
    # removal node 0's degree is still 3.
    from lakeforge.ops.graph import kcore_nodes

    und = [(a, b) for a in range(4) for b in range(4) if a != b]
    und += [(0, 4), (4, 0), (4, 5), (5, 4)]
    edges = spark.createDataFrame(und, "src bigint, dst bigint")
    got = {r.node: r.core_deg for r in kcore_nodes(edges, k=3, rounds=6).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_tcloseness_whole_population_group_is_zero(spark, tmp_path):
    # One segment, one year -> the single group IS the population, so
    # TVD must be exactly 0 and the group releases.
    import datetime as dt
    rows = [(i, 1, dt.datetime(2024, 1, 1 + i % 20), "P%d" % (i % 3)) for i in range(60)]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp,"
        " o_orderpriority string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, "SEG")], "c_custkey bigint, c_mktsegment string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    out = wa.q_tcloseness_priorities(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].tvd_permille == 0 and bool(out[0].released_t)


def test_tcloseness_bounds_and_conservation(spark):
    rows = wa.q_tcloseness_priorities(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.tvd_permille <= 1000
        assert r.released_t == (r.tvd_permille <= wa._TCLOSE_T_PERMILLE)
    assert sum(r.n for r in rows) == _n_orders(spark)


def test_matryoshka_constant_tail_dims_give_perfect_recall(spark, tmp_path):
    # If dims 17..64 are CONSTANT, truncating to 16 cannot change any
    # L2 ranking -> recall@k must be exactly 1000 for trunc_dim=16.
    rows = [
        (vid, [((vid * 13 + d * 7) % 23) / 23.0 for d in range(16)]
              + [0.5] * 48)
        for vid in range(60)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = wa.q_matryoshka_recall(spark, str(tmp_path)).collect()
    d16 = [r for r in out if r.trunc_dim == 16]
    assert len(d16) == wa._MRL_QUERIES
    assert all(r.recall_permille == 1000 for r in d16)


def test_matryoshka_grid_complete_and_bounded(spark):
    out = wa.q_matryoshka_recall(spark, SF).collect()
    assert len(out) == len(wa._MRL_DIMS) * wa._MRL_QUERIES
    for r in out:
        assert 0 <= r.n_hits <= wa._MRL_TOPK
        assert r.recall_permille == r.n_hits * 1000 // wa._MRL_TOPK


def test_zorder_prunes_secondary_dimension_better_than_linear(spark):
    out = {r.layout: r for r in wa.q_zorder_skipping_audit(spark, SF).collect()}
    assert set(out) == {"linear", "zorder"}
    for r in out.values():
        assert 1 <= r.n_files <= wa._ZA_FILES
        assert 0 <= r.scan_permille <= 1000
    assert out["zorder"].scan_permille < out["linear"].scan_permille


def test_nearest_view_join_picks_closest_and_crosses_buckets(spark, tmp_path):
    # Purchase at 10:00:00.  Views at 09:31 (29 min before, PREVIOUS
    # 30-min bucket -> must still be found), 10:05 (5 min after ->
    # nearest), 10:20, and one out of range at 11:00.  Tie case: user 2
    # has views exactly +-7 min -> earlier wins.
    import datetime as dt
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    ev = [
        (100, 1, "purchase", base),
        (1, 1, "view", base - dt.timedelta(minutes=29)),
        (2, 1, "view", base + dt.timedelta(minutes=5)),
        (3, 1, "view", base + dt.timedelta(minutes=20)),
        (4, 1, "view", base + dt.timedelta(minutes=60)),
        (200, 2, "purchase", base),
        (5, 2, "view", base - dt.timedelta(minutes=7)),
        (6, 2, "view", base + dt.timedelta(minutes=7)),
    ]
    spark.createDataFrame(
        ev, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.purchase_id: (r.view_id, r.gap_seconds)
           for r in wa.q_nearest_view_join(spark, str(tmp_path)).collect()}
    assert out[100] == (2, -300)       # +5 min view, gap = purchase - view
    assert out[200] == (5, 420)        # tie on |gap| -> earlier view wins


def test_nearest_view_bucket_boundary_equals_oracle_bruteforce(spark, tmp_path):
    # A view exactly 30:00 before the purchase sits 2 buckets away only
    # if the purchase is at a bucket start — place it so the candidate
    # comes from the adjacent bucket and verify it is NOT missed.
    import datetime as dt
    base = dt.datetime(2024, 3, 1, 10, 30, 0)  # bucket boundary
    ev = [
        (300, 9, "purchase", base),
        (7, 9, "view", base - dt.timedelta(minutes=30)),  # exactly -1800s
    ]
    spark.createDataFrame(
        ev, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = wa.q_nearest_view_join(spark, str(tmp_path)).collect()
    assert [(r.purchase_id, r.view_id, r.gap_seconds) for r in out] == [
        (300, 7, 1800)
    ]


def test_strip_spans_removes_exactly_the_shared_passage(spark, tmp_path):
    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"{shared} epsilon zeta eta theta iota kappa"),
        (3, "completely unrelated text with no overlap at all here now"),
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in
           wa.q_docs_strip_repeated_spans(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_tokens_before == 14 and out[1].n_tokens_removed == 10
    assert out[2].n_tokens_before == 16 and out[2].n_tokens_removed == 10
    assert out[3].n_tokens_removed == 0
    # survivors fingerprint to the expected cleaned text
    from lakeforge.functions.keys import md5_int
    exp = spark.createDataFrame(
        [("alpha beta gamma delta",)], "t string"
    ).select(md5_int("t").alias("fp")).collect()[0].fp
    assert out[1].cleaned_fp == exp


def test_bitmap_overlap_equals_join_count(spark):
    got = {
        (r.year_a, r.year_b): r.n_both
        for r in wa.q_active_years_bitmap(spark, SF).collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    act = o.select(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey"
    ).distinct()
    a = act.toPandas()
    import itertools
    by_year = {y: set(g["o_custkey"]) for y, g in a.groupby("yr")}
    for ya, yb in itertools.combinations(sorted(by_year), 2):
        assert got[(ya, yb)] == len(by_year[ya] & by_year[yb]), (ya, yb)


def test_weighted_median_known_values_and_even_split(spark, tmp_path):
    # Group R: prices 100,200,300 with weights 1,2,1 (W=4): cum at 200 is
    # 3 >= 2 -> lo = 200; cum*2 > 4 first at 200 (6 > 4) -> hi = 200.
    # Group A: prices 100,300 weights 1,1 (W=2): lo = 100 (2 >= 2),
    # hi = 300 (2 > 2 false at 100, true at 300) -> even-split visible.
    rows = [
        (1, 1, "R", 1.00, 1.0), (1, 2, "R", 2.00, 2.0), (1, 3, "R", 3.00, 1.0),
        (2, 1, "A", 1.00, 1.0), (2, 2, "A", 3.00, 1.0),
    ]
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_linenumber int, l_returnflag string,"
        " l_extendedprice double, l_quantity double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = {r.l_returnflag: r for r in
           wa.q_weighted_median_price(spark, str(tmp_path)).collect()}
    assert out["R"].wmedian_lo_cents == 200 and out["R"].wmedian_hi_cents == 200
    assert out["A"].wmedian_lo_cents == 100 and out["A"].wmedian_hi_cents == 300
    assert out["R"].w_total == 4 and out["A"].w_total == 2


def test_capped_balance_clamps_exactly(spark, tmp_path):
    # customer 1 in date order: +1000, -2500 (clamp -> 0), +500 -> 500.
    # orderkeys: 1 (+), 3 (debit, %3==0), 4 (+); prices 10.00, 25.00, 5.00.
    import datetime as dt
    rows = [
        (1, 1, dt.datetime(2024, 1, 1), 10.00),
        (3, 1, dt.datetime(2024, 1, 2), 25.00),
        (4, 1, dt.datetime(2024, 1, 3), 5.00),
    ]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp,"
        " o_totalprice double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    out = wa.q_capped_running_balance(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.final_balance_cents, r.n_clamps, r.n_orders) == (500, 1, 3)


def test_rolling_distinct_windows_exactly(spark, tmp_path):
    # users: day1 {A,B}, day2 {B}, day9 {A}.  Window ends on event days:
    # d1 -> {A,B}=2, d2 -> {A,B}=2 (d1 within 7d), d9 -> {A} only
    # (d1/d2 are 8+/7+ days before d9 -> d2 is 7 days before: d2+6 = d8
    # < d9, so excluded) = 1.
    import datetime as dt
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    ev = [
        (1, 100, "view", base),
        (2, 200, "view", base),
        (3, 200, "view", base + dt.timedelta(days=1)),
        (4, 100, "view", base + dt.timedelta(days=8)),
    ]
    spark.createDataFrame(
        ev, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {str(r.win_end): (r.users_1d, r.users_7d)
           for r in wa.q_rolling_7day_distinct_users(spark, str(tmp_path)).collect()}
    assert out == {
        "2024-05-01": (2, 2),
        "2024-05-02": (1, 2),
        "2024-05-09": (1, 1),
    }
