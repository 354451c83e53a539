"""Recursive-CTE workload (workload_rec.py) and HITS (ops/graph.py::hits_ppm)
invariants on small synthetic inputs — the oracle gate checks values on real
testdata; these pin the algebraic properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeforge import cache
from lakeforge.ops.graph import hits_ppm


def _edges(spark):
    # Bipartite: hub 1 -> {10, 11}, hub 2 -> {10}, hub 3 -> {12}.
    # Authority 10 has in-degree 2, it must dominate.
    rows = [(1, 10), (1, 11), (2, 10), (3, 12), (3, 12)]  # dup edge dedups
    return spark.createDataFrame(rows, "hub bigint, auth bigint")


def test_hits_auth_ranking_and_ppm_scale(spark):
    _hubs, auths = hits_ppm(_edges(spark), rounds=2)
    rows = {r.auth: r.auth_ppm for r in auths.collect()}
    cache.release_all()
    assert set(rows) == {10, 11, 12}
    # the max authority is normalized to exactly 1e6 ppm
    assert max(rows.values()) == 1_000_000
    assert rows[10] == 1_000_000  # in-degree-2 node dominates
    assert rows[11] < rows[10] and rows[12] < rows[10]


def test_hits_hub_side_rewards_pointing_at_authorities(spark):
    hubs, _auths = hits_ppm(_edges(spark), rounds=2)
    rows = {r.hub: r.hub_ppm for r in hubs.collect()}
    cache.release_all()
    assert set(rows) == {1, 2, 3}
    # hub 1 points at the best authority AND one more -> top hub at 1e6
    assert rows[1] == 1_000_000
    assert rows[2] < rows[1] and rows[3] < rows[1]


def test_hits_deterministic_across_runs_and_broadcast_modes(spark):
    e = _edges(spark)
    _h1, a1 = hits_ppm(e, rounds=2, broadcast_scores=True)
    got1 = sorted(map(tuple, a1.collect()))
    cache.release_all()
    _h2, a2 = hits_ppm(e, rounds=2, broadcast_scores=False)
    got2 = sorted(map(tuple, a2.collect()))
    cache.release_all()
    assert got1 == got2  # broadcast is a physical hint, not a semantic one


def test_recursive_cte_month_spine_gap_fill(spark, tmp_path):
    # Three orders spanning Jan..Apr with an empty Feb AND an empty Mar —
    # the spine must emit 4 months, two of them zero-filled.
    spark.createDataFrame(
        [(1, "1995-01-15", 10.0), (2, "1995-01-20", 5.5), (3, "1995-04-02", 1.25)],
        "o_orderkey bigint, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    from lakeforge.workload_rec import q_recursive_month_spine

    rows = {
        r.month_start.isoformat(): (r.n_orders, r.revenue_cents)
        for r in q_recursive_month_spine(spark, str(tmp_path)).collect()
    }
    assert rows == {
        "1995-01-01": (2, 1550),
        "1995-02-01": (0, 0),
        "1995-03-01": (0, 0),
        "1995-04-01": (1, 125),
    }


def test_recursive_cte_balance_depletion_terminates_exactly(spark, tmp_path):
    # 3999 cents: 3999 -> 3999*3//4-1000=1999 -> 499 -> -627 (3 rounds).
    # 1 cent: 1 -> -1000 (1 round).  Negative balance: excluded entirely.
    spark.createDataFrame(
        [(1, 39.99), (2, 0.01), (3, -5.00)],
        "s_suppkey bigint, s_acctbal double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")
    from lakeforge.workload_rec import q_recursive_balance_depletion

    rows = {
        r.rounds_to_deplete: (r.n_suppliers, r.min_suppkey, r.max_suppkey)
        for r in q_recursive_balance_depletion(spark, str(tmp_path)).collect()
    }
    assert rows == {3: (1, 1, 1), 1: (1, 2, 2)}


def test_copurchase_pairs_ordered_and_bounded(spark, tmp_path):
    # Baskets: order 1 {A,B,C}, order 2 {A,B}, order 3 {A}.
    # co(A,B)=2, n_A=3, n_B=2 -> cos2_bps = 4*10000//6 = 6666.
    # co(A,C)=1, n_C=1 -> 10000//3 = 3333; co(B,C)=1 -> 10000//2 = 5000.
    rows = [(1, 100), (1, 200), (1, 300), (2, 100), (2, 200), (3, 100),
            (2, 100)]  # dup line dedups
    spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/lineitem.parquet")
    from lakeforge.workload_rec import q_copurchase_item_sim

    out = [tuple(r) for r in q_copurchase_item_sim(spark, str(tmp_path)).collect()]
    assert out == [
        (100, 200, 2, 3, 2, 6666),
        (200, 300, 1, 2, 1, 5000),
        (100, 300, 1, 3, 1, 3333),
    ]


def test_recursion_limit_restored_after_recursive_queries(spark, tmp_path):
    """ADVICE r05 #3 regression: the recursive queries raise
    spark.sql.cteRecursionLevelLimit for their own execution but must
    RESTORE the prior session value afterwards (a bare conf.set silently
    raised the recursion guard for every later query in the shared
    session)."""
    import datetime

    key = "spark.sql.cteRecursionLevelLimit"
    prior = spark.conf.get(key)
    spark.createDataFrame(
        [(1, datetime.date(2024, 1, 15), 10.0),
         (2, datetime.date(2024, 4, 2), 20.0)],
        "o_orderkey bigint, o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(1, 39.99)], "s_suppkey bigint, s_acctbal double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/supplier.parquet")
    from lakeforge.workload_rec import (
        q_recursive_balance_depletion,
        q_recursive_month_spine,
    )

    assert q_recursive_month_spine(spark, str(tmp_path)).count() == 4
    assert spark.conf.get(key) == prior
    assert q_recursive_balance_depletion(spark, str(tmp_path)).count() >= 1
    assert spark.conf.get(key) == prior
