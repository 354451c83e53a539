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
