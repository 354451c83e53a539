"""Invariant tests for the round-10 wave B (r11-window queue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeforge import workload_r10b as w

SF_DIR = "/root/testdata/sf0.001"


def test_event_audience_overlap_matches_naive_join(spark):
    """Row-local pair emission == the naive user self-join."""
    from lakeforge.io.sources import read_events

    rows = w.q_event_audience_overlap(spark, SF_DIR).collect()
    dt = read_events(spark, SF_DIR).select("user_id", "event_type").distinct()
    a, b = dt.alias("a"), dt.alias("b")
    naive = {
        (r.ta, r.tb): r.n_both
        for r in a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .collect()
    }
    assert {(r.ta, r.tb): r.n_both for r in rows} == naive
    for r in rows:
        assert r.ta < r.tb
        assert 0 <= r.jaccard_permille <= 1000


def test_backlog_waterfall_is_subset_of_orders(spark):
    rows = w.q_orders_backlog_age_waterfall(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert 0 < sum(r.n_orders for r in rows) <= o.count()
    bands = {r.age_band for r in rows}
    assert bands <= {"age_0_30", "age_31_90", "age_91_365", "age_366_plus"}
    for r in rows:
        assert r.open_value_cents > 0 and r.max_age_days >= 0


def test_retention_matrix_states(spark):
    rows = w.q_nation_retention_matrix(spark, SF_DIR).collect()
    # every active (customer, year) is counted exactly once
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_cy = o.select("o_custkey", F.year("o_orderdate")).distinct().count()
    assert sum(r.n_customers for r in rows) == n_cy
    # the first year in the corpus can only produce 'new' states
    first_yr = min(r.yr for r in rows)
    assert {r.state for r in rows if r.yr == first_yr} == {"new"}
    # each customer is new exactly once -> new totals == distinct customers
    n_new = sum(r.n_customers for r in rows if r.state == "new")
    assert n_new == o.select("o_custkey").distinct().count()


def test_quotation_density_bounds(spark):
    rows = w.q_doc_quotation_density(spark, SF_DIR).collect()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r.n_docs for r in rows) == d.filter(F.length("text") > 0).count()
    for r in rows:
        for c in ("digit_bps_avg", "quote_bps_avg", "punct_bps_avg"):
            assert 0 <= getattr(r, c) <= 10_000


def test_crosslang_contamination_bounds(spark):
    rows = w.q_doc_crosslang_contamination(spark, SF_DIR).collect()
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert sum(r.n_docs for r in rows) == d.count()
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_docs
        assert r.contaminated_permille == r.n_contaminated * 1000 // r.n_docs


def test_pipe_syntax_equals_relational(spark):
    """The pipe-syntax pipeline must plan/evaluate identically to the
    DataFrame relational form."""
    rows = {tuple(r) for r in w.q_pipe_syntax_pricing(spark, SF_DIR).collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F.col("l_quantity") < 45
    )
    rel = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("gross_cents"),
        F.expr(
            "CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
            " AS DECIMAL(38,0))) div 100 AS BIGINT)"
        ).alias("disc_cents"),
    )
    assert rows == {tuple(r) for r in rel.collect()}


def test_param_sql_filter_pushes_and_matches_literal(spark):
    rows = {tuple(r) for r in w.q_param_sql_value_bands(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_totalprice") > w._PARAM_THRESHOLD
    )
    lit = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.min(F.round(F.col("o_totalprice") * 100)).cast("bigint").alias("min_cents"),
    )
    assert rows == {tuple(r) for r in lit.collect()}
    # the parameter literal must reach the scan as a pushed filter
    plan = w.q_param_sql_value_bands(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_totalprice" in plan


def test_quotation_density_exact_on_rich_text(spark, tmp_path):
    """ADVICE r10 #1: the synthetic corpus contains no digits/quotes/
    terminal punctuation, so the oracle gate never exercised the bps
    arithmetic.  Feed text where every tracked class appears and where
    the bps has fractional part >= 0.5 (the old double-div + CAST shape
    diverged there: Spark truncated, DuckDB rounded), and pin Spark ==
    DuckDB-oracle exactly."""
    import duckdb

    texts = [
        # len 7, 2 digits -> 2*10000/7 = 2857.14...
        ("s1", 'ab12"c.'),
        # len 3, 2 quotes -> 6666.66... (frac > 0.5: round vs floor differ)
        ("s1", "\"'x"),
        # len 9, digits=3 -> 3333.33, quotes=1 -> 1111.11, punct=2 -> 2222.2
        ("s2", "1a2b3\".!'"),
        # all-punct doc: 10000 exactly
        ("s2", "!?."),
    ]
    pq = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(pq)

    got = {
        tuple(r)
        for r in w.q_doc_quotation_density(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(w.SQL_DOC_QUOTATION_DENSITY).fetchall()}
    assert got == want
    # and the hand check: source s1 digit bps = (2857 + 0) // 2 = 1428
    by_src = {r[0]: r for r in got}
    assert by_src["s1"][2] == (2 * 10000 // 7 + 0) // 2
    assert by_src["s2"][4] == (2 * 10000 // 9 + 10000) // 2
