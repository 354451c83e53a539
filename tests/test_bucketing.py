from __future__ import annotations

import io
from contextlib import redirect_stdout

from lakeforge.io.bucketing import bucketed_join, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _fresh_tables(spark, *names):
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        shutil.rmtree(f"{wh}/{n}", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed+sorted by the join key must join with zero
    Exchange nodes (the 100 TB co-located-join path)."""
    _fresh_tables(spark, "t_bucketed_l", "t_bucketed_r")
    left = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS a")
    right = spark.range(0, 500).selectExpr("id AS k", "id * 3 AS b")
    write_bucketed(left, "t_bucketed_l", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "t_bucketed_r", ["k"], n_buckets=8, sort_cols=["k"])

    # Disable broadcast: with a broadcastable side the planner broadcasts
    # and marks "Bucketed: false (disabled by query planner)" — bucketing
    # matters precisely when neither side fits in memory (the 100 TB case),
    # which -1 simulates.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_bucketed_l", "t_bucketed_r", on=["k"])
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 500

        # Same join on plain (unbucketed) frames DOES shuffle — the cost
        # the bucketed write pre-paid.
        plain = left.join(right, "k")
        assert "Exchange" in _plan(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_l")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_r")


def test_bucketed_join_values_match_plain_join(spark):
    _fresh_tables(spark, "t_vals_l", "t_vals_r")
    left = spark.range(0, 200).selectExpr("id AS k", "id + 100 AS a")
    right = spark.range(100, 300).selectExpr("id AS k", "id + 7 AS b")
    write_bucketed(left, "t_vals_l", ["k"], n_buckets=4)
    write_bucketed(right, "t_vals_r", ["k"], n_buckets=4)
    got = sorted(
        tuple(r) for r in bucketed_join(spark, "t_vals_l", "t_vals_r", ["k"]).collect()
    )
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want
    spark.sql("DROP TABLE IF EXISTS t_vals_l")
    spark.sql("DROP TABLE IF EXISTS t_vals_r")
