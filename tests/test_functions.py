from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from lakeforge.functions.dates import month_key, parse_date_multi
from lakeforge.functions.keys import duckdb_md5_int_sql, hash_sk


def test_parse_date_multi_all_reference_formats(spark):
    rows = [
        ("01-jan-22", dt.date(2022, 1, 1)),
        ("01-Mar-22", dt.date(2022, 3, 1)),
        ("2022-01-05", dt.date(2022, 1, 5)),
        ("05/01/2022", dt.date(2022, 1, 5)),  # dd/MM wins over MM/dd
        ("01/13/1998", dt.date(1998, 1, 13)),  # only MM/dd parses
        ("not a date", None),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], ["s"])
    got = {
        r["s"]: r["d"]
        for r in df.select("s", parse_date_multi("s").alias("d")).collect()
    }
    for s, want in rows:
        assert got[s] == want, (s, got[s], want)


def test_month_key(spark):
    df = spark.createDataFrame([(dt.date(2022, 3, 9),)], ["d"])
    assert df.select(month_key("d").alias("m")).collect()[0]["m"] == "202203"


def test_hash_sk_matches_duckdb(spark):
    df = spark.createDataFrame(
        [(123, dt.date(2022, 1, 1)), (456, dt.date(2022, 2, 1))], ["k", "d"]
    )
    got = {r["k"]: r["sk"] for r in df.select("k", hash_sk("k", "d").alias("sk")).collect()}
    sql = duckdb_md5_int_sql(["k", "strftime(d, '%Y-%m-%d')"])
    duck = duckdb.sql(
        f"SELECT k, {sql} AS sk FROM (VALUES (123, DATE '2022-01-01'),"
        "(456, DATE '2022-02-01')) AS t(k, d)"
    ).fetchall()
    assert {k: sk for k, sk in duck} == got


def test_hash_sk_is_deterministic_and_distinct(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["k"])
    out = df.select(hash_sk("k").alias("sk"))
    assert out.distinct().count() == 1000
    a = sorted(r["sk"] for r in out.collect())
    b = sorted(r["sk"] for r in out.collect())
    assert a == b


def test_hash_sk_null_handling_matches_duckdb(spark):
    """NULL key columns: concat_ws alone would collapse (NULL,'x'),
    ('x',NULL) and ('x') to one hash, and the DuckDB `||` twin would go
    NULL — both sides now coalesce NULLs to a chr(30) sentinel (ADVICE r1,
    keys.py)."""
    import duckdb
    from pyspark.sql import functions as F

    from lakeforge.functions.keys import duckdb_md5_int_sql, md5_int

    df = spark.createDataFrame(
        [("x", None), (None, "x"), ("x", "y"), (None, None)], ["a", "b"]
    )
    got = [
        r["sk"]
        for r in df.select(md5_int("a", "b").alias("sk")).collect()
    ]
    assert len(set(got)) == 4  # no NULL-position collisions
    assert all(v is not None for v in got)

    sql = duckdb_md5_int_sql(["a", "b"])
    duck = duckdb.connect().execute(
        f"SELECT {sql} FROM (VALUES ('x', NULL), (NULL, 'x'), ('x', 'y'), (NULL, NULL)) t(a, b)"
    ).fetchall()
    assert [d[0] for d in duck] == got


def test_token_runs_udtf_edges(spark):
    """UDTF edge semantics: NULL text -> no rows; single token -> one
    run; case/whitespace normalization matches tokens_col."""
    from lakeforge.functions.udtfs import TokenRuns

    spark.udtf.register("token_runs_t", TokenRuns)
    df = spark.createDataFrame(
        [(1, "a A a b B"), (2, None), (3, "  x  "), (4, "")],
        ["doc_id", "text"],
    )
    df.createOrReplaceTempView("__udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, r.* FROM __udtf_edge d, LATERAL token_runs_t(d.text) r"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["run_idx"], r["token"], r["run_len"], r["start_pos"])
        )
    assert by_doc[1] == [(0, "a", 3, 0), (1, "b", 2, 3)]
    assert 2 not in by_doc  # NULL -> no rows
    assert by_doc[3] == [(0, "x", 1, 0)]
    assert 4 not in by_doc  # empty -> zero tokens -> no rows
