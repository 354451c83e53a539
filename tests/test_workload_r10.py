"""Invariant tests for the round-10 wave (beyond the DuckDB oracle gate,
which already pins exact values — these pin the CLAIMS each query makes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeforge import workload_r10 as w

SF_DIR = "/root/testdata/sf0.001"


def test_scd2_incremental_equals_full_rebuild(spark):
    """The theorem the oracle also checks, pinned engine-side: the
    incremental path (dim_old + snapshot batch, history never re-read)
    produces row-for-row the same dimension — surrogate keys included —
    as one scd2() over the full timeline."""
    from lakeforge.ops.dedup import dedup_keep_first
    from lakeforge.ops.scd2 import scd2

    inc = {tuple(r) for r in w.q_scd2_incremental_snapshot(spark, SF_DIR).collect()}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_orderstatus",
        "o_orderkey",
    )
    tl = dedup_keep_first(
        orders, ["o_custkey", "order_date"], [F.col("o_orderkey").desc()]
    ).drop("o_orderkey")
    full = scd2(
        tl,
        key_cols=["o_custkey"],
        tracked_cols=["o_orderstatus"],
        order_col="order_date",
        sk_name="cust_status_sk",
    )
    assert inc == {tuple(r) for r in full.collect()}


def test_scd2_incremental_split_is_nontrivial(spark):
    """Guard the test corpus itself: both sides of the split must be
    populated, else the equivalence test proves nothing."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    split = F.lit(w._SCD2_SPLIT).cast("date")
    n_hist = o.filter(F.col("d") < split).count()
    n_delta = o.filter(F.col("d") >= split).count()
    assert n_hist > 0 and n_delta > 0


def test_merge_manifest_pruning_counts(spark):
    rows = w.q_merge_manifest_pruning(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.n_rows for r in rows) == o.count()
    n_batch = o.filter(F.col("o_orderkey") % 500 == 0).count()
    assert sum(r.n_upserts for r in rows) == n_batch
    for r in rows:
        assert r.touched == (r.n_upserts > 0)
        assert r.rewrite_rows == (r.n_rows if r.touched else 0)
        assert r.min_orderkey <= r.max_orderkey
    # pruning must actually prune something AND touch something
    assert any(r.touched for r in rows)
    assert sum(r.rewrite_rows for r in rows) < o.count()


def test_open_orders_grid_matches_naive_pointwise(spark):
    """Event-difference counting == the naive per-month interval count,
    checked at every reported month."""
    grid = {r.ym: (r.open_orders_eom, r.open_value_cents_eom)
            for r in w.q_open_orders_month_grid(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("oym"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    close = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("ls"))
        .select(
            "l_orderkey",
            (F.year("ls") * 100 + F.month("ls")).alias("cym"),
        )
    )
    j = o.join(close, o.o_orderkey == close.l_orderkey, "left").select(
        "oym",
        F.when(F.col("cym").isNull(), F.lit(None))
        .otherwise(F.greatest("oym", "cym"))
        .alias("cym"),
        "cents",
    )
    import random

    for ym in random.Random(7).sample(sorted(grid), 8):
        open_at = j.filter(
            (F.col("oym") <= ym)
            & (F.col("cym").isNull() | (F.col("cym") > ym))
        )
        agg = open_at.agg(
            F.count(F.lit(1)).cast("bigint"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint"),
        ).collect()[0]
        assert (agg[0], agg[1]) == grid[ym], ym


def test_event_arrival_lateness_bounds(spark):
    from lakeforge.io.sources import read_events

    rows = w.q_event_arrival_lateness(spark, SF_DIR).collect()
    n_total = read_events(spark, SF_DIR).count()
    assert sum(r.n_events for r in rows) == n_total
    for r in rows:
        assert 0 <= r.n_late <= r.n_events
        assert r.total_late_seconds >= r.max_late_seconds >= 0
        if r.n_late == 0:
            assert r.total_late_seconds == 0


def test_compaction_plan_arithmetic(spark):
    rows = w.q_lineitem_compaction_plan(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    assert sum(r.n_rows for r in rows) == li.count()
    for r in rows:
        assert r.est_bytes >= r.n_rows * w._FIXED_COLS_BYTES
        assert r.avg_row_bytes == r.est_bytes // r.n_rows
        expected_files = -(-r.est_bytes // w._TARGET_FILE_BYTES)
        assert r.target_files == expected_files
        assert r.small_partition == (r.est_bytes < w._TARGET_FILE_BYTES / 8)


def test_knn_label_consistency_bounds(spark):
    from lakeforge.workload_llm import _N_QUERIES

    rows = w.q_knn_label_consistency(spark, SF_DIR).collect()
    assert sum(r.n_queries for r in rows) == _N_QUERIES
    for r in rows:
        assert 0 <= r.n_vote_correct <= r.n_queries
        assert 0 <= r.agreement_permille <= 1000


def test_events_props_variant_matches_string_path(spark):
    """VARIANT extraction must agree value-for-value with the
    get_json_object string path on the same column."""
    from lakeforge.io.sources import read_events

    ev = read_events(spark, SF_DIR)
    mismatch = ev.select(
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("kv"),
        F.get_json_object("props", "$.k").cast("bigint").alias("ks"),
    ).filter(~F.col("kv").eqNullSafe(F.col("ks"))).count()
    assert mismatch == 0
    rows = w.q_events_props_variant(spark, SF_DIR).collect()
    assert sum(r.n_events for r in rows) == ev.count()
    for r in rows:
        assert r.k_min <= r.k_max
        assert r.k_band == r.k_min // 25 == r.k_max // 25


def test_token_length_hist_shares(spark):
    rows = w.q_token_length_hist_by_lang(spark, SF_DIR).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        tot_bps = sum(r.share_bps for r in rs)
        # integer-division shares undershoot by < #bands
        assert 10_000 - len(rs) <= tot_bps <= 10_000, lang
        assert all(r.n_tokens > 0 for r in rs)


def test_events_props_variant_floor_bands_negative_k(spark, tmp_path):
    """ADVICE r10 #4: banding must FLOOR on both engines.  Inject
    negative k telemetry (the VARIANT path places no domain constraint)
    and pin Spark == DuckDB-oracle exactly: floor(-13/25) = -1, not 0."""
    import datetime
    import duckdb

    pq = str(tmp_path / "events.parquet")
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (i, ts, i, "view", 1.0, f'{{"k": {k}}}')
        for i, k in enumerate([-13, -25, -26, 0, 24, 25, -1, 99])
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(pq)

    got = {
        tuple(r) for r in w.q_events_props_variant(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}/*.parquet')"
    )
    want = {tuple(r) for r in con.execute(w.SQL_EVENTS_PROPS_VARIANT).fetchall()}
    assert got == want
    bands = {r[1] for r in got}
    assert -2 in bands and -1 in bands and 0 in bands and 3 in bands
