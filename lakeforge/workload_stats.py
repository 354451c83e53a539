"""Statistical / mining workload: sketches, association rules, information
theory, regression, and distribution analytics over the TPC-H-shaped tables.

These extend the engine past the reference's ETL surface (reference core is
silver/gold ETL only — gold_sql_to_postgres.py) into the aggregate-analytics
territory any warehouse engine must cover.  Same conventions as
workload_rel.py: identical aliases Spark-vs-oracle, exact DECIMAL money
math before any double cast, deterministic orderings, every small side
broadcast, no driver-side collect.

Scale notes are attached per query; the recurring patterns:

- Sketches (KMV here; count-min lives in ops/sketches.py) are *mergeable*:
  map-side partial aggregation shrinks the shuffle to O(sketch size), not
  O(rows) — the entire point of sketching at 100 TB.
- Candidate generation (brand pairs) fans out per-order with a bounded
  per-basket item count, so the self-join is an equi-join on the order key
  with O(items²)-per-order output, never an all-pairs product.
- Information-theory / chi-square style queries reduce to contingency-cell
  counts (one scan + tiny cell table), then pure column arithmetic over
  broadcast marginals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeforge.functions.keys import duckdb_md5_int_sql, md5_int

DEC = "decimal(18,2)"

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Association rules (market-basket) over order baskets.
# ---------------------------------------------------------------------------

_MIN_PAIR_SUPPORT = 50


def q_basket_brand_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-level association rules mined from order baskets.

    basket = the DISTINCT set of part brands in one order.  Pair candidates
    come from a self equi-join on the order key — each order contributes
    O(brands_in_order²) pairs with brands_in_order bounded by the per-order
    line count (≤7 in TPC-H shape), so the join output is linear in orders,
    never an all-pairs brand product.  Supports/confidence/lift derive from
    the tiny brand-marginal table (≤25 rows, broadcast) and a single-row
    basket total (broadcast scalar fan-out).  Shuffles: one by l_orderkey
    (shared by the dedup and the self-join via the same partitioning), one
    tiny by brand pair.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    tot = baskets.select(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_baskets")
    )
    sup = baskets.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("sup_n")
    )
    a = baskets.select(
        F.col("l_orderkey"), F.col("p_brand").alias("brand_a")
    )
    b = baskets.select(
        F.col("l_orderkey"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_support"))
        .where(F.col("pair_support") >= _MIN_PAIR_SUPPORT)
    )
    sup_a = sup.select(
        F.col("p_brand").alias("brand_a"), F.col("sup_n").alias("sup_a")
    )
    sup_b = sup.select(
        F.col("p_brand").alias("brand_b"), F.col("sup_n").alias("sup_b")
    )
    j = (
        pairs.join(F.broadcast(sup_a), "brand_a")
        .join(F.broadcast(sup_b), "brand_b")
        .crossJoin(F.broadcast(tot))  # 1-row scalar total
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return j.select(
        "brand_a",
        "brand_b",
        "pair_support",
        F.round(d("pair_support") / d("sup_a"), 6).alias("conf_a_to_b"),
        F.round(d("pair_support") / d("sup_b"), 6).alias("conf_b_to_a"),
        F.round(
            d("pair_support") * d("n_baskets") / (d("sup_a") * d("sup_b")), 6
        ).alias("lift"),
    )


SQL_BASKET_BRAND_RULES = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM baskets),
sup AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS sup_n FROM baskets GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS pair_support
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
  HAVING count(*) >= {_MIN_PAIR_SUPPORT}
)
SELECT brand_a, brand_b, pair_support,
       round(CAST(pair_support AS DOUBLE) / CAST(sa.sup_n AS DOUBLE), 6) AS conf_a_to_b,
       round(CAST(pair_support AS DOUBLE) / CAST(sb.sup_n AS DOUBLE), 6) AS conf_b_to_a,
       round(CAST(pair_support AS DOUBLE) * CAST(n_baskets AS DOUBLE)
             / (CAST(sa.sup_n AS DOUBLE) * CAST(sb.sup_n AS DOUBLE)), 6) AS lift
FROM pairs
JOIN sup sa ON sa.p_brand = pairs.brand_a
JOIN sup sb ON sb.p_brand = pairs.brand_b
CROSS JOIN tot
"""

QUERIES["basket_brand_rules"] = q_basket_brand_rules
ORACLE_SQL["basket_brand_rules"] = SQL_BASKET_BRAND_RULES


# ---------------------------------------------------------------------------
# Mutual information between two categorical dimensions.
# ---------------------------------------------------------------------------


def q_segment_priority_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between customer market segment and order
    priority, plus the two marginal entropies.

    One fact scan → contingency cells (|segments|×|priorities| ≤ 25 rows);
    marginals and the scalar total broadcast back onto the cells, so the
    information-theoretic arithmetic runs over a handful of rows.  The
    orders↔customer join is an unhinted equi-join: AQE broadcasts the
    customer side while it fits and shuffle-joins at 100 TB.
    """
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    )
    rowm = cells.groupBy("c_mktsegment").agg(F.sum("obs").alias("row_n"))
    colm = cells.groupBy("o_orderpriority").agg(F.sum("obs").alias("col_n"))
    tot = cells.agg(F.sum("obs").alias("total"))
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    p_xy = d("obs") / d("total")
    mi_term = p_xy * F.log(d("obs") * d("total") / (d("row_n") * d("col_n")))
    mi = (
        cells.join(F.broadcast(rowm), "c_mktsegment")
        .join(F.broadcast(colm), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum("obs").cast("bigint").alias("n"),
            F.round(F.sum(mi_term), 6).alias("mi_nats"),
        )
    )
    h_seg = (
        rowm.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum((d("row_n") / d("total")) * F.log(d("row_n") / d("total"))), 6
            ).alias("h_segment")
        )
    )
    h_pri = (
        colm.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                -F.sum((d("col_n") / d("total")) * F.log(d("col_n") / d("total"))), 6
            ).alias("h_priority")
        )
    )
    return mi.crossJoin(F.broadcast(h_seg)).crossJoin(F.broadcast(h_pri))


SQL_SEGMENT_PRIORITY_MI = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, CAST(count(*) AS BIGINT) AS obs
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
),
rowm AS (SELECT c_mktsegment, SUM(obs) AS row_n FROM cells GROUP BY c_mktsegment),
colm AS (SELECT o_orderpriority, SUM(obs) AS col_n FROM cells GROUP BY o_orderpriority),
tot AS (SELECT SUM(obs) AS total FROM cells),
mi AS (
  SELECT CAST(SUM(obs) AS BIGINT) AS n,
         round(SUM((CAST(obs AS DOUBLE) / CAST(total AS DOUBLE))
               * ln(CAST(obs AS DOUBLE) * CAST(total AS DOUBLE)
                    / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)))), 6) AS mi_nats
  FROM cells
  JOIN rowm USING (c_mktsegment)
  JOIN colm USING (o_orderpriority)
  CROSS JOIN tot
),
hs AS (
  SELECT round(-SUM((CAST(row_n AS DOUBLE) / CAST(total AS DOUBLE))
               * ln(CAST(row_n AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS h_segment
  FROM rowm CROSS JOIN tot
),
hp AS (
  SELECT round(-SUM((CAST(col_n AS DOUBLE) / CAST(total AS DOUBLE))
               * ln(CAST(col_n AS DOUBLE) / CAST(total AS DOUBLE))), 6) AS h_priority
  FROM colm CROSS JOIN tot
)
SELECT n, mi_nats, h_segment, h_priority FROM mi CROSS JOIN hs CROSS JOIN hp
"""

QUERIES["segment_priority_mi"] = q_segment_priority_mi
ORACLE_SQL["segment_priority_mi"] = SQL_SEGMENT_PRIORITY_MI


# ---------------------------------------------------------------------------
# Closed-form OLS regression per group (built-in regr_* aggregates).
# ---------------------------------------------------------------------------


def q_price_qty_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag ordinary-least-squares fit of extended price on
    quantity via the JVM ``regr_slope/regr_intercept/regr_r2`` aggregates —
    single scan, map-side partial moments, one tiny shuffle by flag.  No
    Python, no iteration: OLS in closed form from the co-moment sketch,
    which is exactly how a 100 TB regression should run.
    """
    li = _t(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice").cast("double")
    x = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
    )


SQL_PRICE_QTY_OLS = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS slope,
       round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS intercept,
       round(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 6) AS r2
FROM lineitem GROUP BY l_returnflag
"""

QUERIES["price_qty_ols"] = q_price_qty_ols
ORACLE_SQL["price_qty_ols"] = SQL_PRICE_QTY_OLS


# ---------------------------------------------------------------------------
# Autocorrelation of the daily-revenue series.
# ---------------------------------------------------------------------------


def q_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of daily order revenue.

    The raw fact collapses to one row per calendar day FIRST (exact DECIMAL
    sums — associative, partitioning-independent), so the global-order
    window runs over the date dimension (~2.4k rows for the 7-year span),
    not the fact: dimension-bounded by construction, same posture as
    revenue_mom_growth.  ``corr`` skips the NULL lag rows identically on
    both engines.
    """
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec")
    )
    w = Window.orderBy("day")  # date-dimension-bounded (post-aggregate)
    rev = F.col("rev_dec").cast("double")
    series = daily.select(
        "day",
        rev.alias("rev"),
        F.lag(rev, 1).over(w).alias("rev_l1"),
        F.lag(rev, 7).over(w).alias("rev_l7"),
    )
    return series.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.corr("rev", "rev_l1"), 6).alias("autocorr_lag1"),
        F.round(F.corr("rev", "rev_l7"), 6).alias("autocorr_lag7"),
    )


SQL_REVENUE_AUTOCORR = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
),
series AS (
  SELECT day, rev,
         lag(rev, 1) OVER (ORDER BY day) AS rev_l1,
         lag(rev, 7) OVER (ORDER BY day) AS rev_l7
  FROM daily
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       round(corr(rev, rev_l1), 6) AS autocorr_lag1,
       round(corr(rev, rev_l7), 6) AS autocorr_lag7
FROM series
"""

QUERIES["revenue_autocorr"] = q_revenue_autocorr
ORACLE_SQL["revenue_autocorr"] = SQL_REVENUE_AUTOCORR


# ---------------------------------------------------------------------------
# Weight of evidence / information value (feature-screening for a binary
# label — classic credit-scoring / training-feature-selection primitive).
# ---------------------------------------------------------------------------


def q_woe_quantity_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE and IV of quantity bands against the returned-flag label.

    Bands are closed-form from the row (no quantile pass); the whole query
    is one scan → 5-cell contingency → broadcast-scalar totals → column
    arithmetic.  IV contributions per band sum to the feature's information
    value downstream.
    """
    li = _t(spark, sf_dir, "lineitem")
    band = F.least(
        F.lit(4), F.floor((F.col("l_quantity") - 1) / 10)
    ).cast("int")
    cells = (
        li.select(
            band.alias("qty_band"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_ret"),
        )
        .groupBy("qty_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("is_ret").cast("bigint").alias("returned"),
        )
        .withColumn("kept", (F.col("n") - F.col("returned")).cast("bigint"))
    )
    tot = cells.agg(
        F.sum("returned").alias("ret_tot"), F.sum("kept").alias("kept_tot")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    p_ret = d("returned") / d("ret_tot")
    p_kept = d("kept") / d("kept_tot")
    woe = F.log(p_ret / p_kept)
    return (
        cells.crossJoin(F.broadcast(tot))  # 1-row scalar totals
        .select(
            "qty_band",
            "n",
            "returned",
            "kept",
            F.round(woe, 6).alias("woe"),
            F.round((p_ret - p_kept) * woe, 6).alias("iv_contrib"),
        )
    )


SQL_WOE_QUANTITY_RETURNS = """
WITH cells AS (
  SELECT CAST(least(4, floor((l_quantity - 1) / 10)) AS INT) AS qty_band,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned
  FROM lineitem GROUP BY 1
),
c2 AS (SELECT *, CAST(n - returned AS BIGINT) AS kept FROM cells),
tot AS (SELECT SUM(returned) AS ret_tot, SUM(kept) AS kept_tot FROM c2)
SELECT qty_band, n, returned, kept,
       round(ln((CAST(returned AS DOUBLE) / CAST(ret_tot AS DOUBLE))
                / (CAST(kept AS DOUBLE) / CAST(kept_tot AS DOUBLE))), 6) AS woe,
       round(((CAST(returned AS DOUBLE) / CAST(ret_tot AS DOUBLE))
              - (CAST(kept AS DOUBLE) / CAST(kept_tot AS DOUBLE)))
             * ln((CAST(returned AS DOUBLE) / CAST(ret_tot AS DOUBLE))
                  / (CAST(kept AS DOUBLE) / CAST(kept_tot AS DOUBLE))), 6) AS iv_contrib
FROM c2 CROSS JOIN tot
"""

QUERIES["woe_quantity_returns"] = q_woe_quantity_returns
ORACLE_SQL["woe_quantity_returns"] = SQL_WOE_QUANTITY_RETURNS


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — mergeable, value-oracled.
# ---------------------------------------------------------------------------

_KMV_K = 64
_HASH_SPACE = float(1 << 60)  # md5_int is a 60-bit hash


def q_kmv_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-customer estimate per market segment vs the exact count.

    The k smallest 60-bit hashes per segment estimate the distinct count as
    (k-1)·M/h_k (Bar-Yossef et al., "Counting distinct elements in a data
    stream").  Selection is TWO-LEVEL so no segment funnels through one
    task: (1) per (segment, hash mod 32) block keep the 64 smallest —
    parallel across 32×|segments| partitions; (2) the ≤ 2048-row survivor
    union yields the global 64 per segment (global min-k ⊆ union of
    block min-ks, so the result is identical to a single-pass min-k).
    The oracle computes the single-level equivalent directly.  At 100 TB
    the same sketch is mergeable map-side: each partition keeps its local
    min-k, the shuffle carries O(k) values per (segment, block).
    """
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    pairs = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", md5_int("o_custkey").alias("h"))
        .distinct()
    )
    exact = pairs.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_distinct")
    )
    # Level 1: min-k within each (segment, h mod 32) block.
    w_blk = Window.partitionBy("c_mktsegment", F.pmod("h", F.lit(32))).orderBy("h")
    survivors = (
        pairs.withColumn("rn", F.row_number().over(w_blk))
        .where(F.col("rn") <= _KMV_K)
        .select("c_mktsegment", "h")
    )
    # Level 2: global min-k per segment over the tiny survivor union.
    w_seg = Window.partitionBy("c_mktsegment").orderBy("h")
    topk = (
        survivors.withColumn("rn", F.row_number().over(w_seg))
        .where(F.col("rn") <= _KMV_K)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_k"),
            F.max("h").alias("kth_hash"),
        )
    )
    est = F.when(F.col("n_k") < _KMV_K, F.col("n_k").cast("double")).otherwise(
        F.round(
            (F.col("n_k") - 1).cast("double")
            * F.lit(_HASH_SPACE)
            / F.col("kth_hash").cast("double")
        )
    ).cast("bigint")
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return (
        topk.join(F.broadcast(exact), "c_mktsegment")
        .withColumn("kmv_estimate", est)
        .select(
            "c_mktsegment",
            "exact_distinct",
            "kmv_estimate",
            F.round(
                F.abs(d("kmv_estimate") - d("exact_distinct"))
                * 1000.0
                / d("exact_distinct")
            )
            .cast("bigint")
            .alias("err_permille"),
        )
    )


_H_CUSTKEY = duckdb_md5_int_sql(["o_custkey"])

SQL_KMV_DISTINCT_SEGMENTS = f"""
WITH pairs AS (
  SELECT DISTINCT c_mktsegment, {_H_CUSTKEY} AS h
  FROM orders JOIN customer ON o_custkey = c_custkey
),
exact AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS exact_distinct
  FROM pairs GROUP BY c_mktsegment
),
ranked AS (
  SELECT c_mktsegment, h,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY h) AS rn
  FROM pairs
),
topk AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_k, MAX(h) AS kth_hash
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY c_mktsegment
),
est AS (
  SELECT c_mktsegment, n_k, kth_hash,
         CAST(CASE WHEN n_k < {_KMV_K} THEN CAST(n_k AS DOUBLE)
              ELSE round(CAST(n_k - 1 AS DOUBLE) * {_HASH_SPACE!r}
                         / CAST(kth_hash AS DOUBLE))
         END AS BIGINT) AS kmv_estimate
  FROM topk
)
SELECT e.c_mktsegment, exact_distinct, kmv_estimate,
       CAST(round(abs(CAST(kmv_estimate AS DOUBLE) - CAST(exact_distinct AS DOUBLE))
            * 1000.0 / CAST(exact_distinct AS DOUBLE)) AS BIGINT) AS err_permille
FROM est e JOIN exact USING (c_mktsegment)
"""

QUERIES["kmv_distinct_segments"] = q_kmv_distinct_segments
ORACLE_SQL["kmv_distinct_segments"] = SQL_KMV_DISTINCT_SEGMENTS
