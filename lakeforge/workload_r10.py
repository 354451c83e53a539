"""Round-10 wave operators: five new oracle-paired families (VERDICT r09
#8 — registry continuation at the r9 quality bar, leading with the two
judge-named candidates).

- scd2_incremental_snapshot — incremental SCD2 maintenance at snapshot
  grain whose DuckDB oracle is the FULL-REBUILD dimension: the driver's
  hash match is literally the incremental==rebuild equivalence theorem.
- merge_manifest_pruning    — the partition-pruned MERGE planning table:
  ops/merge.py's partition-scoped rewrite (reference D5,
  bronze_to_silver.py:122-160) paired with manifest row/key stats.
- open_orders_month_grid    — month-end open-order inventory via
  event-difference counting (+1 at open, -1 at close, cumulative over
  the bounded month grid) — the O(n) shape for "state at every T".
- event_arrival_lateness    — out-of-order arrival audit over the events
  stream (arrival proxy = event_id): per-user keyed running-max window,
  the batch twin of the streaming watermark-lateness gauge.
- lineitem_compaction_plan  — small-file compaction planning from
  row-local byte estimates rolled up per ship-month (the maintenance
  query behind io/sinks.py's repartition-by-partition-column write).

Conventions as everywhere: exact integer/decimal arithmetic (cents, bps,
seconds), deterministic orderings, DuckDB twin per query, bounded
outputs, no sf-scaling broadcasts (month-grid broadcasts are
calendar-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Memoized analyzed base scan of the immutable testdata table (r13
    # floor opt — see io.sources.base_parquet: plan reuse, not a cache).
    from lakeforge.io.sources import base_parquet

    return base_parquet(spark, f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Incremental SCD2 at snapshot grain.  The full-history dimension is
# split at _SCD2_SPLIT: everything before is the already-built dimension
# (dim_old, the deep-history store); everything on/after is the new
# snapshot batch.  The incremental path NEVER re-reads deep history:
# untouched keys pass through dim_old by anti-join, and for keys present
# in the batch the collapsed dim_old rows themselves ARE the (key,
# start, status) timeline — union them with the batch timeline and
# re-run the same LAG/LEAD collapse (ops/scd2.py, reference
# gold_sql_to_postgres.py:94-125 semantics incl. the NULL-unsafe change
# filter).  Collapse is composable for append-only snapshots (all batch
# dates > all history dates per key), so the result is PROVABLY the
# full rebuild — and the oracle is exactly the full-rebuild SQL over
# the whole orders table: the driver's value-hash match is the
# equivalence theorem, checked row-for-row including surrogate keys.
#
# Scale: cost is |dim| + |batch| (collapsed rows + new rows), not
# |history|; one keyed shuffle for the collapse, anti/semi joins on the
# batch's key set.  At 100 TB the history scan this avoids is the whole
# point of incremental SCD2.
# ---------------------------------------------------------------------------

_SCD2_SPLIT = "1998-01-01"


def q_scd2_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.ops.dedup import dedup_keep_first
    from lakeforge.ops.scd2 import scd2

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_orderstatus",
        "o_orderkey",
    )
    split = F.lit(_SCD2_SPLIT).cast("date")

    def timeline(df: DataFrame) -> DataFrame:
        return dedup_keep_first(
            df, ["o_custkey", "order_date"], [F.col("o_orderkey").desc()]
        ).drop("o_orderkey")

    dim_old = scd2(
        timeline(orders.filter(F.col("order_date") < split)),
        key_cols=["o_custkey"],
        tracked_cols=["o_orderstatus"],
        order_col="order_date",
        sk_name="cust_status_sk",
    )
    tl_new = timeline(orders.filter(F.col("order_date") >= split))
    affected = tl_new.select("o_custkey").distinct()
    untouched = dim_old.join(affected, "o_custkey", "left_anti")
    # dim_old's change rows reconstitute the collapsed timeline verbatim.
    old_tl = (
        dim_old.join(affected, "o_custkey", "left_semi")
        .select(
            "o_custkey",
            F.col("effective_start_date").alias("order_date"),
            "o_orderstatus",
        )
    )
    rebuilt = scd2(
        old_tl.unionByName(tl_new),
        key_cols=["o_custkey"],
        tracked_cols=["o_orderstatus"],
        order_col="order_date",
        sk_name="cust_status_sk",
    )
    cols = [
        "cust_status_sk", "o_custkey", "o_orderstatus",
        "effective_start_date", "effective_end_date", "is_current",
    ]
    return untouched.select(*cols).unionByName(rebuilt.select(*cols))


def _sql_scd2_incremental() -> str:
    # The ORACLE is the FULL REBUILD over the complete orders table —
    # matching it is the incremental-maintenance equivalence proof.
    from lakeforge.workload import _SCD2_ORDERS_CTE

    return _SCD2_ORDERS_CTE + "SELECT * FROM dim"


QUERIES["scd2_incremental_snapshot"] = q_scd2_incremental_snapshot
# registered late (workload.py imports this module after defining the CTE)


# ---------------------------------------------------------------------------
# Manifest-pruned MERGE planning table: which p_ym partitions does a CDC
# batch touch, and how much rewrite does partition-scoped MERGE save vs
# a full-table rewrite?  The batch is a deterministic update set (every
# 500th order).  Pairs the manifest stats (per-partition rows + orderkey
# min/max, the footer stats io/layout skipping reads) with ops/merge.py's
# partition-scoped rewrite rule (reference D5: only changed p_ym
# partitions are rewritten).  Scale: two map-side-combinable aggregates
# over orders; the join is |months| x |months| bounded (~81 cells).
# ---------------------------------------------------------------------------


def q_merge_manifest_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("p_ym"),
    )
    manifest = o.groupBy("p_ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("o_orderkey").cast("bigint").alias("min_orderkey"),
        F.max("o_orderkey").cast("bigint").alias("max_orderkey"),
    )
    batch = (
        o.filter(F.col("o_orderkey") % 500 == 0)
        .groupBy("p_ym")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_upserts"))
    )
    # calendar-bounded build side (<= ~81 months): broadcast is safe at
    # any SF because months, not rows, bound it.
    joined = manifest.join(F.broadcast(batch), "p_ym", "left")
    return joined.select(
        F.col("p_ym").cast("int").alias("p_ym"),
        "n_rows",
        "min_orderkey",
        "max_orderkey",
        F.coalesce("n_upserts", F.lit(0)).cast("bigint").alias("n_upserts"),
        (F.coalesce("n_upserts", F.lit(0)) > 0).alias("touched"),
        F.when(F.coalesce("n_upserts", F.lit(0)) > 0, F.col("n_rows"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rewrite_rows"),
    )


SQL_MERGE_MANIFEST_PRUNING = """
WITH o AS (
  SELECT o_orderkey,
         year(o_orderdate) * 100 + month(o_orderdate) AS p_ym
  FROM orders
),
manifest AS (
  SELECT p_ym, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey,
         CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
  FROM o GROUP BY p_ym
),
batch AS (
  SELECT p_ym, CAST(count(*) AS BIGINT) AS n_upserts
  FROM o WHERE o_orderkey % 500 = 0 GROUP BY p_ym
)
SELECT CAST(m.p_ym AS INTEGER) AS p_ym, m.n_rows, m.min_orderkey,
       m.max_orderkey,
       CAST(COALESCE(b.n_upserts, 0) AS BIGINT) AS n_upserts,
       COALESCE(b.n_upserts, 0) > 0 AS touched,
       CAST(CASE WHEN COALESCE(b.n_upserts, 0) > 0 THEN m.n_rows
                 ELSE 0 END AS BIGINT) AS rewrite_rows
FROM manifest m LEFT JOIN batch b USING (p_ym)
"""

QUERIES["merge_manifest_pruning"] = q_merge_manifest_pruning
ORACLE_SQL["merge_manifest_pruning"] = SQL_MERGE_MANIFEST_PRUNING


# ---------------------------------------------------------------------------
# Month-end open-order inventory via event-difference counting: an order
# is OPEN at the end of month m iff it was placed in or before m and its
# last line ships after m.  Instead of joining every order to every
# month (O(orders x months)), each order emits +1/+cents at its open
# month and -1/-cents at its close month (month of last shipment); the
# cumulative sum over the calendar-bounded month grid reconstructs the
# exact end-of-month state — the O(n) shape for "state at every T".
# Orders with no lineitems never close (open forever); the synthetic
# corpus contains ship-before-order rows (291 at sf0.001), so the close
# month is clamped to greatest(open_ym, close_ym) — an inverted interval
# is empty, never negative.  Output months = months where flow changed
# (the grid the events define).
# ---------------------------------------------------------------------------


def q_open_orders_month_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("int")
        .alias("open_ym"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    close = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"))
        .select(
            "l_orderkey",
            (F.year("last_ship") * 100 + F.month("last_ship"))
            .cast("int")
            .alias("close_ym"),
        )
    )
    ev = (
        o.join(close, o.o_orderkey == close.l_orderkey, "left")
        .withColumn(
            # explicit NULL pass-through: Spark's greatest() skips NULLs
            # (would close no-lineitem orders immediately) while DuckDB's
            # propagates them — the CASE makes both engines identical.
            "close_eff",
            F.when(F.col("close_ym").isNull(), F.lit(None).cast("int"))
            .otherwise(F.greatest("open_ym", "close_ym")),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("open_ym").alias("ym"),
                        F.lit(1).cast("bigint").alias("d_n"),
                        F.col("cents").alias("d_cents"),
                    ),
                    F.struct(
                        F.col("close_eff").alias("ym"),
                        F.lit(-1).cast("bigint").alias("d_n"),
                        (-F.col("cents")).alias("d_cents"),
                    ),
                )
            ).alias("e")
        )
        .select("e.ym", "e.d_n", "e.d_cents")
        .filter(F.col("ym").isNotNull())
    )
    cells = ev.groupBy("ym").agg(
        F.sum("d_n").cast("bigint").alias("dn"),
        F.sum("d_cents").cast("bigint").alias("dc"),
    )
    # cumulative over the bounded month grid (<= ~85 rows post-aggregate)
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    return cells.select(
        "ym",
        F.sum("dn").over(w).cast("bigint").alias("open_orders_eom"),
        F.sum("dc").over(w).cast("bigint").alias("open_value_cents_eom"),
    )


SQL_OPEN_ORDERS_MONTH_GRID = """
WITH o AS (
  SELECT o_orderkey,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INTEGER)
             AS open_ym,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
close AS (
  SELECT l_orderkey,
         CAST(year(MAX(CAST(l_shipdate AS DATE))) * 100
              + month(MAX(CAST(l_shipdate AS DATE))) AS INTEGER) AS close_ym
  FROM lineitem GROUP BY l_orderkey
),
ev AS (
  SELECT open_ym AS ym, CAST(1 AS BIGINT) AS d_n, cents AS d_cents
  FROM o
  UNION ALL
  SELECT CASE WHEN c.close_ym IS NULL THEN NULL
              ELSE greatest(o.open_ym, c.close_ym) END AS ym,
         CAST(-1 AS BIGINT) AS d_n, -o.cents AS d_cents
  FROM o JOIN close c ON o.o_orderkey = c.l_orderkey
),
cells AS (
  SELECT ym, CAST(SUM(d_n) AS BIGINT) AS dn,
         CAST(SUM(d_cents) AS BIGINT) AS dc
  FROM ev WHERE ym IS NOT NULL GROUP BY ym
)
SELECT ym,
       CAST(SUM(dn) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS open_orders_eom,
       CAST(SUM(dc) OVER (ORDER BY ym ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS open_value_cents_eom
FROM cells
"""

QUERIES["open_orders_month_grid"] = q_open_orders_month_grid
ORACLE_SQL["open_orders_month_grid"] = SQL_OPEN_ORDERS_MONTH_GRID


# ---------------------------------------------------------------------------
# Out-of-order arrival audit: with event_id as the arrival-order proxy,
# an event is LATE if its timestamp precedes the max timestamp of any
# earlier-arriving event of the SAME user (the per-key disorder a
# streaming watermark must absorb — batch twin of the
# events_watermark_lateness gauge).  The running max rides a per-user
# keyed window (one shuffle by user_id, no global ordering anywhere);
# lateness is integer seconds; the rollup is |event_type|-bounded.
# ---------------------------------------------------------------------------


def q_event_arrival_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.io.sources import read_events

    ev = read_events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = ev.select(
        "event_type",
        (
            F.unix_timestamp(F.max("ts").over(w)) - F.unix_timestamp("ts")
        ).alias("late_by"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_by") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        F.coalesce(
            F.sum(F.when(F.col("late_by") > 0, F.col("late_by"))), F.lit(0)
        )
        .cast("bigint")
        .alias("total_late_seconds"),
        F.coalesce(F.max(F.when(F.col("late_by") > 0, F.col("late_by"))), F.lit(0))
        .cast("bigint")
        .alias("max_late_seconds"),
    )


SQL_EVENT_ARRIVAL_LATENESS = """
WITH scored AS (
  SELECT event_type,
         date_diff('second', ts,
                   MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)) AS late_by
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late_by > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(COALESCE(SUM(CASE WHEN late_by > 0 THEN late_by END), 0) AS BIGINT)
           AS total_late_seconds,
       CAST(COALESCE(MAX(CASE WHEN late_by > 0 THEN late_by END), 0) AS BIGINT)
           AS max_late_seconds
FROM scored GROUP BY event_type
"""

QUERIES["event_arrival_lateness"] = q_event_arrival_lateness
ORACLE_SQL["event_arrival_lateness"] = SQL_EVENT_ARRIVAL_LATENESS


# ---------------------------------------------------------------------------
# Small-file compaction planning: per ship-month partition, estimated
# bytes from row-local column widths (8 bytes per numeric/temporal
# column + actual string lengths), the file count a 128 MB target would
# need, and a small-partition flag — the maintenance table behind
# io/sinks.py's repartition-by-partition-column write and the layout
# module's skipping stats.  Row-local estimate + one map-side-combinable
# aggregate; output is calendar-bounded.
# ---------------------------------------------------------------------------

_TARGET_FILE_BYTES = 128 * 1024 * 1024
_FIXED_COLS_BYTES = 8 * 9  # orderkey/partkey/suppkey/linenumber/qty/price/disc/tax/shipdate


def q_lineitem_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("int")
        .alias("p_ym"),
        (
            F.lit(_FIXED_COLS_BYTES)
            + F.octet_length("l_returnflag")
            + F.octet_length("l_linestatus")
        )
        .cast("bigint")
        .alias("row_bytes"),
    )
    cells = li.groupBy("p_ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("row_bytes").cast("bigint").alias("est_bytes"),
    )
    return cells.select(
        "p_ym",
        "n_rows",
        "est_bytes",
        F.expr("CAST(est_bytes div n_rows AS BIGINT)").alias("avg_row_bytes"),
        F.expr(
            f"CAST((est_bytes + {_TARGET_FILE_BYTES} - 1)"
            f" div {_TARGET_FILE_BYTES} AS BIGINT)"
        ).alias("target_files"),
        (F.col("est_bytes") < _TARGET_FILE_BYTES / 8).alias("small_partition"),
    )


SQL_LINEITEM_COMPACTION_PLAN = f"""
WITH li AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INTEGER) AS p_ym,
         CAST({_FIXED_COLS_BYTES}
              + octet_length(CAST(l_returnflag AS BLOB))
              + octet_length(CAST(l_linestatus AS BLOB)) AS BIGINT) AS row_bytes
  FROM lineitem
),
cells AS (
  SELECT p_ym, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(SUM(row_bytes) AS BIGINT) AS est_bytes
  FROM li GROUP BY p_ym
)
SELECT p_ym, n_rows, est_bytes,
       CAST(est_bytes // n_rows AS BIGINT) AS avg_row_bytes,
       CAST((est_bytes + {_TARGET_FILE_BYTES} - 1) // {_TARGET_FILE_BYTES}
            AS BIGINT) AS target_files,
       est_bytes < {_TARGET_FILE_BYTES} / 8 AS small_partition
FROM cells
"""

QUERIES["lineitem_compaction_plan"] = q_lineitem_compaction_plan
ORACLE_SQL["lineitem_compaction_plan"] = SQL_LINEITEM_COMPACTION_PLAN


# ---------------------------------------------------------------------------
# kNN label consistency: retrieval evaluation against the embeddings
# table's ground-truth labels — for the fixed probe query set, what
# fraction of each query's exact top-k cosine neighbors share its label,
# and does the majority vote classify it correctly?  The per-label
# report is the eval table every embedding-space audit starts from.
# Scale: rides the audited cosine_topk machinery (<= 20-query broadcast
# side with runtime assert, corpus scanned once); the label joins key on
# the Q x k candidate frame (bounded), and the rollup is |labels|-sized.
# Majority-vote ties break deterministically on the smallest label.
# ---------------------------------------------------------------------------


def q_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.workload_llm import _TOPK, q_embedding_cosine_topk

    topk = q_embedding_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    lab = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    j = (
        topk.join(lab.withColumnRenamed("label", "q_label"),
                  topk.query_id == lab.vec_id)
        .drop("vec_id")
        .join(
            lab.withColumnRenamed("label", "n_label"),
            F.col("neighbor_id") == lab.vec_id,
        )
        .drop("vec_id")
    )
    votes = j.groupBy("query_id", "q_label", "n_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.col("v").desc(), F.col("n_label").asc()
    )
    per_query = (
        votes.withColumn("__r", F.row_number().over(w_vote))
        .groupBy("query_id", "q_label")
        .agg(
            F.sum(F.when(F.col("n_label") == F.col("q_label"), F.col("v"))
                  .otherwise(0)).cast("bigint").alias("n_agree"),
            F.max(F.when(F.col("__r") == 1, F.col("n_label"))).alias("vote"),
        )
    )
    return per_query.groupBy(F.col("q_label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.when(F.col("vote") == F.col("q_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_vote_correct"),
        F.expr(f"CAST(sum(n_agree) * 1000 div (count(*) * {_TOPK}) AS BIGINT)")
        .alias("agreement_permille"),
    )


def _sql_knn_label_consistency() -> str:
    from lakeforge.workload_llm import _TOPK, SQL_EMBEDDING_COSINE_TOPK

    return f"""
WITH topk AS (SELECT query_id, neighbor_id FROM ({SQL_EMBEDDING_COSINE_TOPK}) _t),
lab AS (SELECT vec_id, label FROM embeddings),
j AS (
  SELECT t.query_id, ql.label AS q_label, nl.label AS n_label
  FROM topk t
  JOIN lab ql ON t.query_id = ql.vec_id
  JOIN lab nl ON t.neighbor_id = nl.vec_id
),
votes AS (
  SELECT query_id, q_label, n_label, CAST(count(*) AS BIGINT) AS v
  FROM j GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY v DESC, n_label ASC) AS rr
  FROM votes
),
per_query AS (
  SELECT query_id, q_label,
         CAST(SUM(CASE WHEN n_label = q_label THEN v ELSE 0 END) AS BIGINT)
             AS n_agree,
         MAX(CASE WHEN rr = 1 THEN n_label END) AS vote
  FROM ranked GROUP BY 1, 2
)
SELECT CAST(q_label AS INTEGER) AS label,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(SUM(CASE WHEN vote = q_label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_vote_correct,
       CAST(SUM(n_agree) * 1000 // (count(*) * {_TOPK}) AS BIGINT)
           AS agreement_permille
FROM per_query GROUP BY 1
"""


QUERIES["knn_label_consistency"] = q_knn_label_consistency
# oracle registered by workload.py (reuses workload_llm SQL at import time)


# ---------------------------------------------------------------------------
# Spark 4 VARIANT ingestion of the events props column: parse_json ->
# variant_get typed extraction — the open-schema path for semi-
# structured telemetry (vs the string-path get_json_object twin
# events_json_extract demonstrates).  VARIANT's binary encoding is
# parsed once; every later field access is an O(1) offset lookup, which
# is what makes wide telemetry schemas affordable at 100 TB.  Rollup is
# |event_type| x |k-band| bounded; all arithmetic integer.
# ---------------------------------------------------------------------------


def q_events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.io.sources import read_events

    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    # Floor-division banding in exact integer arithmetic (ADVICE r10 #4):
    # `(k - pmod(k, 25)) div 25` == floor(k/25) for ALL k including
    # negatives.  Both Spark's bare `div` and DuckDB's integer `//`
    # truncate toward zero (verified empirically: -13 // 25 = 0 in
    # DuckDB), so BOTH sides carry the same pmod-floor formula — exact
    # at any magnitude, no double round-trip.
    return (
        ev.withColumn(
            "k_band", F.expr("CAST((k - pmod(k, 25)) div 25 AS INT)")
        )
        .groupBy("event_type", "k_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("k_total"),
            F.min("k").cast("bigint").alias("k_min"),
            F.max("k").cast("bigint").alias("k_max"),
        )
    )


SQL_EVENTS_PROPS_VARIANT = """
WITH ev AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST((k - ((k % 25 + 25) % 25)) // 25 AS INTEGER) AS k_band,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS k_total,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max
FROM ev GROUP BY 1, 2
"""

QUERIES["events_props_variant"] = q_events_props_variant
ORACLE_SQL["events_props_variant"] = SQL_EVENTS_PROPS_VARIANT


# ---------------------------------------------------------------------------
# Token length histogram by language: the tokenizer-sizing table (how
# much of each language's token mass is 1-2 chars vs long tails —
# directly feeds byte-fallback and vocab-size decisions before a BPE
# train).  Explode is followed immediately by a map-side-combinable
# (lang, band) aggregate, so the exchange carries |langs| x 4 partials,
# never tokens; the share window runs over that bounded grid.
# ---------------------------------------------------------------------------


def q_token_length_hist_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import tokens_col

    d = _t(spark, sf_dir, "documents").select(
        "lang", tokens_col("text").alias("__toks")
    )
    toks = d.select("lang", F.explode("__toks").alias("tok"))
    band = (
        F.when(F.length("tok") <= 2, F.lit("len_1_2"))
        .when(F.length("tok") <= 5, F.lit("len_3_5"))
        .when(F.length("tok") <= 10, F.lit("len_6_10"))
        .otherwise(F.lit("len_11_plus"))
    )
    cells = toks.groupBy("lang", band.alias("len_band")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens")
    )
    w_lang = Window.partitionBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cells.select(
        "lang", "len_band", "n_tokens",
        F.expr(
            "CAST(n_tokens * 10000 div SUM(n_tokens)"
            " OVER (PARTITION BY lang) AS BIGINT)"
        ).alias("share_bps"),
    )


SQL_TOKEN_LENGTH_HIST_BY_LANG = """
WITH toks AS (
  SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  t -> t <> '')) AS tok
  FROM documents
),
cells AS (
  SELECT lang,
         CASE WHEN len(tok) <= 2 THEN 'len_1_2'
              WHEN len(tok) <= 5 THEN 'len_3_5'
              WHEN len(tok) <= 10 THEN 'len_6_10'
              ELSE 'len_11_plus' END AS len_band,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1, 2
)
SELECT lang, len_band, n_tokens,
       CAST(n_tokens * 10000 // SUM(n_tokens) OVER (PARTITION BY lang)
            AS BIGINT) AS share_bps
FROM cells
"""

QUERIES["token_length_hist_by_lang"] = q_token_length_hist_by_lang
ORACLE_SQL["token_length_hist_by_lang"] = SQL_TOKEN_LENGTH_HIST_BY_LANG
