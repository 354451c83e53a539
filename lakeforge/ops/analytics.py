"""Reusable analytic operators with global-order cores decomposed
two-level (the peak_concurrency seam pattern), extracted from the
workload so they are property-testable against naive reference models
(tests/test_properties.py) and composable outside the registry queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    block_width: float = 100.0,
) -> DataFrame:
    """Pareto-optimal (minimize_col, maximize_col) points: no other point
    is <= on the minimized axis AND >= on the maximized axis with at
    least one strict.  Returns the distinct frontier points.

    Reduction first (max of the maximized axis per distinct minimized
    value — one parallel shuffle), then the running max over the
    minimized order runs two-level: within value-range blocks in
    parallel, block maxima prefix-combined over the tiny block summary,
    carry-in joined back broadcast.  Identical to a single-pass running
    max because blocks follow the sort order.
    """
    from lakeforge.cache import persist_tracked

    # pts feeds the within-block window AND the block summary
    pts = persist_tracked(
        df.groupBy(minimize_col).agg(F.max(maximize_col).alias(maximize_col))
    )
    blocked = pts.withColumn(
        "__bk", F.floor(F.col(minimize_col) / block_width).cast("bigint")
    )
    w_in = (
        Window.partitionBy("__bk")
        .orderBy(minimize_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = blocked.withColumn("__prev_in", F.max(maximize_col).over(w_in))
    blk = blocked.groupBy("__bk").agg(F.max(maximize_col).alias("__blk_max"))
    w_blk = Window.orderBy("__bk").rowsBetween(Window.unboundedPreceding, -1)
    carry = blk.withColumn("__prev_blk", F.max("__blk_max").over(w_blk)).select(
        "__bk", "__prev_blk"
    )
    return (
        within.join(F.broadcast(carry), "__bk")
        .withColumn(
            "__best_prev",
            F.greatest(
                F.coalesce("__prev_in", F.lit(float("-inf"))),
                F.coalesce("__prev_blk", F.lit(float("-inf"))),
            ),
        )
        .filter(F.col(maximize_col) > F.col("__best_prev"))
        .select(minimize_col, maximize_col)
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merge overlapping-or-touching [start, end) intervals per key into
    maximal islands (one row per island with island start/end).

    Gaps-and-islands over RANGES: a new island starts when the next
    start exceeds the running max of ALL previous ends — running max,
    not lag(end), because an earlier long interval can swallow several
    later ones.  Windows partition by key: parallel across keys, bounded
    within.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_end: Column = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn(
            "__new",
            F.when(prev_end.isNull() | (F.col(start_col) > prev_end), 1).otherwise(
                0
            ),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(key_col, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
        )
        .drop("__island")
    )


def psi_between(
    expected: DataFrame,
    actual: DataFrame,
    band_col: str,
    count_col: str = "n",
) -> DataFrame:
    """Population Stability Index contributions between two banded count
    frames: PSI = Σ (a_i − e_i)·ln(a_i/e_i) over shares.

    Laplace-smoothed (+1 per cell after a full-outer band align) so bands
    present on only one side stay finite.  Both inputs are already
    aggregated (bands × counts — tiny), so this is pure column
    arithmetic; sum `psi_contrib` downstream for the scalar.
    """
    e = expected.select(
        band_col, F.col(count_col).cast("bigint").alias("__e_raw")
    )
    a = actual.select(
        band_col, F.col(count_col).cast("bigint").alias("__a_raw")
    )
    j = (
        e.join(a, band_col, "full_outer")
        .withColumn("__e_n", F.coalesce("__e_raw", F.lit(0)) + 1)
        .withColumn("__a_n", F.coalesce("__a_raw", F.lit(0)) + 1)
    )
    tot = j.agg(
        F.sum("__e_n").alias("__e_tot"), F.sum("__a_n").alias("__a_tot")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    e_p = d("__e_n") / d("__e_tot")
    a_p = d("__a_n") / d("__a_tot")
    return (
        j.crossJoin(F.broadcast(tot))  # 1-row scalar totals
        .select(
            band_col,
            F.coalesce("__e_raw", F.lit(0)).cast("bigint").alias("expected_n"),
            F.coalesce("__a_raw", F.lit(0)).cast("bigint").alias("actual_n"),
            F.round((a_p - e_p) * F.log(a_p / e_p), 6).alias("psi_contrib"),
        )
    )


def blocked_prefix_sum(
    df: DataFrame,
    order_col: str,
    sum_col: "str | list[str]",
    block_expr: Column,
    out_col: "str | list[str]" = "prefix_sum",
    group_cols: "list[str] | None" = None,
) -> DataFrame:
    """EXCLUSIVE running sum(s) of ``sum_col`` over the global
    ``order_col`` order, decomposed two-level so no single-partition
    pass ever sees more than one block: within-block prefix sums run
    under a partitioned window, block totals prefix-combine over the
    tiny block summary, and the carry-in joins back broadcast.  Passing
    lists computes several prefix sums in ONE decomposition (shared
    windows and one carry join).

    ``block_expr`` must be monotone non-decreasing in ``order_col``
    (e.g. ``F.floor(F.col(order_col) / width)``) and ``order_col``
    values must be unique (histogram keys) — then the result is
    identical to a global cumulative window, at any block width.

    ``group_cols`` scopes the prefix to each group (PARTITION BY
    semantics) while STILL blocking the within-group order: the carry
    window runs per (group) over that group's touched blocks (bounded by
    range/width), so even a group holding 1e8 rows — e.g. one heavily
    tied ORDER BY value — never funnels through one partition.  The
    (group, block) summary has at most one row per touched cell, <= the
    input row count; the carry join is a key equi-join (broadcast when
    ungrouped, shuffle-by-key when grouped)."""
    from lakeforge.cache import persist_tracked

    g = list(group_cols or [])
    sum_cols = [sum_col] if isinstance(sum_col, str) else list(sum_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    assert len(sum_cols) == len(out_cols)

    blocked = persist_tracked(df.withColumn("__bk", block_expr))
    w_in = (
        Window.partitionBy(*g, "__bk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = blocked
    for i, c in enumerate(sum_cols):
        within = within.withColumn(
            f"__in{i}", F.coalesce(F.sum(c).over(w_in), F.lit(0))
        )
    blk = blocked.groupBy(*g, "__bk").agg(
        *[F.sum(c).alias(f"__bt{i}") for i, c in enumerate(sum_cols)]
    )
    w_blk = (
        Window.partitionBy(*g)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = blk.select(
        *g,
        "__bk",
        *[
            F.coalesce(F.sum(f"__bt{i}").over(w_blk), F.lit(0)).alias(
                f"__carry{i}"
            )
            for i in range(len(sum_cols))
        ],
    )
    out = within.join(
        carry if g else F.broadcast(carry), [*g, "__bk"]
    )
    drop = ["__bk"]
    for i, oc in enumerate(out_cols):
        out = out.withColumn(
            oc, (F.col(f"__in{i}") + F.col(f"__carry{i}")).cast("bigint")
        )
        drop += [f"__in{i}", f"__carry{i}"]
    return out.drop(*drop)


def blocked_ntile(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_tiles: int,
    value_block: Column,
    tiebreak_block: Column,
    out_col: str = "ntile",
    n_total: "int | None" = None,
    hist_bounded: bool = False,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY value_col ASC, tiebreak_col ASC)``
    without the single-partition global sort (VERDICT r06 #2): rank =
    strict-prefix count over the VALUE HISTOGRAM (blocked) + within-tie
    rank by tiebreak (grouped-blocked, so a tie group holding 1e8 rows
    still parallelizes), and the SQL-standard tile from (rank, n):
    the first n mod k tiles get floor(n/k)+1 rows, the rest floor(n/k).
    Exact — identical to the window function for any block widths.
    Descending orders: pass the negated value.

    ``value_col`` must be integral; ``tiebreak_col`` unique within each
    value (together they form the total order).  ``value_block`` /
    ``tiebreak_block`` follow blocked_prefix_sum's monotonicity contract
    over their respective columns.

    Cost shape: the per-row pass is ONE value-histogram aggregate plus
    one hist equi-join back.  A row's tile is decided by its VALUE alone
    unless its tie group straddles a tile boundary — and at most
    n_tiles-1 groups can straddle — so the within-tie tiebreak ranking
    (the grouped-blocked pass) runs over ONLY the straddling groups'
    rows, never the full frame."""
    kk = int(n_tiles)

    # Integer div throughout (exact past 2^53, unlike double /).
    def tile_expr(rank_sql: str) -> Column:
        cut = f"((__n - __q * {kk}) * (__q + 1))"
        return F.expr(
            f"CASE WHEN ({rank_sql}) <= {cut}"
            f" THEN (({rank_sql}) - 1) div (__q + 1) + 1"
            f" ELSE (__n - __q * {kk})"
            f"      + (({rank_sql}) - {cut} - 1) div greatest(__q, 1) + 1"
            f" END"
        )

    # n is one bounded driver scalar; callers scoring several orderings
    # over one persisted frame pass it in so the chained plan isn't
    # re-executed per count.
    if n_total is None:
        n_row = df.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    else:
        n_row = df.sparkSession.range(1).select(
            F.lit(int(n_total)).cast("bigint").alias("__n")
        )
    hist = df.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__vn")
    )
    if hist_bounded:
        # Caller certifies the DISTINCT-value count is bounded by a
        # domain constant (a calendar span, a max-per-key count), not by
        # data volume — then a plain unpartitioned window over the hist
        # is the same soundness class as blocked_prefix_sum's internal
        # block-summary window, at one stage instead of five.
        w = Window.orderBy(value_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        hist = hist.withColumn(
            "__cumv", F.coalesce(F.sum("__vn").over(w), F.lit(0))
        )
    else:
        hist = blocked_prefix_sum(
            hist, value_col, "__vn", value_block, out_col="__cumv"
        )
    hist = (
        hist
        .crossJoin(F.broadcast(n_row))
        .withColumn("__q", F.expr(f"__n div {kk}"))
        # tile of the group's FIRST and LAST member: equal -> every
        # member inherits it, no tiebreak needed
        .withColumn("__tile_lo", tile_expr("__cumv + 1"))
        .withColumn("__tile_hi", tile_expr("__cumv + __vn"))
        .select(value_col, "__cumv", "__n", "__q", "__tile_lo", "__tile_hi")
    )
    from lakeforge.cache import persist_tracked

    # hist_bounded certifies a domain-constant hist -> broadcast it (the
    # post-aggregate size is unknown to Catalyst, which would plan SMJ).
    joined = persist_tracked(
        df.join(F.broadcast(hist) if hist_bounded else hist, value_col)
    )
    settled = joined.filter(
        F.col("__tile_lo") == F.col("__tile_hi")
    ).withColumn(out_col, F.col("__tile_lo").cast("bigint"))
    straddle = joined.filter(F.col("__tile_lo") != F.col("__tile_hi"))
    ranked = blocked_prefix_sum(
        straddle.withColumn("__one", F.lit(1)),
        tiebreak_col,
        "__one",
        tiebreak_block,
        out_col="__cumt",
        group_cols=[value_col],
    ).drop("__one")
    resolved = ranked.withColumn(
        out_col, tile_expr("__cumv + __cumt + 1").cast("bigint")
    ).drop("__cumt")
    return settled.unionByName(resolved).drop(
        "__cumv", "__vn", "__n", "__q", "__tile_lo", "__tile_hi"
    )
