"""Bounded-domain exact percentiles via counting histograms.

``F.percentile`` / SQL ``percentile_cont`` buffer and sort every group
member — fine when groups are small, a memory hazard when a group holds a
fact table's share of 100 TB.  When the VALUE DOMAIN is bounded (day gaps,
integer lags, band ids — anything calendar- or schema-bounded), the exact
percentile needs no per-row sort at all:

1. one map-side-combinable ``groupBy(group, value) -> count`` (output is
   |groups| x |domain|, independent of row count),
2. cumulative + total counts over that BOUNDED histogram (the window
   partition holds at most |domain| rows per group),
3. percentile p = the smallest value whose cumulative count reaches
   ceil(p * n), selected with one conditional aggregate.

The integral guard ``cum * 100 >= p_pct * n`` is exactly ``cum >=
ceil(p_pct/100 * n)`` for integer cum/n, so the result is the classic
discrete (type-1) percentile and is value-identical in any engine —
the DuckDB oracle twins replicate the same three steps in SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bounded_domain_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    percents: Sequence[tuple[int, str]],
) -> DataFrame:
    """Exact type-1 percentiles of ``value_col`` per group.

    ``percents``: (integer percent in 1..100, output column name) pairs.
    Also emits ``n_rows`` (the group's row count).  ``value_col`` must be
    integral and bounded-domain for the scale argument to hold.
    """
    hist = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    w_cum = Window.partitionBy(*group_cols).orderBy(value_col)
    w_all = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        F.col(value_col),
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    aggs: list[Column] = [F.max("__n").cast("bigint").alias("n_rows")]
    for pct, name in percents:
        aggs.append(
            F.min(
                F.when(
                    F.col("__cum") * 100 >= F.lit(pct) * F.col("__n"),
                    F.col(value_col),
                )
            ).cast("bigint").alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def duckdb_percentile_sql(
    source_cte: str,
    group_cols: Sequence[str],
    value_col: str,
    percents: Sequence[tuple[int, str]],
) -> str:
    """DuckDB twin of ``bounded_domain_percentiles`` — same histogram +
    cumulative + threshold steps, so results match bit-for-bit.
    ``source_cte``: SQL producing (group_cols..., value_col) rows."""
    g = ", ".join(group_cols)
    p_exprs = ",\n       ".join(
        f"CAST(MIN(CASE WHEN cum * 100 >= {pct} * n THEN {value_col} END)"
        f" AS BIGINT) AS {name}"
        for pct, name in percents
    )
    return f"""
WITH src AS ({source_cte}),
hist AS (
  SELECT {g}, {value_col}, CAST(count(*) AS BIGINT) AS c
  FROM src GROUP BY {g}, {value_col}
),
cum AS (
  SELECT {g}, {value_col},
         SUM(c) OVER (PARTITION BY {g} ORDER BY {value_col}) AS cum,
         SUM(c) OVER (PARTITION BY {g}) AS n
  FROM hist
)
SELECT {g},
       CAST(MAX(n) AS BIGINT) AS n_rows,
       {p_exprs}
FROM cum GROUP BY {g}
"""
