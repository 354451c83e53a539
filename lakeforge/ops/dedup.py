"""Deduplication (reference: D1-D2 — bronze_to_silver.py:106,146,
gold_sql_to_postgres.py:68,175; SURVEY.md §2.3).

The reference's ``dropDuplicates(keys)`` keeps a NONDETERMINISTIC survivor
when duplicates differ in non-key columns.  ``dedup_keep_first`` makes the
survivor explicit: rank rows inside each key group under a total order and
keep rank 1.  Physically this is one hash-shuffle by key + in-partition sort
— the same cost as dropDuplicates' hash aggregate, and AQE splits skewed key
groups.  No global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_exact(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Row-distinct (keys=None) or key-distinct dedup.

    Safe (deterministic) when ``keys`` covers all columns — which is how the
    reference uses it (key set == full column set, SURVEY.md §2.3 D1).
    """
    return df.distinct() if keys is None else df.dropDuplicates(keys)


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[Column | str]
) -> DataFrame:
    """Deterministic dedup: keep the first row per key under ``order_by``.

    ``order_by`` must be a total order within each key group (include a
    unique tiebreak column) or the survivor is still ambiguous.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: list[str] | None = None
) -> DataFrame:
    """Keep the most recent row per key — the "rank latest rows per key"
    capability the reference README declares (README.md:200) but implements
    as dropDuplicates (SURVEY.md §2.5)."""
    order: list[Column] = [F.col(ts_col).desc()]
    for c in tiebreak or []:
        order.append(F.col(c).desc())
    return dedup_keep_first(df, keys, order)


def golden_record(
    df: DataFrame, key: str, fields: list[str]
) -> DataFrame:
    """Survivorship / master-data golden record: per key, each field's most
    frequent non-NULL value (ties break to the smallest value — fully
    deterministic, unlike the built-in ``mode()`` whose ties are
    arbitrary).

    Field-wise, not row-wise: different fields of the golden row may come
    from different source duplicates — the MDM semantics a plain
    keep-one-row dedup can't express.

    Shape: melt to (key, field, value) long form — one UNION of column
    projections, no shuffle yet — then ONE groupBy count + per-(key,field)
    argmax window + pivot back.  The exchange carries distinct
    (key, field, value) triples (map-side combined); at 100 TB that is the
    same O(rows x fields) bound as reading the table, with no all-pairs
    anything.  Values travel as strings in the melt (heterogeneous column
    types in one long column); callers re-cast typed fields on the way
    out.
    """
    long = None
    for f in fields:
        part = df.select(
            F.col(key),
            F.lit(f).alias("__field"),
            F.col(f).cast("string").alias("__value"),
        ).where(F.col(f).isNotNull())
        long = part if long is None else long.unionAll(part)
    counts = long.groupBy(key, "__field", "__value").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy(key, "__field").orderBy(
        F.col("__n").desc(), F.col("__value").asc()
    )
    best = counts.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return (
        best.groupBy(key)
        .pivot("__field", fields)
        .agg(F.first("__value"))
    )
