"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``lakeforge/`` (see SURVEY.md §2 for the
operator inventory each query exercises); this module only adapts them to
the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakeforge import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SCD2 dimension over orders at sf0.001 (SURVEY.md §7 step 2).

    Exercises scan, projection, date cast, deterministic dedup, LAG change
    detection, LEAD interval close, NULL-unsafe change filter, sentinel end
    date, is_current flag, and content-hash surrogate keys in one query.
    """
    return workload.q_scd2_orders(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/aliases)."""
    return dict(workload.ORACLE_SQL)
