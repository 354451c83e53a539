"""Date normalization (reference: P3-P5 — bronze_to_silver.py:80-92;
SURVEY.md §2.2).

The reference's signature scalar function is a UDF-free multi-format date
parser: ``coalesce(to_date(c, fmt1), to_date(c, fmt2), ...)`` — first format
that parses wins.  We keep the exact chain (same format order) but use
``try_to_date``: Spark 4 runs with ANSI mode on, where a failed ``to_date``
throws instead of yielding NULL.  Entirely JVM-side, whole-stage-codegen
friendly, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference order (bronze_to_silver.py:82-87): first match wins.
DEFAULT_DATE_FORMATS = ("dd-MMM-yy", "yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy")


def parse_date_multi(
    col: Column | str, formats: tuple[str, ...] = DEFAULT_DATE_FORMATS
) -> Column:
    """``coalesce(try_to_date(c, f) for f in formats)`` — NULL if none parse.

    Rows whose dates parse under no format surface as NULLs and are dropped
    by the key filter (reference P2 behavior).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[F.try_to_date(c, f) for f in formats])


def month_key(col: Column | str) -> Column:
    """Derived partition key ``yyyyMM`` (reference P4: bronze_to_silver.py:90-92)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMM")
