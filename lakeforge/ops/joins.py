"""Join operators (reference: J1-J3 — gold_sql_to_postgres.py:82-92,
128-138, 185-195; SURVEY.md §2.4).

Only semantics that aren't a bare ``df.join`` get a wrapper:

- J1 broadcast left equi-join: dimension-sized right side shipped to every
  executor — zero shuffle of the (huge) left side.
- J2 full-outer with key coalescing: aligns two timelines into one.
- J3 temporal/interval (as-of) join: equi-key + point-in-interval.  Catalyst
  plans the equi-keys as the join keys (SMJ or, with a broadcast dim, BHJ)
  and evaluates the BETWEEN as a post-join residual — no custom operator
  needed, and at scale the shuffle is by the equi-key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_left_join(
    left: DataFrame, right: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Reference J1: ``/*+ BROADCAST(d) */`` as an explicit hint.

    AQE would often convert anyway; the explicit hint removes the dependence
    on stats when we KNOW the right side is dim-sized.
    """
    return left.join(F.broadcast(right), on=on, how=how)


def full_outer_coalesce(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "full_outer",
) -> DataFrame:
    """Reference J2: full-outer on the key columns with COALESCE key
    resolution (gold_sql_to_postgres.py:131-132).

    Spark's list-form ``on`` already emits a single coalesced key column for
    full-outer joins, which is exactly the reference's COALESCE(p1.k, p2.k).
    """
    return left.join(right, on=on, how=how)


def resolve_interval_key(
    fact: DataFrame,
    dim: DataFrame,
    key: list[str],
    at_col: str,
    start_col: str = "effective_start_date",
    end_col: str = "effective_end_date",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Reference J3: as-of lookup of the dim version valid at ``fact.at_col``.

    Returns fact columns + all non-key dim columns of the matching version.
    SCD2 intervals are non-overlapping per key, so at most one dim row
    matches — row count is preserved for how='left'.

    broadcast_dim=True is right whenever the dimension fits in executor
    memory (the common case); set False to let AQE pick SMJ for huge dims.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    fa, da = fact.alias("f"), d.alias("d")
    cond = None
    for k in key:
        term = F.col(f"f.{k}") == F.col(f"d.{k}")
        cond = term if cond is None else (cond & term)
    cond = cond & F.col(f"f.{at_col}").between(
        F.col(f"d.{start_col}"), F.col(f"d.{end_col}")
    )
    joined = fa.join(da, on=cond, how=how)
    dim_payload = [c for c in dim.columns if c not in set(key)]
    return joined.select(
        *[F.col(f"f.{c}") for c in fact.columns],
        *[F.col(f"d.{c}").alias(c) for c in dim_payload],
    )
