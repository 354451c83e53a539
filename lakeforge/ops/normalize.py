"""Bronze -> Silver normalization (reference: P1-P4 —
bronze_to_silver.py:115-173; SURVEY.md §2.2).

One declarative op replaces the reference's five hand-written
rename/cast/filter chains.  Everything stays in whole-stage codegen; the
not-null key filter sits directly above the scan so Catalyst pushes it into
the reader.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeforge.functions.dates import DEFAULT_DATE_FORMATS, month_key, parse_date_multi


@dataclass(frozen=True)
class EntitySpec:
    """Declarative normalization recipe for one raw entity.

    rename: raw column -> canonical column (reference P1)
    date_cols: canonical columns to run the multi-format parser on (P3)
    key_cols: canonical columns required non-null (P2) — unparseable dates
        in key positions drop the row, matching the reference
    partition_from: if set, (source_date_col, partition_col) derives the
        ``yyyyMM`` partition key (P4)
    """

    rename: dict[str, str]
    date_cols: tuple[str, ...] = ()
    key_cols: tuple[str, ...] = ()
    partition_from: tuple[str, str] | None = None
    date_formats: tuple[str, ...] = field(default=DEFAULT_DATE_FORMATS)


def require_keys(df: DataFrame, cols: tuple[str, ...] | list[str]) -> DataFrame:
    """Conjunctive not-null filter on key columns (reference P2)."""
    pred: Column | None = None
    for c in cols:
        term = F.col(c).isNotNull()
        pred = term if pred is None else (pred & term)
    return df.filter(pred) if pred is not None else df


def normalize_entity(df: DataFrame, spec: EntitySpec) -> DataFrame:
    """Apply rename -> date parse -> key filter -> partition key derivation."""
    out = df.select(
        *[F.col(raw).alias(canon) for raw, canon in spec.rename.items()]
    )
    for c in spec.date_cols:
        out = out.withColumn(c, parse_date_multi(F.col(c), spec.date_formats))
    out = require_keys(out, spec.key_cols)
    if spec.partition_from is not None:
        src, part = spec.partition_from
        out = out.withColumn(part, month_key(src))
    return out


# The five reference entities (bronze_to_silver.py:115-173).
REFERENCE_ENTITIES: dict[str, EntitySpec] = {
    "accounts": EntitySpec(
        rename={"Acc no": "acc_no", "Date": "date", "Status": "status"},
        date_cols=("date",),
        key_cols=("acc_no", "date", "status"),
        partition_from=("date", "p_ym"),
    ),
    "account_details": EntitySpec(
        rename={"Acc no": "acc_no", "Date": "date", "type": "type"},
        date_cols=("date",),
        key_cols=("acc_no", "date", "type"),
        partition_from=("date", "p_ym"),
    ),
    "person": EntitySpec(
        rename={"Acc no": "acc_no", "Person": "person"},
        key_cols=("acc_no", "person"),
    ),
    "person_profile": EntitySpec(
        rename={"Person": "person", "Name": "name", "Date": "date"},
        date_cols=("date",),
        key_cols=("person", "name", "date"),
        partition_from=("date", "p_ym"),
    ),
    "person_iden": EntitySpec(
        rename={"Person": "person", "Id": "id", "Date": "date"},
        date_cols=("date",),
        key_cols=("person", "id", "date"),
        partition_from=("date", "p_ym"),
    ),
}
