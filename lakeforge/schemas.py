"""Enforced bronze schemas (reference: S1 — bronze_to_silver.py:28-55).

The reference reads every bronze CSV with an explicit all-nullable-string
``StructType`` and ``mode=PERMISSIVE`` — schema inference is deliberately
avoided (README.md:212): at 100 TB an inference pass is a second full scan.
These are the five reference entities; ``string_schema`` builds the same
shape for any column list.
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType


def string_schema(*cols: str) -> StructType:
    """All-nullable-string schema — the bronze contract for raw CSV."""
    return StructType([StructField(c, StringType(), True) for c in cols])


# Raw headers exactly as the reference fixtures ship them
# (tables_creation.py:6-31; note "Acc no" contains a space).
BRONZE_ACCOUNTS = string_schema("Acc no", "Date", "Status")
BRONZE_ACCOUNT_DETAILS = string_schema("Acc no", "Date", "type")
BRONZE_PERSON = string_schema("Acc no", "Person")
BRONZE_PERSON_PROFILE = string_schema("Person", "Name", "Date")
BRONZE_PERSON_IDEN = string_schema("Person", "Id", "Date")

BRONZE_SCHEMAS: dict[str, StructType] = {
    "accounts": BRONZE_ACCOUNTS,
    "account_details": BRONZE_ACCOUNT_DETAILS,
    "person": BRONZE_PERSON,
    "person_profile": BRONZE_PERSON_PROFILE,
    "person_iden": BRONZE_PERSON_IDEN,
}
