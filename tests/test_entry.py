from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"), reason="driver testdata absent"
)
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "cust_status_sk", "o_custkey", "o_orderstatus",
        "effective_start_date", "effective_end_date", "is_current",
    ]


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"
