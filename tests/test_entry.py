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


def test_registry_is_complete_and_callable():
    """Every query is a 2-arg callable; only genuinely non-SQL ops may lack
    an oracle (each must be justified here)."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    no_oracle = set(qs) - set(oracles)
    # every registry entry is oracle-checked (sketch_profile emits exact
    # answers + error-bound assertions precisely so it can be)
    assert not no_oracle, no_oracle
    import inspect

    for name, fn in qs.items():
        assert callable(fn), name
        assert len(inspect.signature(fn).parameters) == 2, name


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"), reason="driver testdata absent"
)
def test_all_queries_run_at_smallest_sf(spark):
    """Every registered query must at least plan+execute at sf0.001 with
    unique column names (the driver's compare sorts columns by name)."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert len(set(df.columns)) == len(df.columns), f"{name}: dup columns"
        df.limit(5).collect()
