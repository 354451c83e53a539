"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB against the same parquet tables, then compares row count, column
names, and an order-insensitive multiset of normalized rows (columns sorted
by name — the driver's documented comparison).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from lakeforge.io.sources import TESTDATA_TABLES
from lakeforge.session import get_spark


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", round(v, 9))
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" "))
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _strict_norm(v):
    """Driver-sim normalization (tools/diag_hash.py evidence, r01):
    the driver extracts Spark rows as Python objects (Decimal survives)
    and DuckDB rows via pandas (DECIMAL -> float64), tolerates temporal
    representation differences (date vs midnight-datetime passed), and is
    STRICT on numeric rendering (Decimal('134.60') vs 134.6 failed).  So:
    normalize temporal + containers, render everything else with str()."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float) and math.isnan(v):
        return "<null>"  # outer-join NaN from pandas == SQL NULL
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        v = v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
        v = v.replace(tzinfo=None)
        if v.time() == dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_strict_norm(x) for x in v) + "]"
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, np.generic):
        return str(v.item())
    return str(v)


def compare_strict(spark_pdf, duck_pdf) -> list[str]:
    """Order-insensitive strict comparison of the two pandas frames,
    columns sorted by name — the driver-hash simulation."""
    cols = sorted(spark_pdf.columns)
    if sorted(duck_pdf.columns) != cols:
        return [f"strict: columns differ {cols} vs {sorted(duck_pdf.columns)}"]
    s = sorted(
        tuple(_strict_norm(v) for v in row)
        for row in spark_pdf[cols].itertuples(index=False, name=None)
    )
    d = sorted(
        tuple(_strict_norm(v) for v in row)
        for row in duck_pdf[cols].itertuples(index=False, name=None)
    )
    if s != d:
        n_bad = sum(1 for a, b in zip(s, d) if a != b) + abs(len(s) - len(d))
        out = [f"STRICT values differ ({n_bad} rows)"]
        for a, b in zip(s, d):
            if a != b:
                out.append(f"  strict first diff:\n   spark={a}\n   duck ={b}")
                break
        return out
    return []


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    # repr-keyed sort: None vs tuple has no <, but both sides use the
    # same normalization so any consistent total order works.
    s = sorted((tuple(_norm(r[i]) for i in order) for r in spark_rows), key=repr)
    d = sorted((tuple(_norm(r[i]) for i in dorder) for r in duck_rows), key=repr)
    if s != d:
        n_bad = sum(1 for a, b in zip(s, d) if a != b) + abs(len(s) - len(d))
        problems.append(f"values differ ({n_bad} mismatched rows of {max(len(s), len(d))})")
        for a, b in list(zip(s, d))[:2000]:
            if a != b:
                problems.append(f"  first diff:\n   spark={a}\n   duck ={b}")
                break
    return problems


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    results: dict[str, dict] = {}
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            import pandas as pd

            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = df.collect()
            # Build the strict-compare frame from the SAME collected rows
            # (one Spark job, not two).  Pandas' default inference mirrors
            # the arrow toPandas path where it matters: ints-with-NULLs
            # become float64 (both engines render 11415.0), ints without
            # stay int64, and Decimal/date/bool columns stay objects — the
            # discriminating representations the driver sees.
            spark_pdf = pd.DataFrame(
                [tuple(r) for r in spark_rows], columns=spark_cols
            )
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        finally:
            # Query boundary: release operator persists (lakeforge/cache.py)
            # so an 86-query run doesn't accumulate session-lifetime caches.
            from lakeforge.cache import release_all

            release_all()
        t1 = time.time()
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(spark_rows)} ({t1 - t0:.1f}s) [rows-only check]")
            if len(spark_rows) == 0:
                print(f"  WARNING: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [c[0] for c in res.description]
            duck_rows = res.fetchall()
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        problems += compare_strict(spark_pdf, duck_pdf)
        results[name] = {
            "rows": len(spark_rows),
            "oracle_rows": len(duck_rows),
            "values_match": not problems,
            "strict_match": not any("STRICT" in p or "strict" in p for p in problems),
            "spark_sec": round(t1 - t0, 2),
        }
        if problems:
            print(f"FAIL {name} (spark {t1 - t0:.1f}s):")
            for p in problems:
                print(f"  {p}")
            failed.append(name)
        else:
            print(f"OK   {name}: rows={len(spark_rows)} (spark {t1 - t0:.1f}s, duck {time.time() - t1:.1f}s)")
    spark.stop()
    if json_out:
        import json

        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "results": results}, fh, indent=1, sort_keys=True)
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall queries match oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
