"""Diagnose the driver's hash normalization by finding an extraction+
normalization under which exactly the driver's 12 failing queries differ
and the 38 passing ones match.

Candidate paths per engine:
  spark-collect  : df.collect() -> Row tuples (Decimal, datetime, ...)
  spark-pandas   : df.toPandas() (arrow) -> dtype-coerced values
  duck-fetchall  : con.execute(sql).fetchall() (Decimal, ...)
  duck-df        : con.execute(sql).df() -> pandas (DECIMAL -> float64)

Normalizations: str(v) per cell after sorting columns by name and rows.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from lakeforge.io.sources import TESTDATA_TABLES
from lakeforge.session import get_spark

SF = "/root/testdata/sf0.01"

DRIVER_RESULTS = json.load(open("/root/repo/CORRECTNESS_r01.json"))

# subset to diagnose: a mix of driver-pass and driver-fail
SAMPLE = [
    # driver FAIL
    "latest_order_per_customer", "pricing_summary", "events_hourly",
    "broadcast_enrich", "rank_orders_top3", "events_tier_mix",
    # driver PASS
    "top_orders", "month_scoped_agg", "scd2_orders", "events_funnel",
    "distinct_agg_priority",
]


def canon_rows(cols, rows, normfn):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(normfn(r[i]) for i in order) for r in rows)
    return out


def n_str(v):
    return str(v)


def main():
    spark = get_spark("diag")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    for name in SAMPLE:
        df = qs[name](spark, SF)
        cols = df.columns
        rows_collect = [tuple(r) for r in df.collect()]
        pdf = df.toPandas()
        rows_pandas = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

        res = con.execute(oracles[name])
        dcols = [c[0] for c in res.description]
        drows_fetch = res.fetchall()
        ddf = con.execute(oracles[name]).df()
        drows_df = [tuple(r) for r in ddf.itertuples(index=False, name=None)]

        combos = {
            "collect~fetchall": (rows_collect, drows_fetch),
            "pandas~df": (rows_pandas, drows_df),
            "collect~df": (rows_collect, drows_df),
            "pandas~fetchall": (rows_pandas, drows_fetch),
        }
        verdict = {}
        first_diff = {}
        for label, (s, d) in combos.items():
            cs = canon_rows(cols, s, n_str)
            cd = canon_rows(dcols, d, n_str)
            verdict[label] = cs == cd
            if cs != cd:
                for a, b in zip(cs, cd):
                    if a != b:
                        first_diff[label] = (a, b)
                        break
                else:
                    first_diff[label] = ("len", len(cs), len(cd))
        drv = "FAIL" if not DRIVER_RESULTS.get(name, {}).get("hash_match", True) else "pass"
        print(f"{name:32s} driver={drv} " + " ".join(
            f"{k}={'OK' if v else 'X'}" for k, v in verdict.items()))
        for k, v in first_diff.items():
            print(f"    {k} first diff:\n      spark={v[0]!r}\n      duck ={v[1]!r}"[:600])
        # dtypes
        print(f"    spark_pdf dtypes: {dict(pdf.dtypes.astype(str))}")
        print(f"    duck_df  dtypes: {dict(ddf.dtypes.astype(str))}")
    spark.stop()


if __name__ == "__main__":
    main()
