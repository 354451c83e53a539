"""List, for every registered query, the terminal DECIMAL columns (schema
only — no execution) so the boundary canonicalization knows what to cast."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import DecimalType

from lakeforge import workload
from lakeforge.session import get_spark


def main():
    spark = get_spark("schema-scan")
    out = {}
    # RAW (pre-canonicalization) queries: the driver-facing registry has
    # already had its decimals cast to double, so scanning it finds nothing.
    for name, fn in workload.RAW_QUERIES.items():
        try:
            df = fn(spark, "/root/testdata/sf0.001")
            decs = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
            if decs:
                out[name] = decs
        except Exception as e:
            print(f"ERR {name}: {e}", file=sys.stderr)
    for name, decs in out.items():
        print(f'    "{name}": {decs!r},')
    spark.stop()


if __name__ == "__main__":
    main()
