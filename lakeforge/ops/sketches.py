"""Count-min sketch heavy hitters — deterministic, oracle-checkable.

A count-min sketch summarizes per-key frequencies in a FIXED-SIZE counter
grid (depth x width): each occurrence increments one counter per depth row
(bucket = hash_d(key) % width); a key's estimate is the MIN over its depth
counters — an overestimate, never an under-estimate.  At 100 TB the grid
is the point: counters aggregate with map-side combine down to depth*width
rows (here 4 x 1024 = 4096) regardless of key cardinality, the grid
broadcasts anywhere, and two grids MERGE by element-wise addition —
re-aggregatable across partitions, days, or clusters like the HLL rollup
(workload_rel.q_hll_union_regions).

Hashes are md5-derived (functions/keys.py) so the sketch is bit-identical
in any engine — the DuckDB oracle rebuilds the same grid and the same
estimates, making an approximate structure value-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeforge.functions.keys import md5_int

CMS_DEPTH = 4
CMS_WIDTH = 1024
_SALT = "cms"


def _bucket(key_col, depth: int):
    return F.pmod(md5_int(key_col, F.lit(_SALT), F.lit(depth)), F.lit(CMS_WIDTH))


def count_min_counters(df: DataFrame, key: str) -> DataFrame:
    """(depth, bucket, n) counter grid — at most CMS_DEPTH*CMS_WIDTH rows.

    The explode multiplies rows by CMS_DEPTH *before* the shuffle, but
    map-side partial aggregation collapses each partition's contribution
    to <= 4096 rows, so the exchange moves O(grid), not O(rows)."""
    entries = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col(key), d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("e")
    )
    return entries.groupBy("e.depth", "e.bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def count_min_heavy_hitters(
    df: DataFrame, key: str, threshold: int
) -> DataFrame:
    """Keys whose count-min ESTIMATE >= threshold, with the exact count
    alongside (est_n >= exact_n always; equality when no collision).

    Distinct keys fan out to CMS_DEPTH probe rows and join the BROADCAST
    counter grid — the probe never shuffles by bucket.  The exact count
    rides the same groupBy that produced the distinct keys, so the whole
    operator is: one shuffle (key agg) + one broadcast join."""
    keys = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_n")
    )
    grid = count_min_counters(df, key)
    probes = keys.select(
        "k",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col("k"), d).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            F.broadcast(grid),
            (F.col("p.depth") == F.col("depth")) & (F.col("p.bucket") == F.col("bucket")),
        )
        .groupBy("k", "exact_n")
        .agg(F.min("n").cast("bigint").alias("est_n"))
    )
    return est.filter(F.col("est_n") >= threshold).select(
        F.col("k"), F.col("est_n"), F.col("exact_n")
    )
