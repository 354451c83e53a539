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


def distinct_bitmaps(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """EXACT distinct counting as MERGEABLE state: per (group, bucket) a
    32768-bit bitmap of which values in that bucket occurred
    (`bitmap_bucket_number` / `bitmap_bit_position` /
    `bitmap_construct_agg`, Spark 3.5+).  Unlike a bare
    countDistinct, the bitmaps can be persisted and OR-merged with a
    later batch's bitmaps (`merge_distinct_bitmaps`) — exact
    incremental COUNT(DISTINCT) maintenance, the thing HLL approximates
    when exactness is negotiable and this provides when it is not.

    Scale: state size is O(distinct values / 8) bytes spread across
    buckets (4 KiB per dense bucket), partitioned by (group, bucket) —
    the merge shuffles bitmaps, never raw values."""
    per_bucket = (
        df.select(
            *group_cols,
            F.expr(f"bitmap_bucket_number({value_col})").alias("bucket"),
            F.expr(f"bitmap_bit_position({value_col})").alias("__pos"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.expr("bitmap_construct_agg(__pos)").alias("bitmap"))
    )
    return per_bucket


def merge_distinct_bitmaps(
    old: DataFrame, delta: DataFrame, group_cols: list[str]
) -> DataFrame:
    """OR-merge two bitmap states (same schema as distinct_bitmaps):
    union then bitmap_or_agg per (group, bucket)."""
    return (
        old.unionByName(delta)
        .groupBy(*group_cols, "bucket")
        .agg(F.expr("bitmap_or_agg(bitmap)").alias("bitmap"))
    )


def bitmap_distinct_counts(
    bitmaps: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Collapse bitmap state to exact per-group distinct counts."""
    return bitmaps.groupBy(*group_cols).agg(
        F.sum(F.expr("bitmap_count(bitmap)")).cast("bigint").alias("n_distinct")
    )


def count_min_join_size(a_counters: DataFrame, b_counters: DataFrame) -> DataFrame:
    """CMS inner-product estimate of an equi-join's size (Cormode &
    Muthukrishnan §4.2): |A ⋈_k B| = Σ_k fA(k)·fB(k) is estimated per
    depth by Σ_bucket cellA·cellB, taking the MIN over depths (each
    depth's estimate is upper-biased by hash collisions).

    Runs entirely on the two ≤ depth×width counter grids — the full
    tables are never joined, which is the point: at 100 TB this predicts
    a join's output size (for planning / guardrails) from two sketch
    scans that a previous pass already paid for.  Buckets absent from
    one side contribute zero via the inner join.
    """
    a = a_counters.select("depth", "bucket", F.col("n").alias("na"))
    b = b_counters.select("depth", "bucket", F.col("n").alias("nb"))
    per_depth = (
        a.join(b, ["depth", "bucket"])
        .groupBy("depth")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("ip"))
    )
    return per_depth.agg(
        F.coalesce(F.min("ip"), F.lit(0)).cast("bigint").alias("join_size_est")
    )
