"""Z-order data layout: multi-dimensional clustering for file skipping.

Partition pruning only helps on the partition column; queries filtering on
a SECOND dimension still scan every file.  Z-ordering interleaves the bits
of several columns into one sort key so that range-partitioning by it
co-locates rows that are close in EVERY dimension — parquet min/max footer
stats then let the reader skip most files for selective filters on any of
the z-ordered columns (the idea behind Delta's OPTIMIZE ZORDER BY; see the
Morton-curve literature).

All bit math is plain integer arithmetic, so the z-key is reproducible in
any engine (DuckDB oracle included).  Scale shape: one range-shuffle by
z-key at write time (same cost as any sorted write) buys every subsequent
selective scan a file-level skip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/Z-value: interleave the low ``bits`` bits of each column.

    Columns must already be non-negative integers scaled to [0, 2^bits)
    — quantize first (e.g. epoch-day, bucketed price).  With k columns the
    result uses k*bits bits (keep <= 63).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    k = len(cs)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits exceeds signed-64 range")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftrightunsigned(c.cast("bigint"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * k + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the z-curve of ``zcols``: range-partition
    by z-key into ``n_files`` output files, sorted within each.  Filters on
    any z-ordered column then skip files via parquet min/max stats."""
    keyed = df.withColumn("__z", zorder_key(list(zcols), bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
