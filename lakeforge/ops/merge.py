"""Incremental full-history CDC merge (reference: D5 —
bronze_to_silver.py:94-108; SURVEY.md §2.3, §7).

Semantics: silver keeps FULL history; each batch is unioned with existing
rows and exact duplicates (by merge key) collapse.  Initial load
short-circuits to a plain write.

Differences from the reference, all scale-motivated:

1. **Partition-scoped, not whole-table** (fixes README.md:213's false
   claim): only partitions present in the incoming batch are read back,
   merged, and rewritten via dynamic partition overwrite.  At 100 TB,
   rewriting the whole table per batch is a non-starter; rewriting the
   handful of touched ``p_ym`` months is O(batch).
2. **Deterministic survivor**: ``dedup_keep_first`` under an explicit order
   instead of ``dropDuplicates`` (D1 nondeterminism).
3. **Object-store-safe probe**: try-read instead of ``os.path.exists``.
4. **Read-overwrite cycle broken by localCheckpoint**: Spark refuses to
   overwrite a path it is reading; the merged frame is eagerly materialized
   to executor-local storage first.  Only the touched partitions
   materialize, so the checkpoint is O(batch) too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeforge.io.sinks import write_partitioned_parquet
from lakeforge.io.sources import read_parquet_if_exists
from lakeforge.ops.dedup import dedup_exact, dedup_keep_first


def merge_full_history(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
    order_by: list[Column | str] | None = None,
) -> None:
    """Merge ``new_df`` into the silver table at ``path``.

    order_by: explicit survivor order within each key group; None falls back
    to reference-compatible ``dropDuplicates`` (fine when keys cover all
    columns).
    """
    def dedup(df: DataFrame) -> DataFrame:
        return (
            dedup_keep_first(df, keys, order_by)
            if order_by
            else dedup_exact(df, keys)
        )

    existing = read_parquet_if_exists(spark, path)

    if existing is None:
        # Initial load: the batch itself still deduplicates (merge with an
        # empty table — reference collapses in-batch dupes the same way,
        # bronze_to_silver.py:106,146).
        write_partitioned_parquet(dedup(new_df), path, partition_cols, mode="overwrite")
        return

    if partition_cols:
        # Prune the read-back to partitions the batch touches: the join-free
        # way is an IN-list of the batch's (small) distinct partition tuples.
        touched = [
            tuple(r) for r in new_df.select(*partition_cols).distinct().collect()
        ]
        pred = None
        for t in touched:
            term = None
            for c, v in zip(partition_cols, t):
                cmp = F.col(c) == F.lit(v)
                term = cmp if term is None else (term & cmp)
            pred = term if pred is None else (pred | term)
        existing = existing.filter(pred) if pred is not None else existing

    merged = dedup(existing.select(*new_df.columns).unionByName(new_df))
    # Break the read->overwrite lineage; eager, executor-local, O(batch).
    merged = merged.localCheckpoint(eager=True)
    write_partitioned_parquet(merged, path, partition_cols, mode="overwrite")
