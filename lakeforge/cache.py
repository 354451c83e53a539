"""Session-scoped cache registry: query-boundary release of operator persists.

Several operators persist an intermediate that BOTH sides of a self-join (or
several downstream branches) consume — without the persist the shared plan
runs 2-3x (see lakeforge/llm/dedup.py docstrings).  The persist cannot be
released inside the operator: the output is lazy, so the cache must survive
until the *caller* materializes it.  Round-2 review found the flip side:
nothing ever unpersisted, so a long-lived session (the 60-query bench, an
interactive engine session) accumulated MEMORY_AND_DISK frames for its whole
lifetime — steady cache pressure that degrades every later query.

The fix is a registry with query-boundary scope:

- operators call :func:`persist_tracked` (persist + register) or
  :func:`track` (register an already-materialized frame, e.g. a
  ``localCheckpoint``);
- the caller invokes :func:`release_all` after materializing each query's
  result (bench.py between queries, tools/check_oracle.py per query,
  tests via fixture).

Correctness is unaffected by an early release of a *persisted* frame —
lineage is intact, a re-materialization just recomputes.  Frames registered
via :func:`track` (localCheckpoints, lineage truncated) must not be re-read
after release; ``release_all`` is strictly a query-boundary operation.

At 100 TB the same discipline matters more, not less: executor storage
memory reclaimed between queries is what keeps a multi-tenant cluster's
shuffle/storage split stable across a long job DAG.
"""

from __future__ import annotations

from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Items are ("df", DataFrame) — released via DataFrame.unpersist — or
# ("fn", callable(blocking)) for caches the SQL CacheManager can't see
# (localCheckpoint blocks are RDD-level; DataFrame.unpersist is a no-op
# on them, so they release by RDD id — see rdd_ids/unpersist_rdd_ids).
_TRACKED: list[tuple[str, DataFrame | Callable[[bool], None]]] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and register it for the next :func:`release_all`."""
    _TRACKED.append(("df", df.persist(level)))
    return df


def track_releaser(fn: Callable[[bool], None]) -> None:
    """Register a release callback (e.g. RDD-id unpersist for a
    localCheckpoint) to run at the next :func:`release_all`."""
    _TRACKED.append(("fn", fn))


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released.

    Call at a query boundary — after the current query's result has been
    fully materialized and before the next query runs.
    """
    n = len(_TRACKED)
    for kind, item in _TRACKED:
        try:
            if kind == "df":
                item.unpersist(blocking)
            else:
                item(blocking)
        except Exception:  # session already stopped / frame gone
            pass
    _TRACKED.clear()
    return n


def rdd_ids(spark) -> set[int]:
    """Ids of RDDs with cached blocks right now (includes localCheckpoint
    storage, which the SQL-level catalog/unpersist APIs can't address)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def unpersist_rdd_ids(spark, ids: set[int], blocking: bool = False) -> None:
    """Release the cached blocks of specific RDD ids — the only handle a
    ``localCheckpoint`` leaves once the DataFrame wrapper is out of scope."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in jmap.keySet().toArray():
        if int(k) in ids:
            jmap.get(k).unpersist(blocking)


def checkpoint_eager(df: DataFrame) -> tuple[DataFrame, set[int]]:
    """Eager ``localCheckpoint`` returning ``(checkpointed_df, new_rdd_ids)``.

    For TERMINAL checkpoints — a frame checkpointed only to break a
    read->overwrite lineage and consumed by exactly one following write
    action — the caller unpersists the returned ids immediately after the
    write (``unpersist_rdd_ids``), so the blocks never outlive the query
    (VERDICT r06 #1: three such sites leaked for the session lifetime)."""
    spark = df.sparkSession
    before = rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    return out, rdd_ids(spark) - before


def n_cached_rdds(spark) -> int:
    """Number of RDDs the JVM currently holds cached blocks for — the
    between-queries leak probe (0 after release_all + ContextCleaner)."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()
