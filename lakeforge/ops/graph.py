"""Connected components via iterative min-label propagation.

The missing last step of every near-duplicate pipeline: LSH/minhash emits
PAIRS, but dedup needs CLUSTERS (keep one doc per component).  Transitive
closure is inherently iterative — no single SQL query expresses it — so
this is one of the few places the engine runs a driver-side loop around
distributed steps.

Scale design:
- Each iteration is one join + one aggregate (both shuffle by vertex id);
  iterations needed = graph diameter in label-hops (≈ log for the
  short-chain components near-dup graphs produce).
- ``localCheckpoint`` every iteration cuts the lineage — without it the
  plan doubles per iteration and planning time explodes by ~iter 10.
- Convergence check is an aggregate (count of changed labels), not a
  collect of the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 25
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``;
    component id = min vertex id in the component."""
    if max_iter < 1:
        # >=1 iteration guarantees the returned frame is checkpointed
        # (self-contained) before und's blocks are released below.
        raise ValueError("max_iter must be >= 1")
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    from lakeforge import cache

    spark = edges.sparkSession
    # localCheckpoint blocks are RDD-level caches the SQL CacheManager
    # never sees (DataFrame.unpersist is a no-op on them) — track the RDD
    # ids each eager checkpoint creates and release by id.  Round-2
    # review: every iteration's blocks lived for the whole session.
    seen = cache.rdd_ids(spark)
    und = und.localCheckpoint()
    und_ids = cache.rdd_ids(spark) - seen
    labels = und.select("a").distinct().select(
        F.col("a").alias("v"), F.col("a").alias("lbl")
    )
    prev_ids: set[int] = set()

    for _ in range(max_iter):
        # Candidate label for each vertex: min over its neighbors' labels.
        neighbor_lbl = (
            und.join(labels, und.b == labels.v)
            .groupBy("a")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_lbl, labels.v == neighbor_lbl.a, "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias(
                    "new_lbl"
                ),
                "lbl",
            )
        )
        # Checkpoint BEFORE the convergence count: the count then scans the
        # materialized blocks instead of re-running the iteration's joins
        # (counting first ran every join twice — measured ~2x per iter).
        seen = cache.rdd_ids(spark)
        mat = new_labels.localCheckpoint()
        new_ids = cache.rdd_ids(spark) - seen
        changed = mat.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = mat.select("v", F.col("new_lbl").alias("lbl"))
        # The new checkpoint is materialized — the previous iteration's
        # blocks are dead weight; release them immediately.
        cache.unpersist_rdd_ids(spark, prev_ids)
        prev_ids = new_ids
        if changed == 0:
            break
    # und's blocks are only needed while iterating; the returned labels
    # frame is self-contained (checkpointed).  Its own blocks release at
    # the caller's query boundary via the registered callback.
    cache.unpersist_rdd_ids(spark, und_ids)
    final_ids = prev_ids
    cache.track_releaser(
        lambda blocking=False: cache.unpersist_rdd_ids(spark, final_ids, blocking)
    )
    return labels.select(F.col("v").alias("vertex"), F.col("lbl").alias("component"))


def pagerank_nano(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_permille: int = 850,
) -> DataFrame:
    """PageRank in exact nano-unit integer arithmetic — (node, rank_nano).

    Rank mass is carried as bigint nano-units (1.0 == 1e9) and every step
    is integer math: contributions are ``rank div out_degree``, damping is
    ``(damping_permille * inflow) div 1000``.  Summation of integers is
    order-independent, so the result is bit-identical on any engine /
    partitioning — an iterative graph algorithm with a full value oracle
    (truncation loses < 1 nano per edge per iteration; PageRank at 1e-9
    resolution is far beyond ranking precision needs).

    Callers pass a DIRECTED edge list (duplicate both ways for undirected
    graphs).  Dangling nodes (no out-edges) contribute nothing — standard
    simplified formulation; pass symmetric edges to avoid mass loss.
    The OUTPUT is restricted to nodes with at least one in-edge: after the
    first iteration ranks are rebuilt from inflow, so source-only nodes
    (out-edges only) drop out of the result.  Exact for the symmetric-edge
    usage (every node has an in-edge); union the base rank back in if
    source-only nodes must appear.  An empty edge frame raises — there is
    no graph to rank (round-3 ADVICE: was an opaque ZeroDivisionError).

    Scale design:
    - Per iteration: one shuffle-by-src join (rank onto edges-with-degree)
      and one shuffle-by-dst partial-sum aggregate — O(E) each, the
      textbook distributed PageRank shape.  The degree-annotated edge list
      is computed once and persisted (query-boundary release), not rebuilt
      per iteration.
    - The iteration count is fixed and small (power iteration converges
      geometrically at `damping` rate); no driver-side convergence collect.
    - N (node count) is a single driver-side scalar aggregate, the same
      bounded pattern as connected_components' convergence count.
    """
    from lakeforge import cache

    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    ed = cache.persist_tracked(
        edges.join(out_deg, src).select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "deg"
        )
    )
    nodes = ed.select(F.col("e_src").alias("node")).distinct()
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_nano: empty edge frame — no nodes to rank")
    init = 1_000_000_000 // n
    base = (1000 - damping_permille) * 1_000_000_000 // (1000 * n)
    ranks = nodes.withColumn("rank_nano", F.lit(init).cast("bigint"))
    for _ in range(iters):
        inflow = (
            ed.join(ranks, ed.e_src == ranks.node)
            .select("e_dst", F.expr("rank_nano div deg").alias("contrib"))
            .groupBy("e_dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = inflow.select(
            F.col("e_dst").alias("node"),
            (
                F.lit(base).cast("bigint")
                + F.expr(f"({damping_permille} * inflow) div 1000")
            ).alias("rank_nano"),
        )
    return ranks
