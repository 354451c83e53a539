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
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    und = und.localCheckpoint()
    labels = und.select("a").distinct().select(
        F.col("a").alias("v"), F.col("a").alias("lbl")
    )

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
        changed = new_labels.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = new_labels.select("v", F.col("new_lbl").alias("lbl")).localCheckpoint()
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("lbl").alias("component"))
