"""Query-boundary cache release (lakeforge/cache.py).

Round-2 review: operator persists were never unpersisted, so a long-lived
session accumulated MEMORY_AND_DISK frames for its lifetime.  These tests
pin the fix — after ``release_all()`` the JVM holds zero cached RDDs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeforge import cache
from lakeforge.llm.dedup import jaccard_pairs, minhash_signatures, lsh_candidate_pairs
from lakeforge.ops.graph import connected_components


def _docs(spark, n=60):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (i, " ".join(words[(i + j) % len(words)] for j in range(8)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_release_all_drains_persisted_operators(spark):
    cache.release_all(blocking=True)
    docs = _docs(spark)
    pairs = lsh_candidate_pairs(minhash_signatures(docs, "text", "doc_id", k=8), k=8, bands=4, min_match=4)
    pairs.count()  # materialize: the tracked signature persist is now live
    jaccard_pairs(docs, "text", "doc_id", shingle_n=2).count()
    assert cache.n_cached_rdds(spark) > 0
    released = cache.release_all(blocking=True)
    assert released >= 2
    assert cache.n_cached_rdds(spark) == 0


def test_connected_components_releases_iteration_checkpoints(spark):
    cache.release_all(blocking=True)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], ["src", "dst"]
    )
    comp = connected_components(edges, "src", "dst")
    got = {(r.vertex, r.component) for r in comp.collect()}
    assert (3, 1) in got and (22, 20) in got
    # Only the tracked final-labels checkpoint may remain; stale per-
    # iteration checkpoints and the edge frame must already be gone.
    assert cache.n_cached_rdds(spark) <= 1
    cache.release_all(blocking=True)
    assert cache.n_cached_rdds(spark) == 0


def test_cc_jump_fused_checkpoint_converges_and_releases(spark):
    """r13: the per-iteration localCheckpoint is lazy and materialized BY
    the convergence count (one action per iteration).  A 40-node path
    forces ~6 pointer-jump iterations through that fused path; labels,
    early exit, and the release discipline must be unchanged."""
    from lakeforge.ops.graph import connected_components_jump

    cache.release_all(blocking=True)
    rows = [(i, i + 1) for i in range(1, 40)] + [(100, 101)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    comp = connected_components_jump(edges, "src", "dst")
    got = {(r.vertex, r.component) for r in comp.collect()}
    assert got == {(v, 1) for v in range(1, 41)} | {(100, 100), (101, 100)}
    # Only the tracked final-labels checkpoint may remain live.
    assert cache.n_cached_rdds(spark) <= 1
    cache.release_all(blocking=True)
    assert cache.n_cached_rdds(spark) == 0


def test_release_all_keeps_results_recomputable(spark):
    """A persisted (lineage-intact) operator output stays correct after
    release — re-materialization recomputes instead of failing."""
    cache.release_all(blocking=True)
    docs = _docs(spark)
    out = jaccard_pairs(docs, "text", "doc_id", shingle_n=2)
    before = out.count()
    cache.release_all(blocking=True)
    assert out.count() == before
    cache.release_all(blocking=True)
