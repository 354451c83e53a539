"""k-means (llm/clustering.py) and PageRank (ops/graph.py::pagerank_nano)
invariants on small synthetic graphs/embeddings — the oracle gate checks
values on real testdata; these pin the algebraic properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeforge import cache
from lakeforge.llm.clustering import kmeans_assign, kmeans_assignments
from lakeforge.ops.graph import pagerank_nano


def _emb(spark):
    # Two tight groups far apart in 4-d: ids 0-3 near origin+x, 4-7 near +y.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [1.1, -0.1, 0.0, 0.0]),
        (3, [1.0, 0.05, 0.0, 0.0]),
        (4, [0.0, 5.0, 0.0, 0.0]),
        (5, [0.1, 5.1, 0.0, 0.0]),
        (6, [-0.1, 4.9, 0.0, 0.0]),
        (7, [0.0, 5.05, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_kmeans_separates_obvious_groups(spark):
    out = kmeans_assignments(_emb(spark), k=2, iters=2).collect()
    cache.release_all()
    by_id = {r.vec_id: r.cluster for r in out}
    assert len(by_id) == 8
    assert len({by_id[i] for i in range(4)}) == 1  # first group together
    assert len({by_id[i] for i in range(4, 8)}) == 1  # second group together
    assert by_id[0] != by_id[4]
    assert all(r.d2 >= 0 for r in out)


def test_kmeans_deterministic_across_runs(spark):
    a = sorted(map(tuple, kmeans_assignments(_emb(spark), k=2, iters=3).collect()))
    cache.release_all()
    b = sorted(map(tuple, kmeans_assignments(_emb(spark), k=2, iters=3).collect()))
    cache.release_all()
    assert a == b


def test_kmeans_assign_tie_breaks_to_lowest_cluster(spark):
    base = spark.createDataFrame(
        [(10, [0, 0])], "vec_id bigint, vec array<bigint>"
    )
    cents = spark.createDataFrame(
        [(1, [3, 4]), (0, [5, 0]), (2, [0, 5])],
        "cluster bigint, cvec array<bigint>",
    )
    r = kmeans_assign(base, cents).collect()[0]
    assert r.d2 == 25 and r.cluster == 0  # all d2=25; lowest cluster wins


def test_kmeans_releases_caches(spark):
    kmeans_assignments(_emb(spark), k=2, iters=2).count()
    cache.release_all()
    assert cache.n_cached_rdds(spark) == 0


def test_pagerank_mass_and_symmetry(spark):
    # Undirected path graph 1-2-3: symmetric ends must tie exactly.
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src bigint, dst bigint"
    )
    out = {r.node: r.rank_nano for r in pagerank_nano(edges, iters=5).collect()}
    cache.release_all()
    assert set(out) == {1, 2, 3}
    assert out[1] == out[3]  # exact integer arithmetic -> exact symmetry
    assert out[2] > out[1]  # middle node dominates
    total = sum(out.values())
    # Mass conserved up to integer-truncation loss (< 1 nano per edge/iter
    # plus the div-floor in init/base).
    assert 0.999e9 < total <= 1_000_000_000


def test_pagerank_uniform_on_regular_graph(spark):
    # 4-cycle (2-regular): PageRank is exactly uniform at every iteration.
    e = [(i, (i + 1) % 4) for i in range(4)] + [((i + 1) % 4, i) for i in range(4)]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    out = {r.node: r.rank_nano for r in pagerank_nano(edges, iters=4).collect()}
    cache.release_all()
    assert len(set(out.values())) == 1


def test_kmeans_invariant_under_repartition(spark):
    """The exactness claim: results are independent of physical layout.
    The same fit on a differently-partitioned input must be bit-identical
    (integer distances + one-double-division centroids)."""
    from lakeforge.llm.clustering import kmeans_assignments as km

    emb = _emb(spark)
    a = sorted(map(tuple, km(emb, k=2, iters=2).collect()))
    cache.release_all()
    b = sorted(map(tuple, km(emb.repartition(7), k=2, iters=2).collect()))
    cache.release_all()
    assert a == b


def test_pagerank_invariant_under_repartition(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)],
        "src bigint, dst bigint",
    )
    a = sorted(map(tuple, pagerank_nano(edges, iters=4).collect()))
    cache.release_all()
    b = sorted(map(tuple, pagerank_nano(edges.repartition(5), iters=4).collect()))
    cache.release_all()
    assert a == b


def test_bfs_depths_min_distance_and_bound(spark):
    """bfs_depths == hand-computed min hop distances; max_depth bounds the
    sweep; disconnected nodes never appear."""
    from lakeforge.ops.graph import bfs_depths

    # path 1-2-3-4-5 plus a triangle shortcut 1-3, and island 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (10, 11)], "a bigint, b bigint"
    )
    got = {r["node"]: r["depth"]
           for r in bfs_depths(edges, "a", "b", sources=[1], max_depth=4).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 3}

    shallow = {r["node"]: r["depth"]
               for r in bfs_depths(edges, "a", "b", sources=[1], max_depth=1).collect()}
    assert shallow == {1: 0, 2: 1, 3: 1}

    # multi-source: min over sources
    multi = {r["node"]: r["depth"]
             for r in bfs_depths(edges, "a", "b", sources=[1, 5], max_depth=4).collect()}
    assert multi == {1: 0, 5: 0, 2: 1, 3: 1, 4: 1}


def test_sssp_hops_matches_python_bellman_ford(spark):
    """Weighted min-cost within a hop bound == k rounds of Python
    Bellman-Ford, including a case where more hops = cheaper path."""
    from lakeforge.ops.graph import sssp_hops

    # 1 -> 2 (10 direct) but 1 -> 3 -> 4 -> 2 costs 3; node 9 unreachable
    edges = [(1, 2, 10), (1, 3, 1), (3, 4, 1), (4, 2, 1), (9, 9, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")

    def bf(max_hops):
        dist = {1: 0}
        for _ in range(max_hops):
            nd = dict(dist)
            for s, d, w in edges:
                if s in dist and dist[s] + w < nd.get(d, 1 << 60):
                    nd[d] = dist[s] + w
            dist = nd
        return dist

    for hops in (1, 2, 3):
        got = {r["node"]: r["dist"]
               for r in sssp_hops(df, "src", "dst", "w", [1], hops).collect()}
        assert got == bf(hops), hops
    # at 1 hop the direct edge wins (10); by 3 hops the cheap path (3)
    assert bf(1)[2] == 10 and bf(3)[2] == 3
