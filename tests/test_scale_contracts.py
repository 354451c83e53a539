"""Physical-plan contracts for documented scale claims.

These tests pin the plan SHAPE, not timings: if a refactor silently turns
a broadcast into a corpus-wide shuffle or reintroduces a global window,
the documented 100-TB story breaks long before a benchmark notices at
test scale.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_decontaminate_broadcasts_benchmark_side(spark):
    """The benchmark shingle set must broadcast — the corpus is never
    shuffled by shingle (llm/decontam.py scale contract)."""
    from lakeforge.workload_llm import q_docs_decontaminate

    plan = _plan(q_docs_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pack_sequences_has_no_corpus_wide_global_window(spark):
    """The only unpartitioned window may run over per-chunk TOTALS (rows =
    corpus/chunk_size), never over the docs frame itself: the doc-level
    cumsum must be partitioned by chunk."""
    from lakeforge.llm.packing import pack_sequences

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n_tokens")
    )
    plan = _plan(pack_sequences(df, "n_tokens", "doc_id", 128, chunk_size=64))
    # doc-level window: partitioned by __chunk (parallel)
    assert "partitionBy=[__chunk" in plan.replace(" ", "").replace('"', "") or (
        "__chunk" in plan and "Window" in plan
    )
    # the global (unpartitioned) window input is the per-chunk aggregate,
    # which sits under a HashAggregate of __chunk — i.e. the serial stage
    # consumes chunk totals, not docs.  Verify by checking the single
    # partition exchange feeds from an aggregate.
    assert "SinglePartition" in plan
    idx = plan.index("SinglePartition")
    assert "HashAggregate" in plan[:idx]


def test_broadcast_enrich_broadcasts_both_dims(spark):
    from lakeforge.workload import QUERIES

    plan = _plan(QUERIES["broadcast_enrich"](spark, SF))
    # tree lines only ("formatted" repeats operators in the detail list)
    assert plan.count("BroadcastHashJoin LeftOuter") == 2
    assert "SortMergeJoin" not in plan


def test_repetition_score_aggregates_are_partial(spark):
    """Both aggregates must run map-side partials (partial_count/sum in
    the plan) so exchanges carry counters, not raw bigrams per row."""
    from lakeforge.workload_llm import q_docs_repetition_score

    plan = _plan(q_docs_repetition_score(spark, SF))
    assert "partial_count" in plan


def test_kmeans_assignment_broadcasts_centroids(spark):
    """k-means assignment must broadcast the k centroid rows — the corpus
    never shuffles during assignment (llm/clustering.py scale contract)."""
    from lakeforge import cache
    from lakeforge.llm.clustering import kmeans_assign, micro_embedding

    base = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        micro_embedding(F.array(*[F.rand(seed=i) for i in range(4)])).alias("vec"),
    )
    cents = base.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("cluster"), F.col("vec").alias("cvec")
    )
    plan = _plan(kmeans_assign(base, cents))
    cache.release_all()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pagerank_iteration_has_no_cartesian(spark):
    """Each PageRank iteration is equi-join + aggregate — no cartesian
    products, no global single-partition exchanges on the edge frame."""
    from lakeforge import cache
    from lakeforge.ops.graph import pagerank_nano

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src bigint, dst bigint"
    )
    plan = _plan(pagerank_nano(edges, iters=2))
    cache.release_all()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_unpivot_adds_no_exchange(spark):
    """UNPIVOT is a per-row expansion — it must not introduce a shuffle on
    top of its input aggregate."""
    from lakeforge.workload_rel import q_pivot_priority_status, q_unpivot_status_counts

    wide_plan = _plan(q_pivot_priority_status(spark, SF))
    long_plan = _plan(q_unpivot_status_counts(spark, SF))
    assert long_plan.count("Exchange") == wide_plan.count("Exchange")


def test_passage_dedup_shuffles_hashes_not_text(spark):
    """Only (doc_id, passage_hash) may shuffle — no join at all, no
    cartesian; the cut is a per-row Project (no token explode-regroup
    before the hash aggregate)."""
    from lakeforge.workload_llm import q_passage_dedup

    plan = _plan(q_passage_dedup(spark, SF))
    import re

    for bad in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan
    # the only exchanges are the hash-aggregate's (formatted plans print
    # every node twice — tree + details — so count numbered tree nodes)
    assert len(re.findall(r"Exchange \(\d+\)", plan)) <= 2


def test_quality_classifier_is_shuffle_free(spark):
    """One Project over the scan — a pre-filter must be pushable before
    any shuffle of text bytes."""
    from lakeforge.workload_llm import q_docs_quality_score

    plan = _plan(q_docs_quality_score(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_domain_cap_windows_are_two_level(spark):
    """Level 1 partitions by (group, salt bucket); level 2 re-ranks only
    survivors.  Two window operators, no global (unpartitioned) sort."""
    from lakeforge.workload_llm import q_docs_domain_cap

    import re

    plan = _plan(q_docs_domain_cap(spark, SF))
    assert len(re.findall(r"Window \(\d+\)", plan)) == 2
    assert "SinglePartition" not in plan


def test_count_min_grid_broadcasts(spark):
    """The probe side joins the 4x1024 counter grid by BROADCAST — keys
    never shuffle by bucket."""
    from lakeforge.workload_rel import q_heavy_hitter_customers

    plan = _plan(q_heavy_hitter_customers(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_is_frame_bounded(spark):
    """The EWMA window must be ROWS-bounded (state = 8 rows), never a
    growing unbounded frame."""
    from lakeforge.workload_rel import q_spend_ewma

    plan = _plan(q_spend_ewma(spark, SF))
    assert "specifiedwindowframe(RowFrame, -7, currentrow$()" in plan
    assert "unboundedpreceding" not in plan.lower()


def test_windowed_rollup_stage2_consumes_partials(spark):
    """The daily aggregate's input is the hourly HashAggregate output —
    two aggregate levels, no re-scan of raw events for stage 2."""
    from lakeforge.workload import QUERIES

    import re

    plan = _plan(QUERIES["events_windowed_rollup"](spark, SF))
    assert len(re.findall(r"Scan parquet +\(\d+\)", plan)) == 1
    assert len(re.findall(r"Exchange \(\d+\)", plan)) >= 2  # hourly + daily


def test_q21_shape_has_single_fact_join(spark):
    """sole_late_supplier: per-order counts come from a WINDOW over the
    aggregated frame — the lineitem⋈orders subtree must appear ONCE (the
    old self-join shape scanned it twice)."""
    from lakeforge.workload_rel import q_sole_late_supplier

    import re

    plan = _plan(q_sole_late_supplier(spark, SF))
    scans = len(re.findall(r"Scan parquet +\(\d+\)", plan))
    assert scans <= 3  # lineitem + orders + supplier, each once


def test_auc_global_window_sees_histogram_not_rows(spark):
    """embedding_auc's only global ordering must run AFTER the
    groupBy(score) reduction: the single-partition exchange feeding the
    window has to sit above a HashAggregate, never above the scan."""
    from lakeforge.workload_stats import q_embedding_auc

    plan = _plan(q_embedding_auc(spark, SF))
    assert "SinglePartition" in plan
    single = plan.index("SinglePartition")
    assert "HashAggregate" in plan[:single], plan[:single]


def test_grouped_auc_has_no_global_ordering(spark):
    """return_risk_auc_by_nation must use only hashpartitioned exchanges
    (partitioned window) — no single-partition exchange anywhere."""
    from lakeforge.workload_stats import q_return_risk_auc_by_nation

    plan = _plan(q_return_risk_auc_by_nation(spark, SF))
    assert "SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan
