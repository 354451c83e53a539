"""Invariant tests for the round-9 wave operators (oracle equality is
covered by tools/check_oracle.py; these pin the semantic properties a
hash compare can't express: bridges that tie out, allocations that sum
exactly, FastSS recall, MMR's greedy recurrence)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakeforge import workload_r9 as w

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata absent"
)


def test_pvm_bridge_ties_out(spark):
    """volume + price/mix == delta for every nation — a bridge that does
    not tie out is a wrong bridge, whatever the components say."""
    rows = w.q_revenue_bridge_pvm(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.volume_effect_e4 + r.price_mix_effect_e4 == r.delta_e4
        assert r.delta_e4 == r.rev97_e4 - r.rev96_e4


def test_largest_remainder_sums_exactly(spark):
    """The whole point of Hamilton allocation: bps sums to EXACTLY
    10000, and nobody deviates from their floor share by more than 1."""
    rows = w.q_bps_largest_remainder(spark, SF_DIR).collect()
    assert sum(r.bps for r in rows) == 10_000
    for r in rows:
        assert r.bps - r.floor_bps in (0, 1)


def test_scd4_versions_dense_and_single_current(spark):
    rows = w.q_scd4_order_versions(spark, SF_DIR).collect()
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, rs in by_cust.items():
        versions = sorted(x.version for x in rs)
        assert versions == list(range(1, len(rs) + 1)), cust
        assert sum(1 for x in rs if x.is_current) == 1, cust
        cur = next(x for x in rs if x.is_current)
        assert cur.version == len(rs)


def test_kanon_ladder_monotone_and_single_choice(spark):
    """Generalizing can only merge groups: min size is monotone up the
    ladder; exactly one level is chosen and it is the minimal k-ok one."""
    rows = sorted(
        w.q_kanon_generalization_ladder(spark, SF_DIR).collect(),
        key=lambda r: r.level,
    )
    assert [r.level for r in rows] == [0, 1, 2, 3]
    for a, b in zip(rows, rows[1:]):
        assert b.min_group_size >= a.min_group_size
        assert b.n_groups <= a.n_groups
    chosen = [r for r in rows if r.is_chosen]
    assert len(chosen) == 1
    assert chosen[0].k_ok
    for r in rows:
        if r.level < chosen[0].level:
            assert not r.k_ok


def test_interarrival_gap_count_matches_orders(spark):
    """Gaps = orders - customers (each customer contributes n-1 gaps)."""
    rows = w.q_order_interarrival_profile(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert r.min_gap_days <= r.max_gap_days
        assert (
            r.min_gap_days * 1_000_000
            <= r.mean_gap_microdays
            <= r.max_gap_days * 1_000_000
        )


def test_single_source_risk_bounds(spark):
    for r in w.q_single_source_risk(spark, SF_DIR).collect():
        assert 0 <= r.n_single_sourced <= r.n_parts
        assert 0 <= r.single_spend_cents <= r.spend_cents
        assert 0 <= r.single_spend_ppm <= 1_000_000


def test_word_burstiness_bounds(spark):
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = w.q_word_burstiness(spark, SF_DIR).collect()
    assert 0 < len(rows) <= w._BURST_V
    for r in rows:
        assert 1 <= r.n_docs_with <= n_docs
        assert r.total_count >= r.n_docs_with
        # VMR >= the under-dispersion bound 0 and equals
        # (N*Sx2 - Sx^2)/(N*Sx) which is < Sx always
        assert r.vmr_ppm >= 0


def test_source_vocab_overlap_jaccard_bounds(spark):
    rows = w.q_source_vocab_overlap(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_inter <= r.n_union
        assert 0 < r.jaccard_ppm <= 1_000_000
        assert r.source_a < r.source_b


def test_fastss_recall_matches_naive_ld1(spark):
    """FastSS recall is provably 1.0: the deletion-neighborhood join
    must find EXACTLY the naive all-pairs LD<=1 set."""
    got = {
        (r.name_a, r.name_b)
        for r in w.q_fuzzy_name_ld1_pairs(spark, SF_DIR).collect()
    }
    names = [
        r.p_name
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_name").distinct().collect()
    ]

    def ld(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    naive = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if ld(*sorted((a, b))) <= 1
    }
    naive = {tuple(sorted(p)) for p in naive}
    assert got == naive


def test_rrf_fusion_ranks_and_scores(spark):
    rows = w.q_rrf_hybrid_search(spark, SF_DIR).collect()
    assert 0 < len(rows) <= w._RRF_OUT
    for r in rows:
        expect = 0
        if r.bm25_rank > 0:
            assert 1 <= r.bm25_rank <= w._RRF_LIST
            expect += 1_000_000 // (w._RRF_K + r.bm25_rank)
        if r.cos_rank > 0:
            assert 1 <= r.cos_rank <= w._RRF_LIST
            expect += 1_000_000 // (w._RRF_K + r.cos_rank)
        assert r.rrf_micros == expect
    scores = [r.rrf_micros for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_mmr_greedy_recurrence(spark):
    """Re-run the greedy argmin in pure Python over the micro-int
    vectors and demand the identical pick sequence."""
    got = [
        (r.rank_k, r.vec_id, r.d2_to_query)
        for r in w.q_mmr_diverse_topk(spark, SF_DIR).collect()
    ]
    import math

    def half_up(v: float) -> int:
        # Spark/DuckDB round() is HALF-UP (away from zero); Python's
        # built-in round is banker's.
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    emb = {
        int(r.vec_id): [half_up(float(x) * 1_000_000) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    q = emb[w._MMR_QUERY_ID]
    cand = {k: v for k, v in emb.items() if k != w._MMR_QUERY_ID}
    d2q = {k: d2(v, q) for k, v in cand.items()}
    picked: list[int] = []
    expect = []
    for t in range(1, w._MMR_K + 1):
        best = min(
            (
                (
                    d2q[k]
                    - (min(d2(cand[k], cand[s]) for s in picked) if picked else 0),
                    k,
                )
                for k in cand
                if k not in picked
            )
        )
        picked.append(best[1])
        expect.append((t, best[1], d2q[best[1]]))
    assert got == expect


def test_lang_confusion_matrix_partitions_corpus(spark):
    """Cells partition the corpus exactly; row shares sum to ~1e6 per
    actual language (integral-division truncation loses < n_cells ppm)."""
    rows = w.q_lang_confusion_matrix(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n for r in rows) == n_docs
    by_actual: dict = {}
    for r in rows:
        assert r.lang_pred in ("en", "unk")
        by_actual.setdefault(r.actual_lang, []).append(r)
    for actual, rs in by_actual.items():
        total_ppm = sum(r.row_share_ppm for r in rs)
        assert 1_000_000 - len(rs) < total_ppm <= 1_000_000, actual


def test_gate_funnel_is_monotone_and_conserves(spark):
    rows = sorted(
        w.q_docs_gate_funnel(spark, SF_DIR).collect(), key=lambda r: r.gate_no
    )
    assert [r.gate_no for r in rows] == [1, 2, 3, 4]
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert rows[0].n_in == n_docs
    for r in rows:
        assert r.n_out + r.n_dropped == r.n_in
        assert 0 <= r.drop_ppm <= 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert b.n_in == a.n_out  # funnel chains


def test_skipgram_pairs_normalized_and_bounded(spark):
    rows = w.q_skipgram_pmi_pairs(spark, SF_DIR).collect()
    assert 0 < len(rows) <= w._SG_TOP_K
    lifts = [r.lift_ppm for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.wa <= r.wb  # unordered pairs normalized
        assert r.c_pair >= w._SG_MIN_PAIR
