"""Invariant tests for the round-9 wave-3 operators (oracle equality is
covered by tools/check_oracle.py; these pin the semantic properties a
hash compare can't express: migrations that conserve customers, bands
that partition orders, error bounds the quantizer must respect)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakeforge import workload_r9b as w

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata absent"
)


def test_decile_migration_conserves_two_year_customers(spark):
    """Matrix total == customers active in BOTH years; deciles in 1..10."""
    rows = w.q_customer_decile_migration(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey", F.year("o_orderdate").alias("yr")
    )
    both = (
        o.filter(F.col("yr") == w._MIG_Y0)
        .select("o_custkey")
        .distinct()
        .join(
            o.filter(F.col("yr") == w._MIG_Y1).select("o_custkey").distinct(),
            "o_custkey",
        )
        .count()
    )
    assert sum(r.n_customers for r in rows) == both
    for r in rows:
        assert 1 <= r.decile_from <= 10 and 1 <= r.decile_to <= 10


def test_band_transitions_count_is_orders_minus_customers(spark):
    """Each customer contributes (n_orders - 1) transitions."""
    rows = w.q_order_value_band_transitions(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_orders = o.count()
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_orders - n_cust
    for r in rows:
        assert 0 <= r.band_from <= w._BAND_CAP
        assert 0 <= r.band_to <= w._BAND_CAP


def test_dedup_impact_curve_ties_to_corpus(spark):
    """sum(size*groups) == corpus rows; rows_removed == (size-1)*groups;
    the injected every-7th verbatim copies mean size-2 groups exist."""
    rows = w.q_dedup_impact_curve(spark, SF_DIR).collect()
    corpus_n = w._exactdup_corpus(spark, SF_DIR).count()
    assert sum(r.group_size * r.n_groups for r in rows) == corpus_n
    for r in rows:
        assert r.rows_removed == (r.group_size - 1) * r.n_groups
    assert any(r.group_size == 2 for r in rows)


def test_survivor_quality_shift_bounds(spark):
    """Survivors <= docs per source; TTR ppm within (0, 1e6]; dedup of
    VERBATIM copies cannot change which distinct texts exist, only their
    weights."""
    rows = w.q_dedup_survivor_quality_shift(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_survivors <= r.n_docs
        assert 0 < r.mean_ttr_all_ppm <= 1_000_000
        assert 0 < r.mean_ttr_surv_ppm <= 1_000_000


def test_fertility_at_least_one_subtoken_per_word(spark):
    """ceil(len/4) >= 1 -> fertility_ppm >= 1e6."""
    rows = w.q_tokenizer_fertility(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_subtokens >= r.n_words
        assert r.fertility_ppm >= 1_000_000


def test_sq8_error_bounded_by_cell_width(spark):
    """SQ8's absolute reconstruction error is < its cell width
    (rng/255 + 1 in micro-units) for every dimension."""
    rows = w.q_sq8_reconstruction_error(spark, SF_DIR).collect()
    ex = w._exploded_micro(spark, SF_DIR)
    spans = {
        r.pos: r.rng
        for r in ex.groupBy("pos")
        .agg((F.max("vi") - F.min("vi")).alias("rng"))
        .collect()
    }
    assert len(rows) == 64
    for r in rows:
        assert r.mean_abs_err <= r.max_abs_err
        assert r.max_abs_err <= spans[r.pos] // 255 + 1


def test_lsh_bucket_audit_ties_to_banding(spark):
    """sum(size*buckets) == docs*bands (every doc lands in every band
    exactly once)."""
    rows = w.q_lsh_bucket_skew_audit(spark, SF_DIR).collect()
    n_docs = w._neardup_corpus(spark, SF_DIR).count()
    assert sum(r.bucket_size * r.n_buckets for r in rows) == n_docs * w._LSH_BANDS
    for r in rows:
        assert r.pairs_implied == r.n_buckets * (
            r.bucket_size * (r.bucket_size - 1) // 2
        )


def test_brand_margin_depth_internal_consistency(spark):
    rows = w.q_brand_margin_depth(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expected = (r.retail_e4 - r.sell_e4) * 10_000
        # integral div truncates toward zero on both engines
        assert r.margin_depth_bps == int(expected / r.retail_e4) or (
            abs(r.margin_depth_bps - expected / r.retail_e4) < 1
        )


def test_token_rarity_bounds(spark):
    """Every token's frequency <= total -> ppb in (0, 1e9]; n_toks > 0."""
    rows = w.q_doc_mean_token_rarity(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_toks > 0
        assert 0 < r.mean_tok_freq_ppb <= 1_000_000_000


# -- wave 4 -----------------------------------------------------------------


def test_share_of_wallet_bands_partition_customers(spark):
    rows = w.q_share_of_wallet_concentration(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_buyers = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_buyers
    for r in rows:
        assert 0 <= r.share_band <= 10


def test_trade_balance_nets_to_zero(spark):
    """Every e-4 dollar exported is imported by someone: the global
    balance is exactly zero and export/import totals are equal."""
    rows = w.q_nation_trade_balance(spark, SF_DIR).collect()
    assert sum(r.balance_e4 for r in rows) == 0
    assert sum(r.export_e4 for r in rows) == sum(r.import_e4 for r in rows)
    for r in rows:
        assert r.balance_e4 == r.export_e4 - r.import_e4


def test_prefix_redundancy_covers_corpus(spark):
    rows = w.q_doc_prefix_redundancy(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.group_size * r.n_groups


def test_hapax_bounds(spark):
    rows = w.q_hapax_share_by_source(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.vocab_size
        assert 0 <= r.hapax_ppm <= 1_000_000


def test_branching_factor_covers_vocab(spark):
    """Band roll-up partitions the corpus vocabulary; successors only
    exist for tokens that appear as a bigram head."""
    rows = w.q_token_branching_factor(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from lakeforge.llm.text import tokens_col

    vocab_n = (
        docs.select(F.explode(tokens_col("text")).alias("w"))
        .select("w").distinct().count()
    )
    assert sum(r.n_tokens for r in rows) == vocab_n
    for r in rows:
        assert r.total_successors >= 0


def test_event_lift_pairs_are_ordered_and_positive(spark):
    rows = w.q_event_type_user_lift(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_both > 0
        assert r.lift_ppm > 0


def test_priority_drift_zero_in_base_year(spark):
    rows = w.q_order_priority_share_drift(spark, SF_DIR).collect()
    base = [r for r in rows if r.o_year == w._DRIFT_BASE_YEAR]
    assert base
    for r in base:
        assert r.drift_bps == 0
    # each year's shares sum to <= 10000 (integral truncation) and > 9990
    by_year: dict = {}
    for r in rows:
        by_year.setdefault(r.o_year, 0)
        by_year[r.o_year] += r.share_bps
    for yr, tot in by_year.items():
        assert 9990 < tot <= 10_000, (yr, tot)


def test_reactivation_needs_multi_order_customers(spark):
    rows = w.q_customer_reactivation(spark, SF_DIR).collect()
    for r in rows:
        assert r.n_customers <= r.n_reactivations


def test_centroid_drift_has_all_labels_and_dims(spark):
    rows = w.q_embedding_centroid_drift(spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels
    for r in rows:
        assert r.n_dims == 64
        assert r.drift_sq >= 0


def test_norm_profile_ordering_invariants(spark):
    rows = w.q_embedding_norm_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.min_norm2 <= r.mean_norm2 <= r.max_norm2
        assert r.n_vectors > 0


# -- wave 5 -----------------------------------------------------------------


def test_ship_lag_percentiles_match_sorted_definition(spark):
    """The histogram percentile equals the classic type-1 definition
    (smallest value at rank >= ceil(p*n)) computed brute-force."""
    rows = {
        r.o_orderpriority: r
        for r in w.q_ship_lag_percentiles(spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lag = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("lag"),
        )
        .collect()
    )
    by_p: dict = {}
    for r in lag:
        by_p.setdefault(r.o_orderpriority, []).append(r.lag)
    import math

    for p, vals in by_p.items():
        vals.sort()
        n = len(vals)
        got = rows[p]
        assert got.n_rows == n
        for pct, field in ((50, "p50_lag"), (90, "p90_lag"), (99, "p99_lag")):
            expect = vals[max(math.ceil(pct / 100 * n), 1) - 1]
            assert getattr(got, field) == expect, (p, pct)


def test_order_gap_percentile_ordering(spark):
    rows = w.q_order_gap_percentiles(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.median_gap <= r.p90_gap
        assert r.n_rows > 0


def test_discount_curve_shares_sum_to_one(spark):
    rows = w.q_discount_depth_curve(spark, SF_DIR).collect()
    assert {r.qty_band for r in rows} == {0, 1, 2, 3, 4}
    tot = sum(r.revenue_share_ppm for r in rows)
    assert 1_000_000 - 5 <= tot <= 1_000_000  # integral truncation
    for r in rows:
        assert 0 <= r.mean_discount_bps <= 1000


def test_length_quality_histogram_covers_docs(spark):
    rows = w.q_length_quality_histogram(spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.len_band <= 9 and 0 <= r.ttr_band <= 9


def test_simhash_histogram_superset_of_neardup_pairs(spark):
    """Banding has exact recall for hamming <= bands-1: the histogram's
    mass at hamming <= 3 equals the count of simhash_neardup pairs over
    the SAME 60-bit fingerprints (r10 rebuild).  Requires the bucket cap
    not to bind at this SF — which is itself part of the contract."""
    from lakeforge.llm.dedup import simhash_neardup_pairs

    hist = w.q_simhash_hamming_histogram(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_close = simhash_neardup_pairs(
        docs, "text", "doc_id", bits=w._SH_BITS, bands=w._SH_BANDS,
        max_hamming=3,
    ).count()
    assert sum(r.n_pairs for r in hist if r.hamming <= 3) == n_close


def test_ivf_cell_balance_partitions_vectors(spark):
    rows = w.q_ivf_cell_balance(spark, SF_DIR).collect()
    n_vec = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n_vectors for r in rows) == n_vec
    tot_bps = sum(r.share_bps for r in rows)
    assert 10_000 - len(rows) <= tot_bps <= 10_000


# -- wave 6 -----------------------------------------------------------------


def test_cohort_ltv_monotone_cumulative(spark):
    rows = w.q_cohort_ltv_curve(spark, SF_DIR).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_year, []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda x: x.age)
        assert rs[0].age == 0, cohort  # first year IS the cohort year
        for a, b in zip(rs, rs[1:]):
            assert b.cum_rev_cents >= a.cum_rev_cents


def test_ivf_recall_curve_monotone_in_nprobe(spark):
    """More probed cells can only add candidates: recall is
    non-decreasing in nprobe."""
    rows = sorted(
        w.q_ivf_recall_curve(spark, SF_DIR).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 4]
    for a, b in zip(rows, rows[1:]):
        assert b.n_hits >= a.n_hits
        assert b.recall_permille >= a.recall_permille
    assert rows[-1].recall_permille <= 1000


def test_neardup_cluster_sizes_cover_clustered_docs(spark):
    from lakeforge.workload_llm import q_neardup_clusters

    hist = w.q_neardup_cluster_sizes(spark, SF_DIR).collect()
    n_clustered = q_neardup_clusters(spark, SF_DIR).count()
    assert sum(r.n_docs for r in hist) == n_clustered
    for r in hist:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.cluster_size >= 2  # components come from pairs


def test_time_to_second_order_bounds(spark):
    rows = w.q_time_to_second_order(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.median_days <= r.p90_days
        assert r.n_rows > 0


def test_event_value_percentile_ordering(spark):
    rows = w.q_event_value_percentiles(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.p50_cents <= r.p95_cents <= r.p99_cents


# -- wave 7 -----------------------------------------------------------------


def test_lateral_topk_two_per_nation(spark):
    rows = w.q_lateral_topk_customers(spark, SF_DIR).collect()
    by_nation: dict = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r.acctbal_cents)
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    per_nation = dict(
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name").count().collect()
    )
    for nation, bals in by_nation.items():
        assert len(bals) == min(2, per_nation[nation])
        assert bals == sorted(bals, reverse=True)


def test_region_nation_shares_sum(spark):
    rows = w.q_region_nation_share(spark, SF_DIR).collect()
    by_region: dict = {}
    total_bps = 0
    for r in rows:
        by_region.setdefault(r.r_name, 0)
        by_region[r.r_name] += r.share_of_region_bps
        total_bps += r.share_of_total_bps
    for region, tot in by_region.items():
        assert 10_000 - 10 <= tot <= 10_000, region  # integral truncation
    assert 10_000 - len(rows) <= total_bps <= 10_000


def test_position_attribution_conserves_credit(spark):
    """Every attributed purchase carries exactly 1000 permille."""
    from lakeforge.io.sources import read_events
    from pyspark.sql import functions as FF

    rows = w.q_events_position_attribution(spark, SF_DIR).collect()
    total_credit = sum(r.credit_permille for r in rows)
    ev = read_events(spark, SF_DIR)
    v = ev.filter(FF.col("event_type") == "view").select(
        FF.col("user_id").alias("vu"), FF.col("ts").alias("vt")
    )
    p = ev.filter(FF.col("event_type") == "purchase").select(
        FF.col("event_id").alias("pid"),
        FF.col("user_id").alias("pu"), FF.col("ts").alias("pt"),
    )
    attributed = (
        v.join(
            p,
            (FF.col("vu") == FF.col("pu"))
            & (FF.col("pt") >= FF.col("vt"))
            & (FF.col("pt") <= FF.col("vt") + FF.expr("INTERVAL 30 MINUTES")),
        )
        .select("pid").distinct().count()
    )
    assert total_credit == attributed * 1000


def test_jaccard_sweep_monotone(spark):
    rows = sorted(
        w.q_jaccard_threshold_sweep(spark, SF_DIR).collect(),
        key=lambda r: r.threshold_permille,
    )
    assert [r.threshold_permille for r in rows] == [300, 500, 700, 900]
    for a, b in zip(rows, rows[1:]):
        assert b.n_pairs <= a.n_pairs
        assert b.n_docs <= a.n_docs
    for r in rows:
        assert r.n_docs <= 2 * r.n_pairs


# -- wave 8 -----------------------------------------------------------------


def test_reconciliation_partitions_orders(spark):
    rows = w.q_order_total_reconciliation(spark, SF_DIR).collect()
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert (
            r.n_exact + r.n_header_higher + r.n_lines_higher + r.n_no_lines
            == r.n_orders
        )
        assert 0 <= r.match_ppm <= 1_000_000


def test_duplicate_audit_finds_exactly_injected_twins(spark):
    """Each injected twin (every 97th orderkey, +3 days, same amount)
    must pair with its original; no organic pairs exist in this data."""
    rows = w.q_duplicate_order_audit(spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_twins = o.filter(F.col("o_orderkey") % 97 == 0).count()
    assert sum(r.n_suspect_pairs for r in rows) == n_twins
    for r in rows:
        assert r.n_customers <= r.n_suspect_pairs


def test_basket_sizes_cover_orders_with_lines(spark):
    rows = w.q_basket_size_by_segment(spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_orders_with_lines = li.select("l_orderkey").distinct().count()
    assert sum(r.n_orders for r in rows) == n_orders_with_lines
    assert sum(r.n_lines * r.n_orders for r in rows) == li.count()


def test_seasonal_index_sums_to_12e6_per_segment(spark):
    rows = w.q_seasonal_index_by_segment(spark, SF_DIR).collect()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, 0)
        by_seg[r.c_mktsegment] += r.index_ppm
    for seg, tot in by_seg.items():
        assert 12_000_000 - 12 <= tot <= 12_000_000, seg


def test_lsh_band_buckets_shape_and_determinism(spark):
    """Every doc lands in exactly `bands` rows; bucket hashes are
    deterministic across invocations; keep_sig carries the signature the
    pair scorer needs (the refactor shared by dedup join + audit)."""
    from lakeforge.llm.dedup import lsh_band_buckets, minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    sig = minhash_signatures(docs, "text", "doc_id", k=32, shingle_n=3)
    b1 = lsh_band_buckets(sig, k=32, bands=8)
    n_docs = docs.count()
    assert b1.count() == n_docs * 8
    per_doc = b1.groupBy("doc_id").count().collect()
    assert all(r["count"] == 8 for r in per_doc)
    h1 = sorted(map(tuple, b1.collect()))
    h2 = sorted(map(tuple, lsh_band_buckets(sig, k=32, bands=8).collect()))
    assert h1 == h2
    with_sig = lsh_band_buckets(sig, k=32, bands=8, keep_sig=True)
    assert set(with_sig.columns) == {"doc_id", "sig", "band", "bh"}
