"""Invariant tests for the round-8 wave operators (oracle equality is
covered by tools/check_oracle.py; these pin the semantic properties a
hash compare can't express, plus the short-document edge cases the
driver corpus doesn't contain — the ADVICE r07 sequence(1, 0) trap)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakeforge import workload_r8 as w

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata absent"
)


def _write_docs(spark, tmp_path, texts):
    out = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_receivable_aging_partitions_open_orders(spark):
    """Buckets partition the OPEN orders exactly: counts sum to the
    filter count and every bucket label is one of the five bands."""
    rows = w.q_receivable_aging(spark, SF_DIR).collect()
    n_open = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter("o_orderstatus = 'O'")
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_open
    assert {r.age_bucket for r in rows} <= {"0-30", "31-60", "61-90", "91-180", "180+"}


def test_lead_time_sla_breach_bps_bounds(spark):
    for r in w.q_supplier_lead_time_sla(spark, SF_DIR).collect():
        assert 0 <= r.breach_bps <= 10_000
        assert r.mean_lead_days <= r.max_lead_days


def test_order_streaks_histogram_accounts_every_customer(spark):
    rows = w.q_customer_order_streaks(spark, SF_DIR).collect()
    n_cust = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(r.streak_months >= 1 for r in rows)


def test_vocab_coverage_is_monotone_and_caps_at_1e6(spark):
    rows = sorted(
        w.q_vocab_coverage_curve(spark, SF_DIR).collect(),
        key=lambda r: r.rank_v,
    )
    assert rows, "curve must be non-empty"
    last = 0
    for r in rows:
        assert r.coverage_ppm >= last
        last = r.coverage_ppm
        assert r.coverage_ppm <= 1_000_000
    # full-vocab checkpoint (if the vocab fits a checkpoint) covers all mass
    assert rows[-1].cum_mass <= rows[-1].total_tokens


def test_bigram_lift_handles_short_docs(spark, tmp_path):
    """Empty / 1-token docs must not crash the guarded bigram transform
    (ADVICE r07: sequence(1, 0) yields DESCENDING [1, 0])."""
    sf = _write_docs(
        spark, tmp_path, ["", "one", "a b", "x y x y x y", "a b a b a b"]
    )
    rows = w.q_bigram_lift_collocations(spark, sf).collect()
    pairs = {(r.w1, r.w2) for r in rows}
    # only pairs meeting the min count survive; short docs contribute none
    assert ("one", "one") not in pairs
    assert all(r.c_pair >= 3 for r in rows)


def test_readability_all_docs_scored_and_counts_positive(spark):
    df = w.q_docs_readability(spark, SF_DIR)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        "length(trim(text)) > 0"
    ).count()
    rows = df.collect()
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_words >= 1 and r.n_sents >= 1
        assert r.lix_milli >= 1000  # >= 1 word per sentence


def test_readability_empty_doc_filtered(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, ["", "   ", "real text here."])
    rows = w.q_docs_readability(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].n_sents == 1 and rows[0].n_words == 3


def test_shingle_containment_direction_and_bounds(spark, tmp_path):
    """A doc fully embedded in a bigger doc scores 1000 permille in the
    contained direction and < 1000 in the other; short docs are inert."""
    quote = "alpha beta gamma delta epsilon"
    article = quote + " zeta eta theta iota kappa llama mu nu xi omicron pi"
    sf = _write_docs(spark, tmp_path, [quote, article, "xx", ""])
    rows = w.q_shingle_containment_pairs(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    a_small = r.size_a < r.size_b
    small_dir = r.cont_a_in_b_permille if a_small else r.cont_b_in_a_permille
    big_dir = r.cont_b_in_a_permille if a_small else r.cont_a_in_b_permille
    assert small_dir == 1000  # every shingle of the quote is in the article
    assert big_dir < 1000
    assert r.shared == min(r.size_a, r.size_b)


def test_cluster_separation_labels_complete_and_ratio_positive(spark):
    rows = w.q_embedding_cluster_separation(spark, SF_DIR).collect()
    labels = {
        r.label
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("label")
        .distinct()
        .collect()
    }
    assert {r.label for r in rows} == labels
    for r in rows:
        assert r.n_vecs >= 1
        assert r.intra_msd >= 0
        assert r.min_inter_d2 >= 1
        assert r.db_ratio_ppm > 0


def test_fd_audit_key_fd_has_zero_violations(spark):
    rows = {r.fd: r for r in w.q_fd_violation_audit(spark, SF_DIR).collect()}
    assert set(rows) == {
        "s_suppkey->s_name", "p_brand->p_type",
        "o_custkey->o_orderpriority", "c_nationkey->c_mktsegment",
    }
    key_fd = rows["s_suppkey->s_name"]
    assert key_fd.n_violating == 0 and key_fd.violation_bps == 0
    for r in rows.values():
        assert 0 <= r.n_violating <= r.n_groups
        assert 0 <= r.violation_bps <= 10_000


def test_trade_edge_churn_conservation(spark):
    """kept + died = |E_y| and kept + born = |E_{y+1}|; jaccard within
    [0, 1000]."""
    for r in w.q_trade_edge_churn(spark, SF_DIR).collect():
        assert r.n_kept + r.n_died == r.n_cur
        assert r.n_kept + r.n_born == r.n_next
        assert 0 <= r.jaccard_permille <= 1000


def test_rake_phrases_contain_no_stopwords(spark):
    rows = w.q_docs_rake_keywords(spark, SF_DIR).collect()
    assert rows
    stop = set(w._RAKE_STOPWORDS)
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= w._RAKE_MAX_PHRASE
        assert not (set(words) & stop), r.phrase
        assert r.n_occurrences >= 1 and r.score_permille >= 1000


def test_clv_decay_bounded_by_undecayed_spend(spark):
    """Decayed CLV can never exceed raw spend, and weights stay
    positive (age 0-7 -> weight in (0.86, 1])."""
    from pyspark.sql import functions as F
    got = {r.c_mktsegment: r for r in w.q_customer_clv_decay(spark, SF_DIR).collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    raw = {
        r.c_mktsegment: r.total
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("cents").alias("total"))
        .collect()
    }
    min_w = (w._CLV_DECAY_NUM / w._CLV_DECAY_DEN) ** 7
    for seg, r in got.items():
        assert r.clv_cents_total <= raw[seg]
        assert r.clv_cents_total >= int(raw[seg] * min_w) - r.n_customers


def test_budget_selection_respects_budget_and_quality_order(spark):
    """Selected token mass stays within the budget, and the admission
    is quality-prefix-closed: every non-selected doc scores <= the
    minimum admitted score (modulo the deterministic doc_id tiebreak
    at the boundary score)."""
    rows = w.q_corpus_budget_selection(spark, SF_DIR).collect()
    assert rows
    total_sel = sum(r.selected_tokens for r in rows)
    assert total_sel <= w._BUDGET_TOKENS
    # recompute per-doc scores independently
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_doc = d.selectExpr(
        "doc_id",
        "filter(split(text, ' +'), x -> x <> '') AS ws",
    ).selectExpr(
        "doc_id",
        "size(ws) AS n_tokens",
        "size(array_distinct(ws)) * 1000 div size(ws) AS qscore",
    ).collect()
    bar = min(r.min_admitted_score for r in rows)
    n_total_docs = len(per_doc)
    n_selected = sum(r.n_selected for r in rows)
    assert 0 < n_selected < n_total_docs  # budget bites at sf0.001
    # all docs scoring strictly above the bar must have been admitted
    above = sum(1 for p in per_doc if p.qscore > bar)
    assert above <= n_selected
