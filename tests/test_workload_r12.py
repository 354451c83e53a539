"""Invariant tests for the round-12 operators (VERDICT r11 #5/#6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeforge import workload_r12 as w

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# docs_shared_substrings / docs_substring_coverage — planted corpus
# ---------------------------------------------------------------------------


def _plant_corpus(spark, tmp_path):
    """Three docs: 1 and 2 share EXACTLY one verbatim 10-token passage
    (at different positions), 3 shares nothing.  All filler tokens are
    doc-unique so no accidental anchors exist."""
    passage = " ".join(f"shared{i}" for i in range(10))

    def filler(doc: int, n: int, tag: str) -> str:
        return " ".join(f"d{doc}{tag}{i}" for i in range(n))

    docs = [
        (1, f"{filler(1, 7, 'a')} {passage} {filler(1, 5, 'b')}"),
        (2, f"{filler(2, 3, 'a')} {passage} {filler(2, 11, 'b')}"),
        (3, filler(3, 30, "a")),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_shared_substrings_planted_exact(spark, tmp_path):
    d = _plant_corpus(spark, tmp_path)
    rows = w.q_docs_shared_substrings(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    # 10 shared tokens -> 6 consecutive 5-gram anchors -> one run of 10
    assert r.longest_shared_tokens == 10
    assert r.n_shared_runs == 1
    assert r.shared_token_mass == 10


def test_substring_coverage_planted_exact(spark, tmp_path):
    d = _plant_corpus(spark, tmp_path)
    rows = {r.doc_id: r for r in w.q_docs_substring_coverage(spark, d).collect()}
    assert set(rows) == {1, 2}
    # doc 1: 7 + 10 + 5 = 22 tokens, 10 covered
    assert rows[1].n_tokens == 22 and rows[1].covered_tokens == 10
    assert rows[1].coverage_ppm == 10 * 1_000_000 // 22
    # doc 2: 3 + 10 + 11 = 24 tokens, 10 covered
    assert rows[2].n_tokens == 24 and rows[2].covered_tokens == 10
    assert rows[2].coverage_ppm == 10 * 1_000_000 // 24


def test_shared_substrings_real_corpus_invariants(spark):
    rows = w.q_docs_shared_substrings(spark, SF_DIR).collect()
    assert rows  # the synthetic corpus does contain long verbatim overlaps
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.longest_shared_tokens >= w._SS_MIN_RUN
        assert r.n_shared_runs >= 1
        assert r.shared_token_mass >= r.longest_shared_tokens


def test_substring_coverage_real_corpus_invariants(spark):
    rows = w.q_docs_substring_coverage(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.covered_tokens <= r.n_tokens
        assert 0 < r.coverage_ppm <= 1_000_000
    # every covered doc appears in at least one shared-substring pair
    pair_docs = set()
    for p in w.q_docs_shared_substrings(spark, SF_DIR).collect():
        pair_docs.update((p.doc_a, p.doc_b))
    assert {r.doc_id for r in rows} == pair_docs


# ---------------------------------------------------------------------------
# crossmodal_image_video_match / crossmodal_asset_clusters
# ---------------------------------------------------------------------------


def test_crossmodal_containment_identity(spark):
    """Frame k of video d is seeded d*8+k = the image-fixture gray of doc
    d*8+k, so EVERY unmutated doc image i must match video i // 8 at
    Hamming 0 (both decode paths fingerprint identical BMP bytes)."""
    from lakeforge.workload_r11 import _VF_NF

    rows = w.q_crossmodal_image_video_match(spark, SF_DIR).collect()
    by_pair = {(r.image_id, r.video_id): r for r in rows}
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    for i in range(n_docs):
        r = by_pair.get((i, i // _VF_NF))
        assert r is not None, f"image {i} missing from video {i // _VF_NF}"
        assert r.min_hamming == 0
        assert r.n_frames_matched >= 1


def test_crossmodal_match_schema_and_bounds(spark):
    from lakeforge.workload_r11 import _DH_MAXHAM, _VF_NF

    rows = w.q_crossmodal_image_video_match(spark, SF_DIR).collect()
    for r in rows:
        assert 0 <= r.min_hamming <= _DH_MAXHAM
        assert 1 <= r.n_frames_matched <= _VF_NF


def test_asset_clusters_census(spark):
    rows = w.q_crossmodal_asset_clusters(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.cluster_id not in seen
        seen.add(r.cluster_id)
        assert r.modality in ("image", "video")
        # parity of the min-vertex cluster id encodes the modality
        assert r.modality == ("image" if r.cluster_id % 2 == 0 else "video")
        assert r.n_assets >= 2  # every vertex comes from a dup edge
        assert r.n_linked_cross >= 0
    # both modalities produce dup clusters (exact copies exist in both
    # fixtures), and image clusters link to their containing videos
    mods = {r.modality for r in rows}
    assert mods == {"image", "video"}
    assert any(r.modality == "image" and r.n_linked_cross > 0 for r in rows)


def test_asset_clusters_linked_cross_matches_pair_report(spark):
    """n_linked_cross of an image COPY cluster must equal the distinct
    videos its member images match in the pair report."""
    matches = w.q_crossmodal_image_video_match(spark, SF_DIR).collect()
    clusters = {
        r.cluster_id: r
        for r in w.q_crossmodal_asset_clusters(spark, SF_DIR).collect()
    }
    from lakeforge.workload_r11 import _DH_COPY_MOD, _DH_COPY_OFF

    by_img: dict[int, set[int]] = {}
    for m in matches:
        by_img.setdefault(m.image_id, set()).add(m.video_id)
    # source 0 and its exact copy 0 + _DH_COPY_OFF form one image cluster
    src = 0
    assert src % _DH_COPY_MOD == 0
    cl = clusters.get(src * 2)
    assert cl is not None and cl.modality == "image"
    expect = by_img.get(src, set()) | by_img.get(src + _DH_COPY_OFF, set())
    if cl.n_assets == 2:  # exactly {source, copy} (no near-dup rep joined)
        assert cl.n_linked_cross == len(expect)
