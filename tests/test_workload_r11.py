"""Invariant tests for the round-11 operators (VERDICT r10 #6/#7)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from lakeforge import workload_r11 as w

SF_DIR = "/root/testdata/sf0.001"


def test_neardup_incremental_verdict_structure(spark):
    rows = w.q_neardup_incremental(spark, SF_DIR).collect()
    by_verdict: dict[str, list] = {}
    for r in rows:
        by_verdict.setdefault(r.verdict, []).append(r)
    assert set(by_verdict) <= {"dup_of_corpus", "dup_in_batch", "new"}
    # the fixture guarantees mass in every verdict class
    assert by_verdict.get("dup_of_corpus") and by_verdict.get("dup_in_batch")
    assert by_verdict.get("new")
    # every batch doc with a signature appears exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        if r.verdict == "new":
            assert r.partner is None
        elif r.verdict == "dup_in_batch":
            # the partner is a SMALLER batch doc
            assert r.partner is not None and r.partner < r.doc_id
        else:
            assert r.partner is not None


def test_neardup_incremental_partners_respect_split(spark):
    """dup_of_corpus partners must be CORPUS docs; dup_in_batch partners
    must be BATCH docs — the verdicts encode the ingest-time split."""
    rows = w.q_neardup_incremental(spark, SF_DIR).collect()

    def is_batch(did: int) -> bool:
        return did >= w._BTWIN_OFF or did % w._BATCH_MOD == w._BATCH_RES

    for r in rows:
        assert is_batch(r.doc_id)
        if r.verdict == "dup_of_corpus":
            assert not is_batch(r.partner)
        elif r.verdict == "dup_in_batch":
            assert is_batch(r.partner)


def test_neardup_incremental_exact_twins_are_batch_dups(spark):
    """Every synthesized exact within-batch twin (id + 10M) must verdict
    dup_in_batch (identical text => identical signature => all bands
    collide) with partner <= its source doc."""
    rows = {
        r.doc_id: r for r in w.q_neardup_incremental(spark, SF_DIR).collect()
    }
    twins = [d for d in rows if d >= w._BTWIN_OFF]
    assert twins
    for t in twins:
        r = rows[t]
        # an identical doc with a smaller id exists, so never 'new'; the
        # source may itself be a corpus near-dup, making the twin
        # dup_of_corpus instead — both are dup verdicts.
        assert r.verdict in ("dup_in_batch", "dup_of_corpus")
        if r.verdict == "dup_in_batch":
            assert r.partner <= t - w._BTWIN_OFF


def test_dhash_copies_collapse_and_twins_pair(spark):
    rows = w.q_image_dhash_neardup(spark, SF_DIR).collect()
    within = {r.media_a: r for r in rows if r.media_a == r.media_b}
    cross = {(r.media_a, r.media_b): r for r in rows if r.media_a != r.media_b}
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    copies = [d for d in docs if d % w._DH_COPY_MOD == 0]
    assert copies
    for d in copies:
        # identical pixels -> identical fingerprint -> the exact copy
        # collapses into d's group: a within-group row with >= 1 pair
        r = within.get(d)
        assert r is not None and r.hamming == 0 and r.n_pairs >= 1
    nears = [d for d in docs if d % w._DH_NEAR_MOD == 0]
    assert nears
    for d in nears:
        # the mutated block flips at most bit (0,0): either a cross-group
        # pair at hamming 1 or (no flip) absorption into d's group
        r = cross.get((d, d + w._DH_NEAR_OFF))
        assert (r is not None and r.hamming == 1) or (
            within.get(d) is not None
        ), d
    for r in rows:
        if r.media_a == r.media_b:
            assert r.hamming == 0 and r.n_pairs >= 1
        else:
            assert 1 <= r.hamming <= w._DH_MAXHAM and r.n_pairs >= 1


def test_dhash_fingerprint_matches_formula(spark):
    """The Spark-side fingerprint is computed from DECODED BMP BYTES; it
    must equal the closed-form dHash of the pixel formula — any decode
    error (stride, bottom-up flip, offset, channel order) breaks this."""
    from lakeforge.llm.dedup import hamming_neardup_pairs  # noqa: F401
    from lakeforge.llm.multimodal import decode_bmp_pixels  # noqa: F401

    def formula_fp(did: int, mutated: bool) -> int:
        g = w._dhash_gray(did, mutated).astype(np.int64)
        s = g.reshape(w._DH_GRID_H, w._DH_BLK, w._DH_GRID_W, w._DH_BLK).sum(
            axis=(1, 3)
        )
        bits = (s[:, :-1] > s[:, 1:]).astype(np.int64)
        shifts = (
            np.arange(w._DH_GRID_H)[:, None] * 8 + np.arange(w._DH_GRID_W - 1)
        )
        return int((bits << shifts).sum())

    media = w._dhash_media(spark, SF_DIR).limit(0)  # schema only
    assert media.columns == ["media_id", "content"]

    sample = (
        w._dhash_media(spark, SF_DIR)
        .filter(F.col("media_id").isin([0, 3, 10, 3000010, 4000000]))
        .collect()
    )
    assert sample
    for r in sample:
        px = decode_bmp_pixels(bytes(r.content))
        assert px.shape == (w._DH_H, w._DH_W, 3)
        gray = px[:, :, 0].astype(np.int64)
        s = gray.reshape(
            w._DH_GRID_H, w._DH_BLK, w._DH_GRID_W, w._DH_BLK
        ).sum(axis=(1, 3))
        bits = (s[:, :-1] > s[:, 1:]).astype(np.int64)
        shifts = (
            np.arange(w._DH_GRID_H)[:, None] * 8 + np.arange(w._DH_GRID_W - 1)
        )
        fp = int((bits << shifts).sum())
        did = r.media_id % 1_000_000 if r.media_id >= w._DH_NEAR_OFF else r.media_id
        mutated = w._DH_NEAR_OFF <= r.media_id < w._DH_COPY_OFF
        assert fp == formula_fp(did, mutated), r.media_id
        assert 0 <= fp < (1 << w._DH_BITS)


def test_hamming_neardup_pairs_exact_recall(spark):
    """Pigeonhole exactness on a crafted frame: ids within max_hamming
    MUST be found (any bit placement), ids beyond may only appear with
    hamming > threshold never below."""
    from lakeforge.llm.dedup import hamming_neardup_pairs

    base = 0b1010_1100_0011 << 20
    rows = [
        (1, base),
        (2, base ^ 0b1),                     # hamming 1
        (3, base ^ (0b111 << 17)),           # hamming 3, spread bits
        (4, base ^ ((1 << 55) | (1 << 1) | (1 << 30) | (1 << 40) | 1)),
        # ^ hamming 5 spread over 4 bands
        (5, base ^ ((1 << 56) - 1) & ((1 << 56) - 1)),  # far away
    ]
    df = spark.createDataFrame(rows, "id long, fp long")
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neardup_pairs(
            df, "id", "fp", bits=56, bands=7, max_hamming=6
        ).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 3
    assert pairs[(1, 4)] == 5
    assert (1, 5) not in pairs
    assert (2, 3) in pairs  # hamming 4 <= 6, exact recall


def test_audio_copies_collapse_and_twins_pair(spark):
    rows = w.q_audio_fingerprint_neardup(spark, SF_DIR).collect()
    within = {r.media_a: r for r in rows if r.media_a == r.media_b}
    cross = {(r.media_a, r.media_b): r for r in rows if r.media_a != r.media_b}
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    # FULL formula replay: compute every media item's fingerprint offline
    # from the sample formula, derive the expected (rep -> C(cnt,2))
    # within-group rows exactly, and pin the query's within output to it —
    # a decode regression that breaks copy collapse breaks this equality.
    def fp_of(did: int, mutated: bool) -> int:
        g = w._af_samples(did, mutated).astype(np.int64)[
            : w._AF_FRAMES * w._AF_FRAME
        ]
        e = (g * g).reshape(w._AF_FRAMES, w._AF_FRAME).sum(axis=1)
        bits = (e[:-1] > e[1:]).astype(np.int64)
        return int((bits << np.arange(w._AF_FRAMES - 1)).sum())

    media = [(d, fp_of(d, False)) for d in docs]
    media += [
        (d + w._AF_NEAR_OFF, fp_of(d, True))
        for d in docs
        if d % w._AF_NEAR_MOD == 0
    ]
    media += [
        (d + w._AF_COPY_OFF, fp_of(d, False))
        for d in docs
        if d % w._AF_COPY_MOD == 0
    ]
    groups: dict[int, list[int]] = {}
    for mid, fp in media:
        groups.setdefault(fp, []).append(mid)
    expected_within = {
        min(ms): len(ms) * (len(ms) - 1) // 2
        for ms in groups.values()
        if len(ms) > 1
    }
    assert {rep: r.n_pairs for rep, r in within.items()} == expected_within
    # every exact copy's group really has >= 2 members
    for d in (x for x in docs if x % w._AF_COPY_MOD == 0):
        assert len(groups[fp_of(d, False)]) >= 2, d
    for r in rows:
        if r.media_a == r.media_b:
            assert r.hamming == 0 and r.n_pairs >= 1
        else:
            assert 1 <= r.hamming <= w._DH_MAXHAM and r.n_pairs >= 1
    assert cross is not None  # shape sanity; cross rows exercised above


def test_audio_fingerprint_matches_formula(spark):
    """Fingerprint from DECODED WAV BYTES == closed-form energy-delta hash
    of the sample formula (RIFF walk, data offset, int16 LE all real)."""
    from lakeforge.llm.multimodal import decode_wav_samples

    sample = (
        w._af_media(spark, SF_DIR)
        .filter(F.col("media_id").isin([0, 9, 14, 3000009, 4000000]))
        .collect()
    )
    assert sample
    for r in sample:
        samples, hdr = decode_wav_samples(bytes(r.content))
        assert hdr["n_samples"] == w._AF_N
        s = samples[: w._AF_FRAMES * w._AF_FRAME, 0].astype(np.int64)
        e = (s * s).reshape(w._AF_FRAMES, w._AF_FRAME).sum(axis=1)
        bits = (e[:-1] > e[1:]).astype(np.int64)
        fp = int((bits << np.arange(w._AF_FRAMES - 1)).sum())
        did = r.media_id % 1_000_000 if r.media_id >= w._AF_NEAR_OFF else r.media_id
        mutated = w._AF_NEAR_OFF <= r.media_id < w._AF_COPY_OFF
        g = w._af_samples(did, mutated).astype(np.int64)[: w._AF_FRAMES * w._AF_FRAME]
        e2 = (g * g).reshape(w._AF_FRAMES, w._AF_FRAME).sum(axis=1)
        bits2 = (e2[:-1] > e2[1:]).astype(np.int64)
        fp2 = int((bits2 << np.arange(w._AF_FRAMES - 1)).sum())
        assert fp == fp2, r.media_id


def test_sql_udf_inlines_to_pushed_scan(spark):
    """The SQL UDF must be macro-expanded by Catalyst: the executed plan
    carries the pushed quantity filter and NO python/udf eval node."""
    df = w.q_sql_udf_net_charge(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = {r.l_returnflag: r for r in df.collect()}
    # hand-check one group against the inline expression
    from pyspark.sql import functions as F2

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        F2.col("l_quantity") < 45
    )
    net = (
        F2.expr(
            "CAST(round(l_extendedprice * 100) AS BIGINT)"
            " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
            " * (100 + CAST(round(l_tax * 100) AS BIGINT)) div 10000"
        )
    )
    want = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F2.count(F2.lit(1)).cast("bigint").alias("n_lines"),
            F2.sum(net.cast("decimal(38,0)")).cast("double").alias("net_cents"),
            F2.max(net).cast("bigint").alias("max_net_cents"),
        )
        .collect()
    }
    for k, r in rows.items():
        assert (r.n_lines, r.net_cents, r.max_net_cents) == (
            want[k].n_lines, want[k].net_cents, want[k].max_net_cents,
        ), k


def test_unpivot_is_rowlocal_long_form(spark):
    rows = w.q_orders_unpivot_metrics(spark, SF_DIR).collect()
    prios = {
        r[0]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderpriority")
        .distinct()
        .collect()
    }
    assert len(rows) == 4 * len(prios)
    by_metric: dict[str, int] = {}
    for r in rows:
        by_metric[r.metric] = by_metric.get(r.metric, 0) + 1
    assert set(by_metric) == {"n_orders", "total_cents", "max_cents", "n_customers"}
    assert all(v == len(prios) for v in by_metric.values())


def test_video_twins_share_six_of_eight_frames(spark):
    rows = w.q_video_frame_neardup(spark, SF_DIR).collect()
    got = {(r.video_a, r.video_b): r.n_shared_frames for r in rows}
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    copies = [d for d in docs if d % w._VF_COPY_MOD == 0]
    nears = [d for d in docs if d % w._VF_NEAR_MOD == 0]
    assert copies and nears
    for d in copies:
        assert got.get((d, d + w._VF_COPY_OFF)) == w._VF_NF, d
    for d in nears:
        # twin re-seeds the last 2 frames -> exactly NF-2 shared (modular
        # frame-seed collisions could only ADD shared fps, never remove)
        assert got.get((d, d + w._VF_NEAR_OFF), 0) >= w._VF_NF - 2, d
    for (a, b), n in got.items():
        assert a < b and w._VF_MIN_SHARED <= n <= w._VF_NF


def test_video_container_walk_decodes_every_frame(spark):
    """The container is walked by each frame's DECLARED file size; every
    fixture video must yield exactly NF frame fingerprints (before the
    per-video distinct)."""
    import struct

    from lakeforge.llm.multimodal import decode_bmp_pixels

    sample = (
        w._vf_media(spark, SF_DIR)
        .filter(F.col("media_id").isin([0, 11, 3000011]))
        .collect()
    )
    assert sample
    for r in sample:
        buf, pos, n = bytes(r.content), 0, 0
        while pos + 6 <= len(buf) and buf[pos : pos + 2] == b"BM":
            (fsize,) = struct.unpack_from("<I", buf, pos + 2)
            px = decode_bmp_pixels(buf[pos : pos + fsize])
            assert px.shape == (w._DH_H, w._DH_W, 3)
            pos += fsize
            n += 1
        assert n == w._VF_NF and pos == len(buf), r.media_id


def test_media_quality_gate_funnel_closed_form(spark):
    rows = {(r.fmt, r.verdict): r for r in w.q_media_quality_gate(spark, SF_DIR).collect()}
    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    exp: dict[tuple, list] = {}
    for d in docs:
        if d % 101 == 0:
            key, nv = ("none", "corrupt"), 0
        elif d % 2 == 0:
            nv = 3 * (d % 48 + 1) * (d % 64 + 1)
            key = ("bmp", "too_small" if nv < w._MQ_MIN_PIXVALS else "ok")
        else:
            nv = (d * 37) % 4000 + 100
            key = ("wav", "too_small" if nv < w._MQ_MIN_SAMPLES else "ok")
        exp.setdefault(key, [0, 0])
        exp[key][0] += 1
        exp[key][1] += nv
    assert {(k, (r.n_media, r.total_values)) for k, r in rows.items()} == {
        (k, tuple(v)) for k, v in exp.items()
    }
    assert ("none", "corrupt") in rows  # the corrupt leg has mass


def test_sql_table_udf_expands_to_pushed_scan(spark):
    df = w.q_sql_table_udf_value_bands(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # table function expanded by Catalyst: plain scan+agg, no python eval
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = {(r.o_orderpriority, r.band): r for r in df.collect()}
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = {
        (r.o_orderpriority, r.band): r
        for r in o.groupBy(
            "o_orderpriority",
            F.expr(
                f"CAST(round(o_totalprice * 100) AS BIGINT) div {w._TUDF_BAND}"
            ).alias("band"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("band_cents_total"),
        )
        .collect()
    }
    assert {k: (r.n_orders, r.band_cents_total) for k, r in rows.items()} == {
        k: (r.n_orders, r.band_cents_total) for k, r in want.items()
    }


def test_media_fixture_domain_guard_trips_in_data_path(spark):
    """An out-of-domain source doc_id (>= the 1M twin/copy id gap) must
    fail the encode loop loudly instead of silently colliding twin ids
    across source docs (ADVICE r11: _dhash_media/_af_media/_vf_media had
    no guard while neardup_incremental did)."""
    import pytest

    # in-domain passes through unchanged
    assert w._guard_media_domain(42, "t") == 42
    for bad in (w._MEDIA_ID_GAP, w._MEDIA_ID_GAP + 5, -1):
        with pytest.raises(ValueError, match="twin"):
            w._guard_media_domain(bad, "t")

    # and the guard is wired into the actual mapInPandas encode path:
    # feed a frame whose doc_id is out of domain through each fixture
    bad_docs = spark.range(1).select(
        (F.col("id") + w._MEDIA_ID_GAP + 7).alias("doc_id")
    )
    bad_dir = str(spark.conf.get("spark.sql.warehouse.dir")).removeprefix(
        "file:"
    )
    path = f"{bad_dir}/_bad_media_docs/documents.parquet"
    bad_docs.write.mode("overwrite").parquet(path)
    for fixture in (w._dhash_media, w._af_media, w._vf_media):
        df = fixture(spark, f"{bad_dir}/_bad_media_docs")
        with pytest.raises(Exception, match="outside"):
            df.limit(1).collect()
