"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of these operators at 100 TB):
- **Exact**: hash-groupBy on a 60-bit content fingerprint — one shuffle of
  (fingerprint, id), never of the text itself.
- **MinHash+LSH**: per-doc signature is one shuffle (explode shingles ->
  groupBy doc); banding turns the O(n^2) pair space into equi-joins on
  (band, band_hash) — only docs sharing a band bucket ever meet.  Shuffle
  volume is O(docs * bands), not O(docs^2).
- **SimHash**: one explode + one groupBy; near-dup buckets are exact-match
  on the fingerprint (or prefix buckets for hamming<=k).
- **Jaccard**: inverted-index self-join on shingles with a document-
  frequency cap (df_cap) — the classic hot-shingle guard: a shingle shared
  by 10^5 docs would alone create 10^10 pairs; capping df bounds the join
  fan-out while keeping rare (discriminative) shingles.

Determinism: all hashing derives from md5 (cross-engine reproducible); the
minhash permutation constants are fixed at import time from md5 as well, so
Python, Spark SQL, and the DuckDB oracle all agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeforge.functions.keys import md5_int, md5_int32
from lakeforge.llm.text import tokens_col

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_A_MOD = 1 << 30  # keep a*h inside signed-64 under ANSI overflow checks


def _const(tag: str, i: int, mod: int) -> int:
    return int(hashlib.md5(f"{tag}{i}".encode()).hexdigest()[:8], 16) % mod


def minhash_constants(k: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for h_i(x) = (a_i * x + b_i) mod P — md5-derived, shared
    verbatim by the Spark queries and the DuckDB oracle SQL."""
    return [(_const("a", i, _A_MOD) | 1, _const("b", i, MINHASH_P)) for i in range(k)]


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup groups: canonical (min) id + copy count per normalized
    content fingerprint."""
    fp = df.select(
        F.col(id_col), md5_int(F.array_join(tokens_col(text_col), " ")).alias("fp")
    )
    return fp.groupBy("fp").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )


def shingles_col(tokens: str, n: int) -> Column:
    """Distinct word n-grams of an already-tokenized array column.

    DuckDB twin: unnest(range(1, greatest(len(toks)-n+2, 1))) + list slice.
    """
    return F.expr(
        f"CASE WHEN size({tokens}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({tokens}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({tokens}, i, {n})))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("__toks"))
        .select("doc_id", F.explode(shingles_col("__toks", n)).alias("shingle"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 32,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per-document MinHash signature as columns m0..m{k-1}.

    One shuffle, but a cheap one: explode shingles -> hash -> groupBy(doc)
    with k ``min`` aggregates.  Partial (map-side) aggregation means the
    exchange carries only the per-doc k minima, not the exploded shingle
    rows, so shuffled bytes ~ |docs| * k regardless of document length.
    (A zero-shuffle transform/array_min formulation was measured 2x SLOWER:
    higher-order array functions are interpreted, not codegen'd — k passes
    over every shingle array outside Tungsten loses to one fused
    hash-aggregate over exploded rows.)
    """
    sh = (
        shingles
        if shingles is not None
        else _doc_shingles(df, text_col, id_col, shingle_n)
    )
    h = sh.select("doc_id", md5_int32("shingle").alias("h"))
    consts = minhash_constants(k)
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(consts)
    ]
    return h.groupBy("doc_id").agg(*mins)


def lsh_band_buckets(
    sig: DataFrame, k: int = 32, bands: int = 8, keep_sig: bool = False
) -> DataFrame:
    """Banded LSH bucket keys for a MinHash signature frame: one row per
    (doc, band) with the band's md5-derived 60-bit bucket hash ``bh``.

    Shared by ``lsh_candidate_pairs`` (the dedup self-join) and the
    bucket-skew audit query — the audit sees EXACTLY the buckets the join
    would build.  ``keep_sig`` additionally carries the full signature
    array (the pair scorer needs it; the audit does not)."""
    sig_arr = sig.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(k)]).alias("sig")
    )
    rows = k // bands
    band_structs = []
    for j in range(bands):
        cols = [F.col("sig")[i] for i in range(j * rows, (j + 1) * rows)]
        bh = F.conv(
            F.substring(F.md5(F.concat_ws(",", *[c.cast("string") for c in cols])), 1, 15),
            16, 10,
        ).cast("bigint")
        band_structs.append(F.struct(F.lit(j).alias("band"), bh.alias("bh")))
    out_cols = ["doc_id"] + (["sig"] if keep_sig else [])
    return sig_arr.select(
        *out_cols, F.explode(F.array(*band_structs)).alias("b")
    ).select(*out_cols, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))


def lsh_candidate_pairs(
    sig: DataFrame, k: int = 32, bands: int = 8, min_match: int = 16
) -> DataFrame:
    """LSH banding: docs sharing any (band, band-hash) bucket become
    candidates; candidates are scored by # of equal signature components.

    Returns (doc_a, doc_b, n_match) with n_match >= min_match.

    The signature table is persisted before the self-join: both join sides
    reference the same plan, and without the persist Spark computes the
    full signature pipeline (explode shingles -> hash -> groupBy) twice.
    Signatures are k ints per doc — orders of magnitude smaller than the
    text — so MEMORY_AND_DISK caching is safe at any scale.  The persist is
    registered with lakeforge.cache so the caller releases it at the query
    boundary (round-2 review: untracked persists lived for the session).
    """
    from lakeforge.cache import persist_tracked

    sig = persist_tracked(sig)
    banded = lsh_band_buckets(sig, k=k, bands=bands, keep_sig=True)

    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    n_match = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    return (
        pairs.select("doc_a", "doc_b", n_match.alias("n_match"))
        .filter(F.col("n_match") >= min_match)
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """SimHash over distinct tokens: bit b of the fingerprint is the sign
    of sum over tokens of (+1 if bit b of hash(token) else -1).

    ``bits <= 32`` hashes tokens with md5_int32 (first 8 md5 hex digits);
    ``bits <= 60`` with md5_int (first 15 hex digits) — both exactly
    reproducible in DuckDB.  60 is the ceiling: bit 63 of a signed BIGINT
    cannot be set via ``1 << b`` literals, and staying on the md5_int
    convention keeps the oracle twin one substr() away."""
    if bits > 60:
        raise ValueError("simhash bits > 60 unsupported (signed-64 + md5_int)")
    toks = (
        df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("__toks"))
        .select("doc_id", F.explode(F.array_distinct("__toks")).alias("tok"))
    )
    hash_fn = md5_int32 if bits <= 32 else md5_int
    h = toks.select("doc_id", hash_fn("tok").alias("h"))
    sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = h.groupBy("doc_id").agg(*sums)
    fp: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        fp = fp + F.when(F.col(f"s{b}") >= 0, F.lit(1 << b).cast("bigint")).otherwise(0)
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs at Hamming distance <= max_hamming between
    SimHash fingerprints, found without an O(n^2) self-join.

    Pigeonhole banding: split the fingerprint into ``bands`` contiguous
    bit-bands; two fingerprints within ``max_hamming <= bands - 1`` bit
    flips must agree exactly on at least one band, so an equi-join on
    (band_index, band_value) has **exact recall** while only docs sharing
    a band bucket ever meet in the shuffle — O(docs * bands) exchange
    volume, same physical shape as MinHash LSH banding.
    """
    if max_hamming >= bands:
        raise ValueError("exact recall needs max_hamming <= bands - 1")
    from lakeforge.cache import persist_tracked

    width = bits // bands
    mask = (1 << width) - 1
    # Persist: both sides of the self-join reference this plan; without the
    # persist the whole fingerprint pipeline runs twice.  (doc_id, simhash)
    # is ~16 bytes/doc — cacheable at any corpus size.  Tracked: released
    # by the caller at the query boundary (lakeforge/cache.py).
    fp = persist_tracked(simhash_fingerprints(df, text_col, id_col, bits))
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bh")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("bigint")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def band_explode(
    df: DataFrame, fp_col: str, bits: int, bands: int
) -> DataFrame:
    """Explode a fingerprint frame into (….., band, bh) rows with
    ``bands`` contiguous pigeonhole bit-bands of width bits//bands.
    The ONE place the band layout (shift, mask) lives on the Spark side
    — hamming_neardup_pairs and the crossmodal two-sided band join both
    bucket through it, so the layouts can never drift apart."""
    width = bits // bands
    mask = (1 << width) - 1
    return df.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col(fp_col), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select(*df.columns, "_bb.band", "_bb.bh")


def hamming_neardup_pairs(
    fp: DataFrame,
    id_col: str,
    fp_col: str,
    bits: int,
    bands: int,
    max_hamming: int,
) -> DataFrame:
    """Near-duplicate pairs at Hamming distance <= max_hamming over a
    CALLER-SUPPLIED fingerprint frame — the generic core of
    ``simhash_neardup_pairs``, reusable for any bit fingerprint (dHash
    perceptual image hashes, audio chromaprints, ...).

    Pigeonhole banding, exact recall (max_hamming <= bands - 1): two
    fingerprints within max_hamming bit flips must agree exactly on at
    least one of the ``bands`` contiguous bit-bands, so the (band, value)
    equi-join finds every qualifying pair while only fingerprints sharing
    a band bucket ever meet in the shuffle — O(n * bands) exchange volume.

    Returns (id_a, id_b, hamming).  The input frame is persisted
    (tracked; caller releases at the query boundary) because both join
    sides reference its plan.
    """
    if max_hamming >= bands:
        raise ValueError("exact recall needs max_hamming <= bands - 1")
    from lakeforge.cache import persist_tracked

    base = fp.select(F.col(id_col).alias("_id"), F.col(fp_col).alias("_fp"))
    # Skip the persist when the CALLER already persisted the input frame
    # (e.g. the media dedup ops cache their (fp, rep, cnt) groups for the
    # count join-back): re-caching a trivial projection of cached data
    # would hold two MEMORY_AND_DISK copies until the query boundary.
    if not (fp.storageLevel.useMemory or fp.storageLevel.useDisk):
        base = persist_tracked(base)
    banded = band_explode(base, "_fp", bits=bits, bands=bands)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a._fp").bitwiseXOR(F.col("b._fp"))).cast(
        "bigint"
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    df_cap: int = 50,
    min_permille: int = 300,
) -> DataFrame:
    """Exact n-gram Jaccard via inverted-index self-join.

    Shingles with document frequency > df_cap are dropped BEFORE the join
    (both from the index and from the per-doc set sizes) — the hot-key
    guard that keeps the self-join fan-out bounded at scale.
    Jaccard is reported as integer per-mille of the capped shingle sets.

    ``rare`` feeds THREE consumers (both self-join sides + the size
    aggregate), so it is persisted: without it each consumer re-runs the
    full explode -> document-frequency join pipeline (measured 30% faster
    at sf0.1; the saving scales with corpus size).  Spill-safe
    (MEMORY_AND_DISK), tracked for query-boundary release
    (lakeforge/cache.py).
    """
    from lakeforge.cache import persist_tracked

    # r12 opt (guide §2.4): sh feeds the df aggregate AND the rare join,
    # so unpersisted the tokenize -> shingle-explode pipeline executed
    # twice (once inside rare's materialization, once for dfreq).
    sh = persist_tracked(_doc_shingles(df, text_col, id_col, shingle_n))
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = persist_tracked(sh.join(dfreq.filter(F.col("df") <= df_cap), "shingle"))
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = rare.alias("a"), rare.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("bigint"))
        .withColumn("jaccard_permille", F.expr("(n_inter * 1000) div n_union"))
    )
    return out.filter(F.col("jaccard_permille") >= min_permille).select(
        "doc_a", "doc_b", "n_inter", "n_union", "jaccard_permille"
    )


def passage_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    passage_words: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-PASSAGE detection: substring-level dedup
    (the "dedup at the passage level, not the document level" step of
    training-data pipelines — catches boilerplate headers, quoted blocks,
    and partially-copied documents that whole-doc fingerprints miss).

    Each document is cut into NON-OVERLAPPING ``passage_words``-token
    windows (aligned from token 0; final partial window included), each
    window is hashed, and passages whose hash appears in >= ``min_docs``
    distinct documents are reported.

    Returns (passage_hash, n_docs, n_occurrences, canonical_doc_id) —
    canonical = min doc id, the copy a remover would keep.

    Scale: the window cut is a per-row JVM array op (sequence + slice
    inside one Project — no explode-then-regroup of tokens); only
    (doc_id, passage_hash) pairs shuffle, O(total_tokens / passage_words)
    rows — text itself never shuffles.  The groupBy is on a 60-bit hash:
    uniform, no hot keys regardless of corpus skew.
    """
    w = passage_words
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).filter(F.size("toks") > 0)
    # passages[i] = tokens[i*w .. i*w+w) joined by ' ' (1-based slice).
    passages = toks.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, CAST(ceil(size(toks) / {w}.0) AS INT) - 1),"
            f" i -> concat_ws(' ', slice(toks, i * {w} + 1, {w})))"
        ).alias("passages"),
    )
    ph = passages.select(
        "doc_id", F.explode("passages").alias("passage")
    ).select("doc_id", md5_int(F.col("passage")).alias("passage_hash"))
    return (
        ph.groupBy("passage_hash")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def exact_jaccard_for_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pairs: DataFrame,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for a GIVEN (doc_a, doc_b) pair list —
    the ground-truth side of sketch-calibration queries.

    Unlike ``jaccard_pairs`` (whose df-cap bounds candidate GENERATION),
    this scores an already-bounded pair list, so sets are NOT capped:
    truth means the full shingle sets.  The pair frame is broadcast into
    both shingle joins (calibration pair lists are sample-sized by
    construction); shingle rows shuffle once per side for the
    intersection count.
    """
    from lakeforge.cache import persist_tracked

    sh = (
        shingles
        if shingles is not None
        else persist_tracked(_doc_shingles(df, text_col, id_col, shingle_n))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    p = pairs.select("doc_a", "doc_b")
    inter = (
        sh.join(F.broadcast(p), sh.doc_id == F.col("doc_a"))
        .select("doc_a", "doc_b", "shingle")
        .join(
            sh.select(F.col("doc_id").alias("__b"), F.col("shingle").alias("__bs")),
            (F.col("doc_b") == F.col("__b")) & (F.col("shingle") == F.col("__bs")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        p.join(inter, ["doc_a", "doc_b"], "left")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("n_inter", F.lit(0)).cast("bigint").alias("n_inter"),
            F.expr(
                "(coalesce(n_inter, 0) * 1000)"
                " div (n_a + n_b - coalesce(n_inter, 0))"
            ).cast("bigint").alias("exact_permille"),
        )
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    df_cap: int = 50,
    tau_permille: int = 600,
) -> DataFrame:
    """Set-similarity join with PREFIX FILTERING (AllPairs / PPJoin family,
    Bayardo et al. "Scaling Up All Pairs Similarity Search"; Xiao et al.
    "Efficient Similarity Joins for Near Duplicate Detection").

    Candidate generation differs fundamentally from ``jaccard_pairs``:
    instead of indexing EVERY (df-capped) shingle, each document indexes
    only its p rarest shingles, p = |A| - ceil(tau*|A|) + 1, under one
    GLOBAL rarity order; candidates additionally pass PPJoin's length
    filter (tau*|A| <= |B| <= |A|/tau) and positional upper bound
    (min(i,j)-1 + 1 + min(|A|-i, |B|-j) >= ceil(tau*(|A|+|B|)/(1+tau)) for
    the shared token's prefix positions i, j — sound for every shared
    token because common tokens sort consistently under one global order).
    Any pair with Jaccard >= tau keeps at least one surviving witness
    token, so the filter chain is LOSSLESS — the driver oracle proves it
    by comparing against the full inverted-index join.

    Because the global order is ascending document frequency, the indexed
    shingles are exactly the rare (low fan-out) ones — the hot-key guard
    falls out of the algorithm instead of being bolted on.  Verification
    is candidate-bounded: only candidate pairs fan out through the
    intersection join, and set sizes ride along from the prefix join so
    the tail needs no extra joins.

    ``prefix`` feeds both sides of the candidate self-join, so it is
    persisted (as is ``rare``, which feeds sizes, the index, and both
    verify sides).  The global rarity order is the (df, shingle) TUPLE
    itself — no materialized dense rank, so there is no vocabulary-wide
    single-partition window anywhere: per-doc prefix positions come from
    a per-doc window ordered by that tuple, and the candidate join keys
    on the shingle directly.

    Measured tradeoff (sf0.1 synthetic corpus, ~30-word vocabulary,
    ~5 capped shingles/doc): the full inverted-index join
    (``jaccard_pairs``) is FASTER here, because with sets this small the
    prefix holds 60% of the postings and candidates still need a verify
    pass.  Prefix filtering wins when sets are large and the vocabulary
    is Zipfian-wide (real corpora), where the prefix is a tiny fraction
    and the rare-token index collapses the candidate space; both
    operators are kept because the crossover is corpus-dependent.

    Sets are the df<=df_cap shingle sets (same restricted-universe
    semantics as ``jaccard_pairs``); Jaccard is integer per-mille.
    """
    from pyspark.sql import Window

    from lakeforge.cache import persist_tracked

    # r12 note: persisting sh here (as jaccard_pairs now does) was tried
    # and REVERTED — measured 5.0 -> 7.7s, because AQE's runtime exchange
    # reuse already dedupes this symmetric subtree and the forced
    # materialization only adds a pass.
    sh = _doc_shingles(df, text_col, id_col, shingle_n)
    dfreq = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
    )
    # rare feeds the prefix index and both verify-join sides.
    rare = persist_tracked(sh.join(dfreq, "shingle"))
    # Global rarity order: ascending (df, shingle) — the tuple is the
    # total order, so no dense-rank materialization is needed.  The set
    # size n_sh rides the SAME per-doc shuffle as the prefix position
    # (count over the unbounded frame of one window spec, row_number over
    # the ordered one) — one exchange instead of a separate
    # groupBy(doc_id) + join back (r6: −2 stages, identical values).
    w_doc = Window.partitionBy("doc_id")
    pos = F.row_number().over(w_doc.orderBy("df", "shingle"))
    n_sh = F.count(F.lit(1)).over(w_doc)
    # prefix length: |A| - ceil(tau*|A|) + 1  (integer ceil both engines)
    plen = (
        F.col("n_sh")
        - F.floor((F.lit(tau_permille) * F.col("n_sh") + 999) / 1000)
        + 1
    )
    prefix = persist_tracked(
        rare.select("doc_id", "shingle", "df")
        .withColumn("pos", pos)
        .withColumn("n_sh", n_sh)
        .filter(F.col("pos") <= plen)
        .select("shingle", "doc_id", "pos", "n_sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    # overlap needed for J >= tau: ceil(tau*(|A|+|B|)/(1+tau)), integers
    alpha = F.floor(
        (
            F.lit(tau_permille) * (F.col("a.n_sh") + F.col("b.n_sh"))
            + F.lit(1000 + tau_permille - 1)
        )
        / F.lit(1000 + tau_permille)
    )
    ubound = (
        F.least(F.col("a.pos"), F.col("b.pos"))
        - 1
        + 1
        + F.least(
            F.col("a.n_sh") - F.col("a.pos"), F.col("b.n_sh") - F.col("b.pos")
        )
    )
    cand = (
        a.join(
            b,
            # r13 note (VERDICT r12 #3): leading the equi-keys with
            # xxhash64(shingle) — cheap long compares ahead of the string
            # — was implemented and measured, then REVERTED: the planner
            # gives this join a BroadcastHashJoin at bench scale (plan
            # captured in plans/r13/jaccard_prefix_pairs_r13probe.txt),
            # so there is no sort to cheapen and the extra hash key only
            # added per-row hashing on both sides (ABBA 1.057, subset
            # bench 6.50 -> 6.71 cold).  Re-try only if the join shape
            # becomes a real SMJ (it will at corpus scales past the
            # broadcast threshold).
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.lit(1000) * F.col("b.n_sh") >= F.lit(tau_permille) * F.col("a.n_sh"))
            & (F.lit(1000) * F.col("a.n_sh") >= F.lit(tau_permille) * F.col("b.n_sh"))
            & (ubound >= alpha),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()
    )
    out = (
        cand.join(
            rare.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a"
        )
        .join(
            rare.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
        .withColumn(
            "n_union", (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("bigint")
        )
        .withColumn("jaccard_permille", F.expr("(n_inter * 1000) div n_union"))
    )
    return out.filter(F.col("jaccard_permille") >= tau_permille).select(
        "doc_a", "doc_b", "n_inter", "n_union", "jaccard_permille"
    )
