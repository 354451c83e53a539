"""LLM-pipeline workload queries + DuckDB oracle SQL.

The oracles for minhash/simhash/LSH are generated programmatically from the
SAME md5-derived constants the Spark operators use (llm/dedup.py,
llm/similarity.py) — approximate algorithms, exactly reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakeforge.io.sources import base_parquet
from lakeforge.llm.dedup import (
    MINHASH_P,
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_constants,
    minhash_signatures,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from lakeforge.functions.keys import duckdb_md5_int_sql
from lakeforge.llm.similarity import cosine_topk, lsh_planes, rp_lsh_buckets
from lakeforge.llm.text import STOPWORDS, doc_fingerprint, lang_id, text_stats
from lakeforge.ops.sampling import (
    deterministic_sample,
    stratified_sample,
    train_test_split_col,
)

# --------------------------------------------------------------------------
# DuckDB SQL fragments
# --------------------------------------------------------------------------

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _md5_60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS UBIGINT)::BIGINT"


def _md5_32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS UBIGINT)::BIGINT"


_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
)

# Near-dup corpus: every 5th doc gets a mutated twin (id + 1_000_000).
_NEARDUP_CORPUS = """
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text || ' zzz mutation tail' AS text
    FROM documents WHERE doc_id % 5 = 0
)"""

# Exact-dup corpus: every 7th doc gets a verbatim copy (id + 2_000_000).
_EXACTDUP_CORPUS = """
corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
)"""


def _shingle_ctes(n: int = 3) -> str:
    """corpus -> distinct (doc_id, shingle) pairs, DuckDB side."""
    return f"""
toks AS (SELECT doc_id, {_TOKS} AS toks FROM corpus),
pos AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - {n} + 2, 1))) AS i, toks
        FROM toks),
sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS shingle
       FROM pos)"""


# --------------------------------------------------------------------------
# Spark-side corpora (must mirror the CTEs above exactly)
# --------------------------------------------------------------------------

def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return base_parquet(spark, f"{sf_dir}/documents.parquet")


def _neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select("doc_id", "text")
    mutated = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz mutation tail")).alias("text"),
    )
    return docs.unionByName(mutated)


def _exactdup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents(spark, sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return base_parquet(spark, f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# Queries
# --------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(_documents(spark, sf_dir), "text", "doc_id")


SQL_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, length(text) AS n_chars, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_tokens,
       CAST(len(list_filter(toks, t -> t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop,
       CAST(CASE WHEN len(toks) = 0 THEN 0
                 ELSE (len(list_filter(toks, t -> t IN ({_STOP_SQL}))) * 1000) // len(toks)
            END AS BIGINT) AS stop_permille
FROM t
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(_documents(spark, sf_dir), "text", "doc_id")


SQL_LANG_ID = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id,
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE (len(list_filter(toks, t -> t IN ({_STOP_SQL}))) * 1000) // len(toks)
             END AS pm
      FROM t)
SELECT doc_id, CASE WHEN pm >= 30 THEN 'en' ELSE 'unk' END AS lang_pred FROM s
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(_documents(spark, sf_dir), "text", "doc_id")


SQL_DOC_FINGERPRINT = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id, {_md5_60("array_to_string(toks, ' ')")} AS fingerprint FROM t
"""


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_exactdup_corpus(spark, sf_dir), "text", "doc_id")


SQL_EXACT_DEDUP = f"""
WITH {_EXACTDUP_CORPUS},
t AS (SELECT doc_id, {_TOKS} AS toks FROM corpus),
fp AS (SELECT doc_id, {_md5_60("array_to_string(toks, ' ')")} AS fp FROM t)
SELECT fp, MIN(doc_id) AS canonical_id, CAST(COUNT(*) AS BIGINT) AS n_copies
FROM fp GROUP BY fp
"""


_K, _BANDS, _ROWS, _MIN_MATCH = 32, 8, 4, 16


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(
        _neardup_corpus(spark, sf_dir), "text", "doc_id", k=_K, shingle_n=3
    )
    return lsh_candidate_pairs(sig, k=_K, bands=_BANDS, min_match=_MIN_MATCH)


def _sql_minhash_lsh_pairs() -> str:
    consts = minhash_constants(_K)
    mins = ",\n           ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(consts)
    )
    band_selects = []
    for j in range(_BANDS):
        cols = [f"m{i}" for i in range(j * _ROWS, (j + 1) * _ROWS)]
        concat = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {j} AS band, {_md5_60(concat)} AS bh FROM sig"
        )
    bands_sql = "\n    UNION ALL\n    ".join(band_selects)
    match_sum = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(_K)
    )
    return f"""
WITH {_NEARDUP_CORPUS},
{_shingle_ctes(3)},
h AS (SELECT doc_id, {_md5_32("shingle")} AS h FROM sh),
sig AS (SELECT doc_id,
           {mins}
        FROM h GROUP BY doc_id),
bands AS (
    {bands_sql}
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
scored AS (
    SELECT c.doc_a, c.doc_b, CAST({match_sum} AS BIGINT) AS n_match
    FROM cand c
    JOIN sig sa ON sa.doc_id = c.doc_a
    JOIN sig sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_match FROM scored WHERE n_match >= {_MIN_MATCH}
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs(
        _neardup_corpus(spark, sf_dir), "text", "doc_id",
        shingle_n=3, df_cap=50, min_permille=300,
    )


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH {_NEARDUP_CORPUS},
{_shingle_ctes(3)},
dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle) WHERE df <= 50),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM rare GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
    FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
out AS (
    SELECT i.doc_a, i.doc_b, i.n_inter,
           CAST(sa.n_sh + sb.n_sh - i.n_inter AS BIGINT) AS n_union
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, n_inter, n_union,
       CAST((n_inter * 1000) // n_union AS BIGINT) AS jaccard_permille
FROM out WHERE (n_inter * 1000) // n_union >= 300
"""


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_fingerprints(_documents(spark, sf_dir), "text", "doc_id")


def _sql_simhash(src: str = "documents", bits: int = 32) -> str:
    """DuckDB twin of llm/dedup.py::simhash_fingerprints — bits <= 32 uses
    the md5_int32 token hash, bits <= 60 the md5_int 15-hex one."""
    sums = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    tok_hash = _md5_32("tok") if bits <= 32 else _md5_60("tok")
    return f"""
WITH corpus AS (SELECT doc_id, text FROM {src}),
toks AS (SELECT doc_id, {_TOKS} AS toks FROM corpus),
u AS (SELECT doc_id, unnest(toks) AS tok FROM toks),
dt AS (SELECT DISTINCT doc_id, tok FROM u),
h AS (SELECT doc_id, {tok_hash} AS h FROM dt),
agg AS (SELECT doc_id,
           {sums}
        FROM h GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM agg
"""


_N_QUERIES, _TOPK = 20, 10


def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(queries, emb, "embedding", "vec_id", k=_TOPK)


SQL_EMBEDDING_COSINE_TOPK = f"""
WITH e AS (
    SELECT vec_id,
           list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000000) AS BIGINT)) AS ie
    FROM embeddings
),
n AS (SELECT vec_id, ie, CAST(list_sum(list_transform(ie, x -> x * x)) AS HUGEINT) AS n2 FROM e),
q AS (SELECT vec_id AS query_id, ie AS qv, n2 AS qn FROM n WHERE vec_id < {_N_QUERIES}),
pairs AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(list_zip(q.qv, c.ie), s -> s[1] * s[2])) AS HUGEINT) AS dot,
           q.qn, c.n2
    FROM q, n c WHERE c.vec_id <> q.query_id
),
scored AS (
    SELECT query_id, neighbor_id,
           round(CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS sim
    FROM pairs
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_TOPK}
"""


_N_PLANES, _DIM = 16, 64


def q_rp_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rp_lsh_buckets(
        _embeddings(spark, sf_dir), "embedding", "vec_id",
        n_planes=_N_PLANES, dim=_DIM,
    )


def _bucket_expr(var: str) -> str:
    """DuckDB expression for the RP-LSH bucket of nano-list column ``var``."""
    w = lsh_planes(_N_PLANES, _DIM)
    terms = []
    for p in range(_N_PLANES):
        lit = "[" + ", ".join(str(int(v)) for v in w[p]) + "]"
        terms.append(
            f"(CASE WHEN CAST(list_sum(list_transform(list_zip({var}, {lit}), "
            f"s -> s[1] * s[2])) AS BIGINT) >= 0 "
            f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        )
    return "\n         + ".join(terms)


def _sql_rp_lsh_buckets() -> str:
    bucket = _bucket_expr("ie")
    return f"""
WITH e AS (
    SELECT vec_id,
           list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000000) AS BIGINT)) AS ie
    FROM embeddings
)
SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM e
"""


QUERIES = {
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "docs_exact_dedup": q_exact_dedup,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "simhash_fingerprints": q_simhash_fingerprints,
    "embedding_cosine_topk": q_embedding_cosine_topk,
    "rp_lsh_buckets": q_rp_lsh_buckets,
}

ORACLE_SQL = {
    "text_stats": SQL_TEXT_STATS,
    "lang_id": SQL_LANG_ID,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "docs_exact_dedup": SQL_EXACT_DEDUP,
    "minhash_lsh_pairs": _sql_minhash_lsh_pairs(),
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "simhash_fingerprints": _sql_simhash(),
    "embedding_cosine_topk": SQL_EMBEDDING_COSINE_TOPK,
    "rp_lsh_buckets": _sql_rp_lsh_buckets(),
}


# ---------------------------------------------------------------------------
# IVF approximate nearest neighbors (llm/similarity.py::ivf_topk).  The
# oracle replays the identical deterministic index (seed centroids =
# vec_id < n_cells), so approximate recall is value-checked exactly.
# ---------------------------------------------------------------------------

_IVF_CELLS, _IVF_PROBE = 16, 4

_NANO_CTE = """
WITH e0 AS (
    SELECT vec_id,
           list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000000) AS BIGINT)) AS vec
    FROM embeddings
),
e AS (SELECT vec_id, vec, CAST(list_sum(list_transform(vec, x -> x * x)) AS HUGEINT) AS n2 FROM e0)
"""

_LIST_DOT = "CAST(list_sum(list_transform(list_zip({a}, {b}), s -> s[1] * s[2])) AS HUGEINT)"


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.similarity import ivf_topk

    return ivf_topk(
        _embeddings(spark, sf_dir), "embedding", "vec_id",
        n_cells=_IVF_CELLS, nprobe=_IVF_PROBE, n_queries=_N_QUERIES, k=_TOPK,
    )


def _sql_ivf_topk(nprobe: int = _IVF_PROBE) -> str:
    dot_c = _LIST_DOT.format(a="e.vec", b="c.c_vec")
    dot_q = _LIST_DOT.format(a="p.q_vec", b="a.vec")
    return f"""{_NANO_CTE},
cents AS (
    SELECT vec_id AS cell_id, vec AS c_vec, n2 AS c_n2 FROM e
    WHERE vec_id < {_IVF_CELLS}
),
scored_cells AS (
    SELECT e.vec_id, e.vec, e.n2, c.cell_id,
           round(CAST({dot_c} AS DOUBLE) / sqrt(CAST(e.n2 AS DOUBLE) * CAST(c.c_n2 AS DOUBLE)), 6) AS csim
    FROM e, cents c
),
ranked_cells AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell_id ASC) AS crank
    FROM scored_cells
),
assign AS (SELECT vec_id, vec, n2, cell_id FROM ranked_cells WHERE crank = 1),
probe AS (
    SELECT vec_id AS query_id, vec AS q_vec, n2 AS q_n2, cell_id
    FROM ranked_cells WHERE vec_id < {_N_QUERIES} AND crank <= {nprobe}
),
cand AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           round(CAST({dot_q} AS DOUBLE) / sqrt(CAST(p.q_n2 AS DOUBLE) * CAST(a.n2 AS DOUBLE)), 6) AS sim
    FROM probe p JOIN assign a USING (cell_id)
    WHERE a.vec_id <> p.query_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM cand
)
SELECT query_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_TOPK}
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs: LSH-bucket candidates + exact
# re-rank (llm/similarity.py::embedding_neardup_pairs).
# ---------------------------------------------------------------------------

_NEARDUP_T = 0.99
_NEARDUP_N = 20  # vectors that get a perturbed twin (vec_id + 10000)


def _neardup_embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings + near-duplicate twins: vec_id < N copied to vec_id+10000
    with +0.01 on the first coordinate.  The testdata embeddings are
    near-orthogonal randoms (no natural near-dups), so the twins are what
    give the near-dup operator true positives to find — deterministically
    reproduced in the oracle."""
    emb = _embeddings(spark, sf_dir)
    as_double = F.transform("embedding", lambda v: v.cast("double"))
    base = emb.select("vec_id", as_double.alias("embedding"))
    pert = emb.filter(F.col("vec_id") < _NEARDUP_N).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0].cast("double") + F.lit(0.01)),
            F.slice(as_double, 2, _DIM - 1),
        ).alias("embedding"),
    )
    return base.unionByName(pert)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.similarity import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _neardup_embedding_corpus(spark, sf_dir), "embedding", "vec_id",
        threshold=_NEARDUP_T, n_planes=_N_PLANES, dim=_DIM,
    )


def _sql_embedding_neardup() -> str:
    dot = _LIST_DOT.format(a="a.vec", b="b.vec")
    return f"""
WITH emb2 AS (
    SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS embedding
    FROM embeddings
    UNION ALL
    SELECT vec_id + 10000,
           list_concat([CAST(embedding[1] AS DOUBLE) + 0.01],
                       list_transform(embedding[2:], v -> CAST(v AS DOUBLE)))
    FROM embeddings WHERE vec_id < {_NEARDUP_N}
),
e0 AS (
    SELECT vec_id,
           list_transform(embedding, v -> CAST(round(v * 1000000000) AS BIGINT)) AS vec
    FROM emb2
),
e AS (SELECT vec_id, vec, CAST(list_sum(list_transform(vec, x -> x * x)) AS HUGEINT) AS n2 FROM e0),
v AS (SELECT vec_id, vec, n2, CAST({_bucket_expr("vec")} AS BIGINT) AS bucket FROM e),
pairs AS (
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(CAST({dot} AS DOUBLE) / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)), 6) AS sim
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT a, b, sim FROM pairs WHERE sim >= {_NEARDUP_T}
"""


QUERIES["ivf_topk"] = q_ivf_topk
ORACLE_SQL["ivf_topk"] = _sql_ivf_topk()
QUERIES["embedding_neardup"] = q_embedding_neardup
ORACLE_SQL["embedding_neardup"] = _sql_embedding_neardup()


# ---------------------------------------------------------------------------
# Token counting: whitespace + BPE-ish regex (llm/text.py::token_counts).
# ---------------------------------------------------------------------------

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import token_counts

    return token_counts(_documents(spark, sf_dir), "text", "doc_id")


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       CAST(length(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
       CAST(length(regexp_extract_all(text, ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""

QUERIES["token_counts"] = q_token_counts
ORACLE_SQL["token_counts"] = SQL_TOKEN_COUNTS


# ---------------------------------------------------------------------------
# Near-dup dedup clusters: minhash-LSH pairs -> connected components
# (ops/graph.py) -> per-doc cluster id (= min doc id in component).  The
# iterative Spark loop is value-checked against DuckDB's recursive CTE
# transitive closure.
# ---------------------------------------------------------------------------

def q_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.ops.graph import connected_components

    sig = minhash_signatures(
        _neardup_corpus(spark, sf_dir), "text", "doc_id", k=_K, shingle_n=3
    )
    pairs = lsh_candidate_pairs(sig, k=_K, bands=_BANDS, min_match=_MIN_MATCH)
    return connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def _sql_neardup_clusters() -> str:
    pairs_sql = _sql_minhash_lsh_pairs()
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
und AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(v, r) AS (
    SELECT a, a FROM und
    UNION
    SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.v
)
SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v
"""


QUERIES["neardup_clusters"] = q_neardup_clusters
ORACLE_SQL["neardup_clusters"] = _sql_neardup_clusters()


# ---------------------------------------------------------------------------
# Sentence segmentation: JVM-side split + posexplode (the Spark-first path;
# a Python UDTF would move every byte through the interpreter).
# ---------------------------------------------------------------------------

def q_doc_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).filter(F.col("doc_id") < 50)
    parts = F.split(F.col("text"), r"[.!?]+\s*")
    return (
        d.select("doc_id", F.posexplode(parts).alias("sent_idx", "sentence"))
        .filter(F.length(F.trim(F.col("sentence"))) > 0)
        .select(
            "doc_id",
            F.col("sent_idx").cast("bigint").alias("sent_idx"),
            F.trim(F.col("sentence")).alias("sentence"),
        )
    )


SQL_DOC_SENTENCES = r"""
WITH s AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(text, '[.!?]+\s*')) AS sentence,
         generate_subscripts(regexp_split_to_array(text, '[.!?]+\s*'), 1) - 1 AS sent_idx
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, CAST(sent_idx AS BIGINT) AS sent_idx, trim(sentence) AS sentence
FROM s WHERE length(trim(sentence)) > 0
"""

QUERIES["doc_sentences"] = q_doc_sentences
ORACLE_SQL["doc_sentences"] = SQL_DOC_SENTENCES


# ---------------------------------------------------------------------------
# SimHash near-dup pairs: pigeonhole banding (hamming <= bands-1 implies one
# identical band) makes the equi-join exact-recall; the oracle brute-forces
# the O(n^2) pair space, which only the oracle can afford.
# ---------------------------------------------------------------------------

def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_neardup_pairs(
        _documents(spark, sf_dir), "text", "doc_id", bands=4, max_hamming=3
    )


def _sql_simhash_neardup() -> str:
    return f"""
WITH fp AS ({_sql_simhash()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


QUERIES["simhash_neardup"] = q_simhash_neardup
ORACLE_SQL["simhash_neardup"] = _sql_simhash_neardup()


# ---------------------------------------------------------------------------
# Deterministic sampling / splits (ops/sampling.py): md5-keyed, so the same
# row lands on the same side in Spark and in the oracle — df.sample() could
# never be value-checked like this.
# ---------------------------------------------------------------------------

def _bucket_sql(salt: str, key_expr: str) -> str:
    return f"{duckdb_md5_int_sql([repr(salt), key_expr])} % 1000"


def q_docs_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    return deterministic_sample(d, "doc_id", 100, salt="sample").select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )


SQL_DOCS_SAMPLE = f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents WHERE {_bucket_sql('sample', 'doc_id')} < 100
"""


def q_events_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.io.sources import read_events

    ev = read_events(spark, sf_dir)
    return (
        ev.withColumn("split", train_test_split_col("user_id", 200))
        .groupBy("split", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


SQL_EVENTS_TRAIN_TEST = f"""
SELECT CASE WHEN {_bucket_sql('split', 'user_id')} < 200
            THEN 'test' ELSE 'train' END AS split,
       event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY 1, 2
"""


def q_events_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.io.sources import read_events

    ev = read_events(spark, sf_dir)
    return (
        stratified_sample(
            ev,
            "event_type",
            "event_id",
            {"purchase": 1000, "click": 100, "view": 50},
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


SQL_EVENTS_STRATIFIED = f"""
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
WHERE {_bucket_sql('stratified', 'event_id')} <
      CASE event_type WHEN 'purchase' THEN 1000
                      WHEN 'click' THEN 100
                      WHEN 'view' THEN 50 ELSE 0 END
GROUP BY event_type
"""


for _n4, _f4, _s4 in [
    ("docs_sample", q_docs_sample, SQL_DOCS_SAMPLE),
    ("events_train_test", q_events_train_test, SQL_EVENTS_TRAIN_TEST),
    ("events_stratified", q_events_stratified, SQL_EVENTS_STRATIFIED),
]:
    QUERIES[_n4] = _f4
    ORACLE_SQL[_n4] = _s4


# ---------------------------------------------------------------------------
# Flagship training-data prep pipeline: quality filter -> language gate ->
# exact dedup -> near-dup removal -> deterministic sample, composed from
# the same operators a user would chain.  Every stage is the scale-shape
# version (broadcastable key sets, banded near-dup join, shuffle-free
# sampling filter); the oracle recomputes the whole chain in SQL.
# ---------------------------------------------------------------------------

def q_docs_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.cache import persist_tracked

    d = _documents(spark, sf_dir)
    stats = text_stats(d, "text", "doc_id")
    keep = stats.filter(
        (F.col("n_tokens") >= 20) & (F.col("stop_permille") >= 30)
    ).select("doc_id", "n_tokens")
    # Persist at each fan-out: the survivor frames feed 2-3 downstream
    # branches (fingerprint, near-dup, final projection) — without the
    # persist every branch re-reads and re-tokenizes the full corpus
    # (the plan showed 8 text scans; with persists, one).  Measured cost
    # at sf0.1 is ~0.3-0.5s of job barriers in a warm session — a fixed
    # overhead, while the scans it removes grow with the corpus.  Both
    # persists are tracked for query-boundary release (lakeforge/cache.py).
    docs = persist_tracked(d.join(keep, "doc_id"))

    fp = doc_fingerprint(docs, "text", "doc_id")
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    # exact-dedup canonical survivors
    docs = persist_tracked(docs.join(canon.select("doc_id"), "doc_id"))

    pairs = simhash_neardup_pairs(docs, "text", "doc_id", bands=4, max_hamming=3)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    docs = docs.join(dropped, "doc_id", "left_anti")  # near-dup removal

    return deterministic_sample(docs, "doc_id", 500, salt="train").select(
        "doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens")
    )


def _sql_docs_training_pipeline() -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
q AS (SELECT doc_id, text, toks, len(toks) AS n_tokens,
             CASE WHEN len(toks) = 0 THEN 0
                  ELSE (len(list_filter(toks, x -> x IN ({_STOP_SQL}))) * 1000) // len(toks)
             END AS pm
      FROM t),
keep AS (SELECT * FROM q WHERE n_tokens >= 20 AND pm >= 30),
fp AS (SELECT doc_id, {_md5_60("array_to_string(toks, ' ')")} AS fp FROM keep),
canon AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp),
surv AS (SELECT k.* FROM keep k JOIN canon c ON k.doc_id = c.doc_id),
shp AS ({_sql_simhash("surv")}),
dropped AS (
  SELECT DISTINCT b.doc_id AS doc_id
  FROM shp a JOIN shp b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
)
SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens
FROM surv s
WHERE s.doc_id NOT IN (SELECT doc_id FROM dropped)
  AND {_bucket_sql('train', 's.doc_id')} < 500
"""


QUERIES["docs_training_pipeline"] = q_docs_training_pipeline
ORACLE_SQL["docs_training_pipeline"] = _sql_docs_training_pipeline()


# ---------------------------------------------------------------------------
# PII scrubbing (llm/text.py::scrub_pii).  The synthetic corpus contains no
# contact strings, so the query first APPENDS a deterministic one per doc
# (identically in both engines) — making the redaction counts and the
# cleaned-text hash discriminating rather than vacuously zero.
# ---------------------------------------------------------------------------

def q_docs_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import scrub_pii

    d = _documents(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            (F.col("doc_id") % 10000).cast("string"),
            F.lit(" now"),
        ).alias("text"),
    )
    out = scrub_pii(d, "text", "doc_id")
    return out.select(
        "doc_id", "n_emails", "n_phones", F.md5("text").alias("clean_md5")
    )


SQL_DOCS_SCRUB_PII = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555-'
              || CAST(doc_id % 10000 AS VARCHAR) || ' now' AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3,8}')) AS BIGINT) AS n_phones,
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]{3}-[0-9]{3,8}', '<PHONE>', 'g') AS text
  FROM aug
)
SELECT doc_id, n_emails, n_phones, md5(text) AS clean_md5 FROM scrubbed
"""

QUERIES["docs_scrub_pii"] = q_docs_scrub_pii
ORACLE_SQL["docs_scrub_pii"] = SQL_DOCS_SCRUB_PII


# ---------------------------------------------------------------------------
# Multimodal plumbing, driver-checkable (llm/multimodal.py): no media table
# exists in testdata, so the query synthesizes one in-query from documents
# (text bytes as the opaque payload, deterministic metadata), runs the REAL
# Arrow-batched mapInPandas featurizer + the audio-chunk / frame-sample
# operators, and oracles every deterministic output column in DuckDB:
#   n_bytes   — flows through the featurizer's output batch (proves the
#               mapInPandas stage executed),
#   feat_l1   — sum over the Python-computed L1-normed feature histogram
#               (1.0 for any non-empty payload),
#   n_chunks  — ceil(duration/10s) audio chunk-boundary arithmetic,
#   n_frames  — 1s frame-sampling row count.
# ---------------------------------------------------------------------------

def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.multimodal import chunk_audio, extract_features, sample_frames

    docs = _documents(spark, sf_dir)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    nb = F.octet_length("text").cast("long")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit(None).cast("string").alias("mime"),
        F.when(kind == "image", nb % 640 + 1).cast("long").alias("width"),
        F.when(kind == "image", nb % 480 + 1).cast("long").alias("height"),
        F.when(kind != "image", (nb * 7) % 45000 + 500)
        .cast("long")
        .alias("duration_ms"),
    )
    feats = extract_features(media).select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 4
        ).alias("feat_l1"),
    )
    chunks = chunk_audio(media, chunk_ms=10_000).groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks")
    )
    frames = sample_frames(media, every_ms=1_000).groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames")
    )
    return (
        feats.join(chunks, "media_id", "left")
        .join(frames, "media_id", "left")
        .select(
            "media_id",
            "kind",
            "n_bytes",
            "feat_l1",
            F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
            F.coalesce("n_frames", F.lit(0)).cast("bigint").alias("n_frames"),
        )
    )


SQL_MEDIA_FEATURES = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
d AS (SELECT *, (n_bytes * 7) % 45000 + 500 AS dur FROM m)
SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(CASE WHEN n_bytes > 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS feat_l1,
       CAST(CASE WHEN kind = 'audio' THEN CAST(ceil(dur / 10000.0) AS BIGINT) ELSE 0 END AS BIGINT) AS n_chunks,
       CAST(CASE WHEN kind = 'video' THEN GREATEST((dur // 1000) - 1, 0) + 1 ELSE 0 END AS BIGINT) AS n_frames
FROM d
"""

QUERIES["media_features"] = q_media_features
ORACLE_SQL["media_features"] = SQL_MEDIA_FEATURES


# ---------------------------------------------------------------------------
# REAL media header decode (llm/multimodal.py round-3 review #5): each doc
# becomes a genuine binary payload — a 24-bit BMP (even doc_id) or PCM WAV
# (odd doc_id) with dims/timing derived deterministically from doc_id, plus
# a corrupt-payload class (doc_id % 101 == 0) — encoded with struct inside
# one mapInPandas stage and decoded back by ``decode_media_headers``'s
# pure-struct parsers in another.  The oracle recomputes the expected
# metadata from the same doc_id formulas: equality proves the bytes
# round-tripped through real header encode AND decode (a header-field
# mistake on either side would shift every value).  Corrupt rows must come
# back fmt=NULL — the no-poison-pill contract.
# ---------------------------------------------------------------------------


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import pandas as pd

    from lakeforge.llm.multimodal import (
        decode_media_headers,
        encode_bmp,
        encode_wav,
    )

    docs = _documents(spark, sf_dir).select("doc_id")
    schema = "media_id bigint, content binary"

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 101 == 0:
                    content = b"\x00corrupt-payload\x00" * 3
                elif did % 2 == 0:
                    content = encode_bmp(did % 640 + 1, did % 480 + 1)
                else:
                    content = encode_wav(
                        n_samples=(did * 37) % 160_000 + 1000,
                        sample_rate=8000 * (did % 3 + 1),
                    )
                out.append((did, content))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    media = docs.mapInPandas(encode, schema=schema)
    return decode_media_headers(media)


SQL_MEDIA_DECODE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 101 = 0 THEN NULL
            WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
       CAST(CASE WHEN doc_id % 101 <> 0 AND doc_id % 2 = 0
                 THEN doc_id % 640 + 1 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 101 <> 0 AND doc_id % 2 = 0
                 THEN doc_id % 480 + 1 END AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 101 <> 0 AND doc_id % 2 = 1
                 THEN 8000 * (doc_id % 3 + 1) END AS BIGINT) AS sample_rate,
       CAST(CASE WHEN doc_id % 101 <> 0 AND doc_id % 2 = 1
                 THEN (doc_id * 37) % 160000 + 1000 END AS BIGINT) AS n_samples,
       CAST(CASE WHEN doc_id % 101 <> 0 AND doc_id % 2 = 1
                 THEN ((doc_id * 37) % 160000 + 1000) * 1000
                      // (8000 * (doc_id % 3 + 1)) END AS BIGINT) AS duration_ms
FROM documents
"""

QUERIES["media_decode"] = q_media_decode
ORACLE_SQL["media_decode"] = SQL_MEDIA_DECODE


# ---------------------------------------------------------------------------
# REAL media PAYLOAD decode (VERDICT r04 #2): beyond the headers, each doc
# carries a full deterministic payload — even doc_id: a 24-bit BMP whose
# pixel byte at (y, x, channel c) is (doc_id%97 + y + x + c), rows written
# BOTTOM-UP with the format's 4-byte stride padding; odd doc_id: 16-bit PCM
# WAV whose sample i is (doc_id%1000 - 500 + i%100); every 101st doc is
# corrupt.  ``decode_media_stats`` parses the pixel rows / PCM frames with
# pure numpy and emits exact integer count/sum/min/max.  The oracle
# recomputes every stat in closed form from the same doc_id formulas —
# equality proves byte-exact payload round-trip: mishandling the stride
# padding, the bottom-up flip, the data offset, or int16 endianness would
# shift sums on every row.  Corrupt rows must come back all-NULL.
# ---------------------------------------------------------------------------


def _media_payload(did: int) -> bytes:
    """Deterministic per-doc payload shared by the media_* queries:
    even doc_id -> 24-bit BMP with pixel byte (did%97 + y + x + c),
    odd -> 16-bit PCM WAV with sample (did%1000-500 + i%100),
    every 101st -> corrupt bytes.  Every stat the oracles check derives
    in closed form from these formulas."""
    import numpy as np

    from lakeforge.llm.multimodal import encode_bmp, encode_wav

    if did % 101 == 0:
        return b"BM\x00corrupt-but-magic" * 2  # bad header
    if did % 2 == 0:
        w, h = did % 64 + 1, did % 48 + 1
        base = did % 97
        y = np.arange(h)[:, None, None]
        x = np.arange(w)[None, :, None]
        c = np.arange(3)[None, None, :]
        img = (base + y + x + c).astype(np.uint8)  # top-down
        row_bytes = (w * 3 + 3) & ~3
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, : w * 3] = img[::-1].reshape(h, w * 3)  # bottom-up
        return encode_bmp(w, h, rows.tobytes())
    n = (did * 37) % 4000 + 100
    base = did % 1000 - 500
    samples = (base + np.arange(n) % 100).astype("<i2")
    return encode_wav(
        n_samples=n,
        sample_rate=8000 * (did % 3 + 1),
        data_prefix=samples.tobytes(),
    )


def _media_fixture(spark: SparkSession, sf_dir: str, parity: int | None = None) -> DataFrame:
    """(media_id, content) frame of deterministic payloads, generated
    in-executor; ``parity`` restricts to even (0=BMP) / odd (1=WAV)."""
    from collections.abc import Iterator

    import pandas as pd

    docs = _documents(spark, sf_dir).select("doc_id")
    if parity is not None:
        docs = docs.filter(F.col("doc_id") % 2 == parity)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [(int(d), _media_payload(int(d))) for d in pdf["doc_id"]]
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return docs.mapInPandas(encode, schema="media_id bigint, content binary")


def q_media_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.multimodal import decode_media_stats

    return decode_media_stats(_media_fixture(spark, sf_dir))


SQL_MEDIA_PIXELS = """
WITH p AS (
  SELECT doc_id,
         doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h, doc_id % 97 AS pb,
         (doc_id * 37) % 4000 + 100 AS n, doc_id % 1000 - 500 AS sb
  FROM documents
)
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 101 = 0 THEN NULL
            WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
       CAST(CASE WHEN doc_id % 101 = 0 THEN NULL
                 WHEN doc_id % 2 = 0 THEN 3 * h * w
                 ELSE n END AS BIGINT) AS n_values,
       CAST(CASE WHEN doc_id % 101 = 0 THEN NULL
                 WHEN doc_id % 2 = 0 THEN
                      3 * h * w * pb + 3 * w * (h * (h - 1) // 2)
                      + 3 * h * (w * (w - 1) // 2) + 3 * h * w
                 ELSE n * sb + (n // 100) * 4950
                      + (n % 100) * ((n % 100) - 1) // 2
            END AS BIGINT) AS val_sum,
       CAST(CASE WHEN doc_id % 101 = 0 THEN NULL
                 WHEN doc_id % 2 = 0 THEN pb ELSE sb END AS BIGINT) AS val_min,
       CAST(CASE WHEN doc_id % 101 = 0 THEN NULL
                 WHEN doc_id % 2 = 0 THEN pb + h + w
                 ELSE sb + 99 END AS BIGINT) AS val_max
FROM p
"""

QUERIES["media_pixels"] = q_media_pixels
ORACLE_SQL["media_pixels"] = SQL_MEDIA_PIXELS


# ---------------------------------------------------------------------------
# REAL image downsampling (llm/multimodal.py::downsample_bmp): decode ->
# 2x2 integer mean-pool -> re-encode -> decode again, all real byte-level
# transforms.  The linear pixel formula survives pooling exactly: a 2x2
# block of (base + y + x + c) means to (base+1 + 2j + 2i + c) with no
# remainder, so the oracle states the pooled image's stats in closed form.
# Images smaller than one block (w==1 or h==1) and corrupt payloads must
# come back as all-NULL rows — two distinct failure paths, one contract.
# ---------------------------------------------------------------------------


def q_media_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.multimodal import decode_media_stats, downsample_media

    media = _media_fixture(spark, sf_dir, parity=0)  # BMPs (+ even corrupt)
    return decode_media_stats(downsample_media(media, factor=2))


SQL_MEDIA_DOWNSAMPLE = """
WITH p AS (
  SELECT doc_id,
         (doc_id % 64 + 1) // 2 AS W, (doc_id % 48 + 1) // 2 AS H,
         doc_id % 97 + 1 AS pb
  FROM documents WHERE doc_id % 2 = 0
),
ok AS (SELECT *, (doc_id % 101 <> 0 AND W > 0 AND H > 0) AS good FROM p)
SELECT doc_id AS media_id,
       CASE WHEN good THEN 'bmp' END AS fmt,
       CAST(CASE WHEN good THEN 3 * H * W END AS BIGINT) AS n_values,
       CAST(CASE WHEN good THEN
                 3 * H * W * pb + 3 * W * H * (H - 1)
                 + 3 * H * W * (W - 1) + 3 * H * W
            END AS BIGINT) AS val_sum,
       CAST(CASE WHEN good THEN pb END AS BIGINT) AS val_min,
       CAST(CASE WHEN good THEN pb + 2 * (H - 1) + 2 * (W - 1) + 2
            END AS BIGINT) AS val_max
FROM ok
"""

QUERIES["media_downsample"] = q_media_downsample
ORACLE_SQL["media_downsample"] = SQL_MEDIA_DOWNSAMPLE


# ---------------------------------------------------------------------------
# Audio energy over REAL decoded PCM (llm/multimodal.py::wav_energy): the
# integer core of RMS loudness (sum of squares) plus peak amplitude,
# oracle-checked in closed form — Sum (b + i%100)^2 decomposes into
# n*b^2 + 2b*S1 + S2 with S1/S2 the triangular / square-pyramidal sums
# over full cycles of 100 plus the ragged tail.
# ---------------------------------------------------------------------------


def q_media_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.multimodal import wav_energy

    media = _media_fixture(spark, sf_dir, parity=1)  # WAVs (+ odd corrupt)
    return wav_energy(media)


SQL_MEDIA_ENERGY = """
WITH p AS (
  SELECT doc_id,
         (doc_id * 37) % 4000 + 100 AS n,
         doc_id % 1000 - 500 AS b
  FROM documents WHERE doc_id % 2 = 1
),
q AS (SELECT *, n // 100 AS nf, n % 100 AS r FROM p),
s AS (
  SELECT *,
         nf * 4950 + r * (r - 1) // 2 AS s1,
         nf * 328350 + (r - 1) * r * (2 * r - 1) // 6 AS s2
  FROM q
)
SELECT doc_id AS media_id,
       CAST(CASE WHEN doc_id % 101 <> 0 THEN n END AS BIGINT) AS n_samples,
       CAST(CASE WHEN doc_id % 101 <> 0
                 THEN n * b * b + 2 * b * s1 + s2 END AS BIGINT) AS sq_sum,
       CAST(CASE WHEN doc_id % 101 <> 0
                 THEN GREATEST(ABS(b), ABS(b + 99)) END AS BIGINT) AS peak
FROM s
"""

QUERIES["media_energy"] = q_media_energy
ORACLE_SQL["media_energy"] = SQL_MEDIA_ENERGY


# ---------------------------------------------------------------------------
# Benchmark decontamination (llm/decontam.py): the benchmark set is
# synthesized in-query (every 97th doc) so the overlap is non-trivial —
# benchmark docs self-hit 100%, and the small synthetic vocabulary makes
# chance 5-gram collisions exercise the min_hits threshold.  The oracle
# mirrors the md5-32 shingle hashing exactly (collisions included).
# ---------------------------------------------------------------------------

def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.decontam import contamination_check

    docs = _documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_check(
        docs, bench, "text", "doc_id", shingle_n=5, min_hits=3
    )


SQL_DOCS_DECONTAMINATE = f"""
WITH corpus AS (SELECT doc_id, text FROM documents),
{_shingle_ctes(5)},
h AS (SELECT doc_id, {_md5_32("shingle")} AS h FROM sh),
bh AS (SELECT DISTINCT h FROM h WHERE doc_id % 97 = 0),
marked AS (SELECT h.doc_id, CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END AS hit
           FROM h LEFT JOIN bh ON h.h = bh.h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(hit) AS BIGINT) AS n_hits,
       SUM(hit) >= 3 AS contaminated
FROM marked GROUP BY doc_id
"""

QUERIES["docs_decontaminate"] = q_docs_decontaminate
ORACLE_SQL["docs_decontaminate"] = SQL_DOCS_DECONTAMINATE


# ---------------------------------------------------------------------------
# Sequence packing (llm/packing.py): the oracle is the NAIVE global-window
# cumsum — the Spark side must reproduce it exactly through the
# distributed two-level prefix sum (per-chunk window + chunk-offset
# rollup + broadcast join).
# ---------------------------------------------------------------------------

def q_docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.packing import pack_sequences
    from lakeforge.llm.text import tokens_col

    d = _documents(spark, sf_dir).select(
        "doc_id", F.size(tokens_col("text")).alias("n_tokens")
    )
    return pack_sequences(d, "n_tokens", "doc_id", seq_len=512, chunk_size=64)


SQL_DOCS_PACK_SEQUENCES = f"""
WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_start
      FROM t)
SELECT doc_id, n_tokens, tok_start,
       CAST(tok_start // 512 AS BIGINT) AS bin_id,
       CAST(tok_start % 512 AS BIGINT) AS bin_offset
FROM c
"""

QUERIES["docs_pack_sequences"] = q_docs_pack_sequences
ORACLE_SQL["docs_pack_sequences"] = SQL_DOCS_PACK_SEQUENCES


# ---------------------------------------------------------------------------
# Within-document repetition profile (llm/text.py::repetition_stats) —
# the Gopher-style "one bigram dominates" quality rule.
# ---------------------------------------------------------------------------

def q_docs_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import repetition_stats

    return repetition_stats(_documents(spark, sf_dir), "text", "doc_id")


SQL_DOCS_REPETITION_SCORE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)),
c AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
       CAST(MAX(c) AS BIGINT) AS top_bigram_count,
       MAX(c) * 10 > SUM(c) AS repetitive
FROM c GROUP BY doc_id
"""

QUERIES["docs_repetition_score"] = q_docs_repetition_score
ORACLE_SQL["docs_repetition_score"] = SQL_DOCS_REPETITION_SCORE


# ---------------------------------------------------------------------------
# Reproducible training order + mixture weighting (ops/sampling.py): the
# per-epoch shuffle key is a pure hash (any engine, any layout -> same
# permutation), and source mixture weights are per-class keep rates.
# ---------------------------------------------------------------------------

def q_docs_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.ops.sampling import epoch_shuffle_key

    d = _documents(spark, sf_dir)
    return d.select(
        "doc_id",
        epoch_shuffle_key("doc_id", 1).alias("ord_epoch1"),
        epoch_shuffle_key("doc_id", 2).alias("ord_epoch2"),
        (epoch_shuffle_key("doc_id", 1) % 32).cast("bigint").alias("reader_shard"),
    )


def _epoch_sql(epoch: int) -> str:
    return duckdb_md5_int_sql(["'epoch'", f"'{epoch}'", "doc_id"])


SQL_DOCS_EPOCH_SHUFFLE = f"""
SELECT doc_id,
       {_epoch_sql(1)} AS ord_epoch1,
       {_epoch_sql(2)} AS ord_epoch2,
       CAST({_epoch_sql(1)} % 32 AS BIGINT) AS reader_shard
FROM documents
"""

QUERIES["docs_epoch_shuffle"] = q_docs_epoch_shuffle
ORACLE_SQL["docs_epoch_shuffle"] = SQL_DOCS_EPOCH_SHUFFLE


def q_docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture weighting: per-source keep rates (the pretraining
    recipe knob), keyed by doc so the sample is stable across runs."""
    d = _documents(spark, sf_dir)
    return (
        stratified_sample(
            d, "source", "doc_id",
            {"src0": 1000, "src1": 500, "src2": 250},
            default_permille=100,
            salt="mixture",
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


SQL_DOCS_MIXTURE_SAMPLE = f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
WHERE {_bucket_sql('mixture', 'doc_id')} <
      CASE source WHEN 'src0' THEN 1000
                  WHEN 'src1' THEN 500
                  WHEN 'src2' THEN 250 ELSE 100 END
GROUP BY source
"""

QUERIES["docs_mixture_sample"] = q_docs_mixture_sample
ORACLE_SQL["docs_mixture_sample"] = SQL_DOCS_MIXTURE_SAMPLE


# ---------------------------------------------------------------------------
# Lexical relevance: tf-idf term salience and BM25 search (llm/ranking.py).
# Scores are doubles rounded to 4 places in BOTH engines (geo_mean_price
# convention) so the driver's value hash is stable; BM25's k1/b are
# exactly-representable binary fractions so every constant is the same
# double on both sides.
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ["spark", "join", "window"]


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.ranking import tfidf_top_terms

    return tfidf_top_terms(_documents(spark, sf_dir), k=3)


SQL_TFIDF_TOP_TERMS = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
           round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE)), 4) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
    FROM scored
)
SELECT doc_id, term, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
"""


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.ranking import bm25_topk

    return bm25_topk(_documents(spark, sf_dir), BM25_QUERY_TERMS, topk=20)


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

SQL_BM25_SEARCH = f"""
WITH toks AS (
    SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS dl, unnest({_TOKS}) AS term
    FROM documents
),
hits AS (SELECT * FROM toks WHERE term IN ({_BM25_TERMS_SQL})),
tfq AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
        FROM hits GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfq GROUP BY term),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           avg(CAST(len({_TOKS}) AS BIGINT)) AS avgdl
    FROM documents
),
scored AS (
    SELECT t.doc_id,
           round(sum(
               ln(1.0 + CAST(s.n_docs - d.df + 0.5 AS DOUBLE)
                        / CAST(d.df + 0.5 AS DOUBLE))
               * (CAST(t.tf AS DOUBLE) * 2.5)
                 / (CAST(t.tf AS DOUBLE)
                    + 1.5 * (0.25 + 0.75 * CAST(t.dl AS DOUBLE) / s.avgdl))
           ), 4) AS bm25
    FROM tfq t JOIN dfq d USING (term) CROSS JOIN stats s
    GROUP BY t.doc_id
)
SELECT doc_id, bm25 FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20
"""

QUERIES["tfidf_top_terms"] = q_tfidf_top_terms
ORACLE_SQL["tfidf_top_terms"] = SQL_TFIDF_TOP_TERMS
QUERIES["bm25_search"] = q_bm25_search
ORACLE_SQL["bm25_search"] = SQL_BM25_SEARCH


# ---------------------------------------------------------------------------
# Cross-document boilerplate (llm/boilerplate.py): bigrams shared by >= 8%
# of the corpus, and each document's boilerplate coverage.  Thresholds are
# integer per-mille math so both engines compute the identical cutoff.
# ---------------------------------------------------------------------------

_BOILER_GRAMS = f"""
toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
grams AS (
    SELECT DISTINCT doc_id, array_to_string(w[i:i+1], ' ') AS ngram
    FROM toks, UNNEST(range(1, greatest(len(w), 1))) AS t(i)
),
dfreq AS (SELECT ngram, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY ngram),
cut AS (
    SELECT CAST((count(*) * 80 + 999) // 1000 AS BIGINT) AS min_df
    FROM documents
)
"""


def q_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.boilerplate import boilerplate_ngrams

    return boilerplate_ngrams(
        _documents(spark, sf_dir), "text", "doc_id", n=2, min_df_permille=80
    )


SQL_BOILERPLATE_NGRAMS = f"""
WITH {_BOILER_GRAMS}
SELECT ngram, df FROM dfreq, cut WHERE df >= min_df
"""


def q_docs_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.boilerplate import boilerplate_coverage

    return boilerplate_coverage(
        _documents(spark, sf_dir), "text", "doc_id", n=2, min_df_permille=80
    )


SQL_DOCS_BOILERPLATE = f"""
WITH {_BOILER_GRAMS},
boiler AS (SELECT ngram FROM dfreq, cut WHERE df >= min_df),
per_doc AS (
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(b.ngram) AS BIGINT) AS n_boiler
    FROM grams g LEFT JOIN boiler b USING (ngram)
    GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_boiler, 0) AS BIGINT) AS n_boiler,
       CAST(CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN 0
                 ELSE (p.n_boiler * 1000) // p.n_grams END AS BIGINT)
           AS boiler_permille
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

QUERIES["boilerplate_ngrams"] = q_boilerplate_ngrams
ORACLE_SQL["boilerplate_ngrams"] = SQL_BOILERPLATE_NGRAMS
QUERIES["docs_boilerplate"] = q_docs_boilerplate
ORACLE_SQL["docs_boilerplate"] = SQL_DOCS_BOILERPLATE


# ---------------------------------------------------------------------------
# Sliding-window document chunking (llm/packing.py::chunk_documents):
# context-window prep for long docs.  Map-only (zero shuffles).
# ---------------------------------------------------------------------------


def q_docs_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.packing import chunk_documents

    return chunk_documents(
        _documents(spark, sf_dir), "text", "doc_id", window=16, stride=12
    )


SQL_DOCS_CHUNKS = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS w FROM documents),
c AS (
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           w[i*12+1 : i*12+16] AS ch
    FROM toks,
         UNNEST(range(0, CASE WHEN len(w) > 16
                              THEN (len(w) - 16 + 11) // 12
                              ELSE 0 END + 1)) AS t(i)
    WHERE len(w) > 0
)
SELECT doc_id, chunk_id, CAST(len(ch) AS BIGINT) AS n_chunk_tokens,
       array_to_string(ch, ' ') AS chunk_text
FROM c
"""

QUERIES["docs_chunks"] = q_docs_chunks
ORACLE_SQL["docs_chunks"] = SQL_DOCS_CHUNKS


# ---------------------------------------------------------------------------
# Exact-arithmetic k-means (llm/clustering.py::kmeans_assignments): Lloyd's
# iterations as DataFrame ops.  The oracle unrolls the SAME fixed number of
# iterations as CTEs — micro-unit integer distances and one-double-division
# centroid updates make every iteration bit-identical across engines, so an
# ITERATIVE ML algorithm gets a full value oracle.
# ---------------------------------------------------------------------------

_KMEANS_K = 8
_KMEANS_ITERS = 3


def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.clustering import kmeans_assignments

    emb = base_parquet(spark, f"{sf_dir}/embeddings.parquet")
    return kmeans_assignments(emb, k=_KMEANS_K, iters=_KMEANS_ITERS)


def _sql_kmeans(k: int, iters: int) -> str:
    ctes = [
        "base AS (SELECT vec_id, list_transform(embedding,"
        " v -> CAST(round(CAST(v AS DOUBLE)*1000000) AS BIGINT)) AS vec"
        " FROM embeddings)",
        "long AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos,"
        " unnest(vec) AS x FROM base)",
        f"c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster, pos, x AS c"
        f" FROM long WHERE vec_id < {k})",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f"a{i} AS (SELECT l.vec_id, c.cluster,"
            f" SUM((l.x - c.c)*(l.x - c.c)) AS d2"
            f" FROM long l JOIN {prev} c USING (pos)"
            f" GROUP BY l.vec_id, c.cluster)"
        )
        ctes.append(
            f"s{i} AS (SELECT vec_id, cluster FROM"
            f" (SELECT vec_id, cluster,"
            f" row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)"
            f" AS rn FROM a{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"c{i} AS (SELECT s.cluster, l.pos,"
            f" CAST(round(CAST(SUM(l.x) AS DOUBLE) /"
            f" CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c"
            f" FROM long l JOIN s{i} s USING (vec_id)"
            f" GROUP BY s.cluster, l.pos)"
        )
        prev = f"c{i}"
    final = iters + 1
    ctes.append(
        f"a{final} AS (SELECT l.vec_id, c.cluster,"
        f" SUM((l.x - c.c)*(l.x - c.c)) AS d2"
        f" FROM long l JOIN {prev} c USING (pos)"
        f" GROUP BY l.vec_id, c.cluster)"
    )
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT vec_id, cluster, CAST(d2 AS BIGINT) AS d2
FROM (SELECT vec_id, cluster, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster) AS rn
      FROM a{final})
WHERE rn = 1
"""
    )


QUERIES["kmeans_embeddings"] = q_kmeans_embeddings
ORACLE_SQL["kmeans_embeddings"] = _sql_kmeans(_KMEANS_K, _KMEANS_ITERS)


# ---------------------------------------------------------------------------
# Character-entropy quality scoring (llm/text.py::char_entropy).
# ---------------------------------------------------------------------------


def q_docs_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import char_entropy

    return char_entropy(_documents(spark, sf_dir), "text", "doc_id")


SQL_DOCS_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
counts AS (
  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
),
agg AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
         SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS s
  FROM counts GROUP BY doc_id
)
SELECT doc_id, n_chars,
       round(log2(CAST(n_chars AS DOUBLE)) - s / CAST(n_chars AS DOUBLE), 6)
           AS entropy_bits
FROM agg WHERE n_chars > 0
"""

QUERIES["docs_char_entropy"] = q_docs_char_entropy
ORACLE_SQL["docs_char_entropy"] = SQL_DOCS_CHAR_ENTROPY


# ---------------------------------------------------------------------------
# Deterministic k-fold splits (ops/sampling.py::kfold_col) and hard-negative
# mining (llm/similarity.py::hard_negative_topk).
# ---------------------------------------------------------------------------

_KFOLD_K = 5


def q_docs_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.ops.sampling import kfold_col

    return _documents(spark, sf_dir).select(
        "doc_id",
        kfold_col("doc_id", _KFOLD_K, salt="cv").alias("fold"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


SQL_DOCS_KFOLD = f"""
SELECT doc_id,
       CAST({_bucket_sql('cv', 'doc_id')} % {_KFOLD_K} AS BIGINT) AS fold,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


_HN_QUERIES, _HN_K = 20, 5


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.similarity import hard_negative_topk

    emb = _embeddings(spark, sf_dir)
    return hard_negative_topk(
        emb.filter(F.col("vec_id") < _HN_QUERIES),
        emb,
        "embedding",
        "vec_id",
        "label",
        k=_HN_K,
    )


SQL_HARD_NEGATIVES = f"""
WITH e AS (
    SELECT vec_id, label,
           list_transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000000) AS BIGINT)) AS ie
    FROM embeddings
),
n AS (SELECT vec_id, label, ie,
             CAST(list_sum(list_transform(ie, x -> x * x)) AS HUGEINT) AS n2
      FROM e),
q AS (SELECT vec_id AS query_id, label AS q_label, ie AS qv, n2 AS qn
      FROM n WHERE vec_id < {_HN_QUERIES}),
pairs AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(list_zip(q.qv, c.ie), s -> s[1] * s[2])) AS HUGEINT) AS dot,
           q.qn, c.n2
    FROM q, n c WHERE c.label <> q.q_label
),
scored AS (
    SELECT query_id, neighbor_id,
           round(CAST(dot AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS sim
    FROM pairs
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {_HN_K}
"""

QUERIES["docs_kfold"] = q_docs_kfold
ORACLE_SQL["docs_kfold"] = SQL_DOCS_KFOLD
QUERIES["hard_negatives"] = q_hard_negatives
ORACLE_SQL["hard_negatives"] = SQL_HARD_NEGATIVES


# ---------------------------------------------------------------------------
# BPE merge-round pair counting (llm/text.py::char_pair_counts).
# ---------------------------------------------------------------------------


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import char_pair_counts

    return char_pair_counts(_documents(spark, sf_dir), "text", "doc_id", topk=50)


SQL_BPE_PAIR_COUNTS = f"""
WITH words AS (
  SELECT unnest({_TOKS}) AS w FROM documents
),
pairs AS (
  SELECT substr(w, i, 2) AS pair
  FROM (SELECT w FROM words WHERE length(w) >= 2),
       UNNEST(range(1, length(w))) AS t(i)
),
counted AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY pair
),
ranked AS (
  SELECT pair, n,
         CAST(row_number() OVER (ORDER BY n DESC, pair ASC) AS BIGINT) AS rank
  FROM counted
)
SELECT pair, n, rank FROM ranked WHERE rank <= 50
"""

QUERIES["bpe_pair_counts"] = q_bpe_pair_counts
ORACLE_SQL["bpe_pair_counts"] = SQL_BPE_PAIR_COUNTS


# ---------------------------------------------------------------------------
# Corpus bigram-model fluency scoring (llm/text.py::bigram_likelihood) —
# the KenLM-perplexity stand-in quality gate.  Integer ppm end-to-end, so
# the oracle matches exactly despite the model being "learned" from the
# corpus itself inside the query.
# ---------------------------------------------------------------------------


def q_docs_bigram_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import bigram_likelihood

    return bigram_likelihood(_documents(spark, sf_dir), "text", "doc_id")


SQL_DOCS_BIGRAM_LIKELIHOOD = """
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE length(text) >= 2),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, length(t) - 1),
                               i -> substr(t, i, 2))) AS bg
  FROM d
),
model AS (SELECT bg, count(*) AS bg_n FROM bg GROUP BY bg),
pfx AS (SELECT substr(bg, 1, 1) AS p, SUM(bg_n) AS pfx_n FROM model GROUP BY 1),
sc AS (
  SELECT b.doc_id, (m.bg_n * 1000000) // x.pfx_n AS p_ppm
  FROM bg b JOIN model m USING (bg) JOIN pfx x ON substr(b.bg, 1, 1) = x.p
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(p_ppm) // count(*) AS BIGINT) AS mean_bigram_ppm
FROM sc GROUP BY doc_id
"""

QUERIES["docs_bigram_likelihood"] = q_docs_bigram_likelihood
ORACLE_SQL["docs_bigram_likelihood"] = SQL_DOCS_BIGRAM_LIKELIHOOD


# ---------------------------------------------------------------------------
# Weighted Bernoulli sampling (ops/sampling.py::weighted_sample): keep
# probability proportional to document length (the token-budget mixture
# primitive).  Keyed md5 draw -> exactly reproducible in the oracle.
# ---------------------------------------------------------------------------

_WS_PPM_PER_CHAR = 300


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.ops.sampling import weighted_sample

    d = _documents(spark, sf_dir).select(
        "doc_id", F.length("text").cast("bigint").alias("n_chars")
    )
    return weighted_sample(
        d, "doc_id", F.col("n_chars"), ppm_per_unit=_WS_PPM_PER_CHAR, salt="wsamp"
    )


SQL_DOCS_WEIGHTED_SAMPLE = f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE {duckdb_md5_int_sql(["'wsamp'", "doc_id"])} % 1000000
      < LEAST(length(text) * {_WS_PPM_PER_CHAR}, 1000000)
"""

QUERIES["docs_weighted_sample"] = q_docs_weighted_sample
ORACLE_SQL["docs_weighted_sample"] = SQL_DOCS_WEIGHTED_SAMPLE


# ---------------------------------------------------------------------------
# Arrow-native token counting (llm/text.py::token_counts_arrow): the
# mapInArrow twin of the JVM token_counts — same output contract, same
# oracle text.  Registered so the Arrow path stays continuously verified
# against the codegen path (both must match DuckDB bit-for-bit).
# ---------------------------------------------------------------------------


def q_token_counts_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.text import token_counts_arrow

    return token_counts_arrow(_documents(spark, sf_dir), "text", "doc_id")


QUERIES["token_counts_arrow"] = q_token_counts_arrow
ORACLE_SQL["token_counts_arrow"] = SQL_TOKEN_COUNTS


# ---------------------------------------------------------------------------
# Packing-efficiency audit over pack_sequences: how many documents START
# in each 512-token bin (bins overflow when a doc straddles the boundary
# — by construction every bin except possibly the last has >= 1 starter).
# The histogram (docs-per-bin -> bin count) is the packing-quality signal
# a data loader tracks: many 1-doc bins = long docs dominating, heavy
# tails = fragmentation.  Oracle wraps the pack oracle CTE.
# ---------------------------------------------------------------------------


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = q_docs_pack_sequences(spark, sf_dir)
    per_bin = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_in_bin")
    )
    return per_bin.groupBy("docs_in_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins")
    )


SQL_PACKING_EFFICIENCY = f"""
WITH packed AS ({SQL_DOCS_PACK_SEQUENCES}),
per_bin AS (
  SELECT bin_id, CAST(count(*) AS BIGINT) AS docs_in_bin
  FROM packed GROUP BY bin_id
)
SELECT docs_in_bin, CAST(count(*) AS BIGINT) AS n_bins
FROM per_bin GROUP BY docs_in_bin
"""

QUERIES["packing_efficiency"] = q_packing_efficiency
ORACLE_SQL["packing_efficiency"] = SQL_PACKING_EFFICIENCY


# ---------------------------------------------------------------------------
# Round-4 additions: passage-level dedup, rule-based quality classifier,
# per-domain cap sampling.
# ---------------------------------------------------------------------------

def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (substring) dedup over the near-dup corpus: mutated
    twins share every aligned full 20-token window with their original, so
    the shared-passage report is the cross-doc-copy signal whole-document
    fingerprints miss."""
    from lakeforge.llm.dedup import passage_dedup

    return passage_dedup(_neardup_corpus(spark, sf_dir), "text", "doc_id")


SQL_PASSAGE_DEDUP = f"""
WITH {_NEARDUP_CORPUS},
toks AS (SELECT doc_id, {_TOKS} AS toks FROM corpus WHERE len({_TOKS}) > 0),
ch AS (SELECT doc_id,
              unnest(range(0, CAST(ceil(len(toks) / 20.0) AS INT))) AS i,
              toks
       FROM toks),
p AS (SELECT doc_id,
             {_md5_60("array_to_string(toks[i*20+1 : i*20+20], ' ')")} AS passage_hash
      FROM ch)
SELECT passage_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       MIN(doc_id) AS canonical_doc_id
FROM p GROUP BY passage_hash
HAVING COUNT(DISTINCT doc_id) >= 2
"""

QUERIES["passage_dedup"] = q_passage_dedup
ORACLE_SQL["passage_dedup"] = SQL_PASSAGE_DEDUP


def q_docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based keep/drop quality classifier over documents (C4/Gopher
    heuristic family) — integer features and weights, engine-exact."""
    from lakeforge.llm.text import quality_score

    return quality_score(_documents(spark, sf_dir), "text", "doc_id")


SQL_DOCS_QUALITY_SCORE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0
              ELSE (len(list_filter(toks, x -> x IN ({_STOP_SQL}))) * 1000) // len(toks)
         END AS stop_pm,
         CASE WHEN len(toks) = 0 THEN 0
              ELSE (len(list_distinct(toks)) * 1000) // len(toks)
         END AS uniq_pm
  FROM t
)
SELECT doc_id, n_tokens, CAST(stop_pm AS BIGINT) AS stop_pm,
       CAST(uniq_pm AS BIGINT) AS uniq_pm,
       CAST(stop_pm * 2 + uniq_pm
            + CASE WHEN n_tokens BETWEEN 30 AND 500 THEN 200 ELSE 0 END
            AS BIGINT) AS quality_score,
       CASE WHEN stop_pm * 2 + uniq_pm
                 + CASE WHEN n_tokens BETWEEN 30 AND 500 THEN 200 ELSE 0 END >= 700
            THEN 'keep' ELSE 'drop' END AS label
FROM f
"""

QUERIES["docs_quality_score"] = q_docs_quality_score
ORACLE_SQL["docs_quality_score"] = SQL_DOCS_QUALITY_SCORE


def q_docs_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: at most 15 docs per source, md5-selected — the
    anti-domination mix control of web-corpus pipelines, two-level so hot
    domains never serialize through one reducer."""
    from lakeforge.ops.sampling import capped_sample_per_group

    docs = _documents(spark, sf_dir).select("doc_id", "source")
    return capped_sample_per_group(docs, "source", "doc_id", cap=15).select(
        "source", "doc_id"
    )


_CAP_H = duckdb_md5_int_sql(["doc_id", "'groupcap'"])

SQL_DOCS_DOMAIN_CAP = f"""
WITH h AS (SELECT source, doc_id, {_CAP_H} AS hh FROM documents),
r AS (SELECT source, doc_id,
             row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
      FROM h)
SELECT source, doc_id FROM r WHERE rn <= 15
"""

QUERIES["docs_domain_cap"] = q_docs_domain_cap
ORACLE_SQL["docs_domain_cap"] = SQL_DOCS_DOMAIN_CAP


def q_synthetic_docs_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stats over a corpus GENERATED by the custom Python
    DataSource (io/docgen_source.py, Spark 4 `pyspark.sql.datasource`
    API) — executors generate their own id-range slices; nothing flows
    from the driver.  The DuckDB oracle REGENERATES the same corpus from
    range(N) + the same md5 formulas, so even the text content is
    value-checked (via an md5 content checksum), proving the source is
    deterministic under any partitioning.  (sf_dir unused: the source
    generates its input.)"""
    from lakeforge.functions.keys import md5_int
    from lakeforge.io import docgen_source

    docgen_source.register(spark)
    df = (
        spark.read.format("lakeforge_docgen")
        .option("rows", 2000)
        .option("seed", 42)
        .option("numPartitions", 8)
        .load()
    )
    return df.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(F.pmod(md5_int(F.col("text")), F.lit(1_000_000_007)))
        .cast("bigint")
        .alias("content_checksum"),
    )


def _docgen_oracle() -> str:
    from lakeforge.io.docgen_source import (
        MIN_WORDS,
        N_SOURCES,
        VOCAB,
        WORD_SPREAD,
    )

    vocab_sql = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"

    def h(field_expr: str) -> str:
        # md5 60-bit int of (i, field, seed) with chr(31) joiners — the
        # docgen_source._h / functions.keys.md5_int convention.
        concat = (
            f"CAST(i AS VARCHAR) || chr(31) || {field_expr}"
            f" || chr(31) || '42'"
        )
        return f"CAST(('0x' || substr(md5({concat}), 1, 15)) AS UBIGINT)::BIGINT"

    text_h = (
        "CAST(('0x' || substr(md5(text), 1, 15)) AS UBIGINT)::BIGINT"
    )
    return f"""
WITH ids AS (SELECT unnest(range(0, 2000)) AS i),
g AS (
  SELECT i,
         'site_' || CAST({h("'src'")} % {N_SOURCES} AS VARCHAR) AS source,
         {MIN_WORDS} + {h("'len'")} % {WORD_SPREAD} AS n_words
  FROM ids
),
t AS (
  SELECT i, source, n_words,
         array_to_string(
           list_transform(range(0, CAST(n_words AS INT)),
                          j -> ({vocab_sql})[1 + {h("'w' || CAST(j AS VARCHAR)")} % {len(VOCAB)}]),
           ' ') AS text
  FROM g
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM({text_h} % 1000000007) AS BIGINT) AS content_checksum
FROM t GROUP BY source
"""


QUERIES["synthetic_docs_stats"] = q_synthetic_docs_stats
ORACLE_SQL["synthetic_docs_stats"] = _docgen_oracle()


def q_token_runs_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (functions/udtfs.py::TokenRuns): run-length
    encoding of each doc's token stream via LATERAL join — summarized to
    per-doc run stats so the result stays compact.  The oracle is the
    INDEPENDENT relational formulation (gaps-and-islands over unnest) —
    two formulations checking each other."""
    from lakeforge.functions.udtfs import TokenRuns

    spark.udtf.register("token_runs", TokenRuns)
    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("__docs_for_runs")
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_runs,
               CAST(MAX(r.run_len) AS BIGINT) AS max_run_len,
               CAST(SUM(CASE WHEN r.run_len >= 2 THEN r.run_len ELSE 0 END)
                    AS BIGINT) AS repeated_tokens
        FROM __docs_for_runs d, LATERAL token_runs(d.text) r
        GROUP BY d.doc_id
        """
    )


SQL_TOKEN_RUNS_UDTF = f"""
WITH t AS (
  SELECT doc_id, unnest({_TOKS}) AS tok,
         generate_subscripts({_TOKS}, 1) AS pos
  FROM documents WHERE doc_id < 100
),
marked AS (
  SELECT doc_id, tok, pos,
         CASE WHEN lag(tok) OVER w IS DISTINCT FROM tok THEN 1 ELSE 0 END AS new_run
  FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
runs AS (
  SELECT doc_id, tok,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM marked
),
sized AS (
  SELECT doc_id, run_id, CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY doc_id, run_id
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS max_run_len,
       CAST(SUM(CASE WHEN run_len >= 2 THEN run_len ELSE 0 END) AS BIGINT)
           AS repeated_tokens
FROM sized GROUP BY doc_id
"""

QUERIES["token_runs_udtf"] = q_token_runs_udtf
ORACLE_SQL["token_runs_udtf"] = SQL_TOKEN_RUNS_UDTF


def q_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality harness: recall@k of the IVF index against the exact
    cosine top-k, per query — the accuracy measurement every approximate
    index needs shipped NEXT TO the index (an unmeasured ANN is a bug
    generator).  Both sides are deterministic, so even this evaluation
    is value-oracled.  Scale: the exact side is the one that doesn't
    scale (O(Q*N)) — run it on a SAMPLE of queries (here: the standard
    20-query probe set) to certify the index, never corpus-wide."""
    exact = q_embedding_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("e_nb")
    )
    approx = q_ivf_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("a_nb")
    )
    hits = (
        exact.join(
            approx,
            (exact.query_id == approx.query_id) & (F.col("e_nb") == F.col("a_nb")),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count("a_nb").cast("bigint").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.expr(f"(n_hits * 1000) div {_TOPK}").cast("bigint").alias("recall_permille"),
    )


def _sql_ivf_recall() -> str:
    return f"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM ({SQL_EMBEDDING_COSINE_TOPK}) _e
),
approx AS (
  SELECT query_id, neighbor_id FROM ({_sql_ivf_topk()}) _a
),
hits AS (
  SELECT e.query_id,
         CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
  FROM exact e
  LEFT JOIN approx a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
  GROUP BY e.query_id
)
SELECT query_id, n_hits,
       CAST((n_hits * 1000) // {_TOPK} AS BIGINT) AS recall_permille
FROM hits
"""


QUERIES["ivf_recall_at_k"] = q_ivf_recall_at_k
ORACLE_SQL["ivf_recall_at_k"] = _sql_ivf_recall()


def q_sq8_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of INT8 scalar-quantized cosine search
    (llm/similarity.py::sq8_topk) against the exact top-k — the OTHER
    approximate-index axis next to IVF: IVF prunes which vectors are
    compared, SQ8 shrinks what each comparison reads (1 byte/dim; at
    100 TB the quantized codes are what fits in executor memory).  All
    quantization math is integer (micro-unit vectors, per-dimension
    [min,max] stats, floor codes), so the approximate index itself is
    value-oracled — the DuckDB twin recomputes codes relationally via a
    position join and must land on identical top-k sets."""
    from lakeforge.llm.similarity import sq8_topk

    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    approx = sq8_topk(queries, emb, "embedding", "vec_id", k=_TOPK).select(
        "query_id", F.col("neighbor_id").alias("a_nb")
    )
    exact = q_embedding_cosine_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("e_nb")
    )
    hits = (
        exact.join(
            approx,
            (exact.query_id == approx.query_id) & (F.col("e_nb") == F.col("a_nb")),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count("a_nb").cast("bigint").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.expr(f"(n_hits * 1000) div {_TOPK}").cast("bigint").alias("recall_permille"),
    )


SQL_SQ8_RECALL = f"""
WITH mu AS (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS iv
  FROM embeddings
),
ex AS (SELECT vec_id, generate_subscripts(iv, 1) AS pos, unnest(iv) AS v FROM mu),
dims AS (
  SELECT pos, min(v) AS dmin, GREATEST(max(v) - min(v), 1) AS rng
  FROM ex GROUP BY pos
),
vq AS (
  SELECT e.vec_id, e.pos,
         d.dmin * 255 + ((e.v - d.dmin) * 255 // d.rng) * d.rng AS vt
  FROM ex e JOIN dims d USING (pos)
),
n2 AS (SELECT vec_id, CAST(SUM(vt * vt) AS BIGINT) AS nn FROM vq GROUP BY vec_id),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(q.vt * c.vt) AS BIGINT) AS dot
  FROM vq q JOIN vq c USING (pos)
  WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         round(CAST(d.dot AS DOUBLE)
               / sqrt(CAST(nq.nn AS DOUBLE) * CAST(nc.nn AS DOUBLE)), 6) AS sim
  FROM dots d
  JOIN n2 nq ON nq.vec_id = d.query_id
  JOIN n2 nc ON nc.vec_id = d.neighbor_id
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored) _r
  WHERE rank <= {_TOPK}
),
exact AS (SELECT query_id, neighbor_id FROM ({SQL_EMBEDDING_COSINE_TOPK}) _e),
hits AS (
  SELECT e.query_id, CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
  FROM exact e
  LEFT JOIN approx a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
  GROUP BY e.query_id
)
SELECT query_id, n_hits,
       CAST((n_hits * 1000) // {_TOPK} AS BIGINT) AS recall_permille
FROM hits
"""

QUERIES["sq8_recall_at_k"] = q_sq8_recall_at_k
ORACLE_SQL["sq8_recall_at_k"] = SQL_SQ8_RECALL


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch calibration harness: MinHash-ESTIMATED Jaccard (matching
    signature components / k) vs the EXACT full-set Jaccard, per LSH
    candidate pair — the dedup twin of q_ivf_recall_at_k (ship the
    accuracy measurement WITH the sketch).  err_permille quantifies the
    32-permutation estimator's bias pair by pair.  Scale: the exact side
    runs only on the candidate list (sample-sized by construction), never
    corpus-wide."""
    from lakeforge.cache import persist_tracked
    from lakeforge.llm.dedup import _doc_shingles, exact_jaccard_for_pairs

    corpus = _neardup_corpus(spark, sf_dir)
    # ONE shingle pass feeds both the signature build and the exact side
    # (unshared, the tokenize+shingle explode pipeline ran twice —
    # measured 3.6s -> ~2.5s at sf0.1).
    sh = persist_tracked(_doc_shingles(corpus, "text", "doc_id", 3))
    sig = minhash_signatures(corpus, "text", "doc_id", k=_K, shingle_n=3, shingles=sh)
    # cand feeds BOTH the estimated side and (broadcast) the exact side —
    # unpersisted, the banded self-join pipeline above executed twice
    # (r12 opt: once to build exact's broadcast pair list, once for est).
    cand = persist_tracked(
        lsh_candidate_pairs(sig, k=_K, bands=_BANDS, min_match=_MIN_MATCH)
    )
    exact = exact_jaccard_for_pairs(
        corpus, "text", "doc_id", cand, shingle_n=3, shingles=sh
    )
    est = cand.select(
        "doc_a",
        "doc_b",
        F.expr(f"(n_match * 1000) div {_K}").cast("bigint").alias("est_permille"),
    )
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_permille",
        "exact_permille",
        (F.col("est_permille") - F.col("exact_permille"))
        .cast("bigint")
        .alias("err_permille"),
    )


def _sql_minhash_calibration() -> str:
    return f"""
WITH {_NEARDUP_CORPUS},
{_shingle_ctes(3)},
cand AS (
  SELECT doc_a, doc_b, n_match FROM ({_sql_minhash_lsh_pairs()}) _lsh
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST((c.n_match * 1000) // {_K} AS BIGINT) AS est_permille,
         CAST((COALESCE(i.n_inter, 0) * 1000)
              // (sa.n_sh + sb.n_sh - COALESCE(i.n_inter, 0)) AS BIGINT)
             AS exact_permille
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, est_permille, exact_permille,
       CAST(est_permille - exact_permille AS BIGINT) AS err_permille
FROM scored
"""


QUERIES["minhash_calibration"] = q_minhash_calibration
ORACLE_SQL["minhash_calibration"] = _sql_minhash_calibration()


def q_vocab_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: top-50 tokens by frequency with rank
    and the Zipf product rank*count (≈ constant under Zipf's law) — the
    standard sanity check on corpus token distributions.  One explode +
    one count shuffle (map-side combinable, vocabulary-bounded output);
    the rank window runs over the TOP-N aggregate rows only."""
    from lakeforge.llm.text import tokens_col

    toks = _documents(spark, sf_dir).select(
        F.explode(tokens_col("text")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("n").desc(), F.col("tok").asc())
    top = counts.withColumn("rank", F.row_number().over(w).cast("bigint")).filter(
        F.col("rank") <= 50
    )
    return top.select(
        "rank", "tok", "n", (F.col("rank") * F.col("n")).cast("bigint").alias("zipf_product")
    )


SQL_VOCAB_ZIPF = f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS tok
  FROM documents
),
c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS BIGINT) AS rank FROM c)
SELECT rank, tok, n, CAST(rank * n AS BIGINT) AS zipf_product
FROM r WHERE rank <= 50
"""

QUERIES["vocab_zipf_profile"] = q_vocab_zipf_profile
ORACLE_SQL["vocab_zipf_profile"] = SQL_VOCAB_ZIPF


def q_docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: an INCOMING batch (docs with
    doc_id >= 250, plus exact copies of 10 historical docs and a few
    within-batch twins) checked
    against the HISTORICAL fingerprint store (doc_id < 250) — the
    steady-state shape of a training-data pipeline, where each new crawl
    deduplicates against everything already ingested.

    Verdicts per incoming doc: 'dup_of_history' (fingerprint already
    stored), 'dup_in_batch' (not historical, but a within-batch twin with
    a smaller id won), 'new' (first sight).  Scale: the historical store
    keeps ONLY (fingerprint, canonical_id) — never text; both checks are
    equi-joins on the 60-bit fingerprint."""
    from lakeforge.functions.keys import md5_int
    from lakeforge.llm.text import tokens_col

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    fp = docs.select(
        "doc_id",
        md5_int(F.concat_ws(" ", tokens_col("text"))).alias("fp"),
    )
    hist = fp.filter(F.col("doc_id") < 250)
    copies = hist.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "fp"
    )
    fresh = fp.filter(F.col("doc_id") >= 250)
    batch_twins = fresh.filter(F.col("doc_id") % 30 == 0).select(
        (F.col("doc_id") + 6_000_000).alias("doc_id"), "fp"
    )
    incoming = fresh.unionByName(copies).unionByName(batch_twins)
    store = hist.groupBy("fp").agg(F.min("doc_id").alias("hist_canonical"))
    # within-batch winner per fingerprint
    batch_min = incoming.groupBy("fp").agg(F.min("doc_id").alias("batch_canonical"))
    verdict = (
        incoming.join(store, "fp", "left")
        .join(batch_min, "fp")
        .select(
            "doc_id",
            F.when(F.col("hist_canonical").isNotNull(), "dup_of_history")
            .when(F.col("doc_id") != F.col("batch_canonical"), "dup_in_batch")
            .otherwise("new")
            .alias("verdict"),
        )
    )
    return verdict.groupBy("verdict").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


SQL_DOCS_INCREMENTAL_DEDUP = f"""
WITH fp AS (
  SELECT doc_id, {{FP}} AS fp
  FROM (SELECT doc_id, array_to_string({_TOKS}, ' ') AS norm FROM documents) t
),
hist AS (SELECT * FROM fp WHERE doc_id < 250),
incoming AS (
  SELECT * FROM fp WHERE doc_id >= 250
  UNION ALL
  SELECT doc_id + 5000000 AS doc_id, fp FROM hist WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 6000000 AS doc_id, fp FROM fp
  WHERE doc_id >= 250 AND doc_id % 30 = 0
),
store AS (SELECT fp, MIN(doc_id) AS hist_canonical FROM hist GROUP BY fp),
bmin AS (SELECT fp, MIN(doc_id) AS batch_canonical FROM incoming GROUP BY fp),
v AS (
  SELECT i.doc_id,
         CASE WHEN s.hist_canonical IS NOT NULL THEN 'dup_of_history'
              WHEN i.doc_id <> b.batch_canonical THEN 'dup_in_batch'
              ELSE 'new' END AS verdict
  FROM incoming i
  LEFT JOIN store s ON i.fp = s.fp
  JOIN bmin b ON i.fp = b.fp
)
SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs FROM v GROUP BY verdict
""".replace("{FP}", "CAST(('0x' || substr(md5(COALESCE(CAST(norm AS VARCHAR), chr(30))), 1, 15)) AS UBIGINT)::BIGINT")

QUERIES["docs_incremental_dedup"] = q_docs_incremental_dedup
ORACLE_SQL["docs_incremental_dedup"] = SQL_DOCS_INCREMENTAL_DEDUP


def q_neardup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the near-dup pipeline: candidate pairs -> connected
    components -> ONE survivor per cluster chosen by QUALITY (highest
    rule-based quality score, lowest doc_id tiebreak) — keep-BEST dedup
    rather than keep-first.  Reports per cluster: survivor, member
    count, and the quality points gained over naive keep-lowest-id.

    Scale: components come from the checkpointed min-label propagation
    (ops/graph.py); survivor selection is one groupBy over |members|
    rows (max_by / min_by structs); quality joins by doc_id — text never
    shuffles past its one quality-scoring Project."""
    from lakeforge.llm.dedup import lsh_candidate_pairs, minhash_signatures
    from lakeforge.llm.text import quality_score
    from lakeforge.ops.graph import connected_components

    corpus = _neardup_corpus(spark, sf_dir)
    sig = minhash_signatures(corpus, "text", "doc_id", k=_K, shingle_n=3)
    pairs = lsh_candidate_pairs(sig, k=_K, bands=_BANDS, min_match=_MIN_MATCH)
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("node"), "component"
    )
    q = quality_score(corpus, "text", "doc_id").select(
        F.col("doc_id").alias("node"), "quality_score"
    )
    members = comp.join(q, "node")
    return members.groupBy("component").agg(
        F.expr("max_by(node, struct(quality_score, -node))").alias("survivor_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        (
            F.max("quality_score") - F.expr("min_by(quality_score, node)")
        ).cast("bigint").alias("quality_gain"),
    )


def _sql_neardup_survivors() -> str:
    # quality formula inline over the near-dup corpus (same expressions
    # as SQL_DOCS_QUALITY_SCORE, different source table).
    return f"""
WITH RECURSIVE pairs AS ({_sql_minhash_lsh_pairs()}),
und AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(v, r) AS (
    SELECT a, a FROM und
    UNION
    SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.v
),
comp AS (SELECT v AS node, MIN(r) AS component FROM reach GROUP BY v),
{_NEARDUP_CORPUS.strip().rstrip(')').replace('corpus AS (', 'corpus AS (', 1) + ')'},
qtoks AS (SELECT doc_id, {_TOKS} AS toks FROM corpus),
q AS (
  SELECT doc_id AS node,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0
              ELSE (len(list_filter(toks, x -> x IN ({_STOP_SQL}))) * 1000) // len(toks)
         END AS stop_pm,
         CASE WHEN len(toks) = 0 THEN 0
              ELSE (len(list_distinct(toks)) * 1000) // len(toks)
         END AS uniq_pm
  FROM qtoks
),
scoreq AS (
  SELECT node,
         CAST(stop_pm * 2 + uniq_pm
              + CASE WHEN n_tokens BETWEEN 30 AND 500 THEN 200 ELSE 0 END
              AS BIGINT) AS quality_score
  FROM q
),
m AS (SELECT c.component, c.node, s.quality_score
      FROM comp c JOIN scoreq s ON s.node = c.node),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY component
                            ORDER BY quality_score DESC, node ASC) AS rk
  FROM m
)
SELECT r.component,
       MAX(CASE WHEN r.rk = 1 THEN r.node END) AS survivor_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(MAX(r.quality_score)
            - MIN(CASE WHEN r.node = fm.first_node THEN r.quality_score END)
            AS BIGINT) AS quality_gain
FROM ranked r
JOIN (SELECT component, MIN(node) AS first_node FROM m GROUP BY component) fm
  ON fm.component = r.component
GROUP BY r.component
"""


QUERIES["neardup_survivors"] = q_neardup_survivors
ORACLE_SQL["neardup_survivors"] = _sql_neardup_survivors()


# ---------------------------------------------------------------------------
# Iterative BPE merge training (llm/bpe.py): the tokenizer-training loop
# itself, value-oracled.  The greedy left-to-right merge is stated
# relationally (even offsets within runs of consecutive matches), so the
# DuckDB oracle replays the identical 3 rounds as unrolled CTE blocks —
# pair counts, tie-breaks, merge application, and post-merge corpus sizes
# must all agree exactly.
# ---------------------------------------------------------------------------

_BPE_ROUNDS, _BPE_DOCS = 3, 300


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.bpe import bpe_train_merges

    docs = _documents(spark, sf_dir).filter(F.col("doc_id") < _BPE_DOCS)
    return bpe_train_merges(docs, "text", "doc_id", n_merges=_BPE_ROUNDS)


def _bpe_round_cte(i: int) -> str:
    """One unrolled training round: from t{i} (doc_id, rpos, tok) derive
    the winning pair b{i}, the merged token stream t{i+1}, and its size
    n{i+1} — the same window-relational greedy merge as llm/bpe.py."""
    return f"""
p{i} AS (
  SELECT doc_id, rpos, tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY rpos) AS nxt
  FROM t{i}
),
b{i} AS (
  SELECT tok AS l, nxt AS r, CAST(count(*) AS BIGINT) AS cnt
  FROM p{i} WHERE nxt IS NOT NULL GROUP BY tok, nxt
  ORDER BY cnt DESC, tok ASC, nxt ASC LIMIT 1
),
m{i} AS (
  SELECT p.doc_id, p.rpos, p.tok, b.l, b.r,
         COALESCE(p.tok = b.l AND p.nxt = b.r, FALSE) AS isp
  FROM p{i} p CROSS JOIN b{i} b
),
m2_{i} AS (
  SELECT *,
         SUM(CASE WHEN isp THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY rpos) AS prn
  FROM m{i}
),
m3_{i} AS (
  SELECT *, CASE WHEN isp THEN rpos - prn END AS island FROM m2_{i}
),
m4_{i} AS (
  SELECT *, MIN(CASE WHEN isp THEN rpos END)
              OVER (PARTITION BY doc_id, island) AS isl_min
  FROM m3_{i}
),
m5_{i} AS (
  SELECT *, (isp AND (rpos - isl_min) % 2 = 0) AS ms FROM m4_{i}
),
m6_{i} AS (
  SELECT *, COALESCE(lag(ms) OVER (PARTITION BY doc_id ORDER BY rpos),
                     FALSE) AS consumed
  FROM m5_{i}
),
t{i + 1} AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY doc_id ORDER BY rpos) - 1 AS rpos,
         CASE WHEN ms THEN l || '_' || r ELSE tok END AS tok
  FROM m6_{i} WHERE NOT consumed
),
n{i + 1} AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t{i + 1})"""


def _sql_bpe_train() -> str:
    rounds = ",".join(_bpe_round_cte(i) for i in range(_BPE_ROUNDS))
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_round, l AS merge_left, "
        f"r AS merge_right, cnt AS pair_count, "
        f"(SELECT n FROM n{i + 1}) AS corpus_tokens_after FROM b{i}"
        for i in range(_BPE_ROUNDS)
    )
    return f"""
WITH t0 AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS rpos, unnest(toks) AS tok
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents
        WHERE doc_id < {_BPE_DOCS}) _d
),{rounds}
{selects}
"""


QUERIES["bpe_train_merges"] = q_bpe_train_merges
ORACLE_SQL["bpe_train_merges"] = _sql_bpe_train()


# ---------------------------------------------------------------------------
# Product quantization (llm/similarity.py::pq_topk): the third ANN axis
# next to IVF (prune comparisons) and SQ8 (shrink scalars) — PQ shrinks
# VECTORS to n_subspaces small codes via per-subspace k-means codebooks
# and answers with asymmetric distance tables.  Training runs the same
# exact-integer Lloyd's as kmeans_embeddings per subspace, so the oracle
# replays codebook training, code assignment, ADC, and the exact-L2
# ground truth — the entire trained index is value-checked.
#
# Measured honesty note: on THIS corpus (near-uniform synthetic
# embeddings, no cluster structure) PQ's 12-bit codes land ~180 permille
# recall@10 while SQ8's 512-bit codes land ~980 — exactly the trade an
# evaluation harness exists to expose: codebook methods need real
# manifold structure; scalar quantization degrades gracefully without
# it.  Production tuning is n_subspaces=8-16, k_codes=256.
# ---------------------------------------------------------------------------

_PQ_M, _PQ_SUB, _PQ_KC, _PQ_IT = 4, 16, 8, 2

# Trained-codebook store (VERDICT r05 #3): the PQ and IVF-PQ queries share
# ONE trained quantizer per (app, corpus) instead of each re-running
# Lloyd's — exactly how a production ANN index works (train once, persist
# the codebook next to the corpus, reuse at query time).  The memo holds
# collected centroid rows (~512 ints), not Spark caches, so it survives
# the query-boundary cache release; training is deterministic, so reuse
# is bit-identical to in-query training and oracle hashes are unchanged.
_PQ_CODEBOOKS: dict[tuple, list] = {}


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> list:
    from lakeforge.llm.similarity import codebook_frames, train_pq_codebooks

    from lakeforge.io.sources import data_version

    # data_version guards against an sf_dir rewrite within one application
    # serving a stale codebook (ADVICE r06 #1).
    key = (spark.sparkContext.applicationId, sf_dir,
           data_version(f"{sf_dir}/embeddings.parquet"),
           _PQ_M, _PQ_SUB, _PQ_KC, _PQ_IT)
    if key not in _PQ_CODEBOOKS:
        _PQ_CODEBOOKS[key] = train_pq_codebooks(
            _embeddings(spark, sf_dir), "embedding", "vec_id",
            dim=_PQ_M * _PQ_SUB, n_subspaces=_PQ_M, k_codes=_PQ_KC,
            iters=_PQ_IT,
        )
    return codebook_frames(spark, _PQ_CODEBOOKS[key])


# The exact-L2 top-k ground truth the PQ/IVF-PQ evaluations score
# against is the same 200-row artifact (|probe set| * k) — an ANN
# benchmark computes it once per corpus (ann-benchmarks ships it as a
# file), so the two queries share it like the codebook above.
_L2_TRUTH: dict[tuple, list] = {}


def _l2_ground_truth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.similarity import l2_topk

    from lakeforge.io.sources import data_version

    key = (spark.sparkContext.applicationId, sf_dir,
           data_version(f"{sf_dir}/embeddings.parquet"), _N_QUERIES, _TOPK)
    if key not in _L2_TRUTH:
        emb = _embeddings(spark, sf_dir)
        queries = emb.filter(F.col("vec_id") < _N_QUERIES)
        _L2_TRUTH[key] = [
            (int(r["query_id"]), int(r["neighbor_id"]))
            for r in l2_topk(queries, emb, "embedding", "vec_id", k=_TOPK)
            .select("query_id", "neighbor_id").collect()
        ]
    return spark.createDataFrame(
        _L2_TRUTH[key], "query_id bigint, e_nb bigint"
    )


def q_pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.similarity import pq_topk

    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    approx = pq_topk(
        queries, emb, "embedding", "vec_id",
        dim=_PQ_M * _PQ_SUB, n_subspaces=_PQ_M, k_codes=_PQ_KC,
        iters=_PQ_IT, k=_TOPK, codebooks=_pq_codebooks(spark, sf_dir),
    ).select("query_id", F.col("neighbor_id").alias("a_nb"))
    exact = _l2_ground_truth(spark, sf_dir)
    hits = (
        exact.join(
            approx,
            (exact.query_id == approx.query_id) & (F.col("e_nb") == F.col("a_nb")),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count("a_nb").cast("bigint").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.expr(f"(n_hits * 1000) div {_TOPK}").cast("bigint").alias("recall_permille"),
    )


def _pq_adc_ctes() -> list[str]:
    """CTE chain shared by the PQ and IVF-PQ oracles: micro vectors,
    per-subspace Lloyd's codebook training (unrolled), code assignment,
    per-query distance tables, and the summed ADC distances ("adc")."""
    M, SUB, KC, IT = _PQ_M, _PQ_SUB, _PQ_KC, _PQ_IT
    ctes = [
        "mb AS (SELECT vec_id, list_transform(embedding,"
        " v -> CAST(round(CAST(v AS DOUBLE)*1000000) AS BIGINT)) AS vec"
        " FROM embeddings)",
    ]
    for m in range(M):
        lo, hi = m * SUB + 1, (m + 1) * SUB
        p = f"m{m}"
        ctes.append(f"{p}long AS (SELECT vec_id,"
                    f" generate_subscripts(vec[{lo}:{hi}], 1) AS pos,"
                    f" unnest(vec[{lo}:{hi}]) AS x FROM mb)")
        ctes.append(f"{p}c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster,"
                    f" pos, x AS c FROM {p}long WHERE vec_id < {KC})")
        prev = f"{p}c0"
        for i in range(1, IT + 1):
            ctes.append(
                f"{p}a{i} AS (SELECT l.vec_id, c.cluster,"
                f" SUM((l.x - c.c)*(l.x - c.c)) AS d2"
                f" FROM {p}long l JOIN {prev} c USING (pos)"
                f" GROUP BY l.vec_id, c.cluster)"
            )
            ctes.append(
                f"{p}s{i} AS (SELECT vec_id, cluster FROM"
                f" (SELECT vec_id, cluster,"
                f" row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)"
                f" AS rn FROM {p}a{i}) WHERE rn = 1)"
            )
            ctes.append(
                f"{p}c{i} AS (SELECT s.cluster, l.pos,"
                f" CAST(round(CAST(SUM(l.x) AS DOUBLE) /"
                f" CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS c"
                f" FROM {p}long l JOIN {p}s{i} s USING (vec_id)"
                f" GROUP BY s.cluster, l.pos)"
            )
            prev = f"{p}c{i}"
        ctes.append(
            f"{p}af AS (SELECT l.vec_id, c.cluster,"
            f" SUM((l.x - c.c)*(l.x - c.c)) AS d2"
            f" FROM {p}long l JOIN {prev} c USING (pos)"
            f" GROUP BY l.vec_id, c.cluster)"
        )
        ctes.append(
            f"{p}codes AS (SELECT vec_id, cluster AS code FROM"
            f" (SELECT vec_id, cluster,"
            f" row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster)"
            f" AS rn FROM {p}af) WHERE rn = 1)"
        )
        ctes.append(
            f"{p}tbl AS (SELECT l.vec_id AS query_id, c.cluster AS code,"
            f" SUM((l.x - c.c)*(l.x - c.c)) AS d2"
            f" FROM {p}long l JOIN {prev} c USING (pos)"
            f" WHERE l.vec_id < {_N_QUERIES}"
            f" GROUP BY 1, 2)"
        )
    codes_union = " UNION ALL ".join(
        f"SELECT vec_id AS neighbor_id, {m} AS m, code FROM m{m}codes"
        for m in range(M)
    )
    tbl_union = " UNION ALL ".join(
        f"SELECT query_id, {m} AS m, code, d2 FROM m{m}tbl" for m in range(M)
    )
    ctes.append(f"allcodes AS ({codes_union})")
    ctes.append(f"alltbl AS ({tbl_union})")
    ctes.append(
        "adc AS (SELECT t.query_id, c.neighbor_id,"
        " CAST(SUM(t.d2) AS BIGINT) AS adc_d2"
        " FROM allcodes c JOIN alltbl t USING (m, code)"
        " WHERE t.query_id <> c.neighbor_id"
        " GROUP BY 1, 2)"
    )
    return ctes


def _recall_tail_ctes(approx_src: str) -> list[str]:
    """exact-L2 ground truth + top-k of ``approx_src`` -> recall ctes."""
    return [
        f"approx AS (SELECT query_id, neighbor_id FROM"
        f" (SELECT query_id, neighbor_id,"
        f" row_number() OVER (PARTITION BY query_id"
        f" ORDER BY adc_d2 ASC, neighbor_id ASC) AS rn FROM {approx_src})"
        f" WHERE rn <= {_TOPK})",
        "exl AS (SELECT vec_id, generate_subscripts(vec, 1) AS pos,"
        " unnest(vec) AS x FROM mb)",
        f"exd AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,"
        f" SUM((q.x - c.x)*(q.x - c.x)) AS d2"
        f" FROM exl q JOIN exl c USING (pos)"
        f" WHERE q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id"
        f" GROUP BY 1, 2)",
        f"exact AS (SELECT query_id, neighbor_id FROM"
        f" (SELECT query_id, neighbor_id,"
        f" row_number() OVER (PARTITION BY query_id"
        f" ORDER BY d2 ASC, neighbor_id ASC) AS rn FROM exd)"
        f" WHERE rn <= {_TOPK})",
    ]


_RECALL_SELECT = f"""
SELECT e.query_id,
       CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST((COUNT(a.neighbor_id) * 1000) // {_TOPK} AS BIGINT) AS recall_permille
FROM exact e
LEFT JOIN approx a
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""


def _sql_pq_recall() -> str:
    ctes = _pq_adc_ctes() + _recall_tail_ctes("adc")
    return "WITH " + ",\n".join(ctes) + _RECALL_SELECT


QUERIES["pq_recall_at_k"] = q_pq_recall_at_k
ORACLE_SQL["pq_recall_at_k"] = _sql_pq_recall()


def q_ivfpq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (llm/similarity.py::ivfpq_topk): the FAISS-style composed
    index — inverted-file cells bound WHICH vectors each query compares,
    PQ codes bound the MEMORY each comparison touches — evaluated as
    recall@k vs exact L2.  Both approximations are deterministic, so the
    composed index is value-checked end-to-end (IVF candidate pruning
    included: its misses show up as recall loss the oracle reproduces
    exactly)."""
    from lakeforge.llm.similarity import ivfpq_topk

    emb = _embeddings(spark, sf_dir)
    approx = ivfpq_topk(
        emb, "embedding", "vec_id",
        dim=_PQ_M * _PQ_SUB, n_cells=_IVF_CELLS, nprobe=_IVF_PROBE,
        n_queries=_N_QUERIES, n_subspaces=_PQ_M, k_codes=_PQ_KC,
        iters=_PQ_IT, k=_TOPK, codebooks=_pq_codebooks(spark, sf_dir),
    ).select("query_id", F.col("neighbor_id").alias("a_nb"))
    exact = _l2_ground_truth(spark, sf_dir)
    hits = (
        exact.join(
            approx,
            (exact.query_id == approx.query_id) & (F.col("e_nb") == F.col("a_nb")),
            "left",
        )
        .groupBy(exact.query_id)
        .agg(F.count("a_nb").cast("bigint").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.expr(f"(n_hits * 1000) div {_TOPK}").cast("bigint").alias("recall_permille"),
    )


def _sql_ivfpq_recall() -> str:
    dot_c = _LIST_DOT.format(a="e.vec", b="c.c_vec")
    ivf_ctes = [
        "ne0 AS (SELECT vec_id, list_transform(embedding,"
        " v -> CAST(round(CAST(v AS DOUBLE) * 1000000000) AS BIGINT)) AS vec"
        " FROM embeddings)",
        "ne AS (SELECT vec_id, vec,"
        " CAST(list_sum(list_transform(vec, x -> x * x)) AS HUGEINT) AS n2"
        " FROM ne0)",
        f"icents AS (SELECT vec_id AS cell_id, vec AS c_vec, n2 AS c_n2"
        f" FROM ne WHERE vec_id < {_IVF_CELLS})",
        "iscored AS (SELECT e.vec_id, e.n2, c.cell_id,"
        " round(CAST(" + _LIST_DOT.format(a="e.vec", b="c.c_vec") +
        " AS DOUBLE) / sqrt(CAST(e.n2 AS DOUBLE) * CAST(c.c_n2 AS DOUBLE)),"
        " 6) AS csim FROM ne e, icents c)",
        "iranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id"
        " ORDER BY csim DESC, cell_id ASC) AS crank FROM iscored)",
        "iassign AS (SELECT vec_id, cell_id FROM iranked WHERE crank = 1)",
        f"iprobe AS (SELECT vec_id AS query_id, cell_id FROM iranked"
        f" WHERE vec_id < {_N_QUERIES} AND crank <= {_IVF_PROBE})",
        "ivfcand AS (SELECT p.query_id, a.vec_id AS neighbor_id"
        " FROM iprobe p JOIN iassign a USING (cell_id)"
        " WHERE a.vec_id <> p.query_id)",
        "cadc AS (SELECT adc.query_id, adc.neighbor_id, adc.adc_d2"
        " FROM adc JOIN ivfcand USING (query_id, neighbor_id))",
    ]
    ctes = _pq_adc_ctes() + ivf_ctes + _recall_tail_ctes("cadc")
    return "WITH " + ",\n".join(ctes) + _RECALL_SELECT


QUERIES["ivfpq_recall_at_k"] = q_ivfpq_recall_at_k
ORACLE_SQL["ivfpq_recall_at_k"] = _sql_ivfpq_recall()


# ---------------------------------------------------------------------------
# Prefix-filtered set-similarity join (llm/dedup.py::jaccard_prefix_pairs).
# The oracle is the FULL inverted-index Jaccard join at the same threshold,
# so a green row proves the prefix filter is lossless (no false negatives)
# and the verify step admits no false positives.
# ---------------------------------------------------------------------------


def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakeforge.llm.dedup import jaccard_prefix_pairs

    return jaccard_prefix_pairs(
        _neardup_corpus(spark, sf_dir), "text", "doc_id",
        shingle_n=3, df_cap=50, tau_permille=600,
    )


SQL_JACCARD_PREFIX_PAIRS = f"""
WITH {_NEARDUP_CORPUS},
{_shingle_ctes(3)},
dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfreq USING (shingle) WHERE df <= 50),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM rare GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
    FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
out AS (
    SELECT i.doc_a, i.doc_b, i.n_inter,
           CAST(sa.n_sh + sb.n_sh - i.n_inter AS BIGINT) AS n_union
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, n_inter, n_union,
       CAST((n_inter * 1000) // n_union AS BIGINT) AS jaccard_permille
FROM out WHERE (n_inter * 1000) // n_union >= 600
"""

QUERIES["jaccard_prefix_pairs"] = q_jaccard_prefix_pairs
ORACLE_SQL["jaccard_prefix_pairs"] = SQL_JACCARD_PREFIX_PAIRS


# ---------------------------------------------------------------------------
# Leakage-safe train/eval split: split by NEAR-DUP CLUSTER, not by doc.
# ---------------------------------------------------------------------------

def q_docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe train/eval split: assign each near-dup CLUSTER
    (MinHash+LSH pairs -> connected components; singletons are their own
    cluster) wholly to one split by hashing the cluster id — a near-dup of
    a training doc can never land in eval.  The output quantifies exactly
    that: ``straddle_cluster_split`` (clusters seen in both splits under
    the cluster-hash policy — 0 by construction, REPORTED not assumed) vs
    ``straddle_naive_split`` (the same count under the usual doc-id-hash
    split — positive, the leak every naive split ships).

    Scale: reuses the neardup pipeline's banded LSH (never all-pairs) and
    hash-partitioned components; split assignment and both audits are one
    aggregate each over the (doc, cluster) frame, which is persisted
    because four branches consume it.
    """
    from lakeforge import cache
    from lakeforge.functions.keys import md5_int
    from lakeforge.ops.graph import connected_components

    corpus = _neardup_corpus(spark, sf_dir)
    sig = minhash_signatures(corpus, "text", "doc_id", k=_K, shingle_n=3)
    pairs = lsh_candidate_pairs(sig, k=_K, bands=_BANDS, min_match=_MIN_MATCH)
    comp = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    docs = cache.persist_tracked(
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .select(
            "doc_id",
            "cluster_id",
            F.when(F.pmod(md5_int("cluster_id"), F.lit(10)) < 8, "train")
            .otherwise("eval").alias("split"),
            F.when(F.pmod(md5_int("doc_id"), F.lit(10)) < 8, "train")
            .otherwise("eval").alias("naive_split"),
        )
    )
    per_split = docs.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
    )

    def straddle(col: str, alias: str) -> DataFrame:
        return (
            docs.groupBy("cluster_id")
            .agg(F.countDistinct(col).alias("ns"))
            .agg(
                F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
                .cast("bigint").alias(alias)
            )
        )

    return per_split.crossJoin(
        F.broadcast(straddle("split", "straddle_cluster_split"))
    ).crossJoin(F.broadcast(straddle("naive_split", "straddle_naive_split")))


def _sql_leakage_safe_split() -> str:
    pairs_sql = _sql_minhash_lsh_pairs()
    cl_hash = duckdb_md5_int_sql(["cluster_id"])
    doc_hash = duckdb_md5_int_sql(["doc_id"])
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
und AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(v, r) AS (
    SELECT a, a FROM und
    UNION
    SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v),
ids AS (
    SELECT doc_id FROM documents
    UNION ALL
    SELECT doc_id + 1000000 FROM documents WHERE doc_id % 5 = 0
),
docs AS (
    SELECT i.doc_id,
           COALESCE(c.cluster_id, i.doc_id) AS cluster_id
    FROM ids i LEFT JOIN comp c ON c.doc_id = i.doc_id
),
tagged AS (
    SELECT doc_id, cluster_id,
           CASE WHEN {cl_hash} % 10 < 8 THEN 'train' ELSE 'eval' END AS split,
           CASE WHEN {doc_hash} % 10 < 8 THEN 'train' ELSE 'eval' END
               AS naive_split
    FROM docs
),
per_split AS (
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
    FROM tagged GROUP BY split
),
sc AS (
    SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS straddle_cluster_split
    FROM (SELECT cluster_id, count(DISTINCT split) AS ns
          FROM tagged GROUP BY cluster_id)
),
sn AS (
    SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS straddle_naive_split
    FROM (SELECT cluster_id, count(DISTINCT naive_split) AS ns
          FROM tagged GROUP BY cluster_id)
)
SELECT per_split.*, sc.straddle_cluster_split, sn.straddle_naive_split
FROM per_split, sc, sn
"""


QUERIES["docs_leakage_safe_split"] = q_docs_leakage_safe_split
ORACLE_SQL["docs_leakage_safe_split"] = _sql_leakage_safe_split()


# ---------------------------------------------------------------------------
# Cross-source duplication matrix: which corpus sources contaminate each
# other.  The per-pair near-dup detector (MinHash+LSH banding) is reused
# as-is; this rolls its output up to the source x source level — the view
# a corpus curator actually acts on (e.g. "crawl-B is 40% re-hosted
# crawl-A content, downweight it").
# ---------------------------------------------------------------------------


def q_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pair counts aggregated by unordered source pair.

    Scale design: candidate pairs come from the banded-LSH equi-join
    (already bounded, never all-pairs); the source lookup joins a slim
    (doc_id, source) projection twice — a dimension-sized side that AQE
    broadcasts when small and shuffle-joins otherwise; the final matrix
    is |sources|^2 rows.  Mutated corpus members (+1_000_000 ids) map to
    their origin's source via doc_id % 1_000_000 on both engines.
    """
    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    src = _documents(spark, sf_dir).select("doc_id", "source")
    a = src.select(F.col("doc_id").alias("_ida"), F.col("source").alias("_sa"))
    b = src.select(F.col("doc_id").alias("_idb"), F.col("source").alias("_sb"))
    j = (
        pairs.withColumn("_oa", F.col("doc_a") % 1000000)
        .withColumn("_ob", F.col("doc_b") % 1000000)
        .join(a, F.col("_oa") == F.col("_ida"))
        .join(b, F.col("_ob") == F.col("_idb"))
    )
    return j.groupBy(
        F.least("_sa", "_sb").alias("source_lo"),
        F.greatest("_sa", "_sb").alias("source_hi"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_pairs"),
        F.sum("n_match").cast("bigint").alias("sum_match"),
    )


SQL_CROSS_SOURCE_DUP_MATRIX = f"""
WITH pairs AS (SELECT * FROM ({_sql_minhash_lsh_pairs()}) _p),
src AS (SELECT doc_id, source FROM documents)
SELECT LEAST(sa.source, sb.source) AS source_lo,
       GREATEST(sa.source, sb.source) AS source_hi,
       CAST(COUNT(*) AS BIGINT) AS dup_pairs,
       CAST(SUM(p.n_match) AS BIGINT) AS sum_match
FROM pairs p
JOIN src sa ON p.doc_a % 1000000 = sa.doc_id
JOIN src sb ON p.doc_b % 1000000 = sb.doc_id
GROUP BY 1, 2
"""

QUERIES["cross_source_dup_matrix"] = q_cross_source_dup_matrix
ORACLE_SQL["cross_source_dup_matrix"] = SQL_CROSS_SOURCE_DUP_MATRIX


# ---------------------------------------------------------------------------
# Dedup-weighted effective token mass: what the corpus is actually worth
# for training after near-duplicate discounting.  Raw token counts
# overstate a corpus with heavy internal duplication; weighting each doc
# by 1/cluster_size makes duplicated content count once in aggregate.
# ---------------------------------------------------------------------------


def q_effective_token_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus sizing after near-dup discounting.

    Composition: near-dup components (checkpointed min-label propagation
    over the banded-LSH pairs) give each doc a cluster size (absent docs
    are singletons, size 1); each doc contributes
    floor(1000 * n_tokens / cluster_size) millitokens — an exact
    integer, so the per-source rollup hashes identically everywhere.
    Shuffles: the LSH pipeline's own, one left join of the slim
    (doc_id, size) table, one groupBy(source).  Text is tokenized once
    and never shuffled (token COUNT, not tokens, leaves the first
    Project).
    """
    from lakeforge.llm.dedup import lsh_candidate_pairs, minhash_signatures
    from lakeforge.llm.text import tokens_col
    from lakeforge.ops.graph import connected_components

    corpus = _neardup_corpus(spark, sf_dir)
    sig = minhash_signatures(corpus, "text", "doc_id", k=_K, shingle_n=3)
    pairs = lsh_candidate_pairs(sig, k=_K, bands=_BANDS, min_match=_MIN_MATCH)
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("csize")
    )
    doc_size = comp.join(sizes, "component").select(
        F.col("vertex").alias("doc_id"), "csize"
    )
    toks = corpus.select(
        "doc_id", F.size(tokens_col("text")).cast("bigint").alias("n_tokens")
    )
    src = _documents(spark, sf_dir).select(
        F.col("doc_id").alias("_sid"), "source"
    )
    per_doc = (
        toks.join(doc_size, "doc_id", "left")
        .withColumn("csize", F.coalesce("csize", F.lit(1)))
        .join(src, toks["doc_id"] % 1000000 == F.col("_sid"))
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("csize") > 1).cast("int")).cast("bigint").alias("dup_docs"),
        F.sum("n_tokens").cast("bigint").alias("raw_tokens"),
        F.sum(F.expr("(1000 * n_tokens) div csize"))
        .cast("bigint")
        .alias("eff_millitokens"),
    )


def _sql_effective_token_mass() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_sql_minhash_lsh_pairs()}),
und AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b, doc_a FROM pairs
),
reach(v, r) AS (
    SELECT a, a FROM und
    UNION
    SELECT u.b, reach.r FROM reach JOIN und u ON u.a = reach.v
),
comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
sizes AS (SELECT component, COUNT(*) AS csize FROM comp GROUP BY component),
doc_size AS (SELECT c.doc_id, s.csize FROM comp c JOIN sizes s USING (component)),
{_NEARDUP_CORPUS.strip()},
toks AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM corpus),
per_doc AS (
    SELECT t.doc_id, t.n_tokens, COALESCE(d.csize, 1) AS csize, s.source
    FROM toks t
    LEFT JOIN doc_size d ON d.doc_id = t.doc_id
    JOIN (SELECT doc_id, source FROM documents) s
      ON t.doc_id % 1000000 = s.doc_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
       CAST(SUM((1000 * n_tokens) // csize) AS BIGINT) AS eff_millitokens
FROM per_doc GROUP BY source
"""


QUERIES["effective_token_mass"] = q_effective_token_mass
ORACLE_SQL["effective_token_mass"] = _sql_effective_token_mass()
