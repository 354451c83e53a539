"""Embedding similarity search: brute-force cosine top-k (baseline) and
random-hyperplane LSH bucketing (the scale path).

Fixed-point determinism: float32 embeddings are scaled to nano-unit int64
("nano embedding": round(v * 1e9)).  Dot products and norms are then EXACT
integer sums — independent of summation order, identical across Spark,
numpy, and DuckDB — and only the final divide/sqrt touch IEEE doubles
(correctly-rounded ops on identical inputs => identical bits).  This is
what lets an approximate-NN operator be oracle-checked value-for-value.

Scale notes:
- ``cosine_topk`` is the O(Q*N) baseline: broadcast the (small) query set,
  scan the corpus once, per-partition top-k via window.  Right answer for
  Q small; for Q ~ N use ``rp_lsh_buckets`` to bucket both sides and join
  on bucket (candidate generation), then re-rank with the exact kernel.
- ``rp_lsh_buckets`` runs as an Arrow-batched pandas UDF (one matmul per
  batch) — the vectorized Python path, ~100x a row-at-a-time UDF.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

NANO = 1_000_000_000


def nano_embedding(col: Column | str) -> Column:
    """array<float> -> array<bigint> nano-units (exact, portable).

    DuckDB twin: ``list_transform(e, v -> CAST(round(CAST(v AS DOUBLE) *
    1000000000) AS BIGINT))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda v: F.round(v.cast("double") * F.lit(NANO).cast("double")).cast("bigint")
    )


def _dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column | str) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    Returns (query_id, neighbor_id, rank, sim) — sim rounded to 6dp; rank
    ordered by (sim desc, neighbor_id) so ties break deterministically.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        nano_embedding(vec_col).alias("q_vec"),
    ).withColumn("q_n2", _norm2("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        nano_embedding(vec_col).alias("c_vec"),
    ).withColumn("c_n2", _norm2("c_vec"))

    # Broadcast the small query side; the corpus streams through once.
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(
        _dot("q_vec", "c_vec").cast("double")
        / F.sqrt(F.col("q_n2").cast("double") * F.col("c_n2").cast("double")),
        6,
    )
    scored = joined.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def lsh_planes(n_planes: int, dim: int) -> np.ndarray:
    """±1 hyperplane matrix derived from md5 — identical in the DuckDB
    oracle (same md5, same layout)."""
    w = np.empty((n_planes, dim), dtype=np.int64)
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"h|{p}|{d}".encode()).hexdigest()[:8], 16)
            w[p, d] = (h % 2) * 2 - 1
    return w


def rp_lsh_buckets(
    df: DataFrame, vec_col: str, id_col: str, n_planes: int = 16, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH: sign-pattern bucket id per vector.

    Arrow-batched pandas UDF: each batch is one int64 matmul
    (batch x dim) @ (dim x planes) — exact integer math, no float drift.
    """
    w_t = lsh_planes(n_planes, dim).T  # (dim, planes)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(LongType())
    def bucket_of(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64) * NANO
        # HALF_UP like SQL round(), not numpy's banker's rounding.
        nano = (np.sign(mat) * np.floor(np.abs(mat) + 0.5)).astype(np.int64)
        dots = nano @ w_t  # exact: |dot| <= 64 * 3e8 << 2^63
        return pd.Series(((dots >= 0) * weights).sum(axis=1))

    return df.select(
        F.col(id_col).alias("vec_id"), bucket_of(F.col(vec_col)).alias("bucket")
    )
