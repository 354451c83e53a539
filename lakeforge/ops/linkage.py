"""Fuzzy record linkage: blocked pairwise string matching.

The record-linkage / entity-resolution primitive that exact-key joins and
survivorship (workload_rel's customer_golden_record) can't cover: find
row PAIRS whose join key is merely SIMILAR (typos, OCR noise, vendor
feeds with hand-keyed names).

All-pairs edit distance is O(n²) — the classic scale killer.  The
standard decomposition is BLOCKING: rows are hashed into candidate
blocks by a cheap, typo-robust key (here: a caller-supplied expression,
e.g. prefix + length band), pairs are generated only WITHIN a block via
a self-equi-join on the block key, and the expensive comparator
(``levenshtein``, JVM-side) runs on those candidates alone.  A block-size
cap drops degenerate blocks (the df-cap guard the dedup inverted index
uses — llm/dedup.py) so one hot block can't go quadratic; dropped blocks
are an explicit recall tradeoff, the same contract as every blocking
scheme.

Recall contract: a pair is findable only if both rows share a block key,
so the key must be chosen to survive the edit operations of interest
(e.g. a prefix key misses typos inside that prefix).  Multi-pass
blocking on different keys union-ed together is the standard recall
booster; compose this operator per pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeforge import cache


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_key: Column,
    max_dist: int = 2,
    max_block: int = 1000,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, dist) with edit distance <= max_dist,
    generated within blocks of ``block_key``; id_a < id_b.

    Two cheap prefilters run before the O(len²) levenshtein: the length
    difference bound (|len(a)-len(b)| <= max_dist implies nothing about
    distance being smaller, but distance is AT LEAST the length gap, so
    larger gaps can't match) and the a<b ordering that halves the pair
    space.  Blocks larger than ``max_block`` are dropped whole (count
    them via the returned frame's observability hook or a separate
    profile query) — a bounded-fanout guarantee, not a best-effort hint.
    """
    if max_dist < 0 or max_block < 2:
        raise ValueError("max_dist must be >= 0 and max_block >= 2")
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        block_key.alias("blk"),
        F.length(text_col).alias("len"),
    )
    sizes = b.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
    # No broadcast hint: the size frame has one row per distinct block,
    # which scales with the data — let AQE pick BHJ only when it's small.
    kept = cache.persist_tracked(
        b.join(sizes.filter(F.col("n") <= max_block), "blk")
    )
    lft = kept.select(
        "blk",
        F.col("id").alias("id_a"),
        F.col("txt").alias("txt_a"),
        F.col("len").alias("len_a"),
    )
    rgt = kept.select(
        "blk",
        F.col("id").alias("id_b"),
        F.col("txt").alias("txt_b"),
        F.col("len").alias("len_b"),
    )
    return (
        lft.join(rgt, "blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("txt_a", "txt_b").cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
