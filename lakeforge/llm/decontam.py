"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pretraining-hygiene step (n-gram collision decontamination, as
popularized by the GPT-3/PaLM data cards): any training doc containing
enough distinct benchmark shingles is quarantined before training.

Scale shape (the part that matters at 100 TB):
- The BENCHMARK side is inherently small (eval sets are MBs) — its distinct
  shingle-hash set is broadcast; the corpus is never shuffled by shingle.
- The corpus is scanned ONCE: explode shingles -> hash -> mark membership
  against the broadcast set -> one hash aggregate per doc.  The exchange
  carries per-doc counters only (map-side partial agg), never text.
- Shingles compare as 32-bit md5 hashes (functions/keys.py::md5_int32),
  exactly reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeforge.functions.keys import md5_int32
from lakeforge.llm.dedup import _doc_shingles


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 5,
    min_hits: int = 3,
) -> DataFrame:
    """Per corpus doc: distinct-shingle count, benchmark-hit count, and a
    ``contaminated`` flag (>= min_hits distinct benchmark shingles).

    ``min_hits`` absorbs chance collisions of common phrases; raise it (or
    shingle_n) for noisy corpora, set to 1 for strict quarantine.
    """
    c = _doc_shingles(corpus, text_col, id_col, shingle_n).select(
        "doc_id", md5_int32("shingle").alias("h")
    )
    bench_set = (
        _doc_shingles(benchmark, text_col, id_col, shingle_n)
        .select(md5_int32("shingle").alias("h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    marked = c.join(F.broadcast(bench_set), "h", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) >= F.lit(min_hits)).alias(
            "contaminated"
        ),
    )
