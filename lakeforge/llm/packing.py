"""GPT-style sequence packing: place every document into a fixed-length
packed token stream (concatenate in a deterministic order, split into
``seq_len`` bins) — the standard pretraining batching layout.

Output per doc: its absolute token offset in the stream (``tok_start``),
the bin it starts in (``bin_id``) and the offset within that bin.  A doc
whose tokens straddle a bin boundary continues into the next bin, exactly
like pretraining data loaders that split documents across sequences.

Scale shape — a DISTRIBUTED PREFIX SUM, not a global window:
the naive ``sum() OVER (ORDER BY doc_id)`` funnels the whole corpus
through ONE task (a scalability cliff).  Instead:
1. docs are grouped into ``chunk_size`` id-ranges; a windowed cumsum runs
   WITHIN each chunk (parallel, partitioned by chunk);
2. per-chunk token totals (one row per chunk — corpus/chunk_size rows) get
   an exclusive running total — the only serial window, over a frame
   thousands of times smaller than the corpus;
3. chunk offsets broadcast-join back: tok_start = chunk_offset + local.
Identical result to the global window (the DuckDB oracle IS the global
window), with no corpus-sized single-task stage.

All arithmetic is integer (div/pmod) — no float offsets at any stream
length up to 2^63 tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    n_tokens_col: str,
    id_col: str,
    seq_len: int = 2048,
    chunk_size: int = 4096,
) -> DataFrame:
    """Assign (tok_start, bin_id, bin_offset) to every doc, packing in
    ``id_col`` order.  ``df`` needs one row per doc with a token count.

    ``id_col`` must be an integral type: chunking CASTs it to bigint (a
    string id would chunk as NULL and be silently dropped by the join)
    and the within-chunk ordering must agree with the numeric chunk
    order (lexicographic string order would not).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"pack_sequences needs an integral id_col; {id_col} is "
            f"{id_type.simpleString()} — derive one first (e.g. "
            f"xxhash64(id) via functions/keys, or zipWithIndex-style ids)"
        )
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(n_tokens_col).cast("bigint").alias("n_tokens"),
        F.expr(f"CAST({id_col} AS BIGINT) div {chunk_size}").alias("__chunk"),
    )
    w_local = (
        Window.partitionBy("__chunk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__local_end", F.sum("n_tokens").over(w_local))

    totals = d.groupBy("__chunk").agg(F.sum("n_tokens").alias("__chunk_tokens"))
    w_chunks = Window.orderBy("__chunk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__chunk",
        F.coalesce(F.sum("__chunk_tokens").over(w_chunks), F.lit(0)).alias("__off"),
    )

    out = (
        d.join(F.broadcast(offsets), "__chunk")
        .withColumn(
            "tok_start",
            (F.col("__off") + F.col("__local_end") - F.col("n_tokens")).cast("bigint"),
        )
        .withColumn("bin_id", F.expr(f"tok_start div {seq_len}"))
        .withColumn("bin_offset", F.pmod("tok_start", F.lit(seq_len)).cast("bigint"))
    )
    return out.select("doc_id", "n_tokens", "tok_start", "bin_id", "bin_offset")
