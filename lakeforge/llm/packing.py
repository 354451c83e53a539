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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window chunking: split each document's token stream into
    overlapping chunks of ``window`` tokens every ``stride`` tokens — the
    long-document complement to :func:`pack_sequences` (which packs SHORT
    docs into fixed bins): context-window preparation for training and
    retrieval corpora.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; the last
    chunk may be short; a document shorter than ``window`` yields exactly
    one chunk; an empty document yields none.  Chunk count is
    ``1 + ceil(max(n - window, 0) / stride)``.

    Zero shuffles: tokenize → per-row ``transform(sequence(...))`` →
    ``explode`` all happen inside the row's projection (whole-stage
    codegen).  At 100 TB this is a map-only pass; the output is
    write-partitioned however the sink needs.  The ``CASE WHEN`` guard
    matters: Spark's ``sequence(0, -1)`` is DESCENDING ``[0, -1]``, not
    empty (see the n-gram builders in llm/dedup.py).

    Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    from lakeforge.llm.text import tokens_col

    w, s = window, stride
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    chunks = F.expr(
        f"CASE WHEN __n > 0 THEN "
        f"transform(sequence(0, CASE WHEN __n > {w} THEN "
        f"(__n - {w} + {s} - 1) div {s} ELSE 0 END), "
        f"i -> slice(__toks, i * {s} + 1, {w})) "
        f"ELSE CAST(array() AS ARRAY<ARRAY<STRING>>) END"
    )
    return (
        toks.select("doc_id", F.posexplode(chunks).alias("chunk_id", "__c"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.size("__c").cast("bigint").alias("n_chunk_tokens"),
            F.concat_ws(" ", "__c").alias("chunk_text"),
        )
    )
