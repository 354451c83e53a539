"""Structured Streaming ingest of the events stream (SURVEY.md §2.8 — an
extension; the reference has no streaming surface).

Design:
- ``read_events_stream`` is the streaming twin of ``io.sources.read_events``:
  same schema, same nanos->micros normalization, but ``readStream`` so new
  parquet files landing in the directory become micro-batches.
- ``windowed_counts`` is a classic watermarked tumbling-window aggregate.
  The watermark bounds state: late events beyond it are dropped and window
  state older than (watermark + window) is evicted — which is what keeps a
  100 TB/day stream's state finite.  The SAME function works on a batch
  DataFrame (Spark's unified model); the batch path is what the DuckDB
  oracle checks, and streaming equivalence is asserted in tests via an
  availableNow run.
- Use ``run_available_now`` + memory sink only in tests; production sinks
  are parquet/kafka with checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Physical schema of events.parquet with nanosAsLong in effect (ts: bigint).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

EVENTS_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming scan of an events parquet directory.

    ``maxFilesPerTrigger`` bounds micro-batch size — the knob that keeps
    per-batch memory flat when backfilling a large directory.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type.

    Works identically on a stream (stateful, watermark-bounded) and a batch
    frame (watermark is a no-op there) — one definition, two execution
    modes.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain all available input into an in-memory table (tests only) and
    return it as a batch DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
