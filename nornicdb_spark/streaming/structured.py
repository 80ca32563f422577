"""Structured Streaming pipelines over the events table.

The reference has no stream processing (SURVEY §2.11) — these are the
capability-parity extension: the decay/inference/temporal batch jobs
re-expressed as continuous queries. Patterns per the Spark guide:
file source → watermark → windowed/session agg → sink; tests drive them
synchronously with the memory sink + processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based event stream (one-file-per-trigger parquet source).
    In production this is Kafka; the transformations are source-agnostic.

    The stream schema is taken from a batch read of the same file so the
    reader tracks the fixture's physical encoding (older fixtures wrote
    ts as TIMESTAMP(NANOS) → long nanos under the legacy conf; newer ones
    write TIMESTAMP(MICROS) which Spark reads natively), mirroring the
    batch catalog's normalization."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = sf_dir.rstrip("/")
    raw_schema = spark.read.parquet(f"{path}/events.parquet").schema
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .load(path)
    )
    ts_type = raw.schema["ts"].dataType.typeName()
    if ts_type in ("long", "bigint"):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type != "timestamp":
        # TIMESTAMP_NTZ → TIMESTAMP (value-preserving under UTC session
        # tz; event-time watermarks require TimestampType).
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_event_counts(
    stream: DataFrame,
    window: str = "15 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling/sliding window counts + value sums per event_type with
    late-data watermark."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_window_stats(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (native session_window operator — the
    streaming twin of sessions.sessionize)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drive a bounded file stream to completion via the memory sink and
    return the materialized result (test/bench harness helper)."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
