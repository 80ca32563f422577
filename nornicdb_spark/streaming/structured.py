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


def run_to_completion(
    stream_df: DataFrame, query_name: str, mode: str = "complete"
) -> DataFrame:
    """Drive a bounded file stream to completion via the memory sink and
    return the materialized result (test/bench harness helper).
    ``mode='append'`` for stream-stream joins / dropDuplicates, which
    reject complete mode."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def stateful_access_tracker(stream: DataFrame, tier: str = "SEMANTIC") -> DataFrame:
    """Custom stateful operator: per-user access tracking with decay +
    reinforcement across micro-batches via ``applyInPandasWithState`` —
    the Structured-Streaming twin of the reference's temporal access
    tracker + decay manager (pkg/temporal/tracker.go; decay.go:549-586
    Reinforce = LastAccessed→now, AccessCount++; score formula
    decay.go:503-545 = 0.4·recency + 0.3·frequency + 0.3·importance).

    State per user = (access_count, last_access_us). Each batch emits one
    row per active user: the score the memory had DECAYED TO just before
    this batch's first access (shows the decay), and the post-
    reinforcement score (recency = 1). At 100 TB this is the canonical
    keyed-state shape: state lives in the state store partitioned by
    user, each micro-batch touches only active keys."""
    import math

    from pyspark.sql.streaming.state import GroupStateTimeout

    from nornicdb_spark.streaming.decay import (
        FREQUENCY_W, HALF_LIFE_DAYS, IMPORTANCE_W, RECENCY_W, TIER_IMPORTANCE,
    )

    lam_us = math.log(2) / (HALF_LIFE_DAYS[tier] * 24.0 * 3600.0 * 1e6)
    imp = TIER_IMPORTANCE[tier]
    out_schema = (
        "user_id long, access_count long, last_access timestamp, "
        "score_before double, score_after double"
    )
    state_schema = "n long, last_us long"

    def freq(n: int) -> float:
        return min(math.log(1.0 + n) / math.log(101.0), 1.0)

    def score(rec: float, n: int) -> float:
        s = RECENCY_W * rec + FREQUENCY_W * freq(n) + IMPORTANCE_W * imp
        return max(0.0, min(1.0, s))

    def update(key, pdfs, state):
        import pandas as pd

        n, last_us = state.get if state.exists else (0, 0)
        rows = pd.concat(list(pdfs)).sort_values("ts")
        first_us = int(rows["ts"].iloc[0].value // 1000)
        if n > 0:
            gap = max(0, first_us - last_us)
            before = score(math.exp(-lam_us * gap), n)
        else:
            before = 0.0
        n += len(rows)
        last_us = int(rows["ts"].iloc[-1].value // 1000)
        state.update((n, last_us))
        yield pd.DataFrame([{
            "user_id": key[0],
            "access_count": n,
            "last_access": pd.Timestamp(last_us * 1000),
            "score_before": before,
            "score_after": score(1.0, n),
        }])

    return (
        stream.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-based document stream — the ingest side of an incremental
    corpus pipeline (in production: Kafka/queue of new documents)."""
    path = sf_dir.rstrip("/")
    schema = spark.read.parquet(f"{path}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(path)
    )
