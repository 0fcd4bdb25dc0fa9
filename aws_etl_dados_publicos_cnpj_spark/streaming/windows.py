"""Structured Streaming surface.

The reference's "streaming-ness" is a weekly scheduler + per-table
incremental skip (SURVEY.md §2.1 S26/S14) — batch with
``Trigger.AvailableNow`` is its exact Spark form. Beyond parity, the
engine exposes real event-time semantics over the ``events`` stream
table: watermarked tumbling-window aggregation and session windows.

Batch/stream parity: ``hourly_event_rollup`` (batch) and
``streaming_hourly_rollup`` (stream) produce the same frame for the
same input — the batch form is the one the DuckDB oracle checks
(``date_bucket_events`` in operators/relational.py); the streaming form
is exercised by the availableNow test in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Batch form: tumbling 1 h window per event_type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_hourly_rollup(
    spark: SparkSession, source_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: file source → watermark → windowed agg.

    At scale the source is Kafka/file-arrival; the watermark bounds
    state so late events older than `watermark` are dropped instead of
    growing executor state forever."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows (dynamic gap-based windows) per user — works in
    both batch and streaming; the streaming form adds a watermark
    upstream. Equivalent to the lag+cumsum sessionization in
    operators/relational.py (``sessionize_events``)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def streaming_session_counts(
    spark: SparkSession, source_dir: str, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    return session_window_counts(stream.withWatermark("ts", watermark), gap)


def streaming_dedup_events(
    spark: SparkSession, source_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup on event_id — the streaming twin of the
    batch dedup family: state holds only ids within the watermark, so
    replayed/duplicated input (at-least-once sources) collapses to
    exactly-once output with bounded state."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def streaming_enriched_events(
    spark: SparkSession, source_dir: str, dim: DataFrame, dim_key: str = "c_custkey"
) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a static
    dimension (broadcast — re-read per micro-batch, never shuffled).
    The ingest-time enrichment pattern for a 100 TB event feed."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    return stream.join(
        F.broadcast(dim), stream.user_id == dim[dim_key], "left"
    ).select("event_id", "user_id", "event_type", "value", *[c for c in dim.columns if c != dim_key])


def run_available_now(agg: DataFrame, query_name: str) -> None:
    """Drain all available input through the streaming query into an
    in-memory sink (Trigger.AvailableNow ≡ the reference's scheduled
    incremental batch, SURVEY.md §2.2 streaming row)."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def click_error_interval_join(clicks: DataFrame, errors: DataFrame) -> DataFrame:
    """Shared join logic for the stream-stream interval join and its
    batch twin: each click pairs with the SAME USER's errors occurring
    within the following 5 minutes (the batch analog of the bucketed
    range join in ``operators/temporal.py``)."""
    return clicks.join(
        errors,
        F.expr(
            "user_id = err_user AND "
            "err_ts >= click_ts AND err_ts <= click_ts + INTERVAL 5 MINUTES"
        ),
    ).select("user_id", "click_id", "err_id", "click_ts", "err_ts")


def _split_click_error(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("err_user"),
        F.col("event_id").alias("err_id"),
        F.col("ts").alias("err_ts"),
    )
    return clicks, errors


def streaming_click_error_join(
    spark: SparkSession, source_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """STREAM-STREAM inner join with event-time bounds: both sides are
    watermarked so the join state is bounded — a click can only match
    errors up to 5 minutes later, so once the error-side watermark
    passes click_ts + 5 min the buffered click row is evicted. Without
    the time bound (or watermarks) Spark would have to buffer both
    streams forever; this is the canonical bounded-state shape for
    correlating two 100 TB event feeds."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).format("parquet").load(source_dir)
    clicks, errors = _split_click_error(stream)
    return click_error_interval_join(
        clicks.withWatermark("click_ts", watermark),
        errors.withWatermark("err_ts", watermark),
    )


def batch_click_error_join(events: DataFrame) -> DataFrame:
    """Batch twin of ``streaming_click_error_join`` (same plan shape
    minus the state store) — the parity reference for tests."""
    clicks, errors = _split_click_error(events)
    return click_error_interval_join(clicks, errors)
