"""Event-stream operators over the ``events`` table.

The reference is batch-only (SURVEY.md §2.8 — zero streaming constructs);
these are the additive Structured-Streaming capabilities. Each operator has
one implementation that works on BOTH a batch DataFrame and a streaming
DataFrame (same F.window expressions), so the DuckDB oracle validates the
batch path and the streaming tests validate the incremental path with a
file source + availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def windowed_event_stats(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type (map-side partial aggs;
    one shuffle keyed by (window, event_type))."""
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_event_stats(
    df: DataFrame, window: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding-window counts/sums per event_type. F.window with a slide
    emits one row per (event, overlapping window) — window/slide fan-out
    happens map-side before the single keyed shuffle."""
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch form): a new session starts when a
    user's inter-event gap exceeds the threshold. Classic lag + running-sum
    window; shuffles once on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second epoch: the data carries microsecond timestamps
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double"), 1).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_session = df.withColumn("__new", is_new).withColumn(
        "session_no", F.sum("__new").over(w)
    )
    return (
        with_session.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_no").cast("long").alias("session_no"),
            "n_events",
            "session_start",
            "session_end",
            "sum_value",
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """The same windowed aggregation as a Structured Streaming query:
    file source -> watermark (late-data bound; lets state be evicted) ->
    tumbling window. Returns the streaming DataFrame; caller attaches a
    sink (tests use format('memory') + trigger(availableNow=True))."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)
    # the file-stream source requires a directory; a single-file path is
    # handled via its parent + a glob filter
    reader = spark.readStream.schema(batch.schema).option("maxFilesPerTrigger", 1)
    if events_dir.endswith(".parquet"):
        import os

        reader = reader.option("pathGlobFilter", os.path.basename(events_dir))
        stream = reader.parquet(os.path.dirname(events_dir))
    else:
        stream = reader.parquet(events_dir)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    from ..sources.tpch import _normalize_timestamps

    stream = _normalize_timestamps(stream)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )
