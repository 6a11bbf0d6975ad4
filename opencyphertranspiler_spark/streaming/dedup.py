"""Streaming deduplication for document ingest pipelines.

At 100 TB-scale ingest, exact dedup cannot wait for a batch job: the
stream operator drops duplicates as they arrive. State is bounded by the
watermark: a fingerprint is remembered only for ``retention`` of event
time (dropDuplicatesWithinWatermark), so state size is
O(arrival-rate x retention), not O(corpus). Batch and streaming share the
same fingerprint expression (pipeline/text.py semantics: md5 over
whitespace-collapsed, lower-cased text), so the DuckDB-oracled batch
fingerprint validates the hash and the streaming test validates the
incremental drop behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprinted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the canonical content fingerprint column ``fp``."""
    return df.withColumn(
        "fp",
        F.md5(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))),
    )


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct content fingerprint.

    ``dropDuplicatesWithinWatermark`` bounds the fingerprint state to the
    watermark horizon — the streaming analogue of exact_duplicates
    (pipeline/dedup.py). Works on a streaming DataFrame with event-time
    column ``ts_col``."""
    return (
        fingerprinted(stream, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def dedup_batch(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Batch twin of dedup_stream: one row per fingerprint (no event-time
    bound needed — the whole corpus is visible)."""
    return fingerprinted(df, text_col).dropDuplicates(["fp"])


def stream_dedup_counts(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """File-source streaming dedup: read parquet as a stream and emit the
    deduplicated rows (append mode). ``path`` may be a directory (normal
    Spark output layout) or a single parquet file (streamed via its parent
    directory + a file-name glob, since the file source requires a
    directory)."""
    import os

    src = spark.read.parquet(path)
    reader = spark.readStream.schema(src.schema)
    if os.path.isdir(path):
        stream = reader.parquet(path)
    else:
        stream = reader.option(
            "pathGlobFilter", os.path.basename(path)
        ).parquet(os.path.dirname(path))
    from ..sources.tpch import _normalize_timestamps

    stream = _normalize_timestamps(stream)
    return dedup_stream(stream, ts_col, text_col, watermark)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delta_seconds: int = 3600,
    watermark: str = "2 hours",
    right_prefix: str = "right_",
) -> DataFrame:
    """Streaming twin of pipeline.temporal.interval_join: all pairs with
    ``0 <= left_ts - right_ts <= max_delta_seconds`` sharing the join keys.

    Uses Spark's native stream-stream inner join: the equality keys plus
    the event-time range condition let the state store evict rows older
    than ``watermark`` + ``max_delta_seconds`` — state is bounded by the
    time horizon, not the stream length."""
    r_cols = [c for c in right.columns if c not in on]
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = (
        right.select(
            *on, *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols]
        )
        .withWatermark(f"{right_prefix}{right_ts}", watermark)
        .alias("r")
    )
    cond = None
    for k in on:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = eq if cond is None else cond & eq
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_prefix}{right_ts}")
    cond = (
        cond
        & (lts >= rts)
        & (lts <= rts + F.expr(f"INTERVAL {max_delta_seconds} SECONDS"))
    )
    return l.join(r, cond).drop(*[F.col(f"r.{k}") for k in on])
