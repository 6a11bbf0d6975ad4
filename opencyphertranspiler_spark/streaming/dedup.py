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
    """File-source streaming dedup: read a parquet directory as a stream
    and emit the deduplicated rows (append mode)."""
    import os

    src = spark.read.parquet(path)
    stream = (
        spark.readStream.schema(src.schema)
        .option("pathGlobFilter", os.path.basename(path))
        .parquet(os.path.dirname(path))
    )
    return dedup_stream(stream, ts_col, text_col, watermark)
