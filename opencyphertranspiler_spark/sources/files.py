"""File-format sources and sinks beyond parquet.

The reference binds entities to SQL tables/views
(/root/reference/src/SQLRenderer/SQLTableDescriptor.cs:8-13); here any
DataFrame-producing source can back a node or edge. These helpers register
csv/json directories and provide a partitioned-parquet sink for query
results — the round-trip a pipeline needs (query -> curated table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import TableRegistry


def register_csv(
    reg: TableRegistry,
    spark: SparkSession,
    name: str,
    path: str,
    schema: str | None = None,
    header: bool = True,
) -> None:
    """Register a CSV-backed table. Pass an explicit DDL schema for
    production use — schema inference scans the data twice."""

    def load() -> DataFrame:
        reader = spark.read.option("header", str(header).lower())
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)

    reg.register(name, load)


def register_json(
    reg: TableRegistry,
    spark: SparkSession,
    name: str,
    path: str,
    schema: str | None = None,
) -> None:
    """Register a JSON-lines-backed table (explicit schema recommended)."""

    def load() -> DataFrame:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)

    reg.register(name, load)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed the same way join WITHOUT a shuffle — the physical
    plan reads co-located buckets directly into the sort-merge join. This
    is the pre-partitioning strategy for repeatedly-joined 100 TB fact
    tables; at small scale it simply works via the session catalog."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(name)


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Sink a query result as a (optionally partitioned) table.

    ``partition_by`` drives directory-level partition pruning for readers;
    ``max_records_per_file`` bounds file sizes so downstream scans
    parallelize (the 100 TB default failure mode is one giant file per
    partition)."""
    writer = df.write.mode(mode).format(format)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def register_format(
    reg: TableRegistry,
    spark: SparkSession,
    name: str,
    path: str,
    format: str = "orc",
    schema: str | None = None,
    **options: str,
) -> None:
    """Register a table backed by ANY Spark DataFrame source (orc, avro
    when the package is on the classpath, text, parquet with custom
    options, a JDBC/catalog-backed format, ...). The generic escape hatch
    behind the csv/json conveniences — everything the engine needs from a
    source is `spark.read.format(...).load(...) -> DataFrame`."""

    def load() -> DataFrame:
        reader = spark.read.format(format)
        if schema is not None:
            reader = reader.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(path)

    reg.register(name, load)
