"""Sketch-based approximate aggregations — the 100 TB substitutes for exact
distinct counts and exact quantiles.

- approx_distinct: HyperLogLog++ (Spark's approx_count_distinct). Constant
  memory per group vs the unbounded hash set of count(DISTINCT x); the
  shuffle carries one sketch per group instead of every distinct value.
- approx_quantiles: Greenwald-Khanna variant (percentile_approx) with a
  tunable accuracy/memory trade-off.

Both are deterministic for a fixed input partitioning, but they are
approximations — error bounds are asserted in tests, not an SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group approximate NDV with target relative standard deviation.

    rsd=0.02 uses ~sketches of a few KB; exact count(DISTINCT) on a high-
    cardinality column would shuffle every distinct value instead."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias(f"approx_ndv_{value_col}")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles; accuracy bounds the rank error at
    ~1/accuracy of the group size."""
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
        ).alias(f"approx_q_{value_col}")
    )


def approx_top_items(
    df: DataFrame,
    value_col: str,
    k: int = 10,
    per_partition: int | None = None,
) -> DataFrame:
    """(item, approx_count) — approximate top-k heavy
    hitters, the two-phase SpaceSaving-style sketch:

    1. per PHYSICAL partition, keep only the ``per_partition`` locally
       most-frequent items (default ``4 * k`` — the classic headroom that
       makes a globally-frequent item survive local eviction);
    2. merge the surviving candidates globally and take the top k.

    ``approx_count`` can UNDER-count (occurrences evicted in phase 1 are
    lost), never over-count, so it is a lower bound; items with true count
    >= n_rows / per_partition are guaranteed to surface (pigeonhole). The
    shuffle carries at most partitions * per_partition rows instead of one
    per distinct item — the difference on a 100 TB skewed key column.

    Exact counts for the RETURNED items are one cheap follow-up semi-join
    if needed; tests assert the guarantee on skewed data."""
    import pandas as pd

    if per_partition is None:
        per_partition = 4 * k
    src = df.select(F.col(value_col).alias("item"))

    def local_top(it):
        for pdf in it:
            vc = pdf["item"].value_counts().head(per_partition)
            yield pd.DataFrame({"item": vc.index, "c": vc.to_numpy()})

    schema = f"item {dict(src.dtypes)['item']}, c long"
    partial = src.mapInPandas(local_top, schema)
    return (
        partial.groupBy("item")
        .agg(F.sum("c").alias("approx_count"))
        .orderBy(F.col("approx_count").desc(), F.col("item"))
        .limit(k)
    )
