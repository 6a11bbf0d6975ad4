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
