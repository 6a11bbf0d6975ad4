"""Sampling and groupwise-selection utilities for dataset mixing.

- stratified_sample: deterministic per-stratum sampling — the data-mixing
  primitive (e.g. cap each source/language at N docs or at a fraction).
  Seeded xxhash64 ranking makes the draw reproducible across runs and
  cluster layouts (no RNG-per-partition nondeterminism).
- grouped_topk: generic per-group top-k with the same two-phase window
  shape as the similarity rankers — pre-reduce per (group, partition)
  before the per-group window, so no single-group sort task sees more
  than k * n_partitions rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int | None = None,
    fraction: float | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Sample each stratum down to ``n_per_stratum`` rows (exact) or to
    ``fraction`` (hash-proportional, exact-in-expectation).

    Ranking key = xxhash64(id, seed): deterministic, uniform, and
    independent of partitioning — rerunning on repartitioned data returns
    the SAME sample. n_per_stratum uses the two-phase top-k, so huge
    strata never funnel into one task."""
    if (n_per_stratum is None) == (fraction is None):
        raise ValueError("pass exactly one of n_per_stratum / fraction")
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    if fraction is not None:
        # map the 64-bit hash onto [0, 1); keep the low tail
        u = (h.cast("double") / F.lit(float(2**63)) + 1.0) / 2.0
        return df.filter(u < fraction)
    w_local = Window.partitionBy(*strata, "__part").orderBy(h.asc(), F.col(id_col))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col))
    return (
        df.withColumn("__part", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= n_per_stratum)
        .drop("__part", "__lr")
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= n_per_stratum)
        .drop("__r")
    )


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (ties broken by ``tiebreak``
    for a deterministic result). Two-phase: rank within (group, physical
    partition) first, then globally — the generic form of the similarity
    rankers' pre-reduction."""
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc] + ([F.col(tiebreak)] if tiebreak else [])
    w_local = Window.partitionBy(*keys, "__part").orderBy(*order)
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__part", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__part", "__lr")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
