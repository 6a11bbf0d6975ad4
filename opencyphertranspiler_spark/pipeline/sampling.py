"""Sampling and groupwise-selection utilities for dataset mixing.

- stratified_sample: deterministic per-stratum sampling — the data-mixing
  primitive (e.g. cap each source/language at N docs, or keep an exact
  fraction of every stratum). Seeded xxhash64 ranking makes the draw
  reproducible across runs and cluster layouts (no RNG-per-partition
  nondeterminism).
- grouped_topk: generic per-group top-k with a two-phase window — rank
  within (group, physical partition) first, so no single-group sort task
  sees more than k * n_partitions rows. similarity._global_topk is the
  specialised cosine-ranking instance of the same idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__part", "__lr", "__r", "__cnt")


def _check_columns(df: DataFrame, produced: tuple[str, ...] = ()):
    clash = [c for c in (*_RESERVED, *produced) if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash}; rename them first "
            "(they would be silently overwritten)"
        )


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int | None = None,
    fraction: float | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Sample each stratum down to ``n_per_stratum`` rows, or to an exact
    ``ceil(fraction * stratum_size)`` rows per stratum.

    Ranking key = (xxhash64(id, seed), id): deterministic, uniform, and
    independent of partitioning — rerunning on repartitioned data returns
    the SAME sample, PROVIDED ``id_col`` is unique and non-null (rows
    tying on the full key are ordered arbitrarily). n_per_stratum mode
    pre-reduces per (stratum, partition) so huge strata never funnel into
    one task; fraction mode needs the true stratum size, so it pays one
    full per-stratum window."""
    if (n_per_stratum is None) == (fraction is None):
        raise ValueError("pass exactly one of n_per_stratum / fraction")
    _check_columns(df)
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    if fraction is not None:
        if not (0.0 <= fraction <= 1.0):
            raise ValueError("fraction must be in [0, 1]")
        w = Window.partitionBy(*strata)
        w_rank = w.orderBy(h.asc(), F.col(id_col))
        return (
            df.withColumn("__cnt", F.count(F.lit(1)).over(w))
            .withColumn("__r", F.row_number().over(w_rank))
            .filter(
                # round(...,9) before ceil: binary float error at exact
                # boundaries (0.7*10 -> 7.000000000000001) must not
                # overshoot the stratum sample size by 1. Known limits of
                # the 1e-9 guard: strata beyond ~1e10 rows can still
                # overshoot by 1 (float error > 5e-10 * cnt), and a
                # genuine fraction < 5e-10 rounds to 0 rows instead of
                # ceil's 1 — both far outside sane sampling use
                F.col("__r")
                <= F.ceil(F.round(F.lit(fraction) * F.col("__cnt"), 9))
            )
            .drop("__cnt", "__r")
        )
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
    two_phase: bool = True,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (ties broken by ``tiebreak``
    for a deterministic result), with the rank in ``rank_col``.

    Two-phase by default: rank within (group, physical partition) first,
    then globally — disable for inputs already pruned per group."""
    _check_columns(df, produced=(rank_col,))
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    order = [oc] + ([F.col(tiebreak)] if tiebreak else [])
    if two_phase:
        w_local = Window.partitionBy(*keys, "__part").orderBy(*order)
        df = (
            df.withColumn("__part", F.spark_partition_id())
            .withColumn("__lr", F.row_number().over(w_local))
            .filter(F.col("__lr") <= k)
            .drop("__part", "__lr")
        )
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
