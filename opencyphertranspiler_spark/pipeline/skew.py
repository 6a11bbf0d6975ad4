"""Skew-aware join helper: key salting.

AQE's skew-join handling (spark.sql.adaptive.skewJoin.enabled) covers
sort-merge joins automatically; salting is the explicit fallback for the
cases AQE cannot split — e.g. a shuffled hash join on a power-law key where
one key holds a double-digit percentage of all rows.

salted_join(big, small, key, salt=16) replicates the SMALL side salt times
(salt is bounded; the small side stays small) and scatters the BIG side's
hot keys uniformly across the salt space, so no single task receives a
whole hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key: big rows get a deterministic salt from
    a row-content hash; small rows are exploded across all salt values.

    Output columns = big's columns + small's non-key columns (the join key
    survives once, from the big side)."""
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)).cast("int")
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big_salted.join(small_salted, on=[key, "__salt"], how=how)
    return out.drop("__salt")
