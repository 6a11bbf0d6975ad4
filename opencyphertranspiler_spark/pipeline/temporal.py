"""Temporal joins Spark lacks as built-ins: as-of join and bounded
interval (range) join.

Both are expressed as compositions of built-in DataFrame operators — no
Pandas hop, no per-key loops — so they keep the 100 TB properties:

- as_of_join: ONE shuffle. Tag both inputs, union them, and run a single
  keyed window ordered by (ts, tag): ``last(right payload, ignorenulls)``
  at each left row is exactly the latest right row with
  ``right_ts <= left_ts``. This is the scalable formulation of pandas
  ``merge_asof`` — shuffle volume is |left| + |right|, never a product.
- interval_join: the binning trick for range predicates. A raw
  ``l.ts BETWEEN r.ts AND r.ts + delta`` join is a BroadcastNestedLoop in
  Spark; bucketing both sides by ``floor(epoch/delta)`` and equi-joining
  on (key, bin) with the right side exploded to its two candidate bins
  turns it into a shuffle hash join + a cheap residual filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(col) -> "F.Column":
    """Epoch microseconds for TIMESTAMP and TIMESTAMP_NTZ alike.

    ``unix_micros`` rejects NTZ; the cast interprets NTZ in the session
    timezone, which cancels out everywhere we only compare or difference
    two timestamps from the same dataset — PROVIDED the session timezone
    is fixed-offset (e.g. the UTC this engine standardizes on,
    spark.sql.session.timeZone=UTC). Under a DST-shifting zone two NTZ
    values straddling a transition would differ by the DST offset; keep
    the session timezone UTC when feeding NTZ columns through here."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
    tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_ts <= left_ts`` sharing the ``on`` keys (null columns when no
    such row exists). ``tiebreak`` orders right rows that share a
    timestamp (defaults to the last of the right's own columns order)."""
    # a null right timestamp can never satisfy right_ts <= left_ts; drop
    # such rows up front (ascending sort would otherwise place them at the
    # partition head and last() would wrongly attach them to every left row)
    right = right.filter(F.col(right_ts).isNotNull())
    r_payload_cols = [c for c in right.columns if c not in on]
    collisions = {f"{right_prefix}{c}" for c in r_payload_cols} & set(
        left.columns
    )
    if collisions:
        raise ValueError(
            "as_of_join output column collision with left columns: "
            f"{sorted(collisions)}; pick a different right_prefix"
        )
    order_cols = [F.col("__ts"), F.col("__tag")]
    if tiebreak is not None:
        order_cols.append(F.col(f"__p.{tiebreak}"))
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in r_payload_cols]).alias("s")
            ).schema[0].dataType
        ).alias("__p"),
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema[0].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("__p"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in r_payload_cols
    ]
    return matched.select(*out_cols)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delta_seconds: int = 3600,
    right_prefix: str = "right_",
) -> DataFrame:
    """All (left, right) pairs sharing ``on`` keys with
    ``0 <= left_ts - right_ts <= max_delta_seconds``.

    Executes as an equi-join on (keys..., time bin): the right side fans
    out to its own bin and the next one, so every qualifying pair shares a
    join key — a shuffle hash join, not a nested loop."""
    if max_delta_seconds < 0:
        raise ValueError("max_delta_seconds must be >= 0")
    # same output-column collision guard as as_of_join: a left column named
    # like a prefixed right column would make the residual filter ambiguous
    clash = {f"{right_prefix}{c}" for c in right.columns if c not in on} & set(
        left.columns
    )
    if clash:
        raise ValueError(
            f"left columns {sorted(clash)} collide with prefixed right "
            f"columns; pass a different right_prefix"
        )
    # microsecond precision; the residual filter uses the TRUE bound, while
    # the bin width is padded to >= 1 so a 0-second delta still bins
    # (exact-timestamp pairs land in the same bin and survive the filter)
    bound_us = int(max_delta_seconds) * 1_000_000
    d_us = max(bound_us, 1)

    def bin_of(ts_col: str):
        # floor, not cast-truncation: negative epoch micros (pre-1970)
        # must round DOWN or boundary pairs land in the wrong bin
        return F.floor(_epoch_us(ts_col) / d_us).cast("long")

    l = left.select("*", bin_of(left_ts).alias("__bin"))
    r_cols = [c for c in right.columns if c not in on]
    r = right.select(
        *on,
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols],
        F.explode(
            F.array(bin_of(right_ts), bin_of(right_ts) + 1)
        ).alias("__bin"),
    )
    delta = _epoch_us(left_ts) - _epoch_us(f"{right_prefix}{right_ts}")
    return (
        l.join(r, [*on, "__bin"])
        .filter((delta >= 0) & (delta <= bound_us))
        .drop("__bin")
    )
