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


# ---------------------------------------------------------------------------
# streaming NEAR-duplicate detection (MinHash banding with bucket state)
# ---------------------------------------------------------------------------

_M31 = (1 << 31) - 1


def _signature_expr(text_col: str, n: int = 3, num_hashes: int = 32):
    """Row-local MinHash signature as an array<long> expression.

    The batch path (pipeline/dedup.py minhash_signature_df) uses
    explode + groupBy for whole-stage codegen; a STREAM cannot re-group
    per document, so here the signature folds inside the row with array
    lambdas (interpreted — fine at ingest rates, and the coefficients are
    shared with the batch path so signatures are identical)."""
    from ..pipeline.dedup import MINHASH_COEFFS

    shingles = (
        f"CASE WHEN length({text_col}) >= {n} THEN "
        f"transform(sequence(1, length({text_col}) - {n - 1}), "
        f"i -> pmod(xxhash64(substring({text_col}, i, {n})), {_M31}L)) "
        "ELSE array(0L) END"
    )
    mins = ", ".join(
        f"array_min(transform(__sh, h -> pmod({a}L * h + {b}L, {_M31}L)))"
        for a, b in MINHASH_COEFFS[:num_hashes]
    )
    return F.expr(f"array({mins})").alias("sig"), F.expr(shingles).alias("__sh")


def near_dup_stream(
    stream: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    state_timeout_minutes: int = 60,
) -> DataFrame:
    """(id_a, id_b, agreement) — near-duplicate pairs detected AT INGEST:
    each arriving document's MinHash signature is checked against the
    signatures previously seen in any of its LSH band buckets, then added
    to that bucket's state. ``agreement`` is the signature-agreement
    fraction (an unbiased Jaccard estimate); the batch operator's exact
    shingle-level verify is not possible here (state holds signatures,
    not text) — run minhash_lsh_pairs over the accumulated corpus for the
    exact confirmation pass.

    State is per band-bucket and expires after ``state_timeout_minutes``
    of processing-time inactivity, so memory is O(active buckets), not
    O(corpus). A pair colliding in several bands is emitted once per
    collision — apply ``dropDuplicates(['id_a','id_b'])`` downstream (a
    batch-side distinct; doing it in-stream would add unbounded state).

    Works identically on a batch DataFrame (one mega-batch per bucket),
    which is how the equivalence test pins stream == batch semantics."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    rows_per_band = num_hashes // bands
    sig, sh = _signature_expr(text_col, n, num_hashes)
    with_sig = stream.select(F.col(id_col).alias("id"), sh).select("id", sig)
    banded = with_sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        F.concat_ws(
                            "-",
                            F.transform(
                                F.slice(
                                    "sig", b * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bucket"),
    )

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int]
        sigs: list[list[int]]
        if state.exists:
            stored_ids, stored_sigs = state.get
            ids = list(stored_ids)
            sigs = [list(s) for s in stored_sigs]
        else:
            ids, sigs = [], []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("id", kind="mergesort")
        out_a, out_b, out_j = [], [], []
        for rid, rsig in zip(batch["id"], batch["sig"]):
            rid = int(rid)
            rsig = [int(x) for x in rsig]  # plain ints: state must pickle
            for pid, psig in zip(ids, sigs):
                if pid == rid:
                    continue
                agree = sum(a == b for a, b in zip(rsig, psig)) / num_hashes
                if agree >= threshold:
                    out_a.append(min(pid, rid))
                    out_b.append(max(pid, rid))
                    out_j.append(round(agree, 6))
            ids.append(int(rid))
            sigs.append(rsig)
        state.update((ids, sigs))
        try:
            state.setTimeoutDuration(state_timeout_minutes * 60 * 1000)
        except Exception:
            pass  # batch execution has no timeout clock
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "agreement": out_j}
            )

    return banded.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType="id_a long, id_b long, agreement double",
        stateStructType="ids array<long>, sigs array<array<long>>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
