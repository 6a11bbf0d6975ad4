"""Sequence packing and dataset mixing for LLM training-data assembly.

- token_offsets:  distributed prefix sum of per-document token counts — the
  global "where does this document start in the token stream" coordinate.
  A naive ``Window.orderBy(...)`` with no partitionBy collapses Spark to a
  SINGLE sort task; this implementation keeps the shuffle-parallel range
  sort and reduces only n_partitions partial sums through the driver
  (bounded model state, same discipline as the IVF centroids).
- chunk_spans:    concat-and-chunk packing — the GPT-style "concatenate all
  tokens, cut every ``budget`` tokens" assignment, emitted as (doc, chunk,
  doc-relative token slice) rows. Purely relational (window + sequence +
  explode), deterministic, SQL-oracle-able.
- pack_first_fit: greedy first-fit-decreasing bin packing WITHIN each
  physical partition (Arrow-batched applyInPandas). No document is split,
  packs are denser than fixed chunking, but pack ids depend on the
  partitioning — use where pack QUALITY matters, chunk_spans where
  determinism matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_offsets(
    df: DataFrame,
    n_col: str = "n_tokens",
    order_col: str = "doc_id",
    num_buckets: int | None = None,
) -> DataFrame:
    """Add ``start``: the number of tokens in all documents ordered before
    this one (by ``order_col``, which must be numeric and unique — document
    ids).

    Plan shape: DETERMINISTIC explicit range buckets from approxQuantile
    bounds (one driver-bounded stats pass — the same "collect the model,
    never the data" discipline as the IVF centroids), one tiny per-bucket
    aggregate whose running total becomes each bucket's base offset via a
    window over the num_buckets aggregate rows (single-task, but over
    n_buckets rows, not data — optimization round 15 folded the old
    collect + createDataFrame round trip into the lazy plan, so
    approxQuantile is the ONLY driver action), one broadcast join of the
    bucket base offsets, then an INTRA-bucket window. No global
    single-task sort anywhere — ``Window.orderBy`` without partitionBy
    collapses Spark to one DATA sort task and would not survive 100 TB;
    skew is bounded by the quantile accuracy. Explicit bounds (rather than
    repartitionByRange + spark_partition_id) make the bucket assignment a
    pure function of the row, so re-evaluations of this lazy plan can never
    disagree about which bucket a row is in."""
    dtype = dict(df.dtypes).get(order_col)
    if dtype not in ("tinyint", "smallint", "int", "bigint", "float", "double"):
        raise ValueError(
            f"token_offsets needs a numeric order column, got {order_col}: {dtype}"
        )
    spark = df.sparkSession
    if num_buckets is None:
        num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = df.stat.approxQuantile(order_col, probs, 0.001) if probs else []
    # build the when-chain bottom-up so the earliest bound wins
    bucket = F.lit(len(bounds))
    for i in range(len(bounds) - 1, -1, -1):
        bucket = F.when(F.col(order_col) <= F.lit(bounds[i]), i).otherwise(bucket)
    with_b = df.withColumn("__bkt", bucket)
    # each bucket's base offset = running sum of the PRECEDING buckets'
    # totals; the orderBy window runs over num_buckets aggregate rows
    # (one per bucket), never over the data
    w_tot = (
        Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = (
        with_b.groupBy("__bkt")
        .agg(F.sum(F.col(n_col).cast("long")).alias("__tot"))
        .select(
            "__bkt",
            F.coalesce(F.sum("__tot").over(w_tot), F.lit(0)).alias("__off"),
        )
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_b.join(F.broadcast(off_df), "__bkt")
        .withColumn(
            "start",
            F.col("__off")
            + F.coalesce(F.sum(F.col(n_col).cast("long")).over(w), F.lit(0)),
        )
        .drop("__bkt", "__off")
    )


def chunk_spans(
    df: DataFrame,
    budget: int,
    n_col: str = "n_tokens",
    id_col: str = "doc_id",
    order_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    ``order_col`` order as one token stream cut every ``budget`` tokens.
    Emits one row per (document, chunk) overlap:

    (id, chunk_id, doc_begin, doc_end) — the DOC-RELATIVE token slice
    [doc_begin, doc_end) that lands in ``chunk_id``. A document longer than
    the remaining chunk space is split across chunks (standard LLM
    pretraining packing); downstream, group by chunk_id and slice each
    document's token array with the spans.

    Deterministic given unique ids; the heavy lift is token_offsets' scale-
    safe prefix sum, the rest is sequence+explode arithmetic (codegen)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    order_col = order_col or id_col
    t = token_offsets(df, n_col=n_col, order_col=order_col)
    n = F.col(n_col).cast("long")
    first = F.floor(F.col("start") / budget)
    last = F.floor((F.col("start") + n - 1) / budget)
    return (
        t.where(n > 0)
        .withColumn("chunk_id", F.explode(F.sequence(first, last)))
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.greatest(
                F.lit(0).cast("long"), F.col("chunk_id") * budget - F.col("start")
            ).alias("doc_begin"),
            F.least(n, (F.col("chunk_id") + 1) * budget - F.col("start")).alias(
                "doc_end"
            ),
        )
    )


def pack_first_fit(
    df: DataFrame,
    budget: int,
    n_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """First-fit-decreasing bin packing WITHIN each physical partition: no
    document is split; each pack's token total is <= budget (documents
    longer than the budget get a singleton pack). Returns (id, pack_id,
    n_tokens).

    Pack ids are ``partition_id * 2**40 + local_pack`` — dense packing
    without any cross-partition coordination (embarrassingly parallel; the
    price is that pack assignment depends on the partitioning, so this is
    the quality-mode packer, chunk_spans the deterministic one)."""
    import pandas as pd

    if budget <= 0:
        raise ValueError("budget must be positive")
    src = df.select(id_col, n_col).withColumn("__pid", F.spark_partition_id())
    schema = f"{id_col} long, pack_id long, {n_col} long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["__pid"].iloc[0]) if len(pdf) else 0
        base = pid << 40
        pdf = pdf.sort_values(n_col, ascending=False, kind="mergesort")
        bins: list[int] = []  # remaining capacity per local pack
        assign = []
        for n in pdf[n_col].astype("int64"):
            placed = None
            for i, rem in enumerate(bins):
                if n <= rem:
                    placed = i
                    break
            if placed is None:
                bins.append(max(budget - int(n), 0))
                placed = len(bins) - 1
            else:
                bins[placed] -= int(n)
            assign.append(base + placed)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                "pack_id": assign,
                n_col: pdf[n_col].astype("int64").to_numpy(),
            }
        )

    return src.groupBy("__pid").applyInPandas(pack, schema)


def domain_mixture(
    df: DataFrame,
    weights: dict[str, float],
    n_total: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Compose a training mixture: draw ~``n_total`` documents so that
    domain d contributes fraction ``weights[d]`` of the output, up- OR
    down-sampling each domain as needed (up-sampling repeats documents —
    the multi-epoch treatment of small high-quality domains, à la the
    Pile / LLaMA mixtures). Domains absent from ``weights`` are dropped.

    Determinism: the per-(document, copy) keep decision is a pure function
    of md5(id:copy:seed) — reproducible across runs, partitionings and
    engines (md5 is SQL-standard enough that an external oracle can replay
    the exact draw; the seeded-xxhash64 path in stratified_sample is the
    Spark-only, faster variant).

    Output: one row per kept copy — (id, domain, epoch) plus the input's
    other columns; epoch numbers the repeats (0-based).

    Scale shape: one count-by-domain aggregate (bounded: n_domains rows
    through the driver), one broadcast join of the rates, then a pure
    per-row explode+filter — no shuffle of the corpus itself."""
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).count().collect()
        if r[0] in weights
    }
    spark = df.sparkSession
    rates = [
        (d, float(n_total * (w / total_w)) / counts[d])
        for d, w in weights.items()
        if counts.get(d)
    ]
    rate_df = spark.createDataFrame(rates, f"{domain_col} string, __rate double")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col(id_col).cast("string"),
                        F.col("epoch").cast("string"),
                        F.lit(str(seed)),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )
    return (
        df.join(F.broadcast(rate_df), domain_col)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.ceil("__rate").cast("long")))
        )
        # copy k survives with probability clamp(rate - k, 0, 1): full
        # epochs are certain, the fractional tail is the hashed draw
        .withColumn("__p", F.col("__rate") - F.col("epoch"))
        .where((F.col("__p") >= 1) | ((F.col("__p") > 0) & (u < F.col("__p"))))
        .drop("__rate", "__p")
    )


def materialize_chunks(
    docs: DataFrame,
    spans: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    order_col: str | None = None,
) -> DataFrame:
    """(chunk_id, chunk_text, n_tokens) — turn chunk_spans assignments into
    actual training rows: each document's whitespace tokens are sliced by
    its (doc_begin, doc_end) spans and the pieces concatenate in stream
    order within the chunk. Every chunk except the last carries exactly
    ``budget`` tokens.

    ``order_col`` must be the SAME column chunk_spans laid the token
    stream out by (it defaults to ``id_col``, matching chunk_spans'
    default) — fragments inside a chunk concatenate in that order.

    One join of spans to the docs (both sides keyed by the doc id), the
    slice/concat as codegen expressions, then a grouped ordered re-assembly
    per chunk — the shuffle carries chunk fragments, bounded by the chunk
    budget, never whole oversized documents."""
    order_col = order_col or id_col
    toks = F.expr(
        f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"
    ).alias("__toks")
    doc_cols = [F.col(id_col)]
    if order_col != id_col:
        doc_cols.append(F.col(order_col))
    pieces = (
        spans.join(docs.select(*doc_cols, toks), id_col)
        .select(
            "chunk_id",
            F.col(order_col).alias("__ord"),
            F.col("doc_begin"),
            (F.col("doc_end") - F.col("doc_begin")).alias("__len"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__toks"),
                    (F.col("doc_begin") + 1).cast("int"),
                    (F.col("doc_end") - F.col("doc_begin")).cast("int"),
                ),
            ).alias("__piece"),
        )
    )
    return (
        pieces.groupBy("chunk_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("__ord"), "doc_begin", "__piece")
                        )
                    ),
                    lambda s: s["__piece"],
                ),
            ).alias("chunk_text"),
            F.sum("__len").alias("n_tokens"),
        )
    )
