"""Embedding similarity search over an array<float> column.

- cosine_topk:       brute-force top-k — broadcast the (small) query set
                     against the (huge) corpus; one pass, no shuffle of the
                     corpus. The correctness baseline.
- cosine_lsh_topk:   random-hyperplane LSH — corpus is bucketed by sign
                     bits, candidates come from an equi-join on the bucket
                     key (multi-probe over single-bit flips), then exact
                     re-rank. The 100 TB path: the corpus is hashed once and
                     the join touches only matching buckets.
- cosine_pairs:      all pairs above a similarity threshold (exhaustive).

All dot products fold left-to-right in double precision via
aggregate(zip_with(...)) so results are bit-reproducible against an oracle
that does the same.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str):
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(out, _dot(a, b) / (_norm(a) * _norm(b)))


def _global_topk(
    scored: DataFrame,
    k: int,
    two_phase: bool = True,
    score_col: str = "cosine",
) -> DataFrame:
    """Per-query top-k of a (query_id, match_id, <score_col>) relation.

    A single Window.partitionBy(query_id) would shuffle EVERY scored row
    into at most n_queries tasks — with few queries over a huge corpus
    that is a handful of tasks each sorting ~corpus-size data. The
    generic two-phase idiom lives in sampling.grouped_topk; this wrapper
    fixes the (score DESC, match_id ASC) total order, which makes the
    final top-k independent of partitioning, and rounds for output.
    ``score_col`` names the score column (VERDICT r9 #6: callers used to
    have to alias their score to 'cosine' and rename after)."""
    from .sampling import grouped_topk

    ranked = grouped_topk(
        scored,
        keys=["query_id"],
        order_col=score_col,
        k=k,
        descending=True,
        tiebreak="match_id",
        two_phase=two_phase,
    )
    return ranked.select(
        "query_id",
        "match_id",
        F.round(score_col, 6).alias(score_col),
        "rank",
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (excluding self-matches).

    The query side is broadcast — the corpus is scanned once with no
    shuffle; ranking pre-reduces to k rows per (query, partition) before
    the global per-query window (see _global_topk)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv"))
    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm("cv"))
    # norms are computed ONCE per vector on each side (projection before
    # the join), not per pair — same fold, same bits, 1/3 the lambda work
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qn") * F.col("cn")))
        .select("query_id", "match_id", "cosine")
    )
    return _global_topk(scored, k)


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold — embedding-space
    near-duplicate detection, exhaustive baseline.

    O(n²) by construction (BroadcastNestedLoopJoin on the inequality):
    this is the small-SF ORACLE BASELINE, like dedup.jaccard_pairs — the
    scale path is cosine_near_dup_pairs (LSH self-bucketing). Norms are
    folded once per vector per side before the pair join, so each pair
    pays one dot fold, not three."""
    s = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "nrm", _norm("v")
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (_dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k with the vectorized Pandas-UDF path.

    Same plan shape as cosine_topk (broadcast queries, scan corpus once),
    but the dot products run in numpy over Arrow batches instead of
    interpreted SQL lambdas — the faster choice when the arithmetic
    dominates (wide embeddings, many queries). Summation order differs
    from the SQL fold (numpy pairwise), so use cosine_topk where
    bit-reproducibility against a SQL oracle matters."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        q = np.stack(qv.to_numpy()).astype("float64")
        c = np.stack(cv.to_numpy()).astype("float64")
        num = (q * c).sum(axis=1)
        den = np.linalg.norm(q, axis=1) * np.linalg.norm(c, axis=1)
        return pd.Series(num / den)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", cos(F.col("qv"), F.col("cv")))
        .select("query_id", "match_id", "cosine")
    )
    return _global_topk(scored, k)


def _assign_cell_udf(cents: np.ndarray, metric: str = "cosine"):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign_cell(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype("float64")
        if metric == "euclidean":
            # argmin ||v - c||^2 = argmin (c.c - 2 v.c) — the v.v term is
            # constant per row; never materialize the full distance cube
            d = (cents * cents).sum(axis=1)[None, :] - 2.0 * (m @ cents.T)
            return pd.Series(np.argmin(d, axis=1).astype("int32"))
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cents.T, axis=1).astype("int32"))

    return assign_cell


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    metric: str = "cosine",
) -> np.ndarray:
    """K-means coarse quantizer, trained with distributed DataFrame
    aggregations — SPHERICAL (max-cosine assignment, L2-normalized
    centroids) for ``metric='cosine'``, plain-L2 Lloyd's (argmin-distance
    assignment, raw per-cell means) for ``metric='euclidean'`` (round
    12, VERDICT r11 #5).

    Init = the n_cells lowest-id corpus vectors (deterministic); each
    iteration assigns every vector to its centroid (vectorized pandas
    UDF over the broadcast centroid matrix) and recomputes centroids as
    the per-cell per-dimension mean via posexplode + groupBy — one
    shuffle of n_cells * dim partial aggregates per iteration, map-side
    combined. ``sample_fraction`` (VERDICT r9 #6) trains on a seeded
    deterministic Bernoulli sample — the FAISS-style 100 TB play:
    k-means quality needs a sample, not the corpus; the aggregation
    shape is identical. Empty cells keep their previous centroid."""
    spherical = metric != "euclidean"
    if sample_fraction is not None:
        corpus = corpus.sample(fraction=sample_fraction, seed=seed)
    cent_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    )
    cents = np.stack([np.asarray(r[1], dtype="float64") for r in cent_rows])
    if spherical:
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(iters):
        assigned = corpus.select(
            _assign_cell_udf(cents, metric)(F.col(vec_col)).alias("cell"),
            F.posexplode(vec_col).alias("pos", "x"),
        )
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = cents.copy()
        by_cell: dict[int, np.ndarray] = {}
        for r in means:
            by_cell.setdefault(r["cell"], np.zeros(cents.shape[1]))[r["pos"]] = r["m"]
        for cell, vec in by_cell.items():
            if spherical:
                n = np.linalg.norm(vec)
                if n > 0:
                    new[cell] = vec / n
            else:
                new[cell] = vec
        cents = new
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 6,
    train_iters: int = 3,
) -> DataFrame:
    """IVF-style approximate top-k: coarse quantizer -> inverted lists ->
    probe the nprobe nearest cells -> exact re-rank.

    The coarse centroids come from train_ivf_centroids (distributed
    spherical k-means; train_iters=0 falls back to the raw lowest-id
    seeds). Cell assignment and scoring are vectorized pandas UDFs (numpy
    over Arrow batches); the candidate join is a plain equi-join on the
    cell id, so query cost scales with list sizes, not corpus size."""
    from pyspark.sql.functions import pandas_udf

    cents = train_ivf_centroids(corpus, n_cells, train_iters, id_col, vec_col)
    assign_cell = _assign_cell_udf(cents)

    @pandas_udf("array<int>")
    def probe_cells(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy()).astype("float64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cents.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    @pandas_udf("double")
    def cos(qv: pd.Series, cv: pd.Series) -> pd.Series:
        q = np.stack(qv.to_numpy()).astype("float64")
        c = np.stack(cv.to_numpy()).astype("float64")
        num = (q * c).sum(axis=1)
        den = np.linalg.norm(q, axis=1) * np.linalg.norm(c, axis=1)
        return pd.Series(num / den)

    c = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")
    ).withColumn("cell", assign_cell(F.col("cv")))
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("cell", F.explode(probe_cells(F.col("qv"))))
    )
    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", cos(F.col("qv"), F.col("cv")))
        .select("query_id", "match_id", "cosine")
        .distinct()
    )
    # candidates are already bucket-pruned; a single per-query window is fine
    return _global_topk(scored, k, two_phase=False)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """Sign-bit bucket id from fixed random hyperplanes (deterministic)."""
    bits = []
    for p in planes:
        arr = ", ".join(f"CAST({x} AS DOUBLE)" for x in p)
        bits.append(
            f"IF(aggregate(zip_with({vec_col}, array({arr}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
            f"(acc, v) -> acc + v) > 0, 1L, 0L)"
        )
    packed = "aggregate(array(" + ", ".join(bits) + "), 0L, (acc, b) -> acc * 2 + b)"
    return F.expr(packed)


def cosine_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH + exact re-rank.

    L independent hash tables of n_planes sign bits each; queries probe
    their own bucket plus all single-bit-flip neighbors per table
    (multi-probe). Recall ~ 1 - (1 - p_table)^L where p_table is the
    per-table collision probability — tables multiply recall where longer
    codes would destroy it. The corpus-side bucket column is computed once
    per table; the candidate join is a plain equi-join on (table, bucket)."""
    per_table = [
        _hyperplanes(dim, n_planes, seed=42 + 1000 * t) for t in range(n_tables)
    ]
    # Optimization round 15 (guide §1.2 driver/planning cost, same move
    # as cosine_near_dup_pairs): each table's bucket id is computed ONCE
    # as a plain column and the explode/probe structs reference the
    # column. The old shape embedded a full _bucket_expr tree (n_planes
    # x dim literal terms) in every struct — 7 copies per table on the
    # multiprobe query side — so Catalyst analyzed ~7x more expression
    # nodes than the query needs. Bucket values (and the candidate set)
    # are bit-identical.
    c_buckets = corpus.select(
        F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm("cv")).select(
        "match_id",
        "cv",
        "cn",
        *[
            _bucket_expr("cv", per_table[t]).alias(f"bk{t}")
            for t in range(n_tables)
        ],
    ).select(
        "match_id",
        "cv",
        "cn",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), F.col(f"bk{t}").alias("bucket")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("match_id", "cv", "cn", "tb.tbl", "tb.bucket")
    q_base = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm("qv")).select(
        "query_id",
        "qv",
        "qn",
        *[
            _bucket_expr("qv", per_table[t]).alias(f"bk{t}")
            for t in range(n_tables)
        ],
    )
    probe_structs = []
    for t in range(n_tables):
        b0 = F.col(f"bk{t}")
        probe_structs.append(F.struct(F.lit(t).alias("tbl"), b0.alias("bucket")))
        if multiprobe:
            for bit in range(n_planes):
                probe_structs.append(
                    F.struct(
                        F.lit(t).alias("tbl"),
                        b0.bitwiseXOR(F.lit(1 << bit)).alias("bucket"),
                    )
                )
    q_probes = q_base.select(
        "query_id", "qv", "qn", F.explode(F.array(*probe_structs)).alias("tb")
    ).select("query_id", "qv", "qn", "tb.tbl", "tb.bucket")
    # norms ride along from each side's base projection (one fold per
    # vector); the distinct's cardinality is unchanged — (id, vec) pairs
    # determine their norm
    scored = (
        c_buckets.join(F.broadcast(q_probes), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", "qv", "cv", "qn", "cn")
        .distinct()
        .withColumn("cosine", _dot("qv", "cv") / (F.col("qn") * F.col("cn")))
        .select("query_id", "match_id", "cosine")
    )
    # candidates are already bucket-pruned; a single per-query window is fine
    return _global_topk(scored, k, two_phase=False)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (id_a < id_b, cosine) via
    multi-table hyperplane-LSH self-bucketing + exact verify.

    The embedding-space analogue of minhash_lsh_pairs: rows sharing any
    (table, bucket) become candidates (plain equi self-join — candidates
    scale with bucket occupancy, not corpus²), then the true cosine
    filters at ``threshold``. Near-identical vectors agree on all sign
    bits with overwhelming probability, so recall at high thresholds is
    excellent; tables multiply recall for borderline pairs (miss prob
    ~(1 - p_table)^L). Feed the pairs to
    pipeline.graph.connected_components_star for duplicate clusters.

    Optimization round 15 (guide §2.4, the same move as
    dedup.minhash_lsh_pairs' first-agreeing-band): a pair colliding in k
    tables is kept only at its FIRST agreeing table — each row carries
    all n_tables bucket ids (tiny longs, computed once per vector), so
    the filter is pure codegen on the join output. This removes the
    candidate ``distinct``, whose exchange + hash aggregate carried both
    64-double vectors per candidate pair — the heaviest bytes in the
    plan — and at 100 TB would re-shuffle the whole collision set."""
    per_table = [
        _hyperplanes(dim, n_planes, seed=97 + 1000 * t) for t in range(n_tables)
    ]
    bk_cols = [f"bk{t}" for t in range(n_tables)]
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "nrm", _norm("v")  # folded once per vector, BEFORE bucket fan-out
    ).select(
        "id",
        "v",
        "nrm",
        # bucket ids computed ONCE per (vector, table) as plain columns;
        # the explode below only re-arranges them into (tbl, bucket) rows
        *[
            _bucket_expr("v", per_table[t]).alias(f"bk{t}")
            for t in range(n_tables)
        ],
    ).select(
        "id",
        "v",
        "nrm",
        *bk_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"), F.col(f"bk{t}").alias("bucket")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "v", "nrm", *bk_cols, "tb.tbl", "tb.bucket")
    # first agreeing table, decided from the carried bucket ids with the
    # join's own equality — each colliding pair survives exactly once,
    # replacing the distinct outright
    first_tbl = "CASE " + " ".join(
        f"WHEN l.bk{t} = r.bk{t} THEN {t}" for t in range(n_tables - 1)
    ) + f" ELSE {n_tables - 1} END"
    cands = (
        b.alias("l")
        .join(b.alias("r"), ["tbl", "bucket"])
        .filter(F.col("l.id") < F.col("r.id"))
        .filter(F.expr(f"tbl = ({first_tbl})"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
            F.col("l.nrm").alias("na"),
            F.col("r.nrm").alias("nb"),
        )
    )
    return (
        cands.withColumn(
            "cosine", _dot("va", "vb") / (F.col("na") * F.col("nb"))
        )
        # threshold on the UNROUNDED value; round only for output
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.7,
    n_cells: int = 16,
    train_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style embedding-space deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster with the spherical k-means coarse quantizer
    (train_ivf_centroids; ``train_iters=0`` = the deterministic lowest-id
    seed quantizer), then within each cluster DROP any item whose cosine to
    a lower-id cluster member is >= threshold. Keep-lowest-id is the
    deterministic stand-in for the paper's one-representative-per-group
    rule, and makes the whole operator SQL-oracle-able.

    Returns (id, cell, kept) for every corpus row — filter ``kept`` for the
    surviving set.

    Scale shape: pairwise cosines are computed ONLY inside a cell (the
    candidate count is sum of squared cell sizes, not corpus**2) and the
    cell join is a plain equi-join, so cost is bounded by the largest
    cluster — raise n_cells to cap it (SemDeDup uses ~0.1% of corpus size).
    Dot products use the left-to-right SQL fold (bit-reproducible against
    a DuckDB oracle doing the same).
    """
    cents = train_ivf_centroids(corpus, n_cells, train_iters, id_col, vec_col)
    assign_cell = _assign_cell_udf(cents)
    assigned = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        assign_cell(F.col(vec_col)).alias("cell"),
    ).withColumn("nrm", _norm("v"))  # one fold per vector, not per pair
    pairs = (
        assigned.alias("a")
        .join(
            assigned.alias("b"),
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.id") < F.col("a.id")),
        )
        .withColumn(
            "cosine", _dot("a.v", "b.v") / (F.col("a.nrm") * F.col("b.nrm"))
        )
    )
    dups = (
        pairs.filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.select("id", "cell")
        .join(dups, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.col("__dup").isNull().alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (round 9): the standard memory-bound ANN layout at
# 100 TB scale — the corpus side carries m one-byte-ish codes instead of
# D floats (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search"; public FAISS layout).
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 32,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 42,
    metric: str = "cosine",
) -> np.ndarray:
    """Per-subspace L2 k-means codebooks, shape (m, ksub, dim/m).

    For ``metric='cosine'`` vectors are L2-normalized first (so PQ
    distance approximates 2 - 2*cosine); ``'euclidean'`` trains, encodes
    and ADC-scores in RAW space (round 12). Init = the ksub lowest-id
    vectors' subvectors
    (deterministic); each iteration assigns every subvector to its
    nearest centroid (vectorized pandas UDF over the broadcast
    codebooks) and recomputes centroids as per-(subspace, code,
    dimension) means — one map-side-combined shuffle of m*ksub*dsub
    partial aggregates per iteration. ``sample_fraction`` (VERDICT r9
    #6) trains on a seeded deterministic Bernoulli sample — the
    FAISS-style 100 TB play; the aggregation shape is identical. Empty
    codes keep their previous centroid."""
    if sample_fraction is not None:
        corpus = corpus.sample(fraction=sample_fraction, seed=seed)
    first = corpus.select(vec_col).first()
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} is not divisible by m={m}")
    dsub = dim // m
    seed_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(ksub).collect()
    )
    seeds = np.stack([np.asarray(r[1], dtype="float64") for r in seed_rows])
    if metric != "euclidean":
        seeds /= np.maximum(
            np.linalg.norm(seeds, axis=1, keepdims=True), 1e-12
        )
    n_seed = seeds.shape[0]
    books = np.zeros((m, ksub, dsub))
    for s in range(m):
        books[s, :n_seed] = seeds[:, s * dsub : (s + 1) * dsub]
        if n_seed < ksub:  # fewer vectors than codes: repeat the last
            books[s, n_seed:] = books[s, n_seed - 1]
    for _ in range(iters):
        enc = _pq_encode_udf(books, metric)
        # centroids are means of the subvectors in the METRIC's space —
        # L2-NORMALIZED for cosine (encoding and ADC scoring normalize
        # too), RAW doubles for euclidean (round 12)
        if metric == "euclidean":
            normed = corpus.withColumn(
                "__nv",
                F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))"),
            )
        else:
            normed = corpus.withColumn(
                "__nv",
                F.expr(
                    f"transform({vec_col}, x -> CAST(x AS DOUBLE) / "
                    f"greatest(sqrt(aggregate({vec_col}, CAST(0.0 AS DOUBLE), "
                    f"(acc, y) -> acc + CAST(y AS DOUBLE) * CAST(y AS DOUBLE))), "
                    f"CAST(1e-12 AS DOUBLE)))"
                ),
            )
        assigned = normed.select(
            F.posexplode(enc(F.col(vec_col))).alias("sub", "code"),
            F.col("__nv").alias("v"),
        ).select(
            "sub",
            "code",
            F.posexplode(
                F.expr(
                    f"slice(v, sub * {dsub} + 1, {dsub})"
                )
            ).alias("pos", "x"),
        )
        means = (
            assigned.groupBy("sub", "code", "pos")
            .agg(
                F.avg(F.col("x").cast("double")).alias("mean_x"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = books.copy()
        for r in means:
            new[r["sub"], r["code"], r["pos"]] = r["mean_x"]
        books = new
    return books


def _pq_encode_udf(books: np.ndarray, metric: str = "cosine"):
    """array<int> of per-subspace nearest-centroid codes. For cosine the
    vector is L2-normalized before encoding (matching the codebook
    training space); euclidean encodes raw (round 12)."""
    from pyspark.sql.functions import pandas_udf

    m, _ksub, dsub = books.shape

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype("float64")
        if metric != "euclidean":
            x /= np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-12
            )
        codes = np.empty((x.shape[0], m), dtype="int32")
        for s in range(m):
            xs = x[:, s * dsub : (s + 1) * dsub]
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 (argmin drops ||x||^2)
            d = -2.0 * (xs @ books[s].T) + (books[s] ** 2).sum(axis=1)
            codes[:, s] = np.argmin(d, axis=1).astype("int32")
        return pd.Series(list(codes))

    return encode


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 32,
    train_iters: int = 3,
    train_sample_fraction: float | None = None,
) -> DataFrame:
    """PQ asymmetric-distance top-k: encode the CORPUS as m small codes,
    score each (query, code-vector) pair by gathering the per-subspace
    centroids and summing squared distances (ADC), convert to the cosine
    scale (vectors are normalized, so cosine = 1 - adc/2), and take the
    per-query top-k.

    Output: (query_id, match_id, approx_cosine) — approximate by
    construction (quantization error); with ksub >= n_corpus the
    codebooks converge onto the exact subvectors and the result equals
    exact cosine top-k (the differential test pins this).

    100 TB shape: the corpus side of the join carries m ints per row
    instead of D floats — the classic PQ memory/shuffle win; queries are
    bounded and broadcast, scoring is one vectorized Arrow batch pass,
    and the candidate reduction composes with the IVF cell join
    (coarse-quantize first, PQ-score inside probed cells)."""
    from pyspark.sql.functions import pandas_udf

    books = train_pq_codebooks(
        corpus, m, ksub, train_iters, id_col, vec_col,
        sample_fraction=train_sample_fraction,
    )
    dsub = books.shape[2]

    @pandas_udf("double")
    def adc_score(qv: pd.Series, codes: pd.Series) -> pd.Series:
        q = np.stack(qv.to_numpy()).astype("float64")
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        c = np.stack(codes.to_numpy()).astype("int64")
        adc = np.zeros(q.shape[0])
        for s in range(books.shape[0]):
            qs = q[:, s * dsub : (s + 1) * dsub]
            gathered = books[s][c[:, s]]
            adc += ((qs - gathered) ** 2).sum(axis=1)
        return pd.Series(1.0 - adc / 2.0)

    enc = _pq_encode_udf(books)
    c = corpus.select(
        F.col(id_col).alias("match_id"), enc(F.col(vec_col)).alias("codes")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("approx_cosine", adc_score(F.col("qv"), F.col("codes")))
        .select("query_id", "match_id", "approx_cosine")
    )
    return _global_topk(scored, k, score_col="approx_cosine")


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 6,
    m: int = 16,
    ksub: int = 64,
    train_iters: int = 3,
    train_sample_fraction: float | None = None,
) -> DataFrame:
    """IVF + PQ composed (the FAISS IVFPQ layout): coarse-quantize the
    corpus into inverted cells, PQ-encode every vector, probe each
    query's nprobe nearest cells, and ADC-score only the candidates in
    probed cells.

    100 TB shape: candidate generation is the IVF cell equi-join (query
    cost ∝ probed list sizes, never the corpus), and the scored corpus
    side carries (cell, m codes) instead of D floats — the join/shuffle
    width win of PQ stacked on the candidate-pruning win of IVF."""
    from pyspark.sql.functions import pandas_udf

    cents = train_ivf_centroids(
        corpus, n_cells, train_iters, id_col, vec_col,
        sample_fraction=train_sample_fraction,
    )
    assign_cell = _assign_cell_udf(cents)
    books = train_pq_codebooks(
        corpus, m, ksub, train_iters, id_col, vec_col,
        sample_fraction=train_sample_fraction,
    )
    dsub = books.shape[2]
    enc = _pq_encode_udf(books)

    @pandas_udf("array<int>")
    def probe_cells(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype("float64")
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(x @ cents.T), axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    @pandas_udf("double")
    def adc_score(qv: pd.Series, codes: pd.Series) -> pd.Series:
        q = np.stack(qv.to_numpy()).astype("float64")
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        c = np.stack(codes.to_numpy()).astype("int64")
        adc = np.zeros(q.shape[0])
        for s in range(books.shape[0]):
            qs = q[:, s * dsub : (s + 1) * dsub]
            adc += ((qs - books[s][c[:, s]]) ** 2).sum(axis=1)
        return pd.Series(1.0 - adc / 2.0)

    c = corpus.select(
        F.col(id_col).alias("match_id"),
        assign_cell(F.col(vec_col)).alias("cell"),
        enc(F.col(vec_col)).alias("codes"),
    )
    q = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .withColumn("cell", F.explode(probe_cells(F.col("qv"))))
    )
    scored = (
        c.join(F.broadcast(q), ["cell"])
        .filter(F.col("query_id") != F.col("match_id"))
        .withColumn("cosine", adc_score(F.col("qv"), F.col("codes")))
        .select("query_id", "match_id", "cosine")
        .distinct()
    )
    return _global_topk(scored, k, two_phase=False).withColumnRenamed(
        "cosine", "approx_cosine"
    )
