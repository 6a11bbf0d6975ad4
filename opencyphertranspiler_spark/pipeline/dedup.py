"""Document deduplication operators for large-scale training-data pipelines.

Every operator is a pure DataFrame -> DataFrame transform built from
pyspark.sql built-ins (JVM-side, whole-stage codegen; no Python UDFs), so
Catalyst/AQE carry the scaling story:

- exact_duplicates:    one shuffle (hash groupBy on a fingerprint) — the
                       100 TB path is a straight map-side-combine aggregation.
- ngram_jaccard_pairs: exhaustive O(n^2) verification — the *oracle baseline*
                       for small n; at scale use minhash_lsh_pairs.
- minhash_lsh_pairs:   shingle -> minhash signature -> banded bucket join.
                       No cross join: candidates come from an equi-join on
                       (band, band_hash), which Spark executes as a shuffle
                       hash join keyed by bucket — linear in candidates.
- simhash_pairs:       64-bit simhash, 4x16-bit band blocking (pigeonhole:
                       hamming<=3 pairs always share a band), hamming verify.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic minhash parameters (fixed seed so results are reproducible).
# 31-bit prime field: a * h + b <= 2^62, so the arithmetic never overflows
# int64 — safe under ANSI mode (Spark 4 default), no wrap-around reliance.
_MERSENNE = (1 << 31) - 1
_rng = random.Random(42)
# 192 coefficient pairs: the same seed draws the SAME first 64 pairs as
# every earlier round (signatures and band hashes are bit-identical);
# the pool is larger than any default so callers can ask for longer
# signatures without changing the existing ones.
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, _MERSENNE), _rng.randrange(0, _MERSENNE))
    for _ in range(192)
]


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a (possibly single-file) input across the cluster's
    default parallelism so per-row interpreted work parallelizes.

    The heuristic reads the scan's file list (metadata only) instead of
    probing df.rdd.getNumPartitions(): constructing the RDD lineage forces
    plan conversion and defeats AQE coalescing on that edge. Inputs backed
    by many files (the 100 TB case) — or by no file scan at all — pass
    through untouched."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        few_files = 0 < len(df.inputFiles()) < target
    except Exception:
        few_files = False
    if few_files:
        return df.repartition(target)
    return df


def normalized_text(col: str = "text"):
    """Whitespace-collapsed, lower-cased text (the dedup canonical form)."""
    return F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by hash-groupBy on normalized text.

    Returns one row per distinct text: (doc_id = smallest member id,
    n_copies). Single shuffle; partial aggregation happens map-side."""
    return (
        df.select(F.col(id_col), normalized_text(text_col).alias("__norm"))
        .groupBy("__norm")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select(id_col, "n_copies")
    )


def shingles(col: str, n: int = 3, distinct: bool = True):
    """Character n-gram shingle array (empty when the text is too short).

    Array form — used by the exhaustive Jaccard baseline. The scale paths
    (minhash signature + verify) use shingle_hashes instead: higher-order
    array lambdas like this transform are CodegenFallback (interpreted,
    ~100x slower), fine for a verification oracle but not for hot paths."""
    body = (
        f"transform(sequence(1, length({col}) - {n - 1}), i -> substring({col}, i, {n}))"
    )
    expr = f"CASE WHEN length({col}) >= {n} THEN {body} ELSE array() END"
    if distinct:
        expr = f"array_distinct({expr})"
    return F.expr(expr)


def shingle_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, h) rows: 31-bit-hashed character n-gram at every position.

    Fully whole-stage-codegen: explode a positions sequence, then
    substring + xxhash64 as plain column expressions — no interpreted
    array lambdas. Duplicate shingles are KEPT (harmless for minhash MIN;
    dedup with collect_set where set semantics matter)."""
    positions = (
        f"CASE WHEN length({text_col}) >= {n} "
        f"THEN sequence(1, length({text_col}) - {n - 1}) ELSE array() END"
    )
    return _spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(positions)).alias("i"),
        F.col(text_col).alias("__t"),
    ).select(
        "id",
        F.expr(f"pmod(xxhash64(substring(__t, i, {n})), {_MERSENNE}L)").alias("h"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exhaustive n-gram Jaccard near-duplicate pairs (id_a < id_b).

    O(n^2) — correct by construction; use as the verification oracle and for
    small corpora. The scale path is minhash_lsh_pairs (same verify step,
    LSH candidate generation)."""
    s = _spread(df).select(
        F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    a, b = s.alias("a"), s.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    j = inter.cast("double") / union.cast("double")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(j, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(id, mh0..mh{k-1}) MinHash signature columns.

    Plan shape matters here: Spark's higher-order array lambdas
    (transform/aggregate) are CodegenFallback — interpreted, ~100x slower
    than codegen — so the signature is computed as
    explode(shingles) -> k codegen'd hash columns -> groupBy(id).min(...)
    with map-side partial aggregation. Everything stays in whole-stage
    codegen; the only shuffle carries k longs per document.

    h_i(x) = (a_i * x + b_i) mod M31 over the 31-bit prehash
    x = xxhash64(shingle) mod M31 — products stay within int64 (ANSI-safe)."""
    ex = shingle_hashes(df, id_col, text_col, n)
    hash_cols = [
        F.expr(f"pmod({a}L * h + {b}L, {_MERSENNE}L)").alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_hashes])
    ]
    return (
        ex.select("id", *hash_cols)
        .groupBy("id")
        .agg(*[F.min(f"mh{i}").alias(f"mh{i}") for i in range(num_hashes)])
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    staging_dir: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified with true
    n-gram Jaccard (so precision is exact; recall ~ 1-(1-t^r)^b — the
    default 8 bands x 4 rows misses a pair sitting exactly AT J = 0.8
    w.p. ~1.5% and is effectively exhaustive above it; shorter rows both
    RAISE recall at the threshold and halve signature codegen + shuffle
    width vs 8x8, at the price of more — cheaply prefiltered — band
    collisions).

    Plan shape (scale-critical): signature via explode + partial-agg
    (codegen, see minhash_signature_df) -> explode to (band, band_hash,
    packed signature) rows -> self-join on the band bucket with the
    CHEAP codegen'd signature-agreement prefilter (estimated J =
    fraction of agreeing minhashes) evaluated inline on the carried
    signature columns, keeping each pair only at its FIRST agreeing band
    (so no distinct shuffle and no signature re-attach joins) -> exact
    n-gram Jaccard verify on the survivors only, gated by the
    provably-safe set-size-ratio bound and computing |A∪B| from sizes.
    The carried signature is PACKED two 31-bit minhashes per long
    (optimization round 15, guide §2.3 "shuffle fewer bytes"): UnsafeRow
    spends an 8-byte slot per field regardless of type, so halving the
    column count halves the band self-join's shuffled row width; the
    agreement comparison unpacks with shiftright/mask inline — the same
    per-hash equality decisions, bit for bit. No cross join; the
    array-intersection work runs only on pairs whose estimated J clears
    the prefilter even when a template-heavy corpus floods the band
    buckets.

    Reused-subtree discipline: the packed signature table feeds both
    sides of the band self-join, the prefiltered pair table is read
    twice (survivor-id derivation + the verify join) and the
    hashed-shingle table twice. With ``staging_dir`` set they are
    written to parquet and read back (the 100 TB pattern — no executor
    cache at all); otherwise they are persisted for the duration of the
    call, the (tiny) verified result is materialized eagerly, and the
    input caches are released before returning — no corpus-sized blocks
    outlive the operator."""

    def _stage(frame: DataFrame, name: str) -> DataFrame:
        path = f"{staging_dir}/{name}"
        frame.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    rows = num_hashes // bands
    sig = minhash_signature_df(df, id_col, text_col, n, num_hashes)
    # band hash = hash(r consecutive signature columns); explode to
    # (id, band, bh, pk0..) rows — all codegen'd projections + one
    # generator. Optimization round 14 (guide §2.4/§3): the band
    # entries CARRY the signature columns, so the agreement prefilter
    # evaluates inline on the band self-join's output inside the same
    # codegen stage — the old shape re-attached the signature table
    # with two extra hash joins over every raw band collision (~5M rows
    # at sf0.1), tripling the per-candidate join work. The wide row
    # never materializes: est + the id projection fuse into the join
    # stage, and only (id_a, id_b) leaves it.
    #
    # Optimization round 15 (guide §2.3): the carried signature is
    # PACKED two 31-bit minhashes per long — pk{j} = (mh{2j} << 31) |
    # mh{2j+1}; both halves are < 2^31 so the pack is exact and
    # non-negative. The band self-join's input row drops from
    # (num_hashes + bands + 3) to (num_hashes/2 + bands + 3) UnsafeRow
    # slots (8 bytes each), roughly halving the bytes both band-join
    # exchanges shuffle. Band hashes are computed from the UNPACKED mh
    # columns first, so their values (and the candidate set they
    # define) are bit-identical to every earlier round.
    npk = (num_hashes + 1) // 2
    pack_exprs = [
        F.expr(
            f"shiftleft(mh{2 * j}, 31) + mh{2 * j + 1}"
            if 2 * j + 1 < num_hashes
            else f"shiftleft(mh{2 * j}, 31)"
        ).alias(f"pk{j}")
        for j in range(npk)
    ]
    bh_exprs = [
        F.hash(*[F.col(f"mh{b * rows + j}") for j in range(rows)]).alias(f"bh{b}")
        for b in range(bands)
    ]
    pk_cols = [f"pk{j}" for j in range(npk)]
    bh_cols = [f"bh{b}" for b in range(bands)]
    # the persisted/staged reused subtree is the packed+hashed form: the
    # cache itself is ~40% narrower than the raw signature table, and
    # both band-join sides read it without recomputing the pack
    sig_bh = sig.select("id", *pack_exprs, *bh_exprs)
    sig_bh = _stage(sig_bh, "signatures") if staging_dir else sig_bh.persist()
    band_structs = [
        F.struct(F.lit(b).alias("band"), F.col(f"bh{b}").alias("bh"))
        for b in range(bands)
    ]
    band_entries = sig_bh.select(
        "id", F.explode(F.array(*band_structs)).alias("bb"), *pk_cols, *bh_cols
    ).select("id", "bb.band", "bb.bh", *pk_cols, *bh_cols)
    l, r = band_entries.alias("l"), band_entries.alias("r")
    # prefilter: estimated J = fraction of agreeing signature components.
    # Cutoff = threshold - 2.5 sigma of the binomial estimator: pairs truly
    # at the threshold pass w.p. >= 0.99; the banding stage (J^rows per
    # band) is the binding recall constraint, not this filter.
    sigma = (threshold * (1 - threshold) / num_hashes) ** 0.5
    cutoff = max(0.0, threshold - 2.5 * sigma)
    # integer form of the same est >= cutoff decision (k/num_hashes is
    # exact, so k >= ceil(num_hashes * cutoff) is the identical set);
    # single parsed string (building ~100 Column objects costs ~1s of
    # py4j round trips per query — measured in round 14). Each per-hash
    # equality unpacks its half of the packed long inline: hash 2j is
    # shiftright(pk{j}, 31), hash 2j+1 is pk{j} & (2^31 - 1) — the
    # identical comparisons the unpacked columns made.
    min_agree1 = math.ceil(cutoff * num_hashes - 1e-9)

    def _mh_slot(side: str, i: int) -> str:
        j, odd = divmod(i, 2)
        if odd:
            return f"({side}.pk{j} & {_MERSENNE}L)"
        return f"shiftright({side}.pk{j}, 31)"

    est_sum = " + ".join(
        f"IF({_mh_slot('l', i)} = {_mh_slot('r', i)}, 1, 0)"
        for i in range(num_hashes)
    )
    # Optimization round 14 (guide §2.4, remove shuffles outright): a
    # pair colliding in k bands used to be emitted k times and deduped
    # with a 2M-row distinct shuffle + hash aggregate. Instead keep a
    # collision row ONLY at the pair's FIRST agreeing band — the per-band
    # hashes recompute inline from the carried signature columns with the
    # same F.hash the band entries were built with, so "first agreeing
    # band" uses exactly the join's own equality and each colliding pair
    # survives exactly once. The distinct (and its exchange) disappears;
    # the candidate path is now a single map-side stage into the persist.
    first_agree = "CASE " + " ".join(
        f"WHEN l.bh{b} = r.bh{b} THEN {b}" for b in range(bands - 1)
    ) + f" ELSE {bands - 1} END"
    # the trailing repartition replaces the distinct's exchange as the
    # LOAD BALANCER: hot band buckets concentrate surviving pairs in a
    # few map tasks, and without redistribution the verify stage (which
    # reads this frame's persisted layout) inherits that skew (guide
    # §2.5) — a 20 MB hash shuffle of bare id pairs, no dedup aggregate.
    # The conf can be non-numeric on some platforms ("auto"): fall back
    # to the cluster's default parallelism.
    try:
        npart = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        npart = df.sparkSession.sparkContext.defaultParallelism
    prefiltered = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .filter(F.expr(f"l.band = ({first_agree})"))
        .filter(F.expr(f"({est_sum}) >= {min_agree1}"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .repartition(npart, "id_a", "id_b")
    )
    # referenced twice below (survivor-id derivation + the verify join)
    prefiltered = (
        _stage(prefiltered, "prefiltered") if staging_dir
        else prefiltered.persist()
    )
    # exact verify over HASHED shingle sets: same Jaccard (xxhash64
    # collisions are negligible), but long-set intersection is much
    # cheaper than string-array intersection. collect_set both dedups
    # (Jaccard is over distinct shingles) and keeps the whole path in
    # codegen — no interpreted array transform. Only SURVIVOR documents
    # are shingled: at 100 TB the verify set is a tiny fraction of the
    # corpus, so materializing shingle sets for every document would
    # dominate the whole job
    survivor_ids = prefiltered.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    survivors = df.join(survivor_ids, id_col, "left_semi")
    # Shingle hashes are < 2^31, so sets are stored as ints — same sets,
    # ~35% cheaper per-pair intersection. (Round 14's tier-2 128-hash
    # verify prefilter was REMOVED in optimization round 15: unlike the
    # size-ratio gate below it had no proof that a true pair could never
    # be dropped — only a Φ(-4) ≈ 3e-5 bound — and it both regressed the
    # measured wall clock at this scale factor and widened the plan. The
    # exact verify now runs on every band-collision survivor, keeping
    # the declared candidates → exact-verify semantics exactly.)
    sh = (
        shingle_hashes(survivors, id_col, text_col, n)
        .groupBy("id")
        .agg(F.collect_set(F.col("h").cast("int")).alias("shh"))
        .withColumn("sz", F.size("shh"))
    )
    sh = _stage(sh, "shingle_hashes") if staging_dir else sh.persist()
    # Optimization round 14 (guide §1.2 "don't compute things you throw
    # away"): |A ∪ B| = |A| + |B| - |A ∩ B| for sets, so the union array
    # is never materialized (array_union was half the per-pair verify
    # cost), and a PROVABLY-SAFE size-ratio gate runs first: J(A,B) =
    # |A∩B|/|A∪B| <= min/max, so min < (t - 1e-6)·max implies
    # round(J, 6) < t — no true pair can be dropped (the 1e-6 margin
    # covers round-6's half-ulp). Both reject the identical final pair
    # set; they only skip intersections that could not pass.
    sza, szb = F.col("sha.sz").cast("double"), F.col("shb.sz").cast("double")
    isz = F.size(
        F.array_intersect(F.col("sha.shh"), F.col("shb.shh"))
    ).cast("double")
    verified = (
        prefiltered.join(sh.alias("sha"), F.col("id_a") == F.col("sha.id"))
        .join(sh.alias("shb"), F.col("id_b") == F.col("shb.id"))
        .filter(
            F.least(sza, szb)
            >= F.lit(threshold - 1e-6) * F.greatest(sza, szb)
        )
        .select(
            "id_a",
            "id_b",
            F.round(isz / (sza + szb - isz), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if staging_dir is None:
        # materialize the (tiny) result once, then release the
        # corpus-sized input caches before handing the frame back
        verified = verified.localCheckpoint(eager=True)
        sig_bh.unpersist()
        sh.unpersist()
        prefiltered.unpersist()
    return verified


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = "xxhash64({t})",
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash with banded blocking.

    Pigeonhole: any pair within hamming distance 3 agrees exactly on at
    least one of the 4 16-bit bands, so the blocking join has full recall
    for max_hamming <= 3. Verification computes the true bit distance.

    ``token_hash`` is a SQL template for the per-token 64-bit hash
    (``{t}`` = token). The default xxhash64 is the production path; the
    driver gate passes an md5-derived hash so a DuckDB oracle can recompute
    the identical simhash from the same text."""
    token_h = token_hash.format(t="t")
    votes = (
        "aggregate(filter(split(lower({c}), '\\\\s+'), t -> t <> ''), "
        "array_repeat(0L, 64), (acc, t) -> zip_with(acc, "
        "transform(sequence(0, 63), b -> "
        "IF((({h} >> b) & 1) = 1, 1L, -1L)), (x, y) -> x + y))"
    ).format(c=text_col, h=token_h)
    bits = f"transform({votes}, v -> IF(v > 0, 1L, 0L))"
    s = (
        _spread(df).select(F.col(id_col).alias("id"), F.expr(bits).alias("bits"))
        .withColumn(
            "bands",
            F.expr(
                "transform(sequence(0, 3), g -> struct(g AS band, "
                "aggregate(slice(bits, g * 16 + 1, 16), 0L, "
                "(acc, v) -> acc * 2 + v) AS bh))"
            ),
        )
    )
    be = s.select("id", F.explode("bands").alias("bb")).select(
        "id", "bb.band", "bb.bh"
    )
    l, r = be.alias("l"), be.alias("r")
    candidates = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sb = s.select("id", "bits")
    return (
        candidates.join(sb.alias("ba"), F.col("id_a") == F.col("ba.id"))
        .join(sb.alias("bb2"), F.col("id_b") == F.col("bb2.id"))
        .select(
            "id_a",
            "id_b",
            F.expr(
                "aggregate(zip_with(ba.bits, bb2.bits, "
                "(x, y) -> IF(x <> y, 1L, 0L)), 0L, (acc, v) -> acc + v)"
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> DataFrame:
    """End-to-end near-dup clustering: (doc_id, cluster_id, is_canonical).

    The composition a training-data pipeline actually runs: MinHash-LSH
    near-duplicate PAIRS -> connected components over the pair graph
    (star contraction, skew-proof: near-dup clusters are exactly the
    power-law case — one boilerplate template can span millions of docs)
    -> cluster_id = smallest member id, canonical = that member.
    Documents with no near-duplicate form singleton clusters. Filtering
    to ``is_canonical`` yields the deduplicated corpus; grouping by
    ``cluster_id`` yields the duplicate groups."""
    from .graph import connected_components_star

    pairs = minhash_lsh_pairs(
        df, threshold, id_col, text_col, **minhash_kwargs
    )
    labels = connected_components_star(pairs, src="id_a", dst="id_b")
    all_ids = df.select(id_col).distinct()
    return (
        all_ids.join(
            labels.withColumnRenamed("node", id_col), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )


def duplicate_spans(
    df: DataFrame,
    window: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_hash: bool = True,
) -> DataFrame:
    """Exact duplicate-SPAN detection — the scalable signal behind exact
    substring deduplication (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499): a sliding window of
    ``window`` whitespace tokens per document; a window is duplicated when
    the same token sequence appears VERBATIM in at least one other
    document. Returns per document:

        (id, n_windows, n_dup_windows, dup_frac)

    — rank/filter on dup_frac to drop documents mostly made of text seen
    elsewhere (the suffix-array approach of the paper removes the spans
    themselves; this flags the carriers with one relational pass).

    Plan shape: window grams come from a codegen transform+explode (no
    UDF); cross-doc counts are one groupBy with map-side combine; the
    per-doc rollup joins grams against the duplicated set co-partitioned
    on the gram key. ``use_hash=True`` shuffles xxhash64(gram) instead of
    the gram text — 8 bytes/row instead of ~window*6, the difference
    between feasible and not at 100 TB (hash collisions ~ n²/2⁶⁴:
    negligible). use_hash=False keeps the text for external-oracle replay.
    """
    toks = f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"
    grams = (
        f"CASE WHEN size({toks}) >= {window} THEN "
        f"transform(sequence(0, size({toks}) - {window}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {window}))) "
        "ELSE array() END"
    )
    g = df.select(
        F.col(id_col),
        F.explode_outer(F.expr(grams)).alias("__gram"),
    )
    if use_hash:
        g = g.withColumn(
            "__gram",
            F.when(
                F.col("__gram").isNotNull(), F.xxhash64(F.col("__gram"))
            ),
        )
    occurrences = g.where(F.col("__gram").isNotNull())
    dup_grams = (
        occurrences.groupBy("__gram")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= 2)
        .select("__gram")
    )
    dup_counts = (
        occurrences.join(dup_grams, "__gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    totals = g.groupBy(id_col).agg(
        F.count(F.col("__gram")).alias("n_windows")
    )
    return (
        totals.join(dup_counts, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.round(
                F.when(
                    F.col("n_windows") > 0,
                    F.coalesce("n_dup_windows", F.lit(0))
                    / F.col("n_windows").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )
