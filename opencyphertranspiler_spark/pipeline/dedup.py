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

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic minhash parameters (fixed seed so results are reproducible).
# 31-bit prime field: a * h + b <= 2^62, so the arithmetic never overflows
# int64 — safe under ANSI mode (Spark 4 default), no wrap-around reliance.
_MERSENNE = (1 << 31) - 1
_rng = random.Random(42)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, _MERSENNE), _rng.randrange(0, _MERSENNE)) for _ in range(64)
]


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
    """Character n-gram shingle array (empty when the text is too short)."""
    body = (
        f"transform(sequence(1, length({col}) - {n - 1}), i -> substring({col}, i, {n}))"
    )
    expr = f"CASE WHEN length({col}) >= {n} THEN {body} ELSE array() END"
    if distinct:
        expr = f"array_distinct({expr})"
    return F.expr(expr)


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
    s = df.select(
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


def minhash_signature(sh_col: str = "sh", k: int = 64):
    """MinHash signature array (k minima) from a shingle-array column.

    h_i(s) = (a_i * xxhash64(s) + b_i) mod M61, folded columnar with
    transform/array_min — all JVM expressions."""
    mins = []
    for a, b in MINHASH_COEFFS[:k]:
        # fold xxhash64 into the 31-bit field first so every product stays
        # within int64 (ANSI-safe)
        mins.append(
            f"array_min(transform({sh_col}, s -> "
            f"pmod({a}L * pmod(xxhash64(s), {_MERSENNE}L) + {b}L, {_MERSENNE}L)))"
        )
    return F.expr(f"array({', '.join(mins)})")


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH, verified with true
    n-gram Jaccard (so precision is exact; recall ~ 1-(1-t^r)^b).

    Plan shape (scale-critical): shingle+sign map -> explode to (band,
    band_hash) -> shuffle hash self-join on the band bucket -> distinct
    candidate pairs -> verify join. No cross join anywhere."""
    rows = num_hashes // bands
    s = (
        df.select(F.col(id_col).alias("id"), shingles(text_col, n).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("sig", minhash_signature("sh", num_hashes))
    )
    band_entries = s.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b AS band, hash(slice(sig, b * {rows} + 1, {rows})) AS bh))"
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")
    l, r = band_entries.alias("l"), band_entries.alias("r")
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
    sh = s.select("id", "sh")
    verified = (
        candidates.join(sh.alias("sa"), F.col("id_a") == F.col("sa.id"))
        .join(sh.alias("sb"), F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh"))).cast("double")
                / F.size(F.array_union(F.col("sa.sh"), F.col("sb.sh"))).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash with banded blocking.

    Pigeonhole: any pair within hamming distance 3 agrees exactly on at
    least one of the 4 16-bit bands, so the blocking join has full recall
    for max_hamming <= 3. Verification computes the true bit distance."""
    votes = (
        "aggregate(filter(split(lower({c}), '\\\\s+'), t -> t <> ''), "
        "array_repeat(0L, 64), (acc, t) -> zip_with(acc, "
        "transform(sequence(0, 63), b -> "
        "IF(((xxhash64(t) >> b) & 1) = 1, 1L, -1L)), (x, y) -> x + y))"
    ).format(c=text_col)
    bits = f"transform({votes}, v -> IF(v > 0, 1L, 0L))"
    s = (
        df.select(F.col(id_col).alias("id"), F.expr(bits).alias("bits"))
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
