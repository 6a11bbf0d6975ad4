"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All pure column expressions (codegen'd, no UDFs),
each designed to be replicable in ANSI SQL for the DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword markers for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "de", "los"],
}


def token_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count, BPE-ish subword count (word-boundary regex),
    char count, punctuation count, mean token length."""
    toks = f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        # BPE-ish proxy: alphanumeric runs + isolated non-space symbols
        F.expr(
            f"size(regexp_extract_all({text_col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\\\s]', 0))"
        )
        .cast("long")
        .alias("n_subtokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.expr(f"size(regexp_extract_all({text_col}, '[.,;:!?]', 0))")
        .cast("long")
        .alias("n_punct"),
        F.round(
            F.expr(
                f"CASE WHEN size({toks}) > 0 THEN "
                f"aggregate({toks}, CAST(0.0 AS DOUBLE), (a, t) -> a + length(t)) "
                f"/ size({toks}) ELSE 0.0 END"
            ),
            4,
        ).alias("mean_token_len"),
    )


def quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic document-quality score in [0, 1]: length band, low
    punctuation noise, reasonable mean token length. Deterministic formula,
    oracle-replicable."""
    stats = token_stats(df, id_col, text_col)
    len_ok = F.when(
        (F.col("n_chars") >= 100) & (F.col("n_chars") <= 10000), F.lit(1.0)
    ).otherwise(F.col("n_chars").cast("double") / F.lit(100.0))
    len_score = F.least(len_ok, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(
        F.col("n_punct").cast("double")
        / F.greatest(F.col("n_tokens").cast("double"), F.lit(1.0)),
        F.lit(1.0),
    )
    tok_score = F.when(
        (F.col("mean_token_len") >= 3.0) & (F.col("mean_token_len") <= 10.0),
        F.lit(1.0),
    ).otherwise(F.lit(0.5))
    return stats.select(
        id_col,
        F.round(
            0.4 * len_score + 0.3 * punct_score + 0.3 * tok_score, 4
        ).alias("quality"),
    )


def language_id(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Stopword-marker language ID with a CJK-codepoint fast path.

    Scores each candidate language by counting marker-word hits in the
    lower-cased token stream; CJK characters trump the markers. Ties break
    by fixed language order (en, de, fr, es)."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    scores = []
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            F.expr(
                f"size(filter({toks}, t -> array_contains(array({arr}), t)))"
            ).alias(f"score_{lang}")
        )
    scored = df.select(F.col(id_col), F.col(text_col), *scores)
    has_cjk = F.expr(f"{text_col} RLIKE '[\\\\x{{4e00}}-\\\\x{{9fff}}]'")
    best = F.lit("en")
    best_score = F.col("score_en")
    for lang in ["de", "fr", "es"]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    pred = F.when(has_cjk, F.lit("zh")).otherwise(
        F.when(best_score > 0, best).otherwise(F.lit("unknown"))
    )
    return scored.select(id_col, pred.alias("pred_lang"))


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic document fingerprint: md5 over whitespace-normalized,
    lower-cased text. Identical in any engine with md5 — the exact-dedup /
    provenance key."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))
