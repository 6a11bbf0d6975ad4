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


# PII patterns: conservative, line-noise-free regexes. Redaction is a pure
# regexp_replace chain — codegen'd, no UDFs, safe at 100 TB scan speed.
PII_PATTERNS: list[tuple[str, str]] = [
    # ordered most-specific first: each pattern only sees text the earlier
    # (more precise) redactions have already cleaned, so the greedy phone
    # shape cannot eat IP octets or card digit runs
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    (r"\b(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}[ .-]?\d{0,4}\b", "<PHONE>"),
]


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Replace common PII shapes (emails, phone numbers, card-like digit
    runs, SSNs, IPv4s) with typed placeholder tokens, and count the
    replacements per document. Patterns apply in order, so earlier
    (more specific) redactions shield later (greedier) ones."""
    red = F.col(text_col)
    hits = F.lit(0).cast("long")
    for pat, token in PII_PATTERNS:
        # count on the progressively-redacted text so a card number is not
        # double-counted by the (greedier) phone pattern later
        hits = hits + F.coalesce(
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
            .cast("long"),
            F.lit(0),
        )
        red = F.regexp_replace(red, pat, token)
    return df.select(
        F.col(id_col),
        red.alias("redacted_text"),
        hits.alias("n_redactions"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals:

    - dup_token_frac:  1 - distinct tokens / tokens
    - top_token_frac:  occurrences of the most frequent token / tokens
    - dup_bigram_frac: 1 - distinct bigrams / bigrams

    High values flag boilerplate/template documents that fingerprint-level
    dedup misses. Token stats run as explode -> two-level groupBy — fully
    codegen with map-side combine, the 100 TB shape. The bigram fractions
    use array expressions (one interpreted transform, bounded by the
    per-document token count)."""
    ex = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    tok = (
        ex.groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("__n"),
            F.count(F.lit(1)).alias("__distinct"),
            F.max("c").alias("__top"),
        )
    )
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    bigrams = (
        f"CASE WHEN size({toks}) >= 2 THEN "
        f"transform(sequence(1, size({toks}) - 1), "
        f"i -> concat(element_at({toks}, i), ' ', element_at({toks}, i + 1))) "
        f"ELSE array() END"
    )
    nb = F.expr(f"size({bigrams})").cast("double")
    base = df.select(
        F.col(id_col),
        F.when(
            nb > 0,
            F.round(1 - F.expr(f"size(array_distinct({bigrams}))") / nb, 4),
        )
        .otherwise(0.0)
        .alias("dup_bigram_frac"),
    )
    n = F.col("__n").cast("double")
    return (
        base.join(tok, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.round(1 - F.col("__distinct") / n, 4), F.lit(0.0)
            ).alias("dup_token_frac"),
            F.coalesce(
                F.round(F.col("__top").cast("double") / n, 4), F.lit(0.0)
            ).alias("top_token_frac"),
            "dup_bigram_frac",
        )
    )


def word_ngrams(text_col: str, n: int = 5):
    """Column of space-joined word ``n``-grams of the whitespace tokens of
    ``text_col`` (duplicates removed). Pure codegen expression — the
    shape DuckDB can replicate for the oracle gate."""
    toks = f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN array_distinct(transform("
        f"sequence(1, size({toks}) - {n} + 1), "
        f"i -> array_join(slice({toks}, i, {n}), ' '))) "
        "ELSE array() END"
    )


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check: per corpus document, the fraction
    of its distinct word ``n``-grams that also appear anywhere in
    ``benchmark`` — (id_col, n_ngrams, n_matched, overlap_frac), one row
    per corpus document with at least ``n`` tokens.

    A training-data pipeline runs this before every release: documents
    with high overlap against an evaluation benchmark are leakage and
    must be dropped (n in the 8-13 range and a threshold near 0.3 are
    typical; both are caller-tunable).

    100 TB design: the benchmark side (eval sets — thousands of
    documents, not billions) collapses to a DISTINCT n-gram set that is
    BROADCAST; the corpus side then needs one scan + explode + broadcast
    semi/left join + per-doc groupBy — the corpus is never shuffled by
    n-gram, and no corpus x corpus pair ever forms. Hashing the grams
    (xxhash64) would shrink the broadcast further; kept as strings here
    so the DuckDB oracle replays exactly.
    """
    from pyspark.sql.functions import broadcast

    grams = word_ngrams(text_col, n)
    corpus_g = corpus.select(
        F.col(id_col), F.explode(grams).alias("g")
    )
    bench_g = (
        benchmark.select(F.explode(grams).alias("g")).distinct()
    )
    matched = (
        corpus_g.join(broadcast(bench_g), "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_matched"))
    )
    totals = corpus.select(
        F.col(id_col), F.size(grams).cast("long").alias("n_ngrams")
    ).filter(F.col("n_ngrams") > 0)
    return totals.join(matched, id_col, "left").select(
        id_col,
        "n_ngrams",
        F.coalesce(F.col("n_matched"), F.lit(0)).alias("n_matched"),
        F.round(
            F.coalesce(F.col("n_matched"), F.lit(0))
            / F.col("n_ngrams"),
            6,
        ).alias("overlap_frac"),
    )


def _char_ngrams(text_col: str, n: int):
    """Array of overlapping character n-grams (lower-cased, whitespace
    normalized) — pure codegen transform, no UDF."""
    norm = f"lower(regexp_replace({text_col}, '\\\\s+', ' '))"
    return F.expr(
        f"CASE WHEN length({norm}) >= {n} THEN "
        f"transform(sequence(1, length({norm}) - {n - 1}), "
        f"i -> substring({norm}, i, {n})) ELSE array() END"
    )


def train_char_lm(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(context, nextc, logp) — a character n-gram language model as a
    DataFrame: log P(c | preceding n-1 chars), max-likelihood over the
    corpus. The CCNet recipe (Wenzek et al. 2020) scores documents with a
    reference LM and drops the worst tail; train this on a trusted corpus
    (or the corpus itself for outlier mining).

    Scale shape: the model IS a DataFrame (two groupBy passes — n-gram and
    context counts), never driver state; scoring joins against it. A
    trigram model over lower-cased text is small enough that the score
    join broadcasts."""
    grams = (
        df.select(F.explode(_char_ngrams(text_col, n)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c_gram"))
        .withColumn("context", F.expr(f"substring(g, 1, {n - 1})"))
        .withColumn("nextc", F.expr(f"substring(g, {n}, 1)"))
    )
    ctx = grams.groupBy("context").agg(F.sum("c_gram").alias("c_ctx"))
    return grams.join(ctx, "context").select(
        "context",
        "nextc",
        (F.log(F.col("c_gram").cast("double")) - F.log(F.col("c_ctx"))).alias(
            "logp"
        ),
    )


def lm_score(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    unseen_logp: float = -20.0,
) -> DataFrame:
    """(id, n_grams, avg_logp, ppl) — per-document mean character
    log-likelihood under a train_char_lm model, and the derived
    perplexity exp(-avg_logp). Low ppl = text that looks like the
    reference corpus; gibberish and boilerplate score high — CCNet-style
    filtering is ``lm_score(...).filter("ppl < cutoff")``.

    Unseen n-grams contribute ``unseen_logp`` (a fixed floor; simple and
    deterministic where CCNet uses Kneser-Ney). The scoring plan is one
    explode, one join against the (broadcastable) model, one groupBy."""
    occ = df.select(
        F.col(id_col),
        F.explode(_char_ngrams(text_col, n)).alias("g"),
    ).select(
        id_col,
        F.expr(f"substring(g, 1, {n - 1})").alias("context"),
        F.expr(f"substring(g, {n}, 1)").alias("nextc"),
    )
    scored = occ.join(
        F.broadcast(model), ["context", "nextc"], "left"
    ).select(
        id_col,
        F.coalesce("logp", F.lit(float(unseen_logp))).alias("logp"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.avg("logp").alias("avg_logp"),
        )
        .select(
            id_col,
            "n_grams",
            F.round("avg_logp", 6).alias("avg_logp"),
            F.round(F.exp(-F.col("avg_logp")), 6).alias("ppl"),
        )
    )


def strip_html(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, clean_text) — regex-based HTML/markup removal: script/style
    blocks dropped wholesale, tags removed, common entities decoded,
    whitespace collapsed. Pure codegen column expressions (the
    trafilatura-class DOM extractors need real parsers; this is the
    cheap first-pass wash a 100 TB crawl gets before quality scoring)."""
    c = F.col(text_col)
    c = F.regexp_replace(c, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in [
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
    ]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.select(F.col(id_col), c.alias("clean_text"))


def drop_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
) -> DataFrame:
    """(id, kept_text, n_lines, n_dropped) — remove lines that repeat
    VERBATIM across a large share of the corpus (navigation, cookie
    banners, footers — the CCNet/RefinedWeb line-dedup pass). A line is
    boilerplate when it appears in >= max(min_docs, min_doc_frac * n_docs)
    distinct documents.

    Plan shape: explode lines keeping position, one groupBy for cross-doc
    line frequencies (map-side combine), an anti-join against the
    boilerplate set, and a position-ordered re-assembly per document —
    shuffle rows are (doc, line) pairs, the same budget as the
    duplicate-span scan."""
    n_docs = df.select(id_col).distinct().count()  # bounded: one scalar
    cutoff = max(min_docs, int(min_doc_frac * n_docs))
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.col("line")))
    freq = (
        lines.where(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= cutoff)
        .select("norm")
    )
    tagged = lines.join(freq.withColumn("__bp", F.lit(True)), "norm", "left")
    kept = tagged.where(F.col("__bp").isNull())
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n", F.transform(F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s["line"])
        ).alias("kept_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(reassembled, id_col, "left")
        .select(
            id_col,
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
        )
    )


def bm25_rank(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Distributed Okapi BM25 ranking of a document corpus against a
    QUERY SET (round 11) — the inverted-index join, entirely JVM-side:

      1. docs -> (doc_id, term, tf) via explode + count (one shuffle,
         map-side combined); doc lengths ride along
      2. per-term document frequency = one count over the (doc, term)
         relation; corpus stats (N, avgdl) are two scalars
      3. query terms equi-join the posting relation on `term` (the
         query side is typically bounded -> broadcast), each match
         scores idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
      4. groupBy (query, doc) sums the per-term parts; a bucketed
         two-phase top-k keeps k docs per query

    Analyzer: lowercase split on non-alphanumerics (same as the
    engine's fulltext index — no stemming, OR-combined terms). Output:
    (query_id, doc_id, bm25) — ties broken by doc id. 100 TB shape:
    cost scales with matching postings, never |queries| x |corpus|; at
    cluster scale the posting relation is the thing you'd bucket by
    term."""
    from .similarity import _global_topk

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__doc"), toks.alias("__toks")
    )
    lengths = base.select("__doc", F.size("__toks").alias("dl"))
    postings = (
        base.select("__doc", F.explode("__toks").alias("term"))
        .groupBy("__doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    term_df = postings.groupBy("term").agg(F.count("*").alias("df"))
    stats = lengths.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    if n_docs == 0 or avgdl == 0.0:
        return queries.select(
            F.col(query_id_col).alias("query_id"),
            F.lit(None).cast("long").alias("match_id"),
            F.lit(0.0).alias("bm25"),
        ).limit(0)
    qtoks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(query_col)), "[^a-z0-9]+"),
            lambda t: t != F.lit(""),
        )
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"), F.explode(qtoks).alias("term")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    part = (
        idf
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
            )
        )
    )
    scored = (
        F.broadcast(qterms)
        .join(postings, "term")
        .join(F.broadcast(term_df), "term")
        .join(lengths, "__doc")
        .select(
            "query_id",
            F.col("__doc").alias("match_id"),
            part.alias("part"),
        )
        .groupBy("query_id", "match_id")
        .agg(F.sum("part").alias("bm25"))
    )
    return _global_topk(scored, k, score_col="bm25")
