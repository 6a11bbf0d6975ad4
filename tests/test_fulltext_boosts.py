"""Round 13 (VERDICT r12 #6 + ADVICE r12): fulltext query/field boosts,
analyzer stopwords, and the grouped match-ANY semantics for
modifier-prefixed unquoted multi-token pieces — each differentially
verified against an independent plain-python BM25 oracle, and the
materialized postings route verified byte-equal to the scan route."""

import math
import os as _os
import re

import pytest

from opencyphertranspiler_spark.testing import arrow_df

from tests.conftest import SF_DIR

_FUZZ_SCALE = int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))


@pytest.fixture(scope="module")
def ft_engine(spark):
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register(
        "documents",
        lambda: spark.read.parquet(f"{SF_DIR}/documents.parquet"),
    )
    g = GraphSchema(
        [
            NodeSchema(
                "Doc", "documents", "doc_id",
                (
                    EntityProperty("text", "string"),
                    EntityProperty("source", "string"),
                ),
                "bigint",
            )
        ],
        [],
    )
    return CypherEngine(spark, g, reg)


def _corpus(spark, fields):
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", *fields)
        .collect()
    )
    return rows


def _oracle(
    spark, fields, query, limit,
    field_boosts=None, stopwords=frozenset(),
):
    """Python BM25 with per-field stats, the round-13 query grammar
    (boosts, stopwords, modifier groups) — independent of the engine."""
    fb = dict(zip(fields, field_boosts or [1.0] * len(fields)))

    def analyze(s):
        return [
            x
            for x in re.split(r"[^a-z0-9]+", s.lower())
            if x and x not in stopwords
        ]

    rows = _corpus(spark, fields)
    toks = {
        f: {r.doc_id: analyze(r[f]) for r in rows if r[f] is not None}
        for f in fields
    }
    stats = {
        f: (
            len(toks[f]),
            (sum(len(v) for v in toks[f].values()) / len(toks[f]))
            if toks[f]
            else 0.0,
        )
        for f in fields
    }

    clauses = []
    seen = set()
    for m in re.finditer(
        r'([+\-]?)(?:"([^"]*)"(~\d+)?(\^\d+(?:\.\d+)?)?|(\S+))', query
    ):
        mod, quoted, qslop, qboost, bare = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
        )
        boost = 1.0
        if quoted is not None:
            text = quoted
            if qboost:
                boost = float(qboost[1:])
        else:
            text = bare
            bm = re.match(r"(.*[^^])\^(\d+(?:\.\d+)?)$", bare)
            if bm:
                text, boost = bm.group(1), float(bm.group(2))
        has_fuzz, fuzz_d = False, None
        if quoted is None:
            fm = re.match(r"(.+)~(\d+)?$", text)
            if fm:
                text, fuzz_d = fm.group(1), fm.group(2)
                has_fuzz = True
        tks = analyze(text)
        if not tks:
            continue
        if has_fuzz and len(tks) == 1:
            t = tks[0]
            d = (
                int(fuzz_d)
                if fuzz_d
                else (0 if len(t) < 3 else (1 if len(t) <= 5 else 2))
            )
            pieces = [((t,), f"fuzzy{d}")]
        elif quoted is not None and len(tks) > 1:
            n_slop = int(qslop[1:]) if qslop else 0
            pieces = [
                (tuple(tks), f"slop{n_slop}" if n_slop else "phrase")
            ]
        elif len(tks) > 1 and mod:
            pieces = [(tuple(tks), "any")]
        else:
            pieces = [((t,), "term") for t in tks]
        for p, kind in pieces:
            key = (mod, p, kind, boost)
            if key not in seen:
                seen.add(key)
                clauses.append(key)

    # fuzzy expansion against the corpus vocabulary (df summed per
    # field, top-50 by (df desc, term) — mirrors engine._expand_fuzzy)
    if any(k.startswith("fuzzy") for _m, _t, k, _b in clauses):
        dfs_all = {}
        for f in fields:
            for tk in toks[f].values():
                for t in set(tk):
                    dfs_all[t] = dfs_all.get(t, 0) + 1
        from opencyphertranspiler_spark.engine import CypherEngine

        osa = CypherEngine._osa_distance
        expanded = []
        for mod, tks, kind, boost in clauses:
            if not kind.startswith("fuzzy"):
                expanded.append((mod, tks, kind, boost))
                continue
            d = int(kind[5:])
            qt = tks[0]
            if d == 0:
                expanded.append((mod, (qt,), "term", boost))
                continue
            cand = [
                t
                for t in dfs_all
                if abs(len(t) - len(qt)) <= d and osa(t, qt, d) <= d
            ]
            cand.sort(key=lambda t: (-dfs_all[t], t))
            kept = cand[:50]
            if not kept:
                expanded.append((mod, (qt,), "term", boost))
                continue
            terms = tuple(sorted(kept))
            if mod == "-":
                expanded.append(
                    ("-", terms, "any" if len(terms) > 1 else "term",
                     boost)
                )
                continue
            if mod == "+":
                expanded.append(
                    ("+", terms, "any" if len(terms) > 1 else "term",
                     0.0)
                )
            # round 14: one decayed-boost SHOULD term per candidate
            # (Lucene FuzzyTermsEnum: 1 - dist/min(len))
            for t in terms:
                dec = 1.0 - osa(t, qt, d) / max(1, min(len(qt), len(t)))
                expanded.append(("", (t,), "term", boost * dec))
        clauses = expanded

    def field_term_score(f, t, did):
        n, avgdl = stats[f]
        tk = toks[f].get(did)
        if tk is None or n == 0 or avgdl == 0.0:
            return 0.0
        df = sum(1 for v in toks[f].values() if t in v)
        if df == 0:
            return 0.0
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        tf = tk.count(t)
        return fb[f] * idf * tf * 2.2 / (
            tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl)
        )

    def contains_seq(tk, seq):
        ln = len(seq)
        return any(
            tuple(tk[i:i + ln]) == seq for i in range(len(tk) - ln + 1)
        )

    def sloppy_seq(tk, seq, slop):
        pos = {
            j: [i for i, t in enumerate(tk) if t == term]
            for j, term in enumerate(seq)
        }
        if any(not v for v in pos.values()):
            return False
        anchors = {p - j for j, ps in pos.items() for p in ps}
        return any(
            all(
                any(x <= q - j <= x + slop for q in pos[j])
                for j in range(len(seq))
            )
            for x in anchors
        )

    def clause_match(did, tks, kind):
        for f in fields:
            tk = toks[f].get(did)
            if tk is None:
                continue
            if kind == "phrase":
                if contains_seq(tk, tks):
                    return True
            elif kind.startswith("slop"):
                if sloppy_seq(tk, tks, int(kind[4:])):
                    return True
            elif any(t in tk for t in tks):
                return True
        return False

    out = {}
    for did in {r.doc_id for r in rows}:
        s = 0.0
        match_any = False
        ok = True
        for mod, tks, kind, boost in clauses:
            m = clause_match(did, tks, kind)
            if mod == "-":
                if m:
                    ok = False
                continue
            if mod == "+" and not m:
                ok = False
            if m:
                match_any = True
                s += boost * sum(
                    field_term_score(f, t, did)
                    for t in tks
                    for f in fields
                )
        if ok and match_any and s > 0:
            out[did] = s
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    return [(i, round(s, 6)) for i, s in ranked]


def _run(eng, index, q, limit=12):
    return [
        (r.id, r.s)
        for r in eng.cypher(
            f"CALL db.index.fulltext.queryNodes('{index}', $q, "
            f"{{limit: {limit}}}) YIELD node, score "
            "RETURN node.doc_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id",
            params={"q": q},
        ).collect()
    ]


def test_query_term_boost(ft_engine, spark):
    ft_engine.create_fulltext_index("b_ft", "Doc", "text")
    q = "fast^2 merge scan^0.5"
    got = _run(ft_engine, "b_ft", q)
    exp = _oracle(spark, ["text"], q, 12)
    assert got == exp and got
    # boost genuinely changes the ranking vs the unboosted query
    assert got != _run(ft_engine, "b_ft", "fast merge scan")


def test_query_phrase_boost(ft_engine, spark):
    ft_engine.create_fulltext_index("b_ft", "Doc", "text")
    q = '"merge scan"^3 vector'
    got = _run(ft_engine, "b_ft", q)
    exp = _oracle(spark, ["text"], q, 12)
    assert got == exp


def test_field_boost(ft_engine, spark):
    ft_engine.create_fulltext_index(
        "b_multi", "Doc", ["text^2", "source"]
    )
    q = "fast src3 merge"
    got = _run(ft_engine, "b_multi", q)
    exp = _oracle(
        spark, ["text", "source"], q, 12, field_boosts=[2.0, 1.0]
    )
    assert got == exp and got


def test_stopwords(ft_engine, spark):
    stop = frozenset({"the", "a", "of", "fast"})
    ft_engine.create_fulltext_index(
        "b_stop", "Doc", "text", stopwords=stop
    )
    q = "the fast merge of scan"
    got = _run(ft_engine, "b_stop", q)
    exp = _oracle(spark, ["text"], q, 12, stopwords=stop)
    assert got == exp and got
    # 'fast' is a stopword here: a pure-stopword query matches nothing
    assert _run(ft_engine, "b_stop", "the fast") == []


def test_modifier_group_is_match_any(ft_engine, spark):
    """ADVICE r12: '+fast-merge' is ONE grouped MUST clause requiring
    ANY member term (Lucene QueryParser semantics), not all-tokens-MUST
    — docs containing only 'fast' must survive."""
    ft_engine.create_fulltext_index("b_ft", "Doc", "text")
    q = "+fast-merge vector"
    got = _run(ft_engine, "b_ft", q, 1000)
    exp = _oracle(spark, ["text"], q, 1000)
    assert got == exp and got
    # the grouped clause parses as ONE match-any MUST
    clauses = ft_engine._parse_fulltext_query("+fast-merge vector")
    assert ("+", ("fast", "merge"), "any", 1.0) in clauses
    # the all-tokens-MUST reading would be a strict subset; prove the
    # group admits docs lacking one member term
    corpus = {
        r.doc_id: set(re.split(r"[^a-z0-9]+", r.text.lower()))
        for r in _corpus(spark, ["text"])
        if r.text is not None
    }
    assert any(
        ("fast" in corpus[i]) != ("merge" in corpus[i]) for i, _ in got
    )


def test_boosted_materialized_equals_scan(ft_engine, spark):
    """The postings route applies field/query boosts and stopwords
    identically to the scan route."""
    stop = frozenset({"the", "of"})
    ft_engine.create_fulltext_index(
        "b_mat", "Doc", ["text^2", "source"], stopwords=stop
    )
    q = 'fast^2 "merge scan" +vector -slow src3'
    scan = _run(ft_engine, "b_mat", q, 15)
    ft_engine.materialize_fulltext_index("b_mat")
    post = _run(ft_engine, "b_mat", q, 15)
    assert post == scan and scan
    exp = _oracle(
        spark, ["text", "source"], q, 15,
        field_boosts=[2.0, 1.0], stopwords=stop,
    )
    assert scan == exp


def test_fulltext_extended_grammar_fuzz(ft_engine, spark):
    """Hypothesis differential for the ROUND-13 grammar: random
    combinations of boosted terms/phrases, hyphenated modifier groups
    (match-ANY), and stopword-containing pieces, over a field-boosted
    stopword index — on BOTH the scan and materialized-postings paths,
    which must agree with the independent python oracle and each
    other."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    stop = frozenset({"the", "of"})
    if "bf_fuzz" not in ft_engine._fulltext_indexes:
        ft_engine.create_fulltext_index(
            "bf_fuzz", "Doc", ["text^2", "source"], stopwords=stop
        )
        ft_engine.materialize_fulltext_index("bf_fuzz")

    words = ["fast", "merge", "scan", "slow", "batch", "the", "zzz_absent"]
    boosts = ["", "^2", "^0.5", "^3"]

    @st.composite
    def ft_query(draw):
        n = draw(st.integers(1, 4))
        pieces = []
        for _ in range(n):
            mod = draw(st.sampled_from(["", "", "+", "-"]))
            b = draw(st.sampled_from(boosts))
            shape = draw(st.integers(0, 3))
            if shape == 0:  # term
                pieces.append(mod + draw(st.sampled_from(words)) + b)
            elif shape == 3:  # fuzzy term (AUTO or explicit distance)
                f = draw(st.sampled_from(["~", "~1", "~2"]))
                # multi-token pieces (underscores split) are a typed
                # error under ~, so draw single-token words only
                w = draw(st.sampled_from([x for x in words if "_" not in x]))
                pieces.append(mod + w + f + b)
            elif shape == 1:  # quoted phrase, optionally sloppy
                w1, w2 = (
                    draw(st.sampled_from(words)),
                    draw(st.sampled_from(words)),
                )
                sl = draw(st.sampled_from(["", "~1", "~2", "~4"]))
                pieces.append(f'{mod}"{w1} {w2}"{sl}{b}')
            else:  # hyphenated multi-token piece (group when modified)
                w1, w2 = (
                    draw(st.sampled_from(words)),
                    draw(st.sampled_from(words)),
                )
                pieces.append(f"{mod}{w1}-{w2}{b}")
        return " ".join(pieces)

    @settings(
        max_examples=15 * _FUZZ_SCALE,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(q=ft_query())
    def check(q):
        exp = _oracle(
            spark, ["text", "source"], q, 8,
            field_boosts=[2.0, 1.0], stopwords=stop,
        )
        scan_eng_clauses = ft_engine._parse_fulltext_query(q, stop)
        # scan path: a fresh un-materialized index over the same fields
        ft_engine.create_fulltext_index(
            "bf_fuzz_scan", "Doc", ["text^2", "source"], stopwords=stop
        )

        def run(idx):
            return [
                (r.id, r.s)
                for r in ft_engine.cypher(
                    f"CALL db.index.fulltext.queryNodes('{idx}', $q, "
                    "{limit: 8}) YIELD node, score "
                    "RETURN node.doc_id AS id, round(score, 6) AS s "
                    "ORDER BY s DESC, id",
                    params={"q": q},
                ).collect()
            ]

        assert run("bf_fuzz_scan") == exp, ("scan", q, scan_eng_clauses)
        assert run("bf_fuzz") == exp, ("postings", q, scan_eng_clauses)

    check()


def _stem_min(w):
    # mirror of EnglishMinimalStemmer for the test oracle
    if len(w) < 3 or not w.endswith("s"):
        return w
    if w[-2] in "us":
        return w
    if w[-2] == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in "ae":
            return w[:-3] + "y"
        if w[-3] in "iaoe":
            return w
    return w[:-1]


def test_stem_rule_table():
    from opencyphertranspiler_spark import CypherEngine

    # expectations match org.apache.lucene.analysis.en
    # .EnglishMinimalStemmer exactly — including its quirks ('was'->'wa',
    # 'dies'->'dy'; Lucene pairs this filter with a stopword list)
    cases = {
        "merges": "merge", "scans": "scan", "queries": "query",
        "is": "is", "was": "wa", "boss": "boss", "bus": "bus",
        "goes": "goes", "dies": "dy", "ties": "ty",
        "fees": "fees", "as": "as", "s": "s", "ss": "ss",
        "tables": "table", "cats": "cat", "aliases": "aliase",
        "studies": "study", "applies": "apply",
    }
    for w, exp in cases.items():
        assert CypherEngine._stem_minimal_py(w) == exp, (w, exp)
        assert _stem_min(w) == exp, (w, exp)


def test_english_minimal_stemmer(ft_engine, spark):
    """analyzer='english-minimal' (round 13): plural query terms match
    singular docs and vice versa, identically on the scan and postings
    routes, vs a python oracle running the same stemmer."""
    ft_engine.create_fulltext_index(
        "b_stem", "Doc", "text", analyzer="english-minimal"
    )

    def oracle(q, limit):
        # stem both corpus and query through the shared rule table
        import math

        rows = _corpus(spark, ["text"])
        toks = {
            r.doc_id: [
                _stem_min(x)
                for x in re.split(r"[^a-z0-9]+", r.text.lower())
                if x
            ]
            for r in rows
            if r.text is not None
        }
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        terms = sorted(
            {
                _stem_min(x)
                for x in re.split(r"[^a-z0-9]+", q.lower())
                if x
            }
        )
        out = {}
        for i, tk in toks.items():
            s = 0.0
            for t in terms:
                df = sum(1 for v in toks.values() if t in v)
                if df == 0:
                    continue
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                tf = tk.count(t)
                s += idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl)
                )
            if s > 0:
                out[i] = s
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
        return [(i, round(s, 6)) for i, s in ranked]

    q = "merges scans vectors"
    scan = _run(ft_engine, "b_stem", q, 10)
    assert scan == oracle(q, 10) and scan
    # plural query == singular query under the stemmer
    assert scan == _run(ft_engine, "b_stem", "merge scan vector", 10)
    ft_engine.materialize_fulltext_index("b_stem")
    assert _run(ft_engine, "b_stem", q, 10) == scan
    # the unstemmed index ranks differently (plural terms are rarer)
    ft_engine.create_fulltext_index("b_nostem", "Doc", "text")
    assert _run(ft_engine, "b_nostem", q, 10) != scan


def test_stemmer_via_ddl_options(ft_engine, spark):
    """CREATE FULLTEXT INDEX ... OPTIONS {indexConfig:
    {`fulltext.analyzer`: 'english-minimal'}} wires the stemmer."""
    ft_engine.cypher(
        "CREATE FULLTEXT INDEX ddl_stem IF NOT EXISTS FOR (d:Doc) "
        "ON EACH [d.text] OPTIONS {indexConfig: "
        "{`fulltext.analyzer`: 'english-minimal'}}"
    )
    try:
        assert (
            ft_engine._fulltext_indexes["ddl_stem"][4]
            == "english-minimal"
        )
        plural = _run(ft_engine, "ddl_stem", "merges scans", 5)
        singular = _run(ft_engine, "ddl_stem", "merge scan", 5)
        assert plural == singular and plural
    finally:
        ft_engine.cypher("DROP INDEX ddl_stem IF EXISTS")


# (the classic-levenshtein helper retired round 14 — both the engine
# and the oracles use the OSA metric, CypherEngine._osa_distance)


def test_fuzzy_parse_rules(ft_engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    p = ft_engine._parse_fulltext_query
    # AUTO fuzziness by analyzed length: <3 -> 0, 3..5 -> 1, >5 -> 2
    assert ("", ("xy",), "fuzzy0", 1.0) in p("xy~")
    assert ("", ("merge",), "fuzzy1", 1.0) in p("merge~")
    assert ("", ("vector",), "fuzzy2", 1.0) in p("vector~")
    assert ("+", ("merge",), "fuzzy2", 3.0) in p("+merge~2^3")
    with pytest.raises(TranspilerNotSupportedError, match="distance > 2"):
        p("merge~3")
    # round 14: phrase slop now PARSES into a slop<n> clause
    assert ("", ("merge", "scan"), "slop2", 1.0) in p('"merge scan"~2')
    assert ("", ("merge", "scan"), "phrase", 1.0) in p('"merge scan"~0')
    with pytest.raises(TranspilerNotSupportedError, match="single term"):
        p("state-of-art~1")


def test_fuzzy_query_vs_oracle(ft_engine, spark):
    """term~d expands against the index vocabulary (length-banded
    levenshtein, top-50 by df) and scores each expansion with its own
    idf — scan and postings routes agree with the python oracle."""
    ft_engine.create_fulltext_index("b_fuzz", "Doc", "text")

    def oracle(q_terms, fuzz, limit):
        import math

        rows = _corpus(spark, ["text"])
        toks = {
            r.doc_id: [
                x
                for x in re.split(r"[^a-z0-9]+", r.text.lower())
                if x
            ]
            for r in rows
            if r.text is not None
        }
        n = len(toks)
        avgdl = sum(len(v) for v in toks.values()) / n
        dfs = {}
        for tk in toks.values():
            for t in set(tk):
                dfs[t] = dfs.get(t, 0) + 1
        from opencyphertranspiler_spark.engine import CypherEngine

        osa = CypherEngine._osa_distance
        # term -> summed weight: exact query terms weigh 1.0, fuzzy
        # expansions weigh Lucene's decay 1 - dist/min(len) (round 14);
        # overlapping clauses SUM (separate BooleanQuery clauses)
        weights: dict = {}
        for qt, d in zip(q_terms, fuzz):
            if d == 0:
                weights[qt] = weights.get(qt, 0.0) + 1.0
                continue
            cand = [
                t
                for t in dfs
                if abs(len(t) - len(qt)) <= d and osa(t, qt, d) <= d
            ]
            cand.sort(key=lambda t: (-dfs[t], t))
            for t in cand[:50]:
                dec = 1.0 - osa(t, qt, d) / max(1, min(len(qt), len(t)))
                weights[t] = weights.get(t, 0.0) + dec
        out = {}
        for i, tk in toks.items():
            s = 0.0
            for t in sorted(weights):
                df = dfs.get(t, 0)
                if df == 0:
                    continue
                idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
                tf = tk.count(t)
                s += weights[t] * idf * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl)
                )
            if s > 0:
                out[i] = s
        ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(i, round(s, 6)) for i, s in ranked[:limit]]

    q = "merge~1 scan"
    scan = _run(ft_engine, "b_fuzz", q, 10)
    exp = oracle(["merge", "scan"], [1, 0], 10)
    assert scan == exp and scan
    # fuzzy genuinely widens the match set vs the exact query
    exact = _run(ft_engine, "b_fuzz", "merge scan", 1000)
    fuzzy_all = _run(ft_engine, "b_fuzz", q, 1000)
    assert len(fuzzy_all) >= len(exact)
    ft_engine.materialize_fulltext_index("b_fuzz")
    assert _run(ft_engine, "b_fuzz", q, 10) == scan
    # an unmatchable MUST fuzzy term yields zero rows
    assert _run(ft_engine, "b_fuzz", "+qqqqqqqqqq~1 merge", 10) == []


def test_osa_distance_unit():
    """Round 14 (ADVICE r13): fuzzy uses OSA / restricted
    Damerau-Levenshtein — an adjacent transposition is ONE edit, the
    Lucene/Neo4j FuzzyQuery metric."""
    from opencyphertranspiler_spark.engine import CypherEngine

    osa = CypherEngine._osa_distance
    assert osa("spark", "spark", 2) == 0
    assert osa("sprak", "spark", 2) == 1  # classic levenshtein says 2
    assert osa("ab", "ba", 2) == 1
    assert osa("abcd", "badc", 2) == 2  # two disjoint transpositions
    assert osa("kitten", "sitting", 3) == 3
    assert osa("a", "abcd", 2) == 3  # length band early-out: cap + 1


def test_fuzzy_transposition_matches_like_lucene(spark):
    """'sprak~1' must match documents containing 'spark' (transposition
    = 1 edit under OSA; classic levenshtein would say 2 and miss) on
    both the scan and the postings route."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df(
        "tinydocs",
        arrow_df(spark, 
            [
                (1, "spark shuffle tuning"),
                (2, "spork cutlery review"),
                (3, "entirely unrelated words"),
            ],
            "doc_id bigint, text string",
        ),
    )
    g = GraphSchema(
        [
            NodeSchema(
                "TDoc", "tinydocs", "doc_id",
                (EntityProperty("text", "string"),), "bigint",
            )
        ],
        [],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_fulltext_index("tiny_ft", "TDoc", "text")
    q = (
        "CALL db.index.fulltext.queryNodes('tiny_ft', 'sprak~1', "
        "{limit: 10}) YIELD node, score "
        "RETURN node.doc_id AS id ORDER BY id"
    )
    scan = [r.id for r in eng.cypher(q).collect()]
    # 'spark' matches (transposition = OSA 1); 'spork' does NOT
    # (r->o, a->r is 2 edits) — and with classic levenshtein NEITHER
    # would match, so this pins the metric change
    assert scan == [1]
    eng.materialize_fulltext_index("tiny_ft")
    assert [r.id for r in eng.cypher(q).collect()] == scan
    # at distance 2 the substitution-pair candidate joins
    q2 = q.replace("sprak~1", "sprak~2")
    assert [r.id for r in eng.cypher(q2).collect()] == [1, 2]


def test_fuzzy_expansion_memoized_no_compile_job(ft_engine, spark):
    """Round 14 (VERDICT r13 #7): the scan-path fuzzy vocabulary and
    each (term, distance) expansion are memoized per (index, epoch) —
    after the first fuzzy query, COMPILING another fuzzy query on the
    same index runs NO Spark job (the first query's winner key differs
    via the limit, so the builder genuinely re-runs)."""
    ft_engine.create_fulltext_index("b_fuzz_memo", "Doc", "text")
    ft_engine.clear_caches()
    q = (
        "CALL db.index.fulltext.queryNodes('b_fuzz_memo', 'merge~1', "
        "{limit: %d}) YIELD node, score RETURN node.doc_id AS id"
    )
    ft_engine.cypher(q % 10).collect()  # pays the vocabulary aggregate
    sc = spark.sparkContext
    sc.setJobGroup("fuzzmemo14", "fuzzy memo probe")
    try:
        ft_engine.cypher(q % 20)  # compile only — new winner key
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    ids = sc.statusTracker().getJobIdsForGroup("fuzzmemo14")
    assert list(ids) == []


def test_sloppy_phrase_matching(spark):
    """Round 14: '"a b"~n' sloppy phrases — the window criterion is
    exactly Lucene's edit distance for 2-term phrases (gap = p2-p1-1,
    transposition costs 2) and a documented window approximation for
    k >= 3; scan and postings routes agree."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df(
        "slopdocs",
        arrow_df(spark, 
            [
                (1, "alpha beta gamma"),
                (2, "beta alpha"),
                (3, "alpha x y beta"),
                (4, "unrelated words"),
                (5, "alpha beta q gamma"),
            ],
            "doc_id bigint, text string",
        ),
    )
    g = GraphSchema(
        [
            NodeSchema(
                "SDoc", "slopdocs", "doc_id",
                (EntityProperty("text", "string"),), "bigint",
            )
        ],
        [],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_fulltext_index("slop_ft", "SDoc", "text")

    def run(q):
        rows = eng.cypher(
            "CALL db.index.fulltext.queryNodes('slop_ft', $q, "
            "{limit: 10}) YIELD node, score "
            "RETURN node.doc_id AS id ORDER BY id",
            params={"q": q},
        ).collect()
        return [r.id for r in rows]

    cases = {
        '"alpha beta"': [1, 5],        # exact adjacency
        '"alpha beta"~1': [1, 5],      # gap 2 (doc 3) still out
        '"alpha beta"~2': [1, 2, 3, 5],  # transposition + gap 2 join
        '"beta alpha"~2': [1, 2, 5],  # doc3: transposition+gap = 4 > 2
        '"alpha gamma"~1': [1],        # doc5's gap is two tokens
        '"alpha gamma"~0': [],         # never adjacent (slop 0 = exact)
        '+"alpha beta"~2 -gamma': [2, 3],  # composes with MUST/NOT
        '"alpha beta gamma"~1': [1, 5],  # 3-term window
        '"alpha beta gamma"~0': [1],
    }
    scan = {q: run(q) for q in cases}
    assert scan == cases, scan
    eng.materialize_fulltext_index("slop_ft")
    assert {q: run(q) for q in cases} == cases
