"""Round 14 (VERDICT r13 #3): full Porter stemming
(``analyzer='english'``) — the 1980 paper's rule tables as a staged
pure-Column pipeline (index side) and a rule-identical python mirror
(query side). Verified three ways: the paper's published example
vocabulary against the python form, a differential fuzz column ==
python, and scan == postings == independent-python-BM25 parity through
the fulltext surface."""

import math
import random
import re

import pytest

from opencyphertranspiler_spark.porter import (
    porter_stem_col,
    porter_stem_py,
)
from tests.conftest import SF_DIR

# Published examples from the Porter 1980 paper (steps 1-5 tables and
# prose), composed through the FULL algorithm — these agree with the
# classic reference implementation's outputs.
PAPER_PAIRS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "homologou": "homolog",
    "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # y-as-vowel cases (y after a consonant is a vowel)
    "syzygy": "syzygi", "day": "dai", "enjoyed": "enjoi",
    # length <= 2 never stemmed
    "is": "is", "as": "as", "a": "a",
}


def test_porter_paper_vocabulary():
    bad = {
        w: (porter_stem_py(w), want)
        for w, want in PAPER_PAIRS.items()
        if porter_stem_py(w) != want
    }
    assert not bad, bad


def test_porter_column_equals_python_fuzz(spark):
    """Differential fuzz: the staged Column pipeline and the python
    mirror must agree on every token — random letter/digit strings
    (incl. v/y-heavy alphabets, the class-marker collision traps) plus
    the paper vocabulary."""
    from pyspark.sql import functions as F

    words = list(PAPER_PAIRS)
    rng = random.Random(20260816)
    for _ in range(1500):
        n = rng.randint(1, 14)
        words.append(
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                for _ in range(n)
            )
        )
    for _ in range(1000):
        n = rng.randint(1, 14)
        words.append(
            "".join(rng.choice("aeiouyslmntedcrgbv") for _ in range(n))
        )
    words = sorted(set(words))
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.s
        for r in df.select(
            "w", porter_stem_col(F.col("w")).alias("s")
        ).collect()
    }
    bad = {
        w: (got[w], porter_stem_py(w))
        for w in words
        if got[w] != porter_stem_py(w)
    }
    assert not bad, dict(list(bad.items())[:10])


@pytest.fixture(scope="module")
def pt_engine(spark):
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
                (EntityProperty("text", "string"),),
                "bigint",
            )
        ],
        [],
    )
    return CypherEngine(spark, g, reg)


def _bm25_oracle(spark, query_terms, limit, stem):
    """Independent python BM25 over the stemmed corpus — analyzer
    mirrored by hand (lowercase, non-alnum split, then stem)."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    toks = {
        r.doc_id: [
            stem(x)
            for x in re.split(r"[^a-z0-9]+", r.text.lower())
            if x
        ]
        for r in rows
        if r.text is not None
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs: dict = {}
    for tk in toks.values():
        for t in set(tk):
            dfs[t] = dfs.get(t, 0) + 1
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in sorted(set(stem(q) for q in query_terms)):
            df = dfs.get(t, 0)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            tf = tk.count(t)
            s += idf * tf * 2.2 / (
                tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl)
            )
        if s > 0:
            out[i] = s
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))
    return sorted(
        ((i, round(s, 6)) for i, s in ranked[:limit]),
        key=lambda x: (-x[1], x[0]),
    )


def _run(eng, index, q, limit):
    rows = eng.cypher(
        f"CALL db.index.fulltext.queryNodes('{index}', $q, "
        f"{{limit: {limit}}}) YIELD node, score "
        "RETURN node.doc_id AS id, round(score, 6) AS s",
        params={"q": q},
    ).collect()
    # YIELD row order is not defined — compare rank-sorted
    return sorted(
        ((r.id, r.s) for r in rows), key=lambda x: (-x[1], x[0])
    )


def test_english_analyzer_scan_postings_oracle_parity(pt_engine, spark):
    """analyzer='english': querying inflected forms matches stemmed
    corpus terms, the scan and postings routes agree byte-for-byte, and
    both match the independent python BM25 over the Porter-stemmed
    corpus."""
    pt_engine.create_fulltext_index(
        "pt_en", "Doc", "text", analyzer="english"
    )
    q = "merges scanning relational"
    scan = _run(pt_engine, "pt_en", q, 10)
    want = _bm25_oracle(
        spark, ["merges", "scanning", "relational"], 10, porter_stem_py
    )
    assert scan == want and scan
    # inflection-insensitivity: the unstemmed form of the same query
    # matches identically (both analyze to the same stems)
    assert _run(pt_engine, "pt_en", "merge scan relate", 10) == scan
    pt_engine.materialize_fulltext_index("pt_en")
    assert _run(pt_engine, "pt_en", q, 10) == scan


def test_english_analyzer_via_ddl_options(pt_engine):
    pt_engine.cypher(
        "CREATE FULLTEXT INDEX pt_ddl IF NOT EXISTS FOR (d:Doc) "
        "ON EACH [d.text] OPTIONS {indexConfig: "
        "{`fulltext.analyzer`: 'english'}}"
    )
    assert pt_engine._fulltext_indexes["pt_ddl"][4] == "english"
    # 'english-minimal' must still resolve to the minimal stemmer (the
    # literal contains 'english' — order of the OPTION checks matters)
    pt_engine.cypher(
        "CREATE FULLTEXT INDEX pt_ddl2 IF NOT EXISTS FOR (d:Doc) "
        "ON EACH [d.text] OPTIONS {indexConfig: "
        "{`fulltext.analyzer`: 'english-minimal'}}"
    )
    assert pt_engine._fulltext_indexes["pt_ddl2"][4] == "english-minimal"


def test_unknown_analyzer_raises(pt_engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(TranspilerNotSupportedError, match="analyzer"):
        pt_engine.create_fulltext_index(
            "pt_bad", "Doc", "text", analyzer="french"
        )
