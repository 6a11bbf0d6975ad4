"""The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3), 1980 — public algorithm) in two rule-identical
forms:

- :func:`porter_stem_py` — driver-side python, used on fulltext QUERY
  tokens (the reference point for the rule tables; mirrors the classic
  C implementation's behavior for the published paper examples).
- :func:`porter_stem_col` — a pure Spark Column expression (no Python in
  the plan), used INDEX-side inside the analyzer
  (``analyzer='english'``) so tokenization stays JVM-side and
  whole-stage-codegen'd at any corpus size.

Both implement the ORIGINAL paper's rule tables (steps 1a-5b, longest-
matching suffix per step, measure/vowel/double-consonant/cvc conditions,
words of length <= 2 unchanged). The later "official" revisions
(e.g. ``logi -> log``) are deliberately NOT included — the paper is the
spec, and the two implementations must stay rule-identical
(tests/test_porter.py runs the paper's example vocabulary against BOTH
and differentially fuzzes column == python).

Letter classes: a consonant is a letter other than a, e, i, o, u and
other than y preceded by a consonant (so y at word start or after a
vowel is a consonant; after a consonant it is a vowel). The measure m
counts VC sequences in the [C](VC)^m[V] form of a word. Digits and any
other non-letters count as consonants (the analyzer lowercases and
strips everything else, but tokens may carry digits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

_VOWELS = "aeiou"


# ---------------------------------------------------------------------------
# python form (query-side mirror)
# ---------------------------------------------------------------------------


def _classes(word: str) -> str:
    """Per-character consonant/vowel string ('c'/'v'), resolving y."""
    out = []
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            out.append("v")
        elif ch == "y":
            # y preceded by a consonant is a VOWEL; at word start or
            # after a vowel it is a consonant (the paper's definition)
            out.append("v" if i > 0 and out[i - 1] == "c" else "c")
        else:
            out.append("c")
    return "".join(out)


def _measure(stem: str) -> int:
    cv = _classes(stem)
    # collapse runs, count VC pairs
    coll = []
    for c in cv:
        if not coll or coll[-1] != c:
            coll.append(c)
    return "".join(coll).count("vc")


def _has_vowel(stem: str) -> bool:
    return "v" in _classes(stem)


def _ends_double_consonant(stem: str) -> bool:
    return (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and _classes(stem)[-1] == "c"
    )


def _ends_cvc(stem: str) -> bool:
    if len(stem) < 3:
        return False
    cv = _classes(stem)
    return cv[-3:] == "cvc" and stem[-1] not in "wxy"


def _rule(word: str, rules) -> str:
    """Apply the longest-matching suffix rule of one step: rules is a
    list of (suffix, replacement, condition-or-None); the FIRST (i.e.
    longest) matching suffix decides — if its condition fails, the step
    leaves the word unchanged (Porter's 'longest match' contract)."""
    for suf, rep, cond in rules:
        if word.endswith(suf):
            stem = word[: len(word) - len(suf)]
            if cond is None or cond(stem):
                return stem + rep
            return word
    return word


def porter_stem_py(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    w = _rule(
        w,
        [
            ("sses", "ss", None),
            ("ies", "i", None),
            ("ss", "ss", None),
            ("s", "", None),
        ],
    )
    # step 1b
    fired = False
    if w.endswith("eed"):
        stem = w[:-3]
        if _measure(stem) > 0:
            w = stem + "ee"
    elif w.endswith("ed"):
        stem = w[:-2]
        if _has_vowel(stem):
            w = stem
            fired = True
    elif w.endswith("ing"):
        stem = w[:-3]
        if _has_vowel(stem):
            w = stem
            fired = True
    if fired:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_consonant(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2 (all conditions m > 0)
    m0 = lambda s: _measure(s) > 0  # noqa: E731
    w = _rule(
        w,
        [
            ("ational", "ate", m0),
            ("tional", "tion", m0),
            ("enci", "ence", m0),
            ("anci", "ance", m0),
            ("izer", "ize", m0),
            ("abli", "able", m0),
            ("alli", "al", m0),
            ("entli", "ent", m0),
            ("eli", "e", m0),
            ("ousli", "ous", m0),
            ("ization", "ize", m0),
            ("ation", "ate", m0),
            ("ator", "ate", m0),
            ("alism", "al", m0),
            ("iveness", "ive", m0),
            ("fulness", "ful", m0),
            ("ousness", "ous", m0),
            ("aliti", "al", m0),
            ("iviti", "ive", m0),
            ("biliti", "ble", m0),
        ],
    )
    # step 3 (all conditions m > 0)
    w = _rule(
        w,
        [
            ("icate", "ic", m0),
            ("ative", "", m0),
            ("alize", "al", m0),
            ("iciti", "ic", m0),
            ("ical", "ic", m0),
            ("ful", "", m0),
            ("ness", "", m0),
        ],
    )
    # step 4 (m > 1; ion additionally needs *S or *T)
    m1 = lambda s: _measure(s) > 1  # noqa: E731
    w = _rule(
        w,
        [
            ("ement", "", m1),
            ("ance", "", m1),
            ("ence", "", m1),
            ("able", "", m1),
            ("ible", "", m1),
            ("ment", "", m1),
            ("ion", "", lambda s: m1(s) and s[-1:] in ("s", "t")),
            ("ism", "", m1),
            ("ate", "", m1),
            ("iti", "", m1),
            ("ous", "", m1),
            ("ive", "", m1),
            ("ize", "", m1),
            ("al", "", m1),
            ("er", "", m1),
            ("ic", "", m1),
            ("ant", "", m1),
            ("ent", "", m1),
            ("ou", "", m1),
        ],
    )
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Column form (index-side, pure JVM expression)
# ---------------------------------------------------------------------------

# Rule tables MUST stay ordered by suffix length within a step so the
# when-chain picks the longest match (matching _rule's contract). Step 4
# lists e.g. 'ement' before 'ment' before 'ent' for the same reason.
_STEP2 = [
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("tional", "tion"),
    ("biliti", "ble"), ("entli", "ent"), ("ousli", "ous"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("iviti", "ive"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("ator", "ate"), ("eli", "e"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ion", "ism",
    "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ant", "ent",
    "ou",
]


def _cv_col(t):
    """Per-character 'c'/'v' class string: vowels -> v, everything else
    (consonants, digits) -> c, then y resolved iteratively (y after a
    consonant is a vowel). Six passes resolve runs of up to ~6
    consecutive y's — beyond that (no English word) classification of
    the run's tail may be off; both forms would have to disagree on such
    a token for it to matter, and the python mirror is exact."""
    # consonants (incl. digits — and crucially the LETTER 'v', which
    # must not collide with the class marker) first, then vowels
    s = F.regexp_replace(t, "[^aeiouy]", "c")
    s = F.regexp_replace(s, "[aeiou]", "v")
    for _ in range(6):
        s = F.regexp_replace(s, "^y", "c")
        s = F.regexp_replace(s, "vy", "vc")
        s = F.regexp_replace(s, "cy", "cv")
    return s


def _m_col(cv):
    """Measure from a per-character class string: collapse runs, count
    'vc' pairs (each removal shortens by 2)."""
    coll = F.regexp_replace(F.regexp_replace(cv, "v+", "v"), "c+", "c")
    return (
        F.length(coll) - F.length(F.regexp_replace(coll, "vc", ""))
    ) / F.lit(2)


def _endswith(t, suf: str):
    return F.substring(t, -len(suf), len(suf)) == F.lit(suf)


def _strip(t, n: int):
    return t.substr(F.lit(1), F.greatest(F.length(t) - F.lit(n), F.lit(0)))


def _has_vowel_col(cv):
    return cv.contains("v")


def _ends_double_col(t, cv):
    return (
        (F.length(t) >= 2)
        & (F.substring(t, -1, 1) == F.substring(t, -2, 1))
        & (F.substring(cv, -1, 1) == F.lit("c"))
    )


def _ends_cvc_col(t, cv):
    return (
        (F.length(t) >= 3)
        & (F.substring(cv, -3, 3) == F.lit("cvc"))
        & ~F.substring(t, -1, 1).isin("w", "x", "y")
    )


def _rules_prepare(rules):
    """First half of a rules step: token -> struct(w, stem, m) where
    ``stem`` is the candidate for the LONGEST matching suffix (the
    rules are length-ordered) and ``m`` its measure. Everything is
    computed over the transform's LEAF lambda variable, so the tree
    stays small (see porter_steps on why that matters in Spark 4)."""

    def prep(t):
        stem = t
        for r in reversed(rules):
            suf = r[0] if isinstance(r, tuple) else r
            stem = F.when(_endswith(t, suf), _strip(t, len(suf))).otherwise(
                stem
            )
        return F.struct(
            t.alias("w"),
            stem.alias("stem"),
            _m_col(_cv_col(stem)).alias("m"),
        )

    return prep


def _rules_apply(rules, cond_kind: str):
    """Second half: struct(w, stem, m) -> stemmed word. The first
    (longest) matching suffix decides; a failed measure condition
    leaves the word unchanged (Porter's longest-match contract). All
    inputs are leaf FIELD references on the struct lambda variable."""

    def appl(s):
        w, stem, m = s["w"], s["stem"], s["m"]
        ok = (m > 0) if cond_kind == "m0" else (m > 1)
        out = None
        for r in rules:
            if isinstance(r, tuple):
                suf, rep = r
            else:
                suf, rep = r, ""
            cond = ok
            if suf == "ion" and cond_kind == "m1":
                cond = cond & F.substring(stem, -1, 1).isin("s", "t")
            val = F.when(cond, F.concat(stem, F.lit(rep))).otherwise(w)
            if out is None:
                out = F.when(_endswith(w, suf), val)
            else:
                out = out.when(_endswith(w, suf), val)
        return out.otherwise(w)

    return appl


def _col_step1a(t):
    return (
        F.when(_endswith(t, "sses"), F.concat(_strip(t, 4), F.lit("ss")))
        .when(_endswith(t, "ies"), F.concat(_strip(t, 3), F.lit("i")))
        .when(_endswith(t, "ss"), t)
        .when(_endswith(t, "s"), _strip(t, 1))
        .otherwise(t)
    )


def _col_step1b_strip(w):
    """Step 1b first half: token -> struct(w1, fired) — eed/ed/ing
    stripping plus whether the *v*-conditioned ed/ing rule fired (the
    at/bl/iz-etc fixups in the second half apply only then)."""
    stem_eed = _strip(w, 3)
    stem_ed = _strip(w, 2)
    stem_ing = _strip(w, 3)
    is_eed = _endswith(w, "eed")
    fired_ed = (
        ~is_eed & _endswith(w, "ed") & _has_vowel_col(_cv_col(stem_ed))
    )
    fired_ing = _endswith(w, "ing") & _has_vowel_col(_cv_col(stem_ing))
    w1 = (
        F.when(
            is_eed,
            F.when(
                _m_col(_cv_col(stem_eed)) > 0,
                F.concat(stem_eed, F.lit("ee")),
            ).otherwise(w),
        )
        .when(fired_ed, stem_ed)
        .when(fired_ing, stem_ing)
        .otherwise(w)
    )
    return F.struct(
        w1.alias("w1"), (fired_ed | fired_ing).alias("fired")
    )


def _col_step1b_fixup(s):
    w1 = s["w1"]
    cv1 = _cv_col(w1)
    return F.when(
        s["fired"],
        F.when(
            _endswith(w1, "at") | _endswith(w1, "bl") | _endswith(w1, "iz"),
            F.concat(w1, F.lit("e")),
        )
        .when(
            _ends_double_col(w1, cv1)
            & ~F.substring(w1, -1, 1).isin("l", "s", "z"),
            _strip(w1, 1),
        )
        .when(
            (_m_col(cv1) == 1) & _ends_cvc_col(w1, cv1),
            F.concat(w1, F.lit("e")),
        )
        .otherwise(w1),
    ).otherwise(w1)


def _col_step1c(w):
    return F.when(
        _endswith(w, "y") & _has_vowel_col(_cv_col(_strip(w, 1))),
        F.concat(_strip(w, 1), F.lit("i")),
    ).otherwise(w)


def _col_step5a(w):
    stem_e = _strip(w, 1)
    cve = _cv_col(stem_e)
    me = _m_col(cve)
    return F.when(
        _endswith(w, "e")
        & ((me > 1) | ((me == 1) & ~_ends_cvc_col(stem_e, cve))),
        stem_e,
    ).otherwise(w)


def _col_step5b(w):
    cvw = _cv_col(w)
    return F.when(
        (_m_col(cvw) > 1)
        & _ends_double_col(w, cvw)
        & _endswith(w, "l"),
        _strip(w, 1),
    ).otherwise(w)


def porter_steps() -> list:
    """The eight Porter steps as single-Column functions, to be applied
    ONE ``F.transform`` each over a token array. Splitting per step
    keeps every lambda's expression tree bounded: inside a transform the
    input is a LEAF lambda variable, while composing all steps into one
    scalar expression would blow up exponentially when Spark 4's column
    normalization expands the shared step-(k-1) subtree at every one of
    step k's ~30 references to it (observed: OOM at plan build). The
    length-<=-2 guard is NOT part of the steps — it compares against the
    ORIGINAL token (zip_with in the analyzer / porter_stem_col)."""
    return [
        _col_step1a,
        _col_step1b_strip,
        _col_step1b_fixup,
        _col_step1c,
        _rules_prepare(_STEP2),
        _rules_apply(_STEP2, "m0"),
        _rules_prepare(_STEP3),
        _rules_apply(_STEP3, "m0"),
        _rules_prepare(_STEP4),
        _rules_apply(_STEP4, "m1"),
        _col_step5a,
        _col_step5b,
    ]


def porter_stem_array_col(toks):
    """Porter-stem every element of a token ARRAY column — the analyzer
    surface (engine._ft_tokens, ``analyzer='english'``): one
    ``F.transform`` per step, then the original-length guard via
    ``zip_with`` (words of length <= 2 are never stemmed)."""
    stemmed = toks
    for step in porter_steps():
        stemmed = F.transform(stemmed, step)
    return F.zip_with(
        toks,
        stemmed,
        lambda o, s: F.when(F.length(o) <= 2, o).otherwise(s),
    )


def porter_stem_col(t):
    """Porter stem of a single (already lowercased, alnum-only) token
    Column — rule-identical to :func:`porter_stem_py`. Routed through a
    one-element array so each step stays its own transform lambda (see
    :func:`porter_steps` for why)."""
    return F.element_at(porter_stem_array_col(F.array(t)), 1)
