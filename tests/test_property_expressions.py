"""Property-based differential testing: random expression trees are
rendered simultaneously to Cypher (run on Spark through the engine) and to
SQL (run on DuckDB), and results must match under the tolerant comparator.

This fuzzes the expression compiler's coercion semantics (int division,
string +, pow, CASE, 3VL logic) far beyond the hand-written catalog."""

from __future__ import annotations

# fuzz budget scales with SPARK_GRAFT_FUZZ_SCALE (default 1) — CI runs the
# cheap default; an extended hunt runs e.g. SPARK_GRAFT_FUZZ_SCALE=20
import os as _os

_FUZZ_SCALE = int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from opencyphertranspiler_spark.testing import assert_frames_match

from .conftest import SF_DIR

# each generated node renders to (cypher_text, duckdb_text, kind)
# kind: 'int' | 'float' | 'str' | 'bool'


@st.composite
def int_expr(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        choice = draw(st.integers(0, 2))
        if choice == 0:
            n = draw(st.integers(-99, 99))
            return (str(n), str(n))
        if choice == 1:
            return ("n.n_nationkey", "n_nationkey")
        return ("size(n.n_name)", "length(n_name)")
    a_c, a_s = draw(int_expr(depth + 1))
    b_c, b_s = draw(int_expr(depth + 1))
    op = draw(st.sampled_from(["+", "-", "*", "/", "%"]))
    if op == "/":
        # avoid division by zero: divide by a non-zero literal
        d = draw(st.integers(1, 9))
        return (f"({a_c}) / {d}", f"CAST(trunc(CAST(({a_s}) AS DOUBLE) / {d}) AS BIGINT)")
    if op == "%":
        d = draw(st.integers(1, 9))
        return (f"({a_c}) % {d}", f"({a_s}) % {d}")
    return (f"({a_c}) {op} ({b_c})", f"({a_s}) {op} ({b_s})")


@st.composite
def str_expr(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        choice = draw(st.integers(0, 2))
        if choice == 0:
            s = draw(st.text(alphabet="abcXY_0", min_size=0, max_size=5))
            return (f"'{s}'", f"'{s}'")
        if choice == 1:
            return ("n.n_name", "n_name")
        return ("toUpper(n.n_name)", "upper(n_name)")
    choice = draw(st.integers(0, 2))
    a_c, a_s = draw(str_expr(depth + 1))
    if choice == 0:
        i_c, i_s = draw(int_expr(depth + 1))
        # Cypher string + int -> concat
        return (f"({a_c}) + toString({i_c})", f"({a_s}) || CAST(({i_s}) AS VARCHAR)")
    if choice == 1:
        n = draw(st.integers(1, 6))
        return (f"left({a_c}, {n})", f"left({a_s}, {n})")
    return (f"trim({a_c})", f"trim({a_s})")


@st.composite
def bool_expr(draw, depth=0):
    a_c, a_s = draw(int_expr(depth + 1))
    b_c, b_s = draw(int_expr(depth + 1))
    op = draw(st.sampled_from(["=", "<>", "<", "<=", ">", ">="]))
    base = (f"({a_c}) {op} ({b_c})", f"({a_s}) {op} ({b_s})")
    if depth < 1 and draw(st.booleans()):
        c_c, c_s = draw(bool_expr(depth + 1))
        lop = draw(st.sampled_from(["AND", "OR"]))
        return (f"({base[0]}) {lop} ({c_c})", f"({base[1]}) {lop} ({c_s})")
    return base


@st.composite
def any_expr(draw):
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return draw(int_expr())
    if kind == 1:
        return draw(str_expr())
    if kind == 2:
        c, s = draw(bool_expr())
        # boolean as a value column
        return (f"CASE WHEN {c} THEN 1 ELSE 0 END", f"CASE WHEN {s} THEN 1 ELSE 0 END")
    wc, ws = draw(bool_expr())
    tc, ts = draw(int_expr())
    ec, es = draw(int_expr())
    return (
        f"CASE WHEN {wc} THEN {tc} ELSE {ec} END",
        f"CASE WHEN {ws} THEN {ts} ELSE {es} END",
    )


@pytest.fixture(scope="module")
def fuzz_env(spark, duck):
    from opencyphertranspiler_spark.catalog import get_engine

    return get_engine(spark, SF_DIR), duck


@settings(
    max_examples=30 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(exprs=st.lists(any_expr(), min_size=1, max_size=3))
def test_random_expressions_match_duckdb(fuzz_env, exprs):
    engine, duck = fuzz_env
    cy_items = ", ".join(f"{c} AS v{i}" for i, (c, _) in enumerate(exprs))
    sql_items = ", ".join(f"{s} AS v{i}" for i, (_, s) in enumerate(exprs))
    actual = engine.cypher(f"MATCH (n:Nation) RETURN {cy_items}").toPandas()
    expected = duck.sql(f"SELECT {sql_items} FROM nation").df()
    assert_frames_match(actual, expected)


@settings(
    max_examples=20 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    e=int_expr(),
    with_nulls=st.booleans(),
    desc=st.booleans(),
    k=st.integers(1, 12),
)
def test_order_by_null_ordering_matches_duckdb(fuzz_env, e, with_nulls, desc, k):
    """Sorted prefixes agree with DuckDB under openCypher null ordering
    (nulls last ascending / first descending) — n_nationkey tiebreak makes
    the prefix deterministic."""
    engine, duck = fuzz_env
    c, s = e
    if with_nulls:
        c = f"CASE WHEN n.n_nationkey % 3 = 0 THEN null ELSE {c} END"
        s = f"CASE WHEN n_nationkey % 3 = 0 THEN null ELSE {s} END"
    d = "DESC" if desc else ""
    nulls = "NULLS FIRST" if desc else "NULLS LAST"
    actual = [
        r.v
        for r in engine.cypher(
            f"MATCH (n:Nation) RETURN {c} AS v "
            f"ORDER BY v {d}, n.n_nationkey LIMIT {k}"
        ).collect()
    ]
    expected = [
        r[0]
        for r in duck.sql(
            f"SELECT {s} AS v FROM nation "
            f"ORDER BY v {d} {nulls}, n_nationkey LIMIT {k}"
        ).fetchall()
    ]
    assert actual == expected


# ---------------------------------------------------------------------------
# Round-4 extensions: lists, comprehensions, quantifiers — fuzzed vs DuckDB
# ---------------------------------------------------------------------------


@st.composite
def list_expr(draw, depth=0):
    """Null-free array<long> expression as (cypher, duckdb) text."""
    choice = draw(st.integers(0, 1)) if depth >= 1 else draw(st.integers(0, 3))
    if choice == 0:
        items = draw(st.lists(st.integers(-9, 9), min_size=0, max_size=4))
        inner = ", ".join(map(str, items))
        return (f"[{inner}]", f"[{inner}]")
    if choice == 1:
        a = draw(st.integers(-3, 3))
        b = draw(st.integers(-3, 6))
        # Cypher range is stop-INCLUSIVE (and [] when empty); DuckDB's is
        # stop-exclusive and [] when empty — shift the bound
        return (f"range({a}, {b})", f"range({a}, {b} + 1)")
    if choice == 2:
        lc, ls = draw(list_expr(depth + 1))
        a = draw(st.integers(0, 3))
        b = draw(st.integers(0, 5))
        # Cypher slice: 0-based end-exclusive; DuckDB: 1-based inclusive
        return (f"({lc})[{a}..{b}]", f"({ls})[{a + 1}:{b}]")
    lc, ls = draw(list_expr(depth + 1))
    m = draw(st.integers(1, 4))
    return (
        f"[x IN {lc} WHERE x % {m} = 0 | x * 2]",
        f"list_transform(list_filter({ls}, x -> x % {m} = 0), x -> x * 2)",
    )


@st.composite
def list_scalar_expr(draw):
    """Scalar (int) derived from a list, as (cypher, duckdb) text."""
    lc, ls = draw(list_expr())
    choice = draw(st.integers(0, 4))
    if choice == 0:
        return (f"size({lc})", f"len({ls})")
    if choice == 1:
        i = draw(st.integers(-2, 5))
        d = i + 1 if i >= 0 else i  # 0-based vs 1-based; negatives align
        return (f"({lc})[{i}]", f"({ls})[{d}]")
    if choice == 2:
        return (f"head({lc})", f"({ls})[1]")
    m = draw(st.integers(1, 4))
    kind = draw(st.sampled_from(["all", "any", "none", "single"]))
    preds = {
        "all": (
            f"all(x IN {lc} WHERE x % {m} = 0)",
            f"len(list_filter({ls}, x -> x % {m} <> 0)) = 0",
        ),
        "any": (
            f"any(x IN {lc} WHERE x % {m} = 0)",
            f"len(list_filter({ls}, x -> x % {m} = 0)) > 0",
        ),
        "none": (
            f"none(x IN {lc} WHERE x % {m} = 0)",
            f"len(list_filter({ls}, x -> x % {m} = 0)) = 0",
        ),
        "single": (
            f"single(x IN {lc} WHERE x % {m} = 0)",
            f"len(list_filter({ls}, x -> x % {m} = 0)) = 1",
        ),
    }
    c, s = preds[kind]
    return (f"CASE WHEN {c} THEN 1 ELSE 0 END", f"CASE WHEN {s} THEN 1 ELSE 0 END")


@settings(
    max_examples=40 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(exprs=st.lists(st.one_of(list_expr(), list_scalar_expr()), min_size=1, max_size=3))
def test_random_list_expressions_match_duckdb(fuzz_env, exprs):
    engine, duck = fuzz_env
    cy_items = ", ".join(f"{c} AS v{i}" for i, (c, _) in enumerate(exprs))
    sql_items = ", ".join(f"{s} AS v{i}" for i, (_, s) in enumerate(exprs))
    actual = engine.cypher(
        f"MATCH (n:Nation) WHERE n.n_nationkey = 0 RETURN {cy_items}"
    ).toPandas()
    expected = duck.sql(
        f"SELECT {sql_items} FROM nation WHERE n_nationkey = 0"
    ).df()
    assert_frames_match(actual, expected)
