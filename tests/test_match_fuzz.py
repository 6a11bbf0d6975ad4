"""Differential fuzz for the MATCH join fabric: random sub-paths of the
TPC-H graph overlay — random hop orientations (forward vs arrow-reversed
spelling), comma-separated pattern parts, an optional LEFT-forked tail
with its WHERE inside the fork, and plain-vs-aggregated projections —
run through the engine AND as hand-built DuckDB joins over the same
parquet.

This fuzzes the planner's direction resolution, alias sharing across
comma patterns, the OPTIONAL MATCH fork, and implicit grouping beyond
the hand-written catalog shapes. Bounded examples keep the suite cheap."""

from __future__ import annotations

# fuzz budget scales with SPARK_GRAFT_FUZZ_SCALE (default 1) — CI runs the
# cheap default; an extended hunt runs e.g. SPARK_GRAFT_FUZZ_SCALE=20
import os as _os

_FUZZ_SCALE = int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from opencyphertranspiler_spark.testing import arrow_df, assert_frames_match

from .conftest import SF_DIR

# (source label, verb, sink label) chains through the overlay
CHAINS = [
    [
        ("Customer", "PLACED", "Orders"),
        ("Orders", "CONTAINS", "Lineitem"),
        ("Lineitem", "OF_PART", "Part"),
    ],
    [
        ("Customer", "FROM_NATION", "Nation"),
        ("Nation", "IN_REGION", "Region"),
    ],
    [
        ("Lineitem", "FROM_SUPPLIER", "Supplier"),
        ("Supplier", "FROM_NATION", "Nation"),
        ("Nation", "IN_REGION", "Region"),
    ],
]

TABLE = {
    "Customer": "customer",
    "Orders": "orders",
    "Lineitem": "lineitem",
    "Part": "part",
    "Nation": "nation",
    "Region": "region",
    "Supplier": "supplier",
}

# FK equality per hop: left_alias.<l> = right_alias.<r>
JOIN_COLS = {
    ("Customer", "PLACED", "Orders"): ("c_custkey", "o_custkey"),
    ("Orders", "CONTAINS", "Lineitem"): ("o_orderkey", "l_orderkey"),
    ("Lineitem", "OF_PART", "Part"): ("l_partkey", "p_partkey"),
    ("Lineitem", "FROM_SUPPLIER", "Supplier"): ("l_suppkey", "s_suppkey"),
    ("Customer", "FROM_NATION", "Nation"): ("c_nationkey", "n_nationkey"),
    ("Supplier", "FROM_NATION", "Nation"): ("s_nationkey", "n_nationkey"),
    ("Nation", "IN_REGION", "Region"): ("n_regionkey", "r_regionkey"),
}

# one representative projection column and one filter per label;
# cypher text uses {a} for the alias, sql text uses the same alias
PROJ = {
    "Customer": "c_name",
    "Orders": "o_orderkey",
    "Lineitem": "l_linenumber",
    "Part": "p_brand",
    "Nation": "n_name",
    "Region": "r_name",
    "Supplier": "s_name",
}

FILTERS = {
    "Customer": ("{a}.c_acctbal > 5000", "{a}.c_acctbal > 5000"),
    "Orders": ("{a}.o_totalprice > 150000", "{a}.o_totalprice > 150000"),
    "Lineitem": ("{a}.l_quantity >= 40", "{a}.l_quantity >= 40"),
    "Part": ("{a}.p_retailprice > 1500", "{a}.p_retailprice > 1500"),
    "Nation": ("{a}.n_nationkey % 2 = 0", "{a}.n_nationkey % 2 = 0"),
    "Region": ("{a}.r_regionkey >= 2", "{a}.r_regionkey >= 2"),
    "Supplier": ("{a}.s_acctbal > 1000", "{a}.s_acctbal > 1000"),
}


@st.composite
def match_case(draw):
    chain = draw(st.sampled_from(CHAINS))
    start = draw(st.integers(0, len(chain) - 1))
    length = draw(st.integers(1, len(chain) - start))
    hops = chain[start : start + length]

    labels = [hops[0][0]] + [h[2] for h in hops]
    aliases = [f"x{i}" for i in range(len(labels))]

    # cypher: comma-separated hop patterns, each randomly arrow-reversed;
    # a label annotates only the first occurrence of each alias
    seen: set[str] = set()

    def node(i: int) -> str:
        a = aliases[i]
        if a in seen:
            return f"({a})"
        seen.add(a)
        return f"({a}:{labels[i]})"

    optional_tail = length >= 2 and draw(st.booleans())
    n_inner = length - 1 if optional_tail else length

    parts = []
    for i, h in enumerate(hops[:n_inner]):
        # round 8: occasionally spell a hop as *0..1 / *1..1 — every
        # overlay hop is cross-label, so the zero-length variant is
        # statically empty (the planner must DROP it, not fail binding
        # when a continuation hop rewires onto the merged endpoint) and
        # the SQL oracle stays the plain 1-hop join either way
        star = draw(st.sampled_from(["", "", "", "*0..1", "*1..1"]))
        # the equivalent GQL postfix spelling fuzzes the same machinery
        post = ""
        if star and draw(st.booleans()):
            post = {"*0..1": "{,1}", "*1..1": "{1}"}[star]
            star = ""
        if draw(st.booleans()):
            parts.append(f"{node(i)}-[:{h[1]}{star}]->{post}{node(i + 1)}")
        else:
            parts.append(f"{node(i + 1)}<-[:{h[1]}{star}]-{post}{node(i)}")
    first_filter = draw(st.booleans())
    # the first endpoint's filter randomly takes the trailing-WHERE or
    # the inline `(n:L WHERE pred)` spelling (round 7) — identical
    # desugar, so the oracle is unchanged either way
    inline_first = first_filter and draw(st.booleans())
    if inline_first:
        pred = FILTERS[labels[0]][0].format(a=aliases[0])
        parts = [
            p.replace(
                f"({aliases[0]}:{labels[0]})",
                f"({aliases[0]}:{labels[0]} WHERE {pred})",
                1,
            )
            for p in parts
        ]
    cy = "MATCH " + ", ".join(parts)
    if first_filter and not inline_first:
        cy += "\nWHERE " + FILTERS[labels[0]][0].format(a=aliases[0])

    # SQL: inner joins over the same FK chain
    sql_from = f"FROM {TABLE[labels[0]]} {aliases[0]}"
    for i, h in enumerate(hops[:n_inner]):
        l, r = JOIN_COLS[h]
        sql_from += (
            f"\nJOIN {TABLE[labels[i + 1]]} {aliases[i + 1]} "
            f"ON {aliases[i]}.{l} = {aliases[i + 1]}.{r}"
        )
    sql_where = (
        "\nWHERE " + FILTERS[labels[0]][1].format(a=aliases[0])
        if first_filter
        else ""
    )

    if optional_tail:
        h = hops[-1]
        i = n_inner
        tail_filter = draw(st.booleans())
        tail = f"({aliases[i]})-[:{h[1]}]->{node(i + 1)}"
        cy += f"\nOPTIONAL MATCH {tail}"
        l, r = JOIN_COLS[h]
        on = f"{aliases[i]}.{l} = {aliases[i + 1]}.{r}"
        if tail_filter:
            cy += "\nWHERE " + FILTERS[labels[i + 1]][0].format(
                a=aliases[i + 1]
            )
            on += " AND " + FILTERS[labels[i + 1]][1].format(a=aliases[i + 1])
        sql_from += (
            f"\nLEFT JOIN {TABLE[labels[i + 1]]} {aliases[i + 1]} ON {on}"
        )

    first_col = f"{aliases[0]}.{PROJ[labels[0]]}"
    last_col = f"{aliases[-1]}.{PROJ[labels[-1]]}"
    if draw(st.booleans()) and last_col != first_col:
        # implicit grouping: one grouping key + count(*)
        cy += f"\nRETURN {first_col} AS k, count(*) AS n"
        sql = (
            f"SELECT {first_col} AS k, count(*) AS n\n"
            + sql_from
            + sql_where
            + f"\nGROUP BY {first_col}"
        )
    else:
        cols = f"{first_col} AS k1"
        sel = f"{first_col} AS k1"
        if last_col != first_col:
            cols += f", {last_col} AS k2"
            sel += f", {last_col} AS k2"
        cy += f"\nRETURN DISTINCT {cols}"
        sql = f"SELECT DISTINCT {sel}\n" + sql_from + sql_where
    return cy, sql


@pytest.fixture(scope="module")
def fuzz_duck():
    from opencyphertranspiler_spark.testing import duckdb_connection

    return duckdb_connection(SF_DIR)


@settings(
    max_examples=12 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=match_case())
def test_match_fabric_vs_duckdb(engine, fuzz_duck, case):
    cy, sql = case
    actual = engine.cypher(cy).toPandas()
    expected = fuzz_duck.sql(sql).df()
    assert_frames_match(actual, expected)


@st.composite
def rebound_label_case(draw):
    """Round 12 (ADVICE r11): a LATER clause re-uses a bound alias WITH
    a label — same label is a no-op, a different label is a per-row
    predicate (empty branch), and under OPTIONAL MATCH the predicate
    stays inside the fork (rows survive with nulls)."""
    chain = draw(st.sampled_from([c for c in CHAINS if len(c) >= 2]))
    start = draw(st.integers(0, len(chain) - 2))
    length = draw(st.integers(1, len(chain) - 1 - start))
    hops = chain[start : start + length]
    nxt = chain[start + length]
    labels = [hops[0][0]] + [h[2] for h in hops]
    aliases = [f"x{i}" for i in range(len(labels))]
    pat = f"({aliases[0]}:{labels[0]})" + "".join(
        f"-[:{h[1]}]->({aliases[i + 1]}:{labels[i + 1]})"
        for i, h in enumerate(hops)
    )
    cy = "MATCH " + pat
    sql_from = f"FROM {TABLE[labels[0]]} {aliases[0]}"
    for i, h in enumerate(hops):
        l, r = JOIN_COLS[h]
        sql_from += (
            f"\nJOIN {TABLE[labels[i + 1]]} {aliases[i + 1]} "
            f"ON {aliases[i]}.{l} = {aliases[i + 1]}.{r}"
        )

    true_label = labels[-1]
    same = draw(st.booleans())
    wrong = draw(
        st.sampled_from(sorted(l for l in TABLE if l != true_label))
    )
    relabel = true_label if same else wrong
    optional = draw(st.booleans())
    xa, ta = aliases[-1], "t0"
    l, r = JOIN_COLS[nxt]
    k = f"{aliases[0]}.{PROJ[labels[0]]}"
    if optional:
        cy += (
            f"\nOPTIONAL MATCH ({xa}:{relabel})-[:{nxt[1]}]->"
            f"({ta}:{nxt[2]})"
        )
        cy += f"\nRETURN {k} AS k, count({ta}) AS m, count(*) AS n"
        on = f"{xa}.{l} = {ta}.{r}" + ("" if same else " AND FALSE")
        sql_from += f"\nLEFT JOIN {TABLE[nxt[2]]} {ta} ON {on}"
        sql = (
            f"SELECT {k} AS k, count({ta}.{r}) AS m, count(*) AS n\n"
            + sql_from
            + "\nGROUP BY 1"
        )
    else:
        cy += f"\nMATCH ({xa}:{relabel})-[:{nxt[1]}]->({ta}:{nxt[2]})"
        cy += f"\nRETURN {k} AS k, count(*) AS n"
        sql_from += (
            f"\nJOIN {TABLE[nxt[2]]} {ta} ON {xa}.{l} = {ta}.{r}"
        )
        sql = (
            f"SELECT {k} AS k, count(*) AS n\n"
            + sql_from
            + ("" if same else "\nWHERE FALSE")
            + "\nGROUP BY 1"
        )
    return cy, sql


@settings(
    max_examples=12 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=rebound_label_case())
def test_rebound_label_fabric_vs_duckdb(engine, fuzz_duck, case):
    cy, sql = case
    actual = engine.cypher(cy).toPandas()
    expected = fuzz_duck.sql(sql).df()
    assert_frames_match(actual, expected)


def test_optional_fork_over_duplicate_natural_keys_pinned(engine, fuzz_duck):
    """Round-7 fuzz catch, pinned deterministically (the hypothesis example
    database is gitignored, so replay must not depend on it).

    The driver's lineitem parquet has payload-distinct duplicate
    (l_orderkey, l_linenumber) pairs; the old arithmetic surrogate
    l_id = l_orderkey*10 + l_linenumber was therefore non-unique, and the
    OPTIONAL MATCH fork's re-join on the Lineitem node id fanned out k²
    rows per duplicated id (engine counted ~45% high on this query).
    Green iff the surrogate is genuinely unique (full-row md5,
    sources/tpch.py:lineitem_id_col)."""
    cy = """
        MATCH (x1:Orders)<-[:PLACED]-(x0:Customer),
              (x2:Lineitem)<-[:CONTAINS]-(x1)
        OPTIONAL MATCH (x2)-[:OF_PART]->(x3:Part)
        RETURN x0.c_name AS k, count(*) AS n
    """
    sql = """
        SELECT c.c_name AS k, count(*) AS n
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        LEFT JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY c.c_name
    """
    actual = engine.cypher(cy).toPandas()
    expected = fuzz_duck.sql(sql).df()
    assert_frames_match(actual, expected)


# -- round 10 (VERDICT r9 #8): random-graph row-per-path enumeration ----------
# Random small directed graphs — CYCLES ALLOWED, exercising the iterative
# relationship-unique expansion (engine._enumerate_rel_unique_paths) as well
# as the finite-depth bounded rewrite on DAG draws — compared against a
# DuckDB recursive CTE that carries the traversed rel set and forbids reuse.


@st.composite
def rel_unique_path_graph(draw):
    n = draw(st.integers(3, 6))
    nodes = [f"n{i}" for i in range(n)]
    pairs = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes))
    edges = draw(st.lists(pairs, min_size=2, max_size=8, unique=True))
    min_hops = draw(st.sampled_from([0, 1, 2]))
    undirected = draw(st.booleans())
    return nodes, edges, min_hops, undirected


@settings(
    max_examples=6 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=rel_unique_path_graph())
def test_row_per_path_fabric_vs_duckdb(spark, case):
    import duckdb

    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    nodes, edges, min_hops, undirected = case
    reg = TableRegistry()
    reg.register_df("n", arrow_df(spark, [(x,) for x in nodes], "id string"))
    reg.register_df("l", arrow_df(spark, edges, "src string, dst string"))
    g = GraphSchema(
        [NodeSchema("N", "n", "id", ())],
        [EdgeSchema("L", "N", "N", "l", "src", "dst")],
    )
    eng = CypherEngine(spark, g, reg)
    star = {0: "*0..", 1: "*", 2: "*2.."}[min_hops]
    arrow = "-" if undirected else "->"
    got = sorted(
        map(
            tuple,
            eng.cypher(
                f"MATCH p = (x:N)-[:L{star}]{arrow}(y:N) "
                "RETURN x.id AS x, y.id AS y, length(p) AS l, count(p) AS c"
            ).collect(),
        )
    )
    d = duckdb.connect()
    if undirected:
        # symmetrize; both orientations of one relationship share a rel id
        evals = ", ".join(
            f"('{s}','{t}','{s}>{t}'), ('{t}','{s}','{s}>{t}')"
            if s != t
            else f"('{s}','{t}','{s}>{t}')"
            for s, t in edges
        )
    else:
        evals = ", ".join(f"('{s}','{t}','{s}>{t}')" for s, t in edges)
    zero_union = (
        "UNION ALL SELECT id, id, 0 FROM (SELECT unnest(["
        + ", ".join(f"'{x}'" for x in nodes)
        + "]) AS id)"
        if min_hops == 0
        else ""
    )
    exp = sorted(
        map(
            tuple,
            d.sql(
                f"""
                WITH RECURSIVE e(s, d, rid) AS (SELECT * FROM (VALUES {evals})),
                paths(src, dst, len, rels) AS (
                    SELECT s, d, 1, [rid] FROM e
                    UNION ALL
                    SELECT p.src, e.d, p.len + 1, list_append(p.rels, e.rid)
                    FROM paths p JOIN e ON e.s = p.dst
                    WHERE NOT list_contains(p.rels, e.rid)
                ),
                all_paths(src, dst, len) AS (
                    SELECT src, dst, len FROM paths WHERE len >= {max(min_hops, 1)}
                    {zero_union}
                )
                SELECT src AS x, dst AS y, len AS l, count(*) AS c
                FROM all_paths GROUP BY 1, 2, 3
                """
            ).fetchall(),
        )
    )
    assert got == exp, f"edges={edges} min={min_hops} undirected={undirected}"


# -- round 11 (VERDICT r10 #3): disjunction-adjacent var-length fabric --------
# Random tri-label graphs; (u:A|B)-[:L*window]{arrow}(m:C) runs through the
# composite-id relationship-unique enumeration (engine._rewire_ml_enumerate)
# and is compared against a DuckDB recursive CTE over label-qualified node
# ids that carries the traversed rel set. Bounded windows are row-per-path;
# unbounded (no path variable) is the documented endpoint-pair model.


@st.composite
def ml_varlength_graph(draw):
    labels = {"A": 2, "B": 2, "C": 3}
    nodes = [(lbl, f"{lbl.lower()}{i}") for lbl, k in labels.items() for i in range(k)]
    pairs = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes))
    edges = draw(st.lists(pairs, min_size=2, max_size=10, unique=True))
    window = draw(st.sampled_from([(1, 2), (1, 3), (2, 3), (1, None), (2, None)]))
    undirected = draw(st.booleans())
    return nodes, edges, window, undirected


@settings(
    max_examples=6 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=ml_varlength_graph())
def test_ml_varlength_fabric_vs_duckdb(spark, case):
    import duckdb

    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    nodes, edges, (min_h, max_h), undirected = case
    reg = TableRegistry()
    for lbl in ("A", "B", "C"):
        reg.register_df(
            f"t{lbl}",
            arrow_df(spark, 
                [(nid,) for l2, nid in nodes if l2 == lbl], "id string"
            ),
        )
    # one edge table per (src label, dst label) pair, all verb L
    by_pair: dict[tuple, list] = {}
    for (sl, s), (dl, d) in edges:
        by_pair.setdefault((sl, dl), []).append((s, d))
    schemas = []
    for (sl, dl), rows in sorted(by_pair.items()):
        tname = f"e{sl}{dl}"
        reg.register_df(
            tname, arrow_df(spark, rows, "src string, dst string")
        )
        schemas.append(EdgeSchema("L", sl, dl, tname, "src", "dst"))
    g = GraphSchema(
        [
            NodeSchema("A", "tA", "id", ()),
            NodeSchema("B", "tB", "id", ()),
            NodeSchema("C", "tC", "id", ()),
        ],
        schemas,
    )
    eng = CypherEngine(spark, g, reg)
    star = f"*{min_h}..{max_h}" if max_h is not None else (
        "*" if min_h == 1 else f"*{min_h}.."
    )
    arrow = "-" if undirected else "->"
    from opencyphertranspiler_spark.exceptions import (
        TranspilerBindingError,
        TranspilerNotSupportedError,
    )

    try:
        got = sorted(
            map(
                tuple,
                eng.cypher(
                    f"MATCH (u:A|B)-[:L{star}]{arrow}(m:C) "
                    "RETURN u.id AS u, m.id AS m"
                ).collect(),
            )
        )
    except (TranspilerBindingError, TranspilerNotSupportedError):
        # statically unreachable C / no member-side edge: typed, fine
        return
    d = duckdb.connect()
    comp = lambda lbl, nid: f"{lbl}:{nid}"  # noqa: E731
    if undirected:
        evals = ", ".join(
            f"('{comp(sl, s)}','{comp(dl, t)}','{i}'), "
            f"('{comp(dl, t)}','{comp(sl, s)}','{i}')"
            if (sl, s) != (dl, t)
            else f"('{comp(sl, s)}','{comp(dl, t)}','{i}')"
            for i, ((sl, s), (dl, t)) in enumerate(edges)
        )
    else:
        evals = ", ".join(
            f"('{comp(sl, s)}','{comp(dl, t)}','{i}')"
            for i, ((sl, s), (dl, t)) in enumerate(edges)
        )
    pair_model = max_h is None
    sel = (
        "SELECT DISTINCT src, dst FROM hits"
        if pair_model
        else "SELECT src, dst FROM hits"
    )
    exp = sorted(
        map(
            tuple,
            d.sql(
                f"""
                WITH RECURSIVE e(s, d, rid) AS (SELECT * FROM (VALUES {evals})),
                paths(src, dst, len, rels) AS (
                    SELECT s, d, 1, [rid] FROM e
                    WHERE s LIKE 'A:%' OR s LIKE 'B:%'
                    UNION ALL
                    SELECT p.src, e.d, p.len + 1, list_append(p.rels, e.rid)
                    FROM paths p JOIN e ON e.s = p.dst
                    WHERE NOT list_contains(p.rels, e.rid)
                ),
                hits(src, dst) AS (
                    SELECT substring(src, 3), substring(dst, 3) FROM paths
                    WHERE dst LIKE 'C:%' AND len >= {min_h}
                      {'' if max_h is None else f'AND len <= {max_h}'}
                )
                {sel}
                """
            ).fetchall(),
        )
    )
    assert got == exp, (
        f"edges={edges} window=({min_h},{max_h}) undirected={undirected}"
    )
