"""Var-length hops whose verb set chains across HETEROGENEOUS labels
(round-11 continuation): ``(o:Orders)-[:CONTAINS|OF_PART*]->(p:Part)``
has no single (source, sink) label pair for the union-edge model, so
``_resolve_hetero_varlength`` lowers it through relationship-unique path
enumeration over label-qualified composite ids
(engine.py:_rewire_ml_enumerate with a single-member label set). Neo4j
places no label-chaining restriction on var-length type alternation.

DuckDB differentials on the TPC-H overlay at sf0.001: every O->P
connection is exactly O -CONTAINS-> L -OF_PART-> P (one lineitem = one
path), so path counts are lineitem multiplicities the oracle states
directly."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark.testing import arrow_df

from opencyphertranspiler_spark.exceptions import (
    TranspilerBindingError,
    TranspilerNotSupportedError,
)


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_unbounded_pair_model(engine, duck):
    # no path variable + unbounded -> documented endpoint-pair model
    got = rows(
        engine.cypher(
            "MATCH (o:Orders)-[:CONTAINS|OF_PART*]->(pt:Part) "
            "RETURN id(o) AS o_key, id(pt) AS p_key"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
            ).fetchall(),
        )
    )
    assert got == exp


def test_bounded_row_per_path(engine, duck):
    # bounded window -> one row per relationship-unique path; all O->P
    # paths have length exactly 2, multiplicity = lineitems of that part
    got = rows(
        engine.cypher(
            "MATCH pth = (o:Orders)-[:CONTAINS|OF_PART*1..3]->(pt:Part) "
            "RETURN id(o) AS o_key, id(pt) AS p_key, "
            "length(pth) AS len, count(*) AS n"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT l_orderkey, l_partkey, 2::BIGINT, count(*) "
                "FROM lineitem GROUP BY 1, 2"
            ).fetchall(),
        )
    )
    assert got == exp


def test_all_shortest_paths_counts(engine, duck):
    got = rows(
        engine.cypher(
            "MATCH pth = allShortestPaths("
            "(o:Orders)-[:CONTAINS|OF_PART*]->(pt:Part)) "
            "RETURN id(o) AS o_key, id(pt) AS p_key, count(pth) AS n"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT l_orderkey, l_partkey, count(*) "
                "FROM lineitem GROUP BY 1, 2"
            ).fetchall(),
        )
    )
    assert got == exp
    # the fixture genuinely has multi-path pairs (same part twice in one
    # order) — without them this test would not exercise "all"
    assert any(n > 1 for _, _, n in got)


def test_shortest_path_single_witness(engine, duck):
    got = rows(
        engine.cypher(
            "MATCH pth = shortestPath("
            "(o:Orders)-[:CONTAINS|OF_PART*]->(pt:Part)) "
            "RETURN id(o) AS o_key, id(pt) AS p_key, count(pth) AS n"
        )
    )
    n_pairs = duck.sql(
        "SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_partkey "
        "FROM lineitem)"
    ).fetchone()[0]
    assert len(got) == n_pairs
    assert all(n == 1 for _, _, n in got)


def test_nodes_are_composite_and_ends_plain(engine):
    row = engine.cypher(
        "MATCH pth = (o:Orders)-[:CONTAINS|OF_PART*2..2]->(pt:Part) "
        "RETURN id(o) AS o_key, nodes(pth) AS ns, id(pt) AS p_key LIMIT 1"
    ).collect()[0]
    assert len(row.ns) == 3
    assert row.ns[0] == f"Orders:{row.o_key}"
    assert row.ns[1].startswith("Lineitem:")
    assert row.ns[2] == f"Part:{row.p_key}"


def test_undirected_multi_table_verb_chain(engine, duck):
    # FROM_NATION backs TWO edge tables (Customer->Nation,
    # Supplier->Nation); the undirected 2-hop chain C - N - S previously
    # hit the union-edge typed error
    got = rows(
        engine.cypher(
            "MATCH (c:Customer)-[:FROM_NATION*2..2]-(s:Supplier) "
            "RETURN id(c) AS c_key, id(s) AS s_key"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT c_custkey, s_suppkey FROM customer "
                "JOIN supplier ON c_nationkey = s_nationkey"
            ).fetchall(),
        )
    )
    assert got == exp


def test_floor_above_graph_depth_is_empty(engine):
    # the O->L->P chain is 2 deep; a *3.. floor matches nothing (and
    # must not error)
    assert (
        engine.cypher(
            "MATCH (o:Orders)-[:CONTAINS|OF_PART*3..]->(pt:Part) "
            "RETURN id(o) AS o_key"
        ).count()
        == 0
    )


def test_zero_zero_identity_on_plain_label(engine, duck):
    # *0..0 with an indirect verb: only the zero-length identity rows
    # (plain ids, no composite leakage)
    got = rows(
        engine.cypher(
            "MATCH (a:Orders)-[:CONTAINS*0..0]->(b:Orders) "
            "RETURN id(a) AS a_key, id(b) AS b_key"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT o_orderkey, o_orderkey FROM orders"
            ).fetchall(),
        )
    )
    assert got == exp


def test_zero_floor_different_labels_skips_zero(engine, duck):
    # *0..2 between different labels: the zero variant is impossible, so
    # the result is exactly the length-2 paths
    got = rows(
        engine.cypher(
            "MATCH (o:Orders)-[:CONTAINS|OF_PART*0..2]->(pt:Part) "
            "RETURN id(o) AS o_key, id(pt) AS p_key, count(*) AS n"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT l_orderkey, l_partkey, count(*) "
                "FROM lineitem GROUP BY 1, 2"
            ).fetchall(),
        )
    )
    assert got == exp


def test_inline_map_filters_every_hop(engine):
    # {l_linenumber: 1} holds on CONTAINS edges only; OF_PART edges lack
    # the property, so (null = 1) never holds and no path reaches Part
    assert (
        engine.cypher(
            "MATCH (o:Orders)-[:CONTAINS|OF_PART* {l_linenumber: 1}]->"
            "(pt:Part) RETURN id(o) AS o_key"
        ).count()
        == 0
    )


def test_single_hop_hetero_still_errors(engine):
    # a 1-hop alternation genuinely cannot connect Orders to Part — the
    # union-edge typed error must survive the lift
    with pytest.raises(TranspilerNotSupportedError, match="No edge named"):
        engine.cypher(
            "MATCH (o:Orders)-[:CONTAINS|OF_PART]->(pt:Part) "
            "RETURN id(o) AS o_key"
        )


def test_unreachable_chain_still_errors(engine):
    # the walk direction matters: Part never reaches Orders forward
    with pytest.raises(
        (TranspilerNotSupportedError, TranspilerBindingError),
        match="No edge named|can never reach",
    ):
        engine.cypher(
            "MATCH (pt:Part)-[:CONTAINS|OF_PART*]->(o:Orders) "
            "RETURN id(pt) AS p_key"
        )


def test_write_through_hetero_chain(engine, duck):
    # the hetero lift composes with the functional write path: no union
    # NODES are involved (pt is a real Part), so SET works — flag every
    # part reachable from an order and read the count in-statement
    res = engine.cypher_write(
        "MATCH (o:Orders)-[:CONTAINS|OF_PART*]->(pt:Part) "
        "SET pt.flagged = true "
        "WITH count(*) AS n "
        "MATCH (p2:Part) WHERE p2.flagged "
        "RETURN count(*) AS flagged"
    )
    exp = duck.sql(
        "SELECT count(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    assert res.returned.collect()[0].flagged == exp


# ---- hypothesis fabric arm --------------------------------------------
# Random tri-label fabrics (A -P-> B, B -Q-> C, B -R-> B) drive the
# hetero-chain enumeration against a DuckDB recursive CTE that carries
# the used-edge-id list (relationship-unique walks == the engine's path
# semantics). R edges make the B layer cyclic, so rel-uniqueness is
# genuinely exercised; fuzz budget scales with SPARK_GRAFT_FUZZ_SCALE.

import os as _os

_FUZZ_SCALE = int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

_A = ["a1", "a2", "a3"]
_B = ["b1", "b2", "b3", "b4"]
_C = ["c1", "c2", "c3"]


@st.composite
def hetero_case(draw):
    p_edges = draw(
        st.lists(
            st.tuples(st.sampled_from(_A), st.sampled_from(_B)),
            min_size=1, max_size=4, unique=True,
        )
    )
    q_edges = draw(
        st.lists(
            st.tuples(st.sampled_from(_B), st.sampled_from(_C)),
            min_size=1, max_size=4, unique=True,
        )
    )
    r_edges = draw(
        st.lists(
            st.tuples(st.sampled_from(_B), st.sampled_from(_B)),
            min_size=0, max_size=5, unique=True,
        ).filter(lambda es: all(s != d for s, d in es))
    )
    use_r = draw(st.booleans()) and r_edges
    lo = draw(st.integers(0, 2))
    hi = draw(st.one_of(st.none(), st.integers(max(lo, 2), 4)))
    undirected = draw(st.booleans())
    return p_edges, q_edges, r_edges, bool(use_r), lo, hi, undirected


@settings(
    max_examples=10 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=hetero_case())
def test_hetero_chain_fabric_vs_duckdb(spark, duck, case):
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    p_edges, q_edges, r_edges, use_r, lo, hi, undirected = case
    reg = TableRegistry()
    reg.register_df("ta", arrow_df(spark, [(x,) for x in _A], "id string"))
    reg.register_df("tb", arrow_df(spark, [(x,) for x in _B], "id string"))
    reg.register_df("tc", arrow_df(spark, [(x,) for x in _C], "id string"))
    reg.register_df("ep", arrow_df(spark, p_edges, "src string, dst string"))
    reg.register_df("eq", arrow_df(spark, q_edges, "src string, dst string"))
    reg.register_df(
        "er",
        arrow_df(spark, r_edges, "src string, dst string")
        if r_edges
        else arrow_df(spark, [], "src string, dst string"),
    )
    g = GraphSchema(
        [
            NodeSchema("A", "ta", "id", ()),
            NodeSchema("B", "tb", "id", ()),
            NodeSchema("C", "tc", "id", ()),
        ],
        [
            EdgeSchema("P", "A", "B", "ep", "src", "dst"),
            EdgeSchema("Q", "B", "C", "eq", "src", "dst"),
            EdgeSchema("R", "B", "B", "er", "src", "dst"),
        ],
    )
    eng = CypherEngine(spark, g, reg)
    verbs = ["P", "Q"] + (["R"] if use_r else [])
    vspec = "|".join(verbs)
    star = f"*{lo}..{'' if hi is None else hi}"
    arrow = "-" if undirected else "->"
    cy = (
        f"MATCH pth = (x:A)-[:{vspec}{star}]{arrow}(y:C) "
        "RETURN x.id AS x, y.id AS y, length(pth) AS l, count(pth) AS c"
    )

    def lit(tag, es):
        return ", ".join(f"('{tag}{i}', '{s}', '{d}')" for i, (s, d) in enumerate(es))

    all_edges = [("p", p_edges), ("q", q_edges)] + ([("r", r_edges)] if use_r else [])
    vals = ", ".join(lit(tag, es) for tag, es in all_edges if es)
    sym = (
        "sym(id, s, d) AS (SELECT id, a, b FROM e UNION ALL "
        "SELECT id, b, a FROM e)"
        if undirected
        else "sym(id, s, d) AS (SELECT id, a, b FROM e)"
    )
    # rel-unique walks cap: every edge used at most once, so the longest
    # path is the edge count
    maxd = min(sum(len(es) for _, es in all_edges), 12)
    sql = f"""
        WITH RECURSIVE e(id, a, b) AS (SELECT * FROM (VALUES {vals})),
        {sym},
        walk(x, at, dist, used) AS (
            SELECT s, d, 1, [id] FROM sym WHERE s LIKE 'a%'
            UNION ALL
            SELECT w.x, s2.d, w.dist + 1, list_append(w.used, s2.id)
            FROM walk w JOIN sym s2 ON s2.s = w.at
            WHERE NOT list_contains(w.used, s2.id) AND w.dist < {maxd}
        )
        SELECT x, at AS y, dist AS l, count(*) AS c FROM walk
        WHERE at LIKE 'c%' AND dist >= {max(lo, 1)}
              {f"AND dist <= {hi}" if hi is not None else ""}
        GROUP BY 1, 2, 3
    """
    got = rows(eng.cypher(cy))
    exp = sorted(map(tuple, duck.sql(sql).fetchall()))
    assert got == exp, f"\ncypher: {cy}\nsql: {sql}"


def test_relationships_per_hop_types(engine):
    # round-11 continuation: relationships(p) on an enumerated multi-verb
    # path reports the ACTUAL traversed verb per hop, not the joined
    # display verb — forward and backward patterns
    row = engine.cypher(
        "MATCH p = (o:Orders)-[:CONTAINS|OF_PART*2..2]->(pt:Part) "
        "RETURN relationships(p)[0].type AS t0, "
        "relationships(p)[1].type AS t1 LIMIT 1"
    ).collect()[0]
    assert (row.t0, row.t1) == ("CONTAINS", "OF_PART")
    row = engine.cypher(
        "MATCH p = (pt:Part)<-[:CONTAINS|OF_PART*2..2]-(o:Orders) "
        "RETURN relationships(p)[0].type AS t0, "
        "relationships(p)[1].type AS t1 LIMIT 1"
    ).collect()[0]
    assert (row.t0, row.t1) == ("OF_PART", "CONTAINS")


def test_unlabeled_endpoint_label_set_inference(engine, duck):
    # (a:Orders)-[:CONTAINS*0..1]->(b): b is Orders at length 0 and
    # Lineitem at length 1 — the endpoint label SET is inferred and the
    # tagged-union machinery owns the hop (previously a raw Spark
    # AnalysisException out of mismatched zero-splice branch schemas)
    got = rows(
        engine.cypher(
            "MATCH (a:Orders)-[:CONTAINS*0..1]->(b) "
            "RETURN labels(b)[0] AS lb, count(*) AS c"
        )
    )
    n_orders = duck.sql("SELECT count(*) FROM orders").fetchone()[0]
    n_line = duck.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert got == [("Lineitem", n_line), ("Orders", n_orders)]
    # length(p) splits the same way
    got2 = rows(
        engine.cypher(
            "MATCH p = (a:Orders)-[:CONTAINS*0..1]->(b) "
            "RETURN length(p) AS l, count(*) AS c"
        )
    )
    assert got2 == [(0, n_orders), (1, n_line)]


def test_unlabeled_endpoint_hetero_chain_inference(engine, duck):
    # bounded hetero chain with an UNLABELED endpoint: depth 1 lands on
    # Lineitem, depth 2 on Part — the inferred disjunction skips the
    # splice (heterogeneous window) and enumerates
    got = rows(
        engine.cypher(
            "MATCH p = (a:Orders)-[:CONTAINS|OF_PART*0..2]->(b) "
            "RETURN labels(b)[0] AS lb, length(p) AS l, count(*) AS c"
        )
    )
    n_orders = duck.sql("SELECT count(*) FROM orders").fetchone()[0]
    n_line = duck.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert got == [
        ("Lineitem", 1, n_line),
        ("Orders", 0, n_orders),
        ("Part", 2, n_line),
    ]


def test_inference_skips_second_occurrence_aliases(engine):
    # b appears in a second pattern with its own label: inference must
    # not override it — the query keeps its pre-existing behavior
    # (here: b:Lineitem makes the zero variant impossible, 1-hop only)
    got = engine.cypher(
        "MATCH (b:Lineitem) WITH count(*) AS n_l "
        "MATCH (a:Orders)-[:CONTAINS*1..1]->(b) "
        "RETURN n_l, count(*) AS c"
    ).collect()[0]
    assert got.c == got.n_l


def test_undirected_cross_label_same_endpoints(engine, duck):
    # (a:Nation)-[:IN_REGION*2..2]-(b:Nation): distinct nations sharing a
    # region (a = b would reuse the single (a, region) edge) — the
    # undirected resolver's same-label restriction no longer applies
    got = rows(
        engine.cypher(
            "MATCH (a:Nation)-[:IN_REGION*2..2]-(b:Nation) "
            "RETURN id(a) AS a_key, id(b) AS b_key"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT a.n_nationkey, b.n_nationkey FROM nation a "
                "JOIN nation b ON a.n_regionkey = b.n_regionkey "
                "AND a.n_nationkey <> b.n_nationkey"
            ).fetchall(),
        )
    )
    assert got == exp


def test_undirected_multi_verb_direct_pair(engine, duck):
    # multi-verb UNDIRECTED var-length between directly-connected labels
    # previously raised "Multiple relationship types cannot combine with
    # an undirected variable-length relationship". PLACED and
    # PLACED_NORMAL are parallel relationship types, so each NORMAL order
    # matches twice at length 1; no length-2 walk ends on Orders
    got = engine.cypher(
        "MATCH (c:Customer)-[:PLACED|PLACED_NORMAL*1..2]-(o:Orders) "
        "RETURN count(*) AS c"
    ).collect()[0].c
    exp = duck.sql(
        "SELECT (SELECT count(*) FROM orders) + (SELECT count(*) FROM "
        "orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))"
    ).fetchone()[0]
    assert got == exp


def test_bound_alias_hetero_chain_in_optional_match(engine, duck):
    # the OPTIONAL MATCH's (o) carries no label syntactically — its
    # binding does; the resolver reads the bound alias's label
    got = rows(
        engine.cypher(
            "MATCH (o:Orders) WHERE o.o_orderkey < 5 "
            "OPTIONAL MATCH (o)-[:CONTAINS|OF_PART*2..2]->(pt:Part) "
            "RETURN o.o_orderkey AS k, count(pt) AS n"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT o_orderkey, count(l_orderkey) FROM orders "
                "LEFT JOIN lineitem ON l_orderkey = o_orderkey "
                "WHERE o_orderkey < 5 GROUP BY 1"
            ).fetchall(),
        )
    )
    assert got == exp


def test_bound_alias_hetero_chain_in_later_match(engine, duck):
    got = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "MATCH (c)-[:PLACED|CONTAINS*2..2]->(l:Lineitem) "
        "RETURN count(*) AS n"
    ).collect()[0].n
    exp = duck.sql(
        "SELECT count(*) FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey WHERE o.o_custkey = 1"
    ).fetchone()[0]
    assert got == exp
