"""Planner layer: plan shape + binding assertions (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark.cypher import parse
from opencyphertranspiler_spark.exceptions import (
    TranspilerBindingError,
    TranspilerNotSupportedError,
)
from opencyphertranspiler_spark.plans import (
    DataSourceOp,
    JoinOp,
    ProjectOp,
    SelectionOp,
    SetOp,
    plan_query,
)
from opencyphertranspiler_spark.sources import tpch_graph_schema

SCHEMA = tpch_graph_schema()


def plan(q):
    return plan_query(parse(q), SCHEMA)


def ops(root):
    yield root
    for c in root.children():
        yield from ops(c)


def count_ops(root, kind):
    return sum(1 for o in ops(root) if isinstance(o, kind))


def test_single_hop_shape():
    p = plan(
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) RETURN c.c_name AS n, count(o) AS k"
    )
    # edge fuses with its sink node (same table row) -> 2 scans, 1 join
    assert count_ops(p, DataSourceOp) == 2
    joins = [o for o in ops(p) if isinstance(o, JoinOp)]
    assert len(joins) == 1 and all(j.how == "inner" for j in joins)
    proj = next(o for o in ops(p) if isinstance(o, ProjectOp))
    assert proj.has_agg


def test_label_inference():
    p = plan("MATCH (c)-[:PLACED]->(o) RETURN o.o_orderstatus AS s")
    srcs = {
        e.alias: e.label
        for o in ops(p)
        if isinstance(o, DataSourceOp)
        for e in o.entities
    }
    assert srcs["c"] == "Customer" and srcs["o"] == "Orders"


def test_optional_match_is_left_join():
    p = plan(
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Orders) "
        "RETURN c.c_name AS n, count(o) AS k"
    )
    joins = [o for o in ops(p) if isinstance(o, JoinOp)]
    assert any(j.how == "left" for j in joins)
    left_join = next(j for j in joins if j.how == "left")
    assert left_join.drop_right  # shared alias columns are dropped


def test_disjoint_patterns_cross_join():
    p = plan("MATCH (r:Region), (n:Nation) RETURN r.r_name AS a, n.n_name AS b")
    joins = [o for o in ops(p) if isinstance(o, JoinOp)]
    assert len(joins) == 1 and joins[0].how == "cross"


def test_rel_uniqueness_predicate_added():
    p = plan(
        "MATCH (o:Orders)-[r1:CONTAINS]->(l1:Lineitem), "
        "(o)-[r2:CONTAINS]->(l2:Lineitem) RETURN count(*) AS n"
    )
    sels = [o for o in ops(p) if isinstance(o, SelectionOp) and o.predicate is not None]
    assert sels, "expected a relationship-uniqueness filter"


def test_union_planned_as_setop():
    p = plan(
        "MATCH (c:Customer) RETURN c.c_name AS v UNION "
        "MATCH (s:Supplier) RETURN s.s_name AS v"
    )
    assert isinstance(p, SetOp) and not p.all


def test_rejoin_same_alias_becomes_filter():
    # the second hop re-uses both endpoints -> cycle equality filter
    p = plan(
        "MATCH (c:Customer)-[:PLACED]->(o:Orders), (c)-[:PLACED]->(o) "
        "RETURN count(*) AS n"
    )
    sels = [o for o in ops(p) if isinstance(o, SelectionOp) and o.predicate is not None]
    assert sels


BINDING_NEGATIVES = [
    "MATCH (c:Nope) RETURN c.x AS x",
    "MATCH (c:Customer) RETURN c.nope AS x",
    "MATCH (c:Customer)-[:PLACED]->(o:Supplier) RETURN o.s_name AS x",
    "MATCH (a)-[r]->(b) RETURN a.c_name AS x",  # untyped rel, no unique edge
    "MATCH (c:Customer) RETURN q.c_name AS x",
    # `n.foo` on a scalar alias now binds at PLAN time (struct-field /
    # temporal accessors are an extension) and rejects at COMPILE time —
    # covered by test_temporal.py::test_bad_field_on_scalar_value
    # implicit field after aggregation is rejected
    "MATCH (c:Customer) WITH c.c_mktsegment AS s, count(*) AS n "
    "ORDER BY c.c_acctbal RETURN s AS s",
]


@pytest.mark.parametrize("query", BINDING_NEGATIVES)
def test_binding_negatives(query):
    with pytest.raises(TranspilerBindingError):
        plan(query)


def test_entity_masking_through_with():
    # after WITH c AS x, the old alias c is out of scope (entity masking)
    with pytest.raises(TranspilerBindingError):
        plan(
            "MATCH (c:Customer) WITH c AS x RETURN c.c_name AS n"
        )
    # and the new alias works
    p = plan("MATCH (c:Customer) WITH c AS x RETURN x.c_name AS n")
    assert p is not None


def test_same_rel_alias_twice_rejected():
    with pytest.raises(TranspilerNotSupportedError):
        plan(
            "MATCH (a:Customer)-[r:PLACED]->(b:Orders), "
            "(a)-[r:PLACED]->(c:Orders) RETURN count(*) AS n"
        )


def test_returning_entity_projects_struct():
    # round 6: RETURN c is entity projection (struct of properties), not
    # the reference's rejection (LogicalPlan.cs:324-328); a PATH variable
    # stays rejected
    p = plan("MATCH (c:Customer) RETURN c")
    assert p is not None
    with pytest.raises(TranspilerNotSupportedError, match="path"):
        plan("MATCH p = (c:Customer)-[:PLACED]->(o:Orders) RETURN p")


def test_unwind_first_clause(engine):
    # UNWIND before any MATCH (formerly gate entry q21) — plan_unwind with
    # no piped input
    df = engine.cypher("UNWIND [1, 2, 3] AS x RETURN x ORDER BY x")
    assert [r.x for r in df.collect()] == [1, 2, 3]


def test_mixed_aggregate_grouping_reference_is_typed_error(engine):
    """Neo4j parity: sum(x) + x without projecting x as a grouping item is
    an implicit-grouping error — typed, never Spark's raw MISSING_GROUP_BY."""
    import pytest

    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    with pytest.raises(TranspilerBindingError, match="mixes an aggregate"):
        engine.cypher(
            "MATCH (c:Customer) "
            "WITH sum(c.c_acctbal) + c.c_acctbal AS x RETURN x"
        )
    # legal: the reference is also projected as its own grouping item
    rows = engine.cypher(
        "MATCH (c:Customer) RETURN c.c_mktsegment AS seg, "
        "count(*) * size(c.c_mktsegment) AS weird ORDER BY seg LIMIT 2"
    ).collect()
    assert len(rows) == 2
