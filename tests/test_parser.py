"""Parser layer: AST shape + scope-fence negatives (SURVEY.md §5.1)."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark.cypher import ast as A
from opencyphertranspiler_spark.cypher import parse
from opencyphertranspiler_spark.exceptions import (
    TranspilerNotSupportedError,
    TranspilerSyntaxError,
)


def test_flagship_shape():
    q = parse(
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "RETURN c.c_name AS Name, count(o) AS OrderCount"
    )
    assert isinstance(q, A.SingleQuery)
    match, ret = q.clauses
    assert isinstance(match, A.MatchClause) and not match.optional
    assert match.where is not None
    (part,) = match.patterns
    assert [n.label for n in part.nodes] == ["Customer", "Orders"]
    assert part.rels[0].verb == "PLACED"
    assert part.rels[0].direction == A.Direction.FORWARD
    assert isinstance(ret, A.ProjectionClause) and ret.is_return
    assert [a for a, _ in ret.items] == ["Name", "OrderCount"]
    assert isinstance(ret.items[1][1], A.AggCall)


def test_directions():
    q = parse("MATCH (a:X)<-[r:R]-(b)-[s:S]-(c) RETURN a.p AS p")
    part = q.clauses[0].patterns[0]
    assert part.rels[0].direction == A.Direction.BACKWARD
    assert part.rels[1].direction == A.Direction.EITHER


def test_expression_precedence():
    q = parse("MATCH (a:X) WHERE a.p + 2 * 3 = 8 OR NOT a.q RETURN a.p AS p")
    w = q.clauses[0].where
    assert isinstance(w, A.Binary) and w.op == A.BinaryOp.OR
    left = w.left
    assert left.op == A.BinaryOp.EQ
    assert left.left.op == A.BinaryOp.PLUS
    assert left.left.right.op == A.BinaryOp.MULTIPLY


def test_string_operators_lowered_to_functions():
    q = parse(
        "MATCH (a:X) WHERE a.s STARTS WITH 'T' AND a.s IS NOT NULL RETURN a.s AS s"
    )
    w = q.clauses[0].where
    assert w.left.name == "startswith"
    assert w.right.name == "isnotnull"


def test_union_chain():
    q = parse(
        "MATCH (a:X) RETURN a.v AS v UNION MATCH (b:Y) RETURN b.v AS v "
        "UNION ALL MATCH (c:Z) RETURN c.v AS v"
    )
    assert isinstance(q, A.UnionQuery) and q.all
    assert isinstance(q.left, A.UnionQuery) and not q.left.all


def test_keywords_as_names():
    q = parse("MATCH (o:Orders)-[:CONTAINS]->(l:Lineitem) RETURN l.l_quantity AS q")
    assert q.clauses[0].patterns[0].rels[0].verb == "CONTAINS"


def test_skip_limit_distinct():
    q = parse("MATCH (a:X) RETURN DISTINCT a.v AS v ORDER BY v DESC SKIP 2 LIMIT 7")
    ret = q.clauses[-1]
    assert ret.distinct and ret.skip == 2 and ret.limit == 7
    assert not ret.order_by[0].ascending


def test_count_star_and_distinct():
    q = parse("MATCH (a:X) RETURN count(*) AS c, count(DISTINCT a.v) AS d")
    c = q.clauses[-1].items[0][1]
    d = q.clauses[-1].items[1][1]
    assert isinstance(c, A.AggCall) and c.arg is None
    assert d.distinct


NEGATIVES = [
    ("CREATE (a:X) RETURN a", TranspilerNotSupportedError),
    ("MERGE (a:X) RETURN a", TranspilerNotSupportedError),
    # `(a:X {k: 1})` and `[r:A|B]` are now supported extensions (property
    # maps desugar to WHERE; alternation becomes a virtual union edge)
    ("MATCH (a:X)-[r:A|A]->(b) RETURN a.v AS v", TranspilerSyntaxError),
    ("MATCH (a:X {k: }) RETURN a.v AS v", TranspilerSyntaxError),
    ("MATCH (a:X {k 1}) RETURN a.v AS v", TranspilerSyntaxError),
    ("MATCH (a:X)-[r*1..2]->(b) RETURN a.v AS v", TranspilerNotSupportedError),
    # `p = (a)-[..]-(b)` pattern variables are now a supported extension;
    # a non-pattern right-hand side stays a syntax error:
    ("MATCH p = 5 RETURN p AS v", TranspilerSyntaxError),
    ("MATCH (a:X) RETURN sum(count(a.v)) AS v", TranspilerNotSupportedError),
    ("OPTIONAL MATCH (a:X) RETURN a.v AS v", TranspilerNotSupportedError),
    # `CASE a.v WHEN 1 THEN 2 END` is now a supported extension (desugars
    # to searched CASE); malformed CASE stays rejected:
    ("MATCH (a:X) RETURN CASE a.v THEN 2 END AS v", TranspilerSyntaxError),
    ("MATCH (a:X) RETURN sum(DISTINCT a.v) AS v", TranspilerNotSupportedError),
    # standalone `RETURN 1 AS one` is now a supported extension (one-row
    # source); a bare projection with trailing garbage stays a syntax error
    ("RETURN 1 AS one MATCH (a:X)", TranspilerSyntaxError),
    ("MATCH (a:X) OPTIONAL MATCH (a)--(b) MATCH (b)--(c) RETURN a.v AS v",
     TranspilerNotSupportedError),
    ("MATCH (a:X) RETURN a.v AS v, a.w AS v", TranspilerSyntaxError),
    ("MATCH (a:X RETURN a.v AS v", TranspilerSyntaxError),
    ("MATCH (a:X) RETURN a.v + AS v", TranspilerSyntaxError),
    ("MATCH (a:X) WHERE a.s = 'unterminated RETURN a.v AS v", TranspilerSyntaxError),
]


@pytest.mark.parametrize("query,exc", NEGATIVES)
def test_negatives(query, exc):
    with pytest.raises(exc):
        parse(query)


def test_parse_inline_property_maps():
    q = parse("MATCH (a:X {k: 1, s: 'x'})-[r:REL {w: 2.5}]->(b {t: $p}) RETURN a.v AS v")
    part = q.clauses[0].patterns[0]
    a, b = part.nodes
    assert [(k, type(v).__name__) for k, v in a.props] == [("k", "Literal"), ("s", "Literal")]
    assert b.alias == "b" and [k for k, _ in b.props] == ["t"]
    assert type(b.props[0][1]).__name__ == "Parameter"
    (rk, rv), = part.rels[0].props
    assert rk == "w"


def test_parse_rel_type_alternation():
    q = parse("MATCH (a)-[r:A|B|:C]->(b) RETURN a.v AS v")
    rel = q.clauses[0].patterns[0].rels[0]
    assert rel.verb == "A" and rel.alt_verbs == ["B", "C"]
    # var-length composes with alternation
    q2 = parse("MATCH (a)-[:A|B*1..2]->(b) RETURN a.v AS v")
    rel2 = q2.clauses[0].patterns[0].rels[0]
    assert rel2.alt_verbs == ["B"] and (rel2.min_hops, rel2.max_hops) == (1, 2)


def test_parse_simple_case_desugars_to_searched():
    q = parse("MATCH (a:X) RETURN CASE a.v WHEN 1 THEN 'one' WHEN 2 THEN 'two' ELSE 'many' END AS w")
    case = q.clauses[-1].items[0][1]
    assert isinstance(case, A.CaseExpr) and len(case.whens) == 2
    c0 = case.whens[0][0]
    assert isinstance(c0, A.Binary) and c0.op == A.BinaryOp.EQ
    assert isinstance(c0.left, A.Property) and c0.left.prop == "v"


def test_parse_list_comprehension_and_quantifiers():
    q = parse("MATCH (a:X) RETURN [x IN a.v WHERE x > 1 | x * 2] AS l")
    lc = q.clauses[-1].items[0][1]
    assert isinstance(lc, A.ListComprehension)
    assert lc.var == "x" and lc.where is not None and lc.map_expr is not None
    # WHERE-only and map-only forms
    assert parse("MATCH (a:X) RETURN [x IN a.v WHERE x > 1] AS l")
    assert parse("MATCH (a:X) RETURN [x IN a.v | x * 2] AS l")
    # quantifiers, incl. the keyword-token ALL
    for kind in ("all", "any", "none", "single"):
        q2 = parse(f"MATCH (a:X) WHERE {kind}(x IN a.v WHERE x > 0) RETURN a.v AS v")
        w = q2.clauses[0].where
        assert isinstance(w, A.Quantified) and w.kind == kind


def test_parse_list_index_slice_map_literal():
    q = parse("MATCH (a:X) RETURN a.v[0] AS i, a.v[1..3] AS s, a.v[..2] AS h, {k: 1, n: a.v} AS m")
    items = dict(q.clauses[-1].items)
    assert isinstance(items["i"], A.ListIndex)
    sl = items["s"]
    assert isinstance(sl, A.ListSlice) and sl.start is not None and sl.stop is not None
    assert isinstance(items["h"], A.ListSlice) and items["h"].start is None
    m = items["m"]
    assert isinstance(m, A.MapLiteral) and [k for k, _ in m.items] == ["k", "n"]
    # struct path access still parses after the `..` disambiguation
    q2 = parse("MATCH (a:X) RETURN a.meta.width AS w")
    p = q2.clauses[-1].items[0][1]
    assert isinstance(p, A.Property) and p.path == ["width"]


def test_parse_reduce():
    q = parse("MATCH (a:X) RETURN reduce(acc = 0, x IN a.v | acc + x) AS s")
    r = q.clauses[-1].items[0][1]
    assert isinstance(r, A.Reduce)
    assert r.acc == "acc" and r.var == "x"
    with pytest.raises(TranspilerSyntaxError, match="must differ"):
        parse("MATCH (a:X) RETURN reduce(x = 0, x IN a.v | x + x) AS s")


def test_postfix_quantifier_rejects_empty_bounds():
    """ADVICE r8: `{,}` has neither bound — GQL/Neo4j reject it; silently
    reading it as zero-or-more would run invalid queries."""
    import pytest

    from opencyphertranspiler_spark.cypher.parser import parse
    from opencyphertranspiler_spark.exceptions import TranspilerSyntaxError

    with pytest.raises(TranspilerSyntaxError, match="at least one bound"):
        parse("MATCH (a:X)-[:R]->{,}(b:Y) RETURN a.v AS v")
    # the bounded spellings stay legal
    for q in ("{1,}", "{,2}", "{1,2}", "{2}"):
        parse(f"MATCH (a:X)-[:R]->{q}(b:Y) RETURN a.v AS v")
