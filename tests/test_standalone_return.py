"""Standalone WITH/RETURN (round-5 extension; the reference fences these
at CypherVisitor.cs:447-450,828-831): projection-only queries over a
one-row source."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark import TranspilerBindingError


def test_return_literal_expression(engine):
    rows = engine.cypher("RETURN 1 + 1 AS x, 'a' + 'b' AS s").collect()
    assert len(rows) == 1 and rows[0].x == 2 and rows[0].s == "ab"


def test_with_pipeline_no_match(engine):
    rows = engine.cypher(
        "WITH 2 AS x WITH x * 3 AS y RETURN y, y + 1 AS z"
    ).collect()
    assert (rows[0].y, rows[0].z) == (6, 7)


def test_standalone_with_parameters(engine):
    rows = engine.cypher(
        "WITH $p AS x RETURN x * 2 AS y", params={"p": 21}
    ).collect()
    assert rows[0].y == 42


def test_standalone_functions_and_case(engine):
    rows = engine.cypher(
        """
        RETURN toUpper('ab') AS u, size([1, 2, 3]) AS n,
               CASE WHEN 1 < 2 THEN 'yes' ELSE 'no' END AS c,
               reduce(acc = 0, v IN [1, 2, 3] | acc + v) AS r,
               [x IN range(1, 5) WHERE x % 2 = 0 | x * 10] AS lc
        """
    ).collect()
    r = rows[0]
    assert (r.u, r.n, r.c, r.r, r.lc) == ("AB", 3, "yes", 6, [20, 40])


def test_standalone_union(engine):
    rows = engine.cypher(
        "RETURN 1 AS x UNION ALL RETURN 2 AS x UNION ALL RETURN 1 AS x"
    ).collect()
    assert sorted(r.x for r in rows) == [1, 1, 2]


def test_standalone_unwind_then_return_star(engine):
    rows = engine.cypher(
        "WITH 10 AS base UNWIND [1, 2] AS v RETURN *"
    ).collect()
    assert sorted((r.base, r.v) for r in rows) == [(10, 1), (10, 2)]


def test_with_value_feeds_match(engine):
    # a standalone WITH ahead of MATCH: one-row cross join, value usable
    # in the MATCH WHERE (poor-man's parameterization)
    rows = engine.cypher(
        """
        WITH 'BUILDING' AS seg
        MATCH (c:Customer) WHERE c.c_mktsegment = seg
        RETURN count(*) AS n, seg
        """
    ).collect()
    n_direct = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_mktsegment = 'BUILDING' "
        "RETURN count(*) AS n"
    ).collect()[0].n
    assert rows[0].n == n_direct and rows[0].seg == "BUILDING"


def test_standalone_aggregate_and_orderby(engine):
    rows = engine.cypher(
        """
        UNWIND [3, 1, 2] AS v
        WITH v ORDER BY v DESC LIMIT 2
        RETURN collect(v) AS vs, count(*) AS n
        """
    ).collect()
    assert rows[0].n == 2 and sorted(rows[0].vs) == [2, 3]


def test_return_star_with_nothing_in_scope(engine):
    with pytest.raises(TranspilerBindingError, match="nothing in scope"):
        engine.cypher("RETURN *")
