"""Round-5 scalar-library extensions: math functions (differential vs
DuckDB), null-on-failure casts (openCypher semantics vs Spark ANSI), and
ORDER BY on aggregate expressions."""

from __future__ import annotations

import math

import pytest

from opencyphertranspiler_spark import TranspilerNotSupportedError


def test_math_functions_vs_duckdb(engine, duck):
    got = {
        r.k: tuple(r)[1:]
        for r in engine.cypher(
            """
            MATCH (p:Part) WHERE p.p_partkey <= 20
            RETURN p.p_partkey AS k,
                   round(exp(p.p_size / 10.0), 6) AS ex,
                   round(log(p.p_size + 1), 6) AS ln,
                   round(log10(p.p_size + 1), 6) AS l10,
                   round(sin(p.p_size), 6) AS s,
                   round(cos(p.p_size), 6) AS c,
                   round(atan2(p.p_size, 3), 6) AS a2,
                   round(degrees(p.p_size), 4) AS dg
            """
        ).collect()
    }
    exp = {
        r[0]: r[1:]
        for r in duck.sql(
            """
            SELECT p_partkey AS k,
                   round(exp(p_size / 10.0), 6) AS ex,
                   round(ln(p_size + 1), 6) AS ln,
                   round(log10(p_size + 1), 6) AS l10,
                   round(sin(p_size), 6) AS s,
                   round(cos(p_size), 6) AS c,
                   round(atan2(p_size, 3), 6) AS a2,
                   round(degrees(p_size), 4) AS dg
            FROM part WHERE p_partkey <= 20
            """
        ).fetchall()
    }
    assert got.keys() == exp.keys()
    for k in got:
        for a, b in zip(got[k], exp[k]):
            assert abs(a - b) < 1e-6, (k, got[k], exp[k])


def test_math_constants_and_haversin(engine):
    row = engine.cypher(
        "RETURN pi() AS p, e() AS e, round(haversin(pi() / 2), 6) AS h"
    ).collect()[0]
    assert abs(row.p - math.pi) < 1e-12
    assert abs(row.e - math.e) < 1e-12
    assert abs(row.h - 0.5) < 1e-6  # sin^2(pi/4) = 0.5


def test_casts_null_on_malformed_input(engine):
    # openCypher: toInteger('abc') IS NULL; Spark ANSI would throw
    row = engine.cypher(
        """
        RETURN toInteger('abc') AS i, toFloat('x') AS f,
               toBoolean('nope') AS b, toInteger('42') AS ok
        """
    ).collect()[0]
    assert (row.i, row.f, row.b, row.ok) == (None, None, None, 42)


def test_order_by_aggregate_expression(engine, duck):
    got = [
        (r.seg, r.n)
        for r in engine.cypher(
            """
            MATCH (c:Customer)-[:PLACED]->(o:Orders)
            RETURN c.c_mktsegment AS seg, count(*) AS n
            ORDER BY count(*) DESC, seg ASC
            """
        ).collect()
    ]
    exp = duck.sql(
        """
        SELECT c.c_mktsegment AS seg, count(*) AS n
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY 2 DESC, 1 ASC
        """
    ).fetchall()
    assert got == [tuple(r) for r in exp]


def test_order_by_aggregate_inside_expression(engine):
    rows = engine.cypher(
        """
        MATCH (o:Orders)
        RETURN o.o_orderpriority AS pri, round(sum(o.o_totalprice), 2) AS total
        ORDER BY round(sum(o.o_totalprice), 2) DESC
        """
    ).collect()
    totals = [r.total for r in rows]
    assert totals == sorted(totals, reverse=True)


def test_order_by_unprojected_aggregate_rejected(engine):
    with pytest.raises(TranspilerNotSupportedError, match="projection items"):
        engine.cypher(
            "MATCH (o:Orders) RETURN o.o_orderpriority AS pri "
            "ORDER BY count(*) DESC"
        )


def test_isempty_and_elementid(engine):
    row = engine.cypher(
        """
        MATCH (r:Region) WHERE r.r_name = 'ASIA'
        RETURN isEmpty([]) AS e1, isEmpty([1]) AS e2, isEmpty('') AS e3,
               isEmpty('x') AS e4, isEmpty(null) AS e5,
               elementId(r) AS eid, id(r) AS rid
        """
    ).collect()[0]
    assert (row.e1, row.e2, row.e3, row.e4, row.e5) == (
        True,
        False,
        True,
        False,
        None,
    )
    assert row.eid == row.rid


# ---------------------------------------------------------------------------
# last() list/aggregate disambiguation + startNode()/endNode()
# ---------------------------------------------------------------------------


def test_last_on_list_shaped_args(engine):
    assert engine.cypher("RETURN last([1, 2, 3]) AS x").collect()[0]["x"] == 3
    assert engine.cypher("RETURN last([]) AS x").collect()[0]["x"] is None
    assert (
        engine.cypher("RETURN last(range(1, 5)) AS x").collect()[0]["x"] == 5
    )
    # the Neo4j idiom the nested-aggregate rule used to reject
    got = engine.cypher(
        "MATCH (r:Region) RETURN last(collect(r.r_name)) AS x"
    ).collect()[0]["x"]
    assert got == "MIDDLE EAST"
    # a list variable still routes to the aggregate (documented: use
    # names[-1] for element access on variables)
    got2 = engine.cypher(
        "MATCH (r:Region) WITH collect(r.r_name) AS names "
        "RETURN names[-1] AS x"
    ).collect()[0]["x"]
    assert got2 == "MIDDLE EAST"


def test_last_aggregate_form_intact(engine, duck):
    got = engine.cypher(
        "MATCH (o:Orders) RETURN last(o.o_orderstatus) AS x"
    ).collect()[0]["x"]
    want = duck.execute("SELECT max(o_orderstatus) FROM orders").fetchone()[0]
    assert got == want  # reference parity: LAST lowers to MAX


def test_start_end_node_ids(engine):
    rows = engine.cypher(
        "MATCH (c:Customer)-[r:PLACED]->(o:Orders) "
        "WHERE o.o_orderkey <= 3 "
        "RETURN id(startNode(r)) AS s, id(endNode(r)) AS e, "
        "c.c_custkey AS ck, o.o_orderkey AS ok"
    ).collect()
    assert rows
    for r in rows:
        assert r["s"] == r["ck"] and r["e"] == r["ok"]


def test_start_end_node_fences(engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(TranspilerNotSupportedError, match="bind the endpoint"):
        engine.cypher(
            "MATCH (c:Customer)-[r:PLACED]->(o:Orders) RETURN startNode(r) AS s"
        )
    with pytest.raises(TranspilerNotSupportedError, match="bind the endpoint"):
        engine.cypher(
            "MATCH (c:Customer)-[r:PLACED]->(o:Orders) "
            "RETURN labels(startNode(r)) AS l"
        )


def test_nondeterministic_functions(engine):
    # timestamp()/rand()/randomUUID() (extension; Neo4j parity) — no
    # DuckDB oracle by nature, so assert shape/range/uniqueness instead
    import re
    import time

    rows = engine.cypher(
        "MATCH (r:Region) RETURN timestamp() AS ts, rand() AS rv, "
        "randomUUID() AS u"
    ).collect()
    assert len(rows) == 5
    now_ms = time.time() * 1000
    for r in rows:
        # statement-start clock: one shared value, close to wall time
        assert abs(r.ts - now_ms) < 600_000
        assert 0.0 <= r.rv < 1.0
        assert re.fullmatch(r"[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}", r.u)
    assert len({r.ts for r in rows}) == 1  # query-constant timestamp
    assert len({r.u for r in rows}) == 5  # per-row uuids


def test_ornull_cast_aliases(engine):
    # Neo4j ...OrNull spellings — same null-on-failure try_cast
    row = engine.cypher(
        "WITH 1 AS one RETURN toIntegerOrNull('12') AS a, "
        "toIntegerOrNull('abc') AS b, toFloatOrNull('1.5') AS c, "
        "toBooleanOrNull('true') AS d, toStringOrNull(42) AS e"
    ).collect()[0]
    assert (row.a, row.b, row.d, row.e) == (12, None, True, "42")
    assert abs(row.c - 1.5) < 1e-6


# -- vector.similarity.* (round 9; Neo4j 5.18) ---------------------------------


def test_vector_similarity_literals(engine):
    row = engine.cypher(
        """
        WITH [1.0, 2.0] AS a, [2.0, 4.0] AS b, [0.0, 0.0] AS z, [3.0, 4.0] AS w
        RETURN vector.similarity.cosine(a, b) AS cos,
               vector.similarity.euclidean(z, w) AS euc,
               vector.similarity.cosine(a, null) AS nul
        """
    ).collect()[0]
    assert abs(row.cos - 1.0) < 1e-12
    assert abs(row.euc - 1.0 / 26.0) < 1e-12
    assert row.nul is None


def test_vector_similarity_cosine_normalized(engine):
    """Neo4j 5.18 scores cosine into [0,1] as (1+cos)/2 (ADVICE r9):
    orthogonal vectors score 0.5, opposite vectors 0.0."""
    row = engine.cypher(
        """
        WITH [1.0, 0.0] AS x, [0.0, 1.0] AS y, [-2.0, 0.0] AS nx
        RETURN vector.similarity.cosine(x, y) AS ortho,
               vector.similarity.cosine(x, nx) AS opposite
        """
    ).collect()[0]
    assert abs(row.ortho - 0.5) < 1e-12
    assert abs(row.opposite - 0.0) < 1e-12


def test_vector_similarity_vs_duckdb(spark, duck):
    """Pairs over the real embeddings parquet vs DuckDB's
    list_cosine_similarity / list_distance."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )
    from tests.conftest import SF_DIR

    reg = TableRegistry()
    reg.register(
        "embeddings", lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    )
    g = GraphSchema(
        [
            NodeSchema(
                "Emb",
                "embeddings",
                "vec_id",
                (EntityProperty("embedding", "array<float>"),),
                "bigint",
            )
        ],
        [],
    )
    eng = CypherEngine(spark, g, reg)
    got = {
        (r.a, r.b): (r.cos, r.euc)
        for r in eng.cypher(
            """
            MATCH (a:Emb), (b:Emb)
            WHERE a.vec_id < b.vec_id AND b.vec_id < 8
            RETURN a.vec_id AS a, b.vec_id AS b,
                   vector.similarity.cosine(a.embedding, b.embedding) AS cos,
                   vector.similarity.euclidean(a.embedding, b.embedding) AS euc
            """
        ).collect()
    }
    exp = {
        (a, b): (c, e)
        for a, b, c, e in duck.sql(
            f"""
            SELECT a.vec_id, b.vec_id,
                   (1 + list_cosine_similarity(a.embedding, b.embedding)) / 2,
                   1 / (1 + list_distance(a.embedding, b.embedding) ** 2)
            FROM '{SF_DIR}/embeddings.parquet' a
            JOIN '{SF_DIR}/embeddings.parquet' b
              ON a.vec_id < b.vec_id AND b.vec_id < 8
            """
        ).fetchall()
    }
    assert got.keys() == exp.keys() and len(got) == 28
    for k in got:
        assert abs(got[k][0] - exp[k][0]) < 1e-5, k
        assert abs(got[k][1] - exp[k][1]) < 1e-5, k
