"""CALL { } subqueries (round-5 extension): DuckDB differentials on the
TPC-H overlay at sf0.001, covering correlated aggregation (incl. the
aggregate-over-empty LEFT-join defaults), intermediate WITH + DISTINCT,
and uncorrelated cross-join semantics."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark.testing import arrow_df


def test_call_correlated_aggregates_vs_duckdb(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (c:Customer) WHERE c.c_custkey <= 100
                CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
                       WHERE o.o_totalprice > 100000
                       RETURN count(o) AS n,
                              round(sum(o.o_totalprice), 2) AS tot }
                RETURN c.c_custkey AS k, n, tot
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT c.c_custkey AS k, s.n, s.tot
                FROM customer c,
                     LATERAL (SELECT count(*) AS n,
                                     round(sum(o.o_totalprice), 2) AS tot
                              FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 100000) s
                WHERE c.c_custkey <= 100
                """
            ).fetchall(),
        )
    )
    assert got == exp
    # aggregate-over-empty keeps the outer row: every customer appears
    assert len(got) == duck.sql(
        "SELECT count(*) FROM customer WHERE c_custkey <= 100"
    ).fetchone()[0]


def test_call_distinct_through_intermediate_with(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (c:Customer) WHERE c.c_custkey <= 50
                CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
                       WITH DISTINCT o.o_orderstatus AS st
                       RETURN count(st) AS stn }
                RETURN c.c_custkey AS k, stn
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT c.c_custkey AS k,
                       (SELECT count(DISTINCT o.o_orderstatus) FROM orders o
                        WHERE o.o_custkey = c.c_custkey) AS stn
                FROM customer c WHERE c.c_custkey <= 50
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_uncorrelated_vs_duckdb(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (r:Region)
                CALL { MATCH (n:Nation) RETURN count(n) AS nations }
                RETURN r.r_name AS name, nations
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT r.r_name AS name,
                       (SELECT count(*) FROM nation) AS nations
                FROM region r
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_uncorrelated_union_vs_duckdb(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (r:Region) WHERE r.r_regionkey <= 1
                CALL { MATCH (n:Nation) WHERE n.n_nationkey < 5
                       RETURN n.n_name AS nm
                       UNION
                       MATCH (n:Nation) WHERE n.n_nationkey >= 20
                       RETURN n.n_name AS nm }
                RETURN r.r_name AS name, nm
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT r.r_name AS name, u.nm
                FROM region r
                CROSS JOIN (
                    SELECT n_name AS nm FROM nation WHERE n_nationkey < 5
                    UNION
                    SELECT n_name AS nm FROM nation WHERE n_nationkey >= 20
                ) u
                WHERE r.r_regionkey <= 1
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_per_row_top1_vs_duckdb(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (c:Customer) WHERE c.c_custkey <= 100
                CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
                       RETURN o.o_orderkey AS latest
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                       LIMIT 1 }
                RETURN c.c_custkey AS k, latest
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT c.c_custkey AS k, s.latest
                FROM customer c,
                     LATERAL (SELECT o.o_orderkey AS latest FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                              ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                              LIMIT 1) s
                WHERE c.c_custkey <= 100
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_intermediate_topk_then_aggregate(engine, duck):
    # LIMIT inside an intermediate WITH is per outer row, and the final
    # aggregate groups per outer row — top-3 prices summed per customer
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (c:Customer) WHERE c.c_custkey <= 50
                CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
                       WITH o.o_totalprice AS p ORDER BY p DESC LIMIT 3
                       RETURN round(sum(p), 2) AS top3 }
                RETURN c.c_custkey AS k, top3
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT c.c_custkey AS k,
                       (SELECT round(sum(p), 2) FROM
                         (SELECT o.o_totalprice AS p FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                          ORDER BY p DESC LIMIT 3)) AS top3
                FROM customer c WHERE c.c_custkey <= 50
                """
            ).fetchall(),
        )
    )
    assert got == exp


# ---------------------------------------------------------------------------
# CALL procedures (schema introspection; desugared to plan-time UNWIND)
# ---------------------------------------------------------------------------


def test_call_relationship_import_vs_duckdb(engine, duck):
    """Round 12 (VERDICT r11 #6): CALL { WITH r } imports a
    RELATIONSHIP entity — seeded by a fresh edge scan, joined back on
    the edge identity (src, dst)."""
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem)
                CALL { WITH r RETURN r.l_linenumber * 10 AS ln10 }
                RETURN id(o) AS ok, ln10
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT l_orderkey, l_linenumber * 10 FROM lineitem"
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_relationship_import_correlated_match(engine, duck):
    """The imported relationship's properties drive a correlated MATCH
    + aggregate inside the body (LEFT-join defaults preserved)."""
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem)
                CALL { WITH r
                       MATCH (l2:Lineitem)
                       WHERE l2.l_linenumber = r.l_linenumber
                       RETURN count(*) AS n }
                RETURN r.l_linenumber AS ln, n, count(*) AS c
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                WITH lc AS (
                  SELECT l_linenumber, count(*) AS n
                  FROM lineitem GROUP BY 1
                )
                SELECT l.l_linenumber, lc.n, count(*)
                FROM lineitem l JOIN lc USING (l_linenumber)
                GROUP BY 1, 2
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_relationship_import_per_row_limit(engine, duck):
    """ORDER BY/LIMIT inside the body is PER OUTER ROW — the window
    partitions on the imported edge's identity columns."""
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (c:Customer)-[r:PLACED]->(o:Orders)
                WHERE c.c_custkey <= 20
                CALL { WITH r MATCH (n:Nation)
                       RETURN n.n_name AS nn ORDER BY nn LIMIT 2 }
                RETURN id(o) AS ok, nn
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT o_orderkey, nn FROM orders,
                  (SELECT n_name AS nn FROM nation ORDER BY 1 LIMIT 2)
                WHERE o_custkey <= 20
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_path_import_via_path_functions(engine, duck):
    """Round 12: a PATH import desugars to scalar imports of the path
    functions the body uses — length(p)/nodes(p)/relationships(p)
    compute in the OUTER scope and thread through the scalar-import
    machinery."""
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH p = (c:Customer)-[:PLACED]->(o:Orders)
                WHERE c.c_custkey <= 30
                CALL { WITH p
                       RETURN length(p) * 10 + size(nodes(p)) AS enc }
                RETURN id(o) AS ok, enc
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT o_orderkey, 12 FROM orders WHERE o_custkey <= 30"
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_path_import_varlength(engine, duck):
    """Path imports compose with enumerated var-length paths (length
    varies per row) and correlated aggregation."""
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH p = (o:Orders)-[:CONTAINS|OF_PART*1..2]->(x)
                CALL { WITH p MATCH (n:Nation)
                       WHERE n.n_nationkey < length(p)
                       RETURN count(*) AS n_below }
                RETURN length(p) AS l, n_below, count(*) AS c
                """
            ).collect(),
        )
    )
    li = duck.sql("SELECT count(*) FROM lineitem").fetchall()[0][0]
    # depth-1 paths (one per lineitem): n_nationkey < 1 -> 1 nation;
    # depth-2 paths (one per lineitem): n_nationkey < 2 -> 2 nations
    assert got == [(1, 1, li), (2, 2, li)]


def test_call_union_with_rel_and_path_imports(engine, duck):
    """Correlated UNION branches accept the round-12 import kinds; the
    path desugar's internal scalar columns must not leak into the
    branch outputs (they'd differ per branch)."""
    n = engine.cypher(
        "MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem) WHERE id(o) <= 3 "
        "CALL { WITH r RETURN r.l_linenumber AS v "
        "UNION WITH r RETURN r.l_linenumber + 100 AS v } "
        "RETURN count(*) AS n"
    ).collect()[0].n
    exp = duck.sql(
        "SELECT 2 * count(*) FROM lineitem WHERE l_orderkey <= 3"
    ).fetchall()[0][0]
    assert n == exp
    m = engine.cypher(
        "MATCH p = (c:Customer)-[:PLACED]->(o:Orders) "
        "WHERE c.c_custkey <= 2 "
        "CALL { WITH p RETURN length(p) AS v "
        "UNION WITH p RETURN length(p) + 7 AS v } "
        "RETURN count(*) AS n"
    ).collect()[0].n
    exp2 = duck.sql(
        "SELECT 2 * count(*) FROM orders WHERE o_custkey <= 2"
    ).fetchall()[0][0]
    assert m == exp2


def test_call_path_import_other_use_fenced(engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(
        TranspilerNotSupportedError, match="length\\(\\)/nodes\\(\\)"
    ):
        engine.cypher(
            """
            MATCH p = (c:Customer)-[:PLACED]->(o:Orders)
            CALL { WITH p RETURN p AS q }
            RETURN count(*) AS n
            """
        )


def test_bounded_varlength_dead_end_variant_dropped(engine, duck):
    """Round 12: a fixed-length variant whose chain dead-ends under the
    bound labels (the 2-hop variant of CONTAINS*1..2 — CONTAINS only
    leaves Orders) contributes zero rows like Neo4j instead of failing
    the query; an ENTIRELY impossible pattern still errors."""
    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    got = engine.cypher(
        "MATCH p = (o:Orders)-[:CONTAINS*1..2]->(x) "
        "RETURN length(p) AS l, count(*) AS c"
    ).collect()
    li = duck.sql("SELECT count(*) FROM lineitem").fetchall()[0][0]
    assert sorted(map(tuple, got)) == [(1, li)]
    with pytest.raises(TranspilerBindingError, match="Cannot bind"):
        engine.cypher(
            "MATCH (c:Customer)-[:CONTAINS*1..2]->(x) RETURN count(*) AS n"
        )


def test_call_db_labels_standalone(engine):
    got = [r["label"] for r in engine.cypher("CALL db.labels()").collect()]
    assert got == sorted(got)
    assert "Customer" in got and "Orders" in got and "Region" in got


def test_call_db_relationship_types(engine):
    got = {
        r["relationshipType"]
        for r in engine.cypher("CALL db.relationshipTypes()").collect()
    }
    assert {"PLACED", "CONTAINS", "IN_REGION", "FROM_NATION"} <= got


def test_call_db_property_keys(engine):
    got = {
        r["propertyKey"]
        for r in engine.cypher("CALL db.propertyKeys()").collect()
    }
    assert {"c_custkey", "c_acctbal", "o_orderdate", "r_name"} <= got


def test_call_procedure_yield_where_and_composition(engine):
    # YIELD ... WHERE filter, then composition with MATCH + aggregation
    out = engine.cypher(
        "CALL db.labels() YIELD label WHERE label STARTS WITH 'C' "
        "MATCH (r:Region) RETURN label, count(r) AS n"
    ).collect()
    assert [(r["label"], r["n"]) for r in out] == [("Customer", 5)]
    # alias via AS
    out2 = engine.cypher(
        "CALL db.relationshipTypes() YIELD relationshipType AS t "
        "RETURN t ORDER BY t LIMIT 2"
    ).collect()
    assert [r["t"] for r in out2] == ["CONTAINS", "FROM_NATION"]


def test_call_procedure_fences(engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
        TranspilerSyntaxError,
    )

    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    with pytest.raises(TranspilerNotSupportedError, match="db.labels"):
        engine.cypher("CALL apoc.help()")
    with pytest.raises(TranspilerNotSupportedError, match="yields"):
        engine.cypher("CALL db.labels() YIELD nope RETURN nope")
    # round 6: arguments parse now; a no-arg procedure rejects them with
    # a typed binding error instead of a parser fence
    with pytest.raises(TranspilerBindingError, match="no arguments"):
        engine.cypher("CALL db.labels('x')")
    with pytest.raises(TranspilerSyntaxError, match="YIELD"):
        engine.cypher("CALL db.labels() MATCH (r:Region) RETURN r.r_name AS n")


def test_rare_composition_shapes(engine):
    """Cross-feature compositions: procedures under UNION and inside
    CALL { }, EXISTS inside a correlated subquery, deep WITH chains."""
    r1 = engine.cypher(
        "CALL db.labels() YIELD label RETURN label AS name "
        "UNION MATCH (r:Region) RETURN r.r_name AS name"
    ).collect()
    assert len(r1) == 14  # 9 labels + 5 regions, distinct

    r2 = engine.cypher(
        "MATCH (r:Region) WHERE r.r_regionkey = 0 "
        "CALL { CALL db.labels() YIELD label RETURN count(label) AS nl } "
        "RETURN r.r_name AS rn, nl"
    ).collect()
    assert r2[0]["nl"] == 9

    r3 = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey <= 3 AND c.c_custkey >= 1 "
        "CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders) "
        "WHERE EXISTS { MATCH (o)-[:CONTAINS]->(:Lineitem) } "
        "RETURN count(o) AS n } "
        "RETURN c.c_custkey AS k, n ORDER BY k"
    ).collect()
    assert [r["k"] for r in r3] == [1, 2, 3] and all(r["n"] > 0 for r in r3)

    r4 = engine.cypher(
        "MATCH (c:Customer) WITH c.c_acctbal AS a WITH a * 2 AS b "
        "WITH b + 1 AS c2 WITH c2 / 2 AS d RETURN round(sum(d), 1) AS s"
    ).collect()
    assert r4[0]["s"] is not None


# ---------------------------------------------------------------------------
# round 6: correlated CALL { UNION }
# ---------------------------------------------------------------------------


def test_call_correlated_union_all_vs_duckdb(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (n:Nation)-[:IN_REGION]->(r:Region)
                WHERE r.r_name = 'ASIA'
                CALL {
                  WITH n
                  MATCH (s:Supplier)-[:FROM_NATION]->(n)
                  RETURN count(s) AS cnt, 'suppliers' AS kind
                  UNION ALL
                  WITH n
                  MATCH (c:Customer)-[:FROM_NATION]->(n)
                  RETURN count(c) AS cnt, 'customers' AS kind
                }
                RETURN n.n_name AS nation, kind, cnt
                """
            ).collect(),
        )
    )
    # grouped aggregates over an empty match yield ZERO rows (Neo4j):
    # the constant `kind` item makes the branch grouped, so LATERAL +
    # GROUP BY reproduces it exactly
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT n.n_name AS nation, u.kind, u.cnt
                FROM nation n
                JOIN region r ON r.r_regionkey = n.n_regionkey
                               AND r.r_name = 'ASIA',
                LATERAL (
                  SELECT count(*) AS cnt, 'suppliers' AS kind
                  FROM supplier s WHERE s.s_nationkey = n.n_nationkey
                  GROUP BY kind
                  UNION ALL
                  SELECT count(*) AS cnt, 'customers' AS kind
                  FROM customer c WHERE c.c_custkey IS NOT NULL
                    AND c.c_nationkey = n.n_nationkey
                  GROUP BY kind
                ) u
                """
            ).fetchall(),
        )
    )
    assert got == exp and got


def test_call_correlated_union_distinct_dedups_per_outer_row(engine, duck):
    # both branches return the order's status for small orders; UNION
    # (distinct) collapses the duplicate per outer row
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (c:Customer) WHERE c.c_custkey <= 20
                CALL {
                  WITH c
                  MATCH (c)-[:PLACED]->(o:Orders)
                  RETURN o.o_orderstatus AS st
                  UNION
                  WITH c
                  MATCH (c)-[:PLACED]->(o:Orders)
                  WHERE o.o_totalprice > 100000
                  RETURN o.o_orderstatus AS st
                }
                RETURN c.c_custkey AS k, st
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT DISTINCT c.c_custkey AS k, o.o_orderstatus AS st
                FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
                WHERE c.c_custkey <= 20
                """
            ).fetchall(),
        )
    )
    assert got == exp and got


def test_call_correlated_union_mismatched_columns_rejected(engine):
    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    with pytest.raises(TranspilerBindingError, match="same columns"):
        engine.cypher(
            """
            MATCH (c:Customer) WHERE c.c_custkey <= 5
            CALL {
              WITH c MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS n
              UNION
              WITH c MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS m
            }
            RETURN c.c_custkey AS k, n
            """
        )


# ---------------------------------------------------------------------------
# round 6: CALL procedure arguments (literal / $param plan-time constants)
# ---------------------------------------------------------------------------


def test_procedure_propertykeys_with_label_argument(engine):
    got = [r[0] for r in engine.cypher("CALL db.propertyKeys('Customer')").collect()]
    assert got == ["c_acctbal", "c_custkey", "c_mktsegment", "c_name"]
    # relationship type works too, and $param binding
    got2 = [
        r[0]
        for r in engine.cypher(
            "CALL db.propertyKeys($t)", params={"t": "PLACED"}
        ).collect()
    ]
    assert got2 == ["o_custkey", "o_orderkey"]


def test_procedure_argument_composes_with_yield_where(engine):
    df = engine.cypher(
        "CALL db.propertyKeys('Region') YIELD propertyKey AS k "
        "WHERE k ENDS WITH 'name' RETURN k"
    )
    assert [r[0] for r in df.collect()] == ["r_name"]


def test_procedure_argument_errors_are_typed(engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerBindingError,
        TranspilerNotSupportedError,
    )

    with pytest.raises(TranspilerBindingError, match="no node label"):
        engine.cypher("CALL db.propertyKeys('Nope')")
    with pytest.raises(TranspilerBindingError, match="no arguments"):
        engine.cypher("CALL db.labels('X')")
    with pytest.raises(TranspilerBindingError, match="at most one"):
        engine.cypher("CALL db.propertyKeys('A', 'B')")
    with pytest.raises(TranspilerBindingError, match="not"):
        engine.cypher("CALL db.propertyKeys($missing)")
    # computed arguments stay fenced: results are plan-time constants
    with pytest.raises(TranspilerNotSupportedError, match="literal"):
        engine.cypher("CALL db.propertyKeys('Cust' + 'omer')")
    # the fence is now only for UNKNOWN procedures
    with pytest.raises(TranspilerNotSupportedError, match="Unknown procedure"):
        engine.cypher("CALL dbms.components()")


def test_call_correlated_union_keeps_duplicate_outer_rows(engine, duck):
    # round 7 (ADVICE r6): UNION dedup is PER INVOCATION — a duplicate-
    # carrying outer stream (fan-out then WITH without DISTINCT) must
    # keep one branch-output set per outer ROW, not per distinct value.
    # Customer 1 has 5 orders, so `WITH c` pipes 5 identical rows; Neo4j
    # returns 5.
    got = engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders) WHERE c.c_custkey = 1
        WITH c
        CALL {
          WITH c RETURN c.c_custkey AS k
          UNION
          WITH c RETURN c.c_custkey AS k
        }
        RETURN k
        """
    ).collect()
    n_orders = duck.sql(
        "SELECT count(*) FROM orders WHERE o_custkey = 1"
    ).fetchone()[0]
    assert [r["k"] for r in got] == [1] * n_orders and n_orders == 5
    # the spine must NOT leak: only the projected column comes back
    assert got[0].asDict().keys() == {"k"}


def test_call_correlated_union_distinct_outer_single_row(engine):
    # a genuinely single outer row still dedups across branches
    got = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey = 1
        WITH c
        CALL {
          WITH c RETURN c.c_custkey AS k
          UNION
          WITH c RETURN c.c_custkey AS k
        }
        RETURN k
        """
    ).collect()
    assert [r["k"] for r in got] == [1]


def test_call_correlated_union_all_no_spine_overhead(engine):
    # UNION ALL needs no row-id spine (no distinct to protect) — the
    # plan must not contain the localCheckpoint scan the spine implies
    df = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey = 1
        WITH c
        CALL {
          WITH c RETURN c.c_custkey AS k
          UNION ALL
          WITH c RETURN c.c_custkey AS k
        }
        RETURN k
        """
    )
    assert [r["k"] for r in df.collect()] == [1, 1]
    assert "ExistingRDD" not in df._jdf.queryExecution().toString()


def test_call_scope_clause_equals_import_with(engine):
    # CALL (c) { ... } (Neo4j 5.23 scope syntax) is sugar for the
    # import-WITH form — identical results
    a = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        CALL (c) { MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS n }
        RETURN c.c_custkey AS k, n ORDER BY k
        """
    ).collect()
    b = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS n }
        RETURN c.c_custkey AS k, n ORDER BY k
        """
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 6


def test_call_scope_clause_empty_and_union(engine):
    # CALL () { } is the explicit uncorrelated form; a scope list applies
    # to EVERY union branch
    got = engine.cypher(
        """
        MATCH (r:Region)
        CALL () { MATCH (n:Nation) RETURN count(n) AS nn }
        RETURN count(*) AS rows, min(nn) AS nn
        """
    ).collect()[0]
    assert tuple(got) == (5, 25)
    got = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey = 1
        CALL (c) {
          MATCH (c)-[:PLACED]->(o:Orders) RETURN max(o.o_totalprice) AS v
          UNION ALL
          MATCH (c)-[:FROM_NATION]->(n:Nation) RETURN toFloat(n.n_nationkey) AS v
        }
        RETURN count(*) AS rows
        """
    ).collect()[0]
    assert got.rows == 2


def test_call_scope_clause_star(engine):
    """`CALL (*)` (round 8): expands to the outer aliases the body
    references — here none, so the subquery is uncorrelated (cross)."""
    got = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey <= 3 "
        "CALL (*) { MATCH (n:Nation) RETURN count(n) AS x } "
        "RETURN count(*) AS rows, min(x) AS x"
    ).collect()[0]
    assert tuple(got) == (4, 25)
    # referenced outer node -> correlated, same as the explicit import
    star = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey <= 20 "
        "CALL (*) { MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS n } "
        "RETURN c.c_custkey AS k, n"
    ).collect()
    expl = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey <= 20 "
        "CALL (c) { MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS n } "
        "RETURN c.c_custkey AS k, n"
    ).collect()
    assert sorted(map(tuple, star)) == sorted(map(tuple, expl))
    # a referenced outer SCALAR imports too (round-11 continuation:
    # scalar imports — previously the node-entity typed fence)
    mixed = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey <= 5 WITH c, 5 AS t "
        "CALL (*) { MATCH (c)-[:PLACED]->(o:Orders) "
        "WHERE o.o_orderkey > t RETURN count(o) AS n } "
        "RETURN c.c_custkey AS k, n"
    ).collect()
    expl2 = engine.cypher(
        "MATCH (c:Customer) WHERE c.c_custkey <= 5 "
        "CALL (c) { MATCH (c)-[:PLACED]->(o:Orders) "
        "WHERE o.o_orderkey > 5 RETURN count(o) AS n } "
        "RETURN c.c_custkey AS k, n"
    ).collect()
    assert sorted(map(tuple, mixed)) == sorted(map(tuple, expl2))


def test_optional_call_correlated(engine):
    # OPTIONAL CALL (Neo4j 5.24): outer rows with no subquery output
    # survive with null output columns; plain CALL drops them
    plain = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        CALL (c) { MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice > 350000)
                   RETURN o.o_orderkey AS k }
        RETURN c.c_custkey AS ck, k
        """
    ).collect()
    opt = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        OPTIONAL CALL (c) { MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice > 350000)
                            RETURN o.o_orderkey AS k }
        RETURN c.c_custkey AS ck, k
        """
    ).collect()
    matched = {tuple(r) for r in plain}
    assert matched <= {tuple(r) for r in opt}
    unmatched = {r.ck for r in opt if r.k is None}
    assert unmatched == {0, 1, 2, 3, 4, 5} - {r.ck for r in plain}
    assert len(opt) == len(plain) + len(unmatched)


def test_optional_call_uncorrelated_empty(engine):
    row = engine.cypher(
        """
        MATCH (r:Region)
        OPTIONAL CALL { MATCH (n:Nation WHERE n.n_nationkey > 999)
                        RETURN n.n_name AS nm }
        RETURN count(*) AS rows, count(nm) AS nonnull
        """
    ).collect()[0]
    assert tuple(row) == (5, 0)


def test_optional_call_procedure_fence(engine):
    import pytest

    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(TranspilerNotSupportedError, match="OPTIONAL CALL"):
        engine.cypher("OPTIONAL CALL db.labels() YIELD label RETURN label")


def test_optional_call_union_null_extends_only_when_all_branches_empty(engine):
    """(ADVICE r7 high) Optionality applies to the WHOLE invocation output:
    an outer row matched by one branch must NOT also emit a null-extended
    row just because another branch missed — the null row appears only when
    EVERY branch is empty for that invocation (Neo4j 5.24)."""
    q = """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        OPTIONAL CALL (c) {{
            MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice > 350000)
            RETURN o.o_orderkey AS k
            UNION {all_kw}
            MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice < 0)
            RETURN o.o_orderkey AS k
        }}
        RETURN c.c_custkey AS ck, k
    """
    single = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        OPTIONAL CALL (c) {
            MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice > 350000)
            RETURN o.o_orderkey AS k
        }
        RETURN c.c_custkey AS ck, k
        """
    ).collect()
    assert any(r.k is not None for r in single)  # some branch-1 matches
    assert any(r.k is None for r in single)  # some invocations are empty
    for all_kw in ("ALL", ""):
        got = engine.cypher(q.format(all_kw=all_kw)).collect()
        # branch 2 is statically empty, so the union output per invocation
        # equals branch 1's — the result must be EXACTLY the single-branch
        # optional result (no spurious nulls for matched outer rows)
        assert sorted(map(tuple, got)) == sorted(map(tuple, single))
        matched = {r.ck for r in got if r.k is not None}
        nulled = {r.ck for r in got if r.k is None}
        assert not (matched & nulled)


def test_optional_call_union_both_branches_contribute(engine):
    """OPTIONAL CALL { UNION } where both branches can match: rows from both
    branches survive per invocation; null-extension only for outer rows
    with no output from either branch."""
    got = engine.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        OPTIONAL CALL (c) {
            MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice > 350000)
            RETURN o.o_totalprice AS v
            UNION ALL
            MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice < 5000)
            RETURN o.o_totalprice AS v
        }
        RETURN c.c_custkey AS ck, v
        """
    ).collect()
    hi = engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        WHERE c.c_custkey <= 5 AND (o.o_totalprice > 350000 OR o.o_totalprice < 5000)
        RETURN c.c_custkey AS ck, o.o_totalprice AS v
        """
    ).collect()
    matched = sorted((r.ck, r.v) for r in got if r.v is not None)
    assert matched == sorted((r.ck, r.v) for r in hi)
    nulled = {r.ck for r in got if r.v is None}
    assert nulled == {0, 1, 2, 3, 4, 5} - {r.ck for r in hi}


# -- round-9 ADVICE fixes ------------------------------------------------------


def test_optional_call_as_first_clause_null_extends(engine):
    """ADVICE r8: uncorrelated OPTIONAL CALL as the FIRST clause must yield
    one null-extended row when the subquery output is empty (Neo4j 5.24),
    not zero rows."""
    rows = engine.cypher(
        """
        OPTIONAL CALL { MATCH (n:Nation WHERE n.n_nationkey > 999)
                        RETURN n.n_name AS nm }
        RETURN nm
        """
    ).collect()
    assert len(rows) == 1 and rows[0].nm is None
    # non-empty subquery: passthrough, no extra null row
    rows = engine.cypher(
        """
        OPTIONAL CALL { MATCH (r:Region) RETURN r.r_name AS nm }
        RETURN nm ORDER BY nm
        """
    ).collect()
    assert len(rows) == 5 and all(r.nm is not None for r in rows)
    # plain CALL keeps zero-row semantics
    rows = engine.cypher(
        """
        CALL { MATCH (n:Nation WHERE n.n_nationkey > 999)
               RETURN n.n_name AS nm }
        RETURN nm
        """
    ).collect()
    assert rows == []


def test_optional_call_first_clause_union_empty(engine):
    rows = engine.cypher(
        """
        OPTIONAL CALL { MATCH (n:Nation WHERE n.n_nationkey > 999) RETURN n.n_name AS nm
                        UNION
                        MATCH (r:Region WHERE r.r_regionkey > 999) RETURN r.r_name AS nm }
        RETURN nm
        """
    ).collect()
    assert len(rows) == 1 and rows[0].nm is None


def test_call_scope_star_body_shadow_rejected(engine):
    """ADVICE r8: under CALL (*) every outer variable is in scope, so a
    body WITH/UNWIND that redefines an UNREFERENCED outer alias is
    'variable already defined' (Neo4j 5.23), not a silent shadow."""
    import pytest

    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    with pytest.raises(TranspilerBindingError, match="redefines outer"):
        engine.cypher(
            """
            MATCH (r:Region)
            WITH r, 1 AS t
            CALL (*) { WITH 2 AS t MATCH (n:Nation) RETURN count(n) AS c }
            RETURN r.r_name AS nm, t, c
            """
        )
    with pytest.raises(TranspilerBindingError, match="redefines outer"):
        engine.cypher(
            """
            MATCH (r:Region)
            WITH r, 1 AS t
            CALL (*) { UNWIND [1, 2] AS t RETURN sum(t) AS c }
            RETURN r.r_name AS nm, t, c
            """
        )
    # referencing the outer alias imports it — rebind fence still applies,
    # and a legal use keeps working
    rows = engine.cypher(
        """
        MATCH (r:Region)
        WITH r, 1 AS t
        CALL (*) { MATCH (r)<-[:IN_REGION]-(n:Nation) RETURN count(n) AS c }
        RETURN r.r_name AS nm, t, c ORDER BY nm
        """
    ).collect()
    assert len(rows) == 5 and all(r.c == 5 and r.t == 1 for r in rows)


def test_call_scope_star_sees_procedure_args(engine):
    """ADVICE r8: procedure-call arguments are walked for referenced
    names. Procedures resolve to constants BEFORE planning, so a variable
    argument hits the plan-time-constant fence with its accurate typed
    error (never an unbound-alias error from a missed import)."""
    import pytest

    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(
        TranspilerNotSupportedError, match="literal or a .param"
    ):
        engine.cypher(
            """
            WITH 'Customer' AS lbl
            CALL (*) { CALL db.propertyKeys(lbl) YIELD propertyKey
                       RETURN count(propertyKey) AS c }
            RETURN c
            """
        )


# ---------------------------------------------------------------------------
# round 9 (VERDICT r8 #8): CALL (*) fuzz arm — property-based equivalence:
# `CALL (*) { body }` must produce exactly the rows of the explicit
# `CALL (<referenced outer aliases>) { body }` spelling, across random
# bodies (correlated / uncorrelated / aggregate / row-returning / UNION)
# ---------------------------------------------------------------------------

import os as _os

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

_FUZZ_SCALE = int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

# (body, referenced outer aliases) — outer scope binds c (Customer node)
# and t (scalar); only node entities are importable
_BODIES = [
    ("MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS v", ("c",)),
    (
        "MATCH (c)-[:PLACED]->(o:Orders) WHERE o.o_totalprice > {thr} "
        "RETURN count(o) AS v",
        ("c",),
    ),
    (
        "MATCH (c)-[:PLACED]->(o:Orders) "
        "RETURN round(sum(o.o_totalprice), 2) AS v",
        ("c",),
    ),
    ("MATCH (n:Nation) RETURN count(n) AS v", ()),
    ("MATCH (r:Region) RETURN r.r_regionkey AS v", ()),
    (
        "MATCH (c)-[:PLACED]->(o:Orders) RETURN count(o) AS v "
        "UNION ALL MATCH (c)-[:PLACED]->(o:Orders) "
        "WHERE o.o_totalprice > {thr} RETURN count(o) AS v",
        ("c",),
    ),
]


@st.composite
def scope_star_case(draw):
    body, refs = draw(st.sampled_from(_BODIES))
    thr = draw(st.integers(50_000, 300_000))
    key_cap = draw(st.integers(3, 12))
    optional = draw(st.booleans())
    return body.format(thr=thr), refs, key_cap, optional


@settings(
    max_examples=8 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=scope_star_case())
def test_call_scope_star_equiv_explicit_scope(engine, case):
    body, refs, key_cap, optional = case
    kw = "OPTIONAL CALL" if optional else "CALL"
    outer = (
        f"MATCH (c:Customer) WHERE c.c_custkey <= {key_cap} WITH c, 1 AS t "
    )
    ret = "RETURN c.c_custkey AS k, t, v"
    star = engine.cypher(
        f"{outer}{kw} (*) {{ {body} }} {ret}"
    ).collect()
    explicit = engine.cypher(
        f"{outer}{kw} ({', '.join(refs)}) {{ {body} }} {ret}"
    ).collect()
    assert sorted(map(tuple, star)) == sorted(map(tuple, explicit)), (
        body, refs, key_cap, optional,
    )


# -- round 10 (VERDICT r9 #3): CALL db.index.vector.queryNodes ----------------


@pytest.fixture(scope="module")
def vector_engine(spark):
    from tests.conftest import SF_DIR

    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
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
    eng.create_vector_index("emb_idx", "Emb", "embedding")
    eng.create_vector_index("emb_l2", "Emb", "embedding", similarity="euclidean")
    return eng


def _qvec(spark):
    from tests.conftest import SF_DIR

    row = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter("vec_id = 0")
        .collect()[0]
    )
    return [float(x) for x in row.embedding]


def test_vector_query_nodes_vs_duckdb(vector_engine, spark, duck):
    """CALL db.index.vector.queryNodes(name, k, $vec) YIELD node, score
    matches DuckDB's exact top-k under the Neo4j (1+cos)/2 score."""
    from tests.conftest import SF_DIR

    v = _qvec(spark)
    got = [
        (r.id, r.s)
        for r in vector_engine.cypher(
            "CALL db.index.vector.queryNodes('emb_idx', 5, $v) "
            "YIELD node, score "
            "RETURN node.vec_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id",
            params={"v": v},
        ).collect()
    ]
    exp = duck.sql(
        f"""
        SELECT vec_id,
               round((1 + list_cosine_similarity(
                   embedding, {v!r}::DOUBLE[])) / 2, 6) AS s
        FROM '{SF_DIR}/embeddings.parquet'
        ORDER BY s DESC, vec_id LIMIT 5
        """
    ).fetchall()
    assert got == [(a, b) for a, b in exp]


def test_vector_query_nodes_composition(vector_engine, spark):
    """The yielded `node` is a REAL node entity: YIELD ... WHERE filters,
    the implicit-label '<Label>.<property>' index spelling resolves, and
    downstream aggregation composes through the ordinary planner."""
    v = _qvec(spark)
    row = vector_engine.cypher(
        "CALL db.index.vector.queryNodes('Emb.embedding', 10, $v) "
        "YIELD node AS n, score WHERE score > 0.5 "
        "RETURN count(n) AS c, min(score) AS lo",
        params={"v": v},
    ).collect()[0]
    assert row.c == 10 and row.lo > 0.5
    # euclidean index scores with 1/(1+d^2): the query vector itself is
    # the unique score-1.0 hit
    top = vector_engine.cypher(
        "CALL db.index.vector.queryNodes('emb_l2', 1, $v) "
        "YIELD node, score RETURN node.vec_id AS id, score",
        params={"v": v},
    ).collect()[0]
    assert (top.id, round(top.score, 9)) == (0, 1.0)


def test_vector_query_nodes_standalone_and_errors(vector_engine, spark):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerBindingError,
        TranspilerNotSupportedError,
    )

    v = _qvec(spark)
    st = vector_engine.cypher(
        "CALL db.index.vector.queryNodes('emb_idx', 3, $v)", params={"v": v}
    )
    assert st.columns == ["node", "score"] and st.count() == 3
    with pytest.raises(TranspilerBindingError, match="no vector index"):
        vector_engine.cypher(
            "CALL db.index.vector.queryNodes('nope', 3, $v) "
            "YIELD node, score RETURN score",
            params={"v": v},
        )
    with pytest.raises(TranspilerBindingError, match="k must be"):
        vector_engine.cypher(
            "CALL db.index.vector.queryNodes('emb_idx', 0, $v) "
            "YIELD node, score RETURN score",
            params={"v": v},
        )
    with pytest.raises(TranspilerNotSupportedError, match="node, score"):
        vector_engine.cypher(
            "CALL db.index.vector.queryNodes('emb_idx', 3, $v) "
            "YIELD node, nope RETURN nope",
            params={"v": v},
        )
    # the single-column introspection procedures reject multi-YIELD
    with pytest.raises(TranspilerNotSupportedError, match="single column"):
        vector_engine.cypher("CALL db.labels() YIELD label, x RETURN label")


# -- round 11 (VERDICT r10 #2): queryNodes through a trained IVF index -------


def test_vector_query_nodes_ivf_exhaustive_probe_equals_exact(
    vector_engine, spark
):
    """nprobe == n_cells probes every inverted list, so the IVF path must
    return EXACTLY the brute-scan top-k (same ids, same exact scores —
    re-rank is the exact fold, recall is the only approximation and here
    it's 1)."""
    v = _qvec(spark)
    q = (
        "CALL db.index.vector.queryNodes('emb_idx', 7, $v) "
        "YIELD node, score "
        "RETURN node.vec_id AS id, round(score, 9) AS s ORDER BY s DESC, id"
    )
    vector_engine.clear_caches()
    exact = [(r.id, r.s) for r in vector_engine.cypher(q, params={"v": v}).collect()]
    vector_engine.train_vector_index("emb_idx", n_cells=8, nprobe=8, iters=2)
    try:
        cand, how = vector_engine._vector_candidate_frame(
            "emb_idx", "Emb", "embedding", v
        )
        assert how == "ivf"
        got = [(r.id, r.s) for r in vector_engine.cypher(q, params={"v": v}).collect()]
        assert got == exact
    finally:
        vector_engine._vector_ann.clear()
        vector_engine.clear_caches()


def test_vector_query_nodes_ivf_pruned_recall_and_exact_scores(
    vector_engine, spark, duck
):
    """With nprobe < n_cells the candidate set is cell-pruned (strictly
    smaller than the corpus — the 100 TB point), every returned score is
    still the EXACT (1+cos)/2 of its id (no ADC approximation leaks into
    user-visible scores), and recall@5 vs the exact top-5 stays high on
    real query vectors."""
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_corpus = emb.count()
    vector_engine.clear_caches()
    vector_engine.train_vector_index("emb_idx", n_cells=8, nprobe=3, iters=2)
    try:
        recalls = []
        for qid in (0, 7, 23):
            row = emb.filter(f"vec_id = {qid}").collect()[0]
            v = [float(x) for x in row.embedding]
            cand, how = vector_engine._vector_candidate_frame(
                "emb_idx", "Emb", "embedding", v
            )
            assert how == "ivf" and cand.count() < n_corpus
            got = vector_engine.cypher(
                "CALL db.index.vector.queryNodes('emb_idx', 5, $v) "
                "YIELD node, score "
                "RETURN node.vec_id AS id, round(score, 6) AS s "
                "ORDER BY s DESC, id",
                params={"v": v},
            ).collect()
            exp = duck.sql(
                f"""
                SELECT vec_id, round((1 + list_cosine_similarity(
                       embedding, {v!r}::DOUBLE[])) / 2, 6) AS s
                FROM '{SF_DIR}/embeddings.parquet'
                ORDER BY s DESC, vec_id LIMIT 5
                """
            ).fetchall()
            exact_scores = {vid: s for vid, s in duck.sql(
                f"""
                SELECT vec_id, round((1 + list_cosine_similarity(
                       embedding, {v!r}::DOUBLE[])) / 2, 6) AS s
                FROM '{SF_DIR}/embeddings.parquet'
                """
            ).fetchall()}
            for r in got:
                assert r.s == pytest.approx(exact_scores[r.id], abs=1e-6)
            recalls.append(
                len({r.id for r in got} & {vid for vid, _ in exp}) / 5
            )
        # the query vector itself always lands in a probed cell, so its
        # own id (cos=1) is always recalled; neighbors usually share it
        assert sum(recalls) / len(recalls) >= 0.6
    finally:
        vector_engine._vector_ann.clear()
        vector_engine.clear_caches()


def test_vector_query_nodes_ivf_plan_is_cell_pruned(vector_engine, spark):
    """Plan pin (VERDICT r10 #2 'done' criterion): the trained path's
    candidate frame filters the celled corpus on `cell IN (probed)` —
    the probe is a driver-side numpy dot, the Spark plan never folds the
    full corpus."""
    v = _qvec(spark)
    vector_engine.train_vector_index("emb_idx", n_cells=8, nprobe=2, iters=1)
    try:
        cand, how = vector_engine._vector_candidate_frame(
            "emb_idx", "Emb", "embedding", v
        )
        assert how == "ivf"
        plan = cand._jdf.queryExecution().optimizedPlan().toString()
        assert "cell" in plan and " IN " in plan.replace("IN (", " IN (")
    finally:
        vector_engine._vector_ann.clear()
        vector_engine.clear_caches()


def test_vector_query_nodes_lazy_unfrozen(vector_engine, spark):
    """Round 12 (VERDICT r11 #1): the winner top-k is a LAZY plan — a
    re-registered base table is reflected at the next cypher() WITHOUT
    clear_caches(), and no collect happens at cypher() time."""
    v = _qvec(spark)
    q = (
        "CALL db.index.vector.queryNodes('emb_idx', 4, $v) "
        "YIELD node, score RETURN node.vec_id AS id ORDER BY id"
    )
    first = [r.id for r in vector_engine.cypher(q, params={"v": v}).collect()]
    assert len(first) == 4
    # cypher() alone runs NO job: building the plan must not collect
    df = vector_engine.cypher(q, params={"v": v})  # no .collect()
    assert df.columns == ["id"]
    # shrink the corpus to the 2 winners it does NOT contain -> the same
    # query must now return different winners, with no cache clearing
    full = vector_engine.tables.get("embeddings")
    keep = full.filter(~full.vec_id.isin(first[:2]))
    vector_engine.tables.register("embeddings", lambda: keep)
    try:
        after = [
            r.id for r in vector_engine.cypher(q, params={"v": v}).collect()
        ]
        assert len(after) == 4 and not set(after) & set(first[:2])
    finally:
        from tests.conftest import SF_DIR

        vector_engine.tables.register(
            "embeddings",
            lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        )


def test_vector_query_composition_shapes(vector_engine, spark):
    """Round 12: the per-compile virtual winner tables compose — a CALL
    index surface works inside UNION branches, inside CALL { }
    subqueries, and twice within one query (independent winner
    frames)."""
    v = _qvec(spark)
    u = sorted(
        r.id
        for r in vector_engine.cypher(
            "CALL db.index.vector.queryNodes('emb_idx', 2, $v) "
            "YIELD node, score RETURN id(node) AS id "
            "UNION "
            "CALL db.index.vector.queryNodes('emb_idx', 3, $v) "
            "YIELD node, score RETURN id(node) AS id",
            params={"v": v},
        ).collect()
    )
    assert len(u) == 3  # k=2 winners ⊂ k=3 winners, UNION dedups
    sub = sorted(
        map(
            tuple,
            vector_engine.cypher(
                "MATCH (e:Emb) WHERE e.vec_id < 3 "
                "CALL { CALL db.index.vector.queryNodes('emb_idx', 2, $v)"
                " YIELD node, score RETURN count(*) AS k } "
                "RETURN e.vec_id AS id, k",
                params={"v": v},
            ).collect(),
        )
    )
    assert sub == [(0, 2), (1, 2), (2, 2)]
    two = vector_engine.cypher(
        "CALL db.index.vector.queryNodes('emb_idx', 2, $v) "
        "YIELD node AS n1, score AS s1 "
        "CALL db.index.vector.queryNodes('emb_idx', 3, $v) "
        "YIELD node AS n2, score AS s2 "
        "RETURN count(*) AS c",
        params={"v": v},
    ).collect()[0].c
    assert two == 6


def test_vector_query_nodes_k_beyond_1024(vector_engine, spark):
    """Round 12: k is unbounded (no driver-side winner literal) — a k
    larger than the corpus returns every row, ordered by score."""
    v = _qvec(spark)
    total = vector_engine.tables.get("embeddings").count()
    got = vector_engine.cypher(
        "CALL db.index.vector.queryNodes('emb_idx', 5000, $v) "
        "YIELD node, score RETURN count(*) AS c",
        params={"v": v},
    ).collect()[0].c
    assert got == total


def test_train_vector_index_errors(vector_engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerBindingError,
        TranspilerNotSupportedError,
    )

    with pytest.raises(TranspilerBindingError, match="no vector index"):
        vector_engine.train_vector_index("nope")
    with pytest.raises(TranspilerBindingError, match="nprobe"):
        vector_engine.train_vector_index("emb_idx", n_cells=4, nprobe=9)


def test_train_vector_index_euclidean(vector_engine, spark):
    """Round 12 (VERDICT r11 #5): euclidean indexes train plain-L2
    Lloyd's cells. Exhaustive probe (nprobe == n_cells) must equal the
    brute scan exactly; a 1-cell probe prunes candidates."""
    v = _qvec(spark)
    q = (
        "CALL db.index.vector.queryNodes('emb_l2', 6, $v) "
        "YIELD node, score "
        "RETURN node.vec_id AS id, round(score, 9) AS s ORDER BY s DESC, id"
    )
    try:
        exact = [
            (r.id, r.s)
            for r in vector_engine.cypher(q, params={"v": v}).collect()
        ]
        vector_engine.train_vector_index(
            "emb_l2", n_cells=6, nprobe=6, iters=2
        )
        trained = [
            (r.id, r.s)
            for r in vector_engine.cypher(q, params={"v": v}).collect()
        ]
        assert trained == exact and exact
        # pruned probe: candidates come from ONE cell only
        vector_engine.train_vector_index(
            "emb_l2", n_cells=6, nprobe=1, iters=2
        )
        cents, nprobe, celled, books, _ = vector_engine._vector_ann[
            "emb_l2"
        ][:5]
        assert books is None and nprobe == 1
        cell_sizes = {
            r.cell: r.n
            for r in celled.groupBy("cell").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        pruned = vector_engine.cypher(
            "CALL db.index.vector.queryNodes('emb_l2', 10000, $v) "
            "YIELD node, score RETURN count(*) AS c",
            params={"v": v},
        ).collect()[0].c
        assert pruned in cell_sizes.values()  # exactly one cell scanned
        assert pruned < sum(cell_sizes.values())
        # euclidean IVFPQ (round 12): raw-space codebooks, exhaustive
        # probe + big refine must reproduce the exact top-k
        vector_engine.train_vector_index(
            "emb_l2", n_cells=6, nprobe=6, iters=2, pq_m=8,
            refine_factor=50,
        )
        pq = [
            (r.id, r.s)
            for r in vector_engine.cypher(q, params={"v": v}).collect()
        ]
        assert pq == exact
    finally:
        vector_engine._vector_ann.clear()
        vector_engine.clear_caches()


# -- round 11: CALL db.index.vector.queryRelationships ------------------------


@pytest.fixture(scope="module")
def rel_vector_engine(spark):
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df("ta", arrow_df(spark, [(1,), (2,)], "id long"))
    reg.register_df(
        "tb", arrow_df(spark, [(10,), (20,), (30,)], "id long")
    )
    rows = [
        (1, 10, [1.0, 0.0], 0.5),
        (1, 20, [0.8, 0.6], 0.7),
        (2, 20, [0.0, 1.0], 0.9),
        (2, 30, [0.6, 0.8], 0.1),
    ]
    reg.register_df(
        "tr",
        arrow_df(spark, 
            rows, "src long, dst long, emb array<float>, w double"
        ),
    )
    g = GraphSchema(
        [
            NodeSchema("A", "ta", "id", (), "bigint"),
            NodeSchema("B", "tb", "id", (), "bigint"),
        ],
        [
            EdgeSchema(
                "R", "A", "B", "tr", "src", "dst",
                (
                    EntityProperty("emb", "array<float>"),
                    EntityProperty("w", "double"),
                ),
            )
        ],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_relationship_vector_index("remb", "R", "emb")
    return eng


def test_vector_query_relationships(rel_vector_engine):
    """CALL db.index.vector.queryRelationships yields a REAL
    relationship entity + the exact Lucene score; hand-derived oracle:
    cosines vs [1,0] are 1.0/0.8/0.0/0.6 -> scores 1.0/0.9/0.5/0.8."""
    v = [1.0, 0.0]
    got = [
        tuple(r)
        for r in rel_vector_engine.cypher(
            "CALL db.index.vector.queryRelationships('remb', 2, $v) "
            "YIELD relationship AS r, score "
            "RETURN type(r) AS t, r.w AS w, round(score, 4) AS s "
            "ORDER BY s DESC",
            params={"v": v},
        ).collect()
    ]
    assert got == [("R", 0.5, 1.0), ("R", 0.7, 0.9)]
    # standalone CALL implies YIELD relationship, score
    st = rel_vector_engine.cypher(
        "CALL db.index.vector.queryRelationships('remb', 3, $v)",
        params={"v": v},
    )
    assert st.columns == ["relationship", "score"] and st.count() == 3
    # YIELD ... WHERE composes
    c = rel_vector_engine.cypher(
        "CALL db.index.vector.queryRelationships('remb', 4, $v) "
        "YIELD relationship AS r, score WHERE score >= 0.8 "
        "RETURN count(*) AS c",
        params={"v": v},
    ).collect()[0].c
    assert c == 3


def test_vector_query_relationships_parallel_edges(spark):
    """Round 12 (VERDICT r11 #3): the winner identity includes the
    indexed vector — PARALLEL relationships sharing endpoints no longer
    co-match. Two (1)->(10) edges with different vectors: k=1 must
    return exactly the winning edge's own properties."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df("pa", arrow_df(spark, [(1,)], "id long"))
    reg.register_df("pb", arrow_df(spark, [(10,)], "id long"))
    reg.register_df(
        "pr",
        arrow_df(spark, 
            [
                (1, 10, [1.0, 0.0], "aligned"),
                (1, 10, [0.0, 1.0], "orthogonal"),
            ],
            "src long, dst long, emb array<float>, tag string",
        ),
    )
    g = GraphSchema(
        [
            NodeSchema("PA", "pa", "id", (), "bigint"),
            NodeSchema("PB", "pb", "id", (), "bigint"),
        ],
        [
            EdgeSchema(
                "PR", "PA", "PB", "pr", "src", "dst",
                (
                    EntityProperty("emb", "array<float>"),
                    EntityProperty("tag", "string"),
                ),
            )
        ],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_relationship_vector_index("pemb", "PR", "emb")
    got = [
        tuple(r)
        for r in eng.cypher(
            "CALL db.index.vector.queryRelationships('pemb', 1, $v) "
            "YIELD relationship AS r, score "
            "RETURN r.tag AS tag, round(score, 4) AS s",
            params={"v": [1.0, 0.0]},
        ).collect()
    ]
    assert got == [("aligned", 1.0)]  # r11 co-matched both parallel edges


def test_vector_query_relationships_errors(rel_vector_engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerBindingError,
        TranspilerNotSupportedError,
    )

    v = [1.0, 0.0]
    with pytest.raises(TranspilerBindingError, match="no relationship"):
        rel_vector_engine.cypher(
            "CALL db.index.vector.queryRelationships('nope', 2, $v) "
            "YIELD relationship, score RETURN score",
            params={"v": v},
        )
    with pytest.raises(
        TranspilerNotSupportedError, match="relationship, score"
    ):
        rel_vector_engine.cypher(
            "CALL db.index.vector.queryRelationships('remb', 2, $v) "
            "YIELD node, score RETURN score",
            params={"v": v},
        )
    with pytest.raises(TranspilerBindingError, match="no property"):
        rel_vector_engine.create_relationship_vector_index(
            "bad", "R", "nope"
        )
    with pytest.raises(TranspilerBindingError, match="No relationship"):
        rel_vector_engine.create_relationship_vector_index(
            "bad", "NOPE", "emb"
        )


def test_vector_query_nodes_ivfpq_refine(vector_engine, spark):
    """Round 11: pq_m adds a JVM-side ADC pre-rank inside probed cells.
    With every cell probed and refine covering the whole corpus, the
    exact-fold re-rank sees all candidates, so the result must equal the
    brute scan exactly; with a tight refine the scores stay EXACT per
    returned id (only recall is approximate). The per-query ADC path is
    JVM-only — no Python eval in the candidate plan."""
    v = _qvec(spark)
    q = (
        "CALL db.index.vector.queryNodes('emb_idx', 5, $v) "
        "YIELD node, score "
        "RETURN node.vec_id AS id, round(score, 9) AS s ORDER BY s DESC, id"
    )
    vector_engine.clear_caches()
    exact = [(r.id, r.s) for r in vector_engine.cypher(q, params={"v": v}).collect()]
    vector_engine.train_vector_index(
        "emb_idx", n_cells=8, nprobe=8, iters=1,
        pq_m=8, pq_ksub=32, refine_factor=1000,
    )
    try:
        cand, how = vector_engine._vector_candidate_frame(
            "emb_idx", "Emb", "embedding", v
        )
        assert how == "ivfpq" and "code" in cand.columns
        # the stored celled frame is localCheckpoint'ed: the per-query
        # plan gathers ADC from a literal lookup table — no Python
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        got = [(r.id, r.s) for r in vector_engine.cypher(q, params={"v": v}).collect()]
        assert got == exact
    finally:
        vector_engine._vector_ann.clear()
        vector_engine.clear_caches()
    # tight refine: exact scores per returned id, self always recalled
    vector_engine.train_vector_index(
        "emb_idx", n_cells=8, nprobe=3, iters=1,
        pq_m=8, pq_ksub=32, refine_factor=4,
    )
    try:
        got = vector_engine.cypher(q, params={"v": v}).collect()
        exact_by_id = dict(exact)
        # scores of returned ids match the exact fold where the id is in
        # the exact top-5; the query vector's own row (score 1.0) leads
        assert got[0].s == pytest.approx(1.0, abs=1e-9)
        for r in got:
            if r.id in exact_by_id:
                assert r.s == pytest.approx(exact_by_id[r.id], abs=1e-9)
    finally:
        vector_engine._vector_ann.clear()
        vector_engine.clear_caches()


# -- round 11: CALL db.index.fulltext.queryNodes (BM25) -----------------------


@pytest.fixture(scope="module")
def fulltext_engine(spark):
    from tests.conftest import SF_DIR

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
                    EntityProperty("lang", "string"),
                ),
                "bigint",
            )
        ],
        [],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_fulltext_index("docs_ft", "Doc", "text")
    eng.create_fulltext_index("docs_multi", "Doc", ["text", "source"])
    return eng


def _bm25_oracle(spark, query, limit):
    """Plain-python Okapi BM25 (k1=1.2, b=0.75) over the documents
    parquet with the same lowercase non-alnum analyzer."""
    import math
    import re

    from tests.conftest import SF_DIR

    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    toks = {
        r.doc_id: [
            x for x in re.split(r"[^a-z0-9]+", r.text.lower()) if x
        ]
        for r in rows
        if r.text is not None
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    terms = sorted(set(re.split(r"[^a-z0-9]+", query.lower())) - {""})
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for t in terms:
            df = sum(1 for v in toks.values() if t in v)
            if df == 0:
                continue
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            tf = tk.count(t)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        if s > 0:
            out[i] = s
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    return [(i, round(s, 6)) for i, s in ranked]


def test_fulltext_query_nodes_bm25(fulltext_engine, spark):
    """Exact Okapi BM25 vs a plain-python oracle over the documents
    parquet; node binds a real entity; {limit: n} caps; memoized."""
    got = [
        (r.id, r.s)
        for r in fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_ft', "
            "'fast merge scan', {limit: 10}) YIELD node, score "
            "RETURN node.doc_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id"
        ).collect()
    ]
    exp = _bm25_oracle(spark, "fast merge scan", 10)
    assert got == exp and got  # non-empty on the synthetic corpus
    # composition + memo hit
    c = fulltext_engine.cypher(
        "CALL db.index.fulltext.queryNodes('docs_ft', "
        "'fast merge scan', {limit: 10}) YIELD node, score "
        "WHERE score > 0 RETURN count(*) AS c"
    ).collect()[0].c
    assert c == len(exp)
    # standalone CALL implies YIELD node, score
    st = fulltext_engine.cypher(
        "CALL db.index.fulltext.queryNodes('docs_ft', 'vector', {limit: 3})"
    )
    assert st.columns == ["node", "score"] and st.count() <= 3


def _bm25_multi_oracle(spark, fields, query, limit):
    """Independent plain-python oracle for the round-12 fulltext
    semantics: per-FIELD Okapi BM25 (k1=1.2, b=0.75, per-field N/avgdl/
    df) summed per document; minimal Lucene boolean subset — bare terms
    SHOULD, +MUST, -MUST_NOT, quoted phrases = exact analyzed token
    sequence scored by member terms."""
    import math
    import re

    from tests.conftest import SF_DIR

    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", *fields
    ).collect()

    def analyze(s):
        return [x for x in re.split(r"[^a-z0-9]+", s.lower()) if x]

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
    for m in re.finditer(r'([+\-]?)(?:"([^"]*)"|(\S+))', query):
        mod, quoted, bare = m.group(1), m.group(2), m.group(3)
        tks = analyze(quoted if quoted is not None else bare)
        if not tks:
            continue
        pieces = (
            [tuple(tks)]
            if quoted is not None and len(tks) > 1
            else [(t,) for t in tks]
        )
        for p in pieces:
            if (mod, p) not in seen:
                seen.add((mod, p))
                clauses.append((mod, p))

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
        return idf * tf * 2.2 / (
            tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl)
        )

    def contains_seq(tk, seq):
        ln = len(seq)
        return any(
            tuple(tk[i:i + ln]) == seq for i in range(len(tk) - ln + 1)
        )

    def clause_match(did, tks):
        for f in fields:
            tk = toks[f].get(did)
            if tk is None:
                continue
            if len(tks) == 1:
                if tks[0] in tk:
                    return True
            elif contains_seq(tk, tks):
                return True
        return False

    out = {}
    dids = {r.doc_id for r in rows}
    for did in dids:
        s = 0.0
        match_any = False
        ok = True
        for mod, tks in clauses:
            m = clause_match(did, tks)
            if mod == "-":
                if m:
                    ok = False
                continue
            if mod == "+" and not m:
                ok = False
            if m:
                match_any = True
                s += sum(
                    field_term_score(f, t, did)
                    for t in tks
                    for f in fields
                )
        if ok and match_any and s > 0:
            out[did] = s
    ranked = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
    return [(i, round(s, 6)) for i, s in ranked]


def test_fulltext_multi_property_index(fulltext_engine, spark):
    """Round 12 (VERDICT r11 #4): per-field BM25 summed across the
    indexed properties, vs the independent python oracle."""
    got = [
        (r.id, r.s)
        for r in fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_multi', "
            "'fast src3 merge', {limit: 12}) YIELD node, score "
            "RETURN node.doc_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id"
        ).collect()
    ]
    exp = _bm25_multi_oracle(spark, ["text", "source"], "fast src3 merge", 12)
    assert got == exp and got


def test_fulltext_boolean_operators(fulltext_engine, spark):
    """+term is MUST, -term is MUST_NOT; scores still exact BM25."""
    q = '+fast merge -slow'
    got = [
        (r.id, r.s)
        for r in fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_ft', $q, "
            "{limit: 15}) YIELD node, score "
            "RETURN node.doc_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id",
            params={"q": q},
        ).collect()
    ]
    exp = _bm25_multi_oracle(spark, ["text"], q, 15)
    assert got == exp and got
    # every winner contains 'fast' and not 'slow'
    import re

    from tests.conftest import SF_DIR

    texts = {
        r.doc_id: set(re.split(r"[^a-z0-9]+", r.text.lower()))
        for r in spark.read.parquet(
            f"{SF_DIR}/documents.parquet"
        ).collect()
        if r.text is not None
    }
    for did, _s in got:
        assert "fast" in texts[did] and "slow" not in texts[did]


def test_fulltext_phrase_query(fulltext_engine, spark):
    """Quoted phrases match the exact analyzed token sequence."""
    q = '+"batch batch" merge'
    got = [
        (r.id, r.s)
        for r in fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_ft', $q, "
            "{limit: 10}) YIELD node, score "
            "RETURN node.doc_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id",
            params={"q": q},
        ).collect()
    ]
    exp = _bm25_multi_oracle(spark, ["text"], q, 10)
    assert got == exp and got
    # every winner really contains the adjacent sequence
    import re

    from tests.conftest import SF_DIR

    for did, _s in got:
        row = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(f"doc_id = {did}")
            .collect()[0]
        )
        tk = [x for x in re.split(r"[^a-z0-9]+", row.text.lower()) if x]
        assert any(
            tk[i:i + 2] == ["batch", "batch"] for i in range(len(tk) - 1)
        )


def test_fulltext_query_syntax_fuzz(fulltext_engine, spark):
    """Hypothesis differential for the minimal Lucene subset: random
    combinations of SHOULD/MUST/MUST_NOT terms and quoted phrases vs
    the independent python oracle — on BOTH the exact corpus-scan path
    and the materialized inverted-index path (term + position-adjacency
    evaluation), which must agree."""
    import hypothesis.strategies as st
    from hypothesis import HealthCheck, given, settings

    if "docs_fuzz_mat" not in fulltext_engine._fulltext_indexes:
        fulltext_engine.create_fulltext_index(
            "docs_fuzz_mat", "Doc", "text"
        )
        fulltext_engine.materialize_fulltext_index("docs_fuzz_mat")

    words = ["fast", "merge", "scan", "slow", "batch", "join", "zzz_absent"]

    @st.composite
    def ft_query(draw):
        n = draw(st.integers(1, 4))
        pieces = []
        for _ in range(n):
            mod = draw(st.sampled_from(["", "", "+", "-"]))
            if draw(st.booleans()):
                w1, w2 = draw(st.sampled_from(words)), draw(
                    st.sampled_from(words)
                )
                pieces.append(f'{mod}"{w1} {w2}"')
            else:
                pieces.append(mod + draw(st.sampled_from(words)))
        return " ".join(pieces)

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    @given(q=ft_query())
    def check(q):
        def run(idx):
            return [
                (r.id, r.s)
                for r in fulltext_engine.cypher(
                    f"CALL db.index.fulltext.queryNodes('{idx}', $q, "
                    "{limit: 8}) YIELD node, score "
                    "RETURN node.doc_id AS id, round(score, 6) AS s "
                    "ORDER BY s DESC, id",
                    params={"q": q},
                ).collect()
            ]

        exp = _bm25_multi_oracle(spark, ["text"], q, 8)
        assert run("docs_ft") == exp, ("scan", q)
        assert run("docs_fuzz_mat") == exp, ("postings", q)

    check()


def test_fulltext_skip_option(fulltext_engine, spark):
    """Round 12: Neo4j's {skip: m} option pages the ranked winners."""
    full = [
        (r.id, r.s)
        for r in fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_ft', 'fast merge', "
            "{limit: 10}) YIELD node, score "
            "RETURN node.doc_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id"
        ).collect()
    ]
    page2 = [
        (r.id, r.s)
        for r in fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_ft', 'fast merge', "
            "{limit: 5, skip: 5}) YIELD node, score "
            "RETURN node.doc_id AS id, round(score, 6) AS s "
            "ORDER BY s DESC, id"
        ).collect()
    ]
    assert page2 == full[5:10] and len(full) == 10


def test_fulltext_multi_property_ddl(fulltext_engine):
    """CREATE FULLTEXT INDEX ... ON EACH [n.a, n.b] registers a
    multi-property index; SHOW INDEXES lists the property list."""
    fulltext_engine.cypher(
        "CREATE FULLTEXT INDEX ddl_multi FOR (d:Doc) "
        "ON EACH [d.text, d.lang]"
    )
    rows = {
        r.name: r.property
        for r in fulltext_engine.cypher("SHOW INDEXES").collect()
    }
    assert rows["ddl_multi"] == "text,lang"
    fulltext_engine.cypher("DROP INDEX ddl_multi")


def test_fulltext_materialized_postings(fulltext_engine, spark):
    """Round 12: materialize_fulltext_index builds an inverted index —
    term-only queries route through the postings (never scanning the
    corpus) and score IDENTICALLY to the exact scan path; phrase
    queries keep the scan path; DROP INDEX releases the postings."""
    import copy

    def run(q):
        return [
            (r.id, r.s)
            for r in fulltext_engine.cypher(
                "CALL db.index.fulltext.queryNodes('docs_mat', $q, "
                "{limit: 12}) YIELD node, score "
                "RETURN node.doc_id AS id, round(score, 6) AS s "
                "ORDER BY s DESC, id",
                params={"q": q},
            ).collect()
        ]

    fulltext_engine.create_fulltext_index(
        "docs_mat", "Doc", ["text", "source"]
    )
    queries = ["fast merge scan", "+fast merge -slow", "src3 merge"]
    before = {q: run(q) for q in queries}
    fulltext_engine.materialize_fulltext_index("docs_mat")
    mode = {
        r.name: r.mode
        for r in fulltext_engine.cypher("SHOW INDEXES").collect()
    }
    assert mode["docs_mat"] == "MATERIALIZED"
    for q in queries:
        assert run(q) == before[q], q
    # phrase queries fall back to the exact scan path — still correct
    ph = run('+"batch batch" merge')
    assert ph == [
        (i, s)
        for i, s in _bm25_multi_oracle(
            spark, ["text", "source"], '+"batch batch" merge', 12
        )
    ]
    # plan check: BOTH term and PHRASE queries' winner subtrees read the
    # postings (an ExistingRDD from the localCheckpoint), not the
    # parquet corpus — phrases check position adjacency index-side
    for q in ("fast merge", '+"batch batch" merge'):
        df = fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_mat', $q, "
            "{limit: 5}) YIELD node, score RETURN score",
            params={"q": q},
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Scan ExistingRDD" in plan  # the checkpointed postings
        assert plan.count("documents.parquet") == 1, q  # node bind only
    fulltext_engine.cypher("DROP INDEX docs_mat")
    assert "docs_mat" not in fulltext_engine._fulltext_post


def test_fulltext_query_relationships(spark):
    """Round 12: relationship fulltext indexes — per-field BM25 over an
    edge table's string properties; parallel edges with different text
    don't co-match (null-safe property identity)."""
    import math

    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    rows = [
        (1, 10, "fast merge scan", 0.1),
        (1, 10, "slow table walk", 0.2),   # parallel edge, other text
        (2, 10, "merge merge merge", 0.3),
        (2, 20, None, 0.4),                # null text: never matches
        (1, 20, "fast fast join", 0.5),
    ]
    reg = TableRegistry()
    reg.register_df(
        "fa", arrow_df(spark, [(1,), (2,)], "id long")
    )
    reg.register_df(
        "fb", arrow_df(spark, [(10,), (20,)], "id long")
    )
    reg.register_df(
        "fr",
        arrow_df(spark, 
            rows, "src long, dst long, note string, w double"
        ),
    )
    g = GraphSchema(
        [
            NodeSchema("FA", "fa", "id", (), "bigint"),
            NodeSchema("FB", "fb", "id", (), "bigint"),
        ],
        [
            EdgeSchema(
                "FR", "FA", "FB", "fr", "src", "dst",
                (
                    EntityProperty("note", "string"),
                    EntityProperty("w", "double"),
                ),
            )
        ],
    )
    eng = CypherEngine(spark, g, reg)
    eng.cypher(
        "CREATE FULLTEXT INDEX fnote FOR ()-[r:FR]-() ON EACH [r.note]"
    )
    shown = {
        r.name: (r.entityType, r.property)
        for r in eng.cypher("SHOW INDEXES").collect()
    }
    assert shown["fnote"] == ("RELATIONSHIP", "note")

    got = [
        (r.w, r.s)
        for r in eng.cypher(
            "CALL db.index.fulltext.queryRelationships('fnote', "
            "'merge', {limit: 10}) YIELD relationship AS r, score "
            "RETURN r.w AS w, round(score, 6) AS s ORDER BY s DESC, w"
        ).collect()
    ]

    # plain-python oracle over the 4 non-null docs
    toks = {
        w: t.split()
        for (_s, _d, t, w) in rows
        if t is not None
    }
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = sum(1 for v in toks.values() if "merge" in v)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    exp = []
    for w, tk in toks.items():
        tf = tk.count("merge")
        if tf == 0:
            continue
        s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        exp.append((w, round(s, 6)))
    exp.sort(key=lambda x: (-x[1], x[0]))
    assert got == exp and len(got) == 2  # only the two merge-y edges
    # the parallel (1,10) edge WITHOUT 'merge' must not co-match:
    # every returned w belongs to an edge whose own text matched
    assert 0.2 not in {w for w, _ in got}


def test_fulltext_query_nodes_errors(fulltext_engine):
    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    with pytest.raises(TranspilerBindingError, match="no fulltext"):
        fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('nope', 'x') "
            "YIELD node, score RETURN score"
        )
    with pytest.raises(TranspilerBindingError, match="non-empty"):
        fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_ft', '') "
            "YIELD node, score RETURN score"
        )
    with pytest.raises(TranspilerBindingError, match="options"):
        fulltext_engine.cypher(
            "CALL db.index.fulltext.queryNodes('docs_ft', 'x', "
            "{nope: 1}) YIELD node, score RETURN score"
        )
    with pytest.raises(TranspilerBindingError, match="no property"):
        fulltext_engine.create_fulltext_index("bad", "Doc", "nope")


# -- round 11: index DDL (CREATE VECTOR/FULLTEXT INDEX, DROP INDEX) -----------


def test_index_ddl(spark):
    """Neo4j-5 index DDL runs through cypher(): CREATE VECTOR INDEX
    (node + relationship forms, OPTIONS similarity), CREATE FULLTEXT
    INDEX ... ON EACH [...], IF NOT EXISTS / IF EXISTS, DROP INDEX —
    each returns a one-row summary frame and registers/unregisters the
    engine-side index."""
    from tests.conftest import SF_DIR

    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )
    from opencyphertranspiler_spark.exceptions import (
        TranspilerBindingError,
        TranspilerNotSupportedError,
    )

    reg = TableRegistry()
    reg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
    )
    reg.register(
        "documents",
        lambda: spark.read.parquet(f"{SF_DIR}/documents.parquet"),
    )
    reg.register_df(
        "tr",
        arrow_df(spark, 
            [(0, 1, [1.0, 0.0])], "src long, dst long, emb array<float>"
        ),
    )
    g = GraphSchema(
        [
            NodeSchema(
                "Emb", "embeddings", "vec_id",
                (EntityProperty("embedding", "array<float>"),), "bigint",
            ),
            NodeSchema(
                "Doc", "documents", "doc_id",
                (EntityProperty("text", "string"),), "bigint",
            ),
        ],
        [
            EdgeSchema(
                "SIM", "Emb", "Emb", "tr", "src", "dst",
                (EntityProperty("emb", "array<float>"),),
            )
        ],
    )
    eng = CypherEngine(spark, g, reg)
    r = eng.cypher(
        "CREATE VECTOR INDEX emb_idx FOR (n:Emb) ON n.embedding"
    ).collect()
    assert (r[0].name, r[0].type, r[0].entity) == ("emb_idx", "VECTOR", "Emb")
    # idempotent under IF NOT EXISTS; typed error without
    assert eng.cypher(
        "CREATE VECTOR INDEX emb_idx IF NOT EXISTS FOR (n:Emb) "
        "ON n.embedding"
    ).collect()[0].state == "NOOP"
    with pytest.raises(TranspilerBindingError, match="already exists"):
        eng.cypher("CREATE VECTOR INDEX emb_idx FOR (n:Emb) ON n.embedding")
    # OPTIONS similarity_function is honored
    eng.cypher(
        "CREATE VECTOR INDEX e2 FOR (m:Emb) ON m.embedding OPTIONS "
        "{indexConfig: {`vector.dimensions`: 64, "
        "`vector.similarity_function`: 'euclidean'}}"
    ).collect()
    assert eng._vector_indexes["e2"][2] == "euclidean"
    # relationship + fulltext forms
    eng.cypher("CREATE VECTOR INDEX rsim FOR ()-[r:SIM]-() ON r.emb").collect()
    assert "rsim" in eng._rel_vector_indexes
    eng.cypher(
        "CREATE FULLTEXT INDEX dft FOR (d:Doc) ON EACH [d.text]"
    ).collect()
    assert "dft" in eng._fulltext_indexes
    # a DDL-created index serves queries
    row = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").first()
    v = [float(x) for x in row.embedding]
    assert eng.cypher(
        "CALL db.index.vector.queryNodes('emb_idx', 3, $v) "
        "YIELD node, score RETURN count(*) AS c",
        params={"v": v},
    ).collect()[0].c == 3
    # DROP semantics
    assert eng.cypher("DROP INDEX e2").collect()[0].state == "DROPPED"
    assert eng.cypher("DROP INDEX e2 IF EXISTS").collect()[0].state == "NOOP"
    with pytest.raises(TranspilerBindingError, match="no index"):
        eng.cypher("DROP INDEX e2")
    # alias mismatch is a typed error
    with pytest.raises(TranspilerNotSupportedError, match="alias"):
        eng.cypher("CREATE VECTOR INDEX bad FOR (n:Emb) ON x.embedding")
    # ordinary queries are untouched by the DDL pre-dispatch
    assert eng.cypher("MATCH (d:Doc) RETURN count(*) AS c").collect()[0].c > 0


def test_show_indexes(spark):
    """SHOW INDEXES lists every registered index with its kind and
    trained/exact mode (round 11)."""
    from tests.conftest import SF_DIR

    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
    )
    g = GraphSchema(
        [
            NodeSchema(
                "Emb", "embeddings", "vec_id",
                (EntityProperty("embedding", "array<float>"),), "bigint",
            )
        ],
        [],
    )
    eng = CypherEngine(spark, g, reg)
    assert eng.cypher("SHOW INDEXES").count() == 0
    eng.cypher("CREATE VECTOR INDEX vi FOR (n:Emb) ON n.embedding").collect()
    eng.create_fulltext_index("fi", "Emb", "embedding")
    rows = {
        (r.name, r.type, r.mode)
        for r in eng.cypher("SHOW INDEXES").collect()
    }
    assert rows == {("vi", "VECTOR", "EXACT"), ("fi", "FULLTEXT", "EXACT")}
    eng.train_vector_index("vi", n_cells=4, nprobe=2, iters=0)
    modes = {r.name: r.mode for r in eng.cypher("SHOW INDEXES").collect()}
    assert modes["vi"] == "TRAINED"
    eng.cypher("DROP INDEX vi").collect()
    assert eng.cypher("SHOW INDEXES").count() == 1


# -- round 11 (continuation): SCALAR imports in CALL { WITH x } --------------
# The correlated seed is a DISTINCT projection of the outer's value
# column; the join-back is null-safe (a null import value keeps its
# subquery rows). Previously a typed error ("only node-entity imports").


def test_call_scalar_import_in_where(engine, duck):
    got = engine.cypher(
        "MATCH (n:Nation) WITH avg(n.n_nationkey) AS m "
        "CALL { WITH m MATCH (n2:Nation) WHERE n2.n_nationkey > m "
        "RETURN count(*) AS above } "
        "RETURN m, above"
    ).collect()
    exp = duck.sql(
        "SELECT (SELECT avg(n_nationkey) FROM nation) AS m, "
        "(SELECT count(*) FROM nation WHERE n_nationkey > "
        "(SELECT avg(n_nationkey) FROM nation)) AS above"
    ).fetchall()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))


def test_call_scalar_import_per_row(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r.r_regionkey AS rk "
                "CALL { WITH rk MATCH (n:Nation)-[:IN_REGION]->(r2:Region) "
                "WHERE r2.r_regionkey = rk RETURN count(*) AS n_nations } "
                "RETURN rk, n_nations"
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT r.r_regionkey, (SELECT count(*) FROM nation n "
                "WHERE n.n_regionkey = r.r_regionkey) FROM region r"
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_mixed_node_and_scalar_import_with_limit(engine, duck):
    # per-outer-row ORDER BY + LIMIT partitions on BOTH import kinds
    got = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r, 1 AS lim "
                "CALL { WITH r, lim MATCH (n:Nation)-[:IN_REGION]->(r) "
                "RETURN n.n_name AS nn ORDER BY nn LIMIT 1 } "
                "RETURN r.r_name AS rn, nn"
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT r_name, (SELECT min(n_name) FROM nation n "
                "WHERE n.n_regionkey = region.r_regionkey) FROM region"
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_scalar_import_null_value(engine):
    # a null import value must keep its subquery rows (null-safe
    # join-back), and null-dependent expressions evaluate per Cypher
    got = engine.cypher(
        "MATCH (r:Region) WHERE r.r_regionkey = 0 "
        "WITH CASE WHEN r.r_regionkey = 0 THEN null ELSE 1 END AS x "
        "CALL { WITH x RETURN x IS NULL AS isn, x + 1 AS plus } "
        "RETURN isn, plus"
    ).collect()
    assert len(got) == 1
    assert got[0].isn is True and got[0].plus is None


def test_call_relationship_import_unfenced(engine, duck):
    """Round 12 (VERDICT r11 #6): the r11 relationship-import fence is
    lifted — CALL {{ WITH rel }} runs once per edge identity."""
    got = engine.cypher(
        "MATCH (c:Customer)-[rel:PLACED]->(o:Orders) "
        "CALL { WITH rel RETURN 1 AS one } RETURN count(*) AS c"
    ).collect()[0].c
    exp = duck.sql("SELECT count(*) FROM orders").fetchall()[0][0]
    assert got == exp


# -- round 11 (continuation): outer SCALARS inside exists fabrics ------------
# Inline maps / inner WHEREs inside exists(pattern), EXISTS { } and the
# semi/anti/flag lowerings can reference outer scalar bindings; the
# fabric threads them through a distinct-value seed (the CALL scalar-
# import mechanics). Previously "Alias '<x>' does not exist".


def test_exists_subquery_with_outer_scalar(engine, duck):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r.r_regionkey AS rk "
                "MATCH (n:Nation) WHERE EXISTS { MATCH (n)-[:IN_REGION]->"
                "(:Region {r_regionkey: rk}) } "
                "RETURN rk, count(*) AS c"
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT r.r_regionkey, count(*) FROM region r "
                "JOIN nation n ON n.n_regionkey = r.r_regionkey "
                "GROUP BY 1"
            ).fetchall(),
        )
    )
    assert got == exp


def test_exists_subquery_with_outer_map_nested_path(engine, duck):
    """ADVICE r11 (low): an outer MAP scalar accessed through a NESTED
    path inside the exists fabric threads like a flat access."""
    got = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) "
                "WITH {outer: {rk: r.r_regionkey}} AS m "
                "MATCH (n:Nation) WHERE EXISTS { "
                "MATCH (n)-[:IN_REGION]->"
                "(:Region {r_regionkey: m.outer.rk}) } "
                "RETURN m.outer.rk AS rk, count(*) AS c"
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT r.r_regionkey, count(*) FROM region r "
                "JOIN nation n ON n.n_regionkey = r.r_regionkey "
                "GROUP BY 1"
            ).fetchall(),
        )
    )
    assert got == exp


def test_call_body_rand_rejected(engine):
    """ADVICE r11 (low): rand()/randomUUID() in a CALL body would run
    once per distinct correlation key, not per outer row — typed error
    instead of a silent divergence from Neo4j."""
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    for fn in ("rand()", "randomUUID()"):
        with pytest.raises(
            TranspilerNotSupportedError, match="per outer row"
        ):
            engine.cypher(
                "MATCH (c:Customer) WITH c.c_custkey AS k "
                f"CALL {{ WITH k RETURN k + 0 * {fn.replace('randomUUID()', 'size(randomUUID())')} AS x }} "
                "RETURN count(*) AS n"
            )


def test_call_body_rand_in_pattern_rejected(engine):
    """ADVICE r12 (medium): the nondeterminism fence must also see
    rand() hidden in a MATCH node-pattern's inline WHERE or property
    map inside the CALL body."""
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(TranspilerNotSupportedError, match="per outer row"):
        engine.cypher(
            "MATCH (c:Customer) WITH c.c_custkey AS k "
            "CALL { WITH k MATCH (n:Nation WHERE rand() < 0.5) "
            "RETURN count(n) AS x } RETURN count(*) AS n"
        )
    with pytest.raises(TranspilerNotSupportedError, match="per outer row"):
        engine.cypher(
            "MATCH (c:Customer) WITH c.c_custkey AS k "
            "CALL { WITH k MATCH (n:Nation {n_nationkey: "
            "toInteger(rand() * 25)}) RETURN count(n) AS x } "
            "RETURN count(*) AS n"
        )


def test_not_exists_and_or_positions_with_outer_scalar(engine, duck):
    n_nations = duck.sql("SELECT count(*) FROM nation").fetchone()[0]
    n_regions = duck.sql("SELECT count(*) FROM region").fetchone()[0]
    anti = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r.r_regionkey AS rk "
                "MATCH (n:Nation) WHERE NOT EXISTS { MATCH "
                "(n)-[:IN_REGION]->(:Region {r_regionkey: rk}) } "
                "RETURN rk, count(*) AS c"
            ).collect(),
        )
    )
    # every region excludes its own 5 nations
    assert anti == [(rk, n_nations - 5) for rk in range(n_regions)]
    # flag (OR) position: rk > 99 is never true, so same as plain EXISTS
    flag = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r.r_regionkey AS rk "
                "MATCH (n:Nation) WHERE EXISTS { MATCH "
                "(n)-[:IN_REGION]->(:Region {r_regionkey: rk}) } "
                "OR rk > 99 RETURN rk, count(*) AS c"
            ).collect(),
        )
    )
    assert flag == [(rk, 5) for rk in range(n_regions)]


def test_exists_scalar_in_inner_where(engine, duck):
    got = engine.cypher(
        "MATCH (c:Customer) WITH c, 300000.0 AS thr "
        "MATCH (c2:Customer) WHERE c2.c_custkey = c.c_custkey AND "
        "EXISTS { MATCH (c2)-[:PLACED]->(o:Orders) "
        "WHERE o.o_totalprice > thr } "
        "RETURN count(*) AS n"
    ).collect()[0].n
    exp = duck.sql(
        "SELECT count(*) FROM customer c WHERE EXISTS (SELECT 1 FROM "
        "orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_totalprice > 300000.0)"
    ).fetchone()[0]
    assert got == exp


def test_exists_scalar_inside_call_import(engine):
    got = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r.r_regionkey AS rk "
                "CALL { WITH rk MATCH (n:Nation) WHERE EXISTS { MATCH "
                "(n)-[:IN_REGION]->(:Region {r_regionkey: rk}) } "
                "RETURN count(*) AS c } "
                "RETURN rk, c"
            ).collect(),
        )
    )
    assert got == [(rk, 5) for rk in range(5)]


def test_pattern_comprehension_with_outer_scalar(engine, duck):
    # outer scalars in the comprehension's map expression and inner WHERE
    got = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r, 100 AS base "
                "RETURN r.r_regionkey AS rk, "
                "reduce(s = 0, x IN [(n:Nation)-[:IN_REGION]->(r) | "
                "n.n_nationkey + base] | s + x) AS tot"
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT r.r_regionkey, sum(n.n_nationkey + 100) "
                "FROM region r JOIN nation n "
                "ON n.n_regionkey = r.r_regionkey GROUP BY 1"
            ).fetchall(),
        )
    )
    assert got == exp
    wh = sorted(
        map(
            tuple,
            engine.cypher(
                "MATCH (r:Region) WITH r, 2 AS lim "
                "RETURN r.r_regionkey AS rk, "
                "size([(n:Nation)-[:IN_REGION]->(r) "
                "WHERE n.n_nationkey < lim | n.n_nationkey]) AS c"
            ).collect(),
        )
    )
    exp2 = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT r.r_regionkey, count(*) FILTER "
                "(n.n_nationkey < 2) FROM region r LEFT JOIN nation n "
                "ON n.n_regionkey = r.r_regionkey GROUP BY 1"
            ).fetchall(),
        )
    )
    assert wh == exp2


# -- round 11 (continuation): uncorrelated / bare-node subqueries ------------


def test_uncorrelated_count_subquery(engine, duck):
    n_nations = duck.sql("SELECT count(*) FROM nation").fetchone()[0]
    got = engine.cypher(
        "MATCH (r:Region) WHERE r.r_regionkey = 0 "
        "RETURN COUNT { MATCH (n:Nation) } AS all_nations"
    ).collect()[0].all_nations
    assert got == n_nations
    neg = duck.sql(
        "SELECT count(*) FROM customer WHERE c_acctbal < 0"
    ).fetchone()[0]
    got2 = engine.cypher(
        "MATCH (r:Region) WHERE r.r_regionkey = 0 "
        "RETURN COUNT { MATCH (c:Customer) WHERE c.c_acctbal < 0 } AS neg"
    ).collect()[0].neg
    assert got2 == neg


def test_uncorrelated_exists_subquery(engine, duck):
    n_regions = duck.sql("SELECT count(*) FROM region").fetchone()[0]
    hit = engine.cypher(
        "MATCH (r:Region) WHERE EXISTS { MATCH (n:Nation) "
        "WHERE n.n_name = 'NATION_3' } RETURN count(*) AS n"
    ).collect()[0].n
    assert hit == n_regions
    miss = engine.cypher(
        "MATCH (r:Region) WHERE EXISTS { MATCH (n:Nation) "
        "WHERE n.n_name = 'NOPE' } RETURN count(*) AS n"
    ).collect()[0].n
    assert miss == 0
    anti = engine.cypher(
        "MATCH (r:Region) WHERE NOT EXISTS { MATCH (n:Nation) "
        "WHERE n.n_name = 'NOPE' } RETURN count(*) AS n"
    ).collect()[0].n
    assert anti == n_regions
    # flag position (OR) with an uncorrelated pattern exists
    flag = engine.cypher(
        "MATCH (r:Region) WHERE EXISTS { MATCH "
        "(a:Customer)-[:PLACED]->(b:Orders) } OR r.r_regionkey > 99 "
        "RETURN count(*) AS n"
    ).collect()[0].n
    assert flag == n_regions


def test_bound_bare_node_exists(engine, duck):
    # EXISTS { MATCH (c) WHERE pred } with c bound outside evaluates the
    # predicate on the bound node
    got = engine.cypher(
        "MATCH (c:Customer) WHERE EXISTS { MATCH (c) "
        "WHERE c.c_acctbal > 0 } RETURN count(*) AS n"
    ).collect()[0].n
    exp = duck.sql(
        "SELECT count(*) FROM customer WHERE c_acctbal > 0"
    ).fetchone()[0]
    assert got == exp


def test_bare_anonymous_node_subquery_still_errors(engine):
    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with pytest.raises(
        TranspilerNotSupportedError, match="bare anonymous node"
    ):
        engine.cypher(
            "MATCH (r:Region) RETURN COUNT { MATCH (:Nation) } AS x"
        )
