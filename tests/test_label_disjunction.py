"""Label disjunction `(n:A|B)` (Neo4j 5, extension): tagged-union node
scans with composite (label, id) identity, rewritten before planning
(engine.py:_resolve_multi_label). DuckDB differentials on the TPC-H
overlay at sf0.001."""

from __future__ import annotations

# fuzz budget scales with SPARK_GRAFT_FUZZ_SCALE (default 1) — CI runs the
# cheap default; an extended hunt runs e.g. SPARK_GRAFT_FUZZ_SCALE=20
import os as _os

_FUZZ_SCALE = int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

import pytest

from opencyphertranspiler_spark.exceptions import (
    TranspilerNotSupportedError,
)


def pairs(df):
    return sorted(map(tuple, df.collect()))


def test_union_scan_and_labels(engine, duck):
    got = pairs(
        engine.cypher(
            "MATCH (n:Customer|Supplier) RETURN labels(n)[0] AS l, count(*) AS c"
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                "SELECT 'Customer' AS l, count(*) AS c FROM customer "
                "UNION ALL SELECT 'Supplier', count(*) FROM supplier"
            ).fetchall(),
        )
    )
    assert got == exp


def test_union_scan_null_padded_properties(engine, duck):
    # s_name exists only on the Supplier member; Customer rows null-pad
    got = engine.cypher(
        """
        MATCH (n:Customer|Supplier)
        RETURN count(n.c_name) AS customers, count(n.s_name) AS suppliers,
               count(*) AS total
        """
    ).collect()[0]
    nc = duck.sql("SELECT count(*) FROM customer").fetchone()[0]
    ns = duck.sql("SELECT count(*) FROM supplier").fetchone()[0]
    assert (got.customers, got.suppliers, got.total) == (nc, ns, nc + ns)


def test_union_hop_vs_duckdb(engine, duck):
    # members' FROM_NATION edges union into one virtual hop; the
    # unlabeled endpoint is inferred (both members reach Nation)
    got = pairs(
        engine.cypher(
            """
            MATCH (n:Customer|Supplier)-[r:FROM_NATION]->(x)
            RETURN x.n_name AS nm, type(r) AS t, count(*) AS c
            """
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT n_name AS nm, 'FROM_NATION' AS t, count(*) AS c
                FROM (SELECT c_nationkey AS k FROM customer
                      UNION ALL SELECT s_nationkey FROM supplier) u
                JOIN nation ON n_nationkey = k
                GROUP BY n_name
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_union_hop_either_direction(engine, duck):
    got = engine.cypher(
        "MATCH (x:Nation)-[:FROM_NATION]-(n:Customer|Supplier) "
        "RETURN count(*) AS c"
    ).collect()[0].c
    exp = duck.sql(
        "SELECT (SELECT count(*) FROM customer) + "
        "(SELECT count(*) FROM supplier)"
    ).fetchone()[0]
    assert got == exp


def test_union_optional_match_count_semantics(engine, duck):
    # OPTIONAL MATCH re-joins on the union node id: the composite
    # (label, id) identity keeps counts right even though raw ids
    # collide across the member tables
    got = pairs(
        engine.cypher(
            """
            MATCH (x:Nation)
            OPTIONAL MATCH (n:Customer|Supplier)-[:FROM_NATION]->(x)
            RETURN x.n_name AS nm, count(n) AS c, count(DISTINCT n) AS d
            """
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT n_name AS nm, count(u.k) AS c, count(u.k) AS d
                FROM nation LEFT JOIN (
                  SELECT c_nationkey AS k FROM customer
                  UNION ALL SELECT s_nationkey FROM supplier) u
                ON u.k = n_nationkey
                GROUP BY n_name
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_union_where_and_member_filter(engine, duck):
    # WHERE over the discriminator + a member-specific property
    got = pairs(
        engine.cypher(
            """
            MATCH (n:Customer|Supplier)
            WHERE labels(n)[0] = 'Supplier' OR n.c_acctbal > 9000
            RETURN labels(n)[0] AS l, count(*) AS c
            """
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT 'Supplier' AS l, count(*) AS c FROM supplier
                UNION ALL
                SELECT 'Customer', count(*) FROM customer WHERE c_acctbal > 9000
                """
            ).fetchall(),
        )
    )
    assert got == [t for t in exp if t[1] > 0]


def test_union_fences(engine):
    with pytest.raises(TranspilerNotSupportedError, match="No edge"):
        # Part has no FROM_NATION edge to Part
        engine.cypher(
            "MATCH (n:Customer|Part)-[:FROM_NATION]->(x:Part) "
            "RETURN n.p_name AS p"
        )
    with pytest.raises(TranspilerNotSupportedError, match="two label"):
        engine.cypher(
            "MATCH (a:Customer|Supplier)-[:FROM_NATION]->(b:Nation|Region) "
            "RETURN count(*) AS c"
        )
    with pytest.raises(TranspilerNotSupportedError, match="read-only"):
        engine.cypher_write("MATCH (n:Customer|Supplier) SET n.c_name = 'x'")
    with pytest.raises(TranspilerNotSupportedError, match="conjunction"):
        engine.cypher("MATCH (n:Customer|Supplier:Part) RETURN count(*) AS c")
    with pytest.raises(TranspilerNotSupportedError, match="relationship type"):
        # verbless hop adjacent to a disjunction
        engine.cypher("MATCH (n:Customer|Supplier)-->(x) RETURN count(*) AS c")


# ---------------------------------------------------------------------------
# differential fuzz: random member sets + random predicate trees over the
# tagged union, vs a compositional DuckDB oracle where a property absent
# from a member renders as a typed SQL NULL — exact 3VL parity by
# construction (round 8)
# ---------------------------------------------------------------------------

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

# label -> (table, [(numeric property, sql type)...])
MEMBERS = {
    "Customer": ("customer", [("c_acctbal", "DOUBLE")]),
    "Supplier": ("supplier", [("s_acctbal", "DOUBLE")]),
    "Part": ("part", [("p_size", "INTEGER"), ("p_retailprice", "DOUBLE")]),
    "Orders": ("orders", [("o_totalprice", "DOUBLE")]),
    "Nation": ("nation", [("n_nationkey", "BIGINT")]),
}


@st.composite
def disjunction_case(draw):
    labels = draw(
        st.lists(
            st.sampled_from(sorted(MEMBERS)), min_size=2, max_size=3, unique=True
        )
    )

    # predicate tree nodes render to (cypher, {member -> sql})
    def atom():
        kind = draw(st.integers(0, 1))
        if kind == 0:
            owner = draw(st.sampled_from(labels))
            prop, sqlt = draw(st.sampled_from(MEMBERS[owner][1]))
            cmp_op = draw(st.sampled_from([">", "<", ">=", "<=", "<>"]))
            v = draw(st.integers(0, 9000))
            cy = f"n.{prop} {cmp_op} {v}"
            sql = {
                m: (
                    f"({prop} {cmp_op} {v})"
                    if any(p == prop for p, _ in MEMBERS[m][1])
                    else f"(CAST(NULL AS {sqlt}) {cmp_op} {v})"
                )
                for m in labels
            }
            return cy, sql
        tgt = draw(st.sampled_from(labels))
        cy = f"labels(n)[0] = '{tgt}'"
        sql = {m: ("TRUE" if m == tgt else "FALSE") for m in labels}
        return cy, sql

    def tree(depth=0):
        if depth >= 2 or draw(st.booleans()):
            return atom()
        op = draw(st.sampled_from(["AND", "OR"]))
        a_cy, a_sql = tree(depth + 1)
        b_cy, b_sql = tree(depth + 1)
        if draw(st.booleans()):
            return (
                f"NOT (({a_cy}) {op} ({b_cy}))",
                {m: f"NOT (({a_sql[m]}) {op} ({b_sql[m]}))" for m in labels},
            )
        return (
            f"({a_cy}) {op} ({b_cy})",
            {m: f"({a_sql[m]}) {op} ({b_sql[m]})" for m in labels},
        )

    pred_cy, pred_sql = tree()
    cy = (
        f"MATCH (n:{'|'.join(labels)}) WHERE {pred_cy} "
        "RETURN labels(n)[0] AS l, count(*) AS c"
    )
    branches = " UNION ALL ".join(
        f"SELECT '{m}' AS l, count(*) AS c FROM {MEMBERS[m][0]} "
        f"WHERE {pred_sql[m]}"
        for m in labels
    )
    sql = f"SELECT l, c FROM ({branches}) u WHERE c > 0"
    return cy, sql


@settings(
    max_examples=15 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(case=disjunction_case())
def test_disjunction_fabric_vs_duckdb(engine, duck, case):
    cy, sql = case
    got = sorted(map(tuple, engine.cypher(cy).collect()))
    exp = sorted(map(tuple, duck.sql(sql).fetchall()))
    assert got == exp, f"\ncypher: {cy}\nsql: {sql}"


def test_union_inside_pattern_comprehension(engine, duck):
    # the tagged union works in expression-embedded patterns too — the
    # per-nation member degree via a pattern comprehension
    got = pairs(
        engine.cypher(
            """
            MATCH (x:Nation)
            RETURN x.n_name AS nm,
                   size([(n:Customer|Supplier)-[:FROM_NATION]->(x) | 1]) AS deg
            """
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT n_name AS nm,
                       (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
                     + (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS deg
                FROM nation
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_union_inside_exists_subquery(engine, duck):
    got = engine.cypher(
        """
        MATCH (x:Nation)
        WHERE EXISTS { MATCH (n:Customer|Supplier)-[:FROM_NATION]->(x)
                       WHERE n.s_acctbal > 4000 }
        RETURN count(*) AS c
        """
    ).collect()[0].c
    exp = duck.sql(
        "SELECT count(*) FROM nation WHERE EXISTS ("
        "SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey "
        "AND s_acctbal > 4000)"
    ).fetchone()[0]
    assert got == exp and got > 0


def test_union_optional_side_with_member_filter(engine, duck):
    got = pairs(
        engine.cypher(
            """
            MATCH (x:Nation)
            OPTIONAL MATCH (n:Customer|Supplier)-[:FROM_NATION]->(x)
            WHERE n.c_acctbal > 9000 OR n.s_acctbal > 4000
            RETURN x.n_name AS nm, count(n) AS c
            """
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT n_name AS nm, count(u.k) AS c
                FROM nation LEFT JOIN (
                    SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
                    UNION ALL
                    SELECT s_nationkey FROM supplier WHERE s_acctbal > 4000
                ) u ON u.k = n_nationkey
                GROUP BY n_name
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_union_in_longer_chain(engine, duck):
    # only the hops ADJACENT to the disjunction rewire; the rest of the
    # chain plans normally
    got = pairs(
        engine.cypher(
            """
            MATCH (n:Customer|Supplier)-[:FROM_NATION]->(x:Nation)
                  -[:IN_REGION]->(r:Region)
            RETURN r.r_name AS region, labels(n)[0] AS kind, count(*) AS c
            """
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT r_name AS region, kind, count(*) AS c
                FROM (SELECT c_nationkey AS k, 'Customer' AS kind FROM customer
                      UNION ALL SELECT s_nationkey, 'Supplier' FROM supplier) u
                JOIN nation ON n_nationkey = u.k
                JOIN region ON r_regionkey = n_regionkey
                GROUP BY r_name, kind
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_union_write_target_fences(engine):
    # CREATE/MERGE target patterns are fenced too, not just read patterns
    for q in (
        "CREATE (n:Customer|Supplier {c_custkey: 99999})",
        "MERGE (n:Customer|Supplier {c_custkey: 1})",
        "MATCH (n:Customer|Supplier) DETACH DELETE n",
    ):
        with pytest.raises(TranspilerNotSupportedError, match="read-only"):
            engine.cypher_write(q)
