"""Neo4j semantics for re-using a bound node alias with a label (round
12, ADVICE r11 high): the label on a re-occurrence is a per-row
PREDICATE, not a new binding — and labels from NON-dominating
occurrences (later clauses, OPTIONAL forks, EXISTS patterns, other UNION
branches) must never become hard filters on an earlier hop.

DuckDB differentials on the TPC-H overlay at sf0.001 (Orders-CONTAINS->
Lineitem-OF_PART->Part)."""

from __future__ import annotations

import pytest

from opencyphertranspiler_spark.exceptions import TranspilerBindingError


def rows(df):
    return sorted(map(tuple, df.collect()))


def test_optional_narrowing_keeps_unmatched_groups(engine, duck):
    # ADVICE r11 repro 1: the (x:Part) in the OPTIONAL MATCH is a
    # predicate INSIDE the fork — depth-1 Lineitem rows survive with
    # null l2 (r11 silently dropped them; Neo4j keeps them)
    got = rows(
        engine.cypher(
            "MATCH (o:Orders)-[:CONTAINS|OF_PART*1..2]->(x) "
            "OPTIONAL MATCH (x:Part)<-[:OF_PART]-(l2:Lineitem) "
            "RETURN labels(x)[0] AS lab, count(*) AS n"
        )
    )
    part_n = duck.sql(
        "SELECT sum(c*c) FROM (SELECT l_partkey, count(*) c "
        "FROM lineitem GROUP BY 1)"
    ).fetchall()[0][0]
    li_n = duck.sql("SELECT count(*) FROM lineitem").fetchall()[0][0]
    assert got == [("Lineitem", li_n), ("Part", int(part_n))]


def test_not_exists_narrowing(engine, duck):
    # ADVICE r11 repro 2: for x:Lineitem the (x:Part)... pattern can
    # never match -> NOT EXISTS is TRUE -> the Lineitem group survives
    # (r11 returned 0 rows)
    got = rows(
        engine.cypher(
            "MATCH (o:Orders)-[:CONTAINS|OF_PART*1..2]->(x) "
            "WHERE NOT EXISTS { (x:Part)<-[:OF_PART]-(:Lineitem) } "
            "RETURN labels(x)[0] AS lab, count(*) AS n"
        )
    )
    li_n = duck.sql("SELECT count(*) FROM lineitem").fetchall()[0][0]
    # every sf0.001 part has lineitems, so only the Lineitem group stays
    assert got == [("Lineitem", li_n)]


def test_dominating_binding_resolves_hetero_hop(engine, duck):
    # the re-used alias o carries its DOMINATING (earlier non-OPTIONAL)
    # binding into the var-length hop's label-chain analysis
    got = engine.cypher(
        "MATCH (o:Orders) "
        "MATCH (o)-[:CONTAINS|OF_PART*2..2]->(pt:Part) "
        "RETURN count(*) AS n"
    ).collect()[0].n
    exp = duck.sql("SELECT count(*) FROM lineitem").fetchall()[0][0]
    assert got == exp


def test_mismatched_relabel_is_empty_not_error(engine):
    # Neo4j: re-binding (c:Part) over a Customer-bound c filters every
    # row out — an EMPTY result, not a binding error
    got = engine.cypher(
        "MATCH (c:Customer) MATCH (c:Part) RETURN count(*) AS n"
    ).collect()[0].n
    assert got == 0


def test_union_alias_hop_in_later_clause(engine, duck):
    # a hop hanging off an unlabeled RE-occurrence of a disjunction-bound
    # alias (r11: "Cannot bind relationship ... ambiguous")
    got = rows(
        engine.cypher(
            "MATCH (x:Lineitem|Part) "
            "OPTIONAL MATCH (x)<-[:OF_PART]-(l:Lineitem) "
            "RETURN labels(x)[0] AS lab, count(l) AS n"
        )
    )
    li_n = duck.sql("SELECT count(*) FROM lineitem").fetchall()[0][0]
    assert got == [("Lineitem", 0), ("Part", li_n)]


def test_union_alias_narrowed_in_exists(engine, duck):
    got = rows(
        engine.cypher(
            "MATCH (x:Lineitem|Part) "
            "WHERE NOT EXISTS { (x)<-[:OF_PART]-(:Lineitem) } "
            "RETURN labels(x)[0] AS lab, count(*) AS n"
        )
    )
    li_n = duck.sql("SELECT count(*) FROM lineitem").fetchall()[0][0]
    # every part has lineitems at sf0.001 -> only Lineitem rows survive
    assert got == [("Lineitem", li_n)]


def test_with_rename_masks_binding(engine, duck):
    # WITH b AS a re-scopes: the binding follows the RENAME, so the
    # re-occurrence (a:Part) is consistent and (a:Orders) filters to zero
    o_n = duck.sql("SELECT count(*) FROM orders").fetchall()[0][0]
    p_n = duck.sql("SELECT count(*) FROM part").fetchall()[0][0]
    both = engine.cypher(
        "MATCH (a:Orders), (b:Part) WITH b AS a "
        "MATCH (a:Part) RETURN count(*) AS n"
    ).collect()[0].n
    assert both == o_n * p_n
    none = engine.cypher(
        "MATCH (a:Orders), (b:Part) WITH b AS a "
        "MATCH (a:Orders) RETURN count(*) AS n"
    ).collect()[0].n
    assert none == 0


def test_same_clause_conflict_still_errors(engine):
    # within ONE MATCH the labels are one binding (the reference's
    # fixpoint semantics) — a conflict stays a typed error
    with pytest.raises(TranspilerBindingError, match="Conflicting labels"):
        engine.cypher(
            "MATCH (x:Part), (x:Customer) RETURN count(*) AS n"
        ).collect()
