"""Functional write clauses (CREATE / MERGE / SET / REMOVE / DELETE).

The reference rejects every write clause (SURVEY.md §2.7); this is the
documented extension in writes.py. Tests cover the parser fences, every
write path against both graph storage layouts (FK-embedded TPC-H edges and
the movie graph's standalone edge tables), Neo4j-style eager validation,
and — the core architecture invariant — functional immutability: no write
ever changes a registered DataFrame.
"""

from __future__ import annotations

import os

import pytest

from opencyphertranspiler_spark.cypher import parse
from opencyphertranspiler_spark.exceptions import (
    TranspilerBindingError,
    TranspilerNotSupportedError,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def weng(spark):
    """Fresh engine per module: write tests derive tables from it."""
    from opencyphertranspiler_spark.catalog import get_engine

    return get_engine(spark, SF_DIR)


def rows(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------------------
# parser fences
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "q",
    [
        "MATCH (c:Customer) SET c.x = 1",
        "MATCH (c:Customer) DELETE c",
        "CREATE (n:Tag {id: 1})",
        "MATCH (c:Customer) MERGE (t:Tag {id: c.c_custkey})",
        "MATCH (c:Customer) REMOVE c.c_name",
    ],
)
def test_read_parse_keeps_write_fence(q):
    with pytest.raises(TranspilerNotSupportedError, match="cypher_write"):
        parse(q)


@pytest.mark.parametrize(
    "q,msg",
    [
        # round 7: a boundary WITH after a write is now supported (clause-
        # sequential segment semantics) — only the WITH-less write→MATCH
        # form stays fenced, with Neo4j's own "WITH is required" wording:
        ("MATCH (c:Customer) SET c.x = 1 MATCH (o:Orders) DELETE o", "WITH is required"),
        # round 6: SET c:Label / REMOVE c:Label / SET c += {map} are now
        # supported extensions — a non-map += stays fenced:
        ("MATCH (c:Customer) SET c += 5", "map"),
        (
            "CREATE (n:Tag {id: 1}) UNION CREATE (n:Tag {id: 2})",
            "UNION after a write",
        ),
        (
            "MATCH (c:Customer) RETURN c.c_custkey AS k UNION CREATE (n:Tag {id: 1})",
            "UNION over a write",
        ),
    ],
)
def test_write_parse_fences(q, msg):
    with pytest.raises(TranspilerNotSupportedError, match=msg):
        parse(q, allow_writes=True)


def test_write_clauses_parse_in_write_mode():
    q = parse(
        "MATCH (c:Customer) WHERE c.c_acctbal < 0 "
        "SET c.tier = 'debit' "
        "CREATE (t:Tag {id: c.c_custkey}) "
        "DETACH DELETE c",
        allow_writes=True,
    )
    from opencyphertranspiler_spark.cypher import ast as A

    kinds = [type(c).__name__ for c in q.clauses]
    assert kinds == ["MatchClause", "SetClause", "CreateClause", "DeleteClause"]
    assert isinstance(q.clauses[-1], A.DeleteClause) and q.clauses[-1].detach


# ---------------------------------------------------------------------------
# clause-sequential visibility (write -> boundary WITH -> reads see the write)
# ---------------------------------------------------------------------------


def test_set_with_match_observes_write(weng):
    # the MATCH after the boundary WITH runs against the post-SET table
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey <= 3 SET c.seg2 = 'X' "
        "WITH count(*) AS n "
        "MATCH (c:Customer) WHERE c.seg2 = 'X' "
        "RETURN n, count(c) AS seen"
    )
    row = res.returned.collect()[0]
    # sf0.001 custkeys are 0..149, so <= 3 matches four rows (0,1,2,3)
    assert row["n"] == 4 and row["seen"] == 4


def test_create_with_match_finds_new_node(weng):
    res = weng.cypher_write(
        "CREATE (c:Customer {c_custkey: 990001, c_name: 'fresh'}) "
        "WITH 1 AS one "
        "MATCH (c:Customer) WHERE c.c_custkey = 990001 RETURN c.c_name AS name"
    )
    assert [r["name"] for r in res.returned.collect()] == ["fresh"]


def test_delete_invisible_after_boundary(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey <= 5 DETACH DELETE c "
        "WITH 1 AS one "
        "MATCH (c:Customer) WHERE c.c_custkey <= 5 RETURN count(c) AS left"
    )
    assert res.returned.collect()[0]["left"] == 0
    # functional: the registered table is untouched (keys 0..5 = 6 rows)
    assert weng.tables.get("customer").filter("c_custkey <= 5").count() == 6


def test_multi_segment_chain_counters_accumulate(weng):
    # write -> WITH -> write -> RETURN: second segment reads post-write
    # state, and counters sum across segments
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 SET c.stage = 'a' "
        "WITH c "
        "MATCH (d:Customer) WHERE d.stage = 'a' SET d.stage2 = 'b' "
        "RETURN d.c_custkey AS k, d.stage AS s1, d.stage2 AS s2"
    )
    assert res.counts()["properties_set"] == 2
    assert {tuple(r) for r in res.returned.collect()} == {(1, "a", "b")}
    t = res.table("customer").filter("c_custkey = 1").collect()[0]
    assert t["stage"] == "a" and t["stage2"] == "b"


def test_boundary_with_carries_bindings(weng):
    # the WITH's bindings seed the next segment (c crosses the boundary)
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey <= 2 SET c.mark = true "
        "WITH c "
        "SET c.mark2 = c.c_custkey * 10 "
        "RETURN c.c_custkey AS k, c.mark2 AS m ORDER BY k"
    )
    assert [tuple(r) for r in res.returned.collect()] == [(0, 0), (1, 10), (2, 20)]


def test_two_segment_statement_matches_duckdb(weng, duck):
    # segment 1 flags negative-balance customers, segment 2 re-reads the
    # post-write table and counts flagged per segment — the DuckDB oracle
    # does both steps in one query over the same parquet
    # NB: the boundary must aggregate — a bare `WITH 1 AS one` would carry
    # one row PER matched customer (Cypher cardinality), multiplying the
    # second MATCH
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_acctbal < 0 SET c.neg = true "
        "WITH count(*) AS wrote "
        "MATCH (c:Customer) WHERE c.neg "
        "RETURN c.c_mktsegment AS seg, count(*) AS n"
    )
    got = {tuple(r) for r in res.returned.collect()}
    exp = {
        tuple(r)
        for r in duck.execute(
            "SELECT c_mktsegment AS seg, count(*) AS n FROM customer "
            "WHERE c_acctbal < 0 GROUP BY 1"
        ).fetchall()
    }
    assert got == exp and got


# ---------------------------------------------------------------------------
# SET / REMOVE
# ---------------------------------------------------------------------------


def test_set_existing_and_new_property(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_acctbal < 0 "
        "SET c.c_mktsegment = 'NEGATIVE', c.flagged = true"
    )
    t = res.table("customer")
    neg = t.filter("c_acctbal < 0")
    assert neg.filter("c_mktsegment <> 'NEGATIVE'").count() == 0
    assert neg.filter("NOT flagged").count() == 0
    # untouched rows keep their segment and get NULL for the new column
    pos = t.filter("c_acctbal >= 0")
    assert pos.filter("c_mktsegment = 'NEGATIVE'").count() == 0
    assert pos.filter("flagged IS NOT NULL").count() == 0
    n_neg = neg.count()
    assert res.counts() == {"properties_set": 2 * n_neg}
    # functional: the registered table is untouched
    orig = weng.tables.get("customer")
    assert "flagged" not in orig.columns
    assert orig.filter("c_mktsegment = 'NEGATIVE'").count() == 0


def test_set_value_cast_to_existing_column_type(weng):
    # int literal into a double column keeps the column's type
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 SET c.c_acctbal = 0"
    )
    t = res.table("customer")
    assert dict(t.dtypes)["c_acctbal"] == "double"
    assert t.filter("c_custkey = 1").collect()[0]["c_acctbal"] == 0.0


def test_set_through_with_pipeline(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
        "WITH c, count(o) AS n WHERE n >= 12 SET c.big = n"
    )
    t = res.table("customer")
    duck_df = weng.cypher(
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
        "WITH c, count(o) AS n WHERE n >= 12 RETURN c.c_custkey AS k, n"
    )
    expected = {(r["k"], r["n"]) for r in duck_df.collect()}
    got = {
        (r["c_custkey"], r["big"])
        for r in t.filter("big IS NOT NULL").collect()
    }
    assert got == expected and expected


def test_set_aggregate_in_write_expr_is_rejected(weng):
    with pytest.raises(TranspilerNotSupportedError, match="Aggregate"):
        weng.cypher_write("MATCH (c:Customer) SET c.n = count(*)")


def test_set_id_property_rejected(weng):
    with pytest.raises(TranspilerNotSupportedError, match="id property"):
        weng.cypher_write("MATCH (c:Customer) SET c.c_custkey = 1")


def test_remove_is_set_null(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey <= 3 REMOVE c.c_mktsegment"
    )
    t = res.table("customer")
    assert t.filter("c_custkey <= 3 AND c_mktsegment IS NOT NULL").count() == 0
    assert t.filter("c_custkey > 3 AND c_mktsegment IS NULL").count() == 0


def test_set_relationship_property(weng):
    # CONTAINS (Orders->Lineitem) carries l_linenumber in lineitem_node;
    # set a NEW edge property through the rel alias (composite key update)
    res = weng.cypher_write(
        "MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem) "
        "WHERE o.o_orderkey = 1 SET r.audited = true"
    )
    t = res.table("lineitem_node")
    assert (
        t.filter("l_orderkey = 1 AND NOT audited").count() == 0
        and t.filter("l_orderkey = 1").count() > 0
    )
    assert t.filter("l_orderkey <> 1 AND audited IS NOT NULL").count() == 0


def test_set_conflicting_values_resolve_to_max(weng):
    # two orders rows per customer produce conflicting SET values; the
    # documented determinism rule picks max()
    res = weng.cypher_write(
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
        "WHERE c.c_custkey = 4 SET c.last_price = o.o_totalprice"
    )
    got = res.table("customer").filter("c_custkey = 4").collect()[0]["last_price"]
    mx = (
        weng.cypher(
            "MATCH (c:Customer)-[:PLACED]->(o:Orders) WHERE c.c_custkey = 4 "
            "RETURN max(o.o_totalprice) AS m"
        ).collect()[0]["m"]
    )
    assert got == mx


# ---------------------------------------------------------------------------
# CREATE
# ---------------------------------------------------------------------------


def test_create_standalone_node(weng):
    res = weng.cypher_write(
        "CREATE (r:Region {r_regionkey: 77, r_name: 'ATLANTIS'})"
    )
    t = res.table("region")
    assert t.filter("r_regionkey = 77").collect()[0]["r_name"] == "ATLANTIS"
    assert res.counts() == {"nodes_created": 1}
    assert weng.tables.get("region").filter("r_regionkey = 77").count() == 0


def test_create_per_match_row_with_fk_edge(weng):
    # new Orders node + FK-embedded PLACED edge folded into the new row
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey >= 1 AND c.c_custkey <= 2 "
        "CREATE (c)-[:PLACED]->(o:Orders {o_orderkey: 900000 + c.c_custkey, "
        "o_totalprice: c.c_acctbal, o_orderstatus: 'N'})"
    )
    t = res.table("orders").filter("o_orderkey >= 900000")
    assert rows(t.select("o_orderkey", "o_custkey")) == {
        (900001, 1),
        (900002, 2),
    }
    c = res.counts()
    assert c["nodes_created"] == 2 and c["relationships_created"] == 2
    # round-trip through the post-write engine
    out = (
        res.engine()
        .cypher(
            "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
            "WHERE o.o_orderkey >= 900000 "
            "RETURN c.c_custkey AS k, o.o_totalprice AS p"
        )
        .collect()
    )
    assert len(out) == 2


def test_create_fk_edge_between_bound_nodes(weng):
    # re-parent an existing order: CREATE (c)-[:PLACED]->(o) with both
    # endpoints bound updates the FK column on the order's row
    res = weng.cypher_write(
        "MATCH (c:Customer), (o:Orders) "
        "WHERE c.c_custkey = 7 AND o.o_orderkey = 1 "
        "CREATE (c)-[:PLACED]->(o)"
    )
    assert (
        res.table("orders").filter("o_orderkey = 1").collect()[0]["o_custkey"]
        == 7
    )
    # the FK column write is the RELATIONSHIP, not a property: the
    # statistics must not report properties_set (ADVICE r5)
    counts = res.counts()
    assert counts["relationships_created"] == 1
    assert counts.get("properties_set", 0) == 0


def test_create_requires_id_property(weng):
    with pytest.raises(TranspilerBindingError, match="id property"):
        weng.cypher_write("CREATE (r:Region {r_name: 'NO_ID'})")


def test_create_duplicate_id_validation(weng):
    with pytest.raises(TranspilerBindingError, match="duplicate"):
        weng.cypher_write("CREATE (r:Region {r_regionkey: 0, r_name: 'DUP'})")
    # validate=False skips the eager check (documented production mode)
    res = weng.cypher_write(
        "CREATE (r:Region {r_regionkey: 0, r_name: 'DUP'})", validate=False
    )
    assert res.table("region").filter("r_regionkey = 0").count() == 2


def test_create_unknown_edge_schema_rejected(weng):
    with pytest.raises(TranspilerBindingError, match="edge schema"):
        weng.cypher_write(
            "MATCH (c:Customer), (r:Region) "
            "WHERE c.c_custkey = 1 AND r.r_regionkey = 0 "
            "CREATE (c)-[:LIVES_IN]->(r)"
        )


# ---------------------------------------------------------------------------
# MERGE
# ---------------------------------------------------------------------------


def test_merge_create_then_match(weng):
    q = (
        "MERGE (r:Region {r_regionkey: 88, r_name: 'LEMURIA'}) "
        "ON CREATE SET r.src = 'created' ON MATCH SET r.src = 'matched'"
    )
    r1 = weng.cypher_write(q)
    assert r1.table("region").filter("r_regionkey = 88").collect()[0]["src"] == "created"
    c1 = r1.counts()
    assert c1["nodes_created"] == 1 and c1["nodes_matched"] == 0
    r2 = r1.engine().cypher_write(q)
    assert r2.table("region").filter("r_regionkey = 88").collect()[0]["src"] == "matched"
    c2 = r2.counts()
    assert c2["nodes_created"] == 0 and c2["nodes_matched"] == 1
    # still exactly one row
    assert r2.table("region").filter("r_regionkey = 88").count() == 1


def test_merge_correlated_dedupes_candidates(weng):
    # one Tag-like Region per distinct nation region — candidates dedupe
    res = weng.cypher_write(
        "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
        "MERGE (x:Region {r_regionkey: 100 + r.r_regionkey, "
        "r_name: 'SHADOW'})"
    )
    t = res.table("region").filter("r_regionkey >= 100")
    assert t.count() == weng.tables.get("region").count()
    assert res.counts()["nodes_created"] == t.count()


def test_merge_id_collision_validated(weng):
    # region 0 exists with a different name -> can neither match nor create
    with pytest.raises(TranspilerBindingError, match="differ on the merge"):
        weng.cypher_write("MERGE (r:Region {r_regionkey: 0, r_name: 'WRONG'})")


def test_merge_relationship_fk_conflict_validated(weng):
    # order 1 already belongs to a different customer: FK-embedded storage
    # can hold only one PLACED edge per order row
    with pytest.raises(TranspilerBindingError, match="DIFFERENT relationship"):
        weng.cypher_write(
            "MATCH (c:Customer), (o:Orders) "
            "WHERE c.c_custkey = 7 AND o.o_orderkey = 1 "
            "MERGE (c)-[:PLACED]->(o)"
        )


def test_merge_relationship_fills_null_fk(weng):
    # detach-deleting the owner nulls the FK; MERGE can then re-attach
    r1 = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 4 DETACH DELETE c"
    )
    orphans = [
        r["o_orderkey"]
        for r in r1.table("orders").filter("o_custkey IS NULL").collect()
    ]
    assert orphans
    r2 = r1.engine().cypher_write(
        "MATCH (c:Customer), (o:Orders) "
        f"WHERE c.c_custkey = 7 AND o.o_orderkey = {orphans[0]} "
        "MERGE (c)-[:PLACED]->(o)"
    )
    assert (
        r2.table("orders")
        .filter(f"o_orderkey = {orphans[0]}")
        .collect()[0]["o_custkey"]
        == 7
    )
    assert r2.counts()["relationships_created"] == 1
    # merging the SAME edge again is a no-op
    r3 = r2.engine().cypher_write(
        "MATCH (c:Customer), (o:Orders) "
        f"WHERE c.c_custkey = 7 AND o.o_orderkey = {orphans[0]} "
        "MERGE (c)-[:PLACED]->(o)"
    )
    assert r3.counts()["relationships_created"] == 0


def test_merge_relationship_multi_partner_same_row(weng):
    # one statement binding TWO customers to the SAME null-FK order row
    # must not fan the orders table out into duplicate primary-key rows:
    # validate=True raises; validate=False resolves deterministically
    r1 = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 4 DETACH DELETE c"
    )
    orphans = [
        r["o_orderkey"]
        for r in r1.table("orders").filter("o_custkey IS NULL").collect()
    ]
    ok = orphans[0]
    partners = sorted(
        r["c_custkey"]
        for r in r1.table("customer").filter("c_custkey IN (2, 7)").collect()
    )
    assert partners == [2, 7]
    q = (
        "MATCH (c:Customer), (o:Orders) "
        f"WHERE c.c_custkey IN [2, 7] AND o.o_orderkey = {ok} "
        "MERGE (c)-[:PLACED]->(o)"
    )
    with pytest.raises(TranspilerBindingError, match="more than one"):
        r1.engine().cypher_write(q)
    r2 = r1.engine().cypher_write(q, validate=False)
    hit = r2.table("orders").filter(f"o_orderkey = {ok}").collect()
    assert len(hit) == 1  # no fan-out
    assert hit[0]["o_custkey"] == 7  # max() conflict rule
    # total row count unchanged (only FKs were touched)
    assert r2.table("orders").count() == r1.table("orders").count()


def test_merge_relationship_endpoints_must_be_bound(weng):
    with pytest.raises(TranspilerBindingError, match="bound"):
        weng.cypher_write("MERGE (c:Customer)-[:PLACED]->(o:Orders)")


# ---------------------------------------------------------------------------
# DELETE
# ---------------------------------------------------------------------------


def test_plain_delete_guards_dangling_edges(weng):
    with pytest.raises(TranspilerBindingError, match="DETACH DELETE"):
        weng.cypher_write("MATCH (c:Customer) WHERE c.c_custkey = 1 DELETE c")


def test_detach_delete_nulls_fk_embedded_edges(weng):
    orig_orders = weng.tables.get("orders").filter("o_custkey = 1").count()
    assert orig_orders > 0
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 DETACH DELETE c"
    )
    assert res.table("customer").filter("c_custkey = 1").count() == 0
    # orders survive as nodes, their PLACED FK is nulled
    assert res.table("orders").filter("o_custkey = 1").count() == 0
    assert res.counts()["nodes_deleted"] == 1
    # post-write engine: no PLACED edges from the ghost
    n = (
        res.engine()
        .cypher(
            "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
            "WHERE c.c_custkey = 1 RETURN count(*) AS n"
        )
        .collect()[0]["n"]
    )
    assert n == 0


def test_delete_leaf_without_edges_is_allowed(weng):
    res = weng.cypher_write(
        "CREATE (r:Region {r_regionkey: 55, r_name: 'TEMP'})"
    )
    res2 = res.engine().cypher_write(
        "MATCH (r:Region) WHERE r.r_regionkey = 55 DELETE r"
    )
    assert res2.table("region").filter("r_regionkey = 55").count() == 0


# ---------------------------------------------------------------------------
# standalone edge tables (movie graph layout)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def movie_weng(spark):
    from tests.test_movie_graph import movie_engine

    return movie_engine.__wrapped__(spark)


def test_create_edge_appends_standalone_table(movie_weng):
    res = movie_weng.cypher_write(
        "MATCH (p:Person), (m:Movie) "
        "WHERE p.Name = 'Bill Paxton' AND m.id = 'm2' "
        "CREATE (p)-[:ACTED_IN {Roles: 'Cameo'}]->(m)"
    )
    t = res.table("acted_in")
    assert rows(t.filter("Roles = 'Cameo'").select("_vertexId", "_sink")) == {
        ("p5", "m2")
    }
    assert t.count() == movie_weng.tables.get("acted_in").count() + 1
    assert res.counts()["relationships_created"] == 1
    # round-trip
    out = res.engine().cypher(
        "MATCH (p:Person)-[r:ACTED_IN]->(m:Movie) "
        "WHERE r.Roles = 'Cameo' RETURN p.Name AS n, m.Title AS t"
    )
    assert rows(out) == {("Bill Paxton", "You've Got Mail")}


def test_detach_delete_drops_standalone_edge_rows(movie_weng):
    res = movie_weng.cypher_write(
        "MATCH (p:Person) WHERE p.Name = 'Tom Hanks' DETACH DELETE p"
    )
    assert res.table("person").filter("id = 'p1'").count() == 0
    assert res.table("acted_in").filter("_vertexId = 'p1'").count() == 0
    assert res.table("follows").filter("_sink = 'p1'").count() == 0
    # unrelated edges survive
    assert res.table("acted_in").count() == 3
    # originals untouched
    assert movie_weng.tables.get("acted_in").filter("_vertexId = 'p1'").count() == 3


def test_merge_new_node_then_create_edge_chain(movie_weng):
    r1 = movie_weng.cypher_write(
        "MERGE (p:Person {id: 'p9', Name: 'New Actor'})"
    )
    r2 = r1.engine().cypher_write(
        "MATCH (p:Person), (m:Movie) "
        "WHERE p.id = 'p9' AND m.id = 'm3' "
        "CREATE (p)-[:ACTED_IN {Roles: 'Extra'}]->(m)"
    )
    out = r2.engine().cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) WHERE p.id = 'p9' "
        "RETURN m.Title AS t"
    )
    assert rows(out) == {("Apollo 13",)}


def test_label_inference_for_unlabeled_write_target(movie_weng):
    # d has no label; DIRECTED's schema pins it to Person
    res = movie_weng.cypher_write(
        "MATCH (d)-[:DIRECTED]->(m:Movie) SET d.IsDirector = true"
    )
    t = res.table("person")
    assert rows(
        t.filter("IsDirector").select("id")
    ) == {("p3",), ("p4",)}


def test_write_requires_resolvable_target(movie_weng):
    with pytest.raises(TranspilerBindingError, match="infer a label"):
        movie_weng.cypher_write("MATCH (x) SET x.flag = true")


# ---------------------------------------------------------------------------
# DuckDB differential for the gate-entry shape
# ---------------------------------------------------------------------------


def test_set_matches_duckdb_update(weng, duck):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_acctbal < 0 SET c.c_mktsegment = 'NEG'"
    )
    got = {
        (r["c_custkey"], r["c_mktsegment"])
        for r in res.table("customer").select("c_custkey", "c_mktsegment").collect()
    }
    exp = {
        tuple(r)
        for r in duck.execute(
            "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'NEG' "
            "ELSE c_mktsegment END FROM customer"
        ).fetchall()
    }
    assert got == exp


def test_merge_relationship_standalone_table(movie_weng):
    # p5 already ACTED_IN m3 -> no-op; p5 -> m1 is new -> appended
    q = (
        "MATCH (p:Person), (m:Movie) WHERE p.id = 'p5' AND m.id = '{mid}' "
        "MERGE (p)-[:ACTED_IN]->(m)"
    )
    r1 = movie_weng.cypher_write(q.format(mid="m3"))
    assert r1.counts()["relationships_created"] == 0
    assert r1.table("acted_in").count() == movie_weng.tables.get("acted_in").count()
    r2 = movie_weng.cypher_write(q.format(mid="m1"))
    assert r2.counts()["relationships_created"] == 1
    assert rows(
        r2.table("acted_in").filter("_vertexId = 'p5' AND _sink = 'm1'")
        .select("_vertexId", "_sink", "Roles")
    ) == {("p5", "m1", None)}


def test_merge_relationship_with_props_matches_whole_pattern(movie_weng):
    # (p1)-[:ACTED_IN {Roles: 'Sam'}]->(m1) exists -> no-op; a different
    # Roles value is a different pattern -> new edge row
    q = (
        "MATCH (p:Person), (m:Movie) WHERE p.id = 'p1' AND m.id = 'm1' "
        "MERGE (p)-[:ACTED_IN {{Roles: '{role}'}}]->(m)"
    )
    r1 = movie_weng.cypher_write(q.format(role="Sam"))
    assert r1.counts()["relationships_created"] == 0
    r2 = movie_weng.cypher_write(q.format(role="Understudy"))
    assert r2.counts()["relationships_created"] == 1
    assert (
        r2.table("acted_in").filter("_vertexId = 'p1' AND _sink = 'm1'").count()
        == 2
    )


# ---------------------------------------------------------------------------
# RETURN after writes (post-write values via substitution)
# ---------------------------------------------------------------------------


def test_set_return_observes_post_write_values(weng, duck):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_acctbal < 0 "
        "SET c.tier = 'debit' "
        "RETURN c.c_custkey AS k, c.tier AS t, c.c_acctbal AS bal"
    )
    got = {(r["k"], r["t"], r["bal"]) for r in res.returned.collect()}
    exp = {
        tuple(r)
        for r in duck.execute(
            "SELECT c_custkey, 'debit', c_acctbal FROM customer "
            "WHERE c_acctbal < 0"
        ).fetchall()
    }
    assert got == exp and got


def test_create_return_reads_created_and_unset_props(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey >= 1 AND c.c_custkey <= 2 "
        "CREATE (c)-[:PLACED]->(o:Orders {o_orderkey: 920000 + c.c_custkey, "
        "o_orderstatus: 'N'}) "
        "RETURN o.o_orderkey AS ok, o.o_orderstatus AS st, "
        "o.o_totalprice AS unset, c.c_custkey AS ck"
    )
    assert rows(res.returned) == {
        (920001, "N", None, 1),
        (920002, "N", None, 2),
    }
    # the write still happened alongside the RETURN
    assert res.table("orders").filter("o_orderkey >= 920000").count() == 2


def test_write_return_supports_aggregates(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_acctbal < 0 SET c.tier = 'debit' "
        "RETURN count(*) AS n"
    )
    n_neg = weng.tables.get("customer").filter("c_acctbal < 0").count()
    assert res.returned.collect()[0]["n"] == n_neg


def test_merge_return_fences_conditional_props(weng):
    q = (
        "MERGE (r:Region {{r_regionkey: 0, r_name: 'AFRICA'}}) "
        "ON MATCH SET r.seen = true RETURN {item}"
    )
    # merge props are exact -> returnable
    res = weng.cypher_write(q.format(item="r.r_name AS nm"))
    assert res.returned.collect()[0]["nm"] == "AFRICA"
    # ON-SET / other props are per-row conditional -> typed fence
    with pytest.raises(TranspilerNotSupportedError, match="conditional"):
        weng.cypher_write(q.format(item="r.seen AS s"))


def test_no_return_yields_none(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 2 SET c.tier = 'x'"
    )
    assert res.returned is None


# ---------------------------------------------------------------------------
# FOREACH (desugared to UNWIND + writes)
# ---------------------------------------------------------------------------


def test_foreach_creates_per_element(weng):
    res = weng.cypher_write(
        "FOREACH (k IN [61, 62, 63] | "
        "CREATE (r:Region {r_regionkey: k, r_name: 'F'}))"
    )
    assert rows(
        res.table("region")
        .filter("r_regionkey >= 61 AND r_regionkey <= 63")
        .select("r_regionkey", "r_name")
    ) == {(61, "F"), (62, "F"), (63, "F")}
    assert res.counts() == {"nodes_created": 3}


def test_foreach_correlated_set(weng):
    # per-customer list: the set applies once per element but the value is
    # per-row deterministic
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey >= 1 AND c.c_custkey <= 3 "
        "FOREACH (k IN [1, 2] | SET c.touched = k)"
    )
    t = res.table("customer").filter("c_custkey >= 1 AND c_custkey <= 3")
    # max-conflict rule: both elements set, 2 wins
    assert {r["touched"] for r in t.collect()} == {2}


def test_foreach_fences(weng):
    # round 7: RETURN after FOREACH is supported, but the element var is
    # scoped to the FOREACH body (Neo4j) — referencing it raises
    with pytest.raises(TranspilerBindingError, match="does not exist"):
        weng.cypher_write(
            "FOREACH (k IN [991] | CREATE (r:Region {r_regionkey: k})) RETURN k"
        )
    # round 7: nested FOREACH works for SET/REMOVE/DELETE/MERGE bodies;
    # only CREATE in an OUTER body keeps a fence (flattened desugar would
    # run it once per inner element)
    with pytest.raises(TranspilerNotSupportedError, match="OUTER body"):
        weng.cypher_write(
            "FOREACH (k IN [1] | CREATE (r:Region {r_regionkey: 900 + k}) "
            "FOREACH (j IN [2] | SET r.t = j))"
        )
    # round 7: FOREACH after a write works (synthetic WITH * boundary) —
    # see test_foreach_after_write_conditional_idiom


def test_foreach_return_restores_cardinality(weng):
    # RETURN after FOREACH keeps the PRE-FOREACH row count (the UNWIND
    # desugar is invisible) and observes post-write values
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey <= 2 "
        "FOREACH (x IN [1, 2, 3] | SET c.fe = x) "
        "RETURN c.c_custkey AS k, c.fe AS fe ORDER BY k"
    )
    assert [tuple(r) for r in res.returned.collect()] == [(0, 3), (1, 3), (2, 3)]


def test_foreach_with_boundary_visibility(weng):
    # WITH after FOREACH: pre-FOREACH cardinality at the boundary, and a
    # fresh MATCH afterwards observes the FOREACH's writes
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "FOREACH (x IN ['a', 'b'] | SET c.ftag = x) "
        "WITH count(*) AS n "
        "MATCH (d:Customer) WHERE d.ftag IS NOT NULL "
        "RETURN n, count(d) AS seen"
    )
    assert [tuple(r) for r in res.returned.collect()] == [(1, 1)]


def test_foreach_with_carries_entity(weng):
    # the boundary carries c re-anchored: the next segment reads (and
    # writes over) the post-FOREACH value
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey <= 1 "
        "FOREACH (x IN [10] | SET c.fv = x) "
        "WITH c "
        "SET c.fw = c.fv + 1 "
        "RETURN c.c_custkey AS k, c.fv AS v, c.fw AS w ORDER BY k"
    )
    assert [tuple(r) for r in res.returned.collect()] == [(0, 10, 11), (1, 10, 11)]


def test_foreach_create_then_match_differential(weng, duck):
    # FOREACH-created rows are visible to a post-boundary MATCH; the
    # oracle computes the same count arithmetic over the base parquet
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "FOREACH (x IN [900001, 900002] | "
        "  CREATE (o:Orders {o_orderkey: x, o_custkey: 1})) "
        "WITH 1 AS one "
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) WHERE c.c_custkey = 1 "
        "RETURN count(o) AS n"
    )
    base = duck.execute(
        "SELECT count(*) FROM orders WHERE o_custkey = 1"
    ).fetchone()[0]
    assert res.returned.collect()[0]["n"] == base + 2
    assert res.counts()["nodes_created"] == 2


def test_write_result_checkpoint_truncates_lineage(weng):
    state = weng
    res = None
    for i in range(3):
        res = state.cypher_write(
            f"MATCH (c:Customer) WHERE c.c_custkey = {i + 1} SET c.hop = {i}"
        )
        res.checkpoint()
        state = res.engine()
    t = res.table("customer")
    # checkpointed plan is a short scan, not a 3-deep join chain
    plan = t._jdf.queryExecution().toString()
    assert "ExistingRDD" in plan or "LocalTableScan" in plan or "Scan" in plan
    got = {
        (r["c_custkey"], r["hop"])
        for r in t.filter("hop IS NOT NULL").collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2)}


def test_set_after_order_by_limit(weng):
    # the reading prefix's ORDER BY/LIMIT bounds which rows the write hits
    res = weng.cypher_write(
        "MATCH (c:Customer) WITH c ORDER BY c.c_acctbal DESC LIMIT 3 "
        "SET c.top3 = true"
    )
    got = sorted(
        r["c_custkey"] for r in res.table("customer").filter("top3").collect()
    )
    exp = sorted(
        r["k"]
        for r in weng.cypher(
            "MATCH (c:Customer) RETURN c.c_custkey AS k "
            "ORDER BY c.c_acctbal DESC LIMIT 3"
        ).collect()
    )
    assert got == exp and len(got) == 3


def test_write_with_query_parameters(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = $k SET c.note = $msg",
        params={"k": 3, "msg": "hello"},
    )
    t = res.table("customer")
    assert t.filter("c_custkey = 3").collect()[0]["note"] == "hello"
    assert t.filter("note IS NOT NULL").count() == 1


def test_set_mixes_node_and_relationship_targets(weng):
    res = weng.cypher_write(
        "MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem) "
        "WHERE o.o_orderkey = 2 "
        "SET l.checked = true, r.batch = 7"
    )
    t = res.table("lineitem_node")
    hit = t.filter("l_orderkey = 2")
    assert hit.count() > 0
    assert hit.filter("NOT checked OR batch <> 7").count() == 0
    assert t.filter("l_orderkey <> 2 AND (checked OR batch IS NOT NULL)").count() == 0


def test_post_write_graph_schema_serializes(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 5 SET c.vip = true"
    )
    doc = res.graph.to_json()
    assert "vip" in doc  # the extended property round-trips the JSON dialect


def test_edge_property_extension_reaches_post_write_engine(weng):
    # a NEW relationship property set through the rel alias must be
    # readable as r.batch in the post-write engine (edge schema extension)
    res = weng.cypher_write(
        "MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem) "
        "WHERE o.o_orderkey = 2 SET r.batch = 7"
    )
    out = (
        res.engine()
        .cypher(
            "MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem) "
            "WHERE r.batch IS NOT NULL "
            "RETURN o.o_orderkey AS ok, r.batch AS b"
        )
        .collect()
    )
    assert out and all(r2["ok"] == 2 and r2["b"] == 7 for r2 in out)


def test_write_columns_of_rich_types_roundtrip(weng):
    """Temporal, spatial-struct and list values written through SET stay
    fully usable (accessors, size()) in the post-write engine."""
    r1 = weng.cypher_write(
        "MATCH (o:Orders) WHERE o.o_orderkey = 1 "
        "SET o.due = o.o_orderdate + duration({days: 30})"
    )
    got = (
        r1.engine()
        .cypher(
            "MATCH (o:Orders) WHERE o.due IS NOT NULL "
            "RETURN o.o_orderkey AS k, o.due.year AS y"
        )
        .collect()
    )
    assert [(r["k"],) for r in got] == [(1,)] and got[0]["y"] is not None

    r2 = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "SET c.loc = point({x: 1.0, y: 2.0})"
    )
    assert (
        r2.engine()
        .cypher("MATCH (c:Customer) WHERE c.c_custkey = 1 RETURN c.loc.x AS x")
        .collect()[0]["x"]
        == 1.0
    )

    r3 = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 2 SET c.tags = ['a', 'b', 'c']"
    )
    assert (
        r3.engine()
        .cypher(
            "MATCH (c:Customer) WHERE c.c_custkey = 2 RETURN size(c.tags) AS n"
        )
        .collect()[0]["n"]
        == 3
    )


def test_write_reading_prefix_composes_with_extensions(weng):
    """Dynamic access in write expressions, CALL procedures and UNWIND in
    the reading prefix — all compile through the ordinary read planner."""
    r1 = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 3 SET c.copy = c['c_name']"
    )
    row = r1.table("customer").filter("c_custkey = 3").collect()[0]
    assert row["copy"] == row["c_name"]

    r2 = weng.cypher_write(
        "CALL db.labels() YIELD label WHERE label = 'Region' "
        "MATCH (g:Region) WHERE g.r_regionkey = 0 SET g.tagged = label"
    )
    assert (
        r2.table("region").filter("r_regionkey = 0").collect()[0]["tagged"]
        == "Region"
    )

    r3 = weng.cypher_write(
        "UNWIND [31, 32] AS k "
        "CREATE (x:Region {r_regionkey: k * 10, r_name: toString(k)})"
    )
    assert rows(
        r3.table("region").filter("r_regionkey >= 300")
        .select("r_regionkey", "r_name")
    ) == {(310, "31"), (320, "32")}


def test_call_subquery_in_write_reading_prefix(weng):
    # correlated CALL { } aggregate feeds the SET value per customer
    res = weng.cypher_write(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5 AND c.c_custkey >= 1
        CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
               RETURN count(o) AS n_orders }
        SET c.n_orders = n_orders
        """
    )
    got = sorted(
        (r["c_custkey"], r["n_orders"])
        for r in res.table("customer").filter("n_orders IS NOT NULL").collect()
    )
    exp = sorted(
        (r["k"], r["n"])
        for r in weng.cypher(
            "MATCH (c:Customer) WHERE c.c_custkey <= 5 AND c.c_custkey >= 1 "
            "OPTIONAL MATCH (c)-[:PLACED]->(o:Orders) "
            "RETURN c.c_custkey AS k, count(o) AS n"
        ).collect()
    )
    assert got == exp and len(got) == 5


# ---------------------------------------------------------------------------
# round 6: relationship DELETE, SET +=, label SET/REMOVE, rel-MERGE ON SET
# ---------------------------------------------------------------------------


def test_delete_relationship_standalone_table(movie_weng):
    res = movie_weng.cypher_write(
        "MATCH (p:Person {Name: 'Tom Hanks'})-[r:ACTED_IN]->(m:Movie) "
        "WHERE m.id IN ['m1', 'm2'] DELETE r"
    )
    left = res.table("acted_in")
    assert rows(left.select("_vertexId", "_sink")) == {
        ("p2", "m1"), ("p2", "m2"), ("p1", "m3"), ("p5", "m3")
    }
    assert res.counts()["relationships_deleted"] == 2
    # nodes untouched
    assert res.table("person").count() == 5
    assert res.table("movie").count() == 3


def test_delete_relationship_fk_embedded(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer {c_custkey: 7})-[p:PLACED]->(o:Orders) DELETE p"
    )
    n_edges = weng.tables.get("orders").filter("o_custkey = 7").count()
    assert n_edges > 0
    assert res.counts()["relationships_deleted"] == n_edges
    # order rows survive with a nulled FK; the customer row survives
    assert res.table("orders").count() == weng.tables.get("orders").count()
    assert res.table("orders").filter("o_custkey = 7").count() == 0
    assert res.table("customer").filter("c_custkey = 7").count() == 1


def test_delete_relationship_then_node_in_one_statement(weng):
    # DELETE p then DETACH DELETE c in one statement: the rel delete runs
    # first (clause order), the detach sweeps the remaining parallel edge
    # types (PLACED_URGENT/PLACED_NORMAL live in their own tables)
    res = weng.cypher_write(
        "MATCH (c:Customer {c_custkey: 9})-[p:PLACED]->(o:Orders) "
        "DELETE p DETACH DELETE c"
    )
    assert res.table("customer").filter("c_custkey = 9").count() == 0
    assert res.table("orders").filter("o_custkey = 9").count() == 0
    assert res.table("orders_urgent").filter("o_custkey = 9").count() == 0
    c = res.counts()
    assert c["nodes_deleted"] == 1 and c["relationships_deleted"] > 0
    # plain DELETE of a node still refuses while OTHER edge types remain
    with pytest.raises(TranspilerBindingError, match="DETACH"):
        weng.cypher_write(
            "MATCH (c:Customer {c_custkey: 9})-[p:PLACED]->(o:Orders) "
            "DELETE p, c"
        )


def test_set_plus_equals_map_literal(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer {c_custkey: 3}) "
        "SET c += {c_mktsegment: 'VIP', loyalty: 5}"
    )
    row = res.table("customer").filter("c_custkey = 3").collect()[0]
    assert row["c_mktsegment"] == "VIP" and row["loyalty"] == 5
    # null value removes the property (Neo4j += semantics)
    res2 = res.engine().cypher_write(
        "MATCH (c:Customer {c_custkey: 3}) SET c += {loyalty: null}"
    )
    assert (
        res2.table("customer").filter("c_custkey = 3").collect()[0]["loyalty"]
        is None
    )


def test_set_replace_map(weng):
    # SET c = {map} (round 7): REPLACE — declared non-id properties
    # absent from the map are removed; id and FK columns untouched
    res = weng.cypher_write(
        "MATCH (c:Customer {c_custkey: 3}) "
        "SET c = {c_name: 'Fresh', c_acctbal: 1.25} "
        "RETURN c.c_name AS n, c.c_mktsegment AS seg"
    )
    assert [tuple(r) for r in res.returned.collect()] == [("Fresh", None)]
    row = res.table("customer").filter("c_custkey = 3").collect()[0]
    assert row["c_name"] == "Fresh" and row["c_acctbal"] == 1.25
    assert row["c_mktsegment"] is None  # removed by replacement
    # edges survive (FK columns are identity, not properties)
    assert (
        res.engine()
        .cypher(
            "MATCH (c:Customer {c_custkey: 3})-[:PLACED]->(o:Orders) "
            "RETURN count(o) AS n"
        )
        .collect()[0]
        .n
        > 0
    )
    # other rows untouched
    assert (
        res.table("customer").filter("c_custkey = 2").collect()[0][
            "c_mktsegment"
        ]
        is not None
    )


def test_set_map_projection_copy(weng):
    # property copy between entities: SET b += a {.prop, k: expr} and
    # SET b = a {.*} (replacement; .* excludes the source id)
    res = weng.cypher_write(
        """
        MATCH (a:Customer {c_custkey: 1}), (b:Customer {c_custkey: 2})
        SET b += a {.c_mktsegment, bal2: a.c_acctbal * 2}
        """
    )
    row = res.table("customer").filter("c_custkey = 2").collect()[0]
    src = res.table("customer").filter("c_custkey = 1").collect()[0]
    assert row["c_mktsegment"] == src["c_mktsegment"]
    assert row["bal2"] == src["c_acctbal"] * 2
    res2 = weng.cypher_write(
        """
        MATCH (a:Customer {c_custkey: 1}), (b:Customer {c_custkey: 3})
        SET b = a {.*}
        """
    )
    r3 = res2.table("customer").filter("c_custkey = 3").collect()[0]
    s1 = res2.table("customer").filter("c_custkey = 1").collect()[0]
    assert r3["c_name"] == s1["c_name"] and r3["c_custkey"] == 3
    with pytest.raises(TranspilerNotSupportedError, match="NODE alias"):
        weng.cypher_write(
            "MATCH (a:Customer {c_custkey: 1}) WITH a.c_acctbal AS v "
            "MATCH (b:Customer {c_custkey: 2}) SET b += v {.x}"
        )
    with pytest.raises(TranspilerBindingError, match="no property 'nope'"):
        weng.cypher_write(
            "MATCH (a:Customer {c_custkey: 1}), (b:Customer {c_custkey: 2}) "
            "SET b += a {.nope}"
        )


def test_set_replace_map_fences(weng):
    with pytest.raises(TranspilerNotSupportedError, match="RELATIONSHIP"):
        weng.cypher_write(
            "MATCH (c:Customer {c_custkey: 1})-[r:PLACED]->(o:Orders) "
            "SET r = {x: 1}"
        )
    with pytest.raises(TranspilerNotSupportedError, match="id property"):
        weng.cypher_write(
            "MATCH (c:Customer {c_custkey: 1}) SET c = {c_custkey: 9}"
        )
    with pytest.raises(TranspilerNotSupportedError, match="map literal"):
        weng.cypher_write("MATCH (c:Customer {c_custkey: 1}) SET c = 5")


def test_set_plus_equals_param_map(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer {c_custkey: 3}) SET c += $m",
        params={"m": {"tier": "gold"}},
    )
    assert (
        res.table("customer").filter("c_custkey = 3").collect()[0]["tier"]
        == "gold"
    )
    with pytest.raises(TranspilerBindingError, match="map"):
        weng.cypher_write(
            "MATCH (c:Customer {c_custkey: 3}) SET c += $m",
            params={"m": 7},
        )


def test_set_remove_label_facets(weng):
    # labels are tables: SET r:Nation appends an id-sharing facet row,
    # REMOVE r:Nation drops it. Region key 2 already exists in nation
    # (ids overlap) -> add is a no-op; key 77 is fresh.
    res = weng.cypher_write(
        "CREATE (r:Region {r_regionkey: 77, r_name: 'NEWLAND'})"
    )
    res2 = res.engine().cypher_write(
        "MATCH (r:Region {r_regionkey: 77}) SET r:Nation"
    )
    assert res2.counts()["labels_added"] == 1
    assert res2.table("nation").filter("n_nationkey = 77").count() == 1
    # read side sees the multi-label node now
    n = (
        res2.engine()
        .cypher(
            "MATCH (x:Region:Nation) WHERE x.r_regionkey = 77 "
            "RETURN count(*) AS n"
        )
        .collect()[0]["n"]
    )
    assert n == 1
    res3 = res2.engine().cypher_write(
        "MATCH (r:Region {r_regionkey: 77}) REMOVE r:Nation"
    )
    assert res3.counts()["labels_removed"] == 1
    assert res3.table("nation").filter("n_nationkey = 77").count() == 0
    # idempotent: adding an already-present facet adds nothing
    res4 = weng.cypher_write("MATCH (r:Region {r_regionkey: 2}) SET r:Nation")
    assert res4.counts()["labels_added"] == 0


def test_set_label_unknown_or_rel_target_rejected(weng):
    with pytest.raises(TranspilerBindingError, match="no node schema"):
        weng.cypher_write("MATCH (c:Customer {c_custkey: 1}) SET c:Nope")
    with pytest.raises(TranspilerBindingError, match="relationship"):
        weng.cypher_write(
            "MATCH (c:Customer)-[p:PLACED]->(o:Orders) "
            "WHERE c.c_custkey = 1 SET p:Nation"
        )


def test_merge_rel_on_create_on_match_standalone(movie_weng):
    q = (
        "MATCH (p:Person {Name: 'Meg Ryan'}), (m:Movie {id: 'm3'}) "
        "MERGE (p)-[r:ACTED_IN]->(m) "
        "ON CREATE SET r.Roles = 'New Role' "
        "ON MATCH SET r.Roles = 'Recast'"
    )
    res = movie_weng.cypher_write(q)
    assert res.counts()["relationships_created"] == 1
    assert rows(
        res.table("acted_in")
        .filter("_vertexId = 'p2' AND _sink = 'm3'")
        .select("Roles")
    ) == {("New Role",)}
    res2 = res.engine().cypher_write(q)
    assert res2.counts()["relationships_created"] == 0
    assert rows(
        res2.table("acted_in")
        .filter("_vertexId = 'p2' AND _sink = 'm3'")
        .select("Roles")
    ) == {("Recast",)}


def test_merge_rel_on_create_on_match_fk_embedded(weng):
    r1 = weng.cypher_write(
        "MATCH (c:Customer {c_custkey: 4}) DETACH DELETE c"
    )
    ok = [
        r["o_orderkey"]
        for r in r1.table("orders").filter("o_custkey IS NULL").collect()
    ][0]
    q = (
        f"MATCH (c:Customer {{c_custkey: 7}}), (o:Orders {{o_orderkey: {ok}}}) "
        "MERGE (c)-[p:PLACED]->(o) "
        "ON CREATE SET p.note = 'attached' "
        "ON MATCH SET p.note = 'kept'"
    )
    r2 = r1.engine().cypher_write(q)
    assert r2.counts()["relationships_created"] == 1
    row = r2.table("orders").filter(f"o_orderkey = {ok}").collect()[0]
    assert row["o_custkey"] == 7 and row["note"] == "attached"
    r3 = r2.engine().cypher_write(q)
    assert r3.counts()["relationships_created"] == 0
    row = r3.table("orders").filter(f"o_orderkey = {ok}").collect()[0]
    assert row["o_custkey"] == 7 and row["note"] == "kept"


def test_merge_rel_on_set_must_target_rel_alias(movie_weng):
    with pytest.raises(TranspilerBindingError, match="relationship alias"):
        movie_weng.cypher_write(
            "MATCH (p:Person {Name: 'Meg Ryan'}), (m:Movie {id: 'm3'}) "
            "MERGE (p)-[r:ACTED_IN]->(m) ON CREATE SET m.Title = 'X'"
        )


def test_on_conflict_error_mode(weng):
    # on_conflict='error' replaces the documented max() rule with a loud
    # rejection when one key receives two distinct values (VERDICT r5
    # nit #2)
    q = (
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
        "WHERE c.c_custkey = 4 SET c.last_price = o.o_totalprice"
    )
    with pytest.raises(TranspilerBindingError, match="distinct value"):
        weng.cypher_write(q, on_conflict="error")
    # a conflict-free statement passes in error mode
    res = weng.cypher_write(
        "MATCH (c:Customer {c_custkey: 4}) SET c.tag = 'x'",
        on_conflict="error",
    )
    assert res.table("customer").filter("c_custkey = 4").collect()[0]["tag"] == "x"
    with pytest.raises(TranspilerBindingError, match="on_conflict"):
        weng.cypher_write(q, on_conflict="nope")


def test_merge_rel_on_conflict_error_mode(movie_weng):
    # round 7 (ADVICE r6): the loud mode must reach the MERGE-rel path —
    # x fans out over m1's two actors, so the single (Bill Paxton, m1)
    # pair receives two distinct ON CREATE values
    q = (
        "MATCH (p:Person {Name: 'Bill Paxton'}), "
        "(x:Person)-[:ACTED_IN]->(m:Movie {id: 'm1'}) "
        "MERGE (p)-[r:ACTED_IN]->(m) ON CREATE SET r.Roles = x.Name"
    )
    with pytest.raises(TranspilerBindingError, match="distinct property value"):
        movie_weng.cypher_write(q, on_conflict="error")
    # the default documented max() rule still resolves deterministically
    res = movie_weng.cypher_write(q)
    assert res.counts()["relationships_created"] == 1
    assert rows(
        res.table("acted_in")
        .filter("_vertexId = 'p5' AND _sink = 'm1'")
        .select("Roles")
    ) == {("Tom Hanks",)}
    # and a conflict-free MERGE passes in error mode
    res2 = movie_weng.cypher_write(
        "MATCH (p:Person {Name: 'Bill Paxton'}), (m:Movie {id: 'm1'}) "
        "MERGE (p)-[r:ACTED_IN]->(m) ON CREATE SET r.Roles = 'Solo'",
        on_conflict="error",
    )
    assert res2.counts()["relationships_created"] == 1


def test_merge_rel_endpoints_from_same_statement_merges(weng):
    # the classic upsert idiom: MERGE both nodes, then MERGE the rel —
    # all in ONE statement (round 6; endpoints bound by the earlier
    # write clauses, not by MATCH)
    q = """
        MERGE (n:Nation {n_nationkey: 99, n_name: 'NEWLAND'})
        MERGE (r:Region {r_regionkey: 88, r_name: 'TERRA'})
        MERGE (n)-[:IN_REGION]->(r)
    """
    r1 = weng.cypher_write(q)
    c1 = r1.counts()
    assert c1["nodes_created"] == 2 and c1["relationships_created"] == 1
    row = r1.table("nation").filter("n_nationkey = 99").collect()[0]
    assert row["n_regionkey"] == 88
    # idempotent on re-run over the post-write graph
    c2 = r1.engine().cypher_write(q).counts()
    assert c2["nodes_created"] == 0 and c2["relationships_created"] == 0
    assert c2["nodes_matched"] == 2


def test_merge_rel_endpoint_from_create_standalone_table(movie_weng):
    res = movie_weng.cypher_write(
        "CREATE (p:Person {id: 'p9', Name: 'New Actor'}) "
        "MERGE (m:Movie {id: 'm1', Title: 'Sleepless in Seattle', "
        "Tagline: 'What if...', Released: 1993}) "
        "MERGE (p)-[:ACTED_IN]->(m)"
    )
    c = res.counts()
    assert c["nodes_created"] == 1 and c["relationships_created"] == 1
    assert rows(
        res.table("acted_in").filter("_vertexId = 'p9'").select("_sink")
    ) == {("m1",)}


def test_merge_rel_unbound_endpoint_still_rejected(weng):
    with pytest.raises(TranspilerBindingError, match="bound"):
        weng.cypher_write(
            "MERGE (n:Nation {n_nationkey: 99, n_name: 'X'}) "
            "MERGE (n)-[:IN_REGION]->(r)"
        )


# ---------------------------------------------------------------------------
# multi-type relationship writes (round 7: routed via __type)
# ---------------------------------------------------------------------------


def test_multi_type_rel_set_routes_to_member_tables(movie_weng):
    res = movie_weng.cypher_write(
        "MATCH (p:Person)-[r:ACTED_IN|DIRECTED]->(m:Movie {id: 'm1'}) "
        "SET r.year_checked = 1993"
    )
    assert rows(
        res.table("acted_in").filter("_sink = 'm1'").select("_vertexId", "year_checked")
    ) == {("p1", 1993), ("p2", 1993)}
    assert rows(
        res.table("directed").filter("_sink = 'm1'").select("_vertexId", "year_checked")
    ) == {("p4", 1993)}
    # rows of OTHER movies untouched in both member tables
    assert res.table("acted_in").filter(
        "_sink <> 'm1' AND year_checked IS NOT NULL"
    ).count() == 0
    assert res.counts()["properties_set"] == 3


def test_multi_type_rel_delete_routes_to_member_tables(movie_weng):
    res = movie_weng.cypher_write(
        "MATCH (p:Person)-[r:ACTED_IN|DIRECTED]->(m:Movie {id: 'm1'}) DELETE r"
    )
    assert res.table("acted_in").filter("_sink = 'm1'").count() == 0
    assert res.table("directed").filter("_sink = 'm1'").count() == 0
    # m2/m3 rows survive in both concrete tables
    assert res.table("acted_in").count() == 4
    assert res.table("directed").count() == 2
    assert res.counts()["relationships_deleted"] == 3


def test_multi_type_rel_write_either_direction(movie_weng):
    # round 7 follow-up: EITHER-direction multi-type writes route too —
    # members resolve per-orientation, and a member matched through the
    # reversed label pair swaps its (source, sink) keys back
    res = movie_weng.cypher_write(
        "MATCH (p:Person)-[r:ACTED_IN|DIRECTED]-(m:Movie {id: 'm2'}) DELETE r"
    )
    assert res.table("acted_in").filter("_sink = 'm2'").count() == 0
    assert res.table("directed").filter("_sink = 'm2'").count() == 0
    assert res.counts()["relationships_deleted"] == 3  # p1, p2 acted; p4 directed


def test_multi_type_rel_write_flipped_member(movie_weng):
    # pattern-left = Movie, so every member resolves through the
    # REVERSED label pair (flipped=True) — keys must swap back to the
    # concrete tables' (person, movie) orientation
    res = movie_weng.cypher_write(
        "MATCH (m:Movie {id: 'm3'})-[r:ACTED_IN|DIRECTED]-(p:Person) "
        "SET r.checked = true"
    )
    assert rows(
        res.table("acted_in").filter("checked").select("_vertexId", "_sink")
    ) == {("p1", "m3"), ("p5", "m3")}
    assert rows(
        res.table("directed").filter("checked").select("_vertexId", "_sink")
    ) == {("p3", "m3")}


def test_multi_type_rel_merge_matches_any_creates_first(movie_weng):
    """Multi-type MERGE (round 8; documented divergence — Neo4j rejects
    type alternation on MERGE): a (src, snk) pair matches when ANY member
    table holds it; missing pairs are created as the FIRST listed type.
    ON MATCH routes to the member table the pair matched in; ON CREATE
    lands on the created rows."""
    res = movie_weng.cypher_write(
        """
        MATCH (p:Person), (m:Movie)
        WHERE (p.id = 'p1' AND m.id = 'm1')    // exists in acted_in
           OR (p.id = 'p4' AND m.id = 'm1')    // exists in directed
           OR (p.id = 'p5' AND m.id = 'm2')    // exists in neither
        MERGE (p)-[r:ACTED_IN|DIRECTED]->(m)
        ON MATCH SET r.seen = true
        ON CREATE SET r.fresh = true
        """
    )
    assert res.counts()["relationships_created"] == 1
    acted, directed = res.table("acted_in"), res.table("directed")
    # created as the FIRST listed member type only
    assert rows(acted.filter("fresh").select("_vertexId", "_sink")) == {
        ("p5", "m2")
    }
    assert "fresh" not in directed.columns
    # ON MATCH routed to each member table that held the pair
    assert rows(acted.filter("seen").select("_vertexId", "_sink")) == {
        ("p1", "m1")
    }
    assert rows(directed.filter("seen").select("_vertexId", "_sink")) == {
        ("p4", "m1")
    }
    # no duplicate rows appended for matched pairs
    assert acted.count() == 7 and directed.count() == 3


def test_multi_type_rel_merge_idempotent_and_counts(movie_weng):
    res = movie_weng.cypher_write(
        """
        MATCH (p:Person {id: 'p5'}), (m:Movie {id: 'm2'})
        MERGE (p)-[:ACTED_IN|DIRECTED]->(m)
        """
    )
    assert res.counts()["relationships_created"] == 1
    # re-running over the post-write tables matches (either member) -> 0
    res2 = res.engine().cypher_write(
        """
        MATCH (p:Person {id: 'p5'}), (m:Movie {id: 'm2'})
        MERGE (p)-[:ACTED_IN|DIRECTED]->(m)
        """
    )
    assert res2.counts()["relationships_created"] == 0
    # a pair held by the SECOND member also matches (p4 directed m2)
    res3 = movie_weng.cypher_write(
        """
        MATCH (p:Person {id: 'p4'}), (m:Movie {id: 'm2'})
        MERGE (p)-[:ACTED_IN|DIRECTED]->(m)
        """
    )
    assert res3.counts()["relationships_created"] == 0
    assert res3.table("acted_in").count() == 6


def test_multi_type_rel_merge_prop_must_exist_everywhere(movie_weng):
    import pytest

    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    # Roles exists only in acted_in, not directed — it participates in
    # the match condition, so the fence is typed and explicit
    with pytest.raises(TranspilerNotSupportedError, match="member table"):
        movie_weng.cypher_write(
            """
            MATCH (p:Person {id: 'p1'}), (m:Movie {id: 'm1'})
            MERGE (p)-[:ACTED_IN|DIRECTED {Roles: 'Sam'}]->(m)
            """
        )


# ---------------------------------------------------------------------------
# double-compile safety: engine rewrites must not leak into the second
# compile of one statement (round 7 — _run_ast_env deep-copies the AST)
# ---------------------------------------------------------------------------


def test_write_return_over_multi_verb_reading(weng):
    # the [:A|B] rewrite used to mutate the parsed AST in place, so the
    # trailing RETURN's re-compile saw a joined verb with no edge
    res = weng.cypher_write(
        "MATCH (c:Customer)-[r:PLACED_URGENT|PLACED_NORMAL]->(o:Orders) "
        "WHERE c.c_custkey = 1 SET c.mv = true RETURN count(*) AS k"
    )
    assert res.returned.collect()[0]["k"] == 5


def test_write_return_over_unbounded_reading(movie_weng):
    res = movie_weng.cypher_write(
        "MATCH (a:Person)-[:FOLLOWS*]->(b:Person {id: 'p1'}) "
        "SET a.reaches_tom = true RETURN count(*) AS n"
    )
    # p2, p5 (direct), p4 (via p2), p3 (via p4, p2) reach Tom Hanks
    assert res.returned.collect()[0]["n"] == 4
    assert res.table("person").filter("reaches_tom").count() == 4


def test_write_return_over_undirected_varlength_reading(movie_weng):
    res = movie_weng.cypher_write(
        "MATCH (a:Person)-[:FOLLOWS*1..2]-(b:Person {id: 'p1'}) "
        "SET a.near_tom = true RETURN count(*) AS n"
    )
    assert res.returned.collect()[0]["n"] == 3  # p2, p5 at 1; p4 at 2


def test_write_over_shortest_path_reading(movie_weng):
    # round 7: a shortestPath in the READING prefix of a write statement
    # works (the engine rewrite makes it a 1-hop virtual edge); the path
    # variable itself stays a non-writable value
    res = movie_weng.cypher_write(
        "MATCH p = shortestPath((a:Person)-[:FOLLOWS*]->(b:Person {id: 'p1'})) "
        "SET a.d = length(p) RETURN a.id AS a, length(p) AS l ORDER BY a"
    )
    assert [tuple(r) for r in res.returned.collect()] == [
        ("p2", 1), ("p3", 3), ("p4", 2), ("p5", 1),
    ]
    assert rows(
        res.table("person").filter("d IS NOT NULL").select("id", "d")
    ) == {("p2", 1), ("p3", 3), ("p4", 2), ("p5", 1)}
    with pytest.raises(TranspilerNotSupportedError, match="value"):
        movie_weng.cypher_write(
            "MATCH p = shortestPath((a:Person {id: 'p3'})-[:FOLLOWS*]->"
            "(b:Person {id: 'p1'})) SET p.x = 1"
        )


def test_nested_foreach_set_and_create(weng):
    # nested SET: per-(x, y) application, max() resolves the grid value
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "FOREACH (x IN [1, 2] | FOREACH (y IN [10, 20] | "
        "  SET c.grid = x * 100 + y)) "
        "RETURN c.c_custkey AS k, c.grid AS g"
    )
    assert [tuple(r) for r in res.returned.collect()] == [(1, 220)]
    # CREATE in the INNERMOST body runs once per (x, y) — Neo4j parity
    res2 = weng.cypher_write(
        "FOREACH (x IN [1, 2] | FOREACH (y IN [1, 2] | "
        "  CREATE (r:Region {r_regionkey: 99000 + x * 10 + y, r_name: 'N'})))"
    )
    assert res2.table("region").filter("r_regionkey >= 99000").count() == 4
    assert res2.counts() == {"nodes_created": 4}
    # the inner list may depend on the outer element
    res3 = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "FOREACH (xs IN [[1, 2], [3]] | FOREACH (y IN xs | SET c.dep = y)) "
        "RETURN c.dep AS d"
    )
    assert [r["d"] for r in res3.returned.collect()] == [3]


def test_foreach_after_write_conditional_idiom(weng):
    # the classic Cypher conditional-write idiom: MERGE then FOREACH over
    # a CASE-built list. A synthetic WITH * boundary runs the MERGE at
    # its own cardinality first; the FOREACH observes it.
    res = weng.cypher_write(
        "MERGE (r:Region {r_regionkey: 88001}) "
        "FOREACH (x IN CASE WHEN true THEN [1] ELSE [] END | SET r.flag = x) "
        "RETURN r.r_regionkey AS k"
    )
    assert [r["k"] for r in res.returned.collect()] == [88001]
    assert res.table("region").filter("r_regionkey = 88001").collect()[0]["flag"] == 1
    # false branch: the MERGE still creates, the SET is skipped
    res2 = weng.cypher_write(
        "MERGE (r:Region {r_regionkey: 88002}) "
        "FOREACH (x IN CASE WHEN false THEN [1] ELSE [] END | SET r.flag = x)"
    )
    assert res2.table("region").filter("r_regionkey = 88002").count() == 1
    assert res2.counts() == {
        "nodes_created": 1, "nodes_matched": 0, "properties_set": 0,
    }


def test_foreach_after_set_sees_the_write(weng):
    # clause-sequential: the FOREACH body reads the post-SET value
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 SET c.base = 5 "
        "FOREACH (x IN [1] | SET c.derived = c.base * 10) "
        "RETURN c.base AS b, c.derived AS d"
    )
    assert [tuple(r) for r in res.returned.collect()] == [(5, 50)]


def test_foreach_after_create_single_cardinality(weng):
    # the CREATE runs once (its own segment), not once per list element
    res = weng.cypher_write(
        "CREATE (r:Region {r_regionkey: 88003, r_name: 'C'}) "
        "FOREACH (x IN [1, 2] | SET r.hits = x) "
        "RETURN r.r_regionkey AS k"
    )
    assert res.table("region").filter("r_regionkey = 88003").count() == 1
    assert res.counts() == {"nodes_created": 1, "properties_set": 1}


def test_bare_single_prop_merge(weng):
    # regression: MERGE with only the id property used to crash on an
    # empty aggregate in the candidate dedup
    res = weng.cypher_write("MERGE (r:Region {r_regionkey: 0})")
    assert res.counts() == {"nodes_created": 0, "nodes_matched": 1}
    res2 = weng.cypher_write("MERGE (r:Region {r_regionkey: 88004})")
    assert res2.counts() == {"nodes_created": 1, "nodes_matched": 0}


# ---------------------------------------------------------------------------
# round 12: rebound-label narrowing inside write statements
# ---------------------------------------------------------------------------


def test_write_rebound_label_mismatch_is_noop(weng):
    """A later (c:Part) over a Customer-bound c is a per-row predicate
    (always false here) — the write matches zero rows, like Neo4j,
    instead of a binding error."""
    res = weng.cypher_write(
        "MATCH (c:Customer) MATCH (c:Part) SET c.c_name = 'X' "
        "RETURN count(*) AS n"
    )
    assert [tuple(r) for r in res.returned.collect()] == [(0,)]
    # the no-op write left the table untouched
    eng2 = res.engine()
    changed = eng2.cypher(
        "MATCH (c:Customer) WHERE c.c_name = 'X' RETURN count(*) AS n"
    ).collect()[0].n
    assert changed == 0


def test_write_rebound_label_same_is_normal(weng):
    res = weng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_custkey = 1 "
        "MATCH (c:Customer) SET c.c_comment = 'round12' "
        "RETURN c.c_comment AS m"
    )
    assert [r.m for r in res.returned.collect()] == ["round12"]
