"""Reference-faithful Movie-graph tests (FIXTURES.md Set A).

The TPC-H overlay can't exercise OPTIONAL MATCH null rows (every customer
has orders in the synthetic data) or self-label edges; this in-memory
fixture mirrors the reference's own test graph
(/root/reference/tests/SQLRenderer.Test/TestData/MovieGraph.json) and
asserts hand-computed results."""

from __future__ import annotations

import os

import pytest

from opencyphertranspiler_spark import (
    CypherEngine,
    EdgeSchema,
    EntityProperty,
    GraphSchema,
    NodeSchema,
    TableRegistry,
    TranspilerNotSupportedError,
)

P = EntityProperty


@pytest.fixture(scope="module")
def movie_engine(spark):
    persons = spark.createDataFrame(
        [
            ("p1", "Tom Hanks", 1956),
            ("p2", "Meg Ryan", 1961),
            ("p3", "Rob Reiner", 1947),
            ("p4", "Nora Ephron", None),
            ("p5", "Bill Paxton", 1955),
        ],
        "id string, Name string, Born int",
    )
    movies = spark.createDataFrame(
        [
            ("m1", "Sleepless in Seattle", "What if...", 1993),
            ("m2", "You've Got Mail", None, 1998),
            ("m3", "Apollo 13", "Houston...", 1995),
        ],
        "id string, Title string, Tagline string, Released int",
    )
    acted_in = spark.createDataFrame(
        [
            ("p1", "m1", "Sam"),
            ("p2", "m1", "Annie"),
            ("p1", "m2", "Joe"),
            ("p2", "m2", "Kathleen"),
            ("p1", "m3", "Jim"),
            ("p5", "m3", "Fred"),
        ],
        "_vertexId string, _sink string, Roles string",
    )
    directed = spark.createDataFrame(
        [("p4", "m1"), ("p4", "m2"), ("p3", "m3")],
        "_vertexId string, _sink string",
    )
    reviewed = spark.createDataFrame(
        [
            ("p3", "m1", "Loved it", 9),
            ("p5", "m1", "Fine", 7),
            ("p3", "m2", "OK", 6),
        ],
        "_vertexId string, _sink string, Summary string, Rating int",
    )
    follows = spark.createDataFrame(
        [("p2", "p1"), ("p5", "p1"), ("p3", "p4"), ("p4", "p2")],
        "_vertexId string, _sink string",
    )
    # the schema comes from the reference-dialect JSON document — the
    # user-facing schema format (GraphSchema.from_json); tables bind by
    # the lower-cased Name default
    graph = GraphSchema.from_json(
        os.path.join(os.path.dirname(__file__), "data", "movie_graph.json")
    )
    reg = TableRegistry()
    for name, df in [
        ("person", persons),
        ("movie", movies),
        ("acted_in", acted_in),
        ("directed", directed),
        ("reviewed", reviewed),
        ("follows", follows),
    ]:
        reg.register_df(name, df)
    return CypherEngine(spark, graph, reg)


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_optional_match_produces_null_rows(movie_engine):
    # p1, p2, p5 acted but never directed -> count(m2) = 0 for them
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        OPTIONAL MATCH (p)-[:DIRECTED]->(m2:Movie)
        RETURN p.Name AS name, count(m2) AS directed
        """
    )
    assert rows(df) == {
        ("Tom Hanks", 0),
        ("Meg Ryan", 0),
        ("Rob Reiner", 1),
        ("Nora Ephron", 2),
        ("Bill Paxton", 0),
    }


def test_is_director_flag(movie_engine):
    # the reference's count(d) > 0 AS IsDirector shape (SQLRendererTest.cs:431-486)
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        OPTIONAL MATCH (p)-[d:DIRECTED]->(md:Movie)
        WITH p, count(d) AS dirs
        RETURN p.Name AS name, CASE WHEN dirs > 0 THEN true ELSE false END AS is_director
        """
    )
    assert rows(df) == {
        ("Tom Hanks", False),
        ("Meg Ryan", False),
        ("Bill Paxton", False),
    }


def test_rel_inequality_costar_pairs(movie_engine):
    # two ACTED_IN hops through one movie: uniqueness predicate excludes the
    # same edge on both sides, so each co-star pair appears twice (ordered)
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[x:ACTED_IN]->(m:Movie)<-[y:ACTED_IN]-(b:Person)
        RETURN m.Title AS title, count(*) AS pairs
        """
    )
    assert rows(df) == {
        ("Sleepless in Seattle", 2),
        ("You've Got Mail", 2),
        ("Apollo 13", 2),
    }


def test_undirected_self_label_rejected(movie_engine):
    with pytest.raises(TranspilerNotSupportedError):
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS]-(b:Person) RETURN a.Name AS n"
        )


def test_directed_self_label_edge(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS]->(b:Person)
        RETURN b.Name AS followed, count(a) AS n
        """
    )
    assert rows(df) == {("Tom Hanks", 2), ("Nora Ephron", 1), ("Meg Ryan", 1)}


def test_left_join_widens_nullability(movie_engine):
    # Born is null for Nora Ephron; Rating nullable after OPTIONAL MATCH
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        OPTIONAL MATCH (p)-[r:REVIEWED]->(m:Movie)
        RETURN p.Name AS name, min(r.Rating) AS min_rating
        """
    )
    got = {tuple(r) for r in df.collect()}
    assert ("Tom Hanks", None) in got
    assert ("Rob Reiner", 6) in got


def test_string_prefix_and_nullable_born(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE p.Name STARTS WITH 'T' OR p.Born IS NULL
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Tom Hanks",), ("Nora Ephron",)}


def test_stdev_with_popsize_filter(movie_engine):
    # reference's STDEV group (SQLRendererTest.cs:643-705): only movies
    # with >= 2 reviews have a sample stddev
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:REVIEWED]->(m:Movie)
        WITH m, count(r) AS n, stdev(r.Rating) AS sd
        WHERE n > 1
        RETURN m.Title AS title, round(sd, 4) AS sd
        """
    )
    got = list(df.collect())
    assert len(got) == 1
    assert got[0].title == "Sleepless in Seattle"
    assert abs(got[0].sd - 1.4142) < 1e-3


def test_variable_length_paths(movie_engine):
    # extension: bounded *1..2 expands to a UNION ALL of fixed-length
    # chains; one row per edge-distinct path
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS*1..2]->(b:Person)
        RETURN a.Name AS a, b.Name AS b
        """
    )
    assert rows(df) == {
        # 1-hop
        ("Meg Ryan", "Tom Hanks"),
        ("Bill Paxton", "Tom Hanks"),
        ("Rob Reiner", "Nora Ephron"),
        ("Nora Ephron", "Meg Ryan"),
        # 2-hop
        ("Rob Reiner", "Meg Ryan"),
        ("Nora Ephron", "Tom Hanks"),
    }


def test_variable_length_exact_and_agg(movie_engine):
    # exactly-2 hops; aggregation happens over the unioned path set
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS*2]->(b:Person)
        RETURN count(*) AS n
        """
    )
    assert df.collect()[0].n == 2
    # paths of length 1 and 2 both feed one aggregate
    df2 = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS*1..2]->(b:Person)
        RETURN b.Name AS name, count(*) AS n
        """
    )
    assert rows(df2) == {("Tom Hanks", 3), ("Nora Ephron", 1), ("Meg Ryan", 2)}


def test_variable_length_negatives(movie_engine):
    # unbounded without an explicit type is rejected (cannot resolve the
    # edge table for the reachability rewrite)
    with pytest.raises(TranspilerNotSupportedError):
        movie_engine.cypher(
            "MATCH (a:Person)-[*]->(b:Person) RETURN a.Name AS n"
        )
    with pytest.raises(TranspilerNotSupportedError):
        movie_engine.cypher(
            "MATCH (a:Person)-[r:FOLLOWS*1..2]->(b:Person) RETURN a.Name AS n"
        )
    # undirected var-length is supported since round 5 (symmetrized edge)
    # — see test_undirected_bounded_varlength


def test_size_on_collected_list(movie_engine):
    # size() is overloaded: list length after collect(), string length else
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        WITH m, collect(p.Name) AS cast_names
        RETURN m.Title AS title, size(cast_names) AS n_cast,
               size(m.Title) AS title_len
        """
    )
    got = {(r.title, r.n_cast) for r in df.collect()}
    assert got == {
        ("Sleepless in Seattle", 2),
        ("You've Got Mail", 2),
        ("Apollo 13", 2),
    }
    assert all(r.title_len == len(r.title) for r in df.collect())


def test_query_parameters(movie_engine):
    # extension: $params bound at compile time (reference rejects them)
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        WHERE m.Released > $year AND p.Name IN $names
        RETURN p.Name AS name, m.Title AS title
        """,
        params={"year": 1994, "names": ["Tom Hanks", "Bill Paxton"]},
    )
    assert rows(df) == {
        ("Tom Hanks", "You've Got Mail"),
        ("Tom Hanks", "Apollo 13"),
        ("Bill Paxton", "Apollo 13"),
    }


def test_missing_parameter_is_binding_error(movie_engine):
    from opencyphertranspiler_spark import TranspilerBindingError

    with pytest.raises(TranspilerBindingError):
        movie_engine.cypher(
            "MATCH (p:Person) WHERE p.Born > $y RETURN p.Name AS n"
        )


def test_alias_swap_through_with(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        WITH p AS m2, m AS p2
        RETURN p2.Title AS title, count(m2) AS actors
        """
    )
    assert rows(df) == {
        ("Sleepless in Seattle", 2),
        ("You've Got Mail", 2),
        ("Apollo 13", 2),
    }


def test_json_schema_roundtrip():
    path = os.path.join(os.path.dirname(__file__), "data", "movie_graph.json")
    g = GraphSchema.from_json(path)
    assert {n.label for n in g.nodes} == {"Person", "Movie"}
    person = g.get_node("Person")
    assert person.table == "person" and person.id_property == "id"
    born = {p.name: p for p in person.properties}["Born"]
    assert born.data_type == "int" and born.nullable
    acted = g.get_edge("ACTED_IN", "Person", "Movie")
    assert acted.table == "acted_in"
    assert acted.source_id_property == "_vertexId"
    # serialize -> reload -> identical structure
    g2 = GraphSchema.from_json(g.to_json())
    assert {n.label: n for n in g2.nodes} == {n.label: n for n in g.nodes}
    assert {e.id: e for e in g2.edges} == {e.id: e for e in g.edges}


def test_json_schema_roundtrip_non_string_ids():
    """Non-string id columns (the reference dialect carries real .NET
    types on IdProperty/SourceIdProperty/SinkIdProperty) must round-trip
    through to_json -> from_json without collapsing to System.String."""
    doc = {
        "Nodes": [
            {
                "Id": "N",
                "Name": "N",
                "IdProperty": {
                    "PropertyName": "nid",
                    "PropertyType": "System.Int64",
                },
                "Properties": [],
            }
        ],
        "Edges": [
            {
                "Id": "N@E@N",
                "Name": "E",
                "FromNode": "N",
                "ToNode": "N",
                "SourceIdProperty": {
                    "PropertyName": "src",
                    "PropertyType": "System.Int64",
                },
                "SinkIdProperty": {
                    "PropertyName": "dst",
                    "PropertyType": "System.Int32",
                },
                "Properties": [],
            }
        ],
    }
    g = GraphSchema.from_json(doc)
    assert g.get_node("N").id_property_type == "long"
    g2 = GraphSchema.from_json(g.to_json())
    assert g2.get_node("N").id_property_type == "long"
    e = g2.get_edge("E", "N", "N")
    assert e.source_id_property_type == "long"
    assert e.sink_id_property_type == "int"
    import json as _json

    emitted = _json.loads(g.to_json())
    assert (
        emitted["Nodes"][0]["IdProperty"]["PropertyType"] == "System.Int64"
    )


def test_zero_length_var_length(movie_engine):
    # *0..m (round 7): length-0 binds both endpoints to the SAME node —
    # 5 self-pairs + the 4 FOLLOWS edges
    df = movie_engine.cypher(
        "MATCH (a:Person)-[:FOLLOWS*0..1]->(b:Person) "
        "RETURN a.Name AS a, b.Name AS b"
    )
    got = rows(df)
    self_pairs = {(n, n) for n in
                  ["Tom Hanks", "Meg Ryan", "Rob Reiner", "Nora Ephron",
                   "Bill Paxton"]}
    edges = {("Meg Ryan", "Tom Hanks"), ("Bill Paxton", "Tom Hanks"),
             ("Rob Reiner", "Nora Ephron"), ("Nora Ephron", "Meg Ryan")}
    assert got == self_pairs | edges
    # *0..2 from one anchor: self + 1-hop + 2-hop
    df = movie_engine.cypher(
        "MATCH (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*0..2]->(b:Person) "
        "RETURN b.Name AS b"
    )
    assert sorted(r.b for r in df.collect()) == [
        "Meg Ryan", "Nora Ephron", "Rob Reiner"
    ]
    # exact *0 is the identity relation
    assert (
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS*0]->(b:Person) RETURN count(*) AS n"
        ).collect()[0].n
        == 5
    )


def test_zero_length_cross_label_and_fences(movie_engine):
    # differing endpoint labels: the zero variant is statically empty,
    # the 1-hop variant still matches (Neo4j: b would be a, which cannot
    # satisfy the other label)
    df = movie_engine.cypher(
        "MATCH (a:Person {Name: 'Rob Reiner'})-[:DIRECTED*0..1]->(m:Movie) "
        "RETURN m.Title AS t"
    )
    assert sorted(r.t for r in df.collect()) == ["Apollo 13"]
    # round 9: pattern variables over *0..m work — the zero-length
    # variant binds length 0, nodes [a], relationships []
    got = sorted(
        map(
            tuple,
            movie_engine.cypher(
                "MATCH p = (a:Person)-[:FOLLOWS*0..1]->(b:Person) "
                "RETURN a.id AS a, b.id AS b, length(p) AS l, "
                "size(relationships(p)) AS nr"
            ).collect(),
        )
    )
    # 5 zero-length self-paths + the 4 FOLLOWS edges
    assert [(a, b, l, nr) for a, b, l, nr in got if l == 0] == [
        (p, p, 0, 0) for p in ["p1", "p2", "p3", "p4", "p5"]
    ]
    assert [(a, b) for a, b, l, nr in got if l == 1] == [
        ("p2", "p1"), ("p3", "p4"), ("p4", "p2"), ("p5", "p1"),
    ]
    assert all(nr == l for _, _, l, nr in got)


def test_zero_length_unbounded(movie_engine):
    """*0.. unbounded (round 8): reachability ∪ length-0 identity pairs.
    FOLLOWS closure is 7 pairs (Meg/Bill→Tom; Rob→Nora,Meg,Tom;
    Nora→Meg,Tom) + 5 identity pairs."""
    got = rows(
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS*0..]->(b:Person) "
            "RETURN a.Name AS a, b.Name AS b"
        )
    )
    closure = rows(
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS*]->(b:Person) "
            "RETURN a.Name AS a, b.Name AS b"
        )
    )
    people = {r.Name for r in movie_engine.cypher(
        "MATCH (p:Person) RETURN p.Name AS Name").collect()}
    assert got == closure | {(n, n) for n in people}
    assert len(got) == 12
    # cross-label *0..: the zero variant is statically empty -> pure *1..
    got = rows(
        movie_engine.cypher(
            "MATCH (a:Person)-[:DIRECTED*0..]->(m:Movie) "
            "RETURN a.Name AS a, m.Title AS t"
        )
    )
    one = rows(
        movie_engine.cypher(
            "MATCH (a:Person)-[:DIRECTED*]->(m:Movie) "
            "RETURN a.Name AS a, m.Title AS t"
        )
    )
    assert got == one and got
    # anchored *0..: the anchor predicate still applies to the zero pair
    got = sorted(
        r.b
        for r in movie_engine.cypher(
            "MATCH (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*0..]->(b) "
            "RETURN b.Name AS b"
        ).collect()
    )
    assert got == ["Meg Ryan", "Nora Ephron", "Rob Reiner", "Tom Hanks"]


def test_path_var_over_zero_unbounded(movie_engine):
    # round 8: a path variable over plain *0.. rides the witness
    # machinery — length 0 with a single-node witness for the self-pairs
    got = {
        (r.a, r.b): r.l
        for r in movie_engine.cypher(
            "MATCH p = (a:Person)-[:FOLLOWS*0..]->(b:Person) "
            "RETURN a.Name AS a, b.Name AS b, length(p) AS l"
        ).collect()
    }
    assert len(got) == 12
    assert all(l == 0 for (a, b), l in got.items() if a == b)
    assert got[("Rob Reiner", "Tom Hanks")] == 3
    # round 9: *n.. (n>=2) path vars expand row-per-path on a
    # finite-depth edge set (FOLLOWS is an acyclic 3-deep chain)
    deep = sorted(
        map(
            tuple,
            movie_engine.cypher(
                "MATCH p = (a:Person)-[:FOLLOWS*2..]->(b:Person) "
                "RETURN a.id AS a, b.id AS b, length(p) AS l"
            ).collect(),
        )
    )
    assert deep == [("p3", "p1", 3), ("p3", "p2", 2), ("p4", "p1", 2)]


def test_shortest_path_zero_length(movie_engine):
    # shortestPath over *0..: self-pairs at distance 0 beat any cycle
    got = {
        (r.a, r.b): r.l
        for r in movie_engine.cypher(
            "MATCH p = shortestPath((a:Person)-[:FOLLOWS*0..]->(b:Person)) "
            "RETURN a.Name AS a, b.Name AS b, length(p) AS l"
        ).collect()
    }
    assert len(got) == 12
    assert all(l == 0 for (a, b), l in got.items() if a == b)
    assert got[("Rob Reiner", "Tom Hanks")] == 3
    # witness node-id array for the zero-length path is the single node
    one = movie_engine.cypher(
        "MATCH p = shortestPath((a:Person {Name: 'Meg Ryan'})-[:FOLLOWS*0..]->"
        "(b:Person {Name: 'Meg Ryan'})) RETURN nodes(p) AS ns, id(a) AS i"
    ).collect()
    assert len(one) == 1 and one[0].ns == [one[0].i]


def test_zero_length_mismatched_labels_with_continuation(movie_engine):
    """(ADVICE r7 medium) *0..m between differently-labeled endpoints WITH a
    continuation hop: the zero variant splices the continuation onto the
    merged endpoint and used to raise TranspilerBindingError; it is
    statically empty (no Person can be a Movie at length 0) and must be
    dropped, returning the 1-hop variant rows."""
    df = movie_engine.cypher(
        "MATCH (a:Person {Name: 'Rob Reiner'})-[:DIRECTED*0..1]->(m:Movie)"
        "<-[:ACTED_IN]-(x:Person) "
        "RETURN x.Name AS x"
    )
    got = sorted(r.x for r in df.collect())
    one_hop = sorted(
        r.x
        for r in movie_engine.cypher(
            "MATCH (a:Person {Name: 'Rob Reiner'})-[:DIRECTED]->(m:Movie)"
            "<-[:ACTED_IN]-(x:Person) "
            "RETURN x.Name AS x"
        ).collect()
    )
    assert got == one_hop and got  # non-empty, exactly the 1-hop rows


def test_zero_length_unlabeled_endpoints_verb_inference(movie_engine):
    # both endpoints unlabeled: the zero variant gets its merged label
    # from the verb (same inference the non-zero variants apply), so a
    # same-label verb keeps its length-0 identity pairs...
    df = movie_engine.cypher(
        "MATCH (a)-[:FOLLOWS*0..1]->(b) RETURN a.Name AS a, b.Name AS b"
    )
    labeled = movie_engine.cypher(
        "MATCH (a:Person)-[:FOLLOWS*0..1]->(b:Person) "
        "RETURN a.Name AS a, b.Name AS b"
    )
    assert rows(df) == rows(labeled)
    # ...and a cross-label verb's zero variant is statically empty
    df = movie_engine.cypher(
        "MATCH (a)-[:DIRECTED*0..1]->(m) RETURN m.Title AS t"
    )
    one_hop = movie_engine.cypher(
        "MATCH (a:Person)-[:DIRECTED]->(m:Movie) RETURN m.Title AS t"
    )
    assert sorted(r.t for r in df.collect()) == sorted(
        r.t for r in one_hop.collect()
    )


def test_unbounded_var_length_reachability(movie_engine):
    # follows: Meg->Tom, Bill->Tom, Rob->Nora, Nora->Meg
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS*]->(b:Person)
        RETURN a.Name AS a, b.Name AS b
        """
    )
    assert rows(df) == {
        ("Meg Ryan", "Tom Hanks"),
        ("Bill Paxton", "Tom Hanks"),
        ("Rob Reiner", "Nora Ephron"),
        ("Nora Ephron", "Meg Ryan"),
        # transitive
        ("Rob Reiner", "Meg Ryan"),
        ("Rob Reiner", "Tom Hanks"),
        ("Nora Ephron", "Tom Hanks"),
    }


def test_unbounded_min_hops(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS*2..]->(b:Person)
        RETURN a.Name AS a, b.Name AS b
        """
    )
    assert rows(df) == {
        ("Rob Reiner", "Meg Ryan"),
        ("Rob Reiner", "Tom Hanks"),
        ("Nora Ephron", "Tom Hanks"),
    }


def test_unbounded_composes_with_filters_and_agg(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS*]->(b:Person)
        WHERE b.Name = 'Tom Hanks'
        RETURN count(*) AS n
        """
    )
    assert df.collect()[0].n == 4


@pytest.fixture(scope="module")
def weighted_engine(spark):
    """Six-node graph with a weighted self-label edge: chain
    1->2->3->4 (w=1), shortcut 1->4 (w=2), 4->5 (w=1), 5->6 (w=2).
    Exercises the round-7 filtered unbounded rewrite: an inline map on
    [:LINK* {...}] pre-filters the EDGE SET before the reachability
    fixpoint (per-hop semantics, closure over the filtered graph)."""
    nodes = spark.createDataFrame(
        [(i, f"n{i}") for i in range(1, 7)], "id int, name string"
    )
    links = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 4, 2), (4, 5, 1), (5, 6, 2)],
        "src int, dst int, w int",
    )
    g = GraphSchema(
        nodes=[
            NodeSchema(
                label="N", table="n", id_property="id",
                id_property_type="int", properties=(P("name", "string"),),
            )
        ],
        edges=[
            EdgeSchema(
                verb="LINK", source_label="N", sink_label="N", table="l",
                source_id_property="src", sink_id_property="dst",
                source_id_property_type="int", sink_id_property_type="int",
                properties=(P("w", "int"),),
            )
        ],
    )
    reg = TableRegistry()
    reg.register_df("n", nodes)
    reg.register_df("l", links)
    return CypherEngine(spark, g, reg)


def test_unbounded_inline_map_filters_edge_set(weighted_engine):
    # w=1 excludes the 1->4 shortcut and the 5->6 hop: the closure runs
    # over the 4-edge chain only — verified against a DuckDB recursive CTE
    df = weighted_engine.cypher(
        "MATCH (a:N)-[:LINK* {w: 1}]->(b:N) RETURN a.id AS a, b.id AS b"
    )
    import duckdb

    oracle = duckdb.sql(
        """
        WITH RECURSIVE e(src, dst) AS (
            SELECT * FROM (VALUES (1,2),(2,3),(3,4),(4,5)) t(src, dst)
        ), reach(src, dst) AS (
            SELECT src, dst FROM e
            UNION
            SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
        ) SELECT src, dst FROM reach
        """
    ).fetchall()
    assert rows(df) == {tuple(r) for r in oracle}


def test_unbounded_inline_map_param_and_anchor(weighted_engine):
    # $param value + endpoint anchor: seeds AND edge filter compose
    df = weighted_engine.cypher(
        "MATCH (a:N {id: 1})-[:LINK* {w: $w}]->(b:N) RETURN b.id AS b",
        params={"w": 1},
    )
    assert sorted(r.b for r in df.collect()) == [2, 3, 4, 5]
    # piped-WITH constant resolves the same way
    df = weighted_engine.cypher(
        "WITH 1 AS k MATCH (a:N {id: 1})-[:LINK* {w: k}]->(b:N) "
        "RETURN b.id AS b"
    )
    assert sorted(r.b for r in df.collect()) == [2, 3, 4, 5]


def test_unbounded_inline_map_min_hops(weighted_engine):
    df = weighted_engine.cypher(
        "MATCH (a:N)-[:LINK*2.. {w: 1}]->(b:N) RETURN a.id AS a, b.id AS b"
    )
    assert rows(df) == {(1, 3), (1, 4), (1, 5), (2, 4), (2, 5), (3, 5)}


def test_unbounded_inline_map_shortest_path_witness(weighted_engine):
    # the w=2 shortcut is excluded, so the shortest 1->4 path is the
    # 3-hop chain — and the witness node array is the chain itself
    df = weighted_engine.cypher(
        "MATCH p = shortestPath((a:N {id: 1})-[:LINK* {w: 1}]->(b:N {id: 4})) "
        "RETURN length(p) AS l, nodes(p) AS ns"
    )
    r = df.collect()[0]
    assert r.l == 3 and r.ns == [1, 2, 3, 4]
    # unfiltered takes the shortcut
    df = weighted_engine.cypher(
        "MATCH p = shortestPath((a:N {id: 1})-[:LINK*]->(b:N {id: 4})) "
        "RETURN length(p) AS l"
    )
    assert df.collect()[0].l == 1


def test_unbounded_inline_map_undirected(weighted_engine):
    # node 6's only edge has w=2: filtered symmetrized closure is empty
    df = weighted_engine.cypher(
        "MATCH (a:N {id: 6})-[:LINK* {w: 1}]-(b:N) RETURN b.id AS b"
    )
    assert df.count() == 0
    df = weighted_engine.cypher(
        "MATCH (a:N {id: 6})-[:LINK*]-(b:N) RETURN b.id AS b"
    )
    assert sorted(r.b for r in df.collect()) == [1, 2, 3, 4, 5]


def test_unbounded_inline_map_cache_isolation(weighted_engine):
    # filtered and unfiltered fixpoints memoize under distinct keys
    filtered = weighted_engine.cypher(
        "MATCH (a:N {id: 1})-[:LINK* {w: 1}]->(b:N) RETURN b.id AS b"
    )
    unfiltered = weighted_engine.cypher(
        "MATCH (a:N {id: 1})-[:LINK*]->(b:N) RETURN b.id AS b"
    )
    assert sorted(r.b for r in filtered.collect()) == [2, 3, 4, 5]
    assert sorted(r.b for r in unfiltered.collect()) == [2, 3, 4, 5, 6]


def test_unbounded_inline_map_rejections(weighted_engine):
    from opencyphertranspiler_spark import TranspilerBindingError

    # unknown property -> binding error
    with pytest.raises(TranspilerBindingError, match="no property 'nope'"):
        weighted_engine.cypher(
            "MATCH (a:N)-[:LINK* {nope: 1}]->(b:N) RETURN a.id AS a"
        )
    # per-row (computed) value -> typed not-supported error
    with pytest.raises(TranspilerNotSupportedError, match="constant"):
        weighted_engine.cypher(
            "MATCH (a:N)-[:LINK* {w: a.id}]->(b:N) RETURN a.id AS a"
        )


def test_inline_pattern_where(movie_engine):
    # (n:L WHERE pred) / [r:T WHERE pred] (Neo4j 5, extension) — same
    # desugar as the inline property map
    df = movie_engine.cypher(
        """
        MATCH (p:Person WHERE p.Born < 1956)-[r:REVIEWED WHERE r.Rating >= 7]->(m:Movie)
        RETURN p.Name AS n, m.Title AS t
        """
    )
    assert rows(df) == {
        ("Rob Reiner", "Sleepless in Seattle"),
        ("Bill Paxton", "Sleepless in Seattle"),
    }
    # OPTIONAL MATCH: the inline predicate filters inside the fork
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name IN ['Tom Hanks', 'Rob Reiner']
        OPTIONAL MATCH (p)-[:ACTED_IN]->(m:Movie WHERE m.Released > 1994)
        RETURN p.Name AS n, count(m) AS c
        """
    )
    assert rows(df) == {("Tom Hanks", 2), ("Rob Reiner", 0)}


def test_inline_pattern_where_rejections(movie_engine):
    from opencyphertranspiler_spark import TranspilerSyntaxError

    with pytest.raises(TranspilerNotSupportedError, match="variable-length"):
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS*1..2 WHERE true]->(b:Person) "
            "RETURN count(*) AS n"
        )
    with pytest.raises(TranspilerSyntaxError, match="CREATE pattern"):
        movie_engine.cypher_write("CREATE (n:Person WHERE n.Born = 1 )")
    with pytest.raises(TranspilerSyntaxError, match="MERGE pattern"):
        movie_engine.cypher_write("MERGE (n:Person WHERE n.Born = 1 )")


def test_map_projection_basic(movie_engine):
    # `.prop` copies, `key: expr` computes, bare `var` is var: var
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        WHERE m.Title = 'Apollo 13'
        WITH p, m.Released AS rel
        RETURN p {.Name, .Born, year: rel + 1, rel} AS mp
        ORDER BY mp.Name
        """
    )
    got = [r.mp.asDict() for r in df.collect()]
    assert got == [
        {"Name": "Bill Paxton", "Born": 1955, "year": 1996, "rel": 1995},
        {"Name": "Tom Hanks", "Born": 1956, "year": 1996, "rel": 1995},
    ]


def test_map_projection_star(movie_engine):
    df = movie_engine.cypher(
        "MATCH (m:Movie) WHERE m.Released = 1998 RETURN m {.*} AS mp"
    )
    got = df.collect()[0].mp.asDict()
    assert got == {
        "id": "m2",
        "Title": "You've Got Mail",
        "Tagline": None,
        "Released": 1998,
    }


def test_map_projection_duplicate_key_override(movie_engine):
    # later entries override earlier ones (Neo4j), keeping first position
    df = movie_engine.cypher(
        "MATCH (m:Movie) WHERE m.Released = 1998 "
        "RETURN m {.Title, Title: 'Override'} AS mp"
    )
    row = df.collect()[0].mp
    assert row.asDict() == {"Title": "Override"}


def test_map_projection_null_entity(movie_engine):
    # unmatched OPTIONAL entity projects to a NULL map, not a map of
    # nulls (Neo4j parity, same rule as RETURN n / properties(n))
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Rob Reiner'
        OPTIONAL MATCH (p)-[:ACTED_IN]->(m:Movie)
        RETURN p.Name AS n, m {.Title, seen: true} AS mp
        """
    )
    row = df.collect()[0]
    assert row.n == "Rob Reiner" and row.mp is None


def test_map_projection_collect_and_grouping(movie_engine):
    # map projections group by value and collect like any struct
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        WHERE p.Name = 'Tom Hanks'
        RETURN collect(m {.Title, .Released}) AS ms
        """
    )
    ms = sorted(x.asDict()["Title"] for x in df.collect()[0].ms)
    assert ms == ["Apollo 13", "Sleepless in Seattle", "You've Got Mail"]


def test_map_projection_over_map_value(movie_engine):
    # Neo4j also projects from MAP values: `.prop` reads the struct
    # field, `.*` enumerates from the Catalyst schema, null base -> null
    df = movie_engine.cypher(
        """
        WITH {a: 1, b: 'x', c: 2.5} AS m
        RETURN m {.a, extra: m.c * 2} AS out, m {.*} AS full
        """
    )
    r = df.collect()[0]
    assert r.out.asDict() == {"a": 1, "extra": 5.0}
    assert r.full.asDict() == {"a": 1, "b": "x", "c": 2.5}
    # piped properties(n) struct projects the same way
    df = movie_engine.cypher(
        """
        MATCH (m:Movie) WHERE m.Released = 1998
        WITH properties(m) AS pm
        RETURN pm {.Title} AS out
        """
    )
    assert df.collect()[0].out.asDict() == {"Title": "You've Got Mail"}
    df = movie_engine.cypher(
        "WITH CASE WHEN 1 = 2 THEN {a: 1} ELSE null END AS m "
        "RETURN m {.a} AS out"
    )
    assert df.collect()[0].out is None


def test_map_projection_rejections(movie_engine):
    from opencyphertranspiler_spark import TranspilerBindingError

    with pytest.raises(TranspilerNotSupportedError, match="empty map"):
        movie_engine.cypher("MATCH (m:Movie) RETURN m {} AS mp")
    with pytest.raises(TranspilerBindingError, match="not defined"):
        movie_engine.cypher("MATCH (m:Movie) RETURN m {.Nope} AS mp")
    with pytest.raises(TranspilerNotSupportedError, match="struct-typed"):
        movie_engine.cypher("WITH 1 AS x RETURN x {.a} AS mp")
    with pytest.raises(TranspilerBindingError, match="no field 'nope'"):
        movie_engine.cypher("WITH {a: 1} AS m RETURN m {.nope} AS mp")


def test_labels_type_id_functions(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:ACTED_IN]->(m:Movie)
        WHERE p.Name = 'Tom Hanks'
        RETURN labels(p) AS ls, type(r) AS t, id(m) AS mid
        """
    )
    got = {(tuple(r.ls), r.t, r.mid) for r in df.collect()}
    assert got == {
        (("Person",), "ACTED_IN", "m1"),
        (("Person",), "ACTED_IN", "m2"),
        (("Person",), "ACTED_IN", "m3"),
    }
    # id(r) yields the (src, dst) pair; distinct edge count via id()
    df2 = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:FOLLOWS]->(q:Person)
        RETURN count(DISTINCT id(r)) AS n
        """
    )
    assert df2.collect()[0].n == 4


def test_exists_pattern_predicate(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE exists((p)-[:DIRECTED]->(:Movie))
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Rob Reiner",), ("Nora Ephron",)}
    df2 = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE NOT exists((p)-[:DIRECTED]->(:Movie)) AND p.Born IS NOT NULL
        RETURN p.Name AS name
        """
    )
    assert rows(df2) == {("Tom Hanks",), ("Meg Ryan",), ("Bill Paxton",)}


def test_exists_property_form(movie_engine):
    df = movie_engine.cypher(
        "MATCH (p:Person) WHERE NOT exists(p.Born) RETURN p.Name AS name"
    )
    assert rows(df) == {("Nora Ephron",)}


def test_exists_pattern_with_shared_mid_node(movie_engine):
    # actors in a movie someone reviewed
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:ACTED_IN]->(m:Movie)
        WHERE exists((:Person)-[:REVIEWED]->(m))
        RETURN a.Name AS name, m.Title AS title
        """
    )
    got = rows(df)
    # m1 and m2 are reviewed; Apollo 13 (m3) is not
    assert ("Tom Hanks", "Apollo 13") not in got
    assert ("Tom Hanks", "Sleepless in Seattle") in got
    assert len(got) == 4


def test_exists_under_or(movie_engine):
    # boolean-expression position: lowered to a left-join flag column
    # (ExistsFlagOp) instead of the top-level-conjunct semi join
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE exists((p)-[:DIRECTED]->(:Movie)) OR p.Born > 1950
        RETURN p.Name AS name
        """
    )
    # directors: Nora, Rob; born > 1950: Tom (1956), Meg (1961), Bill (1955)
    assert rows(df) == {
        ("Nora Ephron",),
        ("Rob Reiner",),
        ("Tom Hanks",),
        ("Meg Ryan",),
        ("Bill Paxton",),
    }


def test_not_exists_under_or(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE NOT exists((p)-[:ACTED_IN]->(:Movie)) OR p.Born < 1950
        RETURN p.Name AS name
        """
    )
    # non-actors: Rob, Nora; born < 1950: Rob (1947); Nora Born is null
    assert rows(df) == {("Rob Reiner",), ("Nora Ephron",)}


def test_exists_in_return_position(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS name, exists((p)-[:DIRECTED]->(:Movie)) AS directs
        """
    )
    assert rows(df) == {
        ("Tom Hanks", False),
        ("Meg Ryan", False),
        ("Rob Reiner", True),
        ("Nora Ephron", True),
        ("Bill Paxton", False),
    }


def test_exists_in_case_and_agg(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN CASE WHEN exists((p)-[:REVIEWED]->(:Movie))
                    THEN 'critic' ELSE 'civilian' END AS kind,
               count(*) AS n
        """
    )
    assert rows(df) == {("critic", 2), ("civilian", 3)}


def test_exists_under_xor(movie_engine):
    # acted XOR directed: Nora/Rob directed-only, Tom/Meg/Bill acted-only
    # -> all five satisfy XOR; nobody did both
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE exists((p)-[:ACTED_IN]->(:Movie))
              XOR exists((p)-[:DIRECTED]->(:Movie))
        RETURN count(*) AS n
        """
    )
    assert rows(df) == {(5,)}


def test_exists_with_unbounded_path(movie_engine):
    # pattern predicate over an unbounded reachability rewrite
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE exists((p)-[:FOLLOWS*]->(:Person))
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {
        ("Meg Ryan",), ("Bill Paxton",), ("Rob Reiner",), ("Nora Ephron",),
    }


def test_exists_in_with_where(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WITH p WHERE exists((p)-[:DIRECTED]->(:Movie))
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Rob Reiner",), ("Nora Ephron",)}
    df2 = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        WITH DISTINCT m WHERE NOT exists((:Person)-[:REVIEWED]->(m))
        RETURN m.Title AS title
        """
    )
    assert rows(df2) == {("Apollo 13",)}


def test_unbounded_undirected_without_type_rejected(movie_engine):
    # undirected unbounded is supported since round 5 (symmetrized edge,
    # test_undirected_unbounded_varlength); the untyped form still cannot
    # resolve an edge table and stays a typed error
    with pytest.raises(TranspilerNotSupportedError):
        movie_engine.cypher(
            "MATCH (a:Person)-[*]-(b:Person) RETURN a.Name AS n"
        )


def test_unbounded_same_verb_different_edges(spark):
    # one verb backing two (source, sink) label pairs: each unbounded hop
    # must get its OWN reachability table (regression: vverb collision)
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df("a", spark.createDataFrame([(1,), (2,)], "id long"))
    reg.register_df("b", spark.createDataFrame([(10,), (11,)], "id long"))
    reg.register_df("c", spark.createDataFrame([(20,)], "id long"))
    reg.register_df(
        "ab", spark.createDataFrame([(1, 10), (2, 11)], "src long, dst long")
    )
    reg.register_df("bc", spark.createDataFrame([(10, 20)], "src long, dst long"))
    g = GraphSchema(
        nodes=[NodeSchema("A", "a", "id"), NodeSchema("B", "b", "id"),
               NodeSchema("C", "c", "id")],
        edges=[
            EdgeSchema("LINKS", "A", "B", "ab", "src", "dst"),
            EdgeSchema("LINKS", "B", "C", "bc", "src", "dst"),
        ],
    )
    eng = CypherEngine(spark, g, reg)
    df = eng.cypher(
        """
        MATCH (a:A)-[:LINKS*]->(b:B), (b)-[:LINKS*]->(c:C)
        RETURN a.id AS a, b.id AS b, c.id AS c
        """
    )
    assert {tuple(r) for r in df.collect()} == {(1, 10, 20)}


def test_unbounded_inside_with_where_exists(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WITH p WHERE exists((p)-[:FOLLOWS*2..]->(:Person))
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Rob Reiner",), ("Nora Ephron",)}


def test_collect_distinct(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:REVIEWED]->(m:Movie)
        RETURN p.Name AS name, collect(DISTINCT m.Title) AS titles
        """
    )
    got = {r.name: sorted(r.titles) for r in df.collect()}
    assert got == {
        "Rob Reiner": ["Sleepless in Seattle", "You've Got Mail"],
        "Bill Paxton": ["Sleepless in Seattle"],
    }


def test_exists_in_with_where_over_unprojected_alias(movie_engine):
    # the exists() alias p is NOT projected — the carry mechanism must
    # keep p's columns flowing for the semi join, then trim them
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WITH p.Name AS name WHERE exists((p)-[:DIRECTED]->(:Movie))
        RETURN name
        """
    )
    assert rows(df) == {("Rob Reiner",), ("Nora Ephron",)}


def test_multi_label_nodes(spark):
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df(
        "person",
        spark.createDataFrame(
            [("p1", "Ann"), ("p2", "Bo"), ("p3", "Cy")], "id string, Name string"
        ),
    )
    # directors are a SUBSET of persons sharing the id domain
    reg.register_df(
        "director",
        spark.createDataFrame([("p2", 3), ("p9", 1)], "id string, movies int"),
    )
    g = GraphSchema(
        nodes=[
            NodeSchema("Person", "person", "id", (EntityProperty("Name"),)),
            NodeSchema(
                "Director", "director", "id", (EntityProperty("movies", "int"),)
            ),
        ],
        edges=[],
    )
    eng = CypherEngine(spark, g, reg)
    df = eng.cypher("MATCH (p:Person:Director) RETURN p.Name AS name")
    assert rows(df) == {("Bo",)}
    # primary label resolves properties: Director first exposes 'movies'
    df2 = eng.cypher("MATCH (d:Director:Person) RETURN d.movies AS m")
    assert rows(df2) == {(3,)}
    # anonymous multi-label nodes work too (planner assigns an internal
    # alias before the extra-label semi joins apply)
    assert eng.cypher(
        "MATCH (:Person:Director) RETURN count(*) AS n"
    ).collect()[0].n == 1
    # unknown extra label -> binding error
    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    with pytest.raises(TranspilerBindingError):
        eng.cypher("MATCH (p:Person:Nope) RETURN p.Name AS name")


def test_exists_pattern_respects_extra_labels(spark):
    # regression: extra labels inside exists() patterns must intersect
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df(
        "person",
        spark.createDataFrame(
            [("p1", "Ann"), ("p2", "Bo"), ("p3", "Cy")], "id string, Name string"
        ),
    )
    reg.register_df(
        "director",
        spark.createDataFrame([("p2", 3)], "id string, movies int"),
    )
    reg.register_df(
        "knows",
        spark.createDataFrame([("p1", "p2"), ("p3", "p1")], "_v string, _s string"),
    )
    g = GraphSchema(
        nodes=[
            NodeSchema("Person", "person", "id", (EntityProperty("Name"),)),
            NodeSchema("Director", "director", "id", (EntityProperty("movies", "int"),)),
        ],
        edges=[EdgeSchema("KNOWS", "Person", "Person", "knows", "_v", "_s")],
    )
    eng = CypherEngine(spark, g, reg)
    # shared alias with an extra label inside exists()
    df = eng.cypher(
        "MATCH (p:Person) WHERE exists((p:Person:Director)) RETURN p.Name AS name"
    )
    assert rows(df) == {("Bo",)}
    # fresh node with an extra label inside the pattern: who knows a director?
    df2 = eng.cypher(
        """
        MATCH (p:Person)
        WHERE exists((p)-[:KNOWS]->(:Person:Director))
        RETURN p.Name AS name
        """
    )
    assert rows(df2) == {("Ann",)}
    # anonymous multi-label node combined with bounded var-length
    df3 = eng.cypher(
        "MATCH (:Person:Director)<-[:KNOWS*1..2]-(b:Person) RETURN b.Name AS name"
    )
    assert rows(df3) == {("Ann",), ("Cy",)}


# ---------------------------------------------------------------------------
# Multiple relationship types [:A|B] (extension; reference rejects at
# CypherVisitor.cs:1181-1207) — engine rewrite to a virtual union edge
# ---------------------------------------------------------------------------


def test_multi_rel_types_forward(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:ACTED_IN|DIRECTED]->(m:Movie)
        RETURN p.Name AS name, type(r) AS t, m.Title AS title
        """
    )
    assert rows(df) == {
        ("Tom Hanks", "ACTED_IN", "Sleepless in Seattle"),
        ("Meg Ryan", "ACTED_IN", "Sleepless in Seattle"),
        ("Tom Hanks", "ACTED_IN", "You've Got Mail"),
        ("Meg Ryan", "ACTED_IN", "You've Got Mail"),
        ("Tom Hanks", "ACTED_IN", "Apollo 13"),
        ("Bill Paxton", "ACTED_IN", "Apollo 13"),
        ("Nora Ephron", "DIRECTED", "Sleepless in Seattle"),
        ("Nora Ephron", "DIRECTED", "You've Got Mail"),
        ("Rob Reiner", "DIRECTED", "Apollo 13"),
    }


def test_multi_rel_types_null_padded_properties(movie_engine):
    # ACTED_IN rows carry Roles (no Rating); REVIEWED rows the reverse
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:ACTED_IN|REVIEWED]->(m:Movie)
        WHERE m.Title = 'Sleepless in Seattle'
        RETURN p.Name AS name, r.Roles AS roles, r.Rating AS rating
        """
    )
    assert rows(df) == {
        ("Tom Hanks", "Sam", None),
        ("Meg Ryan", "Annie", None),
        ("Rob Reiner", None, 9),
        ("Bill Paxton", None, 7),
    }


def test_multi_rel_types_either_direction(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (m:Movie)-[r:DIRECTED|REVIEWED]-(p:Person)
        RETURN m.Title AS title, type(r) AS t, p.Name AS name
        """
    )
    assert rows(df) == {
        ("Sleepless in Seattle", "DIRECTED", "Nora Ephron"),
        ("You've Got Mail", "DIRECTED", "Nora Ephron"),
        ("Apollo 13", "DIRECTED", "Rob Reiner"),
        ("Sleepless in Seattle", "REVIEWED", "Rob Reiner"),
        ("Sleepless in Seattle", "REVIEWED", "Bill Paxton"),
        ("You've Got Mail", "REVIEWED", "Rob Reiner"),
    }


def test_multi_rel_types_three_way_and_where_type(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:ACTED_IN|DIRECTED|REVIEWED]->(m:Movie)
        RETURN count(*) AS n
        """
    )
    assert rows(df) == {(12,)}
    df2 = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:ACTED_IN|DIRECTED|REVIEWED]->(m:Movie)
        WHERE type(r) = 'REVIEWED' AND r.Rating >= 7
        RETURN p.Name AS name, m.Title AS title
        """
    )
    assert rows(df2) == {
        ("Rob Reiner", "Sleepless in Seattle"),
        ("Bill Paxton", "Sleepless in Seattle"),
    }


def test_multi_rel_types_in_exists_predicate(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE exists((p)-[:DIRECTED|REVIEWED]->(:Movie))
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Nora Ephron",), ("Rob Reiner",), ("Bill Paxton",)}


def test_multi_rel_types_alt_syntax_colon(movie_engine):
    # Neo4j also accepts [:A|:B]
    df = movie_engine.cypher(
        "MATCH (:Person)-[r:DIRECTED|:REVIEWED]->(:Movie) RETURN count(*) AS n"
    )
    assert rows(df) == {(6,)}


def test_multi_rel_types_heterogeneous_endpoints_rejected(movie_engine):
    # ACTED_IN sinks at Movie, FOLLOWS at Person -> no common label pair
    with pytest.raises(TranspilerNotSupportedError, match="different node labels"):
        movie_engine.cypher(
            "MATCH (p:Person)-[r:ACTED_IN|FOLLOWS]->(x) RETURN p.Name AS n"
        )


def test_multi_rel_types_duplicate_rejected(movie_engine):
    from opencyphertranspiler_spark.exceptions import TranspilerSyntaxError

    with pytest.raises(TranspilerSyntaxError, match="Duplicate relationship type"):
        movie_engine.cypher(
            "MATCH (p:Person)-[r:ACTED_IN|ACTED_IN]->(m:Movie) RETURN p.Name AS n"
        )


def test_multi_rel_types_parallel_edge_identity(spark):
    # A and B edges between the SAME node pair must stay distinct under
    # count(DISTINCT r) and the implicit r1 <> r2 uniqueness conjunct
    # (edge identity includes the __type discriminator)
    reg = TableRegistry()
    reg.register_df(
        "xs", spark.createDataFrame([("x1", "X")], "id string, Name string")
    )
    reg.register_df(
        "ys", spark.createDataFrame([("y1", "Y")], "id string, Name string")
    )
    reg.register_df(
        "a_edges", spark.createDataFrame([("x1", "y1")], "_v string, _s string")
    )
    reg.register_df(
        "b_edges", spark.createDataFrame([("x1", "y1")], "_v string, _s string")
    )
    g = GraphSchema(
        nodes=[
            NodeSchema("X", "xs", "id", (P("Name"),)),
            NodeSchema("Y", "ys", "id", (P("Name"),)),
        ],
        edges=[
            EdgeSchema("A", "X", "Y", "a_edges", "_v", "_s"),
            EdgeSchema("B", "X", "Y", "b_edges", "_v", "_s"),
        ],
    )
    eng = CypherEngine(spark, g, reg)
    df = eng.cypher(
        "MATCH (x:X)-[r:A|B]->(y:Y) RETURN count(DISTINCT r) AS n"
    )
    assert rows(df) == {(2,)}
    # two aliases over the union edge: the only surviving pair is (A, B)
    # in either order — the same-type same-pair combos are filtered
    df2 = eng.cypher(
        """
        MATCH (x:X)-[r1:A|B]->(y:Y), (x)-[r2:A|B]->(y)
        RETURN type(r1) AS t1, type(r2) AS t2
        """
    )
    assert rows(df2) == {("A", "B"), ("B", "A")}


# ---------------------------------------------------------------------------
# Inline property maps (extension; reference rejects at
# CypherVisitor.cs:1094-1097) — parser sugar for WHERE equality conjuncts
# ---------------------------------------------------------------------------


def test_property_map_on_node(movie_engine):
    df = movie_engine.cypher(
        "MATCH (p:Person {Name: 'Tom Hanks'})-[:ACTED_IN]->(m:Movie) "
        "RETURN m.Title AS title"
    )
    assert rows(df) == {
        ("Sleepless in Seattle",),
        ("You've Got Mail",),
        ("Apollo 13",),
    }


def test_property_map_on_rel_and_anonymous_node(movie_engine):
    df = movie_engine.cypher(
        "MATCH (p:Person)-[r:ACTED_IN {Roles: 'Sam'}]->(:Movie {Released: 1993}) "
        "RETURN p.Name AS name"
    )
    assert rows(df) == {("Tom Hanks",)}


def test_property_map_in_optional_match_filters_inside(movie_engine):
    # the map must behave like WHERE inside the OPTIONAL side: persons
    # without a 1993 movie keep their row with a null count, not drop out
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        OPTIONAL MATCH (p)-[:ACTED_IN]->(m:Movie {Released: 1993})
        RETURN p.Name AS name, count(m) AS n93
        """
    )
    assert rows(df) == {
        ("Tom Hanks", 1),
        ("Meg Ryan", 1),
        ("Rob Reiner", 0),
        ("Nora Ephron", 0),
        ("Bill Paxton", 0),
    }


def test_property_map_in_exists_predicate(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE exists((p)-[:REVIEWED {Rating: 9}]->(:Movie))
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Rob Reiner",)}


def test_property_map_with_parameter_and_combined_where(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person {Name: $who})-[r:REVIEWED]->(m:Movie)
        WHERE r.Rating < 7
        RETURN m.Title AS title
        """,
        params={"who": "Rob Reiner"},
    )
    assert rows(df) == {("You've Got Mail",)}


def test_property_map_unknown_property_is_binding_error(movie_engine):
    from opencyphertranspiler_spark.exceptions import TranspilerBindingError

    with pytest.raises(TranspilerBindingError, match="not defined"):
        movie_engine.cypher("MATCH (p:Person {Nope: 1}) RETURN p.Name AS n")


def test_property_map_on_var_length_applies_every_hop(movie_engine):
    # FOLLOWS chains: p5->p1, p2->p1, p3->p4->p2. A map on the var-length
    # rel must constrain each hop (here: trivially true equality on the
    # only property-less edge is impossible, so use Person-side REVIEWED)
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:REVIEWED*1..1 {Rating: 6}]->(m:Movie)
        RETURN a.Name AS name, m.Title AS title
        """
    )
    assert rows(df) == {("Rob Reiner", "You've Got Mail")}


# ---------------------------------------------------------------------------
# Bare pattern predicates (Neo4j idiom: a pattern in expression position is
# an implicit exists()) and simple-form CASE (both fenced by the reference)
# ---------------------------------------------------------------------------


def test_bare_pattern_predicate_conjunct(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE (p)-[:DIRECTED]->(:Movie)
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Rob Reiner",), ("Nora Ephron",)}


def test_bare_pattern_predicate_negated_and_or(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE NOT (p)-[:ACTED_IN]->(:Movie)
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Rob Reiner",), ("Nora Ephron",)}
    df2 = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE (p)-[:REVIEWED]->(:Movie) OR p.Born = 1956
        RETURN p.Name AS name
        """
    )
    assert rows(df2) == {("Rob Reiner",), ("Bill Paxton",), ("Tom Hanks",)}


def test_bare_pattern_in_return_position(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS name, (p)-[:FOLLOWS]->(:Person) AS follows_someone
        """
    )
    assert rows(df) == {
        ("Tom Hanks", False),
        ("Meg Ryan", True),
        ("Rob Reiner", True),
        ("Nora Ephron", True),
        ("Bill Paxton", True),
    }


def test_parenthesized_arithmetic_still_parses(movie_engine):
    # the pattern try-parse must backtrack cleanly on plain parens
    df = movie_engine.cypher(
        "MATCH (p:Person) WHERE (p.Born + 1) * 2 = 3914 RETURN p.Name AS name"
    )
    assert rows(df) == {("Tom Hanks",)}


def test_simple_case_form(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:REVIEWED]->(m:Movie)
        RETURN m.Title AS title,
               CASE r.Rating WHEN 9 THEN 'rave' WHEN 7 THEN 'good' ELSE 'meh' END AS verdict
        """
    )
    assert rows(df) == {
        ("Sleepless in Seattle", "rave"),
        ("Sleepless in Seattle", "good"),
        ("You've Got Mail", "meh"),
    }


def test_simple_case_null_subject_falls_to_else(movie_engine):
    # Nora's Born is null: null = x is never true -> ELSE branch (Cypher
    # simple-CASE parity with the equality desugaring)
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS name,
               CASE p.Born WHEN 1956 THEN 'boomer' ELSE 'unknown' END AS tag
        """
    )
    assert ("Nora Ephron", "unknown") in rows(df)
    assert ("Tom Hanks", "boomer") in rows(df)


def test_list_comprehension_over_collected(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:REVIEWED]->(m:Movie)
        WITH p.Name AS name, collect(r.Rating) AS ratings
        RETURN name, [x IN ratings WHERE x >= 7 | x * 10] AS good_x10
        """
    )
    got = {r["name"]: sorted(r["good_x10"]) for r in df.collect()}
    assert got == {"Rob Reiner": [90], "Bill Paxton": [70]}


def test_quantifiers_over_collected(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:REVIEWED]->(m:Movie)
        WITH p.Name AS name, collect(r.Rating) AS ratings
        RETURN name,
               all(x IN ratings WHERE x > 5) AS all_ok,
               any(x IN ratings WHERE x = 9) AS any_rave,
               none(x IN ratings WHERE x < 3) AS none_low,
               single(x IN ratings WHERE x = 6) AS one_six
        """
    )
    got = {
        r["name"]: (r["all_ok"], r["any_rave"], r["none_low"], r["one_six"])
        for r in df.collect()
    }
    assert got == {
        "Rob Reiner": (True, True, True, True),
        "Bill Paxton": (True, False, True, False),
    }


# ---------------------------------------------------------------------------
# Pattern variables p = (...) with length()/nodes()/relationships()
# (extension; reference rejects pattern variables, CypherVisitor.cs:998-1002)
# ---------------------------------------------------------------------------


def test_pattern_variable_path_functions(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH p = (a:Person)-[:ACTED_IN]->(m:Movie)<-[:DIRECTED]-(d:Person)
        WHERE a.Name = 'Tom Hanks' AND m.Title = 'Apollo 13'
        RETURN length(p) AS len, nodes(p) AS ids,
               relationships(p)[0].type AS t0, relationships(p)[1].type AS t1
        """
    )
    row = df.collect()[0]
    assert row.len == 2
    assert row.ids == ["p1", "m3", "p3"]
    assert (row.t0, row.t1) == ("ACTED_IN", "DIRECTED")


def test_pattern_variable_through_with(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH p = (a:Person)-[:FOLLOWS]->(b:Person)
        WITH p, a.Name AS name
        RETURN name, length(p) AS len, nodes(p)[-1] AS target
        """
    )
    got = {(r["name"], r["len"], r["target"]) for r in df.collect()}
    assert got == {
        ("Meg Ryan", 1, "p1"),
        ("Bill Paxton", 1, "p1"),
        ("Rob Reiner", 1, "p4"),
        ("Nora Ephron", 1, "p2"),
    }


def test_pattern_variable_rejections(movie_engine):
    with pytest.raises(TranspilerNotSupportedError, match="path variable"):
        movie_engine.cypher(
            "MATCH p = (a:Person)-[:FOLLOWS]->(b:Person) RETURN p"
        )
    # round 9: *2.. path vars row-per-path-expand on finite-depth edge
    # sets (see test_path_var_over_zero_unbounded); the fence now only
    # fires for cyclic/deep relations — covered in
    # test_row_per_path_cyclic_fallback


def test_plain_unbounded_path_variable_witness(movie_engine):
    # round 7: `p = (a)-[:V*]->(b)` binds ONE witness (shortest) path per
    # DISTINCT endpoint pair — the documented pair-model divergence from
    # Neo4j's row-per-path. FOLLOWS: p3->p4->p2->p1, p5->p1.
    df = movie_engine.cypher(
        """
        MATCH p = (a:Person)-[:FOLLOWS*]->(b:Person)
        RETURN a.id AS a, b.id AS b, length(p) AS l, nodes(p) AS ns
        """
    )
    got = {(r["a"], r["b"], r["l"], tuple(r["ns"])) for r in df.collect()}
    assert got == {
        ("p2", "p1", 1, ("p2", "p1")),
        ("p3", "p1", 3, ("p3", "p4", "p2", "p1")),
        ("p3", "p2", 2, ("p3", "p4", "p2")),
        ("p3", "p4", 1, ("p3", "p4")),
        ("p4", "p1", 2, ("p4", "p2", "p1")),
        ("p4", "p2", 1, ("p4", "p2")),
        ("p5", "p1", 1, ("p5", "p1")),
    }
    # relationships(p) reconstructs the hop structs from the witness
    df2 = movie_engine.cypher(
        """
        MATCH p = (a:Person {id: 'p3'})-[:FOLLOWS*]->(b:Person {id: 'p1'})
        RETURN relationships(p) AS rels
        """
    )
    rels = [tuple(x) for x in df2.collect()[0]["rels"]]
    assert rels == [
        ("p3", "p4", "FOLLOWS"),
        ("p4", "p2", "FOLLOWS"),
        ("p2", "p1", "FOLLOWS"),
    ]


def test_shortest_path_lengths_via_pattern(movie_engine):
    # FOLLOWS chains: p3->p4->p2->p1, p5->p1
    df = movie_engine.cypher(
        """
        MATCH p = shortestPath((a:Person)-[:FOLLOWS*]->(b:Person))
        RETURN a.Name AS a, b.Name AS b, length(p) AS hops
        """
    )
    assert rows(df) == {
        ("Meg Ryan", "Tom Hanks", 1),
        ("Bill Paxton", "Tom Hanks", 1),
        ("Rob Reiner", "Nora Ephron", 1),
        ("Nora Ephron", "Meg Ryan", 1),
        ("Rob Reiner", "Meg Ryan", 2),
        ("Nora Ephron", "Tom Hanks", 2),
        ("Rob Reiner", "Tom Hanks", 3),
    }


def test_shortest_path_composes_with_where_and_agg(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH p = shortestPath((a:Person)-[:FOLLOWS*]->(b:Person))
        WHERE b.Name = 'Tom Hanks'
        RETURN max(length(p)) AS diameter_to_tom
        """
    )
    assert rows(df) == {(3,)}


def test_shortest_path_interior_materialized(movie_engine):
    # round 5: the BFS materializes one witness path's node array when
    # the query reads nodes()/relationships() (engine._reads_path_nodes)
    df = movie_engine.cypher(
        "MATCH p = shortestPath((a:Person {Name: 'Rob Reiner'})"
        "-[:FOLLOWS*]->(b:Person)) "
        "WHERE b.Name = 'Tom Hanks' "
        "RETURN nodes(p) AS ns, relationships(p) AS rs"
    )
    row = df.collect()[0]
    assert row.ns == ["p3", "p4", "p2", "p1"]
    assert [(r.src, r.dst, r.type) for r in row.rs] == [
        ("p3", "p4", "FOLLOWS"),
        ("p4", "p2", "FOLLOWS"),
        ("p2", "p1", "FOLLOWS"),
    ]


# ---------------------------------------------------------------------------
# Pattern comprehensions [(a)-[:V]->(b) WHERE p | e]
# ---------------------------------------------------------------------------


def test_pattern_comprehension_in_return(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS name,
               [(p)-[:ACTED_IN]->(m:Movie) | m.Title] AS movies
        """
    )
    got = {r["name"]: sorted(r["movies"]) for r in df.collect()}
    assert got == {
        "Tom Hanks": ["Apollo 13", "Sleepless in Seattle", "You've Got Mail"],
        "Meg Ryan": ["Sleepless in Seattle", "You've Got Mail"],
        "Bill Paxton": ["Apollo 13"],
        "Rob Reiner": [],  # non-actors get [], not null
        "Nora Ephron": [],
    }


def test_pattern_comprehension_with_inner_where(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS name,
               size([(p)-[:REVIEWED]->(m:Movie) WHERE m.Released < 1995 | m.Title]) AS n_old_reviews
        """
    )
    got = {r["name"]: r["n_old_reviews"] for r in df.collect()}
    assert got == {
        "Rob Reiner": 1,  # reviewed m1 (1993); m2 (1998) filtered out
        "Bill Paxton": 1,
        "Tom Hanks": 0,
        "Meg Ryan": 0,
        "Nora Ephron": 0,
    }


def test_pattern_comprehension_in_where(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE size([(p)-[:ACTED_IN]->(m:Movie) | m.Title]) >= 2
        RETURN p.Name AS name
        """
    )
    assert rows(df) == {("Tom Hanks",), ("Meg Ryan",)}


def test_pattern_comprehension_with_multi_rel_types(movie_engine):
    # inner pattern goes through the engine's union-edge rewrite too
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS name,
               size([(p)-[:ACTED_IN|DIRECTED]->(m:Movie) | m.Title]) AS n
        """
    )
    got = {r["name"]: r["n"] for r in df.collect()}
    assert got == {
        "Tom Hanks": 3,
        "Meg Ryan": 2,
        "Bill Paxton": 1,
        "Rob Reiner": 1,
        "Nora Ephron": 2,
    }


# ---------------------------------------------------------------------------
# WITH * / RETURN * (extension)
# ---------------------------------------------------------------------------


def test_with_star_carries_all_bindings(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[r:REVIEWED]->(m:Movie)
        WITH * WHERE r.Rating >= 7
        RETURN p.Name AS name, m.Title AS title
        """
    )
    assert rows(df) == {
        ("Rob Reiner", "Sleepless in Seattle"),
        ("Bill Paxton", "Sleepless in Seattle"),
    }


def test_with_star_plus_extra_item(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Born IS NOT NULL
        WITH *, 2026 - p.Born AS age
        RETURN p.Name AS name, age ORDER BY age DESC LIMIT 1
        """
    )
    assert rows(df) == {("Rob Reiner", 79)}


def test_return_star_values_and_entity_rejection(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WITH p.Name AS name, p.Born AS born
        WHERE born = 1956
        RETURN *
        """
    )
    assert rows(df) == {("Tom Hanks", 1956)}
    # round 6: `MATCH (p) RETURN *` now projects the entity STRUCT
    # (entity projection) instead of raising
    df2 = movie_engine.cypher(
        "MATCH (p:Person) WHERE p.Born = 1956 RETURN *"
    )
    assert [r["p"]["Name"] for r in df2.collect()] == ["Tom Hanks"]


# ---------------------------------------------------------------------------
# Round-4 review-pass regressions
# ---------------------------------------------------------------------------


def test_optional_match_with_path_variable(movie_engine):
    # PathRef constituents from the optional side must remap shared
    # aliases to the surviving left columns (review finding 1)
    df = movie_engine.cypher(
        """
        MATCH (a:Person)
        OPTIONAL MATCH p = (a)-[:DIRECTED]->(m:Movie)
        RETURN a.Name AS n, nodes(p) AS ns
        """
    )
    got = {r["n"]: r["ns"] for r in df.collect() if r["n"] == "Tom Hanks"}
    assert got == {"Tom Hanks": ["p1", None]}  # no DIRECTED edge -> null tail


def test_path_variable_with_constituent_entity(movie_engine):
    # projecting p and one of its constituent entities must not emit the
    # shared id column twice (review finding 2)
    df = movie_engine.cypher(
        """
        MATCH p = (a:Person)-[:DIRECTED]->(m:Movie)
        WITH a, p, count(*) AS n
        RETURN a.Name AS nm, length(p) AS l, n
        """
    )
    assert rows(df) == {("Nora Ephron", 1, 1), ("Rob Reiner", 1, 1)}


def test_ordered_collect_excludes_nulls(spark):
    # ordered_aggregates must keep collect()'s null-exclusion (finding 3)
    import os

    from opencyphertranspiler_spark import (
        CypherEngine,
        GraphSchema,
        TableRegistry,
    )

    persons = spark.createDataFrame(
        [("p1", "A", 2), ("p2", "B", None), ("p3", "C", 1)],
        "id string, Name string, Born int",
    )
    g = GraphSchema.from_json(
        os.path.join(os.path.dirname(__file__), "data", "movie_graph.json")
    )
    reg = TableRegistry()
    reg.register_df("person", persons)
    for t in ("movie", "acted_in", "directed", "reviewed", "follows"):
        reg.register_df(t, spark.createDataFrame([], "a string"))
    eng = CypherEngine(spark, g, reg, ordered_aggregates=True)
    row = eng.cypher(
        """
        MATCH (p:Person)
        WITH p.Born AS b, p.Name AS n ORDER BY n
        RETURN collect(b) AS cb, first(b) AS fb, last(b) AS lb
        """
    ).collect()[0]
    assert row.cb == [2, 1] and row.fb == 2 and row.lb == 1


def test_nested_pattern_comprehension_positions(movie_engine):
    # pattern comprehensions inside list comprehensions and UNWIND
    # (review finding 4)
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        RETURN [t IN [(p)-[:ACTED_IN]->(m:Movie) | m.Title] WHERE t STARTS WITH 'A' | t] AS a_titles
        """
    )
    assert df.collect()[0].a_titles == ["Apollo 13"]
    df2 = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        UNWIND [(p)-[:ACTED_IN]->(m:Movie) | m.Title] AS t
        RETURN t ORDER BY t
        """
    )
    assert [r.t for r in df2.collect()] == [
        "Apollo 13",
        "Sleepless in Seattle",
        "You've Got Mail",
    ]


def test_range_empty_and_null_slice_bounds(movie_engine):
    # range() returns [] on empty ranges; null slice bounds null the
    # slice (review findings 5 and 6)
    row = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Nora Ephron'
        RETURN range(5, 1) AS r, range(5, 1, -2) AS rd,
               range(p.Born, 5) AS rn,
               [1,2,3][p.Born..] AS s1, [1,2,3][0..p.Born] AS s2
        """
    ).collect()[0]
    assert row.r == [] and row.rd == [5, 3, 1]
    assert row.rn is None  # null argument propagates (3VL), not []
    assert row.s1 is None and row.s2 is None


def test_props_on_unbounded_varlength_unknown_prop(movie_engine):
    # round 7 lifted the inline-map fence on unbounded hops (the map now
    # pre-filters the edge set before the fixpoint — see the
    # weighted_engine tests); FOLLOWS has no 'x' property, so this is a
    # binding error now, not a not-supported fence
    from opencyphertranspiler_spark import TranspilerBindingError

    with pytest.raises(TranspilerBindingError, match="no property 'x'"):
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS* {x: 1}]->(b:Person) RETURN a.Name AS n"
        )


def test_second_review_pass_regressions(movie_engine):
    # ordered first()/last() over an all-null group returns null, not an
    # ANSI element_at error (engine option exercised via a fresh engine
    # in test_semantics; here the pattern positions)
    # pattern comprehension inside a list literal lowers instead of
    # hitting an internal error
    row = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        RETURN [[(p)-[:DIRECTED]->(m:Movie) | m.Title], ['x']] AS nested
        """
    ).collect()[0]
    assert row.nested == [[], ["x"]]
    # standalone UNWIND over a pattern gets a typed rejection
    with pytest.raises(TranspilerNotSupportedError, match="standalone UNWIND"):
        movie_engine.cypher(
            "UNWIND [(a:Person)-[:DIRECTED]->(m:Movie) | m.Title] AS t RETURN t"
        )
    # a user's own __-prefixed alias survives WITH *
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        WITH p.Born AS __x WITH * RETURN __x
        """
    )
    assert rows(df) == {(1956,)}


# ---------------------------------------------------------------------------
# Round-5 advisor regressions
# ---------------------------------------------------------------------------


def test_single_quantifier_3vl(movie_engine):
    # openCypher 3VL for single(): false once two elements satisfy the
    # predicate; null while the outcome still depends on a null predicate
    # result; otherwise true-count == 1
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        RETURN single(x IN [1, 2] WHERE x > 1) AS t,
               single(x IN [1, null, 2] WHERE x > 1) AS n1,
               single(x IN [2, null, 3] WHERE x > 1) AS f2,
               single(x IN [1] WHERE x > 5) AS f0,
               single(x IN [] WHERE x > 1) AS fe
        """
    )
    row = df.collect()[0]
    assert (row.t, row.n1, row.f2, row.f0, row.fe) == (
        True,
        None,
        False,
        False,
        False,
    )


def test_shortest_path_min_hops_above_one_rejected(movie_engine):
    # Neo4j rejects shortestPath with a minimal length other than 0/1;
    # the previous dist >= n post-filter silently dropped pairs
    with pytest.raises(TranspilerNotSupportedError, match="minimal hop"):
        movie_engine.cypher(
            "MATCH p = shortestPath((a:Person)-[:FOLLOWS*2..]->(b:Person)) "
            "RETURN length(p) AS hops"
        )


def test_shortest_path_variable_through_with(movie_engine):
    # PathRef.columns() carries the virtual hop's __dist property, so a
    # shortestPath path variable survives WITH (advisor item 1)
    df = movie_engine.cypher(
        """
        MATCH p = shortestPath((a:Person)-[:FOLLOWS*]->(b:Person))
        WITH p, a.Name AS name
        WHERE name = 'Rob Reiner'
        RETURN name, max(length(p)) AS hops
        """
    )
    assert rows(df) == {("Rob Reiner", 3)}


def test_with_star_keeps_user_generated_looking_alias(movie_engine):
    # an alias that MATCHES the generated pattern (`__foo_1`) but was
    # written by the user survives * — exclusion is by membership in the
    # planner's generated set, not by regex
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        WITH p.Born AS __x_1 WITH * RETURN __x_1
        """
    )
    assert rows(df) == {(1956,)}


def test_multi_rel_type_inside_unwind_expr(movie_engine):
    # [:A|B] inside an UNWIND's pattern comprehension reaches the engine's
    # union-edge rewrite (advisor item 5: UnwindClause.expr is walked)
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Nora Ephron'
        UNWIND [(p)-[:ACTED_IN|DIRECTED]->(m:Movie) | m.Title] AS title
        RETURN title
        """
    )
    assert rows(df) == {("Sleepless in Seattle",), ("You've Got Mail",)}


# ---------------------------------------------------------------------------
# Anchored-reachability pushdown (round-5 verdict item 1)
# ---------------------------------------------------------------------------


def test_anchored_reachability_results(movie_engine):
    # FOLLOWS chains: p3->p4->p2->p1, p5->p1
    cases = [
        # src anchor via inline map
        (
            "MATCH (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*]->(b:Person) "
            "RETURN b.Name AS n",
            {"Nora Ephron", "Meg Ryan", "Tom Hanks"},
        ),
        # src anchor via WHERE conjunct in a prior MATCH of the segment
        (
            "MATCH (a:Person) WHERE a.Name = 'Nora Ephron' "
            "MATCH (a)-[:FOLLOWS*]->(b:Person) RETURN b.Name AS n",
            {"Meg Ryan", "Tom Hanks"},
        ),
        # dst anchor (reverse BFS)
        (
            "MATCH (a:Person)-[:FOLLOWS*]->(b:Person {Name: 'Tom Hanks'}) "
            "RETURN a.Name AS n",
            {"Meg Ryan", "Bill Paxton", "Nora Ephron", "Rob Reiner"},
        ),
        # anchored with a minimum hop count
        (
            "MATCH (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*2..]->(b:Person) "
            "RETURN b.Name AS n",
            {"Meg Ryan", "Tom Hanks"},
        ),
    ]
    for cypher, expect in cases:
        got = {r.n for r in movie_engine.cypher(cypher).collect()}
        assert got == expect, cypher


def test_anchored_reachability_work_proportional_to_reachable_set(spark):
    # fresh engine so the reach cache is inspectable: the anchored virtual
    # edge must hold ONLY the anchor's reachable pairs, not the closure of
    # the whole edge table — the property that makes a selective anchored
    # query survive a 100x scale-up
    import os

    from opencyphertranspiler_spark import (
        CypherEngine,
        GraphSchema,
        TableRegistry,
    )

    graph = GraphSchema.from_json(
        os.path.join(os.path.dirname(__file__), "data", "movie_graph.json")
    )
    reg = TableRegistry()
    for name in ("person", "movie", "acted_in", "directed", "reviewed"):
        reg.register(name, lambda: None)  # unused tables may stay unbound
    persons = spark.createDataFrame(
        [("p1", "Tom", 1), ("p2", "Meg", 2), ("p3", "Rob", 3),
         ("p4", "Nora", 4), ("p5", "Bill", 5)],
        "id string, Name string, Born int",
    )
    follows = spark.createDataFrame(
        [("p2", "p1"), ("p5", "p1"), ("p3", "p4"), ("p4", "p2")],
        "_vertexId string, _sink string",
    )
    reg.register_df("person", persons)
    reg.register_df("follows", follows)
    eng = CypherEngine(spark, graph, reg)
    got = {
        r.n
        for r in eng.cypher(
            "MATCH (a:Person {Name: 'Nora'})-[:FOLLOWS*]->(b:Person) "
            "RETURN b.Name AS n"
        ).collect()
    }
    assert got == {"Meg", "Tom"}
    anchored = [k for k in eng._reach_cache if k[2] != ""]
    assert len(anchored) == 1
    # Nora reaches exactly 2 nodes; the full FOLLOWS closure has 7 pairs
    assert eng._reach_cache[anchored[0]].count() == 2


def test_anchored_shortest_path(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH p = shortestPath((a:Person {Name: 'Rob Reiner'})
                               -[:FOLLOWS*]->(b:Person))
        RETURN b.Name AS n, length(p) AS d
        """
    )
    assert {(r.n, r.d) for r in df.collect()} == {
        ("Nora Ephron", 1),
        ("Meg Ryan", 2),
        ("Tom Hanks", 3),
    }
    # dst-anchored: BFS over reversed edges, distances preserved
    df = movie_engine.cypher(
        """
        MATCH p = shortestPath((a:Person)-[:FOLLOWS*]
                               ->(b:Person {Name: 'Meg Ryan'}))
        RETURN a.Name AS n, length(p) AS d
        """
    )
    assert {(r.n, r.d) for r in df.collect()} == {
        ("Nora Ephron", 1),
        ("Rob Reiner", 2),
    }


def test_anchor_not_taken_from_optional_or_other_segment(movie_engine):
    # a WHERE equality inside a different projection segment must NOT seed
    # the anchor (the alias may be rebound); the query still answers
    # correctly via the unanchored closure
    df = movie_engine.cypher(
        """
        MATCH (a:Person)-[:FOLLOWS*]->(b:Person)
        WITH a, b WHERE a.Name = 'Rob Reiner'
        RETURN b.Name AS n
        """
    )
    got = {r.n for r in df.collect()}
    assert got == {"Nora Ephron", "Meg Ryan", "Tom Hanks"}


def test_anchored_reachability_from_parameter(movie_engine):
    # $param equality seeds the fixpoint like a literal; distinct param
    # values get distinct memoized reach tables (value in the fingerprint)
    q = (
        "MATCH (a:Person {Name: $who})-[:FOLLOWS*]->(b:Person) "
        "RETURN b.Name AS n"
    )
    got = {r.n for r in movie_engine.cypher(q, {"who": "Rob Reiner"}).collect()}
    assert got == {"Nora Ephron", "Meg Ryan", "Tom Hanks"}
    got = {r.n for r in movie_engine.cypher(q, {"who": "Nora Ephron"}).collect()}
    assert got == {"Meg Ryan", "Tom Hanks"}
    # WHERE-conjunct param form
    got = {
        r.n
        for r in movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS*]->(b:Person) WHERE a.Name = $who "
            "RETURN b.Name AS n",
            {"who": "Meg Ryan"},
        ).collect()
    }
    assert got == {"Tom Hanks"}


def test_anchored_reachability_from_piped_constant(movie_engine):
    # a constant piped through WITH is resolved as an anchor value
    got = {
        r.n
        for r in movie_engine.cypher(
            "WITH 'Nora Ephron' AS who "
            "MATCH (a:Person) WHERE a.Name = who "
            "MATCH (a)-[:FOLLOWS*]->(b:Person) RETURN b.Name AS n"
        ).collect()
    }
    assert got == {"Meg Ryan", "Tom Hanks"}
    # constant-through-param, renamed across two WITHes, still resolves
    got = {
        r.n
        for r in movie_engine.cypher(
            "WITH $w AS x WITH x AS who "
            "MATCH (a:Person {Name: who})-[:FOLLOWS*]->(b:Person) "
            "RETURN b.Name AS n",
            {"w": "Rob Reiner"},
        ).collect()
    }
    assert got == {"Nora Ephron", "Meg Ryan", "Tom Hanks"}


def test_non_constant_piped_value_still_correct_unanchored(movie_engine):
    # a piped NON-constant (per-row value) must not be mistaken for an
    # anchor; the query falls back to the full closure and stays correct
    got = {
        (r.w, r.n)
        for r in movie_engine.cypher(
            "MATCH (x:Person) WITH x.Name AS who "
            "MATCH (a:Person {Name: who})-[:FOLLOWS*]->(b:Person) "
            "RETURN who AS w, b.Name AS n"
        ).collect()
    }
    assert ("Rob Reiner", "Tom Hanks") in got
    assert ("Nora Ephron", "Meg Ryan") in got
    assert all(w != n for w, n in got)


def test_param_anchor_work_proportional_to_reachable_set(spark):
    # same proportionality property as the literal-anchor test, but the
    # anchor value arrives via $param
    import os

    from opencyphertranspiler_spark import (
        CypherEngine,
        GraphSchema,
        TableRegistry,
    )

    graph = GraphSchema.from_json(
        os.path.join(os.path.dirname(__file__), "data", "movie_graph.json")
    )
    reg = TableRegistry()
    persons = spark.createDataFrame(
        [("p1", "Tom", 1), ("p2", "Meg", 2), ("p3", "Rob", 3),
         ("p4", "Nora", 4), ("p5", "Bill", 5)],
        "id string, Name string, Born int",
    )
    follows = spark.createDataFrame(
        [("p2", "p1"), ("p5", "p1"), ("p3", "p4"), ("p4", "p2")],
        "_vertexId string, _sink string",
    )
    reg.register_df("person", persons)
    reg.register_df("follows", follows)
    eng = CypherEngine(spark, graph, reg)
    got = {
        r.n
        for r in eng.cypher(
            "MATCH (a:Person {Name: $who})-[:FOLLOWS*]->(b:Person) "
            "RETURN b.Name AS n",
            {"who": "Nora"},
        ).collect()
    }
    assert got == {"Meg", "Tom"}
    anchored = [k for k in eng._reach_cache if k[2] != ""]
    assert len(anchored) == 1
    # Nora reaches exactly 2 nodes; the full FOLLOWS closure has 7 pairs
    assert eng._reach_cache[anchored[0]].count() == 2


# ---------------------------------------------------------------------------
# Undirected variable-length -[:V*n..m]- / -[:V*]- (round-5 verdict item 4)
# ---------------------------------------------------------------------------
# FOLLOWS tree (undirected): p3 - p4 - p2 - p1 - p5


def test_undirected_bounded_varlength(movie_engine):
    # 1..2 undirected hops from Tom Hanks: Meg(1), Bill(1), Nora(2);
    # the go-and-return trail (p1-p2-p1) reuses its relationship and is
    # excluded by identity-based uniqueness
    df = movie_engine.cypher(
        "MATCH (a:Person {Name: 'Tom Hanks'})-[:FOLLOWS*1..2]-(b:Person) "
        "RETURN b.Name AS n"
    )
    assert sorted(r.n for r in df.collect()) == [
        "Bill Paxton",
        "Meg Ryan",
        "Nora Ephron",
    ]
    # exact *2: only Nora (one row per path)
    df = movie_engine.cypher(
        "MATCH (a:Person {Name: 'Tom Hanks'})-[:FOLLOWS*2]-(b:Person) "
        "RETURN b.Name AS n"
    )
    assert [r.n for r in df.collect()] == ["Nora Ephron"]


def test_undirected_unbounded_varlength(movie_engine):
    # the FOLLOWS tree is connected: every ordered pair of distinct
    # persons is reachable; self-pairs are excluded (documented)
    df = movie_engine.cypher(
        "MATCH (a:Person)-[:FOLLOWS*]-(b:Person) "
        "RETURN a.Name AS a, b.Name AS b"
    )
    rows_ = df.collect()
    assert len(rows_) == 20
    assert all(r.a != r.b for r in rows_)
    # anchored undirected: seeds the BFS from the filtered endpoint
    df = movie_engine.cypher(
        "MATCH (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*]-(b:Person) "
        "RETURN b.Name AS n"
    )
    assert sorted(r.n for r in df.collect()) == [
        "Bill Paxton",
        "Meg Ryan",
        "Nora Ephron",
        "Tom Hanks",
    ]


def test_undirected_shortest_path(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH p = shortestPath((a:Person {Name: 'Bill Paxton'})
                               -[:FOLLOWS*]-(b:Person))
        RETURN b.Name AS n, length(p) AS d
        """
    )
    assert {(r.n, r.d) for r in df.collect()} == {
        ("Tom Hanks", 1),
        ("Meg Ryan", 2),
        ("Nora Ephron", 3),
        ("Rob Reiner", 4),
    }


def test_undirected_varlength_rejections(movie_engine):
    # cross-label edges stay rejected (the undirected closure would
    # alternate labels per parity)
    with pytest.raises(TranspilerNotSupportedError, match="share a single"):
        movie_engine.cypher(
            "MATCH (a:Person)-[:ACTED_IN*1..2]-(b:Movie) RETURN a.Name AS n"
        )
    # plain single-hop undirected same-label is still the reference's
    # rejection (LogicalPlan.cs:603-612) — only var-length lifts it
    with pytest.raises(TranspilerNotSupportedError):
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS]-(b:Person) RETURN a.Name AS n"
        )


# ---------------------------------------------------------------------------
# EXISTS { } / COUNT { } subqueries (round-5 verdict item 6)
# ---------------------------------------------------------------------------


def test_exists_subquery_with_inner_where(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE EXISTS { MATCH (p)-[r:REVIEWED]->(m:Movie) WHERE r.Rating > 8 }
        RETURN p.Name AS n
        """
    )
    assert [r.n for r in df.collect()] == ["Rob Reiner"]


def test_count_subquery_forms(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS n,
               COUNT { (p)-[:ACTED_IN]->(:Movie) } AS acted,
               COUNT { (p)-[:DIRECTED]->(:Movie) } AS directed
        """
    )
    got = {(r.n, r.acted, r.directed) for r in df.collect()}
    assert got == {
        ("Tom Hanks", 3, 0),
        ("Meg Ryan", 2, 0),
        ("Rob Reiner", 0, 1),
        ("Nora Ephron", 0, 2),
        ("Bill Paxton", 1, 0),
    }


def test_count_subquery_in_where_and_not_exists(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE COUNT { (p)-[:ACTED_IN]->(:Movie) } >= 2
          AND NOT EXISTS { (p)-[:REVIEWED]->(:Movie) }
        RETURN p.Name AS n
        """
    )
    assert sorted(r.n for r in df.collect()) == ["Meg Ryan", "Tom Hanks"]


def test_exists_subquery_under_or(movie_engine):
    # flag lowering: EXISTS {} composes under OR like exists()
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        WHERE p.Born < 1950
           OR EXISTS { (p)-[r:REVIEWED]->(:Movie) WHERE r.Rating = 7 }
        RETURN p.Name AS n
        """
    )
    assert sorted(r.n for r in df.collect()) == ["Bill Paxton", "Rob Reiner"]


def test_subquery_rejections(movie_engine):
    with pytest.raises(TranspilerNotSupportedError, match="single MATCH"):
        movie_engine.cypher(
            "MATCH (p:Person) WHERE EXISTS { MATCH (p)-[:ACTED_IN]->(m:Movie) "
            "RETURN m } RETURN p.Name AS n"
        )
    # round-11 continuation: a bare ALIASED node subquery is now the
    # uncorrelated count — every person passes (more than one movie)
    n_people = movie_engine.cypher(
        "MATCH (p:Person) RETURN count(*) AS c"
    ).collect()[0].c
    got = movie_engine.cypher(
        "MATCH (p:Person) WHERE COUNT { (m:Movie) } > 1 RETURN count(*) AS c"
    ).collect()[0].c
    assert got == n_people
    # a bare ANONYMOUS node keeps a typed error
    with pytest.raises(TranspilerNotSupportedError, match="bare anonymous"):
        movie_engine.cypher(
            "MATCH (p:Person) WHERE COUNT { (:Movie) } > 1 RETURN p.Name AS n"
        )


def test_collect_subquery(movie_engine):
    # COLLECT { MATCH ... RETURN e } (Neo4j 5) — exactly the
    # pattern-comprehension lowering, [] when nothing matches
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        RETURN p.Name AS n,
               COLLECT { MATCH (p)-[:ACTED_IN]->(m:Movie)
                         WHERE m.Released < 1996
                         RETURN m.Title } AS titles
        """
    )
    got = {r.n: sorted(r.titles) for r in df.collect()}
    assert got == {
        "Tom Hanks": ["Apollo 13", "Sleepless in Seattle"],
        "Meg Ryan": ["Sleepless in Seattle"],
        "Bill Paxton": ["Apollo 13"],
        "Rob Reiner": [],
        "Nora Ephron": [],
    }


def test_collect_subquery_composes(movie_engine):
    # size() over it, and a map projection as the returned element
    df = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.Name = 'Tom Hanks'
        RETURN size(COLLECT { (p)-[:ACTED_IN]->(m:Movie) RETURN m.Title }) AS n,
               COLLECT { (p)-[:REVIEWED]->(m:Movie)
                         RETURN m {.Title, .Released} } AS reviewed
        """
    )
    r = df.collect()[0]
    assert r.n == 3 and r.reviewed == []


def test_collect_subquery_rejections(movie_engine):
    with pytest.raises(TranspilerNotSupportedError, match="RETURN DISTINCT"):
        movie_engine.cypher(
            "MATCH (p:Person) RETURN COLLECT { (p)-[:ACTED_IN]->(m:Movie) "
            "RETURN DISTINCT m.Title } AS t"
        )
    with pytest.raises(TranspilerNotSupportedError, match="multi-clause"):
        movie_engine.cypher(
            "MATCH (p:Person) RETURN COLLECT { (p)-[:ACTED_IN]->(m:Movie) "
            "WITH m RETURN m.Title } AS t"
        )


# ---------------------------------------------------------------------------
# Path interior materialization for bounded *n..m (round-5 verdict item 5)
# ---------------------------------------------------------------------------


def test_bounded_varlength_path_functions(movie_engine):
    # FOLLOWS chains: p3->p4->p2->p1, p5->p1
    df = movie_engine.cypher(
        """
        MATCH p = (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*1..3]->(b:Person)
        RETURN b.Name AS n, length(p) AS l, nodes(p) AS ns,
               relationships(p)[0].type AS t0
        """
    )
    got = {(r.n, r.l, tuple(r.ns), r.t0) for r in df.collect()}
    assert got == {
        ("Nora Ephron", 1, ("p3", "p4"), "FOLLOWS"),
        ("Meg Ryan", 2, ("p3", "p4", "p2"), "FOLLOWS"),
        ("Tom Hanks", 3, ("p3", "p4", "p2", "p1"), "FOLLOWS"),
    }


def test_bounded_varlength_path_through_with_and_where(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH p = (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*1..3]->(b:Person)
        WHERE length(p) >= 2
        WITH p, b.Name AS n
        RETURN n, nodes(p)[-1] AS last, size(relationships(p)) AS m
        """
    )
    got = {(r.n, r.last, r.m) for r in df.collect()}
    assert got == {("Meg Ryan", "p2", 2), ("Tom Hanks", "p1", 3)}


def test_exact_varlength_single_variant_path(movie_engine):
    # a single-variant expansion (*2) binds a plain PathRef over the
    # expanded constituents — interior anonymous nodes included
    df = movie_engine.cypher(
        """
        MATCH p = (a:Person {Name: 'Rob Reiner'})-[:FOLLOWS*2]->(b:Person)
        RETURN b.Name AS n, nodes(p) AS ns
        """
    )
    got = {(r.n, tuple(r.ns)) for r in df.collect()}
    assert got == {("Meg Ryan", ("p3", "p4", "p2"))}


def test_undirected_shortest_path_nodes(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH p = shortestPath((a:Person {Name: 'Bill Paxton'})
                               -[:FOLLOWS*]-(b:Person))
        WHERE b.Name = 'Rob Reiner'
        RETURN nodes(p) AS ns, relationships(p)[0].type AS t
        """
    )
    row = df.collect()[0]
    assert row.ns == ["p5", "p1", "p2", "p4", "p3"]
    assert row.t == "FOLLOWS"  # display verb, not the internal __UVL name


# ---------------------------------------------------------------------------
# CALL { } subqueries (round-5 extension; the reference rejects CALL)
# ---------------------------------------------------------------------------


def test_call_correlated_aggregate_defaults(movie_engine):
    # LEFT join + count->0 for persons with no reviews
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        CALL { WITH p MATCH (p)-[r:REVIEWED]->(:Movie)
               RETURN count(r) AS reviews, collect(r.Rating) AS ratings }
        RETURN p.Name AS n, reviews, ratings
        """
    )
    got = {(r.n, r.reviews, tuple(sorted(r.ratings))) for r in df.collect()}
    assert got == {
        ("Tom Hanks", 0, ()),
        ("Meg Ryan", 0, ()),
        ("Rob Reiner", 2, (6, 9)),
        ("Bill Paxton", 1, (7,)),
        ("Nora Ephron", 0, ()),
    }


def test_call_correlated_non_aggregate_inner_join(movie_engine):
    # non-aggregate output: zero subquery rows drop the outer row
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        CALL { WITH p MATCH (p)-[:DIRECTED]->(m:Movie) RETURN m.Title AS t }
        RETURN p.Name AS n, t
        """
    )
    got = {(r.n, r.t) for r in df.collect()}
    assert got == {
        ("Nora Ephron", "Sleepless in Seattle"),
        ("Nora Ephron", "You've Got Mail"),
        ("Rob Reiner", "Apollo 13"),
    }


def test_call_uncorrelated_cross_join(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (r:Person) WHERE r.Name = 'Tom Hanks'
        CALL { MATCH (m:Movie) RETURN count(m) AS movies }
        RETURN r.Name AS n, movies
        """
    )
    assert rows(df) == {("Tom Hanks", 3)}


def test_call_with_intermediate_with_and_distinct(movie_engine):
    # per-outer-row DISTINCT through an intermediate WITH
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        CALL { WITH p MATCH (p)-[:ACTED_IN]->(m:Movie)<-[:ACTED_IN]-(co:Person)
               WITH DISTINCT co
               RETURN count(co) AS costars }
        RETURN p.Name AS n, costars
        """
    )
    got = {(r.n, r.costars) for r in df.collect()}
    # Tom: Meg (two shared movies, deduped by the DISTINCT) + Bill = 2;
    # relationship uniqueness keeps co != p per movie
    assert got == {
        ("Tom Hanks", 2),
        ("Meg Ryan", 1),
        ("Bill Paxton", 1),
        ("Rob Reiner", 0),
        ("Nora Ephron", 0),
    }


def test_call_per_row_order_limit(movie_engine):
    # ORDER BY/LIMIT inside a correlated CALL applies PER OUTER ROW
    # (row_number window over the import ids): top-rated review per person
    df = movie_engine.cypher(
        """
        MATCH (p:Person)
        CALL { WITH p MATCH (p)-[r:REVIEWED]->(m:Movie)
               RETURN m.Title AS t, r.Rating AS rating
               ORDER BY r.Rating DESC LIMIT 1 }
        RETURN p.Name AS n, t, rating
        """
    )
    assert {(r.n, r.t, r.rating) for r in df.collect()} == {
        ("Rob Reiner", "Sleepless in Seattle", 9),
        ("Bill Paxton", "Sleepless in Seattle", 7),
    }


def test_call_rejections(movie_engine):
    # round-11 continuation: a SCALAR import is now supported (distinct-
    # value seed + null-safe join-back) — names are unique in the movie
    # fixture, so each row pairs a person with their own Born
    by_name = sorted(
        map(
            tuple,
            movie_engine.cypher(
                "MATCH (p:Person) WITH p.Name AS nm "
                "CALL { WITH nm MATCH (q:Person) WHERE q.Name = nm "
                "RETURN q.Born AS b } RETURN nm, b"
            ).collect(),
        )
    )
    direct = sorted(
        map(
            tuple,
            movie_engine.cypher(
                "MATCH (p:Person) RETURN p.Name AS nm, p.Born AS b"
            ).collect(),
        )
    )
    assert by_name == direct
    # procedure calls are now an extension (engine._resolve_procedures)
    # but an in-query call still must YIELD, and only the three schema
    # procedures exist
    from opencyphertranspiler_spark.exceptions import TranspilerSyntaxError

    with pytest.raises(TranspilerSyntaxError, match="YIELD"):
        movie_engine.cypher("CALL db.labels() RETURN x")
    with pytest.raises(TranspilerNotSupportedError, match="db.labels"):
        movie_engine.cypher("CALL dbms.components()")
    # round 6: correlated UNION is supported — a mixed
    # correlated+uncorrelated branch pair plans per-branch and unions the
    # joined outputs (UNION dedups subquery rows per outer row)
    df = movie_engine.cypher(
        "MATCH (p:Person {Name: 'Rob Reiner'}) "
        "CALL { WITH p MATCH (p)-[:DIRECTED]->(m:Movie) "
        "RETURN m.Title AS t "
        "UNION MATCH (m:Movie {Released: 1993}) RETURN m.Title AS t } "
        "RETURN p.Name AS n, t ORDER BY t"
    )
    assert [tuple(r) for r in df.collect()] == [
        ("Rob Reiner", "Apollo 13"),
        ("Rob Reiner", "Sleepless in Seattle"),
    ]


def test_call_uncorrelated_union(movie_engine):
    # UNION dedups across branches; the union cross joins into outer rows
    df = movie_engine.cypher(
        "MATCH (p:Person {Name: 'Tom Hanks'}) "
        "CALL { MATCH (m:Movie) WHERE m.Released < 1995 RETURN m.Title AS t "
        "UNION MATCH (m:Movie) WHERE m.Released >= 1995 RETURN m.Title AS t } "
        "RETURN p.Name AS n, t"
    )
    assert {(r.n, r.t) for r in df.collect()} == {
        ("Tom Hanks", "Sleepless in Seattle"),
        ("Tom Hanks", "You've Got Mail"),
        ("Tom Hanks", "Apollo 13"),
    }
    # UNION ALL keeps duplicates
    df = movie_engine.cypher(
        "CALL { MATCH (m:Movie) RETURN m.Title AS t "
        "UNION ALL MATCH (m:Movie) RETURN m.Title AS t } "
        "RETURN count(t) AS c"
    )
    assert df.collect()[0].c == 6


def test_call_standalone_first_clause(movie_engine):
    df = movie_engine.cypher(
        "CALL { MATCH (m:Movie) RETURN m.Title AS t } RETURN t"
    )
    assert {r.t for r in df.collect()} == {
        "Sleepless in Seattle",
        "You've Got Mail",
        "Apollo 13",
    }


def test_dynamic_property_access(movie_engine):
    # literal key == static access (native type preserved)
    df = movie_engine.cypher(
        "MATCH (p:Person) WHERE p['Born'] > 1955 RETURN p['Name'] AS n"
    )
    assert rows(df) == {("Tom Hanks",), ("Meg Ryan",)}
    # computed key: when-chain over the declared schema, string-rendered
    # on heterogeneous property sets; unknown keys yield null
    df2 = movie_engine.cypher(
        """
        MATCH (p:Person) WHERE p.id = 'p1'
        UNWIND ['Name', 'Born', 'Nope'] AS k
        RETURN k, p[k] AS v ORDER BY k
        """
    )
    assert [tuple(r) for r in df2.collect()] == [
        ("Born", "1956"),
        ("Name", "Tom Hanks"),
        ("Nope", None),
    ]
    # dynamic access on a relationship alias
    df3 = movie_engine.cypher(
        "MATCH (p:Person)-[r:REVIEWED]->(m:Movie) "
        "WHERE m.id = 'm1' RETURN p.Name AS n, r['Rating'] AS rating"
    )
    # literal key keeps the native type (int)
    assert rows(df3) == {("Rob Reiner", 9), ("Bill Paxton", 7)}


def test_dynamic_property_unknown_literal_key_is_null(movie_engine):
    # Neo4j parity: dynamic access with an unknown key yields null — for
    # literal AND computed keys alike (static p.Nope still raises)
    df = movie_engine.cypher(
        "MATCH (p:Person) WHERE p.id = 'p1' RETURN p['Nope'] AS x"
    )
    assert [tuple(r) for r in df.collect()] == [(None,)]
    from opencyphertranspiler_spark import TranspilerBindingError

    with pytest.raises(TranspilerBindingError):
        movie_engine.cypher("MATCH (p:Person) RETURN p.Nope AS x")


# ---------------------------------------------------------------------------
# RETURN n / RETURN r entity projection (round 6 — lifts the reference's
# LogicalPlan.cs:324-328 fence: a returned entity is a named STRUCT of its
# properties)
# ---------------------------------------------------------------------------


def test_return_node_entity_struct(movie_engine):
    df = movie_engine.cypher(
        "MATCH (m:Movie) RETURN m ORDER BY m.Released LIMIT 2"
    )
    assert df.columns == ["m"]
    got = [r["m"].asDict() for r in df.collect()]
    assert got == [
        {"id": "m1", "Title": "Sleepless in Seattle",
         "Tagline": "What if...", "Released": 1993},
        {"id": "m3", "Title": "Apollo 13",
         "Tagline": "Houston...", "Released": 1995},
    ]


def test_return_distinct_entity_struct(movie_engine):
    # p1/p2 both acted in m1 and m2 -> duplicate movie rows pre-DISTINCT
    df = movie_engine.cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) RETURN DISTINCT m"
    )
    got = {r["m"]["id"] for r in df.collect()}
    assert got == {"m1", "m2", "m3"}
    assert df.count() == 3


def test_return_entity_with_passthrough(movie_engine):
    # entity rides through WITH (still an entity there: WHERE on its
    # properties works), the final RETURN projects the struct
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        WITH p, count(m) AS n WHERE n >= 3
        RETURN p, n
        """
    )
    out = [(r["p"]["Name"], r["n"]) for r in df.collect()]
    assert out == [("Tom Hanks", 3)]


def test_return_relationship_entity_struct(movie_engine):
    # relationship struct carries endpoint ids + declared properties
    df = movie_engine.cypher(
        "MATCH (p:Person)-[r:REVIEWED]->(m:Movie) "
        "WHERE m.id = 'm2' RETURN r"
    )
    got = [r["r"].asDict() for r in df.collect()]
    assert got == [
        {"_vertexId": "p3", "_sink": "m2", "Summary": "OK", "Rating": 6}
    ]


def test_return_optional_unmatched_entity_is_null(movie_engine):
    # Nora Ephron has no Born year; nobody REVIEWED m3 -> null struct,
    # not a struct of nulls (Neo4j null-node parity)
    df = movie_engine.cypher(
        """
        MATCH (m:Movie) OPTIONAL MATCH (p:Person)-[:REVIEWED]->(m)
        RETURN m.id AS mid, p ORDER BY mid
        """
    )
    by_mid = {}
    for r in df.collect():
        by_mid.setdefault(r["mid"], []).append(r["p"])
    assert by_mid["m3"] == [None]
    assert {p["Name"] for p in by_mid["m1"]} == {"Rob Reiner", "Bill Paxton"}


def test_collect_entity_structs(movie_engine):
    df = movie_engine.cypher(
        """
        MATCH (p:Person)-[:ACTED_IN]->(m:Movie)
        RETURN m.Title AS t, collect(p) AS cast ORDER BY t
        """
    )
    out = {r["t"]: sorted(p["Name"] for p in r["cast"]) for r in df.collect()}
    assert out == {
        "Apollo 13": ["Bill Paxton", "Tom Hanks"],
        "Sleepless in Seattle": ["Meg Ryan", "Tom Hanks"],
        "You've Got Mail": ["Meg Ryan", "Tom Hanks"],
    }
    # collect(DISTINCT n) dedups by the whole struct
    df2 = movie_engine.cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
        "RETURN collect(DISTINCT p) AS people"
    )
    people = df2.collect()[0]["people"]
    assert sorted(p["Name"] for p in people) == [
        "Bill Paxton", "Meg Ryan", "Tom Hanks"
    ]


def test_return_star_projects_entity_structs(movie_engine):
    df = movie_engine.cypher(
        "MATCH (p:Person)-[:DIRECTED]->(m:Movie) "
        "WHERE m.id = 'm3' RETURN *"
    )
    assert sorted(df.columns) == ["m", "p"]
    row = df.collect()[0]
    assert row["p"]["Name"] == "Rob Reiner"
    assert row["m"]["Title"] == "Apollo 13"


def test_return_entity_grouping_key(movie_engine):
    # implicit GROUP BY on the struct itself (RETURN m, count(p))
    df = movie_engine.cypher(
        "MATCH (p:Person)-[:ACTED_IN]->(m:Movie) RETURN m, count(p) AS n"
    )
    out = {r["m"]["Title"]: r["n"] for r in df.collect()}
    assert out == {
        "Sleepless in Seattle": 2, "You've Got Mail": 2, "Apollo 13": 2
    }


def test_return_path_variable_still_fenced(movie_engine):
    with pytest.raises(TranspilerNotSupportedError, match="path"):
        movie_engine.cypher(
            "MATCH p = (a:Person)-[:REVIEWED]->(m:Movie) RETURN p"
        )


def test_postfix_relationship_quantifiers(movie_engine):
    """GQL / Neo4j 5 quantified relationships (round 8): `-[:R]->{n,m}`,
    `->+` and `->*` are sugar over the bracket *n..m spellings."""
    from opencyphertranspiler_spark import TranspilerSyntaxError

    def r(q):
        return rows(movie_engine.cypher(q))

    base = "MATCH (a:Person)-[:FOLLOWS]->%s(b:Person) RETURN a.Name AS a, b.Name AS b"
    assert r(base % "{1,2}") == r(
        "MATCH (a:Person)-[:FOLLOWS*1..2]->(b:Person) RETURN a.Name AS a, b.Name AS b"
    )
    assert r(base % "+") == r(
        "MATCH (a:Person)-[:FOLLOWS*]->(b:Person) RETURN a.Name AS a, b.Name AS b"
    )
    assert r(base % "*") == r(
        "MATCH (a:Person)-[:FOLLOWS*0..]->(b:Person) RETURN a.Name AS a, b.Name AS b"
    )
    assert r(base % "{2}") == {
        ("Nora Ephron", "Tom Hanks"),
        ("Rob Reiner", "Meg Ryan"),
    }
    assert r(base % "{,1}") == r(
        "MATCH (a:Person)-[:FOLLOWS*0..1]->(b:Person) RETURN a.Name AS a, b.Name AS b"
    )
    with pytest.raises(TranspilerSyntaxError, match="Duplicate quantifier"):
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS*1..2]->{1,2}(b:Person) RETURN a.Name AS n"
        )
    with pytest.raises(TranspilerSyntaxError, match="Invalid relationship"):
        movie_engine.cypher(
            "MATCH (a:Person)-[:FOLLOWS]->{3,2}(b:Person) RETURN a.Name AS n"
        )
    with pytest.raises(TranspilerNotSupportedError, match="bound to an"):
        movie_engine.cypher(
            "MATCH (a:Person)-[r:FOLLOWS]->{1,2}(b:Person) RETURN a.Name AS n"
        )


# -- round 9: row-per-path expansion for unbounded path variables -------------


@pytest.fixture(scope="module")
def diamond_engine(spark):
    """Diamond DAG a->{b,c}->d->e: two distinct paths share the (a, d)
    and (a, e) endpoint pairs, so row-per-path (Neo4j) and the
    endpoint-pair witness model genuinely differ."""
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], "id string"
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    reg = TableRegistry()
    reg.register_df("n", nodes)
    reg.register_df("l", edges)
    g = GraphSchema(
        [NodeSchema("N", "n", "id", ())],
        [EdgeSchema("L", "N", "N", "l", "src", "dst")],
    )
    return CypherEngine(spark, g, reg)


@pytest.fixture(scope="module")
def cyclic_engine(spark):
    """Three-node directed cycle x->y->z->x: walks never terminate, so
    the finite-depth discovery fails and path variables fall back to the
    witness-pair model."""
    nodes = spark.createDataFrame([("x",), ("y",), ("z",)], "id string")
    edges = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
    )
    reg = TableRegistry()
    reg.register_df("n", nodes)
    reg.register_df("l", edges)
    g = GraphSchema(
        [NodeSchema("N", "n", "id", ())],
        [EdgeSchema("L", "N", "N", "l", "src", "dst")],
    )
    return CypherEngine(spark, g, reg)


def test_row_per_path_on_dag(diamond_engine):
    """`p = (x)-[:L*]->(y)` on a finite-depth DAG enumerates one ROW PER
    PATH (Neo4j semantics), not one per endpoint pair: 5 single edges +
    a-b-d, a-c-d, b-d-e, c-d-e, a-b-d-e, a-c-d-e = 11 paths."""
    rows_ = sorted(
        map(
            tuple,
            diamond_engine.cypher(
                "MATCH p = (x:N)-[:L*]->(y:N) "
                "RETURN x.id AS x, y.id AS y, length(p) AS l"
            ).collect(),
        )
    )
    assert rows_ == [
        ("a", "b", 1), ("a", "c", 1),
        ("a", "d", 2), ("a", "d", 2),
        ("a", "e", 3), ("a", "e", 3),
        ("b", "d", 1), ("b", "e", 2),
        ("c", "d", 1), ("c", "e", 2),
        ("d", "e", 1),
    ]
    # the two a->e paths materialize DIFFERENT node arrays
    ns = sorted(
        tuple(r.ns)
        for r in diamond_engine.cypher(
            "MATCH p = (x:N {id:'a'})-[:L*]->(y:N {id:'e'}) "
            "RETURN nodes(p) AS ns"
        ).collect()
    )
    assert ns == [("a", "b", "d", "e"), ("a", "c", "d", "e")]


def test_path_aggregates_count_and_collect(diamond_engine):
    assert (
        diamond_engine.cypher(
            "MATCH p = (x:N)-[:L*]->(y:N) RETURN count(p) AS c"
        ).collect()[0].c
        == 11
    )
    grouped = sorted(
        map(
            tuple,
            diamond_engine.cypher(
                "MATCH p = (x:N)-[:L*]->(y:N {id:'d'}) "
                "RETURN x.id AS x, count(p) AS c"
            ).collect(),
        )
    )
    assert grouped == [("a", 2), ("b", 1), ("c", 1)]
    ps = diamond_engine.cypher(
        "MATCH p = (x:N {id:'a'})-[:L*]->(y:N {id:'d'}) "
        "RETURN collect(p) AS ps"
    ).collect()[0].ps
    assert sorted(tuple(p.nodes) for p in ps) == [
        ("a", "b", "d"),
        ("a", "c", "d"),
    ]
    assert all(p.length == 2 for p in ps)
    # count(DISTINCT p) counts distinct path shapes
    assert (
        diamond_engine.cypher(
            "MATCH p = (x:N {id:'a'})-[:L*]->(y:N {id:'d'}) "
            "RETURN count(DISTINCT p) AS c"
        ).collect()[0].c
        == 2
    )


def test_row_per_path_min_hops_floor(diamond_engine):
    """*2.. on a finite-depth relation expands row-per-path with the
    length floor applied (previously a typed error)."""
    rows_ = sorted(
        map(
            tuple,
            diamond_engine.cypher(
                "MATCH p = (x:N)-[:L*2..]->(y:N) "
                "RETURN x.id AS x, y.id AS y, length(p) AS l"
            ).collect(),
        )
    )
    assert rows_ == [
        ("a", "d", 2), ("a", "d", 2),
        ("a", "e", 3), ("a", "e", 3),
        ("b", "e", 2), ("c", "e", 2),
    ]


def test_row_per_path_cyclic_enumeration(cyclic_engine):
    """Round 10 (VERDICT r9 #1): on a cyclic edge set, path variables
    enumerate RELATIONSHIP-UNIQUE paths (which terminates on any graph —
    a path cannot reuse an edge) instead of falling back to the
    witness-pair model. On the 3-cycle each node starts exactly three
    paths (lengths 1, 2, 3 — the full loop), and *2.. now works."""
    got = sorted(
        map(
            tuple,
            cyclic_engine.cypher(
                "MATCH p = (x:N)-[:L*]->(y:N) "
                "RETURN x.id AS x, y.id AS y, length(p) AS l"
            ).collect(),
        )
    )
    assert got == [
        ("x", "x", 3), ("x", "y", 1), ("x", "z", 2),
        ("y", "x", 2), ("y", "y", 3), ("y", "z", 1),
        ("z", "x", 1), ("z", "y", 2), ("z", "z", 3),
    ]
    floored = sorted(
        map(
            tuple,
            cyclic_engine.cypher(
                "MATCH p = (x:N)-[:L*2..]->(y:N) "
                "RETURN x.id AS x, y.id AS y, length(p) AS l"
            ).collect(),
        )
    )
    assert floored == [
        ("x", "x", 3), ("x", "z", 2),
        ("y", "x", 2), ("y", "y", 3),
        ("z", "y", 2), ("z", "z", 3),
    ]
    # *0.. adds the three length-0 identity paths on top of the cycles
    zero = cyclic_engine.cypher(
        "MATCH p = (x:N)-[:L*0..]->(y:N) RETURN count(p) AS c, "
        "sum(CASE WHEN length(p) = 0 THEN 1 ELSE 0 END) AS z"
    ).collect()[0]
    assert (zero.c, zero.z) == (12, 3)


def test_row_per_path_cyclic_chord_vs_duckdb(spark):
    """VERDICT r9 #1 'done' criterion: count(p)/collect(p) over a CYCLIC
    fixture (3-cycle plus a chord — pairs with MULTIPLE rel-unique
    paths) hash-match a DuckDB recursive CTE that carries the traversed
    rel set and forbids reuse."""
    import duckdb

    edges = [("x", "y"), ("y", "z"), ("z", "x"), ("x", "z")]
    nodes = spark.createDataFrame([("x",), ("y",), ("z",)], "id string")
    e_df = spark.createDataFrame(edges, "src string, dst string")
    reg = TableRegistry()
    reg.register_df("n", nodes)
    reg.register_df("l", e_df)
    g = GraphSchema(
        [NodeSchema("N", "n", "id", ())],
        [EdgeSchema("L", "N", "N", "l", "src", "dst")],
    )
    eng = CypherEngine(spark, g, reg)
    got = sorted(
        map(
            tuple,
            eng.cypher(
                "MATCH p = (x:N)-[:L*]->(y:N) "
                "RETURN x.id AS x, y.id AS y, length(p) AS l, "
                "count(p) AS c"
            ).collect(),
        )
    )
    d = duckdb.connect()
    d.sql(
        "CREATE TABLE e (s varchar, d varchar); INSERT INTO e VALUES "
        + ", ".join(f"('{s}','{t}')" for s, t in edges)
    )
    exp = sorted(
        map(
            tuple,
            d.sql(
                """
                WITH RECURSIVE paths(src, dst, len, rels) AS (
                    SELECT s, d, 1, [s || '>' || d] FROM e
                    UNION ALL
                    SELECT p.src, e.d, p.len + 1,
                           list_append(p.rels, e.s || '>' || e.d)
                    FROM paths p JOIN e ON e.s = p.dst
                    WHERE NOT list_contains(p.rels, e.s || '>' || e.d)
                )
                SELECT src AS x, dst AS y, len AS l, count(*) AS c
                FROM paths GROUP BY 1, 2, 3
                """
            ).fetchall(),
        )
    )
    assert got == exp and len(got) > 0
    # collect(p) materializes every enumerated path's node array
    ps = eng.cypher(
        "MATCH p = (a:N {id:'y'})-[:L*]->(b:N) RETURN collect(p) AS ps"
    ).collect()[0].ps
    assert sorted((p.length, tuple(p.nodes)) for p in ps) == [
        (1, ("y", "z")),
        (2, ("y", "z", "x")),
        (3, ("y", "z", "x", "y")),
        (3, ("y", "z", "x", "z")),
    ]


def test_row_per_path_cap_fallback(spark):
    """Round 12 (VERDICT r11 #2): a cap overflow is a TYPED ERROR by
    default — the degraded walk/witness models change row counts on
    cyclic graphs. allow_walk_fallback=True restores the r11 behavior
    (warn + witness-pair model); *2.. keeps its own typed error."""
    import warnings

    from opencyphertranspiler_spark.exceptions import (
        PathEnumerationCapWarning,
    )

    nodes = spark.createDataFrame([("x",), ("y",), ("z",)], "id string")
    e_df = spark.createDataFrame(
        [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
    )
    reg = TableRegistry()
    reg.register_df("n", nodes)
    reg.register_df("l", e_df)
    g = GraphSchema(
        [NodeSchema("N", "n", "id", ())],
        [EdgeSchema("L", "N", "N", "l", "src", "dst")],
    )
    strict = CypherEngine(spark, g, reg, path_enum_max_hops=2)
    with pytest.raises(
        TranspilerNotSupportedError, match="allow_walk_fallback"
    ):
        strict.cypher(
            "MATCH p = (x:N)-[:L*]->(y:N) "
            "RETURN x.id AS x, y.id AS y, length(p) AS l"
        )
    eng = CypherEngine(
        spark, g, reg, path_enum_max_hops=2, allow_walk_fallback=True
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = sorted(
            map(
                tuple,
                eng.cypher(
                    "MATCH p = (x:N)-[:L*]->(y:N) "
                    "RETURN x.id AS x, y.id AS y, length(p) AS l"
                ).collect(),
            )
        )
    assert any(
        issubclass(w.category, PathEnumerationCapWarning) for w in caught
    )
    # witness model: one row per reachable pair, shortest distance
    assert got == [
        ("x", "x", 3), ("x", "y", 1), ("x", "z", 2),
        ("y", "x", 2), ("y", "y", 3), ("y", "z", 1),
        ("z", "x", 1), ("z", "y", 2), ("z", "z", 3),
    ]
    with pytest.raises(
        TranspilerNotSupportedError, match="path-enumeration cap"
    ):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            eng.cypher(
                "MATCH p = (x:N)-[:L*2..]->(y:N) RETURN length(p) AS l"
            )
    # *n.. floor WITHOUT a path variable: strict engine -> typed error,
    # opt-in engine -> warning + walk pair model
    with pytest.raises(
        TranspilerNotSupportedError, match="allow_walk_fallback"
    ):
        strict.cypher(
            "MATCH (x:N)-[:L*2..]->(y:N) RETURN count(*) AS n"
        )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        n = eng.cypher(
            "MATCH (x:N)-[:L*2..]->(y:N) RETURN count(*) AS n"
        ).collect()[0].n
    assert n == 9  # walk model over the 3-cycle: every ordered pair
    assert any(
        issubclass(w.category, PathEnumerationCapWarning) for w in caught
    )


def test_row_per_path_undirected(spark):
    """Round 10 (VERDICT r9 #4): an UNDIRECTED unbounded path variable
    enumerates rel-unique paths over the symmetrized edge — both
    orientations of one relationship share their identity, so the
    go-and-return walk is excluded, but a triangle's two genuinely
    different routes both appear (the witness model collapsed them)."""
    nodes = spark.createDataFrame([("u",), ("v",), ("w",)], "id string")
    e_df = spark.createDataFrame(
        [("u", "v"), ("v", "w"), ("w", "u")], "src string, dst string"
    )
    reg = TableRegistry()
    reg.register_df("n", nodes)
    reg.register_df("l", e_df)
    g = GraphSchema(
        [NodeSchema("N", "n", "id", ())],
        [EdgeSchema("L", "N", "N", "l", "src", "dst")],
    )
    eng = CypherEngine(spark, g, reg)
    got = sorted(
        map(
            tuple,
            eng.cypher(
                "MATCH p = (a:N)-[:L*]-(b:N) "
                "RETURN a.id AS a, b.id AS b, length(p) AS l"
            ).collect(),
        )
    )
    # per ordered pair: the direct edge (len 1) and the around-the-
    # triangle route (len 2); per node: the two 3-cycles (one per
    # rotation direction). 6*2 + 3*2 = 18 paths.
    exp = sorted(
        [(a, b, l) for a in "uvw" for b in "uvw" if a != b for l in (1, 2)]
        + [(a, a, 3) for a in "uvw" for _ in range(2)]
    )
    assert got == exp


def test_row_per_path_matches_duckdb_recursive_cte(diamond_engine, spark):
    """VERDICT r8 #1 'done' criterion: count(p) over a DAG matches a
    DuckDB recursive-CTE path count."""
    import duckdb

    got = sorted(
        map(
            tuple,
            diamond_engine.cypher(
                "MATCH p = (x:N)-[:L*]->(y:N) "
                "RETURN x.id AS x, y.id AS y, count(p) AS c"
            ).collect(),
        )
    )
    d = duckdb.connect()
    d.sql(
        "CREATE TABLE e (s varchar, d varchar); INSERT INTO e VALUES "
        "('a','b'),('a','c'),('b','d'),('c','d'),('d','e')"
    )
    exp = sorted(
        map(
            tuple,
            d.sql(
                """
                WITH RECURSIVE paths(src, dst) AS (
                    SELECT s, d FROM e
                    UNION ALL
                    SELECT p.src, e.d FROM paths p JOIN e ON e.s = p.dst
                )
                SELECT src AS x, dst AS y, count(*) AS c
                FROM paths GROUP BY src, dst
                """
            ).fetchall(),
        )
    )
    assert got == exp


def test_all_shortest_paths(spark, movie_engine):
    """Round 11: allShortestPaths() keeps EVERY minimal-length
    relationship-unique path per endpoint pair (shortestPath binds one
    witness). Diamond fixture: a->b1->d and a->b2->d tie at 2 hops."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df(
        "tn",
        spark.createDataFrame([("a",), ("b1",), ("b2",), ("d",)], "id string"),
    )
    reg.register_df(
        "te",
        spark.createDataFrame(
            [("a", "b1"), ("a", "b2"), ("b1", "d"), ("b2", "d"), ("b1", "b2")],
            "src string, dst string",
        ),
    )
    eng = CypherEngine(
        spark,
        GraphSchema(
            [NodeSchema("N", "tn", "id", ())],
            [EdgeSchema("L", "N", "N", "te", "src", "dst")],
        ),
        reg,
    )
    one = eng.cypher(
        "MATCH p = shortestPath((a:N)-[:L*]->(b:N)) "
        "WHERE a.id = 'a' AND b.id = 'd' RETURN nodes(p) AS ns"
    ).collect()
    assert len(one) == 1 and len(one[0].ns) == 3
    both = sorted(
        tuple(r.ns)
        for r in eng.cypher(
            "MATCH p = allShortestPaths((a:N)-[:L*]->(b:N)) "
            "WHERE a.id = 'a' AND b.id = 'd' RETURN nodes(p) AS ns"
        ).collect()
    )
    assert both == [("a", "b1", "d"), ("a", "b2", "d")]
    # per-pair counts: only (a, d) has a tie
    counts = {
        (r.a, r.b): r.c
        for r in eng.cypher(
            "MATCH p = allShortestPaths((a:N)-[:L*]->(b:N)) "
            "RETURN a.id AS a, b.id AS b, count(p) AS c"
        ).collect()
    }
    assert counts[("a", "d")] == 2
    assert all(v == 1 for k, v in counts.items() if k != ("a", "d"))
    # on a unique-paths graph, allShortestPaths == shortestPath rows
    a = rows(
        movie_engine.cypher(
            "MATCH p = allShortestPaths((x:Person)-[:FOLLOWS*]->(y:Person)) "
            "RETURN x.Name AS a, y.Name AS b, length(p) AS hops"
        )
    )
    b = rows(
        movie_engine.cypher(
            "MATCH p = shortestPath((x:Person)-[:FOLLOWS*]->(y:Person)) "
            "RETURN x.Name AS a, y.Name AS b, length(p) AS hops"
        )
    )
    assert a == b
    # floors above 1 keep the Neo4j-parity typed error
    import pytest as _pytest

    from opencyphertranspiler_spark.exceptions import (
        TranspilerNotSupportedError,
    )

    with _pytest.raises(TranspilerNotSupportedError, match="minimal hop"):
        eng.cypher(
            "MATCH p = allShortestPaths((a:N)-[:L*2..]->(b:N)) "
            "RETURN count(p) AS c"
        )
