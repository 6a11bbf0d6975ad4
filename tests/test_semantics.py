"""Regression tests for openCypher semantic fixes flagged in round-1 review:
WITH subclause ordering, anchored `=~`, null sort ordering, 64-bit
toInteger, and dotted implicit projection aliases."""

from __future__ import annotations


def rows(engine, q, col):
    return [r[col] for r in engine.cypher(q).collect()]


def test_with_orders_and_limits_before_where(engine):
    # reference LogicalPlan.cs:255-267: ORDER BY/SKIP/LIMIT first, WHERE after.
    # Limit-then-filter gives [1, 2]; filter-then-limit would give [1, 2, 3].
    q = """
        MATCH (r:Region)
        WITH r.r_regionkey AS k ORDER BY k LIMIT 3 WHERE k > 0
        RETURN k ORDER BY k
    """
    assert rows(engine, q, "k") == [1, 2]


def test_with_skip_applies_before_where(engine):
    # keys 0..4 -> ORDER BY k SKIP 2 = [2, 3, 4] -> WHERE k <> 3 = [2, 4]
    q = """
        MATCH (r:Region)
        WITH r.r_regionkey AS k ORDER BY k SKIP 2 WHERE k <> 3
        RETURN k ORDER BY k
    """
    assert rows(engine, q, "k") == [2, 4]


def test_regex_matches_entire_string(engine):
    # '=~' must match the ENTIRE string: every c_name contains digits, but
    # no c_name IS a digit run, so the anchored pattern matches nothing
    q = """
        MATCH (c:Customer) WHERE c.c_name =~ '[0-9]+'
        RETURN count(*) AS n
    """
    assert rows(engine, q, "n") == [0]
    q2 = """
        MATCH (c:Customer) WHERE c.c_name =~ 'Customer#[0-9]+'
        RETURN count(*) AS n
    """
    assert rows(engine, q2, "n")[0] > 0


def test_order_by_nulls_last_asc_first_desc(engine):
    q = """
        MATCH (r:Region)
        WITH CASE WHEN r.r_regionkey = 2 THEN null ELSE r.r_regionkey END AS k
        RETURN k ORDER BY k
    """
    assert rows(engine, q, "k") == [0, 1, 3, 4, None]
    q_desc = q.replace("ORDER BY k", "ORDER BY k DESC")
    assert rows(engine, q_desc, "k") == [None, 4, 3, 1, 0]


def test_tointeger_is_64_bit(engine):
    # values above 2^31; a 32-bit cast would throw under ANSI mode
    q = """
        MATCH (o:Orders)
        RETURN max(toInteger(o.o_orderkey * 100000000)) AS big
    """
    (big,) = rows(engine, q, "big")
    assert big > 2**31


def test_dotted_implicit_alias_roundtrip(engine):
    # RETURN r.r_name with no AS produces the column literally named
    # 'r.r_name'; ORDER BY forces a carry + trim over that dotted name
    q = """
        MATCH (r:Region)
        RETURN r.r_name ORDER BY r.r_name LIMIT 2
    """
    df = engine.cypher(q)
    assert df.columns == ["r.r_name"]
    got = [r["r.r_name"] for r in df.collect()]
    assert got == sorted(got) and len(got) == 2


def test_coercion_taxonomy_rejects_unsupported_combos(engine):
    # reference TypeCoersionTables semantics: typed TranspilerNotSupportedError
    # instead of a raw Catalyst AnalysisException
    import pytest

    from opencyphertranspiler_spark.exceptions import TranspilerNotSupportedError

    bad = [
        "MATCH (p:Part) RETURN (p.p_size > 3) + 1 AS x",       # boolean + numeric
        "MATCH (p:Part) RETURN p.p_name - 1 AS x",             # string - numeric
        "MATCH (p:Part) RETURN (p.p_size > 3) < p.p_size AS x" # boolean < numeric
    ]
    for q in bad:
        with pytest.raises(TranspilerNotSupportedError):
            engine.cypher(q)
    # still-supported coercions keep working
    ok = engine.cypher("MATCH (p:Part) RETURN (p.p_name + 1) AS x LIMIT 1")
    assert ok.collect()[0]["x"].endswith("1")


def test_percentile_disc_is_exact(spark, engine, duck):
    q = """
        MATCH (l:Lineitem)
        RETURN l.l_returnflag AS flag,
               percentileDisc(l.l_quantity, 0.5) AS med,
               percentileDisc(l.l_quantity, 0.25) AS q1,
               percentileDisc(l.l_quantity, 1.0) AS hi
    """
    got = {r.flag: (r.med, r.q1, r.hi) for r in engine.cypher(q).collect()}
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.sql(
            """
            SELECT l_returnflag,
                   quantile_disc(l_quantity, 0.5),
                   quantile_disc(l_quantity, 0.25),
                   quantile_disc(l_quantity, 1.0)
            FROM lineitem GROUP BY l_returnflag
            """
        ).fetchall()
    }
    assert got == want


def test_decimal_and_binary_node_properties(spark):
    # graph-schema decimal/binary property types end-to-end (reference
    # type map SQLRenderer.cs:55-73)
    from decimal import Decimal

    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    df = spark.createDataFrame(
        [(1, Decimal("10.50"), b"\x01\x02"), (2, Decimal("20.25"), b"\x03")],
        "id long, price decimal(12,2), blob binary",
    )
    g = GraphSchema(
        nodes=[
            NodeSchema(
                "Item",
                "item",
                "id",
                (
                    EntityProperty("price", "decimal(12,2)"),
                    EntityProperty("blob", "binary"),
                ),
            )
        ],
        edges=[],
    )
    reg = TableRegistry()
    reg.register_df("item", df)
    eng = CypherEngine(spark, g, reg)
    out = eng.cypher(
        """
        MATCH (i:Item)
        RETURN round(avg(i.price), 3) AS avg_price, count(i.blob) AS blobs,
               max(toFloat(i.price)) AS mx
        """
    ).collect()[0]
    assert float(out.avg_price) == 15.375 and out.blobs == 2
    assert abs(out.mx - 20.25) < 1e-6


def test_array_property_and_unwind(spark):
    # list-typed node properties flow through the engine and UNWIND
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b", "c", "d"])],
        "id long, tags array<string>",
    )
    g = GraphSchema(
        nodes=[NodeSchema("Doc", "doc", "id", (EntityProperty("tags", "array<string>"),))],
        edges=[],
    )
    reg = TableRegistry()
    reg.register_df("doc", df)
    eng = CypherEngine(spark, g, reg)
    out = eng.cypher(
        """
        MATCH (d:Doc)
        UNWIND d.tags AS tag
        RETURN tag, count(*) AS n
        """
    )
    got = {(r.tag, r.n) for r in out.collect()}
    assert got == {("a", 1), ("b", 2), ("c", 1), ("d", 1)}
    # size() overload on the list property
    sizes = eng.cypher("MATCH (d:Doc) RETURN d.id AS id, size(d.tags) AS n")
    assert {(r.id, r.n) for r in sizes.collect()} == {(1, 2), (2, 3)}


def test_struct_field_property_access(spark):
    # n.prop.field resolves the property against the schema and the field
    # path against the column's struct type (multimodal metadata shape)
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )
    from opencyphertranspiler_spark.pipeline.multimodal import (
        attach_fake_payload,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = attach_fake_payload(docs.filter("doc_id < 10"))
    reg = TableRegistry()
    reg.register_df("media", media)
    g = GraphSchema(
        nodes=[
            NodeSchema(
                "Media",
                "media",
                "doc_id",
                (
                    EntityProperty("modality"),
                    EntityProperty("meta", "struct<width:int,height:int,codec:string>"),
                ),
            )
        ],
        edges=[],
    )
    eng = CypherEngine(spark, g, reg)
    df = eng.cypher(
        """
        MATCH (m:Media)
        WHERE m.meta.width > 10
        RETURN m.meta.codec AS codec, count(*) AS n, max(m.meta.height) AS mh
        """
    )
    rows_out = df.collect()
    assert rows_out and rows_out[0].codec == "fake/raw"
    exp = media.filter("meta.width > 10")
    assert rows_out[0].n == exp.count()
    # implicit alias keeps the full dotted path
    df2 = eng.cypher("MATCH (m:Media) RETURN m.meta.width LIMIT 1")
    assert df2.columns == ["m.meta.width"]


# ---------------------------------------------------------------------------
# Order-sensitive collect()/first()/last() (engine option ordered_aggregates;
# default stays reference parity: unordered collect, MIN/MAX first/last)
# ---------------------------------------------------------------------------


def test_ordered_aggregates_differential_vs_duckdb(spark, duck):
    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )
    from .conftest import SF_DIR

    eng = CypherEngine(
        spark,
        tpch_graph_schema(),
        tpch_table_registry(spark, SF_DIR),
        ordered_aggregates=True,
    )
    q = """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        WHERE c.c_custkey <= 5
        WITH c.c_custkey AS k, o.o_orderstatus AS st, o.o_orderkey AS ok
        ORDER BY st, ok DESC
        RETURN k, collect(ok) AS oks, first(ok) AS first_ok, last(ok) AS last_ok
    """
    got = {
        r["k"]: (list(r["oks"]), r["first_ok"], r["last_ok"])
        for r in eng.cypher(q).collect()
    }
    exp = {
        r[0]: (list(r[1]), r[2], r[3])
        for r in duck.execute(
            """
            SELECT c.c_custkey AS k,
                   list(o.o_orderkey ORDER BY o.o_orderstatus, o.o_orderkey DESC) AS oks,
                   (list(o.o_orderkey ORDER BY o.o_orderstatus, o.o_orderkey DESC))[1],
                   (list(o.o_orderkey ORDER BY o.o_orderstatus, o.o_orderkey DESC))[-1]
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey <= 5 GROUP BY 1
            """
        ).fetchall()
    }
    assert got == exp


def test_ordered_aggregates_default_off_keeps_min_max_parity(spark, duck):
    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )
    from .conftest import SF_DIR

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )
    q = """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        WHERE c.c_custkey <= 5
        WITH c.c_custkey AS k, o.o_orderkey AS ok ORDER BY ok DESC
        RETURN k, first(ok) AS f, last(ok) AS l
    """
    got = {r["k"]: (r["f"], r["l"]) for r in eng.cypher(q).collect()}
    exp = {
        r[0]: (r[1], r[2])
        for r in duck.execute(
            """
            SELECT c.c_custkey AS k, min(o.o_orderkey), max(o.o_orderkey)
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey <= 5 GROUP BY 1
            """
        ).fetchall()
    }
    assert got == exp


def test_list_index_slice_semantics(spark, duck):
    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )
    from .conftest import SF_DIR

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )
    row = eng.cypher(
        """
        MATCH (n:Nation) WHERE n.n_nationkey = 1
        WITH range(10, 50, 10) AS l
        RETURN l[0] AS a, l[-1] AS b, l[1..3] AS c, l[..2] AS d,
               l[2..] AS e, l[9] AS oob, l[-3..-1] AS f
        """
    ).collect()[0]
    # Neo4j semantics: 0-based, end-exclusive, negative from the end
    assert (row.a, row.b) == (10, 50)
    assert row.c == [20, 30] and row.d == [10, 20] and row.e == [30, 40, 50]
    assert row.oob is None and row.f == [30, 40]


def test_map_literal_struct(spark):
    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )
    from .conftest import SF_DIR

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )
    row = eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey = 1
        RETURN {name: c.c_name, bal: c.c_acctbal} AS info
        """
    ).collect()[0]
    assert row.info.name == "Customer#000000001"
    assert abs(row.info.bal - 2229.54) < 1e-6


def test_reduce_fold_matches_duckdb(spark, duck):
    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )
    from .conftest import SF_DIR

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )
    got = {
        r["k"]: r["total"]
        for r in eng.cypher(
            """
            MATCH (c:Customer)-[:PLACED]->(o:Orders)
            WHERE c.c_custkey <= 5
            WITH c.c_custkey AS k, collect(o.o_totalprice) AS prices
            RETURN k, round(reduce(acc = 0.0, p IN prices | acc + p), 2) AS total
            """
        ).collect()
    }
    exp = {
        r[0]: r[1]
        for r in duck.execute(
            """
            SELECT c.c_custkey, round(sum(o.o_totalprice), 2)
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey <= 5 GROUP BY 1
            """
        ).fetchall()
    }
    assert got == exp
    # integer fold, string fold, lambda string concat via elem-type hints
    row = eng.cypher(
        """
        MATCH (n:Nation) WHERE n.n_nationkey = 1
        RETURN reduce(acc = 0, x IN range(1, 5) | acc + x) AS s,
               reduce(s = '', w IN ['a', 'b', 'c'] | s + w) AS cat,
               [w IN ['a', 'b'] | w + '!'] AS bang
        """
    ).collect()[0]
    assert row.s == 15 and row.cat == "abc" and row.bang == ["a!", "b!"]


def test_zero_length_mismatched_labels_continuation_vs_duckdb(engine, duck):
    """(ADVICE r7 medium) the exact falsifying shape: *0..1 between
    Customer and Orders followed by a CONTAINS hop. The zero variant is
    statically empty (dropped), so the result equals the plain 1-hop SQL."""
    got = sorted(
        map(
            tuple,
            engine.cypher(
                """
                MATCH (c:Customer)-[:PLACED*0..1]->(o:Orders)
                      -[:CONTAINS]->(l:Lineitem)
                WHERE c.c_custkey <= 50
                RETURN c.c_custkey AS ck, count(*) AS n
                """
            ).collect(),
        )
    )
    exp = sorted(
        map(
            tuple,
            duck.sql(
                """
                SELECT c.c_custkey AS ck, count(*) AS n
                FROM customer c
                JOIN orders o ON o.o_custkey = c.c_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                WHERE c.c_custkey <= 50
                GROUP BY c.c_custkey
                """
            ).fetchall(),
        )
    )
    assert got == exp and got
