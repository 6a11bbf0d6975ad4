"""Physical-plan regression tests: the properties that make the engine hold
up at 100 TB (scan fusion, predicate pushdown, column pruning, broadcast
dimension joins) asserted against Catalyst's formatted plan output."""

from __future__ import annotations

import re


def formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_multi_hop_scans_each_table_once(spark, engine):
    df = engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)-[:CONTAINS]->(l:Lineitem)
              -[:OF_PART]->(p:Part)
        WHERE p.p_size < 10
        RETURN p.p_brand AS brand, count(l) AS n
        """
    )
    plan = formatted_plan(spark, df)
    # edge-node fusion: lineitem backs l + CONTAINS + OF_PART -> ONE scan
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("orders.parquet") == 1
    assert plan.count("Location: InMemoryFileIndex") == 4


def test_filter_pushed_to_parquet_scan(spark, engine):
    df = engine.cypher(
        "MATCH (p:Part) WHERE p.p_size < 10 RETURN p.p_brand AS brand, count(*) AS n"
    )
    plan = formatted_plan(spark, df)
    assert "LessThan(p_size,10)" in plan, "filter must reach PushedFilters"


def test_column_pruning_reaches_read_schema(spark, engine):
    df = engine.cypher("MATCH (c:Customer) RETURN c.c_name AS name")
    plan = formatted_plan(spark, df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"c_name"}, f"scan should read only c_name, got {cols}"


def test_projection_only_props_are_pruned(spark, engine):
    # c_acctbal / c_mktsegment are never referenced -> must not be read
    df = engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        RETURN c.c_name AS name, count(o) AS n
        """
    )
    plan = formatted_plan(spark, df)
    assert "c_acctbal" not in plan
    assert "c_mktsegment" not in plan


def test_dimension_join_is_broadcast(spark, engine):
    df = engine.cypher(
        """
        MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer)
        RETURN n.n_name AS nation, count(c) AS customers
        """
    )
    plan = formatted_plan(spark, df)
    assert "BroadcastHashJoin" in plan, "nation-sized dims must broadcast"


def test_whole_stage_codegen_covers_expressions(spark, engine):
    df = engine.cypher(
        """
        MATCH (l:Lineitem)
        WHERE l.l_returnflag IN ['A', 'R']
        RETURN l.l_linenumber % 2 AS parity,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
        """
    )
    df.collect()  # finalize this DataFrame's own AQE plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    # whole-stage-codegen'd operators carry the *(N) marker
    assert "*(" in executed, "expressions fell out of whole-stage codegen"
    plan = formatted_plan(spark, df)
    assert "In(l_returnflag, [A,R])" in plan, "IN filter must push to the scan"
