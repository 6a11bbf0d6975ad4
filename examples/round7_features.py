#!/usr/bin/env python3
"""Round-7 query-surface tour: the modern-openCypher sugar added this
round, all running over the TPC-H parquet overlay.

Covered: map projections (entities + piped maps), COLLECT { } subqueries,
the CALL (a, b) { } scope clause, OPTIONAL CALL, inline pattern
predicates, zero-length variable-length (*0..m), filtered unbounded
reachability ([:NEXT* {k: v}]), SET n = {map} replacement and
map-projection SET sources.

Run:  python examples/round7_features.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("round7-features")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, sf_dir)
    )

    print("== map projection: struct-shaped rows without naming every col ==")
    eng.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        WHERE c.c_acctbal < -900
        WITH c, count(o) AS n
        RETURN c {.c_name, seg: c.c_mktsegment, orders: n} AS customer
        ORDER BY customer.c_name LIMIT 5
        """
    ).show(truncate=False)

    print("== COLLECT { } subquery: per-row lists from a full pattern ==")
    eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 3
        RETURN c.c_custkey AS customer,
               COLLECT { MATCH (c)-[:PLACED]->(o:Orders)
                         WHERE o.o_totalprice > 150000
                         RETURN o.o_orderkey } AS big_orders
        ORDER BY customer
        """
    ).show(truncate=False)

    print("== OPTIONAL CALL + scope clause: left-joined per-row subquery ==")
    eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 5
        OPTIONAL CALL (c) {
          MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice > 350000)
          RETURN o.o_orderkey AS big
        }
        RETURN c.c_custkey AS customer, big ORDER BY customer
        """
    ).show()

    print("== inline pattern predicates (Neo4j 5 spelling) ==")
    eng.cypher(
        """
        MATCH (c:Customer WHERE c.c_acctbal > 9000)
              -[:PLACED]->(o:Orders WHERE o.o_totalprice > 200000)
        RETURN count(*) AS rich_big_orders
        """
    ).show()

    print("== SET n = {map} replacement + map-projection copy ==")
    res = eng.cypher_write(
        """
        MATCH (a:Customer {c_custkey: 1}), (b:Customer {c_custkey: 2})
        SET b = a {.c_mktsegment, note: 'copied from customer 1'}
        RETURN b.c_mktsegment AS seg, b.note AS note, b.c_name AS wiped_name
        """
    )
    res.returned.show(truncate=False)

    print("== zero-length + filtered unbounded over a successor chain ==")
    from opencyphertranspiler_spark.catalog import _next_order_engine

    nxt = _next_order_engine(spark, sf_dir)
    nxt.cypher(
        """
        MATCH (a:Orders {o_orderkey: 1})-[:NEXT*0..2]->(b:Orders)
        RETURN b.o_orderkey AS reachable_in_0_to_2
        """
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
