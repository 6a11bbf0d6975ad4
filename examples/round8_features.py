#!/usr/bin/env python3
"""Round-8 query-surface tour, all running over the TPC-H parquet overlay.

Covered: label disjunction (n:A|B) with tagged-union scans, CALL (*)
scope expansion, *0.. unbounded (reachability plus length-0 identity
pairs), whole-invocation OPTIONAL CALL { UNION } semantics, multi-type
MERGE, and the opt-in graph-contract validator.

Run:  python examples/round8_features.py [sf_dir]
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
        .appName("round8-features")
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
        validate_graph,
    )

    graph = tpch_graph_schema()
    tables = tpch_table_registry(spark, sf_dir)

    print("== graph-contract validator: node ids unique, endpoints non-null ==")
    validate_graph(graph, tables)  # raises a typed error naming offenders
    print("overlay passes the normalized-table contract\n")

    # or opt in at construction: CypherEngine(..., validate_schema=True)
    eng = CypherEngine(spark, graph, tables)

    print("== label disjunction: one query over Customers AND Suppliers ==")
    eng.cypher(
        """
        MATCH (n:Customer|Supplier)-[:FROM_NATION]->(x:Nation)
        RETURN x.n_name AS nation, labels(n)[0] AS kind,
               count(*) AS members,
               round(avg(coalesce(n.c_acctbal, n.s_acctbal)), 2) AS avg_bal
        ORDER BY members DESC LIMIT 5
        """
    ).show(truncate=False)

    print("== CALL (*): import whatever the body references ==")
    eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_acctbal > 9990
        CALL (*) {
            MATCH (c)-[:PLACED]->(o:Orders)
            RETURN count(o) AS orders, max(o.o_totalprice) AS biggest
        }
        RETURN c.c_name AS name, orders, biggest
        ORDER BY biggest DESC LIMIT 5
        """
    ).show(truncate=False)

    print("== OPTIONAL CALL { UNION }: null-extend only when EVERY branch is empty ==")
    eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 8
        OPTIONAL CALL (c) {
            MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice > 350000)
            RETURN 'whale' AS bucket, o.o_totalprice AS v
            UNION ALL
            MATCH (c)-[:PLACED]->(o:Orders WHERE o.o_totalprice < 5000)
            RETURN 'minnow' AS bucket, o.o_totalprice AS v
        }
        RETURN c.c_custkey AS ck, bucket, v ORDER BY ck, v
        """
    ).show(truncate=False)

    print("== multi-type MERGE: match any member, create as the first ==")
    res = eng.cypher_write(
        """
        MATCH (c:Customer {c_custkey: 1}), (o:Orders {o_orderkey: 7})
        MERGE (c)-[r:PLACED_URGENT|PLACED_NORMAL]->(o)
        """
    )
    print("counters:", res.counts(), "\n")

    print("== *0..: reachability plus the length-0 identity pairs ==")
    from opencyphertranspiler_spark.catalog import _next_order_engine

    neng = _next_order_engine(spark, sf_dir)  # Orders chained by NEXT
    neng.cypher(
        """
        MATCH (a:Orders)-[:NEXT*0..]->(b:Orders)
        WHERE a.o_orderkey < 40
        RETURN a.o_orderkey AS a, count(*) AS reachable_incl_self
        ORDER BY a LIMIT 5
        """
    ).show()

    print("== GQL quantified relationships: -[:R]->{n,m}, ->+, ->* ==")
    neng.cypher(
        """
        MATCH (a:Orders)-[:NEXT]->{1,3}(b:Orders)
        WHERE a.o_orderkey < 40
        RETURN a.o_orderkey AS a, count(*) AS within_3_hops
        ORDER BY a LIMIT 5
        """
    ).show()

    spark.stop()
    print("round-8 tour complete")


if __name__ == "__main__":
    main()
