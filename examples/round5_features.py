#!/usr/bin/env python3
"""Round-5 feature tour: anchored reachability, temporal library,
standalone RETURN, undirected variable-length, EXISTS/COUNT subqueries,
path materialization, and CALL { } subqueries.

Run:  python examples/round5_features.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from opencyphertranspiler_spark import (
    CypherEngine,
    tpch_graph_schema,
    tpch_table_registry,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = CypherEngine(spark, tpch_graph_schema(), tpch_table_registry(spark, sf_dir))

    print("— standalone RETURN (one-row source) —")
    eng.cypher("RETURN 1 + 1 AS x, toUpper('spark') AS s").show()

    print("— temporal library —")
    eng.cypher(
        """
        MATCH (o:Orders)
        WHERE o.o_orderdate >= datetime('1995-01-01')
          AND o.o_orderdate < datetime('1995-07-01')
        RETURN o.o_orderdate.quarter AS qtr, count(*) AS n,
               max(o.o_orderdate + duration({days: 30})) AS due
        """
    ).show()

    print("— EXISTS { } / COUNT { } subqueries —")
    eng.cypher(
        """
        MATCH (c:Customer)
        WHERE COUNT { (c)-[:PLACED]->(:Orders) } > 8
          AND EXISTS { MATCH (c)-[:PLACED]->(o:Orders)
                       WHERE o.o_orderpriority = '1-URGENT' }
        RETURN c.c_mktsegment AS seg, count(*) AS frequent_buyers
        """
    ).show()

    print("— CALL { } subquery: latest order per customer (per-row LIMIT) —")
    eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 10
        CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
               RETURN o.o_orderkey AS latest, o.o_totalprice AS price
               ORDER BY o.o_orderdate DESC LIMIT 1 }
        RETURN c.c_name AS customer, latest, price
        """
    ).show()

    print("— CALL { } subquery: per-customer aggregates with empty defaults —")
    eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey <= 10
        CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
               WHERE o.o_totalprice > 200000
               RETURN count(o) AS big_orders }
        RETURN c.c_name AS customer, big_orders
        """
    ).show()

    print("— CALL procedures (schema introspection) —")
    eng.cypher(
        "CALL db.labels() YIELD label WHERE label STARTS WITH 'C' RETURN label"
    ).show()

    print("— dynamic property access n[key] —")
    eng.cypher(
        """
        MATCH (c:Customer) WHERE c.c_custkey = 1
        UNWIND ['c_name', 'c_mktsegment'] AS k
        RETURN k, c[k] AS value
        """
    ).show(truncate=False)

    print("— functional writes: SET + RETURN, then a post-write engine —")
    res = eng.cypher_write(
        """
        MATCH (c:Customer) WHERE c.c_acctbal < 0
        SET c.tier = 'debit'
        RETURN c.c_mktsegment AS segment, count(*) AS flagged
        """
    )
    res.returned.show()
    print("write stats:", res.counts())
    post = res.engine()
    post.cypher(
        "MATCH (c:Customer) WHERE c.tier = 'debit' RETURN count(*) AS debit_customers"
    ).show()

    print("— FOREACH + MERGE (idempotent seeding) —")
    seeded = post.cypher_write(
        "FOREACH (k IN [100, 101] | "
        "MERGE (r:Region {r_regionkey: k, r_name: 'SANDBOX'}))"
    )
    print("seed stats:", seeded.counts())

    spark.stop()


if __name__ == "__main__":
    main()
