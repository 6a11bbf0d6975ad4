#!/usr/bin/env python3
"""End-to-end walkthrough of the engine (the PySpark analogue of the
reference's examples/simple/Program.cs).

Run:  python examples/demo.py [sf_dir]
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
        SparkSession.builder.master("local[*]")
        .appName("opencyphertranspiler-spark-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    engine = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, sf_dir)
    )

    print("== 1. graph query (MATCH / WHERE / implicit GROUP BY) ==")
    engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        WHERE c.c_mktsegment = $segment
        RETURN c.c_name AS customer, count(o) AS orders,
               round(sum(o.o_totalprice), 2) AS total
        ORDER BY total DESC LIMIT 5
        """,
        params={"segment": "BUILDING"},
    ).show(truncate=False)

    print("== 2. the logical plan behind it ==")
    print(
        engine.explain_plan(
            "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
            "RETURN c.c_name AS n, count(o) AS k"
        )
    )

    print("== 3. multi-hop traversal with OPTIONAL MATCH ==")
    engine.cypher(
        """
        MATCH (n:Nation)
        OPTIONAL MATCH (n)<-[:FROM_NATION]-(s:Supplier)
        RETURN n.n_name AS nation, count(s) AS suppliers
        ORDER BY suppliers DESC, nation LIMIT 5
        """
    ).show()

    print("== 4. Cypher + SQL interop on one session ==")
    engine.register_sql_views(["customer"])
    engine.cypher(
        "MATCH (c:Customer) RETURN c.c_mktsegment AS seg, count(*) AS n"
    ).createOrReplaceTempView("seg_counts")
    spark.sql(
        "SELECT s.seg, s.n, round(100.0 * s.n / t.total, 1) AS pct "
        "FROM seg_counts s CROSS JOIN (SELECT count(*) AS total FROM customer) t "
        "ORDER BY s.n DESC"
    ).show()

    print("== 5. training-data pipeline: near-duplicate detection ==")
    from opencyphertranspiler_spark.pipeline.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    minhash_lsh_pairs(docs, threshold=0.8).orderBy("id_a").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
