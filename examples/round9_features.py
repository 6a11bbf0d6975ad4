#!/usr/bin/env python3
"""Round-9 query-surface tour, all running over the TPC-H parquet overlay.

Covered: ROW-PER-PATH semantics for unbounded path variables on
finite-depth graphs (exact Neo4j path enumeration, incl. *n.. with a
length floor and *0.. with zero-length paths), path aggregates
count(p)/collect(p), label-disjunction composition (var-length and
multi-type hops adjacent to (n:A|B)), per-member property shapes on
tagged unions (Spark VARIANT), and label disjunction in the READING
prefix of write statements.

Run:  python examples/round9_features.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("round9-features")
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
    from opencyphertranspiler_spark.catalog import _next_order_engine

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, sf_dir)
    )

    # ------------------------------------------------------------------
    # 1. ROW-PER-PATH on a finite-depth DAG. NEXT12 links each order of a
    # small customer to the next one AND two ranks later, so paths between
    # the same endpoints multiply — Neo4j emits a row per PATH, and so do
    # we (the engine discovers the walk bound and expands *1..L).
    # ------------------------------------------------------------------
    ne = _next_order_engine(spark, sf_dir)
    print("== row-per-path: two paths can share (src, dst, hops) ==")
    ne.cypher(
        """
        MATCH p = (a:Orders)-[:NEXT12*]->(b:Orders)
        RETURN a.o_orderkey AS src, b.o_orderkey AS dst,
               length(p) AS hops, count(p) AS paths
        ORDER BY paths DESC, src LIMIT 5
        """
    ).show()

    print("== path aggregates: count(p) / collect(p) nodes ==")
    ne.cypher(
        """
        MATCH p = (a:Orders)-[:NEXT12*]->(b:Orders)
        RETURN count(p) AS total_paths, max(length(p)) AS longest
        """
    ).show()

    print("== *0.. includes the zero-length path (nodes [a], rels []) ==")
    ne.cypher(
        """
        MATCH p = (a:Orders)-[:NEXT12*0..]->(b:Orders)
        RETURN length(p) AS hops, count(*) AS n ORDER BY hops
        """
    ).show()

    # the deep NEXT chain (longest path >> 8) falls back to the
    # documented witness-pair model — one row per endpoint pair
    print("== deep chain: witness fallback (one row per pair) ==")
    ne.cypher(
        """
        MATCH p = (a:Orders {o_orderkey: 1})-[:NEXT*]->(b:Orders)
        RETURN count(p) AS reachable, max(length(p)) AS chain_depth
        """
    ).show()

    # ------------------------------------------------------------------
    # 2. Label-disjunction composition: multi-type hops adjacent to a
    # tagged union, with per-row type(r).
    # ------------------------------------------------------------------
    print("== (n:Customer|Supplier)-[r:PLACED_URGENT|PLACED_NORMAL]-> ==")
    eng.cypher(
        """
        MATCH (n:Customer|Supplier)-[r:PLACED_URGENT|PLACED_NORMAL]->(o:Orders)
        RETURN labels(n)[0] AS who, type(r) AS how, count(*) AS orders
        ORDER BY how
        """
    ).show()

    # ------------------------------------------------------------------
    # 3. Per-member property shapes (Spark VARIANT): each row carries its
    # MEMBER's map, not a null-padded merged struct.
    # ------------------------------------------------------------------
    print("== properties(n) over (n:Nation|Region): member shapes ==")
    eng.cypher(
        """
        MATCH (n:Nation|Region) WHERE n.n_nationkey < 2 OR n.r_regionkey < 2
        RETURN labels(n)[0] AS l, properties(n) AS props
        """
    ).select("l", F.to_json("props").alias("props_json")).show(truncate=False)

    # ------------------------------------------------------------------
    # 4. Disjunction in a write statement's READING prefix: the write
    # targets only the plain alias, so the union read is allowed.
    # ------------------------------------------------------------------
    print("== write via a disjunction read (SET on the plain alias) ==")
    res = eng.cypher_write(
        """
        MATCH (n:Customer|Supplier)-[:FROM_NATION]->(x:Nation)
        WHERE n.c_acctbal > 9000 OR n.s_acctbal > 4000
        SET x.n_name = 'FLAGGED'
        RETURN count(*) AS matched_rows
        """
    )
    res.returned.show()
    res.engine().cypher(
        "MATCH (x:Nation {n_name: 'FLAGGED'}) RETURN count(*) AS flagged_nations"
    ).show()

    spark.stop()
    print("round-9 tour complete")


if __name__ == "__main__":
    main()
