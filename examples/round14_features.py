#!/usr/bin/env python3
"""Round-14 feature tour.

Covered: weighted GDS (relationshipWeightProperty on pageRank / degree /
nodeSimilarity), gds.louvain.stream (deterministic distributed Louvain),
Porter stemming (analyzer='english'), sloppy phrases ("a b"~n) and
fuzzy distance-decay boosts, CALL { } IN TRANSACTIONS batched writes,
and the inline EXPLAIN / PROFILE query prefixes.

Run:  python examples/round14_features.py [sf_dir]
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
        .appName("round14-features")
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

    # ---- 1. Weighted GDS streams ----------------------------------------
    print("== 1. weighted PageRank / degree (relationshipWeightProperty) ==")
    eng.cypher(
        "CALL gds.pageRank.stream('CONTAINS', {maxIterations: 5, "
        "relationshipWeightProperty: 'l_linenumber'}) "
        "YIELD nodeId, score RETURN nodeId, round(score, 6) AS score "
        "ORDER BY score DESC LIMIT 5"
    ).show(truncate=False)
    eng.cypher(
        "CALL gds.degree.stream('CONTAINS', {orientation: 'NATURAL', "
        "relationshipWeightProperty: 'l_linenumber'}) "
        "YIELD nodeId, score RETURN nodeId, score "
        "ORDER BY score DESC LIMIT 5"
    ).show(truncate=False)

    # ---- 2. Louvain community detection ---------------------------------
    print("== 2. gds.louvain.stream (deterministic distributed Louvain) ==")
    eng.cypher(
        "CALL gds.louvain.stream('IN_REGION') YIELD nodeId, communityId "
        "RETURN communityId, count(*) AS members ORDER BY communityId"
    ).show(truncate=False)

    # ---- 3. Porter stemming + sloppy phrases + fuzzy decay --------------
    print("== 3. analyzer='english' (Porter), slop, fuzzy decay ==")
    eng.cypher(
        "CREATE FULLTEXT INDEX tour_ft IF NOT EXISTS FOR (d:Document) "
        "ON EACH [d.text] OPTIONS {indexConfig: "
        "{`fulltext.analyzer`: 'english'}}"
    ).show()
    for q in ("merges scanning", '"data processing"~2', "window~1"):
        rows = eng.cypher(
            "CALL db.index.fulltext.queryNodes('tour_ft', $q, "
            "{limit: 3}) YIELD node, score "
            "RETURN id(node) AS id, round(score, 4) AS s "
            "ORDER BY s DESC, id",
            params={"q": q},
        ).collect()
        print(f"  {q!r:28} -> {[(r.id, r.s) for r in rows]}")

    # ---- 4. CALL { } IN TRANSACTIONS ------------------------------------
    print("== 4. batched writes: CALL { } IN TRANSACTIONS OF n ROWS ==")
    res = eng.cypher_write(
        "UNWIND [990001, 990002, 990003, 990004, 990005] AS x "
        "CALL (x) { CREATE (:Document {doc_id: x, text: 'bulk'}) } "
        "IN TRANSACTIONS OF 2 ROWS "
        "MATCH (d:Document) WHERE d.doc_id >= 990000 "
        "RETURN count(d) AS loaded"
    )
    res.returned.show()
    print("  counters:", res.counts())

    # ---- 5. inline EXPLAIN / PROFILE ------------------------------------
    print("== 5. EXPLAIN (no execution) and PROFILE (runtime metrics) ==")
    explain = eng.cypher(
        "EXPLAIN MATCH (c:Customer)-[:PLACED]->(o:Orders) "
        "RETURN count(*) AS n"
    )
    print("  EXPLAIN:", explain.count(), "plan lines")
    prof = eng.cypher(
        "PROFILE MATCH (c:Customer)-[:PLACED]->(o:Orders) "
        "RETURN count(*) AS n"
    )
    prof.orderBy("id").show(8, truncate=60)

    print("round-14 feature tour complete.")
    spark.stop()


if __name__ == "__main__":
    main()
