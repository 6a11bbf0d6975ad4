#!/usr/bin/env python3
"""Round-12 query-surface tour.

Covered: Neo4j-faithful re-binding of labeled aliases (a label on a
re-occurrence is a per-row predicate, not a binding conflict), the LAZY
index-winner surfaces (unbounded k, no frozen winners — a re-registered
table is reflected without clear_caches()), boolean/phrase multi-field
fulltext, relationship fulltext indexes, trained EUCLIDEAN ANN,
relationship and path imports in CALL subqueries, and the
enumeration-cap typed error with its explicit walk-fallback opt-in.

Run:  python examples/round12_features.py [sf_dir]
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
        .appName("round12-features")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
        tpch_graph_schema,
        tpch_table_registry,
    )

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, sf_dir)
    )

    # ---- 1. Re-bound alias labels are per-row predicates ---------------
    print("== 1. label narrowing on a bound alias (Neo4j semantics) ==")
    # x lands on Lineitem at depth 1 and Part at depth 2; the (x:Part)
    # inside the OPTIONAL MATCH filters INSIDE the fork — depth-1 rows
    # survive with null l2 (previously they were silently dropped)
    eng.cypher(
        "MATCH (o:Orders)-[:CONTAINS|OF_PART*1..2]->(x) "
        "OPTIONAL MATCH (x:Part)<-[:OF_PART]-(l2:Lineitem) "
        "RETURN labels(x)[0] AS lab, count(l2) AS matched, count(*) AS rows"
    ).show()

    # ---- 2. Lazy, uncapped vector winners -------------------------------
    print("== 2. queryNodes: lazy winners, k unbounded, never stale ==")
    reg = TableRegistry()
    reg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
    )
    emb = CypherEngine(
        spark,
        GraphSchema(
            [
                NodeSchema(
                    "Emb", "embeddings", "vec_id",
                    (EntityProperty("embedding", "array<float>"),),
                    "bigint",
                )
            ],
            [],
        ),
        reg,
    )
    emb.create_vector_index("idx", "Emb", "embedding")
    row = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(1).collect()[0]
    v = [float(x) for x in row.embedding]
    # k = 5000 — far beyond the old 1024 cap; the winner top-k is a
    # broadcast-joined PLAN, nothing collects to the driver
    emb.cypher(
        "CALL db.index.vector.queryNodes('idx', 5000, $v) "
        "YIELD node, score RETURN count(*) AS corpus_size",
        params={"v": v},
    ).show()

    # ---- 3. Trained EUCLIDEAN ANN ---------------------------------------
    print("== 3. euclidean IVF cells (plain-L2 Lloyd's) ==")
    emb.create_vector_index("l2", "Emb", "embedding", similarity="euclidean")
    emb.train_vector_index("l2", n_cells=6, nprobe=2, iters=2)
    emb.cypher(
        "CALL db.index.vector.queryNodes('l2', 3, $v) "
        "YIELD node, score "
        "RETURN node.vec_id AS id, round(score, 4) AS s "
        "ORDER BY s DESC, id",
        params={"v": v},
    ).show()

    # ---- 4. Boolean / phrase / multi-field fulltext ----------------------
    print("== 4. fulltext: +MUST -MUST_NOT \"phrase\", multi-field ==")
    docs = CypherEngine(
        spark,
        GraphSchema(
            [
                NodeSchema(
                    "Doc", "documents", "doc_id",
                    (
                        EntityProperty("text", "string"),
                        EntityProperty("source", "string"),
                    ),
                    "bigint",
                )
            ],
            [],
        ),
        TableRegistry(
            {
                "documents": lambda: spark.read.parquet(
                    f"{sf_dir}/documents.parquet"
                )
            }
        ),
    )
    docs.cypher(
        "CREATE FULLTEXT INDEX ft FOR (d:Doc) ON EACH [d.text, d.source]"
    )
    docs.cypher(
        "CALL db.index.fulltext.queryNodes('ft', "
        "'+fast \"batch batch\" -slow', {limit: 5}) "
        "YIELD node, score "
        "RETURN node.doc_id AS id, round(score, 4) AS s ORDER BY s DESC"
    ).show()
    # materialize an inverted index: term queries now cost ∝ the query
    # terms' postings instead of a corpus scan (same scores)
    docs.materialize_fulltext_index("ft")
    docs.cypher(
        "CALL db.index.fulltext.queryNodes('ft', '+fast merge', "
        "{limit: 3}) YIELD node, score "
        "RETURN node.doc_id AS id, round(score, 4) AS s ORDER BY s DESC"
    ).show()

    # ---- 5. Relationship fulltext ----------------------------------------
    print("== 5. relationship fulltext over PLACED_URGENT priority ==")
    eng.cypher(
        "CREATE FULLTEXT INDEX prio FOR ()-[r:PLACED_URGENT]-() "
        "ON EACH [r.o_orderpriority]"
    )
    eng.cypher(
        "CALL db.index.fulltext.queryRelationships('prio', 'urgent', "
        "{limit: 3}) YIELD relationship AS r, score "
        "RETURN type(r) AS t, r.o_orderpriority AS p, round(score, 4) AS s"
    ).show()

    # ---- 6. Relationship + path imports in CALL subqueries ---------------
    print("== 6. CALL {{ WITH r }} / {{ WITH p }} ==")
    eng.cypher(
        "MATCH (o:Orders)-[r:CONTAINS]->(l:Lineitem) "
        "CALL { WITH r RETURN r.l_linenumber * 10 AS ln10 } "
        "RETURN ln10, count(*) AS n ORDER BY ln10 LIMIT 3"
    ).show()
    eng.cypher(
        "MATCH p = (c:Customer)-[:PLACED]->(o:Orders) "
        "CALL { WITH p RETURN length(p) + size(nodes(p)) AS enc } "
        "RETURN enc, count(*) AS n"
    ).show()

    # ---- 7. Enumeration-cap overflow is a typed error --------------------
    print("== 7. cap overflow: typed error unless opted in ==")
    tiny = CypherEngine(
        spark,
        tpch_graph_schema(),
        tpch_table_registry(spark, sf_dir),
        path_enum_max_paths=10,  # force an overflow
    )
    try:
        tiny.cypher(
            "MATCH p = (o:Orders)-[:CONTAINS|OF_PART*2..]->(x:Part) "
            "RETURN count(*) AS n"
        ).collect()
    except Exception as e:
        print(f"typed error as designed: {type(e).__name__}")
    print("(pass allow_walk_fallback=True to accept the walk model)")

    spark.stop()


if __name__ == "__main__":
    main()
