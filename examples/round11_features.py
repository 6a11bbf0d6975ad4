#!/usr/bin/env python3
"""Round-11 query-surface tour.

Covered: IVF-routed CALL db.index.vector.queryNodes (train_vector_index
prunes to the probed cells — candidates scale with the inverted lists,
never the corpus), CALL db.index.vector.queryRelationships, undirected
and path-variable var-length hops adjacent to a label disjunction
(composite-id relationship-unique enumeration), inline maps on those
hops, *0.. under OPTIONAL MATCH, and the engine cache lifecycle.

Run:  python examples/round11_features.py [sf_dir]
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
        .appName("round11-features")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
        tpch_graph_schema,
        tpch_table_registry,
    )

    # ---- 1. IVF-routed vector index over the embeddings table ----------
    print("== 1. queryNodes through a trained IVF index ==")
    reg = TableRegistry()
    reg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
    )
    g = GraphSchema(
        [
            NodeSchema(
                "Emb", "embeddings", "vec_id",
                (EntityProperty("embedding", "array<float>"),), "bigint",
            )
        ],
        [],
    )
    veng = CypherEngine(spark, g, reg)
    veng.create_vector_index("emb_idx", "Emb", "embedding")
    row = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 0")
        .collect()[0]
    )
    qv = [float(x) for x in row.embedding]
    # untrained: exact linear scan
    veng.cypher(
        "CALL db.index.vector.queryNodes('emb_idx', 3, $v) "
        "YIELD node, score "
        "RETURN node.vec_id AS id, round(score, 4) AS s ORDER BY s DESC",
        params={"v": qv},
    ).show()
    # trained: the probe is a driver-side numpy dot; candidates are the
    # nprobe nearest cells only (the 100 TB plan shape)
    veng.train_vector_index("emb_idx", n_cells=8, nprobe=3, iters=2)
    cand, how = veng._vector_candidate_frame("emb_idx", "Emb", "embedding", qv)
    print(f"candidate path: {how}, candidates: {cand.count()}")
    veng.cypher(
        "CALL db.index.vector.queryNodes('emb_idx', 3, $v) "
        "YIELD node, score "
        "RETURN node.vec_id AS id, round(score, 4) AS s ORDER BY s DESC",
        params={"v": qv},
    ).show()
    veng.clear_caches()  # release the memoized winners + fixpoints

    # ---- 2. queryRelationships ------------------------------------------
    print("== 2. CALL db.index.vector.queryRelationships ==")
    reg2 = TableRegistry()
    reg2.register_df("ta", spark.createDataFrame([(1,), (2,)], "id long"))
    reg2.register_df("tb", spark.createDataFrame([(10,), (20,)], "id long"))
    reg2.register_df(
        "tr",
        spark.createDataFrame(
            [
                (1, 10, [1.0, 0.0], "a"),
                (1, 20, [0.6, 0.8], "b"),
                (2, 20, [0.0, 1.0], "c"),
            ],
            "src long, dst long, emb array<float>, tag string",
        ),
    )
    g2 = GraphSchema(
        [
            NodeSchema("A", "ta", "id", (), "bigint"),
            NodeSchema("B", "tb", "id", (), "bigint"),
        ],
        [
            EdgeSchema(
                "R", "A", "B", "tr", "src", "dst",
                (
                    EntityProperty("emb", "array<float>"),
                    EntityProperty("tag", "string"),
                ),
            )
        ],
    )
    reng = CypherEngine(spark, g2, reg2)
    reng.create_relationship_vector_index("remb", "R", "emb")
    reng.cypher(
        "CALL db.index.vector.queryRelationships('remb', 2, $v) "
        "YIELD relationship AS r, score "
        "RETURN type(r) AS t, r.tag AS tag, round(score, 4) AS s "
        "ORDER BY s DESC",
        params={"v": [1.0, 0.0]},
    ).show()

    # ---- 3. disjunction-adjacent var-length: undirected / path vars ----
    print("== 3. (n:Customer|Supplier)-[:FROM_NATION*2..2]-(c:Customer) ==")
    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, sf_dir)
    )
    # 2-hop undirected trail bounces off the shared Nation: rel-unique,
    # so a customer never reaches itself through its own edge
    eng.cypher(
        """
        MATCH (m:Customer|Supplier)-[:FROM_NATION*2..2]-(c:Customer)
        RETURN labels(m)[0] AS kind, count(*) AS pairs
        """
    ).show()
    print("== 3b. path variable over the disjunction hop ==")
    eng.cypher(
        """
        MATCH p = (m:Customer|Supplier)-[:FROM_NATION*1..2]-(c:Customer)
        RETURN length(p) AS hops, count(p) AS paths
        """
    ).show()

    # ---- 4. *0.. under OPTIONAL MATCH -----------------------------------
    print("== 4. *0.. disjunction adjacency under OPTIONAL MATCH ==")
    reg3 = TableRegistry()
    reg3.register_df("tx", spark.createDataFrame([("a1",), ("a2",)], "id string"))
    reg3.register_df("ty", spark.createDataFrame([("b1",)], "id string"))
    reg3.register_df(
        "oe", spark.createDataFrame([("b1", "a1")], "src string, dst string")
    )
    g3 = GraphSchema(
        [NodeSchema("A", "tx", "id", ()), NodeSchema("B", "ty", "id", ())],
        [EdgeSchema("O", "B", "A", "oe", "src", "dst")],
    )
    zeng = CypherEngine(spark, g3, reg3)
    zeng.cypher(
        """
        MATCH (w:B)-[:O]->(x:A)
        OPTIONAL MATCH (x:A)<-[:O*0..1]-(n:A|B)
        RETURN w.id AS w, x.id AS x, n.id AS n
        """
    ).show()

    # ---- 5. BM25 full-text index -----------------------------------------
    print("== 5. CALL db.index.fulltext.queryNodes (exact BM25) ==")
    reg4 = TableRegistry()
    reg4.register(
        "documents",
        lambda: spark.read.parquet(f"{sf_dir}/documents.parquet"),
    )
    g4 = GraphSchema(
        [
            NodeSchema(
                "Doc", "documents", "doc_id",
                (EntityProperty("text", "string"),), "bigint",
            )
        ],
        [],
    )
    feng = CypherEngine(spark, g4, reg4)
    feng.create_fulltext_index("docs_ft", "Doc", "text")
    feng.cypher(
        "CALL db.index.fulltext.queryNodes('docs_ft', 'fast merge scan', "
        "{limit: 5}) YIELD node, score "
        "RETURN node.doc_id AS id, round(score, 4) AS bm25 "
        "ORDER BY bm25 DESC"
    ).show()

    # ---- 6. allShortestPaths ---------------------------------------------
    print("== 6. allShortestPaths keeps every tied minimal path ==")
    reg5 = TableRegistry()
    reg5.register_df(
        "nn",
        spark.createDataFrame([("a",), ("b1",), ("b2",), ("d",)], "id string"),
    )
    reg5.register_df(
        "ne",
        spark.createDataFrame(
            [("a", "b1"), ("a", "b2"), ("b1", "d"), ("b2", "d")],
            "src string, dst string",
        ),
    )
    g5 = GraphSchema(
        [NodeSchema("N", "nn", "id", ())],
        [EdgeSchema("L", "N", "N", "ne", "src", "dst")],
    )
    peng = CypherEngine(spark, g5, reg5)
    peng.cypher(
        "MATCH p = allShortestPaths((a:N)-[:L*]->(b:N)) "
        "WHERE a.id = 'a' AND b.id = 'd' RETURN nodes(p) AS path"
    ).show(truncate=False)

    # -- heterogeneous label chains (round-11 continuation) ------------
    # the verb set need not connect the endpoint labels directly:
    # Orders -CONTAINS-> Lineitem -OF_PART-> Part enumerates
    # relationship-unique paths, with exact per-hop types
    print("== var-length over a heterogeneous label chain ==")
    from opencyphertranspiler_spark.catalog import get_engine

    eng2 = get_engine(spark, sf_dir)
    eng2.cypher(
        "MATCH p = allShortestPaths((o:Orders)-[:CONTAINS|OF_PART*]->(pt:Part)) "
        "RETURN id(o) AS order_key, id(pt) AS part_key, count(p) AS n_paths "
        "ORDER BY n_paths DESC, order_key LIMIT 5"
    ).show()
    eng2.cypher(
        "MATCH p = (o:Orders)-[:CONTAINS|OF_PART*2..2]->(pt:Part) "
        "RETURN relationships(p)[0].type AS hop1, "
        "relationships(p)[1].type AS hop2 LIMIT 1"
    ).show()
    # unlabeled endpoint whose reachable labels differ by depth: the
    # engine infers the label SET and tags each row
    eng2.cypher(
        "MATCH (a:Orders)-[:CONTAINS*0..1]->(b) "
        "RETURN labels(b)[0] AS label, count(*) AS n"
    ).show()

    # -- scalar imports in CALL subqueries ------------------------------
    print("== CALL { WITH <scalar> } ==")
    eng2.cypher(
        "MATCH (c:Customer) WITH avg(c.c_acctbal) AS mean_bal "
        "CALL { WITH mean_bal MATCH (c2:Customer) "
        "WHERE c2.c_acctbal > mean_bal RETURN count(*) AS above } "
        "RETURN round(mean_bal, 2) AS mean_bal, above"
    ).show()

    spark.stop()
    print("round-11 features OK")


if __name__ == "__main__":
    main()
