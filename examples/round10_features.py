#!/usr/bin/env python3
"""Round-10 query-surface tour.

Covered: relationship-unique path ENUMERATION on cyclic graphs (exact
Neo4j row-per-path on ANY graph — the fixpoint carries each path's
rel-identity array and refuses to reuse an edge), undirected unbounded
path variables, Neo4j-normalized vector.similarity.cosine, the vector
index procedure CALL db.index.vector.queryNodes (composing with
ordinary clauses), and unbounded directed var-length hops adjacent to a
label disjunction (reachability over label-qualified composite ids).

Run:  python examples/round10_features.py [sf_dir]
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
        .appName("round10-features")
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
    )

    # -- 1. row-per-path enumeration on a CYCLIC graph ----------------------
    # 3-cycle plus a chord: several relationship-unique paths share an
    # endpoint pair; Neo4j enumerates one row per PATH and so do we.
    print("=== 1. rel-unique path enumeration on a cyclic graph ===")
    reg = TableRegistry()
    reg.register_df(
        "n", spark.createDataFrame([("x",), ("y",), ("z",)], "id string")
    )
    reg.register_df(
        "l",
        spark.createDataFrame(
            [("x", "y"), ("y", "z"), ("z", "x"), ("x", "z")],
            "src string, dst string",
        ),
    )
    cyc = CypherEngine(
        spark,
        GraphSchema(
            [NodeSchema("N", "n", "id", ())],
            [EdgeSchema("L", "N", "N", "l", "src", "dst")],
        ),
        reg,
    )
    cyc.cypher(
        "MATCH p = (a:N {id:'x'})-[:L*]->(b:N) "
        "RETURN b.id AS reaches, length(p) AS len, nodes(p) AS path "
        "ORDER BY len, path"
    ).show(truncate=False)
    cyc.cypher(
        "MATCH p = (a:N)-[:L*2..]->(b:N) "
        "RETURN a.id AS a, b.id AS b, count(p) AS n_paths "
        "ORDER BY a, b"
    ).show()

    # -- 2. undirected unbounded path variables ------------------------------
    print("=== 2. undirected unbounded path variables (triangle) ===")
    cyc.cypher(
        "MATCH p = (a:N {id:'y'})-[:L*]-(b:N) "
        "RETURN b.id AS b, length(p) AS len, nodes(p) AS route "
        "ORDER BY len, route"
    ).show(truncate=False)

    # -- 3. vector index procedure over the embeddings table ----------------
    print("=== 3. CALL db.index.vector.queryNodes ===")
    ereg = TableRegistry()
    ereg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
    )
    emb = CypherEngine(
        spark,
        GraphSchema(
            [
                NodeSchema(
                    "Emb",
                    "embeddings",
                    "vec_id",
                    (EntityProperty("embedding", "array<float>"),),
                    "bigint",
                )
            ],
            [],
        ),
        ereg,
    )
    emb.create_vector_index("emb_idx", "Emb", "embedding")
    qvec = [
        float(v)
        for v in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 1")
        .collect()[0]
        .embedding
    ]
    emb.cypher(
        "CALL db.index.vector.queryNodes('emb_idx', 5, $v) "
        "YIELD node, score "
        "RETURN node.vec_id AS neighbour, round(score, 4) AS score "
        "ORDER BY score DESC, neighbour",
        params={"v": qvec},
    ).show()
    # normalized cosine: orthogonal vectors now score 0.5 (Neo4j 5.18)
    emb.cypher(
        "WITH [1.0, 0.0] AS a, [0.0, 1.0] AS b "
        "RETURN vector.similarity.cosine(a, b) AS orthogonal_score"
    ).show()

    # -- 4. unbounded adjacency to a label disjunction ----------------------
    print("=== 4. (n:Customer|Supplier)-[:FROM_NATION]->()-[:IN_REGION*]-> ===")
    from opencyphertranspiler_spark import (
        tpch_graph_schema,
        tpch_table_registry,
    )

    tpch = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, sf_dir)
    )
    # disjunction + unbounded var-length in one pattern: every nation a
    # customer-or-supplier can reach through the region hierarchy
    tpch.cypher(
        """
        MATCH (p:Customer|Supplier)-[:FROM_NATION*]->(n:Nation)
        RETURN labels(p)[0] AS kind, count(*) AS pairs
        ORDER BY kind
        """
    ).show()

    print("round-10 tour complete.")
    spark.stop()


if __name__ == "__main__":
    main()
