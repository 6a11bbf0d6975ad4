#!/usr/bin/env python3
"""Graph-analytics tour over the TPC-H order-succession graph: the bulk
operators that answer the unbounded questions Cypher's pattern matching
deliberately bounds.

Graph: order succession NEXT edges (o_orderkey -> o_orderkey + 1 within
blocks of 10 — the same deterministic chain fixture the gate uses) plus
the customer co-segment graph for the community/centrality operators.

Run:  python examples/graph_analytics.py [sf_dir]
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
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from opencyphertranspiler_spark.pipeline.graph import (
        betweenness_approx,
        connected_components_star,
        k_core,
        label_propagation,
        pagerank,
        random_walks,
        shortest_path_counts,
        weighted_shortest_paths,
    )

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    chain = part.filter("p_partkey % 10 != 0").select(
        F.col("p_partkey").alias("src"), (F.col("p_partkey") + 1).alias("dst")
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    coregion = (
        nation.alias("a")
        .join(nation.alias("b"), "n_regionkey")
        .where(F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_nationkey").alias("src"),
            F.col("b.n_nationkey").alias("dst"),
        )
    )

    print("— connected components (large-star/small-star) —")
    cc = connected_components_star(chain, src="src", dst="dst")
    cc.groupBy("comp").count().orderBy("comp").show(3)

    print("— label propagation communities on the co-region graph —")
    label_propagation(coregion).groupBy("community").count().orderBy(
        "community"
    ).show()

    print("— PageRank over the chain graph —")
    pagerank(chain, iters=6).orderBy(F.desc("rank")).show(3)

    print("— weighted shortest paths from two seeds —")
    weighted = chain.withColumn("weight", (F.col("src") % 5 + 1).cast("double"))
    seeds = spark.createDataFrame([(1,), (41,)], "node long")
    weighted_shortest_paths(weighted, seeds).orderBy("dist").show(5)

    print("— shortest-path counts (Brandes sigma) + betweenness —")
    shortest_path_counts(chain, seeds).orderBy("dist").show(5)
    betweenness_approx(chain, seeds).orderBy(F.desc("betweenness")).show(3)

    print("— k-core of the co-region graph (five K5s: coreness 4) —")
    k_core(coregion).groupBy("coreness").count().show()

    print("— seeded random walks (DeepWalk corpus) —")
    walks = random_walks(coregion, seeds, walk_length=5, walks_per_node=2)
    walks.orderBy("walk_id", "step").show(10)

    spark.stop()


if __name__ == "__main__":
    main()
