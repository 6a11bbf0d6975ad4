#!/usr/bin/env python3
"""Training-data curation pipeline: the composition story.

    documents ─▶ quality + language filters ─▶ near-dup pairs (MinHash LSH)
              ─▶ duplicate clusters (connected components)
              ─▶ one canonical doc per cluster ─▶ fingerprinted output

Every stage is a DataFrame -> DataFrame transform from the pipeline
package, so the whole flow is one lazy plan per stage group and scales by
partitioning — run it unchanged against a 100 TB corpus by pointing
``sf_dir`` at the real dataset (and passing ``staging_dir`` so the
signature tables materialize to storage instead of executor cache).

Run:  python examples/curate_pipeline.py [sf_dir]
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
        SparkSession.builder.master("local[*]")
        .appName("curate-pipeline-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from opencyphertranspiler_spark.pipeline.dedup import minhash_lsh_pairs
    from opencyphertranspiler_spark.pipeline.graph import connected_components
    from opencyphertranspiler_spark.pipeline.text import (
        fingerprint,
        language_id,
        quality_score,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()

    # 1. quality + language gates (pure codegen column expressions)
    quality = quality_score(docs).filter(F.col("quality") >= 0.5)
    langs = language_id(docs).filter(F.col("pred_lang") != "unknown")
    kept = (
        docs.join(quality.select("doc_id"), "doc_id")
        .join(langs.select("doc_id"), "doc_id")
        .persist()  # reused by the dedup pair-gen AND the final anti-join
    )

    # 2. near-duplicate pairs -> duplicate clusters -> canonical member
    pairs = minhash_lsh_pairs(kept, threshold=0.8)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    canonical = comps.groupBy("comp").agg(F.min("node").alias("doc_id"))
    drop = comps.join(
        canonical, comps["node"] == canonical["doc_id"], "left_anti"
    ).select(F.col("node").alias("doc_id"))
    deduped = kept.join(drop, "doc_id", "left_anti")

    # 3. stable content fingerprint on the survivors
    out = deduped.join(fingerprint(deduped), "doc_id")

    out = out.persist()  # one materialization feeds count + show
    n_out = out.count()
    print(
        f"in={n_in} kept_after_filters={kept.count()} "
        f"dup_clusters={canonical.count()} out={n_out}"
    )
    out.select("doc_id", "lang", "fp").show(5, truncate=False)
    out.unpersist()
    kept.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
