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

    # 3. drop documents mostly made of text seen elsewhere (exact
    #    duplicate-span signal — catches copy-paste the MinHash doc-level
    #    pass misses) and stamp a stable content fingerprint
    from opencyphertranspiler_spark.pipeline.dedup import duplicate_spans

    spans = duplicate_spans(deduped, window=12).filter(F.col("dup_frac") < 0.5)
    out = (
        deduped.join(spans.select("doc_id"), "doc_id")
        .join(fingerprint(deduped), "doc_id")
    )

    out = out.persist()  # one materialization feeds count + show
    n_out = out.count()
    print(
        f"in={n_in} kept_after_filters={kept.count()} "
        f"dup_clusters={canonical.count()} out={n_out}"
    )
    out.select("doc_id", "lang", "fp").show(5, truncate=False)

    # 4. training-set assembly: weighted domain mixture, then GPT-style
    #    sequence packing of the drawn corpus at a fixed token budget
    from opencyphertranspiler_spark.pipeline.packing import (
        chunk_spans,
        domain_mixture,
    )
    from opencyphertranspiler_spark.pipeline.text import token_stats

    sources = [r["source"] for r in out.select("source").distinct().collect()]
    weights = {s: 1.0 for s in sources}  # uniform mixture for the demo
    drawn = domain_mixture(out, weights=weights, n_total=n_out, seed=13)
    # epoch-distinct ids keep repeated documents distinct in the pack
    drawn = drawn.withColumn(
        "sample_id", F.col("doc_id") * 100 + F.col("epoch")
    )
    toks = token_stats(drawn.select("doc_id", "text").distinct()).select(
        "doc_id", "n_tokens"
    )
    packed = chunk_spans(
        drawn.join(toks, "doc_id").select("sample_id", "n_tokens"),
        budget=512,
        id_col="sample_id",
    )
    n_chunks = packed.select("chunk_id").distinct().count()
    print(f"mixture_rows={drawn.count()} training_chunks(512 tok)={n_chunks}")

    out.unpersist()
    kept.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
