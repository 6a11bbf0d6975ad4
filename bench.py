#!/usr/bin/env python3
"""Headline benchmark: wall-clock per catalog bench query.

Prints ONE JSON line:
  {"metric": "...", "value": <suite seconds>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": <sf>}

Env:
  SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] core count (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("opencyphertranspiler_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # 4g, deliberately: this suite's working set is small, and larger
        # heaps measurably SLOW the shuffle-stage-heavy pipeline entries
        # (G1 with a 16g heap cost p03 2-3x its 4g wall time; measured
        # 1g/2g/4g/8g/16g — 2-4g is the plateau). Override via env for
        # bigger SFs.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from opencyphertranspiler_spark.catalog import (
        CATALOG,
        clear_engine_caches,
        run_entry,
    )

    bench_entries = [e for e in CATALOG if e.bench]

    # Each entry is warmed once (not timed) at the smallest SF immediately
    # before its timed run: the tables have identical schemas, so
    # whole-stage codegen compiles and caches the exact generated classes
    # the timed run needs — the dominant cold-start cost (e.g. the
    # 64-column minhash signature projection) is paid on KB-sized inputs.
    # Interleaving (warm, time, warm, time ...) keeps each entry's classes
    # hot in the bounded codegen cache; the timed numbers then reflect
    # steady-state per-query cost, matching BASELINE.md §3.
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    timings: dict[str, float] = {}
    for e in bench_entries:
        # per-entry isolation (round 11, after the r10 s03 flag): drop
        # the previous entry's engine-lifetime materializations —
        # reachability fixpoints pin localCheckpoint blocks in this 4g
        # driver JVM, and letting them accumulate across the suite makes
        # later (GC-sensitive) entries measure the heap state, not the
        # query. Caches rebuild inside the timed run where the entry
        # itself owns them, which is what BASELINE.md's bands measure.
        clear_engine_caches(spark)
        run_entry(e, spark, warm_dir, bench=True).count()  # warm-up, not timed
        best = None
        for _ in range(2):  # min-of-2: the box is noisy (2-3x run-to-run)
            t0 = time.perf_counter()
            df = run_entry(e, spark, sf_dir, bench=True)
            df.count()  # execute fully; result sizes are small (aggregates)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[e.name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "config": {
                    "cpus": int(cpus),
                    "aqe": True,
                    "shuffle_partitions": int(cpus),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
