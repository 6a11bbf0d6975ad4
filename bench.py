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
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from opencyphertranspiler_spark.catalog import CATALOG, run_entry

    bench_entries = [e for e in CATALOG if e.bench]

    # warm-up: JVM + parquet footers (not timed)
    run_entry(bench_entries[0], spark, sf_dir).count()

    timings: dict[str, float] = {}
    for e in bench_entries:
        t0 = time.perf_counter()
        df = run_entry(e, spark, sf_dir)
        df.count()  # execute fully; result sizes are small (aggregates)
        timings[e.name] = round(time.perf_counter() - t0, 3)

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
