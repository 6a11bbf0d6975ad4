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
    metrics: dict[str, dict[str, int]] = {}
    sc = spark.sparkContext
    for e in bench_entries:
        # per-entry isolation (round 11, after the r10 s03 flag): drop
        # the previous entry's engine-lifetime materializations —
        # reachability fixpoints pin localCheckpoint blocks in this 4g
        # driver JVM, and letting them accumulate across the suite makes
        # later (GC-sensitive) entries measure the heap state, not the
        # query. Caches rebuild inside the timed run where the entry
        # itself owns them, which is what BASELINE.md's bands measure.
        clear_engine_caches(spark)
        sc.setJobGroup(f"warm:{e.name}", f"warm-up {e.name}")
        run_entry(e, spark, warm_dir, bench=True).count()  # warm-up, not timed
        sc.setJobGroup(e.name, e.name)
        best = None
        for _ in range(2):  # min-of-2: the box is noisy (2-3x run-to-run)
            t0 = time.perf_counter()
            df = run_entry(e, spark, sf_dir, bench=True)
            df.count()  # execute fully; result sizes are small (aggregates)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[e.name] = round(best, 3)
        # DETERMINISTIC per-entry metrics (optimization round 15,
        # additions-only): Spark job count and shuffle bytes of the two
        # timed reps, read from the AppStatusStore right after the entry
        # runs (before the store's retention limits can evict its
        # stages). Wall-clock on this box drifts 2-3x run-to-run; these
        # numbers don't, so round-over-round comparisons stay possible
        # under load. Collection must never fail the bench.
        try:
            metrics[e.name] = _entry_metrics(spark, e.name)
        except Exception:
            pass

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
                "metrics": metrics,
            }
        )
    )
    spark.stop()


def _entry_metrics(spark, group: str) -> dict[str, int]:
    """Jobs + shuffle read/write bytes attributed to one job group.

    Read from the driver's AppStatusStore (the store behind the UI/REST
    API — available with the UI disabled) via the status tracker and a
    stage-id -> bytes map. Unlike wall-clock these are deterministic for
    a fixed plan, so they let a regression be told apart from box noise."""
    sc = spark.sparkContext
    job_ids = set(sc.statusTracker().getJobIdsForGroup(group))
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    stages = store.stageList(
        empty,
        *[getattr(store, f"stageList$default${i}")() for i in range(2, 6)],
    )
    stage_bytes = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        stage_bytes[s.stageId()] = (s.shuffleReadBytes(), s.shuffleWriteBytes())
    jobs = store.jobsList(None)
    read = write = 0
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() not in job_ids:
            continue
        for sid_s in j.stageIds().mkString(",").split(","):
            if sid_s:
                rb, wb = stage_bytes.get(int(sid_s), (0, 0))
                read += rb
                write += wb
    return {
        "jobs": len(job_ids),
        "shuffle_read_bytes": int(read),
        "shuffle_write_bytes": int(write),
    }


if __name__ == "__main__":
    main()
