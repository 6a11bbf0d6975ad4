"""Storage hygiene of the fixpoint operators (VERDICT r14 #9).

Two properties:

1. DETERMINISTIC — no DataFrame-level cache outlives an operator call:
   every ``persist()`` an operator takes is matched by an ``unpersist()``
   before it returns (pagerank's repartitioned edge cache was the flagged
   suspect). Checked via the session CacheManager, which tracks exactly
   the ``persist``-ed plans.

2. BOUNDED — localCheckpoint blocks (round states) do not ACCUMULATE
   across consecutive invocations: after dropping the returned frames and
   letting the ContextCleaner run, a second p15-style invocation leaves
   the executor-block count no higher than the first did. (Checkpoint
   blocks are released by GC, not unpersist — the assertion polls briefly
   because the cleaner is asynchronous.)
"""

from __future__ import annotations

import gc
import time

import pytest
from pyspark.sql import functions as F


def _n_cached_plans(spark) -> int:
    """Entries in the session CacheManager. The suite's session fixture is
    shared, so earlier tests may legitimately hold engine-lifetime caches —
    all assertions here are RELATIVE to the pre-call count, never absolute."""
    return (
        spark._jsparkSession.sharedState().cacheManager().cachedData().size()
    )


def _n_storage_rdds(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _settle(spark, target: int, timeout: float = 20.0) -> int:
    """GC + poll until the storage-RDD count drops to target (or timeout);
    returns the settled count."""
    deadline = time.time() + timeout
    n = _n_storage_rdds(spark)
    while n > target and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        n = _n_storage_rdds(spark)
    return n


def _weighted_edges(spark):
    rows = [(f"c{i % 7}", f"o{i}", float(1 + i % 13)) for i in range(200)]
    return spark.createDataFrame(rows, "src string, dst string, w double")


def test_pagerank_releases_edge_cache_and_state(spark):
    from opencyphertranspiler_spark.pipeline.graph import pagerank

    edges = _weighted_edges(spark)
    cached0 = _n_cached_plans(spark)
    base = _settle(spark, 0)

    out1 = pagerank(edges, iters=3, weight="w")
    out1.count()
    # the repartitioned edge persist must be GONE the moment the call
    # returns (pagerank unpersists it) — deterministic, no GC involved
    assert _n_cached_plans(spark) == cached0
    del out1
    settled1 = _settle(spark, base)
    assert settled1 <= base, (base, settled1)

    out2 = pagerank(edges, iters=3, weight="w")
    out2.count()
    assert _n_cached_plans(spark) == cached0
    del out2
    # no growth across consecutive invocations: every run releases back
    # to the pre-run floor once the (async) ContextCleaner has run
    settled2 = _settle(spark, base)
    assert settled2 <= base, (base, settled2)


def test_bfs_loop_releases_edge_blocks(spark):
    from opencyphertranspiler_spark.pipeline.graph import (
        shortest_path_lengths,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    cached0 = _n_cached_plans(spark)
    base = _settle(spark, 0)

    out1 = shortest_path_lengths(edges, sources=seeds)
    n1 = out1.count()
    # no persist leaked (checkpoint mode)
    assert _n_cached_plans(spark) == cached0
    del out1
    settled1 = _settle(spark, base)
    assert settled1 <= base, (base, settled1)

    out2 = shortest_path_lengths(edges, sources=seeds)
    assert out2.count() == n1
    assert _n_cached_plans(spark) == cached0
    del out2
    settled2 = _settle(spark, base)
    assert settled2 <= base, (base, settled2)
