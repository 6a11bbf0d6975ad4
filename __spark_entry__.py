"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every catalog entry for the driver's DuckDB
differential gate. The catalog itself lives in
``opencyphertranspiler_spark/catalog.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from functools import partial

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opencyphertranspiler_spark.catalog import CATALOG, get_engine, run_entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    eng = get_engine(spark, "/root/testdata/sf0.001")
    return eng.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        WHERE c.c_mktsegment = 'BUILDING'
        RETURN c.c_name AS name, count(o) AS order_count
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/construct (SURVEY.md §2)."""
    return {e.name: partial(run_entry, e) for e in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column aliases)."""
    return {e.name: e.oracle for e in CATALOG if e.oracle is not None}
