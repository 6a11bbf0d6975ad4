from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("opencyphertranspiler_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # intentionally NOT setting spark.sql.ansi.enabled: tests run with
        # the same Spark 4 default (ANSI on) the driver uses, so ANSI
        # overflow/cast issues surface here first
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def engine(spark):
    from opencyphertranspiler_spark.catalog import get_engine

    return get_engine(spark, SF_DIR)


@pytest.fixture(scope="session")
def duck():
    from opencyphertranspiler_spark.testing import duckdb_connection

    return duckdb_connection(SF_DIR)
