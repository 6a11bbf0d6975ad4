"""Differential fuzz for the write path: randomized SET/DELETE statements
executed by the engine AND re-expressed as DuckDB UPDATE/DELETE over the
same parquet, then the full post-write customer table is compared.

Bounded (a handful of examples, deadline off) so the suite cost stays
small; the goal is shape coverage — predicate × value-expression ×
multi-item combinations the handwritten tests don't enumerate."""

from __future__ import annotations

# fuzz budget scales with SPARK_GRAFT_FUZZ_SCALE (default 1) — CI runs the
# cheap default; an extended hunt runs e.g. SPARK_GRAFT_FUZZ_SCALE=20
import os as _os

_FUZZ_SCALE = int(_os.environ.get("SPARK_GRAFT_FUZZ_SCALE", "1"))

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from .conftest import SF_DIR

PREDS = [
    ("c.c_acctbal < 0", "c_acctbal < 0"),
    ("c.c_custkey % 7 = 3", "c_custkey % 7 = 3"),
    ("c.c_mktsegment = 'BUILDING'", "c_mktsegment = 'BUILDING'"),
    ("c.c_acctbal >= 0 AND c.c_custkey < 50", "c_acctbal >= 0 AND c_custkey < 50"),
    ("c.c_name CONTAINS '001'", "c_name LIKE '%001%'"),
]

VALS = [
    ("c.c_acctbal + 10.5", "c_acctbal + 10.5"),
    ("c.c_custkey * 2", "c_custkey * 2"),
    ("'tag-' + c.c_mktsegment", "'tag-' || c_mktsegment"),
    ("42", "42"),
    ("c.c_acctbal", "c_acctbal"),
]


@pytest.fixture(scope="module")
def weng(spark):
    from opencyphertranspiler_spark.catalog import get_engine

    return get_engine(spark, SF_DIR)


@settings(
    max_examples=12 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pred=st.sampled_from(PREDS),
    val1=st.sampled_from(VALS),
    val2=st.sampled_from(VALS),
)
def test_random_set_matches_duckdb_update(weng, duck, pred, val1, val2):
    cy_pred, sql_pred = pred
    res = weng.cypher_write(
        f"MATCH (c:Customer) WHERE {cy_pred} "
        f"SET c.f1 = {val1[0]}, c.f2 = {val2[0]}"
    )
    got = sorted(
        tuple(r)
        for r in res.table("customer")
        .selectExpr(
            "c_custkey", "round(try_cast(f1 as double), 4)", "round(try_cast(f2 as double), 4)"
        )
        .collect()
    )
    exp = sorted(
        tuple(r)
        for r in duck.execute(
            f"""
            SELECT c_custkey,
                   round(TRY_CAST((CASE WHEN {sql_pred} THEN {val1[1]} END) AS DOUBLE), 4),
                   round(TRY_CAST((CASE WHEN {sql_pred} THEN {val2[1]} END) AS DOUBLE), 4)
            FROM customer
            """
        ).fetchall()
    )
    assert got == exp


@settings(
    max_examples=6 * _FUZZ_SCALE,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=st.sampled_from(PREDS))
def test_random_delete_matches_duckdb(weng, duck, pred):
    cy_pred, sql_pred = pred
    res = weng.cypher_write(f"MATCH (c:Customer) WHERE {cy_pred} DETACH DELETE c")
    got = sorted(r[0] for r in res.table("customer").select("c_custkey").collect())
    exp = sorted(
        r[0]
        for r in duck.execute(
            f"SELECT c_custkey FROM customer WHERE NOT ({sql_pred})"
        ).fetchall()
    )
    assert got == exp
