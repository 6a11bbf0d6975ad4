"""Round 14 (VERDICT r13 #5): Neo4j-style inline ``EXPLAIN <query>`` /
``PROFILE <query>`` prefixes on cypher(). EXPLAIN returns the plan dump
WITHOUT executing; PROFILE executes and returns the per-operator tree
with runtime Spark SQL metrics (the AQE final plan, numOutputRows)."""

import pytest

from opencyphertranspiler_spark import (
    CypherEngine,
    tpch_graph_schema,
    tpch_table_registry,
)
from tests.conftest import SF_DIR

Q = (
    "MATCH (c:Customer)-[:PLACED]->(o:Orders) "
    "RETURN c.c_mktsegment AS seg, count(o) AS n"
)


@pytest.fixture(scope="module")
def eng(spark):
    return CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )


def test_explain_prefix_golden_sections(eng):
    lines = [
        r.plan
        for r in eng.cypher("EXPLAIN " + Q).orderBy("line").collect()
    ]
    text = "\n".join(lines)
    # both sections of engine.explain(), verbatim
    assert lines[0] == "== Cypher Logical Plan =="
    assert "== Physical Plan ==" in text
    # the logical section names the Cypher operators, the physical one
    # the Spark ones
    assert "DataSourceOperator" in text or "Projection" in text
    assert "Scan parquet" in text
    # golden: EXPLAIN == engine.explain() modulo per-compile attribute
    # ids (#123) — each compile allocates fresh exprIds
    import re

    def norm(s):
        return re.sub(r"plan_id=\d+", "plan_id=", re.sub(r"#\d+", "#", s))

    assert norm(text) == norm(eng.explain(Q))


def test_explain_prefix_does_not_execute(eng, spark):
    sc = spark.sparkContext
    sc.setJobGroup("explain14", "explain probe")
    try:
        df = eng.cypher("EXPLAIN " + Q)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(sc.statusTracker().getJobIdsForGroup("explain14")) == []
    assert df.columns == ["line", "plan"]


def test_profile_prefix_runtime_metrics(eng):
    rows = eng.cypher("PROFILE " + Q).orderBy("id").collect()
    assert [r for r in rows]  # non-empty operator tree
    ops = [r.operator for r in rows]
    assert any("Scan parquet" in o for o in ops)
    assert any("HashAggregate" in o or "Join" in o for o in ops)
    # runtime metric presence: the scans actually ran and counted rows
    by_op = {
        r.operator: r.rows for r in rows if r.rows is not None
    }
    assert any(v and v > 0 for v in by_op.values()), rows
    # depth forms a tree: root at 0, children strictly deeper
    assert rows[0].depth == 0
    assert all(r.depth >= 0 for r in rows)
    # metrics strings carry named SQL metrics
    assert any("numOutputRows=" in (r.metrics or "") for r in rows)


def test_profile_row_counts_match_data(eng, duck):
    rows = eng.cypher(
        "PROFILE MATCH (c:Customer) RETURN count(*) AS n"
    ).collect()
    want = duck.sql("SELECT count(*) FROM customer").fetchone()[0]
    # some operator's numOutputRows equals the customer row count —
    # the metrics are REAL execution counts, not estimates
    assert any(r.rows == want for r in rows), [
        (r.operator, r.rows) for r in rows
    ]
