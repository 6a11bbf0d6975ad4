"""Round 14 (VERDICT r13 #4): ``CALL { <write body> } IN TRANSACTIONS
[OF n ROWS]`` — Neo4j's batched bulk-write form on the functional write
path: the reading prefix drives n-row batches, each batch folds the body
through the clause-sequential segment machinery, and a later batch
OBSERVES an earlier batch's writes (the semantic that distinguishes the
form from a plain write)."""

import pytest

from opencyphertranspiler_spark import (
    CypherEngine,
    tpch_graph_schema,
    tpch_table_registry,
)
from opencyphertranspiler_spark.exceptions import (
    TranspilerNotSupportedError,
    TranspilerSyntaxError,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def eng(spark):
    return CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )


def test_batched_equals_single_shot(eng):
    """Parity: for a deterministic body, batched tables and counters
    equal the plain single-shot write."""
    ids = [910001, 910002, 910003, 910004, 910005]
    batched = eng.cypher_write(
        f"UNWIND {ids} AS x "
        "CALL (x) { CREATE (:Document {doc_id: x, text: 'b'}) } "
        "IN TRANSACTIONS OF 2 ROWS"
    )
    single = eng.cypher_write(
        f"UNWIND {ids} AS x CREATE (:Document {{doc_id: x, text: 'b'}})"
    )
    got = sorted(
        (r.doc_id, r.text)
        for r in batched.table("documents")
        .filter("doc_id >= 910000")
        .select("doc_id", "text")
        .collect()
    )
    want = sorted(
        (r.doc_id, r.text)
        for r in single.table("documents")
        .filter("doc_id >= 910000")
        .select("doc_id", "text")
        .collect()
    )
    assert got == want and len(got) == 5
    assert batched.counts() == single.counts() == {"nodes_created": 5}


def test_later_batch_observes_earlier_writes(eng):
    """The defining semantic: a MATCH inside the body sees the previous
    batches' writes, so a count-derived id increments per batch (a plain
    write would give every row the same pre-write count)."""
    res = eng.cypher_write(
        "UNWIND [1, 2, 3] AS i "
        "CALL (i) { "
        "  MATCH (d:Document) WHERE d.doc_id >= 920000 "
        "  WITH count(d) AS before "
        "  CREATE (:Document {doc_id: 920000 + before, text: 'obs'}) "
        "} IN TRANSACTIONS OF 1 ROWS"
    )
    ids = sorted(
        r.doc_id
        for r in res.table("documents")
        .filter("doc_id >= 920000")
        .select("doc_id")
        .collect()
    )
    assert ids == [920000, 920001, 920002]


def test_default_batch_size_and_trailing_return(eng):
    res = eng.cypher_write(
        "UNWIND [930001, 930002] AS x "
        "CALL (x) { CREATE (:Document {doc_id: x, text: 't'}) } "
        "IN TRANSACTIONS "
        "MATCH (d:Document) WHERE d.doc_id >= 930000 "
        "RETURN count(d) AS n"
    )
    assert res.returned.collect()[0].n == 2


def test_multi_clause_body_with_set(eng):
    """A body with MATCH + SET updates rows batch-by-batch; totals match
    the unbatched equivalent."""
    res = eng.cypher_write(
        "UNWIND [0, 1] AS parity "
        "CALL (parity) { "
        "  MATCH (n:Nation) WHERE n.n_nationkey % 2 = parity "
        "  SET n.n_comment = 'batch' "
        "} IN TRANSACTIONS OF 1 ROWS"
    )
    got = (
        res.table("nation").filter("n_comment = 'batch'").count()
    )
    assert got == 25
    assert res.counts() == {"properties_set": 25}


def test_in_transactions_typed_fences(eng):
    with pytest.raises(TranspilerNotSupportedError, match="must contain a write"):
        eng.cypher_write(
            "UNWIND [1] AS i CALL (i) "
            "{ MATCH (d:Document) RETURN count(d) AS c } IN TRANSACTIONS"
        )
    with pytest.raises(TranspilerNotSupportedError, match="read-only"):
        # a write body WITHOUT the suffix must not silently no-op
        eng.cypher_write(
            "UNWIND [1] AS i CALL (i) "
            "{ CREATE (:Document {doc_id: 5, text: 'x'}) }"
        )
    with pytest.raises(TranspilerNotSupportedError, match="ON ERROR"):
        eng.cypher_write(
            "UNWIND [1] AS i CALL (i) "
            "{ CREATE (:Document {doc_id: 5, text: 'x'}) } "
            "IN TRANSACTIONS ON ERROR CONTINUE"
        )
    with pytest.raises(TranspilerNotSupportedError, match="cypher_write"):
        # read path rejects the form with a pointer to cypher_write
        eng.cypher(
            "UNWIND [1] AS i CALL (i) "
            "{ MATCH (d:Document) RETURN count(d) AS c } "
            "IN TRANSACTIONS RETURN 1 AS x"
        )
    with pytest.raises(TranspilerSyntaxError, match="positive"):
        eng.cypher_write(
            "UNWIND [1] AS i CALL (i) "
            "{ CREATE (:Document {doc_id: 5, text: 'x'}) } "
            "IN TRANSACTIONS OF 0 ROWS"
        )
    with pytest.raises(TranspilerNotSupportedError, match="RETURN inside"):
        eng.cypher_write(
            "UNWIND [1] AS i CALL (i) "
            "{ CREATE (:Document {doc_id: 5, text: 'x'}) "
            "  RETURN 1 AS one } IN TRANSACTIONS"
        )
