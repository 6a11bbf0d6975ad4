"""Round 13 (VERDICT r12 #3/#4/#5): staleness detection for trained /
materialized index state, the IVF fresh list, the materialized-postings
fresh-doc delta, and index registries carried into post-write engines."""

import warnings

import pytest
from pyspark.sql import functions as F

from opencyphertranspiler_spark import (
    CypherEngine,
    StaleIndexWarning,
    tpch_graph_schema,
    tpch_table_registry,
)
from tests.conftest import SF_DIR

QV = [round((((i * 37) % 19) - 9) / 9.0, 4) for i in range(64)]

VQ = (
    "CALL db.index.vector.queryNodes('v1', 5, $v) YIELD node, score "
    "RETURN id(node) AS id ORDER BY score DESC, id"
)


def _engine(spark, **kw):
    return CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR), **kw
    )


def _grow_embeddings(spark, emb):
    new = spark.createDataFrame(
        [(999999, "new", [float(x) for x in QV])],
        "vec_id bigint, label string, embedding array<double>",
    )
    new = new.select(
        "vec_id",
        "label",
        F.col("embedding")
        .cast(emb.schema["embedding"].dataType)
        .alias("embedding"),
        *[
            F.lit(None).cast(emb.schema[c].dataType).alias(c)
            for c in emb.columns
            if c not in ("vec_id", "label", "embedding")
        ],
    )
    return emb.unionByName(new.select(*emb.columns))


def test_trained_fresh_list_and_warning(spark):
    eng = _engine(spark)
    eng.create_vector_index("v1", "Embedding", "embedding")
    eng.train_vector_index("v1", n_cells=4, nprobe=2, iters=2)
    grown = _grow_embeddings(spark, eng.tables.get("embeddings"))
    eng.tables.register("embeddings", lambda: grown)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ids = [r.id for r in eng.cypher(VQ, params={"v": QV}).collect()]
    # the post-train insert is a perfect match -> must WIN despite the
    # frozen celled corpus (fresh-list delta), and the staleness warns
    assert ids[0] == 999999
    assert any(issubclass(x.category, StaleIndexWarning) for x in w)


def test_rebuild_stale_indexes_retrains_silently(spark):
    eng = _engine(spark, rebuild_stale_indexes=True)
    eng.create_vector_index("v1", "Embedding", "embedding")
    eng.train_vector_index("v1", n_cells=4, nprobe=2, iters=2)
    grown = _grow_embeddings(spark, eng.tables.get("embeddings"))
    eng.tables.register("embeddings", lambda: grown)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ids = [r.id for r in eng.cypher(VQ, params={"v": QV}).collect()]
        stale = [
            x for x in w if issubclass(x.category, StaleIndexWarning)
        ]
    assert ids[0] == 999999 and not stale
    # the retrain re-stamped the epoch: trained state is current again
    assert eng._vector_ann["v1"][5] == eng.tables.epoch("embeddings")


def test_trained_no_delta_when_epoch_matches(spark):
    """With an unchanged registration epoch the candidate plan must stay
    strictly cell-pruned — no anti-join corpus pass."""
    eng = _engine(spark)
    eng.create_vector_index("v1", "Embedding", "embedding")
    eng.train_vector_index("v1", n_cells=4, nprobe=2, iters=2)
    probed, fresh, how = eng._vector_candidate_parts(
        "v1", "Embedding", "embedding", QV
    )
    assert how == "ivf" and fresh is None


def test_materialized_fresh_doc_delta(spark):
    eng = _engine(spark)
    eng.create_fulltext_index("f1", "Document", "text")
    eng.materialize_fulltext_index("f1")
    docs = eng.tables.get("documents")
    nd = spark.createDataFrame(
        [(888888, "spark vector spark vector spark vector")],
        "doc_id bigint, text string",
    )
    nd = nd.select(
        "doc_id",
        "text",
        *[
            F.lit(None).cast(docs.schema[c].dataType).alias(c)
            for c in docs.columns
            if c not in ("doc_id", "text")
        ],
    ).select(*docs.columns)
    grown = docs.unionByName(nd)
    eng.tables.register("documents", lambda: grown)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = eng.cypher(
            "CALL db.index.fulltext.queryNodes('f1', 'spark vector', "
            "{limit: 5}) YIELD node, score "
            "RETURN id(node) AS id, score ORDER BY score DESC, id"
        ).collect()
    assert 888888 in [r.id for r in rows]
    assert any(issubclass(x.category, StaleIndexWarning) for x in w)


def test_post_write_engine_keeps_index_registries(spark):
    eng = _engine(spark)
    eng.create_vector_index("vw", "Embedding", "embedding")
    eng.create_fulltext_index("fw", "Document", "text")
    res = eng.cypher_write(
        "MATCH (d:Document) WHERE id(d) = 0 SET d.lang = 'xx'"
    )
    deng = res.engine()
    vec = deng.cypher(
        "CALL db.index.vector.queryNodes('vw', 3, $v) YIELD node, score "
        "RETURN id(node) AS id",
        params={"v": QV},
    ).collect()
    ft = deng.cypher(
        "CALL db.index.fulltext.queryNodes('fw', 'spark', {limit: 3}) "
        "YIELD node, score RETURN id(node) AS id"
    ).collect()
    assert len(vec) == 3 and len(ft) == 3
    # and the post-write DATA is what the derived surfaces see
    assert deng.cypher(
        "MATCH (d:Document) WHERE id(d) = 0 RETURN d.lang AS lang"
    ).collect()[0].lang == "xx"


def test_post_write_search_sees_written_rows(spark):
    """VERDICT r12 #3 'done' criterion: create index -> cypher_write a
    new node -> result.engine() CALL db.index...* returns post-write
    winners."""
    eng = _engine(spark)
    eng.create_fulltext_index("fw2", "Document", "text")
    res = eng.cypher_write(
        "CREATE (d:Document {doc_id: 777777, "
        "text: 'zanzibar zanzibar zanzibar'})"
    )
    deng = res.engine()
    rows = deng.cypher(
        "CALL db.index.fulltext.queryNodes('fw2', 'zanzibar', {limit: 3})"
        " YIELD node, score RETURN id(node) AS id"
    ).collect()
    assert [r.id for r in rows] == [777777]


def test_trained_relationship_vector_index(spark):
    """Round 13: train_vector_index works on RELATIONSHIP vector
    indexes — exhaustive probe reproduces the exact top-k, a pruned
    probe serves from the celled edge corpus, and post-train edge
    inserts arrive through the fresh-list delta."""
    from pyspark.sql import functions as F

    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df("ta", spark.createDataFrame([(1,), (2,)], "id long"))
    reg.register_df(
        "tb", spark.createDataFrame([(10,), (20,), (30,)], "id long")
    )
    rows = [
        (1, 10, [1.0, 0.0], 0.5),
        (1, 20, [0.8, 0.6], 0.7),
        (2, 20, [0.0, 1.0], 0.9),
        (2, 30, [0.6, 0.8], 0.1),
    ]
    edges = spark.createDataFrame(
        rows, "src long, dst long, emb array<float>, w double"
    )
    reg.register_df("tr", edges)
    g = GraphSchema(
        [
            NodeSchema("A", "ta", "id", (), "bigint"),
            NodeSchema("B", "tb", "id", (), "bigint"),
        ],
        [
            EdgeSchema(
                "R", "A", "B", "tr", "src", "dst",
                (
                    EntityProperty("emb", "array<float>"),
                    EntityProperty("w", "double"),
                ),
            )
        ],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_relationship_vector_index("remb", "R", "emb")
    v = [1.0, 0.0]
    q = (
        "CALL db.index.vector.queryRelationships('remb', 2, $v) "
        "YIELD relationship AS r, score "
        "RETURN r.w AS w, round(score, 4) AS s ORDER BY s DESC"
    )
    exact = [tuple(r) for r in eng.cypher(q, params={"v": v}).collect()]
    assert exact == [(0.5, 1.0), (0.7, 0.9)]
    # exhaustive probe == exact
    eng.train_vector_index("remb", n_cells=2, nprobe=2, iters=2)
    assert [
        tuple(r) for r in eng.cypher(q, params={"v": v}).collect()
    ] == exact
    assert (
        eng.cypher("SHOW INDEXES")
        .filter("name = 'remb'")
        .collect()[0]
        .mode
        == "TRAINED"
    )
    # post-train insert: a perfect-match parallel edge wins via the
    # fresh-list delta (epoch moved -> StaleIndexWarning fires)
    import warnings

    new_edge = spark.createDataFrame(
        [(2, 30, [2.0, 0.0], 9.9)],
        "src long, dst long, emb array<float>, w double",
    )
    grown = edges.unionByName(new_edge)
    eng.tables.register("tr", lambda: grown)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = [
            tuple(r) for r in eng.cypher(q, params={"v": v}).collect()
        ]
    from opencyphertranspiler_spark import StaleIndexWarning

    # the fresh edge ties at cos=1 and takes a top-2 slot through the
    # delta (the deterministic src/dst tie-break orders the pair)
    assert (9.9, 1.0) in got and (0.7, 0.9) not in got
    assert any(issubclass(x.category, StaleIndexWarning) for x in w)


def test_write_result_save_parquet(spark, tmp_path):
    """Round 13: WriteResult.save() persists the derived tables as
    parquet and returns a parquet-backed snapshot — durable lineage
    truncation; the derived engine reads the files and keeps the index
    registries."""
    import os

    eng = _engine(spark)
    eng.create_fulltext_index("fsv", "Document", "text")
    res = eng.cypher_write(
        "CREATE (d:Document {doc_id: 555555, text: 'quokka quokka'})"
    )
    saved = res.save(str(tmp_path))
    assert os.path.isdir(f"{tmp_path}/documents.parquet")
    deng = saved.engine()
    # the saved snapshot serves the written row, from parquet
    got = deng.cypher(
        "CALL db.index.fulltext.queryNodes('fsv', 'quokka', {limit: 2}) "
        "YIELD node, score RETURN id(node) AS id"
    ).collect()
    assert [r.id for r in got] == [555555]
    plan = deng.cypher(
        "MATCH (d:Document) RETURN count(*) AS n"
    )._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()


def test_rebuild_stores_under_fresh_cache_key(spark):
    """Round 14 (ADVICE r13): with rebuild_stale_indexes=True the
    retrain resolves BEFORE the winner-cache key forms, so the rebuilt
    frame lands under the POST-rebuild epoch stamps and the next
    identical query is a cache HIT (no second rebuild, no dead entry
    occupying an LRU slot under the stale key)."""
    eng = _engine(spark, rebuild_stale_indexes=True)
    eng.create_vector_index("v1", "Embedding", "embedding")
    eng.train_vector_index("v1", n_cells=4, nprobe=2, iters=2)
    grown = _grow_embeddings(spark, eng.tables.get("embeddings"))
    eng.tables.register("embeddings", lambda: grown)
    eng.cypher(VQ, params={"v": QV}).collect()
    assert len(eng._winner_cache) == 1
    ((key, frame),) = list(eng._winner_cache.items())
    # key layout: (table, index, table epoch, index epoch, *args) — the
    # stamps must be the POST-rebuild ones
    assert key[0] == "embeddings" and key[1] == "v1"
    assert key[2] == eng.tables.epoch("embeddings")
    assert key[3] == eng._index_epochs.get("v1", 0)
    epoch_after_first = eng._vector_ann["v1"][5]
    eng.cypher(VQ, params={"v": QV}).collect()
    # cache hit: same frame object, no re-train, still one entry
    assert len(eng._winner_cache) == 1
    assert next(iter(eng._winner_cache.values())) is frame
    assert eng._vector_ann["v1"][5] == epoch_after_first
