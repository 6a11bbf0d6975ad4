"""Round 13 (VERDICT r12 #1): the lazy index-winner frames are CACHED
across compiles — keyed by (base table, registration epoch, index epoch,
query args) — so repeat actions on the same (query, corpus) reuse the
k-row cached frame instead of recomputing the distributed top-k, while
a re-registered table or a re-built index evicts by key (the round-12
staleness guarantees are preserved: test_vector_query_nodes_lazy_unfrozen
still passes against this cache)."""

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def vector_engine(spark):
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
    )
    g = GraphSchema(
        [
            NodeSchema(
                "Emb",
                "embeddings",
                "vec_id",
                (EntityProperty("embedding", "array<float>"),),
                "bigint",
            )
        ],
        [],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_vector_index("emb_idx", "Emb", "embedding")
    return eng


def _qvec(spark):
    row = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


Q = (
    "CALL db.index.vector.queryNodes('emb_idx', 4, $v) "
    "YIELD node, score RETURN node.vec_id AS id ORDER BY id"
)


def test_repeat_query_hits_cache(vector_engine, spark):
    vector_engine.clear_caches()
    v = _qvec(spark)
    first = [r.id for r in vector_engine.cypher(Q, params={"v": v}).collect()]
    assert len(vector_engine._winner_cache) == 1
    cached = next(iter(vector_engine._winner_cache.values()))
    again = [r.id for r in vector_engine.cypher(Q, params={"v": v}).collect()]
    assert again == first
    # same key -> same cached frame object, still exactly one entry
    assert len(vector_engine._winner_cache) == 1
    assert next(iter(vector_engine._winner_cache.values())) is cached
    # different args -> a second, independent entry
    vector_engine.cypher(
        Q.replace("4, $v", "5, $v"), params={"v": v}
    ).collect()
    assert len(vector_engine._winner_cache) == 2
    vector_engine.clear_caches()
    assert not vector_engine._winner_cache


def test_reregister_evicts_by_epoch(vector_engine, spark):
    vector_engine.clear_caches()
    v = _qvec(spark)
    first = [r.id for r in vector_engine.cypher(Q, params={"v": v}).collect()]
    full = vector_engine.tables.get("embeddings")
    keep = full.filter(~full.vec_id.isin(first[:2]))
    vector_engine.tables.register("embeddings", lambda: keep)
    try:
        stale = next(iter(vector_engine._winner_cache.values()))
        after = [
            r.id for r in vector_engine.cypher(Q, params={"v": v}).collect()
        ]
        # stale winners are NOT served: the epoch changed the cache key
        assert not set(after) & set(first[:2])
        # round 14 (VERDICT r13 #6): the dead-epoch entry is SWEPT on
        # the next insert (not left to LRU pressure) and unpersisted
        assert len(vector_engine._winner_cache) == 1
        assert stale.storageLevel.useMemory is False
    finally:
        vector_engine.tables.register(
            "embeddings",
            lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        )
        vector_engine.clear_caches()


def test_index_rebuild_evicts(vector_engine, spark):
    vector_engine.clear_caches()
    v = _qvec(spark)
    vector_engine.cypher(Q, params={"v": v}).collect()
    assert len(vector_engine._winner_cache) == 1
    # idempotent re-create: same definition, no epoch bump, cache kept
    e0 = vector_engine._index_epochs.get("emb_idx", 0)
    vector_engine.create_vector_index("emb_idx", "Emb", "embedding")
    assert vector_engine._index_epochs.get("emb_idx", 0) == e0
    vector_engine.cypher(Q, params={"v": v}).collect()
    assert len(vector_engine._winner_cache) == 1
    # creating an UNRELATED index must not evict this one's winners
    vector_engine.create_vector_index("wc_tmp_idx", "Emb", "embedding")
    vector_engine.cypher(Q, params={"v": v}).collect()
    assert len(vector_engine._winner_cache) == 1
    # re-creating THIS index with a changed definition bumps its epoch
    try:
        vector_engine.create_vector_index(
            "emb_idx", "Emb", "embedding", similarity="euclidean"
        )
        assert vector_engine._index_epochs["emb_idx"] == e0 + 1
        # round 14 (VERDICT r13 #6): the bump itself sweeps the
        # dead-epoch entry eagerly — no query needed
        assert len(vector_engine._winner_cache) == 0
        vector_engine.cypher(Q, params={"v": v}).collect()
        assert len(vector_engine._winner_cache) == 1
    finally:
        vector_engine.cypher("DROP INDEX wc_tmp_idx")
        vector_engine.create_vector_index("emb_idx", "Emb", "embedding")
        vector_engine.clear_caches()


def test_lru_bound(vector_engine, spark):
    vector_engine.clear_caches()
    vector_engine._winner_cache_max = 3
    v = _qvec(spark)
    try:
        for k in range(2, 8):
            vector_engine.cypher(
                Q.replace("4, $v", f"{k}, $v"), params={"v": v}
            ).collect()
        assert len(vector_engine._winner_cache) == 3
    finally:
        vector_engine._winner_cache_max = 64
        vector_engine.clear_caches()
