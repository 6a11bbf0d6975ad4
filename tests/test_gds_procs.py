"""Round 13: GDS-style graph-algorithm streams — CALL
gds.{pageRank,wcc,labelPropagation}.stream over the pipeline/graph.py
distributed algorithms, with label-qualified node ids whenever the edge
set spans several labels (cross-label raw-id collisions must not merge
graph nodes)."""

import pytest

from opencyphertranspiler_spark.testing import arrow_df

from opencyphertranspiler_spark import (
    CypherEngine,
    EdgeSchema,
    GraphSchema,
    NodeSchema,
    TableRegistry,
    tpch_graph_schema,
    tpch_table_registry,
)
from opencyphertranspiler_spark.exceptions import (
    TranspilerBindingError,
    TranspilerNotSupportedError,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark):
    return CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )


def test_wcc_structure_vs_duckdb(eng, duck):
    """Each region with its nations is exactly one component of size 6
    (5 nations + the region), and the componentId is the smallest
    label-qualified node id of the group."""
    got = sorted(
        (r.componentId, r.n)
        for r in eng.cypher(
            "CALL gds.wcc.stream('IN_REGION') YIELD nodeId, componentId "
            "RETURN componentId, count(*) AS n"
        ).collect()
    )
    want = sorted(
        (cid, n)
        for cid, n in duck.sql(
            """
            SELECT min(qid) AS cid, count(*) AS n FROM (
                SELECT r_regionkey AS grp,
                       'Nation:' || n_nationkey AS qid
                FROM nation JOIN region ON n_regionkey = r_regionkey
                UNION ALL
                SELECT r_regionkey, 'Region:' || r_regionkey FROM region
            ) GROUP BY grp
            """
        ).fetchall()
    )
    assert got == want and got


def test_pagerank_hand_graph_oracle(spark):
    """Exact power-method oracle on a 4-node single-label graph — the
    homogeneous edge set keeps NATIVE (long) node ids."""
    import numpy as np

    reg = TableRegistry()
    reg.register_df(
        "tn", arrow_df(spark, [(i,) for i in range(4)], "id long")
    )
    pairs = [(0, 1), (1, 2), (2, 0), (3, 2)]
    reg.register_df(
        "te", arrow_df(spark, pairs, "src long, dst long")
    )
    g = GraphSchema(
        [NodeSchema("N", "tn", "id", (), "bigint")],
        [EdgeSchema("E", "N", "N", "te", "src", "dst")],
    )
    e = CypherEngine(spark, g, reg)
    got = {
        r.nodeId: r.s
        for r in e.cypher(
            "CALL gds.pageRank.stream('E', {maxIterations: 10, "
            "dampingFactor: 0.85}) YIELD nodeId, score "
            "RETURN nodeId, round(score, 6) AS s"
        ).collect()
    }
    assert all(isinstance(k, int) for k in got)  # native ids
    # python power method with dangling-mass redistribution
    n = 4
    out = {0: [1], 1: [2], 2: [0], 3: [2]}
    rank = np.full(n, 1.0 / n)
    for _ in range(10):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            if out[u]:
                share = rank[u] / len(out[u])
                for v in out[u]:
                    nxt[v] += share
            else:
                dangling += rank[u]
        nxt += dangling / n
        rank = (1 - 0.85) / n + 0.85 * nxt
    want = {i: round(float(rank[i]), 6) for i in range(n)}
    assert got == want


def test_lpa_and_composition(eng):
    comm = eng.cypher(
        "CALL gds.labelPropagation.stream('IN_REGION', "
        "{maxIterations: 10}) YIELD nodeId, communityId "
        "RETURN count(DISTINCT communityId) AS c"
    ).collect()[0].c
    assert comm >= 1
    # YIELD ... WHERE + downstream MATCH join-back via the qualified id
    n = eng.cypher(
        "CALL gds.pageRank.stream('PLACED') YIELD nodeId, score "
        "WHERE score > 0 "
        "MATCH (c:Customer) "
        "WHERE nodeId = 'Customer:' + toString(id(c)) "
        "RETURN count(*) AS n"
    ).collect()[0].n
    assert n > 0


def test_multi_verb_union(eng, duck):
    """'A|B' unions the edge sets: PLACED|CONTAINS chains customers ->
    orders -> lineitems into per-customer components."""
    comps = eng.cypher(
        "CALL gds.wcc.stream('PLACED|CONTAINS') "
        "YIELD nodeId, componentId "
        "RETURN count(DISTINCT componentId) AS c"
    ).collect()[0].c
    want = duck.sql(
        "SELECT count(DISTINCT c_custkey) FROM customer "
        "WHERE c_custkey IN (SELECT o_custkey FROM orders)"
    ).fetchone()[0]
    assert comps == want


def test_gds_errors(eng):
    with pytest.raises(TranspilerBindingError, match="no relationship"):
        eng.cypher("CALL gds.pageRank.stream('NOPE')")
    with pytest.raises(TranspilerBindingError, match="unknown config"):
        eng.cypher("CALL gds.wcc.stream('PLACED', {bogus: 1})")
    with pytest.raises(TranspilerBindingError, match="dampingFactor"):
        eng.cypher(
            "CALL gds.pageRank.stream('PLACED', {dampingFactor: 2.0})"
        )
    with pytest.raises(TranspilerNotSupportedError, match="yields"):
        eng.cypher(
            "CALL gds.wcc.stream('PLACED') YIELD nodeId, score "
            "RETURN count(*) AS n"
        )


def test_gds_result_cached_by_epoch(eng):
    eng.clear_caches()
    q = (
        "CALL gds.pageRank.stream('IN_REGION') YIELD nodeId, score "
        "RETURN count(*) AS n"
    )
    a = eng.cypher(q).collect()[0].n
    assert a > 0
    keys = [k for k in eng._winner_cache if "gds" in k]
    assert len(keys) == 1
    b = eng.cypher(q).collect()[0].n
    assert b == a
    assert len([k for k in eng._winner_cache if "gds" in k]) == 1
    eng.clear_caches()


def test_dijkstra_stream_weighted_and_unweighted(spark):
    from opencyphertranspiler_spark import EntityProperty

    reg = TableRegistry()
    reg.register_df(
        "tn", arrow_df(spark, [(i,) for i in range(5)], "id long")
    )
    #      0 -1.0-> 1 -1.0-> 2
    #      0 -5.0-> 2        2 -2.0-> 3      4 unreachable
    pairs = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 2.0)]
    reg.register_df(
        "te",
        arrow_df(spark, pairs, "src long, dst long, w double"),
    )
    g = GraphSchema(
        [NodeSchema("N", "tn", "id", (), "bigint")],
        [
            EdgeSchema(
                "E", "N", "N", "te", "src", "dst",
                (EntityProperty("w", "double"),),
            )
        ],
    )
    e = CypherEngine(spark, g, reg)
    got = {
        r.nodeId: r.d
        for r in e.cypher(
            "CALL gds.allShortestPaths.dijkstra.stream('E', "
            "{sourceId: 0, weightProperty: 'w'}) YIELD nodeId, distance "
            "RETURN nodeId, distance AS d"
        ).collect()
    }
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 4.0}  # 4 unreachable
    hops = {
        r.nodeId: r.d
        for r in e.cypher(
            "CALL gds.allShortestPaths.dijkstra.stream('E', "
            "{sourceId: 0}) YIELD nodeId, distance "
            "RETURN nodeId, distance AS d"
        ).collect()
    }
    assert hops == {0: 0.0, 1: 1.0, 2: 1.0, 3: 2.0}
    with pytest.raises(TranspilerBindingError, match="sourceId"):
        e.cypher("CALL gds.allShortestPaths.dijkstra.stream('E')")
    with pytest.raises(TranspilerBindingError, match="no property"):
        e.cypher(
            "CALL gds.allShortestPaths.dijkstra.stream('E', "
            "{sourceId: 0, weightProperty: 'nope'})"
        )
    # round 14 (ADVICE r13): a sourceId that is not a node raises
    # instead of silently streaming zero rows (Neo4j GDS parity)
    with pytest.raises(TranspilerBindingError, match="not an endpoint"):
        e.cypher(
            "CALL gds.allShortestPaths.dijkstra.stream('E', "
            "{sourceId: 424242})"
        )


def test_dijkstra_bad_source_hints_label_form(eng):
    """On a multi-label edge set the error points at the 'Label:id'
    qualified form (a raw id never matches the qualified universe)."""
    with pytest.raises(TranspilerBindingError, match="Label:id"):
        eng.cypher(
            "CALL gds.allShortestPaths.dijkstra.stream('IN_REGION', "
            "{sourceId: 0})"
        )
    # the qualified form works
    rows = eng.cypher(
        "CALL gds.allShortestPaths.dijkstra.stream('IN_REGION', "
        "{sourceId: 'Nation:0'}) YIELD nodeId, distance "
        "RETURN nodeId, distance AS d"
    ).collect()
    assert {r.nodeId for r in rows} == {"Nation:0", "Region:0"}


def test_degree_stream_vs_duckdb(eng, duck):
    got = sorted(
        (r.nodeId, r.d)
        for r in eng.cypher(
            "CALL gds.degree.stream('PLACED') YIELD nodeId, score "
            "RETURN nodeId, score AS d"
        ).collect()
        if r.nodeId.startswith("Customer:")
    )
    want = sorted(
        (f"Customer:{k}", float(n))
        for k, n in duck.sql(
            "SELECT o_custkey, count(*) FROM orders GROUP BY 1"
        ).fetchall()
    )
    assert got == want and got
    # UNDIRECTED doubles nothing here but counts both endpoints' views
    und = {
        r.nodeId: r.d
        for r in eng.cypher(
            "CALL gds.degree.stream('PLACED', "
            "{orientation: 'UNDIRECTED'}) YIELD nodeId, score "
            "RETURN nodeId, score AS d"
        ).collect()
    }
    for k, d in got:
        assert und[k] == d  # customer side unchanged under symmetrize


def test_kcore_and_betweenness_hand_graph(spark):
    reg = TableRegistry()
    reg.register_df(
        "tn", arrow_df(spark, [(i,) for i in range(5)], "id long")
    )
    # triangle 0-1-2 plus tail 2-3, path continues 3-4
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    reg.register_df(
        "te", arrow_df(spark, pairs, "src long, dst long")
    )
    g = GraphSchema(
        [NodeSchema("N", "tn", "id", (), "bigint")],
        [EdgeSchema("E", "N", "N", "te", "src", "dst")],
    )
    e = CypherEngine(spark, g, reg)
    cores = {
        r.nodeId: r.c
        for r in e.cypher(
            "CALL gds.kCore.stream('E') YIELD nodeId, coreValue "
            "RETURN nodeId, coreValue AS c"
        ).collect()
    }
    assert cores == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}
    # directed betweenness with an exhaustive source sample is exact:
    # paths 0->1->2->3->4 etc. via the triangle's direction
    bt = {
        r.nodeId: r.s
        for r in e.cypher(
            "CALL gds.betweenness.stream('E', {samplingSize: 5}) "
            "YIELD nodeId, score RETURN nodeId, score AS s"
        ).collect()
    }
    # hand-derived Brandes (directed, endpoints excluded). All-pairs
    # shortest paths: from 0: ->1,->2,->3,->4; from 1: ->2,->0(via 2),
    # ->3,->4; from 2: ->0,->1(via 0),->3,->4; from 3: ->4.
    # interior counts: node 0 carries 2->1 (1); node 1 carries
    # 0->2,0->3,0->4 (3); node 2 carries 0->3,0->4,1->0,1->3,1->4 (5);
    # node 3 carries 0->4,1->4,2->4 (3); node 4 none.
    assert bt == {0: 1.0, 1: 3.0, 2: 5.0, 3: 3.0, 4: 0.0} or bt == {
        0: 1.0, 1: 3.0, 2: 5.0, 3: 3.0
    }


def test_triangle_count_stream(spark):
    """Per-node triangle participation on a hand graph vs a brute-force
    python oracle; sum == 3 * global triangle count; zero-triangle
    nodes appear with 0."""
    from itertools import combinations

    reg = TableRegistry()
    reg.register_df(
        "tn", arrow_df(spark, [(i,) for i in range(6)], "id long")
    )
    # two triangles sharing node 2: (0,1,2) and (2,3,4); plus a
    # pendant 4-5 edge
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (4, 5)]
    reg.register_df(
        "te", arrow_df(spark, pairs, "src long, dst long")
    )
    g = GraphSchema(
        [NodeSchema("N", "tn", "id", (), "bigint")],
        [EdgeSchema("E", "N", "N", "te", "src", "dst")],
    )
    e = CypherEngine(spark, g, reg)
    got = {
        r.nodeId: r.t
        for r in e.cypher(
            "CALL gds.triangleCount.stream('E') "
            "YIELD nodeId, triangleCount RETURN nodeId, triangleCount AS t"
        ).collect()
    }
    und = {frozenset(p) for p in pairs}
    nodes = sorted({x for p in pairs for x in p})
    want = {n: 0 for n in nodes}
    ntri = 0
    for a, b, c in combinations(nodes, 3):
        if (
            frozenset((a, b)) in und
            and frozenset((b, c)) in und
            and frozenset((a, c)) in und
        ):
            ntri += 1
            for x in (a, b, c):
                want[x] += 1
    assert got == want and ntri == 2
    assert sum(got.values()) == 3 * ntri
    # pipeline parity: the global count agrees
    from opencyphertranspiler_spark.pipeline.graph import triangle_count

    tot = triangle_count(e.tables.get("te")).collect()[0].n_triangles
    assert tot == ntri


def test_node_similarity_stream(spark):
    """Jaccard of out-neighbor sets vs a brute-force oracle; topK and
    similarityCutoff compose; pairs come from the shared-neighbor join
    (nodes with disjoint neighborhoods never pair)."""
    reg = TableRegistry()
    reg.register_df(
        "tn", arrow_df(spark, [(i,) for i in range(7)], "id long")
    )
    # "users" 0,1,2 -> "items" 4,5,6 (bipartite-ish); 3 shares nothing
    pairs = [
        (0, 4), (0, 5),
        (1, 4), (1, 5), (1, 6),
        (2, 6),
        (3, 3),  # self-loop-ish isolated taste
    ]
    reg.register_df(
        "te", arrow_df(spark, pairs, "src long, dst long")
    )
    g = GraphSchema(
        [NodeSchema("N", "tn", "id", (), "bigint")],
        [EdgeSchema("E", "N", "N", "te", "src", "dst")],
    )
    e = CypherEngine(spark, g, reg)
    got = sorted(
        (r.a, r.b, r.s)
        for r in e.cypher(
            "CALL gds.nodeSimilarity.stream('E') "
            "YIELD node1, node2, similarity "
            "RETURN node1 AS a, node2 AS b, round(similarity, 6) AS s"
        ).collect()
    )
    # brute-force oracle
    from collections import defaultdict

    nb = defaultdict(set)
    for s, d in pairs:
        nb[s].add(d)
    want = []
    for a in nb:
        for b in nb:
            if a == b:
                continue
            inter = len(nb[a] & nb[b])
            if inter == 0:
                continue
            sim = inter / len(nb[a] | nb[b])
            want.append((a, b, round(sim, 6)))
    assert got == sorted(want) and got
    # topK=1 keeps each node's single best partner
    top1 = e.cypher(
        "CALL gds.nodeSimilarity.stream('E', {topK: 1}) "
        "YIELD node1, node2, similarity "
        "RETURN node1 AS a, count(*) AS n"
    ).collect()
    assert all(r.n == 1 for r in top1)
    # cutoff drops weak pairs
    strong = e.cypher(
        "CALL gds.nodeSimilarity.stream('E', {similarityCutoff: 0.6}) "
        "YIELD node1, node2, similarity RETURN count(*) AS n"
    ).collect()[0].n
    assert strong == len([1 for _, _, s in want if s >= 0.6])


def _weighted_graph(spark):
    from opencyphertranspiler_spark import EntityProperty

    reg = TableRegistry()
    reg.register_df(
        "tn", arrow_df(spark, [(i,) for i in range(6)], "id long")
    )
    # two weighted triangles bridged by a light edge
    wpairs = [
        (0, 1, 3.0), (1, 2, 1.0), (0, 2, 1.0),
        (3, 4, 2.0), (4, 5, 2.0), (3, 5, 2.0),
        (2, 3, 0.5),
    ]
    reg.register_df(
        "te",
        arrow_df(spark, wpairs, "src long, dst long, w double"),
    )
    g = GraphSchema(
        [NodeSchema("N", "tn", "id", (), "bigint")],
        [
            EdgeSchema(
                "E", "N", "N", "te", "src", "dst",
                (EntityProperty("w", "double"),),
            )
        ],
    )
    return CypherEngine(spark, g, reg), wpairs


def test_weighted_pagerank_exact_oracle(spark):
    """Round 14 (VERDICT r13 #1): relationshipWeightProperty splits
    rank proportionally to edge weight — exact python power-method
    oracle with weighted mass split and dangling redistribution."""
    import numpy as np

    e, wpairs = _weighted_graph(spark)
    got = {
        r.nodeId: r.s
        for r in e.cypher(
            "CALL gds.pageRank.stream('E', {maxIterations: 8, "
            "relationshipWeightProperty: 'w'}) YIELD nodeId, score "
            "RETURN nodeId, round(score, 6) AS s"
        ).collect()
    }
    n = 6
    W = np.zeros((n, n))
    for s, d, w in wpairs:
        W[s][d] += w
    outw = W.sum(axis=1)
    rank = np.full(n, 1.0 / n)
    for _ in range(8):
        nxt = np.zeros(n)
        dangling = rank[outw == 0].sum()
        for u in range(n):
            if outw[u] > 0:
                nxt += rank[u] * W[u] / outw[u]
        nxt += dangling / n
        rank = (1 - 0.85) / n + 0.85 * nxt
    want = {i: round(float(rank[i]), 6) for i in range(n)}
    assert got == want
    # unweighted on the same graph differs (weights genuinely used)
    unw = {
        r.nodeId: r.s
        for r in e.cypher(
            "CALL gds.pageRank.stream('E', {maxIterations: 8}) "
            "YIELD nodeId, score RETURN nodeId, round(score, 6) AS s"
        ).collect()
    }
    assert unw != got


def test_weighted_degree_stream(spark):
    e, wpairs = _weighted_graph(spark)
    got = {
        r.nodeId: r.s
        for r in e.cypher(
            "CALL gds.degree.stream('E', {orientation: 'UNDIRECTED', "
            "relationshipWeightProperty: 'w'}) YIELD nodeId, score "
            "RETURN nodeId, score AS s"
        ).collect()
    }
    want = {i: 0.0 for i in range(6)}
    for s, d, w in wpairs:
        want[s] += w
        want[d] += w
    assert got == want
    nat = {
        r.nodeId: r.s
        for r in e.cypher(
            "CALL gds.degree.stream('E', "
            "{relationshipWeightProperty: 'w'}) YIELD nodeId, score "
            "RETURN nodeId, score AS s"
        ).collect()
    }
    out_want = {i: 0.0 for i in range(6)}
    for s, d, w in wpairs:
        out_want[s] += w
    assert nat == out_want


def test_louvain_planted_split_and_modularity(spark):
    """Round 14 (VERDICT r13 #2): Louvain finds the planted
    two-community split, the accepted modularity sequence is
    non-decreasing, the final Q is the known optimum for the barbell,
    and the result is deterministic across input partitionings."""
    from opencyphertranspiler_spark.pipeline import graph as G

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    el = arrow_df(spark, edges, "src long, dst long")
    trace = []
    res = {
        r.node: r.community
        for r in G.louvain(el, _trace=trace).collect()
    }
    assert res == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    assert all(b >= a - 1e-12 for a, b in zip(trace, trace[1:])), trace
    assert abs(trace[-1] - 5.0 / 14.0) < 1e-9  # known optimum Q
    # determinism across partitionings
    for parts in (1, 7):
        res2 = {
            r.node: r.community
            for r in G.louvain(el.repartition(parts)).collect()
        }
        assert res2 == res


def test_louvain_stream_weighted_and_config(spark):
    e, _ = _weighted_graph(spark)
    for cfg in ("", ", {relationshipWeightProperty: 'w'}"):
        lv = {
            r.nodeId: r.communityId
            for r in e.cypher(
                f"CALL gds.louvain.stream('E'{cfg}) "
                "YIELD nodeId, communityId RETURN nodeId, communityId"
            ).collect()
        }
        assert lv == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    with pytest.raises(TranspilerBindingError, match="maxLevels"):
        e.cypher("CALL gds.louvain.stream('E', {maxLevels: 0})")
    with pytest.raises(TranspilerBindingError, match="tolerance"):
        e.cypher("CALL gds.louvain.stream('E', {tolerance: -1})")
    with pytest.raises(TranspilerBindingError, match="unknown config"):
        e.cypher(
            "CALL gds.wcc.stream('E', "
            "{relationshipWeightProperty: 'w'})"
        )
    with pytest.raises(TranspilerBindingError, match="no property"):
        e.cypher(
            "CALL gds.pageRank.stream('E', "
            "{relationshipWeightProperty: 'nope'})"
        )


def test_louvain_on_tpch_matches_wcc_grouping(eng):
    """On the region-nation star graph communities are exactly the
    connected components (stars have no denser substructure to split):
    5 communities of 6 members each, labeled by smallest member id."""
    rows = eng.cypher(
        "CALL gds.louvain.stream('IN_REGION') YIELD nodeId, communityId "
        "RETURN communityId, count(*) AS n"
    ).collect()
    got = sorted((r.communityId, r.n) for r in rows)
    wcc = sorted(
        (r.componentId, r.n)
        for r in eng.cypher(
            "CALL gds.wcc.stream('IN_REGION') YIELD nodeId, componentId "
            "RETURN componentId, count(*) AS n"
        ).collect()
    )
    assert got == wcc and len(got) == 5


def test_weighted_node_similarity_oracle(spark):
    """Round 14: relationshipWeightProperty on nodeSimilarity.stream —
    weighted Jaccard sum(min)/sum(max) over neighbor weight vectors,
    against a brute-force python oracle on a hand graph."""
    from opencyphertranspiler_spark import EntityProperty

    reg = TableRegistry()
    reg.register_df(
        "tn", arrow_df(spark, [(i,) for i in range(6)], "id long")
    )
    wpairs = [
        (0, 3, 2.0), (0, 4, 1.0),
        (1, 3, 1.0), (1, 4, 3.0), (1, 5, 1.0),
        (2, 5, 4.0),
    ]
    reg.register_df(
        "te",
        arrow_df(spark, wpairs, "src long, dst long, w double"),
    )
    g = GraphSchema(
        [NodeSchema("N", "tn", "id", (), "bigint")],
        [
            EdgeSchema(
                "E", "N", "N", "te", "src", "dst",
                (EntityProperty("w", "double"),),
            )
        ],
    )
    e = CypherEngine(spark, g, reg)
    got = {
        (r.node1, r.node2): round(r.s, 9)
        for r in e.cypher(
            "CALL gds.nodeSimilarity.stream('E', "
            "{relationshipWeightProperty: 'w'}) "
            "YIELD node1, node2, similarity "
            "RETURN node1, node2, similarity AS s"
        ).collect()
    }
    # brute-force weighted jaccard
    adj: dict = {}
    for s, d, w in wpairs:
        adj.setdefault(s, {})[d] = adj.setdefault(s, {}).get(d, 0) + w
    want = {}
    for x in adj:
        for y in adj:
            if x == y or not set(adj[x]) & set(adj[y]):
                continue
            keys = set(adj[x]) | set(adj[y])
            smin = sum(min(adj[x].get(k, 0.0), adj[y].get(k, 0.0)) for k in keys)
            smax = sum(max(adj[x].get(k, 0.0), adj[y].get(k, 0.0)) for k in keys)
            want[(x, y)] = round(smin / smax, 9)
    assert got == want and got
    # unweighted on the same graph differs (weights genuinely used)
    unw = {
        (r.node1, r.node2): round(r.s, 9)
        for r in e.cypher(
            "CALL gds.nodeSimilarity.stream('E') "
            "YIELD node1, node2, similarity "
            "RETURN node1, node2, similarity AS s"
        ).collect()
    }
    assert unw != got
    # config fence unchanged for procs without the key
    with pytest.raises(TranspilerBindingError, match="unknown config"):
        e.cypher(
            "CALL gds.triangleCount.stream('E') YIELD nodeId, "
            "triangleCount RETURN count(*) AS n".replace(
                "('E')", "('E', {relationshipWeightProperty: 'w'})"
            )
        )
