"""Physical-plan regression tests: the properties that make the engine hold
up at 100 TB (scan fusion, predicate pushdown, column pruning, broadcast
dimension joins) asserted against Catalyst's formatted plan output."""

from __future__ import annotations

import re


def formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_multi_hop_scans_each_table_once(spark, engine):
    df = engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)-[:CONTAINS]->(l:Lineitem)
              -[:OF_PART]->(p:Part)
        WHERE p.p_size < 10
        RETURN p.p_brand AS brand, count(l) AS n
        """
    )
    plan = formatted_plan(spark, df)
    # edge-node fusion: lineitem backs l + CONTAINS + OF_PART -> ONE scan
    # (round 9: the Lineitem node scan reads the materialized
    # lineitem_node_<fingerprint> derived parquet, not lineitem.parquet)
    assert len(re.findall(r"Location:.*lineitem", plan)) == 1
    assert plan.count("orders.parquet") == 1
    assert plan.count("Location: InMemoryFileIndex") == 4


def test_filter_pushed_to_parquet_scan(spark, engine):
    df = engine.cypher(
        "MATCH (p:Part) WHERE p.p_size < 10 RETURN p.p_brand AS brand, count(*) AS n"
    )
    plan = formatted_plan(spark, df)
    assert "LessThan(p_size,10)" in plan, "filter must reach PushedFilters"


def test_column_pruning_reaches_read_schema(spark, engine):
    df = engine.cypher("MATCH (c:Customer) RETURN c.c_name AS name")
    plan = formatted_plan(spark, df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"c_name"}, f"scan should read only c_name, got {cols}"


def test_map_projection_scan_pruning(spark, engine):
    # `c {.c_name}` builds a struct from ONE property: the scan must read
    # only that column plus the null-check surrogate key — Catalyst's
    # ColumnPruning must see through the struct construction
    df = engine.cypher("MATCH (c:Customer) RETURN c {.c_name} AS m")
    plan = formatted_plan(spark, df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"c_custkey", "c_name"}, cols
    assert "c_acctbal" not in plan and "c_mktsegment" not in plan


def test_zero_length_variant_is_equi_join(spark):
    # the *0..m zero-length variant is built as a disjoint node part +
    # id-equality conjunct; Catalyst MUST rewrite the cross join +
    # equality into an equi-join — a CartesianProduct here would explode
    # at scale
    from opencyphertranspiler_spark.catalog import _next_order_engine

    from .conftest import SF_DIR

    eng = _next_order_engine(spark, SF_DIR)
    df = eng.cypher(
        "MATCH (a:Orders)-[:NEXT*0..1]->(b:Orders) "
        "RETURN a.o_orderkey AS x, b.o_orderkey AS y"
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_projection_only_props_are_pruned(spark, engine):
    # c_acctbal / c_mktsegment are never referenced -> must not be read
    df = engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        RETURN c.c_name AS name, count(o) AS n
        """
    )
    plan = formatted_plan(spark, df)
    assert "c_acctbal" not in plan
    assert "c_mktsegment" not in plan


def test_dimension_join_is_broadcast(spark, engine):
    df = engine.cypher(
        """
        MATCH (n:Nation)<-[:FROM_NATION]-(c:Customer)
        RETURN n.n_name AS nation, count(c) AS customers
        """
    )
    plan = formatted_plan(spark, df)
    assert "BroadcastHashJoin" in plan, "nation-sized dims must broadcast"


def test_bucketed_tables_join_without_shuffle(spark, engine):
    """Same-bucketed tables sort-merge join with no Exchange — the
    co-located-join strategy for repeatedly-joined big tables."""
    from opencyphertranspiler_spark.sources.files import write_bucketed_table

    from .conftest import SF_DIR

    import shutil

    for t in ["b_customer", "b_orders"]:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    write_bucketed_table(cust, "b_customer", "c_custkey", 8, sort_by="c_custkey")
    write_bucketed_table(orders, "b_orders", "c_custkey", 8, sort_by="c_custkey")
    # force the sort-merge path (small test tables would broadcast) to make
    # the bucketing effect observable: no shuffle exchange on either side
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_customer").join(spark.table("b_orders"), "c_custkey")
        joined.collect()
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in executed, executed
        assert "Exchange" not in executed, (
            f"bucketed join still shuffles:\n{executed}"
        )
        assert (
            joined.count()
            == spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_whole_stage_codegen_covers_expressions(spark, engine):
    df = engine.cypher(
        """
        MATCH (l:Lineitem)
        WHERE l.l_returnflag IN ['A', 'R']
        RETURN l.l_linenumber % 2 AS parity,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
        """
    )
    df.collect()  # finalize this DataFrame's own AQE plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    # whole-stage-codegen'd operators carry the *(N) marker
    assert "*(" in executed, "expressions fell out of whole-stage codegen"
    plan = formatted_plan(spark, df)
    assert "In(l_returnflag, [A,R])" in plan, "IN filter must push to the scan"


def test_cosine_topk_prereduces_before_global_window(spark):
    """The scored (corpus x queries) relation must NOT be globally sorted
    into n_queries partitions: phase 1 windows over (query_id, partition),
    so only k rows per (query, partition) reach the per-query window."""
    from opencyphertranspiler_spark.pipeline.similarity import cosine_topk

    embs = spark.read.parquet(
        __import__("tests.conftest", fromlist=["SF_DIR"]).SF_DIR
        + "/embeddings.parquet"
    )
    df = cosine_topk(embs, embs.filter("vec_id < 5"), k=5)
    plan = formatted_plan(spark, df)
    # two ranking phases...
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan
    # ...the inner one partitioned by BOTH query_id and the physical
    # partition id -> never a handful of giant sort tasks
    assert re.search(r"hashpartitioning\(query_id#\d+L?, __part#\d+", plan), plan


def test_exists_compiles_to_semi_join(spark, engine):
    df = engine.cypher(
        """
        MATCH (o:Orders)
        WHERE NOT exists((o)-[:CONTAINS]->(:Lineitem))
        RETURN count(*) AS n
        """
    )
    plan = formatted_plan(spark, df)
    assert "LeftAnti" in plan, plan
    df2 = engine.cypher(
        """
        MATCH (c:Customer)
        WHERE exists((c)-[:PLACED]->(:Orders))
        RETURN count(*) AS n
        """
    )
    assert "LeftSemi" in formatted_plan(spark, df2)


def test_multi_rel_type_union_keeps_pushdown(spark, engine):
    # [:A|B] union edge: the customer filter must still reach the
    # customer scan, and the priority split must reach the orders scans
    # (the union edge is two filtered orders scans, each with its
    # isin-pushdown)
    df = engine.cypher(
        """
        MATCH (c:Customer {c_mktsegment: 'MACHINERY'})
              -[r:PLACED_URGENT|PLACED_NORMAL]->(o:Orders)
        RETURN type(r) AS t, count(*) AS n
        """
    )
    plan = formatted_plan(spark, df)
    assert "EqualTo(c_mktsegment,MACHINERY)" in plan
    assert "In(o_orderpriority" in plan, "priority split must push down"


def test_exists_conjunct_stays_semi_join(spark, engine):
    df = engine.cypher(
        "MATCH (c:Customer) WHERE exists((c)-[:PLACED]->(:Orders)) "
        "RETURN count(*) AS n"
    )
    plan = formatted_plan(spark, df)
    assert "LeftSemi" in plan, "top-level exists must stay a semi join"


def test_exists_flag_under_or_is_single_left_join(spark, engine):
    # boolean-position exists: one left outer join against a
    # de-duplicated key set; no cartesian product
    df = engine.cypher(
        """
        MATCH (c:Customer)
        WHERE c.c_acctbal > 9000 OR exists((c)-[:PLACED]->(:Orders))
        RETURN count(*) AS n
        """
    )
    plan = formatted_plan(spark, df)
    assert "Cartesian" not in plan
    assert "LeftOuter" in plan
    assert "HashAggregate" in plan  # the distinct on pattern keys


def test_pattern_comprehension_aggregates_before_join(spark, engine):
    # the comprehension must group the pattern fabric per key and LEFT
    # join ONE array row per key — no cartesian, no row explosion
    df = engine.cypher(
        """
        MATCH (c:Customer)
        RETURN c.c_custkey AS k,
               [(c)-[:PLACED]->(o:Orders) | o.o_orderkey] AS orders
        """
    )
    plan = formatted_plan(spark, df)
    assert "Cartesian" not in plan
    assert "LeftOuter" in plan
    assert "collect_list" in plan
    # row count stays the customer count (one array per customer)
    n_customers = engine.cypher(
        "MATCH (c:Customer) RETURN count(*) AS n"
    ).collect()[0].n
    assert df.count() == n_customers


def test_temporal_literal_filter_pushed_to_scan(spark, engine):
    # datetime('...') on a literal constant-folds, so temporal range
    # predicates reach the parquet scan as min/max-prunable pushed filters
    df = engine.cypher(
        """
        MATCH (o:Orders)
        WHERE o.o_orderdate >= datetime('1995-01-01T00:00:00')
          AND o.o_orderdate < datetime('1996-01-01')
        RETURN o.o_orderdate.year AS yr, count(*) AS n
        """
    )
    plan = formatted_plan(spark, df)
    assert "GreaterThanOrEqual(o_orderdate,1995-01-01" in plan
    assert "LessThan(o_orderdate,1996-01-01" in plan


def test_count_subquery_lowers_to_aggregate_before_join(spark, engine):
    # COUNT { } compiles to the pattern-comprehension path: the pattern
    # side aggregates per key BEFORE the left join back (no row explosion)
    df = engine.cypher(
        """
        MATCH (c:Customer)
        WHERE COUNT { (c)-[:PLACED]->(:Orders) } > 8
        RETURN c.c_name AS name
        """
    )
    plan = formatted_plan(spark, df)
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("SortMergeJoin")
    if join_pos == -1:
        join_pos = plan.find("BroadcastHashJoin")
    assert agg_pos != -1 and join_pos != -1


def test_call_per_row_limit_avoids_global_sort(spark, engine):
    # the per-outer-row LIMIT is a hash-partitioned row_number window —
    # no rangepartitioning exchange (a global ORDER BY would add one)
    df = engine.cypher(
        """
        MATCH (c:Customer)
        CALL { WITH c MATCH (c)-[:PLACED]->(o:Orders)
               RETURN o.o_orderkey AS latest
               ORDER BY o.o_orderdate DESC LIMIT 1 }
        RETURN c.c_custkey AS k, latest
        """
    )
    plan = formatted_plan(spark, df)
    assert "Window" in plan
    assert "rangepartitioning" not in plan


def test_ngram_overlap_broadcasts_benchmark_grams(spark):
    # the benchmark gram set must be broadcast so the corpus is never
    # shuffled by n-gram (the property that holds at 100 TB corpus scale)
    from opencyphertranspiler_spark.pipeline.text import ngram_overlap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter("doc_id % 10 = 0")
    plan = formatted_plan(spark, ngram_overlap(docs, bench, n=5))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # and the semi-join side is a semi join, not an inner materialization
    assert "LeftSemi" in plan


def test_triangle_count_has_no_nested_loop_join(spark):
    # every join in the triangle plan must be an equi-join — an OR-closing
    # predicate would silently fall back to BroadcastNestedLoopJoin and
    # blow up quadratically at scale
    from opencyphertranspiler_spark.pipeline.graph import triangle_count

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    plan = formatted_plan(spark, triangle_count(e))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_token_offsets_has_no_global_sort_window(spark):
    """The prefix sum must never compile to a single-partition global
    Window (Window.orderBy with no partitionBy prints 'Window ... ORDER BY
    ... [partition spec empty]' and executes as ONE task). The bucketed
    implementation windows WITHIN __bkt partitions only."""
    from pyspark.sql import functions as F

    from opencyphertranspiler_spark.pipeline.packing import token_offsets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ts = docs.select("doc_id", F.length("text").cast("long").alias("n_tokens"))
    df = token_offsets(ts, num_buckets=8)
    plan = formatted_plan(spark, df)
    # every Window node must carry a partition spec (our bucket column)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "__bkt" in m.group(1), plan
    assert "windowspecdefinition" in plan


def test_semantic_dedup_candidates_join_on_cell(spark):
    """Intra-cell pairing must be an equi-join on the cell id (candidate
    count ~ sum of squared cell sizes), never a cartesian product."""
    from opencyphertranspiler_spark.pipeline.similarity import semantic_dedup

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = semantic_dedup(embs, threshold=0.4, n_cells=8, train_iters=0)
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "cell" in plan


def test_write_set_is_single_join_update(spark):
    """SET compiles to exactly one join of the target table against the
    grouped update set — no per-row machinery, no extra shuffles of the
    base table beyond that join."""
    from opencyphertranspiler_spark.catalog import get_engine

    eng = get_engine(spark, "/root/testdata/sf0.001")
    res = eng.cypher_write(
        "MATCH (c:Customer) WHERE c.c_acctbal < 0 SET c.c_mktsegment = 'NEG'"
    )
    plan = formatted_plan(spark, res.table("customer"))
    # the customer parquet is scanned twice (base + update source) and
    # joined once; the filter reaches the update-side scan
    assert plan.count("Location: InMemoryFileIndex") == 2
    assert "LessThan(c_acctbal,0" in plan or "LessThan(c_acctbal, 0" in plan
    n_joins = len(
        re.findall(r"\(\d+\) (?:BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    )
    assert n_joins == 1, plan


def test_duplicate_spans_no_cartesian_and_codegen_windows(spark):
    """The gram explode must be codegen (no Python UDF) and the rollup
    must never produce a cartesian product."""
    from opencyphertranspiler_spark.pipeline.dedup import duplicate_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = formatted_plan(spark, duplicate_spans(docs, window=10))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lm_score_broadcasts_model(spark):
    """The scoring join ships the (small) model to the corpus — the corpus
    must never shuffle for the join."""
    from opencyphertranspiler_spark.pipeline.text import lm_score, train_char_lm

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_char_lm(docs)
    plan = formatted_plan(spark, lm_score(docs, model))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_entity_projection_plan_quality(spark, engine):
    # RETURN c (round 6 entity projection): the WHERE still reaches
    # PushedFilters, the struct is built AFTER the aggregation (one
    # exchange for the implicit grouping; the struct itself adds none),
    # and the scan reads only the entity's declared columns
    df = engine.cypher(
        """
        MATCH (c:Customer)-[:PLACED]->(o:Orders)
        WHERE c.c_acctbal < -900
        WITH c, count(o) AS n_orders
        RETURN c, n_orders
        """
    )
    plan = formatted_plan(spark, df)
    assert "LessThan(c_acctbal,-900" in plan, "filter must reach the scan"
    # grouping happens on entity KEY columns, not on the struct: exactly
    # one aggregate exchange (+ AQE coalesce markers don't add Exchanges)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"expected <=2 hash exchanges, got {n_exchanges}"
    # no props outside the declared graph overlay leak into the scan
    assert "c_comment" not in plan and "c_phone" not in plan


def test_p09_bench_path_has_no_nested_loop_pairs_join(spark):
    # round 7: the benched p09 pairs half is the LSH-self-bucketed
    # near-dup operator — its candidate join must be an equi-join on
    # (table, bucket); the exhaustive cosine_pairs
    # BroadcastNestedLoopJoin stays a sf0.01 gate oracle only, never in
    # the timed path. (The topk half legitimately keeps ONE BNLJ: a
    # bounded broadcast query set against the corpus on `!=` is linear
    # in the corpus, the right brute-force plan.)
    from opencyphertranspiler_spark.catalog import CATALOG, run_entry
    from opencyphertranspiler_spark.pipeline.similarity import cosine_near_dup_pairs

    e = next(x for x in CATALOG if x.name == "p09_cosine_topk")
    assert e.bench_fn is not None
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs_plan = formatted_plan(spark, cosine_near_dup_pairs(embs, threshold=0.95))
    assert "NestedLoop" not in pairs_plan
    assert "CartesianProduct" not in pairs_plan
    assert "BroadcastHashJoin" in pairs_plan or "SortMergeJoin" in pairs_plan
    # and the full bench entry carries exactly the topk broadcast BNLJ,
    # no second one from the pairs half
    full = formatted_plan(spark, run_entry(e, spark, "/root/testdata/sf0.001", bench=True))
    # formatted mode prints each node twice (tree line + detail header);
    # count distinct physical nodes via the detail headers
    bnlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", full)
    assert len(bnlj_nodes) <= 1, full
    assert "CartesianProduct" not in full


def test_pair_joins_fold_norms_once_per_side(spark):
    # the norm fold must be computed in a projection BEFORE the pair
    # join (once per vector), not inline per pair: the join condition /
    # post-join project must not contain a norm-shaped self-fold
    # (aggregate over a single array with x*x) — only the dot fold
    from opencyphertranspiler_spark.pipeline.similarity import (
        cosine_near_dup_pairs,
        cosine_pairs,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for df in (
        cosine_pairs(embs, threshold=0.4),
        cosine_near_dup_pairs(embs, threshold=0.95),
    ):
        plan = formatted_plan(spark, df)
        join_on = plan.index("Join")
        post = plan[join_on:]
        # dot fold appears post-join; the squared-self fold must not
        assert "zip_with" in post
        import re as _re

        self_sq = _re.compile(r"aggregate\((?!zip_with)\w+#\d+[^)]*\bx\b[^)]*\* *CAST\(x", _re.S)
        assert not self_sq.search(post), "per-pair norm fold found after join"


def test_explain_plan_golden_dump(engine):
    # round 7 EXPLAIN surface (reference DumpGraph parity,
    # LogicalPlan.cs:88-110): the logical op tree is stable and readable
    got = engine.explain_plan(
        "MATCH (c:Customer)-[:PLACED]->(o:Orders) WHERE c.c_acctbal < 0 "
        "RETURN c.c_mktsegment AS seg, count(o) AS n"
    )
    assert got == (
        "Projection(['seg', 'n'] agg)\n"
        "  Selection(filter)\n"
        "    Join(inner, on=[('__c_c_custkey', '____unnamed_0_o_custkey')])\n"
        "      DataSource(c:Customer)\n"
        "      DataSource(o:Orders, __unnamed_0:PLACED)"
    )


def test_explain_plan_golden_dump_optional_topk(engine):
    got = engine.explain_plan(
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Orders) "
        "WITH c, count(o) AS n WHERE n > 2 "
        "RETURN c.c_name AS name, n ORDER BY n DESC LIMIT 5"
    )
    assert got == (
        "Selection(order=1, skip=None, limit=5)\n"
        "  Projection(['name', 'n'])\n"
        "    Selection(filter)\n"
        "      Projection(['c', 'n'] agg)\n"
        "        Join(left, on=[('__c_c_custkey', '____opt_c_0_c_custkey')])\n"
        "          DataSource(c:Customer)\n"
        "          Join(inner, on=[('____opt_c_0_c_custkey', "
        "'____unnamed_1_o_custkey')])\n"
        "            DataSource(c:Customer)\n"
        "            DataSource(o:Orders, __unnamed_1:PLACED)"
    )


def test_explain_combines_logical_and_physical(engine):
    out = engine.explain("MATCH (c:Customer) RETURN count(*) AS n")
    assert out.startswith("== Cypher Logical Plan ==\n")
    assert "DataSource(c:Customer)" in out
    assert "== Physical Plan ==" in out
    assert "Scan parquet" in out
    # rewrite pipeline runs: a procedure query dumps too
    assert "Unwind" in engine.explain_plan("CALL db.labels()")


def test_label_disjunction_pushdown_through_union(spark, engine):
    # (n:A|B) tagged-union scan: a member-specific predicate must be
    # pushed through the unionByName into THAT member's parquet scan, and
    # the whole fabric must stay equi-join (no cartesian) — the shape
    # that survives 100 TB
    df = engine.cypher(
        """
        MATCH (n:Customer|Supplier)-[:FROM_NATION]->(x:Nation)
        WHERE n.c_acctbal > 5000 OR labels(n)[0] = 'Supplier'
        RETURN x.n_name AS nation, labels(n)[0] AS kind, count(*) AS members
        """
    )
    plan = formatted_plan(spark, df)
    assert "GreaterThan(c_acctbal,5000.0)" in plan, "pushdown through Union"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zero_length_unbounded_no_cartesian(spark, engine):
    # *0..: reachability ∪ identity pairs must stay equi-join end-to-end
    from opencyphertranspiler_spark.catalog import _next_order_engine

    from .conftest import SF_DIR

    eng = _next_order_engine(spark, SF_DIR)
    df = eng.cypher(
        "MATCH (a:Orders)-[:NEXT*0..]->(b:Orders) "
        "RETURN count(*) AS n"
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_row_per_path_expansion_plan_shape(spark):
    """Round 9: row-per-path `p = (a)-[:NEXT12*]->(b)` rewrites to the
    bounded union-of-join-chains expansion — every chain is an equi-join
    (no cartesian / BNLJ), the shape that survives 100 TB. The bound
    discovery itself runs at plan time (<= 8 distinct equi-joins) and
    leaves no trace in the final plan."""
    from opencyphertranspiler_spark.catalog import _next_order_engine

    from .conftest import SF_DIR

    eng = _next_order_engine(spark, SF_DIR)
    df = eng.cypher(
        """
        MATCH p = (a:Orders)-[:NEXT12*]->(b:Orders)
        RETURN a.o_orderkey AS src, b.o_orderkey AS dst, length(p) AS hops
        """
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Union" in plan  # the per-length variant union


def test_ml_varlength_adjacency_plan_no_cartesian(spark):
    # disjunction + bounded var-length composition stays equi-join:
    # virtual union edge hop + ordinary expansion remainder
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df("ta", spark.createDataFrame([("a1",)], "id string"))
    reg.register_df("tb", spark.createDataFrame([("b1",)], "id string"))
    reg.register_df(
        "tc", spark.createDataFrame([("c1",), ("c2",)], "id string")
    )
    reg.register_df(
        "ea", spark.createDataFrame([("a1", "c1")], "src string, dst string")
    )
    reg.register_df(
        "eb", spark.createDataFrame([("b1", "c1")], "src string, dst string")
    )
    reg.register_df(
        "ec", spark.createDataFrame([("c1", "c2")], "src string, dst string")
    )
    g = GraphSchema(
        [
            NodeSchema("A", "ta", "id", ()),
            NodeSchema("B", "tb", "id", ()),
            NodeSchema("C", "tc", "id", ()),
        ],
        [
            EdgeSchema("E", "A", "C", "ea", "src", "dst"),
            EdgeSchema("E", "B", "C", "eb", "src", "dst"),
            EdgeSchema("E", "C", "C", "ec", "src", "dst"),
        ],
    )
    eng = CypherEngine(spark, g, reg)
    df = eng.cypher(
        "MATCH (n:A|B)-[:E*1..2]->(m:C) RETURN n.id AS n, m.id AS m"
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_path_enumeration_plan_shape(spark):
    """Round 10: the relationship-unique enumeration's OUTPUT is a
    materialized (localCheckpoint'ed) row-per-path relation; the final
    query plan is plain equi-joins of nodes against it — no cartesian,
    no BNLJ, and the exponential fixpoint leaves no lineage in the
    per-query plan (it ran once at resolve time, memoized)."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df(
        "n", spark.createDataFrame([("x",), ("y",), ("z",)], "id string")
    )
    reg.register_df(
        "l",
        spark.createDataFrame(
            [("x", "y"), ("y", "z"), ("z", "x")], "src string, dst string"
        ),
    )
    eng = CypherEngine(
        spark,
        GraphSchema(
            [NodeSchema("N", "n", "id", ())],
            [EdgeSchema("L", "N", "N", "l", "src", "dst")],
        ),
        reg,
    )
    df = eng.cypher(
        "MATCH p = (a:N)-[:L*]->(b:N) "
        "RETURN a.id AS a, b.id AS b, length(p) AS l"
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the enumeration result enters as a materialized scan, not a
    # recomputed fixpoint
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_vector_query_nodes_plan_shape(spark):
    """Round 10: CALL db.index.vector.queryNodes desugars the k winners
    into an id-IN filter over the node scan — the per-query plan is a
    filtered scan plus a plan-time CASE column, no join at all. (The
    top-k itself ran once at resolve time as TakeOrderedAndProject.)"""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    from .conftest import SF_DIR

    reg = TableRegistry()
    reg.register(
        "embeddings",
        lambda: spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
    )
    eng = CypherEngine(
        spark,
        GraphSchema(
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
        ),
        reg,
    )
    qv = [1.0] * 64
    df = eng.cypher(
        "CALL db.index.vector.queryNodes('Emb.embedding', 3, $v) "
        "YIELD node, score RETURN node.vec_id AS id, score",
        params={"v": qv},
    )
    plan = formatted_plan(spark, df)
    # round 12 (VERDICT r11 #1): lazy winners — the k-row top-k frame
    # (TakeOrderedAndProject) joins the node scan via a broadcast HASH
    # equi-join (Catalyst folds the disjoint-cross + id equality); never
    # a cartesian or nested-loop, and nothing collects at cypher() time
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_ml_unbounded_adjacency_plan_shape(spark):
    """Round 10: unbounded disjunction adjacency joins the union-node
    scan against the materialized composite-id reachability — equi-joins
    only."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df("ta", spark.createDataFrame([("a1",)], "id string"))
    reg.register_df("tb", spark.createDataFrame([("b1",)], "id string"))
    reg.register_df(
        "tc", spark.createDataFrame([("c1",), ("c2",)], "id string")
    )
    reg.register_df(
        "ea", spark.createDataFrame([("a1", "c1")], "src string, dst string")
    )
    reg.register_df(
        "eb", spark.createDataFrame([("b1", "c1")], "src string, dst string")
    )
    reg.register_df(
        "ec", spark.createDataFrame([("c1", "c2")], "src string, dst string")
    )
    g = GraphSchema(
        [
            NodeSchema("A", "ta", "id", ()),
            NodeSchema("B", "tb", "id", ()),
            NodeSchema("C", "tc", "id", ()),
        ],
        [
            EdgeSchema("E", "A", "C", "ea", "src", "dst"),
            EdgeSchema("E", "B", "C", "eb", "src", "dst"),
            EdgeSchema("E", "C", "C", "ec", "src", "dst"),
        ],
    )
    eng = CypherEngine(spark, g, reg)
    df = eng.cypher(
        "MATCH (n:A|B)-[:E*]->(m:C) RETURN n.id AS n, m.id AS m"
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_vector_query_relationships_plan_shape(spark):
    """Round 12: queryRelationships joins the lazy k-row winner frame
    against the edge/endpoint tables via hash equi-joins — no cartesian
    or nested-loop anywhere."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        EntityProperty,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="vqr_plan_")
    spark.createDataFrame(
        [(i,) for i in range(50)], "id long"
    ).write.parquet(os.path.join(d, "a"))
    spark.createDataFrame(
        [(i,) for i in range(50)], "id long"
    ).write.parquet(os.path.join(d, "b"))
    spark.createDataFrame(
        [(i, (i * 7) % 50, [float(i % 5), 1.0]) for i in range(200)],
        "src long, dst long, emb array<float>",
    ).write.parquet(os.path.join(d, "r"))
    reg = TableRegistry()
    for t in ("a", "b", "r"):
        reg.register(t, lambda t=t: spark.read.parquet(os.path.join(d, t)))
    g = GraphSchema(
        [
            NodeSchema("A", "a", "id", (), "bigint"),
            NodeSchema("B", "b", "id", (), "bigint"),
        ],
        [
            EdgeSchema(
                "R", "A", "B", "r", "src", "dst",
                (EntityProperty("emb", "array<float>"),),
            )
        ],
    )
    eng = CypherEngine(spark, g, reg)
    eng.create_relationship_vector_index("remb", "R", "emb")
    df = eng.cypher(
        "CALL db.index.vector.queryRelationships('remb', 5, $v) "
        "YIELD relationship AS rel, score RETURN score",
        params={"v": [1.0, 0.5]},
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_ml_enumerate_plan_shape(spark):
    """Round 11: a disjunction-adjacent undirected var-length hop joins
    the union-node scan against the materialized enumeration frame —
    equi-joins only, never a cartesian or BNLJ."""
    from opencyphertranspiler_spark import (
        CypherEngine,
        EdgeSchema,
        GraphSchema,
        NodeSchema,
        TableRegistry,
    )

    reg = TableRegistry()
    reg.register_df("tx", spark.createDataFrame([("x1",)], "id string"))
    reg.register_df("ty", spark.createDataFrame([("y1",)], "id string"))
    reg.register_df(
        "tz", spark.createDataFrame([("z1",), ("z2",)], "id string")
    )
    reg.register_df(
        "nx", spark.createDataFrame([("x1", "z1")], "src string, dst string")
    )
    reg.register_df(
        "ny", spark.createDataFrame([("y1", "z2")], "src string, dst string")
    )
    reg.register_df(
        "nz", spark.createDataFrame([("z1", "z2")], "src string, dst string")
    )
    g = GraphSchema(
        [
            NodeSchema("X", "tx", "id", ()),
            NodeSchema("Y", "ty", "id", ()),
            NodeSchema("Z", "tz", "id", ()),
        ],
        [
            EdgeSchema("N", "X", "Z", "nx", "src", "dst"),
            EdgeSchema("N", "Y", "Z", "ny", "src", "dst"),
            EdgeSchema("N", "Z", "Z", "nz", "src", "dst"),
        ],
    )
    eng = CypherEngine(spark, g, reg)
    df = eng.cypher(
        "MATCH (n:X|Y)-[:N*1..2]-(m:Z) RETURN n.id AS n, m.id AS m"
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hetero_chain_enumeration_is_equi_join(spark, engine):
    # round-11 continuation: the heterogeneous-label-chain var-length
    # lowering (_resolve_hetero_varlength) must stay frontier equi-joins
    # end-to-end — both the enumeration-side build and the final join of
    # the virtual edge back to the plain-labeled endpoint tables
    df = engine.cypher(
        "MATCH pth = allShortestPaths("
        "(o:Orders)-[:CONTAINS|OF_PART*]->(pt:Part)) "
        "RETURN id(o) AS o_key, id(pt) AS p_key, count(pth) AS n_paths"
    )
    plan = formatted_plan(spark, df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scalar_call_import_joins_hash_family(spark, engine):
    # round-11 continuation: the scalar-import join-back uses null-safe
    # key equality — Spark must plan it in the hash/sort-merge family
    # (coalesce+isnull keys), never a nested loop
    df = engine.cypher(
        "MATCH (r:Region) WITH r.r_regionkey AS rk "
        "CALL { WITH rk MATCH (n:Nation)-[:IN_REGION]->(r2:Region) "
        "WHERE r2.r_regionkey = rk RETURN count(*) AS n_nations } "
        "RETURN rk, n_nations"
    )
    plan = formatted_plan(spark, df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q46_bench_trained_and_materialized_routes(spark):
    """Round 13 (VERDICT r12 #2): the timed q46 variant exercises the
    100 TB index designs — the pruned trained family's candidate frame
    is cell-IN filtered (candidates ∝ probed inverted lists) and the
    materialized fulltext family's winner plan reads the checkpointed
    postings (Scan ExistingRDD), never re-scanning the documents
    parquet."""
    from tests.conftest import SF_DIR

    from opencyphertranspiler_spark.catalog import (
        _q_index_topk_bench,
        _QVEC,
        _FT_TERMS,
        get_engine,
    )

    _q_index_topk_bench(spark, SF_DIR)  # trains/materializes (idempotent)
    eng = get_engine(spark, SF_DIR)

    cand, how = eng._vector_candidate_frame(
        "bench_emb_t", "Embedding", "embedding", _QVEC
    )
    assert how == "ivf"
    plan = cand._jdf.queryExecution().optimizedPlan().toString()
    assert "cell" in plan and "IN (" in plan.replace("IN(", "IN (")

    clauses = eng._parse_fulltext_query(" ".join(_FT_TERMS))
    wf = eng._fulltext_topk_frame("gate_ft_m", "Document", ["text"], clauses, 20, 0)
    fplan = formatted_plan(spark, wf)
    assert "Scan ExistingRDD" in fplan
    assert "documents" not in fplan.lower().replace("scan existingrdd", "")


def test_fresh_delta_plans_no_nested_loop(spark):
    """Round 13: the stale-index fresh-list paths (anti-join delta +
    union) plan as hash/sort-merge joins — no cartesian or BNLJ on
    either the vector or the fulltext route."""
    from tests.conftest import SF_DIR

    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )
    qv = [float((i * 7) % 5) for i in range(64)]
    eng.create_vector_index("pp_v", "Embedding", "embedding")
    eng.train_vector_index("pp_v", n_cells=4, nprobe=2, iters=2)
    eng.create_fulltext_index("pp_f", "Document", "text")
    eng.materialize_fulltext_index("pp_f")
    # bump the epoch so both delta paths engage
    emb = eng.tables.get("embeddings")
    docs = eng.tables.get("documents")
    eng.tables.register("embeddings", lambda: emb)
    eng.tables.register("documents", lambda: docs)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vplan = formatted_plan(
            spark, eng._vector_topk_frame("pp_v", "Embedding", "embedding", "cosine", 5, qv)
        )
        fplan = formatted_plan(
            spark,
            eng._fulltext_topk_frame(
                "pp_f", "Document", ["text"],
                eng._parse_fulltext_query("spark vector"), 5, 0,
            ),
        )
    for plan in (vplan, fplan):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_weighted_pagerank_round_plan_shape(spark):
    """Round 14: one power-method round's rank update joins the 1-row
    dangling-mass aggregate via BroadcastNestedLoopJoin (the lazy
    broadcast frame that replaced the per-round driver collect) — no
    shuffle for the scalar, no Python UDF anywhere, and the parquet
    scan of the bench edge frame is pruned to exactly the three used
    columns. Optimization round 14: the state carries the static
    out-weight, so the round has exactly TWO equi-joins (edges x state,
    state x contribs) — the old ranks x with_deg join, which Catalyst
    evaluated twice per round, is gone. Pinned on the un-checkpointed
    round helper (the fixpoint's returned frame is a localCheckpoint,
    so its plan is opaque)."""
    import re

    from pyspark.sql import functions as F

    from opencyphertranspiler_spark.pipeline.graph import _pagerank_round
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    e = (
        orders.select(
            F.col("o_custkey").cast("string").alias("src"),
            F.col("o_orderkey").cast("string").alias("dst"),
            F.col("o_totalprice").cast("double").alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw")).where(
        F.col("outw") > 0
    )
    state = (
        nodes.join(outw, nodes.node == outw.src, "left")
        .select("node", "outw")
        .withColumn("rank", F.lit(0.001))
    )
    rnd = _pagerank_round(e, state, n=1000, damping=0.85)
    plan = formatted_plan(spark, rnd)
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row dangling frame
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the round body itself contributes exactly two equi-joins on top of
    # the state-building join (the one attaching outw to the node set):
    # edges x state and state x contribs — count the join nodes that
    # consume the rank column
    n_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan))
    # state-building left join appears up to three times (it feeds the
    # dangling branch, the contribution branch and the update's key
    # side); the round must not add more than 2 joins beyond those
    assert n_joins <= 5, f"too many equi-joins in round plan ({n_joins})"
    # column pruning: no orders scan reads beyond the 3 used columns
    # (Catalyst prunes harder still — node-side scans drop o_totalprice)
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    orders_scans = [s for s in scans if "o_custkey" in s]
    assert orders_scans and all(
        {c.split(":")[0] for c in s.split(",")}
        <= {"o_custkey", "o_orderkey", "o_totalprice"}
        for s in orders_scans
    ), orders_scans


def test_sloppy_and_decay_plans_stay_jvm_side(spark):
    """Round 14: sloppy phrases and decayed fuzzy expansions compile to
    higher-order-function expressions — no Python UDF in either the
    scan or the postings plan."""
    from tests.conftest import SF_DIR

    from opencyphertranspiler_spark import (
        CypherEngine,
        tpch_graph_schema,
        tpch_table_registry,
    )

    eng = CypherEngine(
        spark, tpch_graph_schema(), tpch_table_registry(spark, SF_DIR)
    )
    eng.create_fulltext_index("ppq_ft", "Document", "text")
    q = (
        "CALL db.index.fulltext.queryNodes('ppq_ft', "
        "'\"data model\"~2 window~1', {limit: 5}) "
        "YIELD node, score RETURN id(node) AS id, score"
    )
    scan_plan = formatted_plan(spark, eng.cypher(q))
    eng.materialize_fulltext_index("ppq_ft")
    post_plan = formatted_plan(spark, eng.cypher(q))
    for plan in (scan_plan, post_plan):
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    # postings route: no re-scan of the documents corpus — candidates
    # come from the checkpointed postings (Scan ExistingRDD)
    assert "Scan ExistingRDD" in post_plan


def test_porter_analyzer_plan_stays_jvm_side(spark):
    """Round 14: the staged Porter pipeline is pure Column transforms —
    tokenization with analyzer='english' plans without any Python
    evaluation node."""
    from pyspark.sql import functions as F

    from opencyphertranspiler_spark.engine import CypherEngine
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = CypherEngine._ft_tokens(
        F.col("text"), frozenset(), "english"
    )
    plan = formatted_plan(spark, docs.select(toks.alias("t")))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
