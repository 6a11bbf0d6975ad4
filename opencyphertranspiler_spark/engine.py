"""Session façade: ``engine.cypher(query) -> DataFrame``.

The PySpark analogue of the reference's two-line entry point
(/root/reference/README.md:25-38):

    plan  = LogicalPlan.ProcessQueryTree(OpenCypherParser.Parse(q), graphDef)
    tsql  = new SQLRenderer(graphDef).RenderPlan(plan)

here becomes:

    engine = CypherEngine(spark, graph_schema, tables)
    df     = engine.cypher(q)          # lazy DataFrame; Catalyst optimizes
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cypher import ast as A
from .cypher import parse
from .exceptions import TranspilerNotSupportedError
from .operators import Compiler
from .plans import plan_query
from .schema import EdgeSchema, GraphSchema
from .sources import TableRegistry


class CypherEngine:
    def __init__(
        self,
        spark: SparkSession,
        graph: GraphSchema,
        tables: TableRegistry,
        reach_max_iters: int = 200,
    ):
        self.spark = spark
        self.graph = graph
        self.tables = tables
        # unbounded-`*` reachability: fixpoint round cap (= max path length
        # the rewrite can discover; raise for graphs with larger diameter)
        self.reach_max_iters = reach_max_iters
        # reachability DataFrames for unbounded var-length rels, keyed by
        # (edge id, min_hops) — the fixpoint runs once per engine lifetime
        self._reach_cache: dict[tuple[str, int], DataFrame] = {}

    def cypher(self, query: str, params: dict | None = None) -> DataFrame:
        """Parse, plan, and compile a Cypher query to a lazy DataFrame.

        ``params`` binds ``$name`` query parameters (extension — the
        reference rejects parameters)."""
        ast_query = parse(query)
        graph, tables = self._resolve_unbounded(ast_query)
        plan = plan_query(ast_query, graph)
        return Compiler(self.spark, tables, params=params).compile(plan)

    # -- unbounded variable-length rewrite ---------------------------------
    # `(a:L1)-[:V*]->(b:L2)` (and `*n..`) compiles to REACHABILITY: the
    # engine computes the transitive closure of V's edge table (iterative
    # semi-naive fixpoint, pipeline/graph.py) once, registers it as a
    # virtual edge table, and rewrites the pattern hop to an ordinary
    # 1-hop relationship over that virtual edge. Semantics: one row per
    # DISTINCT (a, b) endpoint pair — reachability — unlike the bounded
    # *n..m form, which yields one row per edge-distinct path. The
    # reference rejects unbounded paths outright (CypherVisitor.cs:
    # 2035-2039); this is a documented extension.

    def _resolve_unbounded(
        self, ast_query
    ) -> tuple[GraphSchema, TableRegistry]:
        def single_queries(q):
            if isinstance(q, A.UnionQuery):
                yield from single_queries(q.left)
                yield from single_queries(q.right)
            else:
                yield q

        def parts_of(clause):
            # MATCH patterns, plus exists(pattern) predicates in ANY
            # clause's WHERE (MATCH, WITH and RETURN all accept them)
            if isinstance(clause, A.MatchClause):
                yield from clause.patterns
            where = getattr(clause, "where", None)
            if where is not None:
                for n in where.walk():
                    if isinstance(n, A.PatternPredicate):
                        yield n.part

        rewrites: list[tuple[A.NodePattern, A.RelPattern, A.NodePattern]] = []
        for sq in single_queries(ast_query):
            for clause in sq.clauses:
                for part in parts_of(clause):
                    for i, rel in enumerate(part.rels):
                        if rel.min_hops is not None and rel.max_hops is None:
                            rewrites.append(
                                (part.nodes[i], rel, part.nodes[i + 1])
                            )
        if not rewrites:
            return self.graph, self.tables

        extra_edges: list[EdgeSchema] = []
        overlay = TableRegistry()
        for name in self.tables.names():
            overlay.register(name, lambda n=name: self.tables.get(n))

        for left, rel, right in rewrites:
            if rel.verb is None:
                raise TranspilerNotSupportedError(
                    "An unbounded variable-length relationship needs an "
                    "explicit type, e.g. [:FOLLOWS*]"
                )
            fwd = rel.direction == A.Direction.FORWARD
            src_label = left.label if fwd else right.label
            snk_label = right.label if fwd else left.label
            cands = self.graph.candidate_edges(rel.verb, src_label, snk_label)
            if len(cands) != 1:
                raise TranspilerNotSupportedError(
                    f"Unbounded '*{rel.min_hops}..' over ambiguous edge "
                    f"'{rel.verb}' — label both endpoint nodes"
                )
            edge = cands[0]
            reach = self._reachability(edge, rel.min_hops)
            vname = f"__reach_{rel.min_hops}_{edge.id}"
            # key the virtual verb by the full edge IDENTITY, not just the
            # verb: one verb can back several (source, sink) label pairs
            # (e.g. FROM_NATION on Customer and Supplier), each needing its
            # own reachability table
            vverb = f"__REACH{rel.min_hops}_{edge.id}"
            overlay.register_df(vname, reach)
            if not any(e.verb == vverb for e in extra_edges):
                extra_edges.append(
                    EdgeSchema(
                        verb=vverb,
                        source_label=edge.source_label,
                        sink_label=edge.sink_label,
                        table=vname,
                        source_id_property=edge.source_id_property,
                        sink_id_property=edge.sink_id_property,
                    )
                )
            # rewrite the hop: ordinary 1-hop rel over the virtual edge
            rel.verb = vverb
            rel.min_hops = rel.max_hops = None
            if fwd:
                left.label, right.label = edge.source_label, edge.sink_label
            else:
                left.label, right.label = edge.sink_label, edge.source_label

        graph = GraphSchema(self.graph.nodes, self.graph.edges + extra_edges)
        return graph, overlay

    def _reachability(self, edge: EdgeSchema, min_hops: int) -> DataFrame:
        key = (edge.id, min_hops)
        if key in self._reach_cache:
            return self._reach_cache[key]
        from .pipeline.graph import transitive_closure

        e = self.tables.get(edge.table).select(
            F.col(edge.source_id_property).alias("src"),
            F.col(edge.sink_id_property).alias("dst"),
        )
        r1 = transitive_closure(e, max_iters=self.reach_max_iters)
        out = r1
        if min_hops > 1:
            # length >= n decomposes into an exact (n-1)-hop prefix plus a
            # >= 1-hop suffix; pair-distinct composition preserves existence
            exact = e.distinct()
            for _ in range(min_hops - 2):
                exact = (
                    exact.alias("x")
                    .join(e.alias("e2"), F.col("x.dst") == F.col("e2.src"))
                    .select(
                        F.col("x.src").alias("src"), F.col("e2.dst").alias("dst")
                    )
                    .distinct()
                )
            out = (
                exact.alias("x")
                .join(r1.alias("r"), F.col("x.dst") == F.col("r.src"))
                .select(F.col("x.src").alias("src"), F.col("r.dst").alias("dst"))
                .distinct()
            )
        out = out.select(
            F.col("src").alias(edge.source_id_property),
            F.col("dst").alias(edge.sink_id_property),
        )
        self._reach_cache[key] = out
        return out

    def explain(self, query: str, mode: str = "formatted") -> str:
        """Catalyst's physical plan for a query ('formatted', 'extended',
        'cost', 'codegen') — the plan-quality audit surface."""
        df = self.cypher(query)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                mode
            )
        )

    def explain_plan(self, query: str) -> str:
        """Dump the logical operator DAG (the reference's DumpGraph,
        /root/reference/src/LogicalPlanner/LogicalPlan.cs:88-110)."""
        return plan_query(parse(query), self.graph).describe()

    def register_sql_views(self, names: list[str] | None = None) -> list[str]:
        """Expose the registered backing tables as Spark SQL temp views so
        Cypher results and spark.sql() queries compose in one session."""
        names = names if names is not None else self.tables.names()
        for name in names:
            self.tables.get(name).createOrReplaceTempView(name)
        return names
