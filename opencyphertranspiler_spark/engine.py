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

from .cypher import parse
from .operators import Compiler
from .plans import plan_query
from .schema import GraphSchema
from .sources import TableRegistry


class CypherEngine:
    def __init__(
        self, spark: SparkSession, graph: GraphSchema, tables: TableRegistry
    ):
        self.spark = spark
        self.graph = graph
        self.tables = tables

    def cypher(self, query: str, params: dict | None = None) -> DataFrame:
        """Parse, plan, and compile a Cypher query to a lazy DataFrame.

        ``params`` binds ``$name`` query parameters (extension — the
        reference rejects parameters)."""
        ast = parse(query)
        plan = plan_query(ast, self.graph)
        return Compiler(self.spark, self.tables, params=params).compile(plan)

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
