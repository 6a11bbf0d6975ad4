"""Graph-schema overlay on the driver's TPC-H-ish parquet tables.

Implements FIXTURES.md "Set B": nodes = the base tables keyed by their PK;
edges = 2-3 column projections of the child table of each FK pair. No new
data is synthesized except the Lineitem surrogate id (the data model requires
a single UNIQUE id column per node —
/root/reference/src/Common/GraphSchema/DataSourceOperator.cs:55-58).

Lineitem surrogate: the driver's synthetic lineitem has payload-distinct
duplicate ``(l_orderkey, l_linenumber)`` pairs (1,161 at sf0.001; 118,144 at
sf0.1), so no arithmetic on the "PK" columns can be unique. The surrogate is
therefore an md5 over the FULL row (full rows are distinct at every SF),
rendered engine-agnostically so the DuckDB oracle recomputes the identical
id: integers as decimal strings, the exactly-2-dp doubles as integer cents
(``round(x*100)`` — both engines round a value ~1e-9 from an integer the
same way), timestamps via the shared ``YYYY-MM-DD HH:MM:SS`` cast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..schema import EdgeSchema, EntityProperty, GraphSchema, NodeSchema
from .registry import TableRegistry, parquet_registry

BASE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def tpch_graph_schema() -> GraphSchema:
    """The FIXTURES.md Set B node/edge declarations."""
    P = EntityProperty
    nodes = [
        NodeSchema("Region", "region", "r_regionkey", (P("r_name"),)),
        NodeSchema("Nation", "nation", "n_nationkey", (P("n_name"),)),
        NodeSchema(
            "Customer",
            "customer",
            "c_custkey",
            (P("c_name"), P("c_acctbal", "double"), P("c_mktsegment")),
        ),
        NodeSchema(
            "Supplier", "supplier", "s_suppkey", (P("s_name"), P("s_acctbal", "double"))
        ),
        NodeSchema(
            "Part",
            "part",
            "p_partkey",
            (
                P("p_name"),
                P("p_brand"),
                P("p_type"),
                P("p_size", "int"),
                P("p_retailprice", "double"),
            ),
        ),
        NodeSchema(
            "Orders",
            "orders",
            "o_orderkey",
            (
                P("o_orderstatus"),
                P("o_totalprice", "double"),
                P("o_orderdate", "timestamp"),
                P("o_orderpriority"),
            ),
        ),
        NodeSchema(
            "Document",
            "documents",
            "doc_id",
            (P("text"), P("lang"), P("source"), P("n_chars", "long")),
        ),
        # round 11: the embeddings table as a node label so the vector
        # index surface (CALL db.index.vector.queryNodes) has a
        # driver-fixture-backed target for the DuckDB correctness gate
        NodeSchema(
            "Embedding",
            "embeddings",
            "vec_id",
            (P("embedding", "array<float>"), P("label", "int")),
        ),
        NodeSchema(
            "Lineitem",
            "lineitem_node",
            "l_id",
            (
                P("l_linenumber", "int"),
                P("l_quantity", "double"),
                P("l_extendedprice", "double"),
                P("l_discount", "double"),
                P("l_tax", "double"),
                P("l_returnflag"),
                P("l_linestatus"),
                P("l_shipdate", "timestamp"),
            ),
        ),
    ]
    edges = [
        EdgeSchema("IN_REGION", "Nation", "Region", "nation", "n_nationkey", "n_regionkey"),
        EdgeSchema(
            "FROM_NATION", "Customer", "Nation", "customer", "c_custkey", "c_nationkey"
        ),
        EdgeSchema(
            "FROM_NATION", "Supplier", "Nation", "supplier", "s_suppkey", "s_nationkey"
        ),
        EdgeSchema("PLACED", "Customer", "Orders", "orders", "o_custkey", "o_orderkey"),
        EdgeSchema(
            "CONTAINS",
            "Orders",
            "Lineitem",
            "lineitem_node",
            "l_orderkey",
            "l_id",
            (EntityProperty("l_linenumber", "int"),),
        ),
        EdgeSchema("OF_PART", "Lineitem", "Part", "lineitem_node", "l_id", "l_partkey"),
        EdgeSchema(
            "FROM_SUPPLIER", "Lineitem", "Supplier", "lineitem_node", "l_id", "l_suppkey"
        ),
        # PLACED split by order priority: two parallel edge types between
        # the same (Customer, Orders) labels — exercises `[:A|B]` type
        # alternation (virtual union edge, engine.py:_resolve_multi_verb).
        # PLACED_URGENT carries a property PLACED_NORMAL lacks, so the
        # union edge's null-padding path is exercised too.
        EdgeSchema(
            "PLACED_URGENT",
            "Customer",
            "Orders",
            "orders_urgent",
            "o_custkey",
            "o_orderkey",
            (P("o_orderpriority"),),
        ),
        EdgeSchema(
            "PLACED_NORMAL",
            "Customer",
            "Orders",
            "orders_normal",
            "o_custkey",
            "o_orderkey",
        ),
    ]
    return GraphSchema(nodes, edges)


def load_events(spark: SparkSession, sf_dir: str):
    """The events table carries TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long and truncate to microseconds (the
    same truncation DuckDB applies)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # The driver sometimes regenerates events.parquet with
    # TIMESTAMP(isAdjustedToUTC=false) (Spark 4: timestamp_ntz); normalize
    # like every other base table so downstream unix_micros/casts work.
    return _normalize_timestamps(df)


def _normalize_timestamps(df):
    """Spark 4 reads parquet TIMESTAMP(isAdjustedToUTC=false) as
    timestamp_ntz; cast to plain timestamp (session TZ is UTC, values
    unchanged) so result schemas line up with the DuckDB oracle's
    TIMESTAMP."""
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def tpch_table_registry(spark: SparkSession, sf_dir: str) -> TableRegistry:
    """Base parquet tables plus the ``lineitem_node`` view with the l_id surrogate."""
    reg = parquet_registry(spark, sf_dir, BASE_TABLES)
    for t in BASE_TABLES:
        reg.register(
            t,
            lambda p=f"{sf_dir}/{t}.parquet": _normalize_timestamps(
                spark.read.parquet(p)
            ),
        )
    reg.register("events", lambda: load_events(spark, sf_dir))
    # priority-split PLACED edge tables (see tpch_graph_schema): plain
    # filtered views — Catalyst pushes the filter into the parquet scan
    reg.register(
        "orders_urgent",
        lambda: reg.get("orders").filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        ),
    )
    reg.register(
        "orders_normal",
        lambda: reg.get("orders").filter(
            ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        ),
    )
    reg.register(
        "lineitem_node", lambda: _lineitem_node_df(spark, reg, sf_dir)
    )
    return reg


def _lineitem_node_df(spark: SparkSession, reg: TableRegistry, sf_dir: str):
    """``lineitem_node`` = lineitem + the md5 ``l_id`` surrogate.

    Materialized ONCE per (source path, mtime, size) as derived parquet
    (round 9, VERDICT r8 #3): as a plain view every Lineitem scan recomputes
    an md5 over 11 concat'd columns per row — linear and codegen'd, but at
    100 TB a per-query full-corpus hash is real money (q03 paid 0.68→1.96 s
    at sf0.1 for exactly this). Write-once + parquet column pruning means
    queries that never touch ``l_id`` don't even read it. The cache key
    fingerprints the source file so a regenerated fixture invalidates
    automatically; any write failure (read-only tmp, race) falls back to
    the on-the-fly view — correctness never depends on the cache."""
    import hashlib
    import shutil
    import tempfile

    def view():
        return reg.get("lineitem").withColumn("l_id", lineitem_id_col())

    src = os.path.join(sf_dir, "lineitem.parquet")
    try:
        st = os.stat(src)
    except OSError:
        return view()
    base = os.environ.get("SPARK_GRAFT_DERIVED_DIR") or os.path.join(
        tempfile.gettempdir(), "spark-graft-derived"
    )
    key = hashlib.md5(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:16]
    path = os.path.join(base, f"lineitem_node_{key}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            view().write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, path)  # atomic publish
            except OSError:
                # another process published first — use theirs
                shutil.rmtree(tmp, ignore_errors=True)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            return view()
    return spark.read.parquet(path)


def lineitem_id_col():
    """Full-row md5 surrogate id for Lineitem (see module docstring).

    Column order and rendering MUST stay in lockstep with
    ``LINEITEM_NODE_SQL`` below — the driver gate hash-compares results that
    render l_id.
    """
    return F.md5(
        F.concat_ws(
            "|",
            F.col("l_orderkey"),
            F.col("l_partkey"),
            F.col("l_suppkey"),
            F.col("l_linenumber"),
            F.round(F.col("l_quantity") * 100).cast("long"),
            F.round(F.col("l_extendedprice") * 100).cast("long"),
            F.round(F.col("l_discount") * 100).cast("long"),
            F.round(F.col("l_tax") * 100).cast("long"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
            F.col("l_shipdate").cast("string"),
        )
    )


# DuckDB-side view of the same surrogate, for oracle SQL parity.
LINEITEM_NODE_SQL = """(SELECT *, md5(concat_ws('|',
    l_orderkey, l_partkey, l_suppkey, l_linenumber,
    cast(round(l_quantity * 100) as bigint),
    cast(round(l_extendedprice * 100) as bigint),
    cast(round(l_discount * 100) as bigint),
    cast(round(l_tax * 100) as bigint),
    l_returnflag, l_linestatus,
    cast(l_shipdate as varchar))) AS l_id FROM lineitem)"""
