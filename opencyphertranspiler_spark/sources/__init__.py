from .registry import TableRegistry, parquet_registry
from .tpch import tpch_graph_schema, tpch_table_registry

__all__ = [
    "TableRegistry",
    "parquet_registry",
    "tpch_graph_schema",
    "tpch_table_registry",
]
