"""A PySpark-native property-graph query + data-processing engine with the
query capabilities of microsoft/openCypherTranspiler (reference studied at
/root/reference, MIT). Brand-new implementation: Cypher text is parsed and
planned in Python, then compiled to declarative PySpark DataFrame plans that
Catalyst/Tungsten/AQE optimize and execute.
"""

from .engine import CypherEngine, validate_graph
from .exceptions import (
    StaleIndexWarning,
    TranspilerBindingError,
    TranspilerError,
    TranspilerInternalError,
    TranspilerNotSupportedError,
    TranspilerSyntaxError,
)
from .schema import EdgeSchema, EntityProperty, GraphSchema, NodeSchema
from .sources import TableRegistry, parquet_registry, tpch_graph_schema, tpch_table_registry
from .writes import WriteResult

__version__ = "0.1.0"

__all__ = [
    "CypherEngine",
    "EdgeSchema",
    "EntityProperty",
    "GraphSchema",
    "NodeSchema",
    "StaleIndexWarning",
    "TableRegistry",
    "TranspilerBindingError",
    "TranspilerError",
    "TranspilerInternalError",
    "TranspilerNotSupportedError",
    "TranspilerSyntaxError",
    "WriteResult",
    "parquet_registry",
    "tpch_graph_schema",
    "tpch_table_registry",
    "validate_graph",
]
