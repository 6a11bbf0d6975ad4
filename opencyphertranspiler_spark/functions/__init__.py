from .aggregates import compile_aggregate
from .scalar import compile_scalar

__all__ = ["compile_aggregate", "compile_scalar"]
