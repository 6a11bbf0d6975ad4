from .compiler import Compiler
from .expressions import ExprCompiler

__all__ = ["Compiler", "ExprCompiler"]
