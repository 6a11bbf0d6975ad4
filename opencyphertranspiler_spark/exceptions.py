"""Error taxonomy mirroring the reference transpiler's three exception kinds.

Reference: /root/reference/src/Common/Exceptions/ (TranspilerSyntaxErrorException,
TranspilerNotSupportedException, TranspilerBindingException, TranspilerInternalErrorException).
"""


class TranspilerError(Exception):
    """Base class for all engine errors."""


class TranspilerSyntaxError(TranspilerError):
    """Query text failed to parse."""


class TranspilerNotSupportedError(TranspilerError):
    """Construct is recognized but outside the supported subset."""


class TranspilerBindingError(TranspilerError):
    """A label, alias, or property failed to resolve against the graph schema."""


class TranspilerInternalError(TranspilerError):
    """Engine invariant violated (a bug in the engine itself)."""


class PathEnumerationCapWarning(UserWarning):
    """The relationship-unique path enumeration for an unbounded path
    variable exceeded its round or row cap; the engine fell back to the
    endpoint-pair witness model (one shortest witness per reachable
    pair) instead of Neo4j's row-per-path semantics."""
