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


class StaleIndexWarning(UserWarning):
    """A trained (IVF/PQ) or materialized (inverted fulltext) index is
    serving candidates from a corpus snapshot older than the current
    table registration: the base table was re-registered after
    train_vector_index() / materialize_fulltext_index() ran. Scores for
    the frozen candidates stay exact, but rows added since are only
    visible through the fresh-list delta (inserts), and removed or
    updated rows may still win. Re-train / re-materialize, or construct
    the engine with rebuild_stale_indexes=True to do so automatically."""


class PathEnumerationCapWarning(UserWarning):
    """The relationship-unique path enumeration for an unbounded path
    variable exceeded its round or row cap; the engine fell back to the
    endpoint-pair witness model (one shortest witness per reachable
    pair) instead of Neo4j's row-per-path semantics."""
