"""Aggregation function library (reference SURVEY.md §2.5; lowering per
/root/reference/src/SQLRenderer/SQLRenderer.cs:92-102,655-714; return types per
AggregationFunctionReturnTypeTable.cs:14-58).

Entity aggregation uses the reference's key-surrogate rule: ``count(node)``
counts the node-id column; ``count(edge)`` counts the edge source-id column
(SQLRenderer.cs:667-689). ``count(DISTINCT edge)`` — which the reference
rejects for lack of a composite key (675-679) — is supported here via
``count_distinct(src, sink)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exceptions import TranspilerNotSupportedError


def compile_aggregate(
    name: str,
    arg: Column | None,
    distinct: bool,
    extras: list[Column],
    entity_keys: list[Column] | None = None,
    arg_type: T.DataType | None = None,
) -> Column:
    """Lower an aggregate call. ``entity_keys`` is set when the argument is a
    whole node/relationship entity (its surrogate key column(s))."""
    if name == "count":
        if arg is None and entity_keys is None:  # count(*)
            return F.count(F.lit(1))
        if entity_keys is not None:
            if distinct:
                return F.count_distinct(*entity_keys)
            return F.count(entity_keys[0])
        if distinct:
            return F.count_distinct(arg)
        return F.count(arg)
    if entity_keys is not None:
        raise TranspilerNotSupportedError(
            f"Aggregation {name}() over a whole entity is not supported; "
            "aggregate a property instead"
        )
    if name == "avg":
        # reference renders AVG(CAST(x AS float)) -> double (SQLRenderer.cs:94)
        if isinstance(arg_type, T.DecimalType):
            return F.avg(arg)
        return F.avg(arg.cast("double"))
    if name == "sum":
        return F.sum(arg)
    if name == "min":
        return F.min(arg)
    if name == "max":
        return F.max(arg)
    if name == "first":
        # reference lowers first/last to MIN/MAX (order-insensitive,
        # SQLRenderer.cs:98-99) — deterministic, so we match it
        return F.min(arg)
    if name == "last":
        return F.max(arg)
    if name == "stdev":
        return F.stddev_samp(arg.cast("double"))
    if name == "stdevp":
        return F.stddev_pop(arg.cast("double"))
    if name == "percentilecont":
        if len(extras) != 1:
            raise TranspilerNotSupportedError(
                "percentileCont(expr, percentile) takes exactly 2 arguments"
            )
        return F.percentile(arg.cast("double"), extras[0])
    if name == "percentiledisc":
        if len(extras) != 1:
            raise TranspilerNotSupportedError(
                "percentileDisc(expr, percentile) takes exactly 2 arguments"
            )
        # exact SQL-standard PERCENTILE_DISC: the smallest value whose
        # cumulative fraction >= p, i.e. the element at 1-based index
        # ceil(p*n) of the sorted non-null values; returns the INPUT type.
        # collect_list holds one group's values in executor memory — same
        # envelope as any exact percentile; use approx_quantiles
        # (pipeline/sketches.py) when groups are 100 TB-sized.
        idx = (
            F.ceil(F.round(extras[0] * F.count(arg), 9)).cast("int") - F.lit(1)
        )
        return F.get(
            F.sort_array(F.collect_list(arg)), F.greatest(F.lit(0), idx)
        )
    if name == "collect":
        # extension: openCypher collect() -> array (reference has no lists);
        # collect(DISTINCT x) -> set semantics via collect_set
        return F.collect_set(arg) if distinct else F.collect_list(arg)
    raise TranspilerNotSupportedError(f"Unknown aggregation function {name}()")
