"""Scalar function library (reference inventory SURVEY.md §2.4, lowering per
/root/reference/src/SQLRenderer/SQLRenderer.cs:563-629) plus a small set of
clearly-marked extensions. All lowerings are built-in pyspark.sql.functions —
JVM-side, whole-stage-codegen friendly; no Python UDFs.

Note: the reference declares toDouble -> long? / toLong -> double? return
types (a bug, QueryExpressionFunction.cs:53-56); we implement the correct
casts. ``=~`` is true regex anchored to the ENTIRE string (openCypher
semantics), unlike the reference's PATINDEX substring hack
(SQLRenderer.cs:50).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..exceptions import TranspilerBindingError, TranspilerNotSupportedError


def _arity(name: str, args: list, n: int, m: int | None = None):
    m = n if m is None else m
    if not (n <= len(args) <= m):
        raise TranspilerBindingError(
            f"Function {name}() takes {n}{'' if m == n else f'..{m}'} argument(s), "
            f"got {len(args)}"
        )


def compile_scalar(name: str, args: list[Column]) -> Column:
    """Lower a scalar function call to a Column expression."""
    # --- casts (reference SQLRenderer.cs:568-585) ---
    # try_cast, not cast: openCypher toInteger('abc') yields NULL; under
    # Spark 4's default ANSI mode a plain cast would throw at runtime
    if name == "tofloat":
        _arity(name, args, 1)
        return args[0].try_cast("float")
    if name == "todouble":
        _arity(name, args, 1)
        return args[0].try_cast("double")
    if name == "tostring":
        _arity(name, args, 1)
        return args[0].cast("string")
    if name == "toboolean":
        _arity(name, args, 1)
        return args[0].try_cast("boolean")
    if name == "tointeger":
        _arity(name, args, 1)
        # openCypher integers are 64-bit; a 32-bit cast would overflow on
        # long surrogate keys
        return args[0].try_cast("long")
    if name == "tolong":
        _arity(name, args, 1)
        return args[0].try_cast("long")
    # Neo4j 4.4+ ...OrNull spellings: identical here — every cast above is
    # already null-on-failure (try_cast), which is the OrNull contract
    if name in (
        "tointegerornull",
        "tofloatornull",
        "tobooleanornull",
        "tostringornull",
    ):
        _arity(name, args, 1)
        target = {
            "tointegerornull": "long",
            "tofloatornull": "float",
            "tobooleanornull": "boolean",
            "tostringornull": "string",
        }[name]
        return args[0].try_cast(target)
    # --- vector similarity (Neo4j 5.18; extension — the reference has no
    # vector functions). Pure JVM-side higher-order folds, same
    # left-to-right double-precision order as pipeline/similarity.py so a
    # DuckDB list_cosine_similarity oracle agrees to float tolerance.
    if name in ("vector.similarity.cosine", "vector.similarity.euclidean"):
        _arity(name, args, 2)
        # the up-front cast types a bare NULL argument (VOID would fail
        # zip_with analysis) and yields Neo4j's null-in-null-out for free
        a = args[0].cast("array<double>")
        b = args[1].cast("array<double>")

        def fold_dot(x, y):
            return F.aggregate(
                F.zip_with(x, y, lambda p, q: p * q),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )

        if name.endswith("cosine"):
            # Neo4j 5.18 normalizes the Lucene vector-index score to
            # [0, 1]: (1 + cos) / 2 — orthogonal vectors score 0.5, not
            # 0.0 (ADVICE r9 high: raw cosine diverged on every
            # non-identical pair)
            na = F.sqrt(fold_dot(a, a))
            nb = F.sqrt(fold_dot(b, b))
            return (F.lit(1.0) + fold_dot(a, b) / (na * nb)) / F.lit(2.0)
        # euclidean similarity = 1 / (1 + squared L2 distance)
        diff = F.zip_with(a, b, lambda p, q: p - q)
        sq = F.aggregate(diff, F.lit(0.0), lambda acc, v: acc + v * v)
        return F.lit(1.0) / (F.lit(1.0) + sq)
    # --- strings (reference SQLRenderer.cs:589-621) ---
    if name == "startswith":
        _arity(name, args, 2)
        return args[0].startswith(args[1])
    if name == "endswith":
        _arity(name, args, 2)
        return args[0].endswith(args[1])
    if name == "contains":
        _arity(name, args, 2)
        return args[0].contains(args[1])
    if name == "left":
        _arity(name, args, 2)
        return F.substr(args[0], F.lit(1), args[1])
    if name == "right":
        _arity(name, args, 2)
        s, n = args
        return F.substr(s, F.greatest(F.length(s) - n + F.lit(1), F.lit(1)), n)
    if name == "trim":
        _arity(name, args, 1)
        return F.trim(args[0])
    if name == "ltrim":
        _arity(name, args, 1)
        return F.ltrim(args[0])
    if name == "rtrim":
        _arity(name, args, 1)
        return F.rtrim(args[0])
    if name == "toupper":
        _arity(name, args, 1)
        return F.upper(args[0])
    if name == "tolower":
        _arity(name, args, 1)
        return F.lower(args[0])
    if name == "size":
        _arity(name, args, 1)
        return F.length(args[0])
    if name == "isnull":
        _arity(name, args, 1)
        return args[0].isNull()
    if name == "isnotnull":
        _arity(name, args, 1)
        return args[0].isNotNull()
    # --- extensions beyond the reference library (documented additions) ---
    if name == "substring":  # Cypher substring(s, start[, len]) is 0-based
        _arity(name, args, 2, 3)
        if len(args) == 2:
            return F.substr(args[0], args[1] + F.lit(1))
        return F.substr(args[0], args[1] + F.lit(1), args[2])
    if name == "replace":
        _arity(name, args, 3)
        return F.replace(args[0], args[1], args[2])
    if name == "split":
        _arity(name, args, 2)
        return F.split(args[0], args[1])
    if name == "reverse":
        _arity(name, args, 1)
        return F.reverse(args[0])
    if name == "coalesce":
        return F.coalesce(*args)
    if name == "abs":
        _arity(name, args, 1)
        return F.abs(args[0])
    if name == "round":
        _arity(name, args, 1, 2)
        return F.round(args[0], args[1] if len(args) > 1 else F.lit(0))
    if name == "floor":
        _arity(name, args, 1)
        return F.floor(args[0])
    if name == "ceil":
        _arity(name, args, 1)
        return F.ceil(args[0])
    if name == "sqrt":
        _arity(name, args, 1)
        return F.sqrt(args[0])
    if name == "sign":
        _arity(name, args, 1)
        return F.signum(args[0]).cast("int")
    # --- math library (extensions; Neo4j function set, all deterministic
    # JVM built-ins — rand()/randomUUID() are deliberately absent) ---
    if name == "exp":
        _arity(name, args, 1)
        return F.exp(args[0])
    if name == "log":
        _arity(name, args, 1)
        return F.log(args[0])  # natural log, like Neo4j
    if name == "log10":
        _arity(name, args, 1)
        return F.log10(args[0])
    if name == "sin":
        _arity(name, args, 1)
        return F.sin(args[0])
    if name == "cos":
        _arity(name, args, 1)
        return F.cos(args[0])
    if name == "tan":
        _arity(name, args, 1)
        return F.tan(args[0])
    if name == "asin":
        _arity(name, args, 1)
        return F.asin(args[0])
    if name == "acos":
        _arity(name, args, 1)
        return F.acos(args[0])
    if name == "atan":
        _arity(name, args, 1)
        return F.atan(args[0])
    if name == "atan2":
        _arity(name, args, 2)
        return F.atan2(args[0], args[1])
    if name == "cot":
        _arity(name, args, 1)
        return F.cot(args[0])
    if name == "degrees":
        _arity(name, args, 1)
        return F.degrees(args[0])
    if name == "radians":
        _arity(name, args, 1)
        return F.radians(args[0])
    if name == "pi":
        _arity(name, args, 0)
        return F.lit(math.pi)
    if name == "e":
        _arity(name, args, 0)
        return F.lit(math.e)
    # --- non-deterministic functions (extension; Neo4j parity) ---
    if name == "timestamp":
        # Neo4j: milliseconds since epoch at statement start. Lowered to
        # the session's query-constant clock — every row in one statement
        # sees the same value, like Neo4j
        _arity(name, args, 0)
        return F.unix_millis(F.current_timestamp())
    if name == "rand":
        # uniform [0, 1) per ROW (Spark seeds per partition;
        # non-reproducible across runs, like Neo4j)
        _arity(name, args, 0)
        return F.rand()
    if name == "randomuuid":
        _arity(name, args, 0)
        return F.expr("uuid()")
    if name == "haversin":
        _arity(name, args, 1)
        # haversin(x) = sin^2(x/2), Neo4j's spherical-distance helper
        return F.pow(F.sin(args[0] / F.lit(2.0)), F.lit(2.0))
    # --- lists (extensions; openCypher staples the reference lacks).
    # first()/last() stay aggregates (parser routes them to AggCall), so
    # the list accessors are head()/tail() only, per openCypher. ---
    if name == "range":
        # range(start, stop[, step]) is INCLUSIVE of stop (openCypher);
        # F.sequence is inclusive too, but THROWS on empty ranges where
        # openCypher returns [] — guard on direction vs bounds
        _arity(name, args, 2, 3)
        start = args[0].cast("long")
        stop = args[1].cast("long")
        step = (args[2] if len(args) == 3 else F.lit(1)).cast("long")
        empty = ((step > 0) & (stop < start)) | ((step < 0) & (stop > start))
        # two-sided when with NO otherwise: a null argument makes `empty`
        # SQL NULL, so neither branch fires and null propagates (Cypher)
        return F.when(empty, F.array().cast("array<long>")).when(
            ~empty, F.sequence(start, stop, step)
        )
    # --- temporal constructors (extensions; the reference has NO temporal
    # library at all — SURVEY.md §2.4 "no date/math library",
    # Function.cs:120-348 stops at string/cast functions). duration() and
    # the accessor properties (x.year, x.epochMillis, ...) live in the
    # expression compiler (they need map-literal / typed-field context). ---
    if name == "date":
        # date('2020-01-05') / date(timestamp) — truncates, Neo4j-style
        _arity(name, args, 1)
        return F.to_date(args[0])
    if name == "datetime":
        # datetime('2020-01-05T10:00:00') / datetime(date) — ISO strings
        # with or without 'T' both cast; our tables carry plain TIMESTAMP
        _arity(name, args, 1)
        return args[0].cast("timestamp")
    if name == "head":
        _arity(name, args, 1)
        return F.try_element_at(args[0], F.lit(1))
    if name == "last_element":
        # Neo4j last(list) — the parser routes list-shaped last() here
        # (the bare name stays the reference's LAST aggregate)
        _arity(name, args, 1)
        return F.try_element_at(args[0], F.lit(-1))
    if name == "tail":
        _arity(name, args, 1)
        return F.slice(args[0], 2, F.greatest(F.size(args[0]) - 1, F.lit(0)))
    raise TranspilerNotSupportedError(f"Unknown function {name}()")
