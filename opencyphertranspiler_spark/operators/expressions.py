"""Expression compiler: Cypher AST expression -> pyspark.sql.Column.

Implements the reference's expression semantics (SURVEY.md §2.3) with the
Cypher/Spark coercion deltas applied explicitly (SURVEY.md §4.3):

- ``+`` with a string operand concatenates (Cypher: int + string -> string,
  reference TypeCoersionTables.cs:30); numeric otherwise;
- integer ``/`` stays integral with truncation toward zero (T-SQL / Cypher);
- ``^`` is double POWER (reference SQLRenderer.cs:38);
- XOR expands to ``(a AND NOT b) OR (NOT a AND b)`` preserving 3-valued
  logic (reference SQLRenderer.cs:42);
- CASE branch values are unified: any string branch makes all branches
  string (reference folds branch types via the Plus table,
  QueryExpressionCaseExpression.cs:77-117).

Type questions are answered by probing the input DataFrame's schema
(Catalyst is the type checker) — no parallel type-inference engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cypher import ast as A
from ..exceptions import (
    TranspilerBindingError,
    TranspilerInternalError,
    TranspilerNotSupportedError,
)
from ..functions import compile_aggregate, compile_scalar
from ..plans.logical import (
    ColRef,
    EntityRef,
    Env,
    MaterializedPathRef,
    PathRef,
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

_TEMPORAL_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)

# temporal accessor properties (extension; Neo4j `x.year` style). Keys are
# lower-cased — Cypher property access is case-sensitive in Neo4j, but the
# common spellings (year, dayOfWeek, epochMillis) normalize cleanly.
# dayOfWeek follows Neo4j/ISO numbering (1 = Monday); Spark's dayofweek is
# 1 = Sunday, hence the shift.
_TEMPORAL_ACCESSORS: dict = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "week": F.weekofyear,
    "quarter": F.quarter,
    "dayofweek": lambda c: ((F.dayofweek(c) + F.lit(5)) % F.lit(7)) + F.lit(1),
    "dayofyear": F.dayofyear,
    "epochseconds": lambda c: F.unix_timestamp(c.cast("timestamp")),
    "epochmillis": lambda c: F.unix_millis(c.cast("timestamp")),
}


def qcol(name: str) -> Column:
    """Column reference by exact name. Implicit projection aliases can
    contain a dot (``a.name``); backtick-quoting stops Spark from parsing
    it as a nested-field access."""
    return F.col(f"`{name}`")


class ExprCompiler:
    """Compiles expressions against an environment + input DataFrame."""

    def __init__(self, env: Env, df: DataFrame | None, params: dict | None = None):
        self.env = env
        self.df = df
        self.params = params or {}
        # set by the projection compiler when the engine's
        # ordered_aggregates option is on: the preceding WITH's ORDER BY
        # items (A.SortItem), making collect()/first()/last() order-aware
        self.order_hint: list = []
        # lexically-scoped lambda variables for comprehensions/quantifiers
        # (compiled via Spark higher-order functions); nonzero depth also
        # suspends the Catalyst type probes — a lambda variable cannot be
        # analyzed outside its enclosing higher-order function
        self._lambda_scope: dict[str, Column] = {}
        # static type hints for lambda variables (list element types /
        # reduce accumulator init type) — the Catalyst probe cannot
        # analyze a lambda variable, but these keep e.g. string `+`
        # concat working inside lambda bodies
        self._lambda_types: dict[str, T.DataType] = {}
        self._lambda_depth = 0
        # per-AST-node type memo: _types() probes run a full Catalyst
        # analysis of the accumulated plan, and the coercion pre-check plus
        # the PLUS/DIVIDE/avg branches would otherwise probe the same
        # operand repeatedly
        self._type_cache: dict[int, T.DataType] = {}

    def _param(self, name: str):
        if name not in self.params:
            raise TranspilerBindingError(
                f"Query parameter ${name} was not supplied (pass params={{...}})"
            )
        return self.params[name]

    # -- type probing -------------------------------------------------------
    def dtype(self, col: Column) -> T.DataType:
        if self.df is None:
            raise TranspilerInternalError("No input DataFrame to probe types")
        return self.df.select(col.alias("__probe")).schema[0].dataType

    # -- entry ----------------------------------------------------------------
    def compile(self, expr: A.Expr) -> Column:
        if isinstance(expr, ColRef):
            return qcol(expr.col)
        if isinstance(expr, A.Parameter):
            v = self._param(expr.name)
            return F.array(*[F.lit(i) for i in v]) if isinstance(v, list) else F.lit(v)
        if isinstance(expr, A.Literal):
            return F.lit(expr.value)
        if isinstance(expr, A.ListLiteral):
            return F.array(*[self.compile(i) for i in expr.items])
        if isinstance(expr, A.Variable):
            if expr.name in self._lambda_scope:
                return self._lambda_scope[expr.name]
            ref = self._ref(expr.name)
            if isinstance(ref, EntityRef):
                raise TranspilerNotSupportedError(
                    f"Entity '{expr.name}' cannot be used as a value; "
                    "reference a property or aggregate it"
                )
            if isinstance(ref, (PathRef, MaterializedPathRef)):
                raise TranspilerNotSupportedError(
                    f"Path variable '{expr.name}' cannot be used as a "
                    "value; use length()/nodes()/relationships()"
                )
            return qcol(ref.col)
        if isinstance(expr, A.Property):
            if expr.alias in self._lambda_scope:
                # field access on a lambda variable (e.g. iterating
                # properties() structs, or temporal accessors on dates)
                col = self._access_field(
                    self._lambda_scope[expr.alias],
                    expr.prop,
                    known_type=self._lambda_types.get(expr.alias),
                )
                for fld in expr.path:
                    col = self._access_field(col, fld)
                return col
            ref = self._ref(expr.alias)
            if not isinstance(ref, EntityRef):
                if isinstance(ref, (PathRef, MaterializedPathRef)):
                    raise TranspilerBindingError(
                        f"'{expr.alias}' is a path variable; cannot access "
                        f"property '{expr.prop}'"
                    )
                # scalar alias: struct-field access (map literals piped
                # through WITH) or temporal accessor (d.year — extension)
                col = qcol(ref.col)
                for fld in [expr.prop, *expr.path]:
                    col = self._access_field(col, fld)
                return col
            if expr.prop not in ref.property_names:
                raise TranspilerBindingError(
                    f"Property '{expr.prop}' is not defined on '{expr.alias}'"
                )
            col = qcol(ref.col(expr.prop))
            for fld in expr.path:  # struct field or temporal accessor
                col = self._access_field(col, fld)
            return col
        if isinstance(expr, A.Unary):
            return self._unary(expr)
        if isinstance(expr, A.Binary):
            return self._binary(expr)
        if isinstance(expr, A.FuncCall):
            entity_fn = self._entity_function(expr)
            if entity_fn is not None:
                return entity_fn
            if expr.name == "duration":
                return self._duration(expr)
            if expr.name == "point":
                return self._point(expr)
            if expr.name in ("distance", "point.distance"):
                return self._point_distance(expr)
            if expr.name in ("datetime.truncate", "date.truncate"):
                return self._truncate(expr)
            if expr.name == "duration.between":
                if len(expr.args) != 2:
                    raise TranspilerBindingError(
                        "duration.between() takes two temporal arguments"
                    )
                a = self.compile(expr.args[0]).cast("timestamp")
                b = self.compile(expr.args[1]).cast("timestamp")
                return b - a  # day-time interval
            args = [self.compile(a) for a in expr.args]
            if expr.name == "size" and args:
                # Cypher size() is overloaded: list length vs string length
                if isinstance(self._types(expr.args[0], args[0]), T.ArrayType):
                    return F.size(args[0])
            if expr.name == "isempty" and args:
                # isEmpty() (extension): list / string, null stays null
                if isinstance(self._types(expr.args[0], args[0]), T.ArrayType):
                    return F.size(args[0]) == 0
                return F.length(args[0]) == 0
            return compile_scalar(expr.name, args)
        if isinstance(expr, A.AggCall):
            return self._aggregate(expr)
        if isinstance(expr, A.CaseExpr):
            return self._case(expr)
        if isinstance(expr, A.ListComprehension):
            return self._list_comprehension(expr)
        if isinstance(expr, A.Quantified):
            return self._quantified(expr)
        if isinstance(expr, A.Reduce):
            return self._reduce(expr)
        if isinstance(expr, A.FieldAccess):
            return self._access_field(self.compile(expr.base), expr.fld)
        if isinstance(expr, A.MapLiteral):
            return F.struct(
                *[self.compile(v).alias(k) for k, v in expr.items]
            )
        if isinstance(expr, A.MapProjection):
            return self._map_projection(expr)
        if isinstance(expr, A.ListIndex):
            dyn = self._entity_dynamic_property(expr)
            if dyn is not None:
                return dyn
            base = self.compile(expr.base)
            # Cypher is 0-based with negative-from-end; element_at is
            # 1-based with the same negative convention. Literal indices
            # fold to a single try_element_at (the when-branched dynamic
            # form defeats whole-stage codegen on some Spark builds).
            if isinstance(expr.index, A.Literal) and isinstance(
                expr.index.value, int
            ):
                v = expr.index.value
                if v >= 0:
                    # F.get is 0-based and null-safe, and unlike
                    # try_element_at its codegen survives struct-field
                    # extraction on the result (janino rvalue bug)
                    return F.get(base, v)
                return F.try_element_at(base, F.lit(v))
            idx = self.compile(expr.index)
            return F.when(idx >= 0, F.try_element_at(base, idx + 1)).otherwise(
                F.try_element_at(base, idx)
            )
        if isinstance(expr, A.ListSlice):
            base = self.compile(expr.base)
            n = F.size(base)
            start = (
                F.lit(0) if expr.start is None else self.compile(expr.start)
            )
            stop = n if expr.stop is None else self.compile(expr.stop)
            # normalize negative bounds, clamp to [0, n], end-exclusive
            s = F.greatest(F.when(start < 0, start + n).otherwise(start), F.lit(0))
            t = F.least(F.when(stop < 0, stop + n).otherwise(stop), n)
            sliced = F.slice(base, s + 1, F.greatest(t - s, F.lit(0)))
            # Cypher 3VL: a null bound nulls the whole slice (the clamps
            # above would otherwise silently coerce null to 0/n)
            null_bound = None
            if expr.start is not None:
                null_bound = start.isNull()
            if expr.stop is not None:
                sn = stop.isNull()
                null_bound = sn if null_bound is None else (null_bound | sn)
            if null_bound is not None:
                return F.when(~null_bound, sliced)
            return sliced
        if isinstance(expr, A.PatternPredicate):
            raise TranspilerNotSupportedError(
                "exists(pattern) is only supported as a top-level AND "
                "conjunct of a MATCH WHERE"
            )
        raise TranspilerInternalError(f"Unknown expression node {expr!r}")

    def _access_field(
        self, col: Column, fld: str, known_type: T.DataType | None = None
    ) -> Column:
        """Resolve ``.fld`` on a value: struct field when the (probed or
        hinted) type is a struct, temporal accessor (extension —
        ``x.year``, ``x.dayOfWeek``, ``x.epochMillis``) on date/timestamp
        values, else Catalyst-checked getField."""
        t = known_type
        if t is None and not self._lambda_depth:
            try:
                t = self.dtype(col)
            except Exception:
                t = None
        if isinstance(t, T.StructType):
            # point accessors (extension): latitude/longitude read the
            # y/x fields of a point struct (x = longitude, Neo4j order)
            if (
                fld.lower() in ("latitude", "longitude", "height")
                and fld not in t.names
                and {"x", "y", "crs"} <= set(t.names)
            ):
                return col.getField(
                    {"latitude": "y", "longitude": "x", "height": "z"}[
                        fld.lower()
                    ]
                )
            return col.getField(fld)
        acc = _TEMPORAL_ACCESSORS.get(fld.lower())
        if acc is not None and (t is None or isinstance(t, _TEMPORAL_TYPES)):
            return acc(col)
        if t is not None:
            # known non-struct, non-temporal type: clean error instead of
            # a raw Catalyst AnalysisException
            raise TranspilerBindingError(
                f"Field '{fld}' is not accessible on a value of type "
                f"{t.simpleString()}"
            )
        return col.getField(fld)

    def _duration(self, expr: A.FuncCall) -> Column:
        """duration({days: 3, hours: 12}) -> day-time interval;
        duration({years: 1, months: 2}) -> year-month interval
        (extension; the reference has no temporal library). Spark keeps
        the two interval families as distinct types that cannot mix in
        one value, so a map combining month-or-coarser with day-or-finer
        components is rejected with a typed error (Neo4j's mixed
        durations have no single-valued Spark representation)."""
        if len(expr.args) != 1 or not isinstance(expr.args[0], A.MapLiteral):
            raise TranspilerNotSupportedError(
                "duration() takes a single map literal, e.g. "
                "duration({days: 3, hours: 12}) or duration({years: 1})"
            )
        parts = {k.lower(): self.compile(v) for k, v in expr.args[0].items}
        dt_keys = {"weeks", "days", "hours", "minutes", "seconds", "milliseconds"}
        ym_keys = {"years", "quarters", "months"}
        bad = set(parts) - dt_keys - ym_keys
        if bad:
            raise TranspilerNotSupportedError(
                f"duration() components {sorted(bad)} are not supported; "
                "use years/quarters/months or "
                "weeks/days/hours/minutes/seconds/milliseconds"
            )
        zero = F.lit(0)
        if parts.keys() & ym_keys:
            if parts.keys() & dt_keys:
                raise TranspilerNotSupportedError(
                    "duration() cannot mix month-or-coarser components "
                    f"({sorted(parts.keys() & ym_keys)}) with day-or-finer "
                    f"({sorted(parts.keys() & dt_keys)}): Spark's "
                    "year-month and day-time interval types cannot combine "
                    "into one value — build two durations and add them to "
                    "the temporal value separately"
                )
            months = (
                parts.get("months", zero)
                + parts.get("quarters", zero) * F.lit(3)
            )
            return F.make_ym_interval(parts.get("years", zero), months)
        days = parts.get("days", zero) + parts.get("weeks", zero) * F.lit(7)
        secs = (
            parts.get("seconds", zero).cast("double")
            + parts.get("milliseconds", zero).cast("double") / F.lit(1000.0)
        )
        return F.make_dt_interval(
            days, parts.get("hours", zero), parts.get("minutes", zero), secs
        )

    # spatial points (extension; the reference has no spatial library) are
    # plain structs (x double, y double, crs string) — for geographic
    # points x = longitude, y = latitude, mirroring Neo4j's storage order
    _EARTH_RADIUS_M = 6_371_008.8  # IUGG mean Earth radius (spherical model)

    def _point(self, expr: A.FuncCall) -> Column:
        """point({x, y[, z]}) -> cartesian / cartesian-3d point;
        point({latitude, longitude[, height]}) -> geographic 'wgs-84' /
        'wgs-84-3d' point (round 6: 3D added). Compiles to a struct
        column (x, y, z, crs — z null for 2D so 2D and 3D points share
        one schema); accessors p.x / p.y / p.z / p.crs are plain field
        reads and p.latitude / p.longitude / p.height map onto y / x / z."""
        if len(expr.args) != 1 or not isinstance(expr.args[0], A.MapLiteral):
            raise TranspilerNotSupportedError(
                "point() takes a single map literal, e.g. point({x: 1.0, "
                "y: 2.0}) or point({latitude: 48.8, longitude: 2.3})"
            )
        parts = {k.lower(): self.compile(v) for k, v in expr.args[0].items}
        z = None
        if set(parts) == {"x", "y"}:
            x, y, crs = parts["x"], parts["y"], "cartesian"
        elif set(parts) == {"x", "y", "z"}:
            x, y, z, crs = parts["x"], parts["y"], parts["z"], "cartesian-3d"
        elif set(parts) == {"latitude", "longitude"}:
            x, y, crs = parts["longitude"], parts["latitude"], "wgs-84"
        elif set(parts) == {"latitude", "longitude", "height"}:
            x, y, z, crs = (
                parts["longitude"],
                parts["latitude"],
                parts["height"],
                "wgs-84-3d",
            )
        else:
            raise TranspilerNotSupportedError(
                "point() needs exactly the keys {x, y[, z]} (cartesian) "
                "or {latitude, longitude[, height]} (geographic); got "
                f"{sorted(parts) or '{}'}"
            )
        return F.struct(
            x.cast("double").alias("x"),
            y.cast("double").alias("y"),
            (F.lit(None) if z is None else z).cast("double").alias("z"),
            F.lit(crs).alias("crs"),
        )

    def _point_distance(self, expr: A.FuncCall) -> Column:
        """distance(p1, p2) / point.distance(p1, p2): Euclidean for
        cartesian pairs (2D and 3D); haversine great-circle metres
        (spherical Earth, IUGG mean radius 6371008.8 m) for geographic
        pairs, with the 3D form adding the height delta pythagorean-style
        (Neo4j's wgs-84-3d rule); null for mismatched or unknown CRS
        (Neo4j's mixed-CRS behavior)."""
        if len(expr.args) != 2:
            raise TranspilerBindingError(
                "distance() takes two point arguments"
            )
        p1 = self.compile(expr.args[0])
        p2 = self.compile(expr.args[1])
        x1, y1 = p1.getField("x"), p1.getField("y")
        x2, y2 = p2.getField("x"), p2.getField("y")
        z1, z2 = p1.getField("z"), p2.getField("z")
        eucl = F.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
        eucl3 = F.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2)
        lat1, lat2 = F.radians(y1), F.radians(y2)
        dlat, dlon = lat2 - lat1, F.radians(x2) - F.radians(x1)
        h = (
            F.sin(dlat / 2) ** 2
            + F.cos(lat1) * F.cos(lat2) * F.sin(dlon / 2) ** 2
        )
        hav = F.lit(2.0 * self._EARTH_RADIUS_M) * F.asin(F.sqrt(h))
        hav3 = F.sqrt(hav ** 2 + (z1 - z2) ** 2)
        c1, c2 = p1.getField("crs"), p2.getField("crs")
        return (
            F.when((c1 == "cartesian") & (c2 == "cartesian"), eucl)
            .when((c1 == "cartesian-3d") & (c2 == "cartesian-3d"), eucl3)
            .when((c1 == "wgs-84") & (c2 == "wgs-84"), hav)
            .when((c1 == "wgs-84-3d") & (c2 == "wgs-84-3d"), hav3)
        )

    _TRUNC_UNITS = frozenset(
        {"year", "quarter", "month", "week", "day", "hour", "minute", "second"}
    )

    def _truncate(self, expr: A.FuncCall) -> Column:
        """datetime.truncate('month', x) / date.truncate('month', x)
        (extension) — Spark date_trunc; the date form casts back to DATE."""
        if (
            len(expr.args) != 2
            or not isinstance(expr.args[0], A.Literal)
            or not isinstance(expr.args[0].value, str)
        ):
            raise TranspilerNotSupportedError(
                f"{expr.name}() takes a literal unit string and a temporal "
                "value, e.g. datetime.truncate('month', x)"
            )
        unit = expr.args[0].value.lower()
        if unit not in self._TRUNC_UNITS:
            raise TranspilerNotSupportedError(
                f"{expr.name}() unit '{unit}' is not supported; use one of "
                f"{sorted(self._TRUNC_UNITS)}"
            )
        out = F.date_trunc(unit, self.compile(expr.args[1]))
        if expr.name.startswith("date."):
            out = out.cast("date")
        return out

    def _is_hetero_dynamic(self, expr) -> bool:
        """True when ``expr`` is a computed-key ``n[k]`` whose entity has
        a mixed-type property schema — the when-chain string-renders the
        value (see _entity_dynamic_property), so arithmetic on it gets a
        typed rejection in _binary."""
        if not isinstance(expr, A.ListIndex):
            return False
        if (
            not isinstance(expr.base, A.Variable)
            or expr.base.name in self._lambda_scope
        ):
            return False
        ref = self.env.get(expr.base.name)
        if not isinstance(ref, EntityRef):
            return False
        if isinstance(expr.index, A.Literal) and isinstance(
            expr.index.value, str
        ):
            return False  # literal key = static native-typed access
        sch = ref.node if ref.kind == "node" else ref.edge
        declared = {p.name: p.data_type for p in sch.properties}
        types = {declared.get(p, "string") for p in ref.property_names}
        return len(types) > 1

    def _entity_dynamic_property(self, expr: A.ListIndex) -> Column | None:
        """``n[key]`` — dynamic property access on a node/relationship
        (extension; Neo4j parity). With a literal string key it is the
        static ``n.key`` access; with a computed key it compiles to a
        when-chain over the entity's declared properties (the schema is
        fixed, so the chain is bounded), Catalyst unifying the branch
        types (mixed-type schemas coerce, e.g. double+string -> string;
        a genuinely incompatible mix raises at analysis). Unknown keys
        yield null, matching Neo4j."""
        if (
            not isinstance(expr.base, A.Variable)
            or expr.base.name in self._lambda_scope
        ):
            return None
        try:
            ref = self._ref(expr.base.name)
        except TranspilerBindingError:
            return None
        if not isinstance(ref, EntityRef):
            return None
        if isinstance(expr.index, A.Literal) and isinstance(expr.index.value, str):
            prop = expr.index.value
            if prop not in ref.property_names:
                # unknown keys yield null (Neo4j parity) — dynamic access
                # is deliberately lenient where static n.key raises
                return F.lit(None).cast("string")
            return qcol(ref.col(prop))
        idx = self.compile(expr.index)
        sch = ref.node if ref.kind == "node" else ref.edge
        declared = {p.name: p.data_type for p in sch.properties}
        types = {declared.get(p, "string") for p in ref.property_names}
        uniform = len(types) == 1
        col = F.lit(None).cast("string") if not uniform else F.lit(None)
        for p in ref.property_names:
            branch = qcol(ref.col(p))
            if not uniform:
                # heterogeneous schema: every branch renders as string so
                # the when-chain has one type (ANSI-safe; Neo4j returns
                # ANY, which a single relational column cannot) — with a
                # literal key use n.key for the native type
                branch = branch.cast("string")
            col = F.when(idx == F.lit(p), branch).otherwise(col)
        return col

    def _entity_function(self, expr: A.FuncCall) -> Column | None:
        """labels(n) / type(r) / id(n) — extensions over entity aliases
        (openCypher staples the reference lacks). Labels and types are
        schema constants here (single-label model), so they fold to
        literals; id(n) is the node's id column, id(r) the edge's
        (source, sink) pair as a struct."""
        if expr.name in ("startnode", "endnode"):
            raise TranspilerNotSupportedError(
                f"{expr.name}() as a standalone value is not supported; "
                "use id(startNode(r)) / id(endNode(r)) for the endpoint id, "
                "or bind the endpoint with its own alias in the pattern"
            )
        if expr.name not in (
            "labels",
            "type",
            "id",
            "elementid",  # Neo4j 5 spelling; same surrogate as id()
            "keys",
            "properties",
            "length",
            "nodes",
            "relationships",
        ):
            return None
        if (
            len(expr.args) == 1
            and isinstance(expr.args[0], A.FuncCall)
            and expr.args[0].name in ("startnode", "endnode")
        ):
            # id(startNode(r)) / id(endNode(r)) — the endpoint id IS an
            # edge column, no join needed. Other uses of startNode/endNode
            # need the full node row: bind the endpoint with its own alias
            # in the pattern instead.
            inner = expr.args[0]
            if expr.name not in ("id", "elementid"):
                raise TranspilerNotSupportedError(
                    f"{expr.name}(startNode()/endNode()) is not supported; "
                    "bind the endpoint with its own alias in the pattern"
                )
            if len(inner.args) != 1 or not isinstance(inner.args[0], A.Variable):
                raise TranspilerBindingError(
                    "startNode()/endNode() take a relationship alias"
                )
            rref = self._ref(inner.args[0].name)
            if not isinstance(rref, EntityRef) or rref.kind != "edge":
                raise TranspilerBindingError(
                    "startNode()/endNode() require a relationship alias"
                )
            prop = (
                rref.edge.source_id_property
                if inner.name == "startnode"
                else rref.edge.sink_id_property
            )
            return qcol(rref.col(prop))
        if len(expr.args) != 1 or not isinstance(expr.args[0], A.Variable):
            raise TranspilerBindingError(
                f"{expr.name}() takes a single node/relationship/path alias"
            )
        ref = self._ref(expr.args[0].name)
        if isinstance(ref, MaterializedPathRef):
            # multi-variant bounded path: the functions were materialized
            # as columns before the variant union
            col = {
                "length": ref.len_col,
                "nodes": ref.nodes_col,
                "relationships": ref.rels_col,
            }.get(expr.name)
            if col is None:
                raise TranspilerBindingError(
                    f"{expr.name}() is not defined on a path variable"
                )
            return qcol(col)
        if isinstance(ref, PathRef):
            return self._path_function(expr.name, ref)
        if expr.name in ("length", "nodes", "relationships"):
            raise TranspilerBindingError(
                f"{expr.name}() requires a path variable, "
                f"'{expr.args[0].name}' is not one"
            )
        if not isinstance(ref, EntityRef):
            raise TranspilerBindingError(
                f"{expr.name}() requires a node/relationship alias, "
                f"'{expr.args[0].name}' is a value"
            )
        if expr.name == "labels":
            if ref.kind != "node":
                raise TranspilerBindingError("labels() requires a node alias")
            if ref.node.label_property is not None:
                # `(n:A|B)` tagged-union node: per-row discriminator column
                return F.array(qcol(ref.col(ref.node.label_property)))
            return F.array(F.lit(ref.node.label))
        if expr.name == "type":
            if ref.kind != "edge":
                raise TranspilerBindingError(
                    "type() requires a relationship alias"
                )
            if ref.edge.type_property is not None:
                # `[:A|B]` union edge: per-row discriminator column
                return qcol(ref.col(ref.edge.type_property))
            return F.lit(ref.edge.display_verb or ref.edge.verb)
        if expr.name == "keys":
            # schema constant (single-label model): the declared property
            # names, internal columns excluded
            return F.array(
                *[
                    F.lit(p)
                    for p in ref.property_names
                    if not p.startswith("__")
                ]
            )
        if expr.name == "properties":
            return self._properties_struct(ref)
        if ref.kind == "node":
            return qcol(ref.col(ref.node.id_property))
        return F.struct(
            qcol(ref.col(ref.edge.source_id_property)).alias("src"),
            qcol(ref.col(ref.edge.sink_id_property)).alias("dst"),
        )

    def _ref(self, alias: str):
        ref = self.env.get(alias)
        if ref is None:
            raise TranspilerBindingError(f"Alias '{alias}' does not exist")
        return ref

    def _map_projection(self, expr: "A.MapProjection") -> Column:
        """``alias {.prop, .*, key: e, var}`` → named STRUCT (the
        entity-struct model of properties()/RETURN n). Duplicate keys
        keep first position, last value (Neo4j override order); a null
        entity (unmatched OPTIONAL MATCH) projects to a null struct."""
        ref = self._ref(expr.alias)
        if not isinstance(ref, EntityRef):
            return self._map_projection_value(expr, ref)
        mp, disc = self._member_shapes(ref)
        if mp and any(kind == "all" for kind, _ in expr.items):
            # `.*` over a tagged union (round 9): expand each row to its
            # MEMBER's own properties — per-row shapes need VARIANT
            nonnull = None
            for c in ref.key_cols():
                k = qcol(c).isNotNull()
                nonnull = k if nonnull is None else (nonnull | k)
            lbl = qcol(ref.col(disc))
            out = None
            for m, props in mp:
                m_entries: dict[str, Column] = {}
                for kind, v in expr.items:
                    if kind == "prop":
                        m_entries[v] = qcol(ref.col(v))
                    elif kind == "all":
                        for p in props:
                            m_entries[p] = qcol(ref.col(p))
                    elif kind == "entry":
                        key, e = v
                        m_entries[key] = self.compile(e)
                    else:
                        m_entries[v] = self.compile(A.Variable(v))
                st_m = F.to_variant_object(
                    F.struct(*[c.alias(k) for k, c in m_entries.items()])
                )
                cond = lbl == F.lit(m)
                out = (
                    F.when(cond, st_m) if out is None else out.when(cond, st_m)
                )
            return F.when(nonnull, out)
        entries: dict[str, Column] = {}
        for kind, v in expr.items:
            if kind == "prop":
                # validate_expr checked membership; ref.col namespaces
                entries[v] = qcol(ref.col(v))
            elif kind == "all":
                for p in ref.property_names:
                    if not p.startswith("__"):
                        entries[p] = qcol(ref.col(p))
            elif kind == "entry":
                key, e = v
                entries[key] = self.compile(e)
            else:  # bare-variable shorthand `var` == `var: var`
                entries[v] = self.compile(A.Variable(v))
        st = F.struct(*[c.alias(k) for k, c in entries.items()])
        nonnull = None
        for c in ref.key_cols():
            k = qcol(c).isNotNull()
            nonnull = k if nonnull is None else (nonnull | k)
        return F.when(nonnull, st)

    def _map_projection_value(self, expr: "A.MapProjection", ref) -> Column:
        """Map projection over a piped MAP/STRUCT value (Neo4j allows
        projecting from map values, not just entities): `.prop` reads the
        struct field, `.*` enumerates the fields from the Catalyst schema.
        A null base value projects to null (Neo4j's null map)."""
        from ..plans.logical import ValueRef

        if not isinstance(ref, ValueRef):
            raise TranspilerNotSupportedError(
                f"Map projection over '{expr.alias}' needs an entity or a "
                "map-typed value alias"
            )
        base = qcol(ref.col)
        dtype = None
        if self.df is not None:
            try:
                dtype = self.df.select(base).schema[0].dataType
            except Exception:
                dtype = None
        if not isinstance(dtype, T.StructType):
            raise TranspilerNotSupportedError(
                f"Map projection over value '{expr.alias}' needs a "
                "map/struct-typed column (got "
                f"{dtype.simpleString() if dtype is not None else 'an unresolvable type'})"
            )
        fields = [f.name for f in dtype.fields]
        entries: dict[str, Column] = {}
        for kind, v in expr.items:
            if kind == "prop":
                if v not in fields:
                    raise TranspilerBindingError(
                        f"Map value '{expr.alias}' has no field '{v}' "
                        f"(fields: {', '.join(fields)})"
                    )
                entries[v] = base.getField(v)
            elif kind == "all":
                for p in fields:
                    entries[p] = base.getField(p)
            elif kind == "entry":
                key, e = v
                entries[key] = self.compile(e)
            else:
                entries[v] = self.compile(A.Variable(v))
        st = F.struct(*[c.alias(k) for k, c in entries.items()])
        return F.when(base.isNotNull(), st)

    @staticmethod
    def _member_shapes(ref):
        """(member_properties, discriminator column name) for tagged-union
        entities — nodes keyed by __label, virtual union EDGES keyed by
        __type (round 9) — or (None, None) for ordinary entities."""
        if ref.kind == "node":
            mp = getattr(ref.node, "member_properties", None)
            return (mp, ref.node.label_property) if mp else (None, None)
        mp = getattr(ref.edge, "member_properties", None)
        return (mp, ref.edge.type_property) if mp else (None, None)

    def _properties_struct(self, ref: EntityRef) -> Column:
        """The entity as one STRUCT column keyed by property name
        (heterogeneous value types — a Spark map would force a common
        value type). Backs ``properties(n)``, ``RETURN n`` entity
        projection, and ``collect(n)``. An unmatched OPTIONAL MATCH
        entity (null surrogate key) is a null STRUCT, matching Neo4j's
        null node — not a struct of nulls.

        Tagged-union entities (`(n:A|B)`, round 9 — VERDICT r8 #5): each
        row yields its MEMBER's shape, not the null-padded merged struct
        — a per-row shape needs Spark 4 VARIANT (one struct schema per
        column otherwise), built per member branch on the __label
        discriminator, exactly Neo4j's per-node property maps."""
        nonnull = None
        for c in ref.key_cols():
            k = qcol(c).isNotNull()
            nonnull = k if nonnull is None else (nonnull | k)
        mp, disc = self._member_shapes(ref)
        if mp:
            lbl = qcol(ref.col(disc))
            out = None
            for m, props in mp:
                st_m = F.to_variant_object(
                    F.struct(*[qcol(ref.col(p)).alias(p) for p in props])
                )
                cond = lbl == F.lit(m)
                out = (
                    F.when(cond, st_m) if out is None else out.when(cond, st_m)
                )
            return F.when(nonnull, out)
        st = F.struct(
            *[
                qcol(ref.col(p)).alias(p)
                for p in ref.property_names
                if not p.startswith("__")
            ]
        )
        return F.when(nonnull, st)

    def _path_function(self, name: str, ref: PathRef) -> Column:
        """length/nodes/relationships over a bound pattern variable.
        Fixed-length path: length folds to a literal; nodes() is the array
        of node ids in pattern order; relationships() the array of
        (src, dst[, type]) structs."""
        def is_dist_hop(r: EntityRef) -> bool:
            # shortestPath() virtual hops carry their true hop count
            return "__dist" in r.edge.property_names

        if name == "length":
            total = None
            for r in ref.rel_refs:
                hop = qcol(r.col("__dist")) if is_dist_hop(r) else F.lit(1)
                total = hop if total is None else total + hop
            if total is None:
                return F.lit(0).cast("long")
            return total.cast("long")
        if any(is_dist_hop(r) for r in ref.rel_refs):
            # shortestPath: a single-hop pattern (parser invariant). The
            # engine materializes the path's node array as __nodes when
            # the query asks for nodes()/relationships().
            r = ref.rel_refs[0]
            if len(ref.rel_refs) == 1 and "__nodes" in r.edge.property_names:
                nodes = qcol(r.col("__nodes"))
                if name == "nodes":
                    return nodes
                if name == "relationships":
                    if "__types" in r.edge.property_names:
                        # multi-verb enumerated paths carry the ACTUAL
                        # per-hop verb (round-11 continuation) — exact
                        # type(r) per traversed relationship instead of
                        # the joined display verb
                        types = qcol(r.col("__types"))

                        def type_at(i):
                            return F.get(types, i)

                    else:
                        verb = r.edge.display_verb or r.edge.verb

                        def type_at(i):
                            return F.lit(verb)

                    return F.transform(
                        F.slice(nodes, F.lit(1), F.size(nodes) - 1),
                        lambda x, i: F.struct(
                            x.alias("src"),
                            F.get(nodes, i + 1).alias("dst"),
                            type_at(i).alias("type"),
                        ),
                    )
            raise TranspilerNotSupportedError(
                f"{name}() is not available on a shortestPath() pattern — "
                "the interior nodes of a reachability path are not "
                "materialized; use length()"
            )
        if name == "nodes":
            return F.array(
                *[qcol(r.col(r.node.id_property)) for r in ref.node_refs]
            )
        if name == "relationships":
            structs = []
            for r in ref.rel_refs:
                fields = [
                    qcol(r.col(r.edge.source_id_property)).alias("src"),
                    qcol(r.col(r.edge.sink_id_property)).alias("dst"),
                ]
                if r.edge.type_property is not None:
                    fields.append(
                        qcol(r.col(r.edge.type_property)).alias("type")
                    )
                else:
                    fields.append(
                        F.lit(r.edge.display_verb or r.edge.verb).alias("type")
                    )
                structs.append(F.struct(*fields))
            return F.array(*structs)
        raise TranspilerBindingError(
            f"{name}() is not defined on a path variable"
        )  # pragma: no cover

    # -- comprehensions / quantifiers (Spark higher-order functions) -----------
    def _elem_type(self, lst: Column) -> T.DataType | None:
        """Element type of a list Column, probed OUTSIDE lambda scope
        (inside one the probe cannot analyze); None when unknown."""
        if self._lambda_depth:
            return None
        try:
            t = self.dtype(lst)
        except Exception:
            return None
        return t.elementType if isinstance(t, T.ArrayType) else None

    def _lambda_body(self, var: str, body: A.Expr, var_type=None):
        """A Python callable compiling ``body`` with ``var`` bound to the
        higher-order function's lambda Column (typed via ``var_type``
        when the element type is known)."""

        def fn(x: Column) -> Column:
            outer = self._lambda_scope.get(var)
            outer_t = self._lambda_types.get(var)
            self._lambda_scope[var] = x
            if var_type is not None:
                self._lambda_types[var] = var_type
            self._lambda_depth += 1
            try:
                return self.compile(body)
            finally:
                self._lambda_depth -= 1
                if outer is None:
                    del self._lambda_scope[var]
                else:
                    self._lambda_scope[var] = outer
                if var_type is not None:
                    if outer_t is None:
                        self._lambda_types.pop(var, None)
                    else:
                        self._lambda_types[var] = outer_t

        return fn

    def _list_comprehension(self, expr: A.ListComprehension) -> Column:
        col = self.compile(expr.list_expr)
        et = self._elem_type(col)
        if expr.where is not None:
            col = F.filter(col, self._lambda_body(expr.var, expr.where, et))
        if expr.map_expr is not None:
            col = F.transform(
                col, self._lambda_body(expr.var, expr.map_expr, et)
            )
        return col

    def _reduce(self, expr: A.Reduce) -> Column:
        """reduce(acc = init, x IN list | body) -> F.aggregate: the merge
        lambda binds BOTH the accumulator and element variables.

        F.aggregate requires merge-result type == init type EXACTLY, so a
        numeric init is promoted to its widest category (long / double)
        and the merge result is pinned to it — `reduce(acc = 0, ...)`
        over bigints then analyzes. Mixed int/float folds follow the
        INIT's category (documented divergence: Neo4j would widen)."""
        lst = self.compile(expr.list_expr)
        init = self.compile(expr.init)
        target: str | None = None
        init_t: T.DataType | None = None
        if not self._lambda_depth:
            try:
                init_t = self._types(expr.init, init)
            except Exception:  # pragma: no cover — unanalyzable init
                init_t = None
            if isinstance(
                init_t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                target = "long"
            elif isinstance(init_t, (T.FloatType, T.DoubleType)):
                target = "double"
        if target is not None:
            init = init.cast(target)
        acc_t = (
            T.LongType()
            if target == "long"
            else T.DoubleType()
            if target == "double"
            else init_t
        )
        elem_t = self._elem_type(lst)

        def merge(acc: Column, x: Column) -> Column:
            outer_acc = self._lambda_scope.get(expr.acc)
            outer_x = self._lambda_scope.get(expr.var)
            outer_ts = {
                n: self._lambda_types.get(n) for n in (expr.acc, expr.var)
            }
            self._lambda_scope[expr.acc] = acc
            self._lambda_scope[expr.var] = x
            if acc_t is not None:
                self._lambda_types[expr.acc] = acc_t
            if elem_t is not None:
                self._lambda_types[expr.var] = elem_t
            self._lambda_depth += 1
            try:
                out = self.compile(expr.body)
                return out.cast(target) if target is not None else out
            finally:
                self._lambda_depth -= 1
                for name, outer in ((expr.acc, outer_acc), (expr.var, outer_x)):
                    if outer is None:
                        del self._lambda_scope[name]
                    else:
                        self._lambda_scope[name] = outer
                for n, t in outer_ts.items():
                    if t is None:
                        self._lambda_types.pop(n, None)
                    else:
                        self._lambda_types[n] = t

        return F.aggregate(lst, init, merge)

    def _quantified(self, expr: A.Quantified) -> Column:
        lst = self.compile(expr.list_expr)
        pred = self._lambda_body(expr.var, expr.where, self._elem_type(lst))
        if expr.kind == "all":
            return F.forall(lst, pred)
        if expr.kind == "any":
            return F.exists(lst, pred)
        if expr.kind == "none":
            return ~F.exists(lst, pred)
        # single(): openCypher 3VL — false when two+ elements satisfy the
        # predicate (no null can change that), null when the outcome still
        # depends on a null predicate result, else true-count == 1.
        # (all/any/none inherit the same 3VL from forall/exists.)
        trues = F.size(F.filter(lst, lambda x: pred(x).isNotNull() & pred(x)))
        has_null = F.exists(lst, lambda x: pred(x).isNull())
        return (
            F.when(lst.isNull(), F.lit(None).cast("boolean"))
            .when(trues >= 2, F.lit(False))
            .when(has_null, F.lit(None).cast("boolean"))
            .otherwise(trues == 1)
        )

    # -- operators ---------------------------------------------------------------
    def _unary(self, expr: A.Unary) -> Column:
        c = self.compile(expr.operand)
        if expr.op == "-":
            return -c
        if expr.op == "+":
            return c
        if expr.op == "NOT":
            return ~c
        raise TranspilerInternalError(f"Unknown unary operator {expr.op}")

    def _binary(self, expr: A.Binary) -> Column:
        op = expr.op
        if op == A.BinaryOp.IN:
            left = self.compile(expr.left)
            if isinstance(expr.right, A.Parameter):
                v = self._param(expr.right.name)
                if isinstance(v, list):
                    return left.isin(v)
                return left == F.lit(v)
            if isinstance(expr.right, A.ListLiteral):
                if all(isinstance(i, A.Literal) for i in expr.right.items):
                    return left.isin([i.value for i in expr.right.items])
                return F.array_contains(
                    F.array(*[self.compile(i) for i in expr.right.items]), left
                )
            return F.array_contains(self.compile(expr.right), left)
        if op in (
            A.BinaryOp.PLUS,
            A.BinaryOp.MINUS,
            A.BinaryOp.MULTIPLY,
            A.BinaryOp.DIVIDE,
            A.BinaryOp.MODULO,
            A.BinaryOp.POW,
        ):
            # round 6 guard (ADVICE r5): a computed-key n[k] over a
            # heterogeneous property schema string-renders its value, so
            # feeding it into arithmetic would concat or fail where Neo4j
            # would add — reject with a typed error instead
            for side in (expr.left, expr.right):
                if self._is_hetero_dynamic(side):
                    raise TranspilerNotSupportedError(
                        "Dynamic property access with a computed key over "
                        "a mixed-type property schema renders as a string "
                        "and cannot feed arithmetic; use the static n.key "
                        "access (native type) or toInteger()/toFloat() "
                        "the value explicitly"
                    )
        l, r = self.compile(expr.left), self.compile(expr.right)
        self._check_binary_types(expr, l, r)
        if op == A.BinaryOp.AND:
            return l & r
        if op == A.BinaryOp.OR:
            return l | r
        if op == A.BinaryOp.XOR:
            return (l & ~r) | (~l & r)
        if op == A.BinaryOp.EQ:
            return l == r
        if op == A.BinaryOp.NEQ:
            return l != r
        if op == A.BinaryOp.LT:
            return l < r
        if op == A.BinaryOp.LE:
            return l <= r
        if op == A.BinaryOp.GT:
            return l > r
        if op == A.BinaryOp.GE:
            return l >= r
        if op == A.BinaryOp.REGMATCH:
            # openCypher '=~' matches the ENTIRE string; regexp_like is
            # find-anywhere, so anchor the pattern in a non-capturing group
            return F.regexp_like(l, F.concat(F.lit("^(?:"), r, F.lit(")$")))
        if op == A.BinaryOp.PLUS:
            lt, rt = self._types(expr.left, l), self._types(expr.right, r)
            if isinstance(lt, T.StringType) or isinstance(rt, T.StringType):
                return F.concat(l.cast("string"), r.cast("string"))
            return l + r
        if op == A.BinaryOp.MINUS:
            return l - r
        if op == A.BinaryOp.MULTIPLY:
            return l * r
        if op == A.BinaryOp.DIVIDE:
            lt, rt = self._types(expr.left, l), self._types(expr.right, r)
            if isinstance(lt, _INTEGRAL) and isinstance(rt, _INTEGRAL):
                # Cypher/T-SQL integer division truncates toward zero
                return (l / r).cast("long")
            return l / r
        if op == A.BinaryOp.MODULO:
            return l % r  # Spark % keeps the dividend sign, like T-SQL
        if op == A.BinaryOp.POW:
            return F.pow(l, r)
        raise TranspilerInternalError(f"Unknown binary operator {op}")

    # coercion taxonomy: the reference rejects unsupported (op, lhs, rhs)
    # combinations via its lookup tables (TypeCoersionTables.cs:17-1196)
    # with TranspilerNotSupportedException. We delegate fine-grained typing
    # to Catalyst, but pre-check the combinations the tables reject so the
    # user sees the same typed error instead of a raw AnalysisException.
    _ARITH_OPS = frozenset(
        {
            A.BinaryOp.PLUS,
            A.BinaryOp.MINUS,
            A.BinaryOp.MULTIPLY,
            A.BinaryOp.DIVIDE,
            A.BinaryOp.MODULO,
            A.BinaryOp.POW,
        }
    )
    _ORDER_CMP_OPS = frozenset(
        {A.BinaryOp.LT, A.BinaryOp.LE, A.BinaryOp.GT, A.BinaryOp.GE}
    )

    @staticmethod
    def _type_category(t: T.DataType) -> str:
        if isinstance(t, T.NullType):
            return "null"
        if isinstance(t, T.BooleanType):
            return "boolean"
        if isinstance(t, T.StringType):
            return "string"
        if isinstance(t, T.NumericType):
            return "numeric"
        if isinstance(t, _TEMPORAL_TYPES):
            return "datetime"
        if isinstance(t, (T.DayTimeIntervalType, T.YearMonthIntervalType)):
            return "interval"
        return "other"

    def _check_binary_types(self, expr: A.Binary, l: Column, r: Column) -> None:
        op = expr.op
        if op not in self._ARITH_OPS and op not in self._ORDER_CMP_OPS:
            return
        lt = self._type_category(self._types(expr.left, l))
        rt = self._type_category(self._types(expr.right, r))
        if "null" in (lt, rt) or "other" in (lt, rt):
            return  # nulls propagate; arrays/structs are handled elsewhere
        bad = False
        if op in self._ARITH_OPS:
            if "boolean" in (lt, rt):
                bad = True
            elif "datetime" in (lt, rt) or "interval" in (lt, rt):
                # temporal arithmetic (extension): timestamp/date ± duration,
                # duration ± duration, timestamp - timestamp -> duration;
                # everything else stays rejected like the reference
                ok_pairs = {
                    A.BinaryOp.PLUS: {
                        ("datetime", "interval"),
                        ("interval", "datetime"),
                        ("interval", "interval"),
                    },
                    A.BinaryOp.MINUS: {
                        ("datetime", "interval"),
                        ("datetime", "datetime"),
                        ("interval", "interval"),
                    },
                }.get(op, set())
                bad = (lt, rt) not in ok_pairs
            elif "string" in (lt, rt) and op != A.BinaryOp.PLUS:
                bad = True  # '+' concatenates; other arithmetic does not coerce
        else:  # < <= > >=
            if "boolean" in (lt, rt):
                bad = True  # the reference only supports = / <> on booleans
        if bad:
            raise TranspilerNotSupportedError(
                f"Operator '{op.value}' is not supported between {lt} and {rt} "
                "operands (reference TypeCoersionTables.cs rejects this "
                "combination)"
            )

    def _types(self, node: A.Expr, col: Column) -> T.DataType:
        """Cheap type resolution: literals without probing, else probe
        (memoized per AST node for this compile)."""
        if isinstance(node, A.Literal):
            v = node.value
            if v is None:
                return T.NullType()
            if isinstance(v, bool):
                return T.BooleanType()
            if isinstance(v, int):
                return T.LongType()
            if isinstance(v, float):
                return T.DoubleType()
            return T.StringType()
        if isinstance(node, A.Variable) and node.name in self._lambda_types:
            return self._lambda_types[node.name]
        if self._lambda_depth:
            # a lambda variable cannot be analyzed outside its enclosing
            # higher-order function; without a recorded hint, skip the
            # probe (NullType makes every category check pass-through).
            # Consequence: `+` on unhinted lambda values is numeric
            # addition — use toString() for concat.
            return T.NullType()
        key = id(node)
        if key not in self._type_cache:
            self._type_cache[key] = self.dtype(col)
        return self._type_cache[key]

    # -- aggregates -----------------------------------------------------------------
    def _aggregate(self, expr: A.AggCall) -> Column:
        # order-sensitive collect()/first()/last() (engine option): sort
        # each group's values by the inherited ORDER BY before
        # collecting/picking. DISTINCT keeps set semantics (unordered).
        if (
            getattr(self, "order_hint", None)
            and expr.name in ("collect", "first", "last")
            and not expr.distinct
            and expr.arg is not None
            and not (
                isinstance(expr.arg, A.Variable)
                and isinstance(self.env.get(expr.arg.name), EntityRef)
            )
        ):
            return self._ordered_aggregate(expr)
        extras = [self.compile(e) for e in expr.extras]
        if expr.arg is None:
            return compile_aggregate(expr.name, None, expr.distinct, extras)
        if isinstance(expr.arg, A.Variable):
            ref = self._ref(expr.arg.name)
            if isinstance(ref, (PathRef, MaterializedPathRef)):
                # count(p) / collect(p) — path aggregates (round 9,
                # VERDICT r8 #1: row-per-path expansion makes count(p)
                # a PATH count, Neo4j parity on finite-depth graphs).
                # A path is matched iff its marker column is non-null
                # (null under a non-matching OPTIONAL row).
                if isinstance(ref, MaterializedPathRef):
                    marker = qcol(ref.len_col)
                    shape = F.struct(
                        qcol(ref.nodes_col).alias("nodes"),
                        qcol(ref.rels_col).alias("relationships"),
                    )
                else:
                    n0 = ref.node_refs[0]
                    marker = qcol(n0.col(n0.node.id_property))
                    # fixed-length pattern: node ids + each hop's rel
                    # IDENTITY determine the path. Parallel relationships
                    # between the same endpoints (distinct type_property /
                    # identity_properties values, e.g. PLACED vs
                    # PLACED_URGENT on a union edge) are distinct Neo4j
                    # paths — node ids alone would collapse them (ADVICE
                    # r9 medium). Mirrors the planner's uniqueness
                    # key_props (planner.py:1104-1115).
                    parts: list[Column] = [
                        qcol(nr.col(nr.node.id_property))
                        for nr in ref.node_refs
                    ]
                    for rr in ref.rel_refs:
                        e = rr.edge
                        if "__nodes" in e.property_names:
                            # row-per-path / witness virtual hop: the
                            # materialized node array IS the path identity
                            parts.append(qcol(rr.col("__nodes")))
                            continue
                        if "__dist" in e.property_names:
                            parts.append(qcol(rr.col("__dist")))
                            continue
                        if e.identity_properties:
                            key_props = list(e.identity_properties)
                        else:
                            key_props = [
                                e.source_id_property,
                                e.sink_id_property,
                            ]
                            if e.type_property is not None:
                                key_props.append(e.type_property)
                        parts.extend(qcol(rr.col(kp)) for kp in key_props)
                    shape = F.struct(*parts)
                if expr.name == "count":
                    return compile_aggregate(
                        "count",
                        F.when(marker.isNotNull(), shape)
                        if expr.distinct
                        else marker,
                        expr.distinct,
                        extras,
                    )
                if expr.name == "collect" and not expr.distinct:
                    # the collected path renders as its (length, nodes,
                    # relationships) struct; unmatched OPTIONAL paths are
                    # excluded (collect_list drops null structs)
                    if isinstance(ref, MaterializedPathRef):
                        st = F.struct(
                            qcol(ref.len_col).alias("length"),
                            qcol(ref.nodes_col).alias("nodes"),
                            qcol(ref.rels_col).alias("relationships"),
                        )
                    else:
                        # plain PathRef (round 10): single-variant fixed
                        # pattern, or a row-per-path virtual hop carrying
                        # __dist/__nodes — _path_function raises a typed
                        # error for witness hops without node arrays
                        st = F.struct(
                            self._path_function("length", ref).alias(
                                "length"
                            ),
                            self._path_function("nodes", ref).alias(
                                "nodes"
                            ),
                            self._path_function(
                                "relationships", ref
                            ).alias("relationships"),
                        )
                    return F.collect_list(
                        F.when(marker.isNotNull(), st)
                    )
                raise TranspilerNotSupportedError(
                    f"Aggregate {expr.name}({'DISTINCT ' if expr.distinct else ''}"
                    f"{expr.arg.name}) over a path variable is not "
                    "supported — use count(p), collect(p), or aggregate "
                    "length(p)/nodes(p)/relationships(p)"
                )
            if isinstance(ref, EntityRef):
                if expr.name == "collect":
                    # collect(n) — the entity as its properties STRUCT
                    # (extension; pairs with RETURN n entity projection).
                    # collect_list drops null structs, so unmatched
                    # OPTIONAL entities are excluded like Neo4j
                    st = self._properties_struct(ref)
                    if expr.distinct:
                        return F.collect_set(st)
                    return F.collect_list(st)
                keys = [qcol(c) for c in ref.key_cols()]
                return compile_aggregate(
                    expr.name, None, expr.distinct, extras, entity_keys=keys
                )
        arg = self.compile(expr.arg)
        arg_type = None
        if expr.name in ("avg",):
            arg_type = self._types(expr.arg, arg)
        return compile_aggregate(
            expr.name, arg, expr.distinct, extras, arg_type=arg_type
        )

    def _ordered_aggregate(self, expr: A.AggCall) -> Column:
        """collect/first/last honoring the inherited ORDER BY: collect
        (sort key..., value) structs, array_sort with a comparator that
        mirrors the ORDER BY directions (nulls last ASC / first DESC,
        DuckDB's list(x ORDER BY ...) defaults), then project the values.
        One aggregation, no extra shuffle beyond the groupBy itself."""
        keys = [(self.compile(s.expr), s.ascending) for s in self.order_hint]
        val = self.compile(expr.arg)
        # collect_list skips null ARGUMENTS — wrap so a null value drops
        # the whole struct, matching default collect()/MIN/MAX null
        # exclusion (openCypher collect() never contains nulls)
        item = F.when(
            val.isNotNull(),
            F.struct(
                *[k.alias(f"__k{i}") for i, (k, _) in enumerate(keys)],
                val.alias("__v"),
            ),
        )

        def cmp(x: Column, y: Column) -> Column:
            result = F.lit(0)
            for i, (_, asc) in reversed(list(enumerate(keys))):
                kx, ky = x[f"__k{i}"], y[f"__k{i}"]
                lt, gt = (-1, 1) if asc else (1, -1)
                result = (
                    F.when(kx.isNull() & ky.isNull(), result)
                    .when(kx.isNull(), F.lit(1 if asc else -1))
                    .when(ky.isNull(), F.lit(-1 if asc else 1))
                    .when(kx < ky, F.lit(lt))
                    .when(kx > ky, F.lit(gt))
                    .otherwise(result)
                )
            return result

        ordered_vals = F.transform(
            F.array_sort(F.collect_list(item), cmp), lambda s: s["__v"]
        )
        if expr.name == "collect":
            return ordered_vals
        # try_element_at: an all-null group collects an EMPTY array (the
        # null-dropping wrapper above), and element_at on an empty array
        # throws under ANSI mode
        if expr.name == "first":
            return F.try_element_at(ordered_vals, F.lit(1))
        return F.try_element_at(ordered_vals, F.lit(-1))

    # -- CASE -------------------------------------------------------------------
    def _case(self, expr: A.CaseExpr) -> Column:
        branch_vals = [self.compile(v) for _, v in expr.whens]
        if expr.else_ is not None:
            branch_vals.append(self.compile(expr.else_))
        branch_nodes = [v for _, v in expr.whens] + (
            [expr.else_] if expr.else_ is not None else []
        )
        types = [self._types(n, c) for n, c in zip(branch_nodes, branch_vals)]
        any_string = any(isinstance(t, T.StringType) for t in types)
        any_other = any(
            not isinstance(t, (T.StringType, T.NullType)) for t in types
        )
        cast_string = any_string and any_other
        out = None
        for (cond, _), val in zip(expr.whens, branch_vals):
            v = val.cast("string") if cast_string else val
            c = self.compile(cond)
            out = F.when(c, v) if out is None else out.when(c, v)
        if expr.else_ is not None:
            e = branch_vals[-1]
            out = out.otherwise(e.cast("string") if cast_string else e)
        return out
