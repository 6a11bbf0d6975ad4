"""AST for the supported openCypher subset.

Mirrors the reference's IR #1 shape (SURVEY.md §3 stage 1): a query is a
UNION chain of single queries; a single query is a sequence of reading
clauses (MATCH / OPTIONAL MATCH / UNWIND) and WITH projections ending in
RETURN. Expression node kinds follow
/root/reference/src/openCypherParser/AST/Expressions/.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------


class BinaryOp(enum.Enum):
    # value (reference BinaryOperator.cs:11-37)
    PLUS = "+"
    MINUS = "-"
    MULTIPLY = "*"
    DIVIDE = "/"
    MODULO = "%"
    POW = "^"
    # logical
    AND = "AND"
    OR = "OR"
    XOR = "XOR"
    # comparison
    EQ = "="
    NEQ = "<>"
    LT = "<"
    LE = "<="
    GT = ">"
    GE = ">="
    REGMATCH = "=~"
    IN = "IN"


VALUE_OPS = {
    BinaryOp.PLUS,
    BinaryOp.MINUS,
    BinaryOp.MULTIPLY,
    BinaryOp.DIVIDE,
    BinaryOp.MODULO,
    BinaryOp.POW,
}
LOGICAL_OPS = {BinaryOp.AND, BinaryOp.OR, BinaryOp.XOR}
COMPARISON_OPS = {
    BinaryOp.EQ,
    BinaryOp.NEQ,
    BinaryOp.LT,
    BinaryOp.LE,
    BinaryOp.GT,
    BinaryOp.GE,
    BinaryOp.REGMATCH,
    BinaryOp.IN,
}


class Expr:
    """Base expression node."""

    def children(self) -> list["Expr"]:
        return []

    def walk(self):
        yield self
        for c in self.children():
            yield from c.walk()


@dataclass
class Literal(Expr):
    value: object  # None | bool | int | float | str


@dataclass
class ListLiteral(Expr):
    items: list[Expr]

    def children(self):
        return list(self.items)


@dataclass
class Variable(Expr):
    """Bare alias reference — an entity or a projected value column."""

    name: str


@dataclass
class Parameter(Expr):
    """Query parameter ``$name`` — extension (the reference rejects
    parameters, CypherVisitor.cs:1890-1912). Bound at compile time from the
    ``params`` dict passed to ``CypherEngine.cypher``."""

    name: str


@dataclass
class Property(Expr):
    """Property access ``alias.prop``. ``path`` (extension) carries any
    further struct-field segments: ``n.meta.width`` -> prop='meta',
    path=['width'] — the property resolves against the graph schema, the
    path against the column's struct type (Catalyst checks it)."""

    alias: str
    prop: str
    path: list[str] = field(default_factory=list)


@dataclass
class Binary(Expr):
    op: BinaryOp
    left: Expr
    right: Expr

    def children(self):
        return [self.left, self.right]


@dataclass
class Unary(Expr):
    op: str  # '+', '-', 'NOT'
    operand: Expr

    def children(self):
        return [self.operand]


@dataclass
class FieldAccess(Expr):
    """``<expr>.field`` on a computed struct value (extension) — e.g.
    ``relationships(p)[0].type`` or ``{a: 1}.a``. Plain ``alias.prop``
    stays Property (schema-checked); this node is Catalyst-checked."""

    base: Expr
    fld: str

    def children(self):
        return [self.base]


@dataclass
class MapLiteral(Expr):
    """``{k: v, ...}`` in expression position (extension; the reference
    rejects map literals, CypherVisitor.cs:2040-2044). Compiles to a
    named STRUCT (not a Spark map) so values keep heterogeneous types."""

    items: list[tuple[str, Expr]]

    def children(self):
        return [v for _, v in self.items]


@dataclass
class MapProjection(Expr):
    """``alias {.prop, .*, key: expr, var}`` — Neo4j map projection over
    a node/relationship entity (extension; the reference has no map
    values at all). Compiles to a named STRUCT: ``.prop`` copies a
    declared property, ``.*`` copies all of them, ``key: expr`` adds a
    computed entry, and a bare ``var`` is shorthand for ``var: var``.
    Duplicate keys keep their first position with the LAST value
    (Neo4j override order). A null entity (unmatched OPTIONAL MATCH)
    projects to a null struct — Neo4j's null map, not a map of nulls.

    ``items`` entries: ("prop", name) | ("all", None) |
    ("entry", (key, Expr)) | ("var", name)."""

    alias: str
    items: list[tuple[str, object]]

    def children(self):
        out: list[Expr] = [Variable(self.alias)]
        for kind, v in self.items:
            if kind == "entry":
                out.append(v[1])
            elif kind == "var":
                out.append(Variable(v))
        return out


@dataclass
class ListIndex(Expr):
    """``l[i]`` (extension): 0-based; negative counts from the end
    (Neo4j semantics); out-of-range -> null."""

    base: Expr
    index: Expr

    def children(self):
        return [self.base, self.index]


@dataclass
class ListSlice(Expr):
    """``l[a..b]`` (extension): 0-based, end-exclusive; open ends
    allowed (``l[..2]``, ``l[1..]``); negative bounds count from the
    end."""

    base: Expr
    start: Expr | None
    stop: Expr | None

    def children(self):
        out = [self.base]
        if self.start is not None:
            out.append(self.start)
        if self.stop is not None:
            out.append(self.stop)
        return out


@dataclass
class ListComprehension(Expr):
    """``[x IN list WHERE pred | expr]`` (extension; the reference rejects
    comprehensions, CypherVisitor.cs:1903-1912). Compiles to Spark
    higher-order functions: F.filter for WHERE, F.transform for the map
    part — fully JVM-side, no Python UDF. ``var`` is lexically scoped to
    ``where``/``map_expr``."""

    var: str
    list_expr: Expr
    where: Expr | None = None
    map_expr: Expr | None = None

    def children(self):
        out = [self.list_expr]
        if self.where is not None:
            out.append(self.where)
        if self.map_expr is not None:
            out.append(self.map_expr)
        return out


@dataclass
class Reduce(Expr):
    """``reduce(acc = init, x IN list | expr)`` (extension): openCypher
    fold, compiled to F.aggregate — both ``acc`` and ``var`` are
    lexically scoped lambda variables in ``body``."""

    acc: str
    init: Expr
    var: str
    list_expr: Expr
    body: Expr

    def children(self):
        return [self.init, self.list_expr, self.body]


@dataclass
class Quantified(Expr):
    """``all/any/none/single(x IN list WHERE pred)`` (extension).
    F.forall / F.exists / negated exists / size(filter)==1."""

    kind: str  # 'all' | 'any' | 'none' | 'single'
    var: str
    list_expr: Expr
    where: Expr

    def children(self):
        return [self.list_expr, self.where]


@dataclass
class FuncCall(Expr):
    """Scalar function call (incl. STARTS WITH / IS NULL sugar — the parser
    lowers those postfix operators into named functions, matching the
    reference Function enum, Function.cs:17-60)."""

    name: str  # lowercase
    args: list[Expr]

    def children(self):
        return list(self.args)


@dataclass
class AggCall(Expr):
    """Aggregation function call; ``arg is None`` means ``count(*)``.

    ``extras`` carries trailing arguments (percentileCont(x, 0.5))."""

    name: str  # lowercase: count avg sum min max first last stdev stdevp ...
    arg: Expr | None
    distinct: bool = False
    extras: list[Expr] = field(default_factory=list)

    def children(self):
        out = [self.arg] if self.arg is not None else []
        return out + list(self.extras)


@dataclass
class CaseExpr(Expr):
    """Searched CASE WHEN (the ``CASE <expr> WHEN`` form is rejected)."""

    whens: list[tuple[Expr, Expr]]
    else_: Expr | None

    def children(self):
        out = []
        for c, v in self.whens:
            out.append(c)
            out.append(v)
        if self.else_ is not None:
            out.append(self.else_)
        return out


AGG_FUNCTION_NAMES = {
    "count",
    "avg",
    "sum",
    "min",
    "max",
    "first",
    "last",
    "stdev",
    "stdevp",
    "percentilecont",
    "percentiledisc",
    "collect",
}


def contains_aggregate(e: Expr) -> bool:
    return any(isinstance(n, AggCall) for n in e.walk())


# ---------------------------------------------------------------------------
# Patterns
# ---------------------------------------------------------------------------


class Direction(enum.Enum):
    FORWARD = "->"  # (a)-[r]->(b)
    BACKWARD = "<-"  # (a)<-[r]-(b)
    EITHER = "--"  # (a)-[r]-(b)


@dataclass
class NodePattern:
    alias: str | None
    label: str | None
    # additional labels (extension): `(n:A:B)` — the first label is the
    # PRIMARY (binds the scan and resolves properties); each extra label
    # becomes a semi join on the node id against that label's table
    extra_labels: list[str] = field(default_factory=list)
    # inline property map `(n:L {k: v})` (extension; reference rejects at
    # CypherVisitor.cs:1094-1097) — desugared by the planner to WHERE
    # equality conjuncts on the pattern's alias
    props: list[tuple[str, Expr]] = field(default_factory=list)
    # inline pattern predicate `(n:L WHERE n.x > 1)` (Neo4j 5 syntax,
    # extension) — desugared by the planner into the clause WHERE, like
    # the property map (so it filters inside an OPTIONAL MATCH fork)
    where: Expr | None = None


@dataclass
class RelPattern:
    alias: str | None
    verb: str | None
    direction: Direction
    # bounded variable-length hops (extension; reference rejects *n..m).
    # None = ordinary single hop.
    min_hops: int | None = None
    max_hops: int | None = None
    # multiple relationship types `[:A|B]` (extension; reference rejects at
    # CypherVisitor.cs:1181-1207). ``verb`` holds the first alternative;
    # the engine rewrites the hop to a single virtual union edge before
    # planning (engine.py:_resolve_multi_verb).
    alt_verbs: list[str] = field(default_factory=list)
    # inline property map `[r:T {k: v}]` — same desugaring as NodePattern
    props: list[tuple[str, Expr]] = field(default_factory=list)
    # inline pattern predicate `[r:T WHERE r.x > 1]` (Neo4j 5 syntax,
    # extension) — single-hop only; var-length hops reject it
    where: Expr | None = None


@dataclass
class PatternPart:
    """Alternating nodes and relationships: n0 r0 n1 r1 n2 ..."""

    nodes: list[NodePattern]
    rels: list[RelPattern]
    # pattern variable `p = (...)` (extension): binds the whole path
    path_alias: str | None = None
    # `shortestPath((a)-[:V*]->(b))` (extension): the engine rewrites the
    # unbounded hop to a virtual edge carrying a __dist property;
    # length(p) then reads the real hop count
    shortest: bool = False
    # `allShortestPaths(...)` (round 11): like shortest, but EVERY
    # minimal-length relationship-unique path per endpoint pair is a row
    # (rides the enumeration; shortest alone binds one witness)
    all_shortest: bool = False

    def hops(self):
        """Yield (left_node, rel, right_node) triples."""
        for i, r in enumerate(self.rels):
            yield self.nodes[i], r, self.nodes[i + 1]


@dataclass
class PatternPredicate(Expr):
    """``exists((a)-[:V]->(b))`` / ``EXISTS { (a)-[:V]->(b) WHERE p }`` —
    a pattern used as a WHERE predicate (extension; the reference has no
    pattern predicates). Planned as a LEFT SEMI join (ANTI under NOT),
    never as a Column expression. ``where`` is the subquery form's inner
    filter, applied inside the pattern fabric (its aliases are the
    pattern's own scope, so it is not part of children())."""

    part: PatternPart
    where: "Expr | None" = None


@dataclass
class PatternComprehension(Expr):
    """``[(a)-[:V]->(b) WHERE pred | expr]`` (extension): per input row,
    the array of ``expr`` over every match of the pattern that shares
    ``a``'s binding. Planned as a grouped collect over the pattern fabric
    LEFT-joined back on the shared node ids ([] when nothing matches)."""

    part: PatternPart
    where: Expr | None
    map_expr: Expr


# ---------------------------------------------------------------------------
# Clauses / query structure
# ---------------------------------------------------------------------------


@dataclass
class MatchClause:
    patterns: list[PatternPart]
    optional: bool = False
    where: Expr | None = None
    # internal (round 7): id-equality conjuncts injected by the *0..m
    # zero-length variant expansion — kept separate from ``where`` so the
    # variant-union planner can clear the user WHERE (applied after the
    # union) without losing the variant's structural equalities
    zero_where: Expr | None = None


@dataclass
class UnwindClause:
    expr: Expr
    alias: str = ""
    # True when this UNWIND is the desugared spine of a FOREACH — its
    # alias is scoped to the FOREACH body, and a boundary after the
    # writes restores the pre-FOREACH row cardinality (writes.py prunes
    # foreach-unwinds from the boundary's reading plan)
    foreach: bool = False


@dataclass
class CallSubqueryClause:
    """``CALL { <query> }`` (modern openCypher, extension; the
    reference rejects CALL outright). The inner query's clause list ends
    with a RETURN; an optional leading ``WITH a, b`` of bare variables is
    the IMPORT clause (correlated form). The inner query may be a
    UnionQuery (uncorrelated form only).

    ``optional`` (round 7; Neo4j 5.24 OPTIONAL CALL): outer rows with no
    subquery output survive with null output columns — the correlated
    join becomes LEFT, the uncorrelated cross join a condition-less LEFT
    join."""

    query: "SingleQuery | UnionQuery"
    optional: bool = False
    # `CALL (*) { ... }` (Neo4j 5.23): import EVERY outer variable the
    # body references — the planner expands it against the outer scope
    # (the parser cannot know it) into the ordinary import-WITH form
    scope_star: bool = False
    # `CALL { ... } IN TRANSACTIONS [OF n ROWS]` (round 14; Neo4j's
    # batched bulk-write form) — only meaningful through cypher_write:
    # the driving rows are segmented into n-row batches and the body's
    # writes commit batch-by-batch (a later batch observes an earlier
    # batch's writes). The read planner rejects it with a typed error.
    in_transactions: bool = False
    batch_rows: int | None = None


@dataclass
class CallProcedureClause:
    """``CALL db.labels() [YIELD label [AS alias]]`` (extension; the
    reference rejects CALL outright). Only the schema-introspection
    procedures are supported — their result is KNOWN at plan time from the
    graph schema, so the engine desugars this clause to
    ``UNWIND [..constants..] AS alias`` (engine._resolve_procedures),
    composing with every other clause through the ordinary planner.
    ``yield_name`` is the procedure's declared output column (validated),
    ``out_alias`` the binding name (defaults to the column name)."""

    name: str  # lower-cased qualified name, e.g. "db.labels"
    yield_name: str | None = None
    out_alias: str | None = None
    standalone: bool = False  # no following clauses: implicit RETURN
    where: "Expr | None" = None  # `YIELD x WHERE p` filter (desugars to WITH)
    # round 6: literal / $param arguments (plan-time constants), e.g.
    # db.propertyKeys('Customer')
    args: list = field(default_factory=list)
    # round 10: full YIELD list [(column, alias), ...] — multi-column
    # procedures (db.index.vector.queryNodes yields node, score);
    # yield_name/out_alias mirror the FIRST item for the single-column
    # introspection procedures
    yields: list = field(default_factory=list)


@dataclass
class SortItem:
    expr: Expr
    ascending: bool = True


@dataclass
class ProjectionClause:
    """WITH ... or RETURN ... body."""

    items: list[tuple[str, Expr]]  # (output alias, expression)
    distinct: bool = False
    where: Expr | None = None  # WITH ... WHERE only
    order_by: list[SortItem] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None
    is_return: bool = False
    # `WITH *` / `RETURN *` (extension): expand to every in-scope alias
    # at plan time, before any explicit items
    star: bool = False
    # internal (round 12): aliases the star expansion must NOT carry —
    # engine desugars (lazy index-winner joins) bind helper entities that
    # would otherwise leak into user scope. Never produced by the parser.
    exclude: tuple = ()


# ---------------------------------------------------------------------------
# Write clauses (extension — the reference is a read-only transpiler and
# rejects every one of these, CypherVisitor.cs scope fence / SURVEY.md §2.7;
# here they compile to FUNCTIONAL table updates: the engine never mutates a
# registered DataFrame, it derives new ones — see writes.py)
# ---------------------------------------------------------------------------


@dataclass
class SetItem:
    """``SET alias.prop = expr`` — one property assignment."""

    alias: str
    prop: str
    expr: Expr


@dataclass
class SetPlusItem:
    """``SET alias += {map}`` — merge every key of the map expression into
    the entity (null values remove, Neo4j semantics). ``expr`` must be a
    MapLiteral or a Parameter bound to a dict at execution time."""

    alias: str
    expr: Expr


@dataclass
class SetReplaceItem:
    """``SET alias = {map}`` — REPLACE the entity's properties: every
    declared non-id property absent from the map is removed (nulled),
    Neo4j semantics. ``expr`` must be a MapLiteral or a Parameter bound
    to a dict. Desugared in writes.py to the += merge plus explicit
    null assignments for the missing properties (schema-bound, so the
    missing set is known at plan time)."""

    alias: str
    expr: Expr


@dataclass
class SetLabelItem:
    """``SET alias:Label`` — add the label's table facet (round 6
    extension: labels are tables here, so adding a label appends an
    id-sharing row to the label's table)."""

    alias: str
    label: str


@dataclass
class SetClause:
    items: list[SetItem | SetPlusItem | SetLabelItem]


@dataclass
class RemoveClause:
    """``REMOVE alias.prop`` — sugar for ``SET alias.prop = null``;
    ``REMOVE alias:Label`` drops the label's table facet row."""

    items: list[tuple[str, str]]  # (alias, prop)
    labels: list[tuple[str, str]] = field(default_factory=list)  # (alias, label)


@dataclass
class CreateClause:
    patterns: list[PatternPart]


@dataclass
class MergeClause:
    """``MERGE (n:L {props}) [ON CREATE SET ...] [ON MATCH SET ...]``."""

    pattern: PatternPart
    on_create: list[SetItem] = field(default_factory=list)
    on_match: list[SetItem] = field(default_factory=list)


@dataclass
class DeleteClause:
    aliases: list[str]
    detach: bool = False


WriteClause = SetClause | RemoveClause | CreateClause | MergeClause | DeleteClause

Clause = (
    MatchClause
    | UnwindClause
    | ProjectionClause
    | CallSubqueryClause
    | CallProcedureClause
    | WriteClause
)


@dataclass
class SingleQuery:
    clauses: list[Clause]  # ends with a ProjectionClause(is_return=True)


@dataclass
class UnionQuery:
    """left UNION [ALL] right — chained left-assoc."""

    left: "SingleQuery | UnionQuery"
    right: SingleQuery
    all: bool = False


Query = SingleQuery | UnionQuery
