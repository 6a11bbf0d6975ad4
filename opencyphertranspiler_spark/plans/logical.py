"""Logical operator DAG (IR #2).

The same five relational operators as the reference (SURVEY.md §2.1):
DataSource, Join, Selection, Projection, Set — plus Unwind/Trim for the
declared extensions. Unlike the reference (which renders these to SQL text),
each operator here compiles to a PySpark DataFrame transformation
(operators/compiler.py); Catalyst is the optimizer.

Entity columns are namespaced ``__{alias}_{prop}`` exactly like the
reference's flattened entity fields
(/root/reference/src/SQLRenderer/SQLRenderer.cs:284-288
``GetFieldNameForEntityField``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..cypher import ast as A
from ..schema import EdgeSchema, NodeSchema


# ---------------------------------------------------------------------------
# Schema refs (the planner's Field model — SURVEY.md §1.3)
# ---------------------------------------------------------------------------


@dataclass
class EntityRef:
    """A node or relationship flowing through the plan as a column group
    (the reference's EntityField, Schema.cs:44-168)."""

    alias: str
    kind: str  # 'node' | 'edge'
    node: NodeSchema | None = None
    edge: EdgeSchema | None = None
    left_is_source: bool = True  # edges: pattern-left endpoint is edge source
    col_prefix: str | None = None  # physical prefix; defaults to alias

    @property
    def prefix(self) -> str:
        return self.col_prefix or self.alias

    @property
    def label(self) -> str:
        return self.node.label if self.kind == "node" else self.edge.verb

    def col(self, prop: str) -> str:
        return f"__{self.prefix}_{prop}"

    @property
    def property_names(self) -> tuple[str, ...]:
        sch = self.node if self.kind == "node" else self.edge
        return sch.property_names

    def columns(self) -> list[str]:
        return [self.col(p) for p in self.property_names]

    def key_cols(self) -> list[str]:
        """Surrogate key columns: node id, or edge (source, sink) ids —
        plus the type discriminator for `[:A|B]` union edges, so two
        parallel edges of different types between the same node pair stay
        distinct under DISTINCT / count(DISTINCT r) / uniqueness."""
        if self.kind == "node":
            return [self.col(self.node.id_property)]
        cols = [
            self.col(self.edge.source_id_property),
            self.col(self.edge.sink_id_property),
        ]
        if self.edge.type_property is not None:
            cols.append(self.col(self.edge.type_property))
        for p in self.edge.identity_properties:
            cols.append(self.col(p))
        return cols

    def renamed(self, new_alias: str) -> "EntityRef":
        return EntityRef(
            new_alias, self.kind, self.node, self.edge, self.left_is_source, None
        )

    def with_prefix(self, prefix: str) -> "EntityRef":
        return EntityRef(
            self.alias, self.kind, self.node, self.edge, self.left_is_source, prefix
        )


@dataclass
class ValueRef:
    """A scalar column (the reference's ValueField)."""

    alias: str

    @property
    def col(self) -> str:
        return self.alias

    def columns(self) -> list[str]:
        return [self.alias]


@dataclass
class PathRef:
    """A bound pattern variable ``p = (a)-[r]->(b)`` (extension; the
    reference rejects pattern variables, CypherVisitor.cs:998-1002).

    Carries the ordered constituent node/edge refs of a FIXED-length
    pattern; consumed by length(p) / nodes(p) / relationships(p). Not a
    value: returning ``p`` itself is rejected, like entities.

    Divergence (documented): under OPTIONAL MATCH a non-matching row
    yields per-constituent nulls inside nodes()/relationships() (e.g.
    ['p1', None]) rather than Neo4j's whole-path null — the path is a
    column group here, not a nullable value."""

    alias: str
    node_refs: list[EntityRef] = field(default_factory=list)
    rel_refs: list[EntityRef] = field(default_factory=list)

    @property
    def label(self) -> str:  # for error messages
        return "path"

    @property
    def property_names(self) -> tuple[str, ...]:
        return ()

    def columns(self) -> list[str]:
        cols: list[str] = []
        for r in self.node_refs:
            for c in r.key_cols():
                if c not in cols:
                    cols.append(c)
        for r in self.rel_refs:
            # ALL rel property columns, not just the join keys: a
            # shortestPath virtual hop carries its hop count (and
            # optionally its interior nodes) as properties, which
            # length(p)/nodes(p) must still find after a WITH passthrough
            for c in r.columns():
                if c not in cols:
                    cols.append(c)
        return cols

    def renamed(self, new_alias: str) -> "PathRef":
        return PathRef(new_alias, list(self.node_refs), list(self.rel_refs))


@dataclass
class MaterializedPathRef:
    """A path variable whose length/nodes/relationships were materialized
    as physical columns. Used for multi-variant bounded ``*n..m`` paths:
    the expanded variants have DIFFERENT constituents (1-hop, 2-hop, ...),
    so the per-variant arrays are computed before the variant union and
    the path functions read the columns instead of the constituents."""

    alias: str
    len_col: str
    nodes_col: str
    rels_col: str

    @property
    def label(self) -> str:  # for error messages
        return "path"

    @property
    def property_names(self) -> tuple[str, ...]:
        return ()

    def columns(self) -> list[str]:
        return [self.len_col, self.nodes_col, self.rels_col]

    def renamed(self, new_alias: str) -> "MaterializedPathRef":
        return MaterializedPathRef(
            new_alias, self.len_col, self.nodes_col, self.rels_col
        )


Ref = EntityRef | ValueRef | PathRef | MaterializedPathRef
Env = dict[str, Ref]  # alias -> ref, insertion-ordered


class ColRef(A.Expr):
    """Planner-internal expression: a direct physical column reference.

    Used for generated predicates (join-cycle equalities, relationship
    uniqueness conjuncts) where the target column is already known.
    """

    def __init__(self, col: str):
        self.col = col

    def __repr__(self):
        return f"ColRef({self.col})"


# ---------------------------------------------------------------------------
# Operators
# ---------------------------------------------------------------------------


@dataclass
class LogicalOp:
    env: Env = field(default_factory=dict, kw_only=True)

    def children(self) -> list["LogicalOp"]:
        return []

    def describe(self, indent: int = 0) -> str:
        """Debug plan dump (the reference's DumpGraph, LogicalPlan.cs:88-110)."""
        pad = "  " * indent
        lines = [f"{pad}{self!r}"]
        for c in self.children():
            lines.append(c.describe(indent + 1))
        return "\n".join(lines)


@dataclass
class DataSourceOp(LogicalOp):
    """Scan of one or more entities backed by the SAME table rows
    (reference DataSourceOperator.cs:19-122).

    Fusion: when an edge and an endpoint node share the backing table and
    the edge's endpoint key IS the node's id column (every FK-derived edge),
    the planner binds both entities to one scan — no self-join. At 100 TB
    this removes one shuffle join per pattern hop; it is also the correct
    semantics when the surrogate id is not unique."""

    entities: list[EntityRef]

    def __repr__(self):
        parts = ", ".join(f"{e.alias}:{e.label}" for e in self.entities)
        return f"DataSource({parts})"


@dataclass
class OneRowOp(LogicalOp):
    """Source for standalone WITH/RETURN (extension; the reference rejects
    projection-only queries, CypherVisitor.cs:447-450): a single row with
    no columns — `RETURN 1+1 AS x` projects over it."""

    def __repr__(self):
        return "OneRow()"


@dataclass
class SeedOp(LogicalOp):
    """An already-compiled binding DataFrame used as the plan's source —
    the carry across a write-segment boundary (clause-sequential
    visibility, writes.py): its env maps the carried aliases to
    EntityRefs/ValueRefs whose physical ``__{alias}_{prop}`` columns the
    DataFrame already contains, so every downstream planner rule (label
    inference, piped-entity rejoin, projection scoping) applies
    unchanged."""

    df: object = None  # pyspark DataFrame

    def __repr__(self):
        return f"Seed({', '.join(self.env.keys())})"


@dataclass
class RowIdOp(LogicalOp):
    """Tag the input with a synthetic unique row-id column (round 7:
    the correlated CALL { UNION } spine — Cypher streams legally carry
    duplicate rows, and the union's distinct must dedup PER INVOCATION,
    not across identical outer rows). The compiler materializes the
    tagged stream once per op INSTANCE (identity-cached +
    localCheckpoint) so every consumer branch observes the same ids —
    monotonically_increasing_id is only partition-deterministic, and a
    post-shuffle recompute could renumber rows between branches."""

    input: LogicalOp
    col: str = ""

    def children(self):
        return [self.input]

    def __repr__(self):
        return f"RowId({self.col})"


@dataclass
class JoinOp(LogicalOp):
    """Equi/cross join (reference JoinOperator.cs:18-241). ``pairs`` are
    (left physical column, right physical column). ``drop_right`` lists right
    columns removed after an OPTIONAL-MATCH fork rejoin."""

    left: LogicalOp
    right: LogicalOp
    how: str  # 'inner' | 'left' | 'cross'
    pairs: list[tuple[str, str]] = field(default_factory=list)
    drop_right: list[str] = field(default_factory=list)
    # null-safe key equality (<=>): used by CALL { WITH scalar } join-back
    # where a null import value must still pair with its subquery rows.
    # Spark plans EqualNullSafe keys as ordinary hash joins.
    null_safe: bool = False

    def children(self):
        return [self.left, self.right]

    def __repr__(self):
        return f"Join({self.how}, on={self.pairs})"


@dataclass
class SelectionOp(LogicalOp):
    """Filter and/or ORDER BY/SKIP/LIMIT carrier (reference
    SelectionOperator.cs:20-223). Exactly one of predicate / ordering is set."""

    input: LogicalOp
    predicate: A.Expr | None = None
    order_by: list[A.SortItem] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None

    def children(self):
        return [self.input]

    def __repr__(self):
        if self.predicate is not None:
            return "Selection(filter)"
        return f"Selection(order={len(self.order_by)}, skip={self.skip}, limit={self.limit})"


@dataclass
class ProjectOp(LogicalOp):
    """WITH/RETURN projection (reference ProjectionOperator.cs:17-85).

    ``items`` is the ordered (output alias, expression) list. ``has_agg``
    triggers Cypher implicit grouping: group by every non-aggregated item.
    ``carry`` keeps (non-shadowed) input fields flowing for the
    post-projection WHERE/ORDER BY implicit-field scoping rule
    (reference LogicalPlan.cs:203-288); a TrimOp re-trims afterwards.
    """

    input: LogicalOp
    items: list[tuple[str, A.Expr]]
    distinct: bool = False
    has_agg: bool = False
    carry: bool = False
    output_aliases: list[str] = field(default_factory=list)
    # order-sensitive collect()/first()/last() (extension, engine option
    # ordered_aggregates=True): the preceding WITH's ORDER BY items, used
    # by the compiler to sort group values Neo4j-style. Empty = MIN/MAX
    # first/last parity and unordered collect (reference behavior).
    order_hint: list[A.SortItem] = field(default_factory=list)

    def children(self):
        return [self.input]

    def __repr__(self):
        flags = []
        if self.distinct:
            flags.append("distinct")
        if self.has_agg:
            flags.append("agg")
        if self.carry:
            flags.append("carry")
        return f"Projection({[a for a, _ in self.items]}{' ' + ','.join(flags) if flags else ''})"


@dataclass
class WindowLimitOp(LogicalOp):
    """Per-group ORDER BY / SKIP / LIMIT: row_number over a window
    partitioned by ``partition_cols`` (the imported node ids of a
    correlated CALL {{ }} subquery) — the top-k-per-entity idiom without
    a global sort."""

    input: LogicalOp
    partition_cols: list[str]
    order_by: list[A.SortItem] = field(default_factory=list)
    skip: int | None = None
    limit: int | None = None
    rn_col: str = "__rn"

    def children(self):
        return [self.input]

    def __repr__(self):
        return (
            f"WindowLimit(part={self.partition_cols}, "
            f"skip={self.skip}, limit={self.limit})"
        )


@dataclass
class AddColsOp(LogicalOp):
    """Append computed value columns (``df.select("*", ...)``) — carries
    the per-variant path materialization before a variant union."""

    input: LogicalOp
    items: list[tuple[str, A.Expr]]  # (physical column name, expression)
    # expressions compile against THIS env (the input's env, which may
    # contain refs — e.g. a PathRef — that the output env replaces)
    compile_env: Env = field(default_factory=dict)

    def children(self):
        return [self.input]

    def __repr__(self):
        return f"AddCols({[n for n, _ in self.items]})"


@dataclass
class TrimOp(LogicalOp):
    """Drop carried implicit fields, keeping only the projected aliases."""

    input: LogicalOp
    aliases: list[str]

    def children(self):
        return [self.input]

    def __repr__(self):
        return f"Trim({self.aliases})"


@dataclass
class ExistsFlagOp(LogicalOp):
    """exists(pattern) in boolean-EXPRESSION position (under OR / XOR /
    CASE / a projection item): LEFT join against the DISTINCT shared-key
    projection of the planned pattern, materializing a boolean
    ``flag_col`` (true where matched, null where not — consumers wrap it
    in coalesce(flag, false)). Top-level AND conjuncts keep the cheaper
    semi/anti lowering (JoinOp 'semi'/'anti'); this op exists only for
    the compositional case. env is the left env — the flag is a physical
    column, not a named value."""

    left: LogicalOp
    right: LogicalOp
    pairs: list[tuple[str, str]]  # (left id col, right id col)
    flag_col: str = ""

    def children(self):
        return [self.left, self.right]

    def __repr__(self):
        return f"ExistsFlag({self.flag_col} on {self.pairs})"


@dataclass
class CollectPatternOp(LogicalOp):
    """Pattern comprehension `[(a)-[:V]->(b) WHERE p | e]`: the pattern
    fabric aggregates map_expr per shared-key group (collect_list), then
    LEFT-joins back — one array column ``out_col`` per input row, [] when
    nothing matches. env is the left env plus the physical column."""

    left: LogicalOp
    right: LogicalOp
    pairs: list[tuple[str, str]]  # (left id col, right id col)
    map_expr: object = None  # A.Expr compiled against right.env
    out_col: str = ""

    def children(self):
        return [self.left, self.right]

    def __repr__(self):
        return f"CollectPattern({self.out_col} on {self.pairs})"


@dataclass
class SetOp(LogicalOp):
    """UNION / UNION ALL (reference SetOperator.cs:17-96)."""

    left: LogicalOp
    right: LogicalOp
    all: bool = False

    def children(self):
        return [self.left, self.right]

    def __repr__(self):
        return f"Set(union{' all' if self.all else ''})"


@dataclass
class UnwindOp(LogicalOp):
    """UNWIND <list-expr> AS alias — extension (reference rejects UNWIND;
    SURVEY.md §7.2.8 names it a post-parity goal). Compiles to explode()."""

    input: LogicalOp | None
    expr: A.Expr
    alias: str

    def children(self):
        return [self.input] if self.input is not None else []

    def __repr__(self):
        return f"Unwind({self.alias})"


def all_columns(env: Env) -> list[str]:
    cols: list[str] = []
    for ref in env.values():
        for c in ref.columns():
            if c not in cols:
                cols.append(c)
    return cols
