"""Functional write clauses: CREATE / MERGE / SET / REMOVE / DELETE.

The reference is a read-only transpiler and rejects every write clause
(CypherVisitor.cs scope fence; SURVEY.md §2.7). This module is a documented
extension that keeps the engine immutable: a write query NEVER mutates a
registered DataFrame — it derives NEW DataFrames (copy-on-write snapshot)
and returns them in a :class:`WriteResult`, whose ``.engine()`` builds a
CypherEngine over the post-write graph.

Execution model (bulk-relational, no driver-side row loops):

1. The reading prefix (MATCH / WHERE / WITH / UNWIND / CALL {}) is compiled
   by the ORDINARY read planner into one "binding" DataFrame: one row per
   match, one column per needed value (entity keys plus every SET / CREATE /
   MERGE expression result). All Cypher expressions are therefore evaluated
   by Catalyst inside the read plan — this module never interprets an
   expression itself.
2. Each write clause is then a bulk relational transformation over the
   pre-write snapshot:

   ======  ==========================================================
   SET     per-key update table + ONE equi-join against the target
           table (AQE broadcasts small update sets); conflicting
           values for the same (entity, property) resolve to
           ``max(value)`` per key — a documented, deterministic
           divergence from Neo4j's undefined last-writer order
   CREATE  ``unionByName`` of projected new rows (no shuffle)
   DELETE  ``left_anti`` join on the key set (+ FK hygiene for
           DETACH, see below)
   MERGE   distinct candidate tuples + ``left_anti`` existence check
   ======  ==========================================================

   Visibility is clause-sequential at WITH granularity (Neo4j-style,
   round 7): a statement is split into segments at each WITH boundary
   (``run_to_boundary``), every clause within a segment reads that
   segment's entry snapshot, and each boundary re-binds the carried rows
   against the post-segment tables so later segments see earlier writes.

Identity model: nodes are keyed by their declared id property, so CREATE
and MERGE require the id property in the inline map (there is no hidden
auto-id in a table-backed graph). Edges follow the schema's storage:
a standalone edge table gets appended rows; an FK-embedded edge (the edge
table IS one endpoint's node table, e.g. TPC-H ``PLACED`` living in
``orders``) is created by setting the FK column on the owning row and
detach-deleted by nulling it.

At 100 TB: the binding is one ordinary Catalyst plan (pushdown, pruning and
join strategy all apply); each write clause costs at most one shuffle.
Nothing collects to the driver except the optional validation counts
(``validate=True``; turn off for production-sized runs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cypher import ast as A
from .exceptions import (
    TranspilerBindingError,
    TranspilerInternalError,
    TranspilerNotSupportedError,
    TranspilerSyntaxError,
)
from .plans.logical import (
    EntityRef,
    MaterializedPathRef,
    PathRef,
    SeedOp,
)
from .schema import EdgeSchema, EntityProperty, GraphSchema, NodeSchema
from .sources import TableRegistry


# ---------------------------------------------------------------------------
# result types
# ---------------------------------------------------------------------------


@dataclass
class WriteResult:
    """Post-write snapshot. ``tables`` maps ONLY the tables a write touched;
    :meth:`table` / :meth:`registry` overlay them on the engine's originals.
    ``counts()`` runs the (lazy) counter jobs and returns Neo4j-style
    statistics."""

    spark: SparkSession
    graph: GraphSchema
    tables: dict[str, DataFrame]
    base: "TableRegistry"
    _counters: dict[str, object] = field(default_factory=dict)

    #: result of a trailing ``RETURN`` after the write clauses (post-write
    #: values via substitution — see WriteExecutor._compile_returned), or
    #: None when the query had no RETURN
    returned: DataFrame | None = None

    #: declarative index registries carried over from the source engine
    #: (round 13, VERDICT r12 #3) — ``engine()`` imports them so a
    #: write-then-search workflow keeps its CALL db.index.* surfaces;
    #: trained/materialized state is NOT carried (frozen over pre-write
    #: tables) — re-run train/materialize on the derived engine
    index_state: dict | None = None

    def table(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        return self.base.get(name)

    def registry(self) -> TableRegistry:
        reg = TableRegistry()
        for name in self.base.names():
            if name in self.tables:
                reg.register_df(name, self.tables[name])
            else:
                reg.register(name, lambda n=name: self.base.get(n))
        for name, df in self.tables.items():
            if name not in self.base.names():
                reg.register_df(name, df)
        return reg

    def engine(self, **kwargs):
        from .engine import CypherEngine

        eng = CypherEngine(self.spark, self.graph, self.registry(), **kwargs)
        if self.index_state:
            eng._import_index_state(self.index_state)
        return eng

    def counts(self) -> dict[str, int]:
        """Materialize the write statistics. Every counter leaf (a diff
        DataFrame and a row multiplier) folds into ONE Spark action — a
        union of per-frame global counts aggregated by counter key — so a
        statement with many SET/MERGE clauses pays one job, not one
        count job per counted frame."""
        leaves = [
            (k, df, n) for k, ls in self._counters.items() for df, n in ls
        ]
        if not leaves:
            return {}
        parts = [
            df.groupBy()
            .agg((F.count(F.lit(1)) * F.lit(int(n))).alias("__c"))
            .select(F.lit(k).alias("__k"), "__c")
            for k, df, n in leaves
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        out = {k: 0 for k, _, _ in leaves}
        for r in u.groupBy("__k").agg(F.sum("__c").alias("__c")).collect():
            out[r["__k"]] = int(r["__c"])
        return out

    def save(self, directory: str, mode: str = "overwrite") -> "WriteResult":
        """Persist the write's DERIVED tables as parquet under
        ``directory`` (round 13) and return a WriteResult whose touched
        tables are the parquet-backed reads — the DURABLE counterpart of
        :meth:`checkpoint`: lineage is truncated by real files instead
        of executor-memory blocks, so the snapshot survives the session,
        other jobs can read it, and at cluster scale this is the natural
        "apply the write batch" step (write once, then every downstream
        engine reads columnar parquet with pushdown). Only the tables
        the write touched are written; untouched tables keep resolving
        through the base registry. Index registrations carry over."""
        import os

        spark = self.spark
        new_tables: dict[str, DataFrame] = {}
        for name, df in self.tables.items():
            path = os.path.join(directory, f"{name}.parquet")
            df.write.mode(mode).parquet(path)
            new_tables[name] = spark.read.parquet(path)
        return WriteResult(
            spark,
            self.graph,
            new_tables,
            self.base,
            dict(self._counters),
            returned=self.returned,
            index_state=self.index_state,
        )

    def checkpoint(self) -> "WriteResult":
        """Truncate the derived tables' lineage (localCheckpoint, eager).

        Each write derives tables as plans over the previous snapshot, so
        a LONG chain of writes (result.engine().cypher_write(...) repeated
        N times) accumulates N layers of joins in every plan. Checkpointing
        materializes the current snapshot and resets lineage — call it
        every few writes in an iterative load job, exactly like the
        iterative graph operators checkpoint their frontiers. Returns self
        with the tables replaced."""
        for name, df in list(self.tables.items()):
            self.tables[name] = df.localCheckpoint(eager=True)
        return self


# ---------------------------------------------------------------------------
# alias resolution over the reading prefix
# ---------------------------------------------------------------------------


def _infer_match_scope(clause: A.MatchClause, scope: dict, graph: GraphSchema):
    """Record node/rel bindings of one MATCH, inferring missing labels from
    the edge schema to a (per-clause) fixpoint — the light counterpart of
    the planner's step-2 inference, enough to type write targets."""
    hops = []
    for part in clause.patterns:
        if part.shortest:
            # round 7: a shortestPath in the READING prefix is fine —
            # the engine rewrite turns it into a 1-hop virtual edge and
            # the endpoint nodes type normally below. Only the path
            # variable itself is not a writable target (scope "value";
            # SET p.x would be rejected by the target-kind checks).
            if part.path_alias:
                scope.setdefault(part.path_alias, ("value",))
            for node in part.nodes:
                if node.alias and node.label:
                    scope[node.alias] = ("node", node.label)
                elif node.alias and node.alias not in scope:
                    scope[node.alias] = ("node", None)
            continue
        for node in part.nodes:
            if node.alias and node.label:
                scope[node.alias] = ("node", node.label)
            elif node.alias and node.alias not in scope:
                scope[node.alias] = ("node", None)
        hops.extend(part.hops())

    def node_label(n: A.NodePattern) -> str | None:
        if n.label:
            return n.label
        if n.alias and scope.get(n.alias, ("",))[0] == "node":
            return scope[n.alias][1]
        return None

    changed = True
    while changed:
        changed = False
        for left, rel, right in hops:
            if rel.min_hops is not None:
                continue  # var-length rels are not write targets
            if rel.alt_verbs:
                # round 7: a multi-type rel [:A|B] resolves to its
                # concrete member edges — SET/DELETE route each matched
                # row to its member table via the union edge's __type
                # discriminator. Members are (edge, flipped) pairs:
                # EITHER direction may resolve a verb through the
                # reversed label pair, in which case the union row's
                # (__src, __dst) are the concrete row's (sink, source)
                # and the pair-keyed update swaps its keys.
                if rel.alias:
                    if rel.direction == A.Direction.BACKWARD:
                        src, snk = right, left
                    else:
                        src, snk = left, right
                    members = []
                    for v in [rel.verb, *rel.alt_verbs]:
                        cands = [
                            (e, False)
                            for e in graph.candidate_edges(
                                v, node_label(src), node_label(snk)
                            )
                        ]
                        if rel.direction == A.Direction.EITHER:
                            fwd = {id(c[0]) for c in cands}
                            cands += [
                                (e, True)
                                for e in graph.candidate_edges(
                                    v, node_label(snk), node_label(src)
                                )
                                if id(e) not in fwd
                            ]
                        if len(cands) != 1:
                            members = None
                            break
                        members.append(cands[0])
                    if members and scope.get(rel.alias) != (
                        "rel_multi",
                        tuple(members),
                    ):
                        scope[rel.alias] = ("rel_multi", tuple(members))
                        changed = True
                    elif members is None and rel.alias not in scope:
                        scope[rel.alias] = ("rel", None)
                continue
            if rel.direction == A.Direction.BACKWARD:
                src, snk = right, left
            else:
                src, snk = left, right
            cands = graph.candidate_edges(rel.verb, node_label(src), node_label(snk))
            if rel.direction == A.Direction.EITHER:
                cands += graph.candidate_edges(
                    rel.verb, node_label(snk), node_label(src)
                )
            if len(cands) == 1:
                e = cands[0]
                flipped = node_label(src) not in (None, e.source_label)
                s_lab, k_lab = (
                    (e.sink_label, e.source_label)
                    if flipped
                    else (e.source_label, e.sink_label)
                )
                for n, lab in ((src, s_lab), (snk, k_lab)):
                    if n.alias and scope.get(n.alias) != ("node", lab):
                        if node_label(n) is None:
                            scope[n.alias] = ("node", lab)
                            changed = True
                if rel.alias and scope.get(rel.alias) != ("rel", e):
                    scope[rel.alias] = ("rel", e)
                    changed = True
            elif rel.alias and rel.alias not in scope:
                scope[rel.alias] = ("rel", None)


def _resolve_scope(reading: list, graph: GraphSchema, initial=None) -> dict:
    """alias -> ("node", label) | ("rel", EdgeSchema|None) | ("value",).

    ``initial`` pre-binds aliases carried across a write-segment boundary
    (the previous segment's SeedOp env)."""
    scope: dict[str, tuple] = dict(initial or {})
    for clause in reading:
        if isinstance(clause, A.MatchClause):
            _infer_match_scope(clause, scope, graph)
        elif isinstance(clause, A.UnwindClause):
            scope[clause.alias] = ("value",)
        elif isinstance(clause, A.CallSubqueryClause):
            inner = clause.query
            while isinstance(inner, A.UnionQuery):
                inner = inner.left
            last = inner.clauses[-1]
            if isinstance(last, A.ProjectionClause):
                for alias, _ in last.items:
                    scope[alias] = ("value",)
        elif isinstance(clause, A.ProjectionClause):
            new: dict[str, tuple] = {}
            if clause.star:
                new.update(scope)
            for alias, expr in clause.items:
                if isinstance(expr, A.Variable) and expr.name in scope:
                    new[alias] = scope[expr.name]
                else:
                    new[alias] = ("value",)
            scope = new
    return scope


def _node_schema(graph: GraphSchema, scope: dict, alias: str) -> NodeSchema:
    kind = scope.get(alias)
    if kind is None:
        raise TranspilerBindingError(f"Write target '{alias}' is not bound")
    if kind[0] == "value":
        raise TranspilerNotSupportedError(
            f"Write target '{alias}' is a value, not a node or relationship"
        )
    if kind[0] == "rel":
        raise TranspilerBindingError(f"'{alias}' is a relationship, not a node")
    if kind[1] is None:
        raise TranspilerBindingError(
            f"Could not infer a label for write target '{alias}'; "
            "add an explicit label to its pattern"
        )
    return graph.get_node(kind[1])


def _no_aggregates(exprs):
    for expr in exprs:
        for n in expr.walk():
            if isinstance(n, A.AggCall):
                raise TranspilerNotSupportedError(
                    "Aggregate functions are not allowed in write expressions"
                )


def _substitute(value, mapping, created, fenced):
    """Rebuild an AST value with every ``alias.prop`` reference that a
    write clause assigned replaced by the ASSIGNED expression — how a
    trailing RETURN observes post-write values without re-reading the
    derived tables. Properties of a CREATE'd alias that were never
    assigned read as null (new row); unmapped properties of a ``fenced``
    alias (MERGE targets: per-row conditional values) raise. Substitution
    is name-based, so a pattern-local alias inside a comprehension that
    shadows a write target is substituted too (documented limitation)."""
    import dataclasses

    def sub(v):
        return _substitute(v, mapping, created, fenced)

    if isinstance(value, A.Property):
        key = (value.alias, value.prop)
        if key in mapping:
            base = mapping[key]
            for fld in value.path:
                base = A.FieldAccess(base, fld)
            return base
        if value.alias in fenced:
            raise TranspilerNotSupportedError(
                f"RETURN of '{value.alias}.{value.prop}' is not supported: "
                "its post-write value is conditional (MERGE row existence / "
                "ON CREATE/ON MATCH SET); read the WriteResult tables instead"
            )
        if value.alias in created:
            return A.Literal(None)  # unassigned property of a new node
        return value
    if isinstance(value, list):
        return [sub(v) for v in value]
    if isinstance(value, tuple):
        return tuple(sub(v) for v in value)
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        changes = {}
        for f in dataclasses.fields(value):
            old = getattr(value, f.name)
            new = sub(old)
            if new is not old:
                changes[f.name] = new
        return dataclasses.replace(value, **changes) if changes else value
    return value


def _owner_of_edge(graph: GraphSchema, e: EdgeSchema) -> str | None:
    """'source' / 'sink' if the edge is FK-embedded in that endpoint's node
    table (the edge row IS the node row), else None (standalone table)."""
    if graph.has_node(e.source_label):
        src = graph.get_node(e.source_label)
        if src.table == e.table and src.id_property == e.source_id_property:
            return "source"
    if graph.has_node(e.sink_label):
        snk = graph.get_node(e.sink_label)
        if snk.table == e.table and snk.id_property == e.sink_id_property:
            return "sink"
    return None


# ---------------------------------------------------------------------------
# the executor
# ---------------------------------------------------------------------------


class WriteExecutor:
    def __init__(
        self,
        engine,
        reading: list,
        writes: list,
        returning: A.ProjectionClause | None,
        params,
        validate: bool,
        on_conflict: str = "max",
        seed: SeedOp | None = None,
    ):
        self.engine = engine
        self.spark = engine.spark
        self.graph: GraphSchema = engine.graph
        self.params = params
        self.validate = validate
        if on_conflict not in ("max", "error"):
            raise TranspilerBindingError(
                "on_conflict must be 'max' or 'error'"
            )
        self.on_conflict = on_conflict
        self.reading = list(reading)
        self.writes = list(writes)
        self.returning = returning
        # carried binding from the previous write segment (clause-sequential
        # visibility): a SeedOp whose env pre-binds the carried aliases
        self.seed = seed
        seed_scope: dict[str, tuple] = {}
        if seed is not None:
            for alias, ref in seed.env.items():
                if isinstance(ref, EntityRef) and ref.kind == "node":
                    seed_scope[alias] = ("node", ref.node.label)
                elif isinstance(ref, EntityRef):
                    seed_scope[alias] = ("rel", ref.edge)
                else:
                    seed_scope[alias] = ("value",)
        # (alias, prop) -> the written expression, for post-write RETURN
        # substitution; later clauses override earlier ones
        self._written: dict[tuple[str, str], A.Expr] = {}
        # aliases CREATE introduced (unassigned props read as null in a
        # trailing RETURN) and aliases whose post-write values are
        # per-row conditional (MERGE targets) — RETURN on those raises
        self._created_aliases: set[str] = set()
        self._fenced_aliases: set[str] = set()
        # node aliases introduced by an earlier CREATE/MERGE clause in
        # THIS statement: alias -> (label, id expression). Lets a later
        # relationship MERGE bind endpoints the reading prefix never saw
        # (the classic MERGE-nodes-then-MERGE-rel single statement)
        self._write_bound: dict[str, tuple] = {}
        self._seed_scope = seed_scope
        # FOREACH support (round 7): the desugared UNWIND participates in
        # the WRITE binding (per-element application) but is pruned from
        # any boundary compile — the boundary restores pre-FOREACH
        # cardinality, and FOREACH-scoped names don't cross it
        self._foreach_vars = {
            c.alias for c in self.reading if _is_foreach_unwind(c)
        }
        self._pruned_reading = [
            c for c in self.reading if not _is_foreach_unwind(c)
        ]
        self.scope = _resolve_scope(self.reading, self.graph, initial=seed_scope)
        # synthesized projection items for the binding DataFrame
        self._items: list[tuple[str, A.Expr]] = []
        self._item_names: set[str] = set()
        # copy-on-write snapshot + schema growth
        self.tables: dict[str, DataFrame] = {}
        self._new_props: dict[str, list[EntityProperty]] = {}
        self._counters: dict[str, object] = {}

    # -- binding construction ---------------------------------------------
    def _add_item(self, name: str, expr: A.Expr) -> str:
        if name not in self._item_names:
            self._item_names.add(name)
            self._items.append((name, expr))
        return name

    def _key_col(self, alias: str) -> str:
        node = _node_schema(self.graph, self.scope, alias)
        return self._add_item(
            f"__k_{alias}", A.Property(alias, node.id_property)
        )

    def _val_col(self, expr: A.Expr) -> str:
        name = f"__v{len(self._items)}"
        return self._add_item(name, expr)

    def _get_table(self, name: str) -> DataFrame:
        if name in self.tables:
            return self.tables[name]
        return self.engine.tables.get(name)

    def _record_new_prop(self, table: str, prop: str, df: DataFrame, col: str):
        dtype = dict(df.dtypes).get(col, "string")
        props = self._new_props.setdefault(table, [])
        if not any(p.name == prop for p in props):
            props.append(EntityProperty(prop, dtype))

    def _count_into(self, key: str, df: DataFrame, n: int = 1):
        # counters are (frame, multiplier) leaves; WriteResult.counts()
        # folds ALL of them into a single Spark action
        self._counters.setdefault(key, []).append((df, n))

    # -- main --------------------------------------------------------------
    def run(self) -> WriteResult:
        plans = [self._plan_write(w) for w in self.writes]
        binding = self._compile_binding()
        for apply_fn in plans:
            apply_fn(binding)
        graph = self._extended_graph()
        return WriteResult(
            self.spark,
            graph,
            self.tables,
            self.engine.tables,
            self._counters,
            index_state=self.engine._export_index_state(),
            returned=self._compile_returned(),
        )

    def _compile_returned(self) -> DataFrame | None:
        """Trailing ``RETURN`` after the writes: every ``alias.prop`` a
        write assigned is substituted with the assigned EXPRESSION, then
        the projection compiles over the ordinary reading plan — so the
        RETURN observes post-write values per matched row (Neo4j
        semantics) without re-reading the derived tables. Divergence:
        properties of a DELETE'd alias read their pre-delete values
        (Neo4j raises on deleted-entity access)."""
        if self.returning is None:
            return None
        proj = _substitute(
            self.returning,
            self._written,
            self._created_aliases,
            self._fenced_aliases,
        )
        read_q = A.SingleQuery(list(self.reading) + [proj])
        return self.engine._run_ast(read_q, self.params, seed=self.seed)

    def _compile_binding(self) -> DataFrame:
        if not self._items:
            # e.g. pure CREATE with literal props still registers items;
            # this only triggers for degenerate DELETE-nothing cases
            self._add_item("__one", A.Literal(1))
        proj = A.ProjectionClause(items=list(self._items), is_return=True)
        read_q = A.SingleQuery(list(self.reading) + [proj])
        return self.engine._run_ast(read_q, self.params, seed=self.seed)

    # -- clause-sequential segment boundary ---------------------------------
    def run_to_foreach_boundary(self):
        """Synthetic boundary after a FOREACH's writes: run the writes
        with the full binding (one application per list element), then
        carry every PRE-FOREACH name — compiled over the reading plan
        minus the desugared UNWIND, so the next segment observes the
        writes at the original row cardinality. FOREACH-scoped names
        (the element variable, aliases CREATE'd inside the body) do not
        cross the boundary (Neo4j scoping)."""
        names = list(
            _resolve_scope(
                self._pruned_reading, self.graph, initial=self._seed_scope
            ).keys()
        )
        boundary = A.ProjectionClause(
            items=[(n, A.Variable(n)) for n in names], is_return=False
        )
        return self.run_to_boundary(boundary, pruned=True)

    def run_to_boundary(
        self, boundary: A.ProjectionClause, pruned: bool = False
    ):
        """Execute this segment's writes, then compile the boundary WITH
        into a carried :class:`SeedOp` for the next segment (Neo4j's
        clause-sequential visibility — clauses after the WITH observe the
        writes before it).

        Carried MATCHed entities pass through the boundary as ordinary
        entity column groups, then have their property columns RE-ANCHORED
        by an id-key join against the post-write tables — so SET values,
        newly-added properties, and DELETEs are all observed (a deleted
        entity carries null properties and matches nothing downstream).
        Aliases this segment's CREATE/MERGE introduced carry their id
        expression and re-anchor the same way. Scalar items observe
        post-write values via the RETURN-substitution machinery."""
        plans = [self._plan_write(w) for w in self.writes]
        binding = self._compile_binding()
        for fn in plans:
            fn(binding)
        graph = self._extended_graph()

        items: list[tuple[str, A.Expr]] = []
        created_carry: dict[str, str] = {}  # out alias -> node label
        star_items: list[tuple[str, A.Expr]] = []
        if boundary.star:
            explicit = {a for a, _ in boundary.items}
            names = list(self.scope.keys()) + [
                a for a in self._write_bound if a not in self.scope
            ]
            star_items = [
                (n, A.Variable(n)) for n in names if n not in explicit
            ]
        for alias, expr in star_items + list(boundary.items):
            if isinstance(expr, A.Variable) and expr.name in self._write_bound:
                # CREATE/MERGE-introduced alias: the reading plan never saw
                # it — carry its id expression, re-anchor below
                label, id_expr = self._write_bound[expr.name]
                items.append((alias, id_expr))
                created_carry[alias] = label
            else:
                items.append((alias, expr))
        proj = A.ProjectionClause(
            items=items,
            distinct=boundary.distinct,
            where=boundary.where,
            order_by=boundary.order_by,
            skip=boundary.skip,
            limit=boundary.limit,
            is_return=False,
            star=False,
        )
        proj = _substitute(
            proj, self._written, self._created_aliases, self._fenced_aliases
        )
        base = self._pruned_reading if pruned else self.reading
        read_q = A.SingleQuery(list(base) + [proj])
        df, env = self.engine._run_ast_env(read_q, self.params, seed=self.seed)
        df, env = self._reanchor(df, env, graph, created_carry)
        return SeedOp(df=df, env=env), graph

    def _reanchor(self, df, env, graph, created_carry):
        new_env: dict[str, object] = {}
        for alias, ref in env.items():
            if isinstance(ref, EntityRef) and ref.kind == "node":
                key_src = ref.col(ref.node.id_property)
                drop = [c for c in ref.columns() if c != key_src]
                if drop:
                    df = df.drop(*drop)
                node = graph.get_node(ref.node.label)
                df = self._reanchor_join(df, key_src, node, alias, new_env)
            elif isinstance(ref, EntityRef):
                raise TranspilerNotSupportedError(
                    f"Carrying relationship '{alias}' across a write-"
                    "boundary WITH is not supported; carry its endpoint "
                    "ids instead"
                )
            elif isinstance(ref, (PathRef, MaterializedPathRef)):
                raise TranspilerNotSupportedError(
                    f"Carrying path '{alias}' across a write-boundary "
                    "WITH is not supported; carry nodes()/length() of it"
                )
            elif alias in created_carry:
                node = graph.get_node(created_carry[alias])
                df = self._reanchor_join(df, alias, node, alias, new_env)
            else:
                new_env[alias] = ref
        return df, new_env

    def _reanchor_join(self, df, key_src, node, alias, new_env):
        """LEFT-join the post-write node table on the carried id key and
        rebuild the entity's ``__{alias}_{prop}`` column group (one
        broadcast-eligible equi-join per carried entity)."""
        ref = EntityRef(alias, "node", node=node)
        tmp = {p: f"__reanchor_{p}" for p in node.property_names}
        tbl = self._get_table(node.table).select(
            *[F.col(p).alias(t) for p, t in tmp.items()]
        )
        df = df.join(
            tbl,
            F.col(key_src) == F.col(tmp[node.id_property]),
            "left",
        ).drop(key_src)
        for p, t in tmp.items():
            df = df.withColumnRenamed(t, ref.col(p))
        new_env[alias] = ref
        return df

    def _extended_graph(self) -> GraphSchema:
        """New property columns extend EVERY schema backed by the touched
        table — the node and any edges sharing it (FK-embedded storage
        means a relationship property physically lives on the row, so it
        is legitimately readable through either alias)."""
        if not self._new_props:
            return self.graph
        nodes = []
        for n in self.graph.nodes:
            extra = [
                p
                for p in self._new_props.get(n.table, [])
                if p.name not in n.property_names
            ]
            if extra:
                n = NodeSchema(
                    n.label,
                    n.table,
                    n.id_property,
                    tuple(n.properties) + tuple(extra),
                    n.id_property_type,
                )
            nodes.append(n)
        edges = []
        for e in self.graph.edges:
            extra = [
                p
                for p in self._new_props.get(e.table, [])
                if p.name not in e.property_names
            ]
            if extra:
                e = EdgeSchema(
                    e.verb,
                    e.source_label,
                    e.sink_label,
                    e.table,
                    e.source_id_property,
                    e.sink_id_property,
                    tuple(e.properties) + tuple(extra),
                    e.source_id_property_type,
                    e.sink_id_property_type,
                    e.type_property,
                    e.display_verb,
                    e.identity_properties,
                )
            edges.append(e)
        return GraphSchema(nodes, edges)

    # -- planners (run before the binding compiles so they can register
    #    projection items; they return the apply function) -----------------
    def _plan_write(self, clause: A.WriteClause):
        if isinstance(clause, A.SetClause):
            return self._plan_set(self._expand_set_items(clause.items))
        if isinstance(clause, A.RemoveClause):
            items = [
                A.SetItem(alias, prop, A.Literal(None))
                for alias, prop in clause.items
            ]
            plans = [self._plan_set(items)] if items else []
            plans += [
                self._plan_label(alias, label, add=False)
                for alias, label in clause.labels
            ]
            if len(plans) == 1:
                return plans[0]

            def apply_all(binding: DataFrame):
                for p in plans:
                    p(binding)

            return apply_all
        if isinstance(clause, A.DeleteClause):
            return self._plan_delete(clause)
        if isinstance(clause, A.CreateClause):
            return self._plan_create(clause)
        if isinstance(clause, A.MergeClause):
            return self._plan_merge(clause)
        raise TranspilerNotSupportedError(f"Unsupported write clause: {clause}")

    # -- SET ---------------------------------------------------------------
    def _expand_set_items(self, items: list) -> list:
        """Desugar ``SET n += {map}`` into per-key SetItems (null values
        remove the property — Neo4j merge semantics) and peel
        ``SET n:Label`` items off to the label planner."""
        out: list = []
        for item in items:
            if isinstance(item, (A.SetPlusItem, A.SetReplaceItem)):
                expr = item.expr
                op = "=" if isinstance(item, A.SetReplaceItem) else "+="
                if isinstance(expr, A.Parameter):
                    val = (self.params or {}).get(expr.name)
                    if not isinstance(val, dict):
                        raise TranspilerBindingError(
                            f"SET {item.alias} {op} ${expr.name} requires "
                            "the parameter to be bound to a map"
                        )
                    pairs = [(k, A.Literal(v)) for k, v in val.items()]
                elif isinstance(expr, A.MapProjection):
                    # property copy between entities (round 7):
                    # `SET b += a {.x, .*, k: e}` — keys are plan-time
                    # static, values are per-row expressions over the
                    # binding DataFrame. `.prop`/`.*` need a node source
                    # (its schema names the columns); `.*` excludes the
                    # source's id property — copying identity into
                    # another node is never what += means.
                    src = expr.alias
                    pairs = []
                    ssch = None
                    for kind2, v in expr.items:
                        if kind2 in ("prop", "all") and ssch is None:
                            skind = self.scope.get(src)
                            if skind is None or skind[0] != "node":
                                raise TranspilerNotSupportedError(
                                    f"SET {op} {src} {{.prop}}: the "
                                    "projection source must be a bound "
                                    "NODE alias"
                                )
                            ssch = _node_schema(self.graph, self.scope, src)
                        if kind2 == "prop":
                            if v not in ssch.property_names:
                                raise TranspilerBindingError(
                                    f"'{src}' ({ssch.label}) has no "
                                    f"property '{v}'"
                                )
                            pairs.append((v, A.Property(src, v)))
                        elif kind2 == "all":
                            pairs.extend(
                                (p, A.Property(src, p))
                                for p in ssch.property_names
                                if p != ssch.id_property
                            )
                        elif kind2 == "entry":
                            pairs.append(v)
                        else:  # bare variable shorthand
                            pairs.append((v, A.Variable(v)))
                    # duplicate keys: last value wins, first position
                    merged: dict = {}
                    for k, v in pairs:
                        merged[k] = v
                    pairs = list(merged.items())
                else:  # MapLiteral (parser guarantees)
                    pairs = list(expr.items)
                out.extend(A.SetItem(item.alias, k, v) for k, v in pairs)
                if isinstance(item, A.SetReplaceItem):
                    # replacement removes every declared non-id property
                    # the map does not mention (null removes, like +=);
                    # the schema makes the missing set plan-time known
                    kind = self.scope.get(item.alias)
                    if kind is not None and kind[0] in ("rel", "rel_multi"):
                        raise TranspilerNotSupportedError(
                            f"SET {item.alias} = {{map}} on a RELATIONSHIP "
                            "is not supported (edge keys are the pair "
                            "identity) — use SET r += {map} to merge"
                        )
                    sch = _node_schema(self.graph, self.scope, item.alias)
                    given = {k for k, _ in pairs}
                    if sch.id_property in given:
                        raise TranspilerNotSupportedError(
                            f"SET {item.alias} = {{map}} cannot assign the "
                            f"id property '{sch.id_property}' (node "
                            "identity is immutable here)"
                        )
                    out.extend(
                        A.SetItem(item.alias, p, A.Literal(None))
                        for p in sch.property_names
                        if p != sch.id_property and p not in given
                    )
            else:
                out.append(item)
        return out

    def _plan_set(self, items: list):
        label_items = [i for i in items if isinstance(i, A.SetLabelItem)]
        if label_items:
            rest = [i for i in items if not isinstance(i, A.SetLabelItem)]
            plans = [
                self._plan_label(i.alias, i.label, add=True)
                for i in label_items
            ]
            if rest:
                plans.append(self._plan_set(rest))

            def apply_labels(binding: DataFrame):
                for p in plans:
                    p(binding)

            return apply_labels
        _no_aggregates([i.expr for i in items])
        # one SET clause may mix node and relationship targets: split by
        # the target's kind and plan each group with its own key shape
        rel_items = [
            i
            for i in items
            if (self.scope.get(i.alias) or ("",))[0] in ("rel", "rel_multi")
        ]
        if rel_items:
            node_items = [i for i in items if i not in rel_items]
            plans = [self._plan_set_rel(rel_items)]
            if node_items:
                plans.append(self._plan_set(node_items))

            def apply_both(binding: DataFrame):
                for p in plans:
                    p(binding)

            return apply_both
        by_alias: dict[str, list[tuple[str, str]]] = {}
        for item in items:
            node = _node_schema(self.graph, self.scope, item.alias)
            if item.prop == node.id_property:
                raise TranspilerNotSupportedError(
                    f"SET on the id property '{item.prop}' is not supported "
                    "(node identity is immutable)"
                )
            self._key_col(item.alias)
            vcol = self._val_col(item.expr)
            by_alias.setdefault(item.alias, []).append((item.prop, vcol))
            self._written[(item.alias, item.prop)] = item.expr

        def apply(binding: DataFrame):
            for alias, pairs in by_alias.items():
                node = _node_schema(self.graph, self.scope, alias)
                self._apply_update(
                    node.table, node.id_property, f"__k_{alias}", pairs, binding
                )

        return apply

    def _plan_set_rel(self, items: list[A.SetItem]):
        """SET on a relationship alias: the update key is the (source,
        sink) id pair of the edge's backing table.

        Documented divergence: the pair IS the relationship's identity
        here, so on edge tables that allow parallel edges with the same
        endpoint pair (e.g. ACTED_IN with several roles), ``SET r.x``
        updates EVERY parallel row sharing the pair — Neo4j keys by
        per-relationship identity instead. Model parallel edges with a
        discriminating key column if per-edge SET is needed.

        Round 7: a DIRECTED multi-type alias ``[r:A|B]`` is supported —
        the binding carries the union edge's ``__src``/``__dst``/``__type``
        columns and each matched row routes to its concrete member table
        (the verdict-r6 virtual-edge write). Symmetrized (undirected
        var-length) edges stay fenced: one matched row is BOTH
        orientations of a concrete row, so a pair-keyed update would be
        ambiguous."""
        multi_items = [
            i
            for i in items
            if (self.scope.get(i.alias) or ("",))[0] == "rel_multi"
        ]
        if multi_items:
            rest = [i for i in items if i not in multi_items]
            plans = [self._plan_set_rel_multi(multi_items)]
            if rest:
                plans.append(self._plan_set_rel(rest))

            def apply_split(binding: DataFrame):
                for p in plans:
                    p(binding)

            return apply_split
        by_alias: dict[str, list[tuple[str, str]]] = {}
        edges: dict[str, EdgeSchema] = {}
        for item in items:
            kind = self.scope.get(item.alias)
            if kind is None or kind[0] != "rel":
                raise TranspilerBindingError(
                    f"SET items must target a single kind; '{item.alias}' "
                    "is not a relationship"
                )
            e = kind[1]
            if e is None:
                raise TranspilerBindingError(
                    f"Could not resolve the relationship type of '{item.alias}'"
                )
            if e.type_property is not None or e.identity_properties:
                raise TranspilerNotSupportedError(
                    "SET on a virtual (multi-type / symmetrized) relationship "
                    "is not supported"
                )
            if item.prop in (e.source_id_property, e.sink_id_property):
                raise TranspilerNotSupportedError(
                    "SET on a relationship key column is not supported"
                )
            edges[item.alias] = e
            self._add_item(
                f"__k1_{item.alias}", A.Property(item.alias, e.source_id_property)
            )
            self._add_item(
                f"__k2_{item.alias}", A.Property(item.alias, e.sink_id_property)
            )
            vcol = self._val_col(item.expr)
            by_alias.setdefault(item.alias, []).append((item.prop, vcol))
            self._written[(item.alias, item.prop)] = item.expr

        def apply(binding: DataFrame):
            for alias, pairs in by_alias.items():
                e = edges[alias]
                self._apply_update(
                    e.table,
                    (e.source_id_property, e.sink_id_property),
                    (f"__k1_{alias}", f"__k2_{alias}"),
                    pairs,
                    binding,
                )

        return apply

    def _plan_set_rel_multi(self, items: list[A.SetItem]):
        """SET through a directed multi-type rel ``[r:A|B]`` (round 7):
        the read plan resolves r to the union edge whose rows carry
        ``__src`` / ``__dst`` / ``__type``; each binding row routes to
        its CONCRETE member table by the ``__type`` discriminator, then
        the ordinary pair-keyed update applies per member."""
        by_alias: dict[str, list[tuple[str, str]]] = {}
        members: dict[str, tuple] = {}
        for item in items:
            mem = self.scope[item.alias][1]
            keys = {"__src", "__dst", "__type"}
            for e, _fl in mem:
                keys.update((e.source_id_property, e.sink_id_property))
            if item.prop in keys:
                raise TranspilerNotSupportedError(
                    "SET on a relationship key/discriminator column is "
                    "not supported"
                )
            members[item.alias] = mem
            self._add_item(f"__k1_{item.alias}", A.Property(item.alias, "__src"))
            self._add_item(f"__k2_{item.alias}", A.Property(item.alias, "__dst"))
            self._add_item(f"__t_{item.alias}", A.Property(item.alias, "__type"))
            vcol = self._val_col(item.expr)
            by_alias.setdefault(item.alias, []).append((item.prop, vcol))
            self._written[(item.alias, item.prop)] = item.expr

        def apply(binding: DataFrame):
            for alias, pairs in by_alias.items():
                for e, flipped in members[alias]:
                    rows = binding.where(
                        F.col(f"__t_{alias}") == F.lit(e.verb)
                    )
                    k1, k2 = f"__k1_{alias}", f"__k2_{alias}"
                    if flipped:
                        # union row stores (sink, source) of the concrete
                        # row (either-direction member) — swap keys back
                        k1, k2 = k2, k1
                    self._apply_update(
                        e.table,
                        (e.source_id_property, e.sink_id_property),
                        (k1, k2),
                        pairs,
                        rows,
                    )

        return apply

    # -- SET/REMOVE label ---------------------------------------------------
    def _plan_label(self, alias: str, label: str, add: bool):
        """``SET n:Label`` / ``REMOVE n:Label`` in the table-backed model
        (round 6): labels ARE tables (the read side intersects extra
        labels by id semi-join), so adding a label appends an id-sharing
        row to the label's table (other columns null) and removing it
        drops that facet row. The node's own row is untouched."""
        node = _node_schema(self.graph, self.scope, alias)
        if not self.graph.has_node(label):
            raise TranspilerBindingError(
                f"SET/REMOVE label :{label}: no node schema with that label"
            )
        target = self.graph.get_node(label)
        if target.table == node.table:
            raise TranspilerBindingError(
                f"SET/REMOVE label :{label} targets the alias's own "
                f"primary label table '{target.table}'"
            )
        key = self._key_col(alias)

        def apply(binding: DataFrame):
            keys = (
                binding.select(F.col(key).alias("__lk"))
                .where(F.col("__lk").isNotNull())
                .distinct()
            )
            tbl = self._get_table(target.table)
            dtype = dict(tbl.dtypes)[target.id_property]
            if add:
                new_rows = keys.join(
                    tbl,
                    keys["__lk"].cast(dtype) == tbl[target.id_property],
                    "left_anti",
                ).select(
                    F.col("__lk").cast(dtype).alias(target.id_property)
                )
                self.tables[target.table] = self._align_new_rows(tbl, new_rows)
                self._count_into("labels_added", new_rows)
            else:
                self.tables[target.table] = tbl.join(
                    keys,
                    tbl[target.id_property] == keys["__lk"].cast(dtype),
                    "left_anti",
                )
                removed = keys.join(
                    tbl,
                    keys["__lk"].cast(dtype) == tbl[target.id_property],
                    "left_semi",
                )
                self._count_into("labels_removed", removed)

        return apply

    def _apply_update(
        self, table, id_cols, key_cols, pairs, binding, counter="properties_set"
    ):
        """One grouped update table + one equi-join; AQE broadcasts small
        update sets. Conflicting per-key values resolve to max().
        ``counter=None`` suppresses the properties_set statistic (the
        FK-edge CREATE path reuses this machinery but counts
        relationships_created itself)."""
        if isinstance(id_cols, str):
            id_cols, key_cols = (id_cols,), (key_cols,)
        vcols = [v for _, v in pairs]
        upd = binding.select(
            *[F.col(k).alias(f"__uk{i}") for i, k in enumerate(key_cols)],
            *[F.col(v) for v in vcols],
        )
        cond = F.lit(True)
        for i in range(len(key_cols)):
            cond = cond & F.col(f"__uk{i}").isNotNull()
        upd = upd.where(cond)
        if self.on_conflict == "error":
            # opt-in loud mode (round 6): instead of the documented max()
            # rule, reject any (key, property) that received more than
            # one distinct value in this statement
            multi = F.lit(False)
            for v in vcols:
                multi = multi | (F.col(v) > 1)
            conflicts = (
                upd.groupBy(*[f"__uk{i}" for i in range(len(key_cols))])
                .agg(*[F.countDistinct(v).alias(v) for v in vcols])
                .where(multi)
                .count()
            )
            if conflicts:
                raise TranspilerBindingError(
                    f"SET on '{table}': {conflicts} key(s) received more "
                    "than one distinct value in this statement "
                    "(on_conflict='error'; use the default 'max' for "
                    "deterministic resolution)"
                )
        upd = (
            upd.groupBy(*[f"__uk{i}" for i in range(len(key_cols))])
            .agg(*[F.max(v).alias(v) for v in vcols])
            .withColumn("__m", F.lit(True))
        )
        tbl = self._get_table(table)
        join_cond = F.lit(True)
        for i, idc in enumerate(id_cols):
            join_cond = join_cond & (tbl[idc] == upd[f"__uk{i}"])
        out = tbl.join(upd, join_cond, "left")
        dtypes = dict(tbl.dtypes)
        for prop, vcol in pairs:
            if prop in dtypes:
                new_val = F.col(vcol).cast(dtypes[prop])
                out = out.withColumn(
                    prop, F.when(F.col("__m"), new_val).otherwise(F.col(prop))
                )
            else:
                out = out.withColumn(prop, F.when(F.col("__m"), F.col(vcol)))
                self._record_new_prop(table, prop, binding, vcol)
        out = out.drop("__m", *vcols, *[f"__uk{i}" for i in range(len(key_cols))])
        self.tables[table] = out
        if counter is not None:
            self._count_into(counter, upd, len(pairs))

    # -- DELETE ------------------------------------------------------------
    def _plan_delete(self, clause: A.DeleteClause):
        nodes: list[tuple[str, NodeSchema]] = []
        rels: list[tuple[str, EdgeSchema]] = []
        multi_rels: list[tuple[str, tuple]] = []
        for alias in clause.aliases:
            kind = self.scope.get(alias)
            if kind is not None and kind[0] == "rel_multi":
                # round 7: DELETE through a directed [:A|B] — route each
                # matched pair to its concrete member table via __type
                self._add_item(f"__k1_{alias}", A.Property(alias, "__src"))
                self._add_item(f"__k2_{alias}", A.Property(alias, "__dst"))
                self._add_item(f"__t_{alias}", A.Property(alias, "__type"))
                multi_rels.append((alias, kind[1]))
                continue
            if kind is not None and kind[0] == "rel":
                e = kind[1]
                if e is None:
                    raise TranspilerBindingError(
                        f"Could not resolve the relationship type of '{alias}'"
                    )
                if e.type_property is not None or e.identity_properties:
                    raise TranspilerNotSupportedError(
                        "DELETE of a virtual (multi-type / symmetrized) "
                        "relationship is not supported"
                    )
                self._add_item(
                    f"__k1_{alias}", A.Property(alias, e.source_id_property)
                )
                self._add_item(
                    f"__k2_{alias}", A.Property(alias, e.sink_id_property)
                )
                rels.append((alias, e))
                continue
            node = _node_schema(self.graph, self.scope, alias)
            self._key_col(alias)
            nodes.append((alias, node))

        def apply(binding: DataFrame):
            for alias, e in rels:
                pairs = (
                    binding.select(
                        F.col(f"__k1_{alias}").alias("__ds"),
                        F.col(f"__k2_{alias}").alias("__dk"),
                    )
                    .where(
                        F.col("__ds").isNotNull() & F.col("__dk").isNotNull()
                    )
                    .distinct()
                )
                self._apply_delete_rel(e, pairs)
            for alias, mem in multi_rels:
                for e, flipped in mem:
                    k1, k2 = f"__k1_{alias}", f"__k2_{alias}"
                    if flipped:
                        k1, k2 = k2, k1
                    pairs = (
                        binding.where(
                            F.col(f"__t_{alias}") == F.lit(e.verb)
                        )
                        .select(
                            F.col(k1).alias("__ds"),
                            F.col(k2).alias("__dk"),
                        )
                        .where(
                            F.col("__ds").isNotNull()
                            & F.col("__dk").isNotNull()
                        )
                        .distinct()
                    )
                    self._apply_delete_rel(e, pairs)
            for alias, node in nodes:
                keys = (
                    binding.select(F.col(f"__k_{alias}").alias("__dk"))
                    .where(F.col("__dk").isNotNull())
                    .distinct()
                )
                self._apply_delete_node(node, keys, clause.detach)

        return apply

    def _apply_delete_rel(self, e: EdgeSchema, pairs: DataFrame):
        """DELETE r (round 6): a standalone edge table drops the matched
        (source, sink) rows (every parallel row sharing the pair — the
        pair IS the edge identity here, same documented divergence as
        relationship SET); an FK-embedded edge nulls the FK column on the
        owning row (edge disappears; both nodes stay)."""
        owner = _owner_of_edge(self.graph, e)
        tbl = self._get_table(e.table)
        if owner is None:
            cond = (tbl[e.source_id_property] == pairs["__ds"]) & (
                tbl[e.sink_id_property] == pairs["__dk"]
            )
            deleted = tbl.join(pairs, cond, "left_semi")
            self.tables[e.table] = tbl.join(pairs, cond, "left_anti")
            self._count_into("relationships_deleted", deleted)
            return
        if owner == "sink":
            own = self.graph.get_node(e.sink_label)
            row_key, fk_col, fk_val = "__dk", e.source_id_property, "__ds"
        else:
            own = self.graph.get_node(e.source_label)
            row_key, fk_col, fk_val = "__ds", e.sink_id_property, "__dk"
        # one row per owning key: an FK row holds a single edge, so the
        # matched pairs are unique per __rk already — the groupBy is a
        # structural guarantee that the left join below cannot fan out
        upd = (
            pairs.select(
                F.col(row_key).alias("__rk"), F.col(fk_val).alias("__fv")
            )
            .groupBy("__rk")
            .agg(F.max("__fv").alias("__fv"))
        )
        dtype = dict(tbl.dtypes)[fk_col]
        joined = tbl.join(upd, tbl[own.id_property] == upd["__rk"], "left")
        hit = upd["__fv"].isNotNull() & tbl[fk_col].eqNullSafe(
            upd["__fv"].cast(dtype)
        )
        deleted = joined.where(hit).select("__rk")
        self.tables[e.table] = joined.withColumn(
            fk_col,
            F.when(hit, F.lit(None).cast(dtype)).otherwise(F.col(fk_col)),
        ).drop("__rk", "__fv")
        self._count_into("relationships_deleted", deleted)

    def _apply_delete_node(self, node: NodeSchema, keys: DataFrame, detach: bool):
        for e in self.graph.edges:
            if node.label not in (e.source_label, e.sink_label):
                continue
            owner = _owner_of_edge(self.graph, e)
            sides = []
            if e.source_label == node.label:
                sides.append(("source", e.source_id_property))
            if e.sink_label == node.label:
                sides.append(("sink", e.sink_id_property))
            for side, fk_col in sides:
                if owner == side:
                    continue  # edge row IS the deleted node row: removed below
                tbl = self._get_table(e.table)
                if detach:
                    if owner is None:
                        # standalone edge table: drop the edge rows
                        self.tables[e.table] = tbl.join(
                            keys, tbl[fk_col] == keys["__dk"], "left_anti"
                        )
                    else:
                        # FK-embedded on the OTHER endpoint's node table:
                        # null the FK column (edge disappears; node stays)
                        dtype = dict(tbl.dtypes)[fk_col]
                        joined = tbl.join(
                            keys, tbl[fk_col] == keys["__dk"], "left"
                        )
                        self.tables[e.table] = joined.withColumn(
                            fk_col,
                            F.when(
                                keys["__dk"].isNotNull(),
                                F.lit(None).cast(dtype),
                            ).otherwise(F.col(fk_col)),
                        ).drop("__dk")
                elif self.validate:
                    # Neo4j: plain DELETE fails while relationships remain
                    n = (
                        self._get_table(e.table)
                        .join(keys, F.col(fk_col) == keys["__dk"], "left_semi")
                        .count()
                    )
                    if n:
                        raise TranspilerBindingError(
                            f"Cannot DELETE {node.label} nodes: {n} "
                            f"{e.verb} relationship(s) still reference them "
                            "(use DETACH DELETE)"
                        )
        tbl = self._get_table(node.table)
        self.tables[node.table] = tbl.join(
            keys, tbl[node.id_property] == keys["__dk"], "left_anti"
        )
        self._count_into("nodes_deleted", keys)

    # -- CREATE ------------------------------------------------------------
    def _plan_create(self, clause: A.CreateClause):
        part_plans = [self._plan_create_part(p) for p in clause.patterns]

        def apply(binding: DataFrame):
            for p in part_plans:
                p(binding)

        return apply

    def _plan_create_part(self, part: A.PatternPart):
        # classify nodes: bound references vs creations
        created: dict[int, dict] = {}  # node index -> spec
        for i, n in enumerate(part.nodes):
            if n.alias and n.alias in self.scope and not n.props:
                continue  # bound reference
            if n.alias and n.alias in self.scope and n.props:
                raise TranspilerSyntaxError(
                    f"CREATE cannot re-create bound alias '{n.alias}'"
                )
            if not n.label:
                raise TranspilerBindingError(
                    "CREATE node requires an explicit label"
                )
            node = self.graph.get_node(n.label)
            props = dict(n.props)
            if node.id_property not in props:
                raise TranspilerBindingError(
                    f"CREATE (:{n.label}) requires the id property "
                    f"'{node.id_property}' in the property map (table-backed "
                    "nodes have no auto-generated ids)"
                )
            _no_aggregates(list(props.values()))
            cols = {p: self._val_col(e) for p, e in props.items()}
            created[i] = {"schema": node, "cols": cols, "pattern": n}
            if n.alias:
                self._created_aliases.add(n.alias)
                for p, e in props.items():
                    self._written[(n.alias, p)] = e
                self._write_bound[n.alias] = (
                    n.label, props[node.id_property]
                )

        # relationship storage plans
        rel_plans = []
        for hop_idx, (left, rel, right) in enumerate(part.hops()):
            li, ri = hop_idx, hop_idx + 1
            if rel.direction == A.Direction.EITHER:
                raise TranspilerSyntaxError(
                    "CREATE relationships require a direction"
                )
            if rel.min_hops is not None or rel.alt_verbs:
                raise TranspilerSyntaxError(
                    "CREATE supports single-hop, single-type relationships"
                )
            if rel.verb is None:
                raise TranspilerSyntaxError(
                    "CREATE relationship requires a type"
                )
            if rel.direction == A.Direction.BACKWARD:
                src_i, snk_i, src_n, snk_n = ri, li, right, left
            else:
                src_i, snk_i, src_n, snk_n = li, ri, left, right

            def label_of(idx, npat):
                if idx in created:
                    return created[idx]["schema"].label
                return _node_schema(self.graph, self.scope, npat.alias).label

            src_label = label_of(src_i, src_n)
            snk_label = label_of(snk_i, snk_n)
            e = self.graph.try_get_edge(rel.verb, src_label, snk_label)
            if e is None:
                raise TranspilerBindingError(
                    f"CREATE relationship [:{rel.verb}] between "
                    f"{src_label} and {snk_label} has no edge schema; "
                    "declare it (and its backing table) first"
                )
            _no_aggregates([x for _, x in rel.props])
            rprop_cols = {p: self._val_col(x) for p, x in rel.props}

            def key_col_of(idx, npat):
                if idx in created:
                    spec = created[idx]
                    return spec["cols"][spec["schema"].id_property]
                return self._key_col(npat.alias)

            src_key = key_col_of(src_i, src_n)
            snk_key = key_col_of(snk_i, snk_n)
            owner = _owner_of_edge(self.graph, e)

            def key_expr_of(idx, npat):
                """AST form of the endpoint's id — for RETURN substitution."""
                if idx in created:
                    spec = created[idx]
                    return dict(spec["pattern"].props)[spec["schema"].id_property]
                node = _node_schema(self.graph, self.scope, npat.alias)
                return A.Property(npat.alias, node.id_property)

            if rel.alias:
                for p, x in rel.props:
                    self._written[(rel.alias, p)] = x
                self._written[(rel.alias, e.source_id_property)] = key_expr_of(
                    src_i, src_n
                )
                self._written[(rel.alias, e.sink_id_property)] = key_expr_of(
                    snk_i, snk_n
                )
            if owner == "sink":
                # FK-embedded on the sink's node row: the edge is the
                # source-id FK column of that row
                if snk_i in created:
                    created[snk_i]["cols"][e.source_id_property] = src_key
                    created[snk_i]["cols"].update(rprop_cols)
                    if snk_n.alias:
                        self._written[(snk_n.alias, e.source_id_property)] = (
                            key_expr_of(src_i, src_n)
                        )
                    rel_plans.append(("folded", src_key, snk_key))
                else:
                    rel_plans.append(
                        ("fk", e, snk_key, e.source_id_property, src_key, rprop_cols)
                    )
            elif owner == "source":
                if src_i in created:
                    created[src_i]["cols"][e.sink_id_property] = snk_key
                    created[src_i]["cols"].update(rprop_cols)
                    if src_n.alias:
                        self._written[(src_n.alias, e.sink_id_property)] = (
                            key_expr_of(snk_i, snk_n)
                        )
                    rel_plans.append(("folded", src_key, snk_key))
                else:
                    rel_plans.append(
                        ("fk", e, src_key, e.sink_id_property, snk_key, rprop_cols)
                    )
            else:
                rel_plans.append(("append", e, src_key, snk_key, rprop_cols))

        def apply(binding: DataFrame):
            for spec in created.values():
                self._apply_create_nodes(spec["schema"], spec["cols"], binding)
            for plan in rel_plans:
                if plan[0] == "folded":
                    _, src_key, snk_key = plan
                    self._count_into(
                        "relationships_created",
                        binding.where(
                            F.col(src_key).isNotNull()
                            & F.col(snk_key).isNotNull()
                        ),
                    )
                elif plan[0] == "fk":
                    _, e, row_key, fk_col, fk_val, rprops = plan
                    node = self.graph.get_node(
                        e.sink_label
                        if _owner_of_edge(self.graph, e) == "sink"
                        else e.source_label
                    )
                    pairs = [(fk_col, fk_val)] + list(rprops.items())
                    self._apply_update(
                        e.table, node.id_property, row_key, pairs, binding,
                        counter=None,
                    )
                    self._count_into(
                        "relationships_created",
                        binding.select(row_key).where(
                            F.col(row_key).isNotNull()
                        ),
                    )
                else:
                    _, e, src_key, snk_key, rprops = plan
                    self._apply_append_edge(e, src_key, snk_key, rprops, binding)

        return apply

    def _align_new_rows(self, tbl: DataFrame, new_rows: DataFrame) -> DataFrame:
        """Union new rows under the target table's schema; genuinely new
        property columns extend the table (null for pre-existing rows)."""
        dtypes = dict(tbl.dtypes)
        extra = [c for c in new_rows.columns if c not in dtypes]
        for c in extra:
            tbl = tbl.withColumn(c, F.lit(None).cast(dict(new_rows.dtypes)[c]))
        aligned = new_rows.select(
            *[
                F.col(c).cast(dtypes[c]).alias(c)
                if c in dtypes and c in new_rows.columns
                else (
                    F.col(c).alias(c)
                    if c in new_rows.columns
                    else F.lit(None).cast(dtypes[c]).alias(c)
                )
                for c in tbl.columns
            ]
        )
        return tbl.unionByName(aligned)

    def _apply_create_nodes(self, node: NodeSchema, cols: dict, binding: DataFrame):
        new_rows = binding.select(
            *[F.col(v).alias(p) for p, v in cols.items()]
        ).where(F.col(node.id_property).isNotNull())
        tbl = self._get_table(node.table)
        if self.validate:
            dup = (
                new_rows.groupBy(node.id_property).count().where(F.col("count") > 1)
            ).count()
            clash = new_rows.join(
                tbl, new_rows[node.id_property] == tbl[node.id_property], "left_semi"
            ).count()
            if dup or clash:
                raise TranspilerBindingError(
                    f"CREATE (:{node.label}) would duplicate id values "
                    f"({dup} repeated in the new rows, {clash} already "
                    "present); use MERGE for upsert semantics"
                )
        for p, v in cols.items():
            if p not in tbl.columns:
                self._record_new_prop(node.table, p, binding, v)
        self.tables[node.table] = self._align_new_rows(tbl, new_rows)
        self._count_into("nodes_created", new_rows)

    def _apply_append_edge(self, e: EdgeSchema, src_key, snk_key, rprops, binding):
        cols = {e.source_id_property: src_key, e.sink_id_property: snk_key}
        cols.update(rprops)
        new_rows = binding.select(
            *[F.col(v).alias(p) for p, v in cols.items()]
        ).where(
            F.col(e.source_id_property).isNotNull()
            & F.col(e.sink_id_property).isNotNull()
        )
        tbl = self._get_table(e.table)
        self.tables[e.table] = self._align_new_rows(tbl, new_rows)
        self._count_into("relationships_created", new_rows)

    # -- MERGE -------------------------------------------------------------
    def _plan_merge(self, clause: A.MergeClause):
        part = clause.pattern
        if part.rels:
            return self._plan_merge_rel(clause)
        n = part.nodes[0]
        if not n.label:
            raise TranspilerBindingError("MERGE requires an explicit label")
        node = self.graph.get_node(n.label)
        props = dict(n.props)
        if node.id_property not in props:
            raise TranspilerBindingError(
                f"MERGE (:{n.label}) requires the id property "
                f"'{node.id_property}' in the property map"
            )
        _no_aggregates(list(props.values()))
        _no_aggregates([i.expr for i in clause.on_create + clause.on_match])
        for item in clause.on_create + clause.on_match:
            if n.alias is None or item.alias != n.alias:
                raise TranspilerBindingError(
                    "ON CREATE/ON MATCH SET must target the MERGE alias"
                )
            if item.prop == node.id_property:
                raise TranspilerNotSupportedError(
                    "SET on the id property is not supported"
                )
        pcols = {p: self._val_col(e) for p, e in props.items()}
        oc_cols = [(i.prop, self._val_col(i.expr)) for i in clause.on_create]
        om_cols = [(i.prop, self._val_col(i.expr)) for i in clause.on_match]
        if n.alias:
            # merge props are exact post-write values (matching REQUIRES
            # equality); everything else on the alias is per-row
            # conditional, so RETURN fences it
            self._fenced_aliases.add(n.alias)
            for p, e_ in props.items():
                self._written[(n.alias, p)] = e_
            self._write_bound[n.alias] = (n.label, props[node.id_property])

        def apply(binding: DataFrame):
            self._apply_merge(node, pcols, oc_cols, om_cols, binding)

        return apply

    def _apply_merge(self, node, pcols, oc_cols, om_cols, binding):
        id_v = pcols[node.id_property]
        extra = [(p, v) for p, v in pcols.items() if p != node.id_property]
        vcols = [v for _, v in extra] + [v for _, v in oc_cols + om_cols]
        # one candidate row per id; conflicting non-id values -> max()
        sel = binding.select(
            F.col(id_v).alias("__mk"), *[F.col(v) for v in vcols]
        ).where(F.col("__mk").isNotNull())
        if vcols:
            cand = sel.groupBy("__mk").agg(
                *[F.max(v).alias(v) for v in vcols]
            )
        else:
            # bare MERGE (n {id: ...}) — no value columns to combine
            cand = sel.distinct()
        tbl = self._get_table(node.table)
        dtypes = dict(tbl.dtypes)
        # a candidate matches only if EVERY merge property agrees
        match_cond = tbl[node.id_property] == cand["__mk"]
        for p, v in extra:
            match_cond = match_cond & (
                tbl[p].eqNullSafe(F.col(v).cast(dtypes.get(p, "string")))
            )
        matched = cand.join(tbl, match_cond, "left_semi")
        to_create = cand.join(tbl, match_cond, "left_anti")
        if self.validate:
            # a candidate whose id exists with DIFFERENT merge props can
            # neither match nor create (id collision)
            clash = to_create.join(
                tbl, to_create["__mk"] == tbl[node.id_property], "left_semi"
            ).count()
            if clash:
                raise TranspilerBindingError(
                    f"MERGE (:{node.label}) found {clash} id(s) whose "
                    "existing rows differ on the merge properties"
                )
        # ON MATCH SET via the shared update machinery
        if om_cols:
            upd_binding = matched.select(
                F.col("__mk").alias("__k_m"), *[F.col(v) for _, v in om_cols]
            )
            self._apply_update(
                node.table, node.id_property, "__k_m", om_cols, upd_binding
            )
        # created rows: merge props + ON CREATE SET values
        new_cols = {node.id_property: "__mk"}
        new_cols.update({p: v for p, v in extra})
        for p, v in oc_cols:
            new_cols[p] = v
        new_rows = to_create.select(
            *[F.col(v).alias(p) for p, v in new_cols.items()]
        )
        tbl2 = self._get_table(node.table)
        for p, v in new_cols.items():
            if p not in tbl2.columns:
                self._record_new_prop(node.table, p, to_create, v)
        self.tables[node.table] = self._align_new_rows(tbl2, new_rows)
        self._count_into("nodes_created", new_rows)
        self._count_into("nodes_matched", matched)


    def _plan_merge_rel(self, clause: A.MergeClause):
        """``MERGE (a)-[r:V {props?}]->(b)`` with BOTH endpoints bound:
        create the relationship only where the full pattern (keys + any
        inline props) does not already exist. Standalone edge tables get
        an anti-join + append; FK-embedded edges set the FK column where
        it is currently NULL (a row already pointing at a DIFFERENT node
        cannot hold a second edge — validate=True raises, else skipped).
        ON CREATE/ON MATCH SET (round 6) target the MERGE relationship
        alias: standalone tables update the matched pair rows / stamp the
        appended rows; FK-embedded edges update the owning row's columns,
        split by the pre-write FK state."""
        part = clause.pattern
        if len(part.rels) != 1:
            raise TranspilerNotSupportedError(
                "MERGE supports a single relationship hop"
            )
        left, rel, right = next(part.hops())
        if rel.direction == A.Direction.EITHER:
            raise TranspilerSyntaxError("MERGE relationships require a direction")
        if rel.verb is None or rel.min_hops is not None:
            raise TranspilerSyntaxError(
                "MERGE supports single-hop typed relationships"
            )
        if rel.direction == A.Direction.BACKWARD:
            src_n, snk_n = right, left
        else:
            src_n, snk_n = left, right
        def endpoint(n):
            """(label, key column) for a MERGE-rel endpoint: bound by the
            reading prefix, or (round 6) introduced by an earlier
            CREATE/MERGE clause in this statement — whose id expression
            then keys the candidate pairs."""
            if n.props:
                raise TranspilerSyntaxError(
                    "property maps on MERGE relationship endpoints are not "
                    "supported; bind the nodes with MATCH/WHERE instead"
                )
            if n.alias and n.alias in self.scope:
                return (
                    _node_schema(self.graph, self.scope, n.alias).label,
                    self._key_col(n.alias),
                )
            if n.alias and n.alias in self._write_bound:
                label, id_expr = self._write_bound[n.alias]
                return label, self._val_col(id_expr)
            raise TranspilerBindingError(
                "MERGE relationship endpoints must be bound by a "
                "preceding MATCH, or by a CREATE/MERGE earlier in this "
                "statement"
            )

        src_label, src_key = endpoint(src_n)
        snk_label, snk_key = endpoint(snk_n)
        # multi-type MERGE `[r:A|B]` (round 8; documented divergence —
        # Neo4j rejects type alternation on MERGE): a pair MATCHES when
        # ANY member table holds it; a missing pair is CREATED as the
        # FIRST listed type. ON MATCH SET routes to each member table the
        # pair matched in; ON CREATE SET lands on the created (first
        # member) rows.
        members: list[EdgeSchema] = []
        for v in [rel.verb, *rel.alt_verbs]:
            m = self.graph.try_get_edge(v, src_label, snk_label)
            if m is None:
                raise TranspilerBindingError(
                    f"MERGE relationship [:{v}] between {src_label} and "
                    f"{snk_label} has no edge schema; declare it first"
                )
            members.append(m)
        e = members[0]
        if len(members) > 1:
            for m in members:
                if _owner_of_edge(self.graph, m) is not None:
                    raise TranspilerNotSupportedError(
                        "Multi-type MERGE members must be standalone edge "
                        f"tables; [:{m.verb}] is FK-embedded"
                    )
            for p, _x in rel.props:
                missing = [
                    m.verb
                    for m in members
                    if p not in self._get_table(m.table).columns
                ]
                if missing:
                    raise TranspilerNotSupportedError(
                        f"Multi-type MERGE property '{p}' must exist in "
                        f"every member table (missing in {missing}) — it "
                        "participates in the match condition"
                    )
        _no_aggregates([x for _, x in rel.props])
        _no_aggregates([i.expr for i in clause.on_create + clause.on_match])

        # ON CREATE/ON MATCH SET on relationship MERGE (round 6): items
        # must target the MERGE relationship alias; the assigned columns
        # live on the edge table (standalone) or the owning row
        # (FK-embedded)
        for item in clause.on_create + clause.on_match:
            if not isinstance(item, A.SetItem):
                raise TranspilerNotSupportedError(
                    "ON CREATE/ON MATCH SET on a relationship MERGE "
                    "supports plain property assignments only"
                )
            if rel.alias is None or item.alias != rel.alias:
                raise TranspilerBindingError(
                    "ON CREATE/ON MATCH SET must target the MERGE "
                    "relationship alias"
                )
            if any(
                item.prop in (m.source_id_property, m.sink_id_property)
                for m in members
            ):
                raise TranspilerNotSupportedError(
                    "SET on a relationship key column is not supported"
                )
        rprop_cols = {p: self._val_col(x) for p, x in rel.props}
        oc_cols = [(i.prop, self._val_col(i.expr)) for i in clause.on_create]
        om_cols = [(i.prop, self._val_col(i.expr)) for i in clause.on_match]
        if rel.alias:
            self._fenced_aliases.add(rel.alias)
        owner = _owner_of_edge(self.graph, e)

        def apply(binding: DataFrame):
            vcols = list(rprop_cols.values()) + [
                v for _, v in oc_cols + om_cols
            ]
            cand = binding.select(
                F.col(src_key).alias("__ms"),
                F.col(snk_key).alias("__mk"),
                *[F.col(v) for v in vcols],
            ).where(F.col("__ms").isNotNull() & F.col("__mk").isNotNull())
            if vcols:
                if self.on_conflict == "error":
                    # round 7 (ADVICE r6): the loud mode must also cover
                    # the MERGE-rel path — the max() pre-aggregation below
                    # would otherwise silently resolve two binding rows
                    # assigning different values to the same (src, snk)
                    multi = F.lit(False)
                    for v in vcols:
                        multi = multi | (F.col(v) > 1)
                    conflicts = (
                        cand.groupBy("__ms", "__mk")
                        .agg(*[F.countDistinct(v).alias(v) for v in vcols])
                        .where(multi)
                        .count()
                    )
                    if conflicts:
                        raise TranspilerBindingError(
                            f"MERGE [:{e.verb}]: {conflicts} (source, "
                            "sink) pair(s) received more than one "
                            "distinct property value in this statement "
                            "(on_conflict='error'; use the default 'max' "
                            "for deterministic resolution)"
                        )
                cand = cand.groupBy("__ms", "__mk").agg(
                    *[F.max(v).alias(v) for v in vcols]
                )
            else:
                cand = cand.distinct()
            if len(members) > 1:
                # multi-type: match-in-any-member, create-as-first-member
                def member_cond(tbl_m, m, cdf):
                    c = (tbl_m[m.source_id_property] == cdf["__ms"]) & (
                        tbl_m[m.sink_id_property] == cdf["__mk"]
                    )
                    dt_m = dict(tbl_m.dtypes)
                    for p, v in rprop_cols.items():
                        c = c & tbl_m[p].eqNullSafe(
                            F.col(v).cast(dt_m.get(p, "string"))
                        )
                    return c

                to_create = cand
                for m in members:
                    tbl_m = self._get_table(m.table)
                    if om_cols:
                        matched_m = cand.join(
                            tbl_m, member_cond(tbl_m, m, cand), "left_semi"
                        ).select(
                            "__ms", "__mk", *[F.col(v) for _, v in om_cols]
                        )
                        self._apply_update(
                            m.table,
                            (m.source_id_property, m.sink_id_property),
                            ("__ms", "__mk"),
                            om_cols,
                            matched_m,
                        )
                    to_create = to_create.join(
                        tbl_m, member_cond(tbl_m, m, to_create), "left_anti"
                    )
                cols = {
                    e.source_id_property: "__ms",
                    e.sink_id_property: "__mk",
                }
                cols.update(rprop_cols)
                for p, v in oc_cols:
                    cols[p] = v
                new_rows = to_create.select(
                    *[F.col(v).alias(p) for p, v in cols.items()]
                )
                tbl2 = self._get_table(e.table)  # post ON-MATCH update
                for p, v in cols.items():
                    if p not in tbl2.columns:
                        self._record_new_prop(e.table, p, to_create, v)
                self.tables[e.table] = self._align_new_rows(tbl2, new_rows)
                self._count_into("relationships_created", new_rows)
                return
            tbl = self._get_table(e.table)
            dtypes = dict(tbl.dtypes)
            if owner is None:
                # standalone edge table: append the missing pairs
                cond = (tbl[e.source_id_property] == cand["__ms"]) & (
                    tbl[e.sink_id_property] == cand["__mk"]
                )
                for p, v in rprop_cols.items():
                    cond = cond & tbl[p].eqNullSafe(
                        F.col(v).cast(dtypes.get(p, "string"))
                    )
                to_create = cand.join(tbl, cond, "left_anti")
                if om_cols:
                    matched = cand.join(tbl, cond, "left_semi")
                    upd_b = matched.select(
                        "__ms", "__mk", *[F.col(v) for _, v in om_cols]
                    )
                    self._apply_update(
                        e.table,
                        (e.source_id_property, e.sink_id_property),
                        ("__ms", "__mk"),
                        om_cols,
                        upd_b,
                    )
                cols = {e.source_id_property: "__ms", e.sink_id_property: "__mk"}
                cols.update(rprop_cols)
                for p, v in oc_cols:
                    cols[p] = v
                new_rows = to_create.select(
                    *[F.col(v).alias(p) for p, v in cols.items()]
                )
                tbl2 = self._get_table(e.table)  # post ON-MATCH update
                for p, v in cols.items():
                    if p not in tbl2.columns:
                        self._record_new_prop(e.table, p, to_create, v)
                self.tables[e.table] = self._align_new_rows(tbl2, new_rows)
                self._count_into("relationships_created", new_rows)
                return
            # FK-embedded: the edge is a column of the owning row
            if rprop_cols:
                raise TranspilerNotSupportedError(
                    "MERGE with relationship properties is not supported on "
                    "FK-embedded edges (the properties live on the owning "
                    "row; SET them after the MERGE)"
                )
            if owner == "sink":
                row_key, fk_col, fk_val = "__mk", e.source_id_property, "__ms"
                own_node = self.graph.get_node(e.sink_label)
            else:
                row_key, fk_col, fk_val = "__ms", e.sink_id_property, "__mk"
                own_node = self.graph.get_node(e.source_label)
            set_vals = [v for _, v in oc_cols + om_cols]
            upd = cand.select(
                F.col(row_key).alias("__rk"),
                F.col(fk_val).alias("__fv"),
                *[F.col(v) for v in set_vals],
            )
            if self.validate:
                # one owning row can hold exactly one FK edge: a statement
                # that binds TWO different partners to the same row must
                # fail loudly, not fan the node table out through the join
                n_multi = (
                    upd.groupBy("__rk")
                    .agg(F.countDistinct("__fv").alias("__n"))
                    .where(F.col("__n") > 1)
                    .count()
                )
                if n_multi:
                    raise TranspilerBindingError(
                        f"MERGE [:{e.verb}]: {n_multi} {own_node.label} "
                        "row(s) matched more than one distinct partner in "
                        "this statement (one edge per row in the "
                        f"FK-embedded column '{fk_col}')"
                    )
            # exactly one update row per owning key (max() = the same
            # documented deterministic conflict rule as _apply_update)
            upd = upd.groupBy("__rk").agg(
                F.max("__fv").alias("__fv"),
                *[F.max(v).alias(v) for v in set_vals],
            )
            joined = tbl.join(upd, tbl[own_node.id_property] == upd["__rk"], "left")
            if self.validate:
                n_conflict = (
                    joined.where(
                        upd["__fv"].isNotNull()
                        & F.col(fk_col).isNotNull()
                        & (F.col(fk_col) != upd["__fv"])
                    ).count()
                )
                if n_conflict:
                    raise TranspilerBindingError(
                        f"MERGE [:{e.verb}]: {n_conflict} {own_node.label} "
                        "row(s) already hold a DIFFERENT relationship in the "
                        f"FK-embedded column '{fk_col}' (one edge per row in "
                        "this storage layout)"
                    )
            created = joined.where(
                upd["__fv"].isNotNull() & F.col(fk_col).isNull()
            ).select("__rk")
            self.tables[e.table] = (
                joined.withColumn(
                    fk_col,
                    F.when(
                        upd["__fv"].isNotNull() & F.col(fk_col).isNull(),
                        upd["__fv"].cast(dtypes[fk_col]),
                    ).otherwise(F.col(fk_col)),
                ).drop("__rk", "__fv", *set_vals)
            )
            self._count_into("relationships_created", created)
            # ON CREATE/ON MATCH SET land on the owning row's columns
            # (FK-embedded props live there); split by the PRE-write FK
            # state: null FK -> just created, FK == partner -> matched
            if oc_cols:
                created_b = upd.join(
                    tbl,
                    (tbl[own_node.id_property] == upd["__rk"])
                    & tbl[fk_col].isNull(),
                    "left_semi",
                ).select(F.col("__rk"), *[F.col(v) for _, v in oc_cols])
                self._apply_update(
                    e.table, own_node.id_property, "__rk", oc_cols, created_b
                )
            if om_cols:
                matched_b = upd.join(
                    tbl,
                    (tbl[own_node.id_property] == upd["__rk"])
                    & (tbl[fk_col] == upd["__fv"].cast(dtypes[fk_col])),
                    "left_semi",
                ).select(F.col("__rk"), *[F.col(v) for _, v in om_cols])
                self._apply_update(
                    e.table, own_node.id_property, "__rk", om_cols, matched_b
                )

        return apply


@dataclass
class _Segment:
    """One clause-sequential execution unit: reads, then writes, ended by
    either a boundary WITH (carried into the next segment) or a final
    RETURN (post-write values via substitution)."""

    reading: list
    writes: list
    boundary: A.ProjectionClause | None = None
    returning: A.ProjectionClause | None = None
    # True for the synthetic boundary cut after a FOREACH's writes: the
    # carry compiles over the reading MINUS the desugared UNWIND
    # (pre-FOREACH cardinality) and excludes FOREACH-scoped names
    foreach_boundary: bool = False


def _is_foreach_unwind(c) -> bool:
    return isinstance(c, A.UnwindClause) and getattr(c, "foreach", False)


def _split_segments(clauses: list) -> list[_Segment]:
    segs: list[_Segment] = []
    reading: list = []
    writes: list = []
    for c in clauses:
        if isinstance(c, A.WriteClause):
            writes.append(c)
        elif isinstance(c, A.ProjectionClause) and writes:
            if any(_is_foreach_unwind(r) for r in reading):
                # round 7: a WITH/RETURN after FOREACH — cut a SYNTHETIC
                # boundary right after the FOREACH's writes; the user's
                # projection then runs in the NEXT segment against the
                # post-write tables (no substitution needed, FOREACH-var-
                # dependent SETs included) at pre-FOREACH cardinality
                segs.append(_Segment(reading, writes, foreach_boundary=True))
                reading, writes = [c], []
            elif c.is_return:
                segs.append(_Segment(reading, writes, returning=c))
                reading, writes = [], []
            else:
                segs.append(_Segment(reading, writes, boundary=c))
                reading, writes = [], []
        else:
            reading.append(c)
    if reading or writes:
        segs.append(_Segment(reading, writes))
    return segs


def _written_aliases(clauses) -> set[str]:
    """Every alias a write clause TARGETS: SET/REMOVE/DELETE subjects and
    any alias appearing in a CREATE/MERGE pattern (a bound endpoint of a
    created edge counts — the write must resolve its backing table)."""
    out: set[str] = set()
    for c in clauses:
        if isinstance(c, A.SetClause):
            out.update(it.alias for it in c.items)
        elif isinstance(c, A.RemoveClause):
            out.update(a for a, _ in c.items)
            out.update(a for a, _ in c.labels)
        elif isinstance(c, A.DeleteClause):
            out.update(c.aliases)
        elif isinstance(c, (A.CreateClause, A.MergeClause)):
            parts = (
                c.patterns if isinstance(c, A.CreateClause) else [c.pattern]
            )
            for p in parts:
                out.update(n.alias for n in p.nodes if n.alias)
                out.update(r.alias for r in p.rels if r.alias)
            if isinstance(c, A.MergeClause):
                out.update(it.alias for it in c.on_create)
                out.update(it.alias for it in c.on_match)
    return out


def execute_write(
    engine,
    query: str,
    params=None,
    validate: bool = True,
    on_conflict: str = "max",
) -> WriteResult:
    """Parse and execute a write statement.

    Clause-sequential visibility (Neo4j semantics, round 6): a WITH after
    a write clause splits the statement into SEGMENTS; each segment's
    reads run against the previous segment's post-write tables, with the
    boundary WITH's bindings carried across as a SeedOp. Within one
    segment, all write clauses still read that segment's pre-write
    snapshot (documented divergence for same-segment write stacking)."""
    from .cypher import parse

    ast_query = parse(query, allow_writes=True)
    if isinstance(ast_query, A.UnionQuery):
        raise TranspilerNotSupportedError("UNION over a write query is not supported")
    # round 12: Neo4j label-narrowing on re-bound aliases must resolve
    # BEFORE the write executor's own binding/segment analysis reads
    # pattern labels (a later `(c:Part)` over a Customer-bound c is a
    # per-row predicate, not a re-typing of c)
    engine._desugar_rebound_labels(ast_query)
    # reading patterns + CREATE/MERGE target patterns (the generic
    # traversal covers only read clauses)
    write_parts = [
        p
        for c in ast_query.clauses
        if isinstance(c, (A.CreateClause, A.MergeClause))
        for p in (c.patterns if isinstance(c, A.CreateClause) else [c.pattern])
    ]
    for part in write_parts:
        if any(n.label and "|" in n.label for n in part.nodes):
            raise TranspilerNotSupportedError(
                "Label disjunction (n:A|B) is read-only — a tagged-union "
                "node has no single backing table to write to"
            )
    # round 9 (VERDICT r8 #4): a disjunction in the READING prefix is
    # fine as long as no write TARGETS the union alias — `MATCH
    # (n:A|B)-[:R]->(m) SET m.flag = true` writes only m. The fence now
    # covers exactly the invariant it protects: writing ON (or creating
    # an edge to) a tagged-union alias, which has no single backing table.
    ml_read_aliases = {
        n.alias
        for _sq, _cl, p in engine._pattern_parts(ast_query)
        for n in p.nodes
        if n.label and "|" in n.label and n.alias
    }
    if ml_read_aliases:
        hit = sorted(ml_read_aliases & _written_aliases(ast_query.clauses))
        if hit:
            raise TranspilerNotSupportedError(
                f"Cannot write on label-disjunction alias(es) {hit} — a "
                "tagged-union node has no single backing table to write "
                "to (reads over (n:A|B) in the same statement are fine)"
            )
    clauses = list(ast_query.clauses)
    itx = [
        c
        for c in clauses
        if isinstance(c, A.CallSubqueryClause)
        and getattr(c, "in_transactions", False)
    ]
    if itx:
        return _execute_in_transactions(
            engine, clauses, params, validate, on_conflict
        )
    if not any(isinstance(c, A.WriteClause) for c in clauses):
        raise TranspilerSyntaxError("cypher_write() requires a write clause")
    return _run_write_segments(
        engine, engine, _split_segments(clauses), params, validate,
        on_conflict, None, {}, {},
    )


def _engine_opts(engine) -> dict:
    return dict(
        reach_max_iters=engine.reach_max_iters,
        ordered_aggregates=engine.ordered_aggregates,
        path_enum_max_hops=engine.path_enum_max_hops,
        path_enum_max_paths=engine.path_enum_max_paths,
        allow_walk_fallback=engine.allow_walk_fallback,
        rebuild_stale_indexes=engine.rebuild_stale_indexes,
    )


def _run_write_segments(
    eng,
    base_engine,
    segs: "list[_Segment]",
    params,
    validate: bool,
    on_conflict: str,
    seed: "SeedOp | None",
    merged_tables: dict,
    merged_counters: dict,
) -> WriteResult:
    """The clause-sequential segment loop (shared by the plain write path
    and, per batch, by CALL { } IN TRANSACTIONS): run each segment
    against the previous segment's post-write tables, carry the boundary
    WITH as a SeedOp, and fold tables/counters into the passed-in merge
    dicts (mutated — the IN TRANSACTIONS driver accumulates across
    batches)."""

    def merge_counters(counters: dict[str, object]) -> None:
        for k, v in counters.items():
            merged_counters.setdefault(k, []).extend(v)

    for i, seg in enumerate(segs):
        last = i == len(segs) - 1
        if not seg.writes:
            # read-only tail segment (only possible in last position: a
            # boundary is cut exactly when writes exist) — a trailing
            # MATCH/RETURN over the post-write state, seeded by the carry
            returned = None
            if seg.reading:
                returned = eng._run_ast(
                    A.SingleQuery(list(seg.reading)), params, seed=seed
                )
            return WriteResult(
                base_engine.spark,
                eng.graph,
                merged_tables,
                base_engine.tables,
                merged_counters,
                returned=returned,
                index_state=base_engine._export_index_state(),
            )
        ex = WriteExecutor(
            eng,
            seg.reading,
            seg.writes,
            seg.returning,
            params,
            validate,
            on_conflict,
            seed=seed,
        )
        if last:
            res = ex.run()
            merge_counters(res._counters)
            merged_tables.update(res.tables)
            return WriteResult(
                base_engine.spark,
                res.graph,
                dict(merged_tables),
                base_engine.tables,
                merged_counters,
                returned=res.returned,
                index_state=base_engine._export_index_state(),
            )
        if seg.foreach_boundary:
            seed, graph = ex.run_to_foreach_boundary()
        else:
            seed, graph = ex.run_to_boundary(seg.boundary)
        merged_tables.update(ex.tables)
        merge_counters(ex._counters)
        eng = WriteResult(
            base_engine.spark, graph, dict(ex.tables), eng.tables,
            index_state=base_engine._export_index_state(),
        ).engine(**_engine_opts(base_engine))
    raise TranspilerInternalError("segment loop ended without a result")  # pragma: no cover


def _execute_in_transactions(
    engine, clauses: list, params, validate: bool, on_conflict: str
) -> WriteResult:
    """``<reads> CALL { <write body> } IN TRANSACTIONS [OF n ROWS]``
    (round 14) — Neo4j's batched bulk-write form:

    1. The reading prefix compiles ONCE into the driving-row frame
       (imported values are fixed there, Neo4j semantics).
    2. Rows are segmented into n-row batches (default 1000) by a
       distributed global index — per-partition row_number plus
       broadcast partition offsets (one small per-partition-count
       collect), then the assignment is localCheckpoint'ed so it is
       frozen for the whole statement. No global sort, no single-
       partition window.
    3. Each batch folds the body through the ordinary clause-sequential
       segment machinery (:func:`_run_write_segments`) seeded with that
       batch's rows, and the post-batch tables roll into the next
       batch's engine — a later batch OBSERVES an earlier batch's
       writes, the semantic that distinguishes this form from a plain
       write. Batch tables are lazily localCheckpoint'ed so lineage
       depth stays O(1) in the batch count.
    4. Clauses after the CALL run read-only against the final state
       (driving variables are out of scope, Neo4j's rule).

    Divergences (typed): the body must write and must not RETURN;
    ``ON ERROR`` / ``REPORT STATUS`` are rejected at parse; there is no
    mid-statement rollback — Spark DataFrames are immutable snapshots,
    so a failed statement leaves the engine's registered tables
    untouched (stronger than Neo4j, where completed batches stay
    committed)."""
    import copy

    from pyspark.sql import Window

    idx = [
        i
        for i, c in enumerate(clauses)
        if isinstance(c, A.CallSubqueryClause)
        and getattr(c, "in_transactions", False)
    ]
    if len(idx) > 1:
        raise TranspilerNotSupportedError(
            "Only one CALL { } IN TRANSACTIONS per statement"
        )
    pos = idx[0]
    call = clauses[pos]
    prefix, suffix = clauses[:pos], clauses[pos + 1:]
    if any(isinstance(c, A.WriteClause) for c in prefix):
        raise TranspilerNotSupportedError(
            "CALL { } IN TRANSACTIONS cannot follow a write clause in "
            "the same statement (Neo4j: implicit-transaction form)"
        )
    if any(
        isinstance(c, (A.WriteClause, A.CallSubqueryClause))
        for c in suffix
    ):
        raise TranspilerNotSupportedError(
            "Only read clauses / RETURN may follow "
            "CALL { } IN TRANSACTIONS"
        )
    if isinstance(call.query, A.UnionQuery):
        raise TranspilerNotSupportedError(
            "UNION inside CALL { } IN TRANSACTIONS is not supported"
        )
    body = list(call.query.clauses)
    if not any(isinstance(c, A.WriteClause) for c in body):
        raise TranspilerNotSupportedError(
            "The CALL { } IN TRANSACTIONS body must contain a write "
            "clause (for batched reads, run the query through cypher())"
        )
    last_body = body[-1]
    if isinstance(last_body, A.ProjectionClause) and last_body.is_return:
        raise TranspilerNotSupportedError(
            "A RETURN inside CALL { } IN TRANSACTIONS is not supported "
            "— the batched form is write-only here"
        )
    batch_rows = call.batch_rows or 1000

    # -- driving rows ------------------------------------------------------
    seed_env = None
    batched = None
    n_batches = 1
    if prefix:
        scope_names = [
            n
            for n in _resolve_scope(prefix, engine.graph)
            if not n.startswith("__")
        ]
        proj = A.ProjectionClause(
            items=[(n, A.Variable(n)) for n in scope_names],
            is_return=False,
        )
        df, seed_env = engine._run_ast_env(
            A.SingleQuery(list(prefix) + [proj]), params
        )
        # distributed n-row batching: per-partition index + broadcast
        # cumulative offsets -> global index -> batch id; checkpointed
        # so the (otherwise nondeterministic) assignment is frozen
        pid = df.withColumn("__itx_pid", F.spark_partition_id())
        counts = sorted(
            (r["__itx_pid"], r["cnt"])
            for r in pid.groupBy("__itx_pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        total = sum(c for _p, c in counts)
        if total == 0:
            n_batches = 0
        else:
            n_batches = -(-total // batch_rows)
        offs = []
        run = 0
        for p, c in counts:
            offs.append((p, run))
            run += c
        if offs:
            odf = engine.spark.createDataFrame(
                offs, "__itx_pid int, __itx_off long"
            )
            w = Window.partitionBy("__itx_pid").orderBy(
                F.monotonically_increasing_id()
            )
            batched = (
                pid.withColumn(
                    "__itx_ridx", F.row_number().over(w) - F.lit(1)
                )
                .join(F.broadcast(odf), "__itx_pid")
                .withColumn(
                    "__itx_bid",
                    (
                        (F.col("__itx_off") + F.col("__itx_ridx"))
                        / F.lit(batch_rows)
                    ).cast("int"),
                )
                .drop("__itx_pid", "__itx_ridx", "__itx_off")
                .localCheckpoint(eager=True)
            )

    # -- batch loop --------------------------------------------------------
    eng = engine
    merged_tables: dict[str, DataFrame] = {}
    merged_counters: dict[str, object] = {}
    graph = engine.graph
    for b in range(n_batches):
        if batched is not None:
            bdf = batched.filter(F.col("__itx_bid") == b).drop("__itx_bid")
            seed = SeedOp(df=bdf, env=dict(seed_env))
        else:
            seed = None
        body_copy = copy.deepcopy(body)
        res = _run_write_segments(
            eng, engine, _split_segments(body_copy), params, validate,
            on_conflict, seed, merged_tables, merged_counters,
        )
        graph = res.graph
        # roll forward: next batch reads this batch's writes; lazy
        # checkpoints bound lineage depth across many batches
        tables = {
            k: v.localCheckpoint(eager=False)
            for k, v in merged_tables.items()
        }
        merged_tables.update(tables)
        eng = WriteResult(
            engine.spark, graph, dict(tables), engine.tables,
            index_state=engine._export_index_state(),
        ).engine(**_engine_opts(engine))

    returned = None
    if suffix:
        returned = eng._run_ast(A.SingleQuery(list(suffix)), params)
    return WriteResult(
        engine.spark,
        graph,
        merged_tables,
        engine.tables,
        merged_counters,
        returned=returned,
        index_state=engine._export_index_state(),
    )
