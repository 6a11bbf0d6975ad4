"""AST -> logical operator DAG (IR #1 -> IR #2).

Re-implements the reference's planning semantics (SURVEY.md §2.2, §2.6) as
plain Python:

- one DataSource per distinct pattern alias; anonymous entities get
  ``__unnamed_N`` aliases (reference MatchClause.cs:53-73);
- label/verb inference to fixpoint over pattern hops using the directional
  edge registry (reference CypherVisitor.cs:644-788);
- join fabric: hop joins are Inner equi-joins on node-id vs edge src/sink
  keys; re-visited aliases become equality predicates; disjoint pattern
  segments cross-join (reference LogicalPlan.cs:646-1020, three-pass
  Inner->Left->Cross construction);
- implicit relationship-uniqueness conjuncts when one edge type appears
  more than once in a MATCH (reference LogicalPlan.cs:969-1017);
- OPTIONAL MATCH forks the plan: the optional side is planned standalone
  (its WHERE applied inside), then LEFT-joined back on the shared node ids
  (reference LogicalPlan.cs:367-408);
- WITH/RETURN projections with Cypher implicit grouping and the
  implicit-field scoping rule (reference LogicalPlan.cs:203-288).
"""

from __future__ import annotations

import itertools

from ..cypher import ast as A
from ..exceptions import (
    TranspilerBindingError,
    TranspilerInternalError,
    TranspilerNotSupportedError,
)
from ..schema import EdgeSchema, GraphSchema
from .logical import (
    ColRef,
    DataSourceOp,
    EntityRef,
    Env,
    CollectPatternOp,
    ExistsFlagOp,
    JoinOp,
    LogicalOp,
    MaterializedPathRef,
    OneRowOp,
    PathRef,
    ProjectOp,
    RowIdOp,
    SelectionOp,
    SetOp,
    TrimOp,
    UnwindOp,
    ValueRef,
    WindowLimitOp,
)


def plan_query(
    query: A.Query,
    schema: GraphSchema,
    ordered_aggregates: bool = False,
    seed: LogicalOp | None = None,
) -> LogicalOp:
    """Plan a parsed query against the graph schema.

    ``ordered_aggregates`` (extension, off by default for reference
    parity) makes collect()/first()/last() honor the immediately
    preceding WITH's ORDER BY, Neo4j-style.

    ``seed`` (write path only) is a pre-compiled source op — the carried
    binding of a write-segment boundary; the query's clauses plan on top
    of it exactly as if they followed a WITH."""
    if seed is not None and isinstance(query, A.UnionQuery):
        raise TranspilerInternalError(
            "seeded plans cannot span UNION queries"
        )  # pragma: no cover — the write executor rejects UNION first
    if isinstance(query, A.UnionQuery):
        left = plan_query(query.left, schema, ordered_aggregates)
        right = plan_query(query.right, schema, ordered_aggregates)
        l_aliases = list(left.env.keys())
        r_aliases = list(right.env.keys())
        if sorted(l_aliases) != sorted(r_aliases):
            raise TranspilerBindingError(
                f"UNION branches must return the same columns: {l_aliases} vs {r_aliases}"
            )
        return SetOp(left, right, all=query.all, env=dict(left.env))
    return _SingleQueryPlanner(schema, ordered_aggregates).plan(query, seed)


# ---------------------------------------------------------------------------


def _expr_alias_refs(expr: A.Expr, bound: frozenset = frozenset()):
    """Yield (alias, prop_or_None) for every FREE variable/property
    reference — comprehension/quantifier lambda variables are lexically
    bound, not references into the plan env."""
    if isinstance(expr, A.Variable):
        if expr.name not in bound:
            yield expr.name, None
        return
    if isinstance(expr, A.Property):
        if expr.alias not in bound:
            yield expr.alias, expr.prop
        return
    if isinstance(expr, A.MapProjection):
        # the projected alias is referenced as a whole; `.prop` items are
        # schema-checked property references (`.*`, entries and var
        # shorthands ride the generic children() walk below)
        if expr.alias not in bound:
            yield expr.alias, None
            for kind, v in expr.items:
                if kind == "prop":
                    yield expr.alias, v
        for kind, v in expr.items:
            if kind == "entry":
                yield from _expr_alias_refs(v[1], bound)
            elif kind == "var" and v not in bound:
                yield v, None
        return
    if isinstance(expr, (A.ListComprehension, A.Quantified)):
        yield from _expr_alias_refs(expr.list_expr, bound)
        inner = bound | {expr.var}
        for child in expr.children()[1:]:
            yield from _expr_alias_refs(child, inner)
        return
    if isinstance(expr, A.Reduce):
        yield from _expr_alias_refs(expr.init, bound)
        yield from _expr_alias_refs(expr.list_expr, bound)
        yield from _expr_alias_refs(expr.body, bound | {expr.acc, expr.var})
        return
    for child in expr.children():
        yield from _expr_alias_refs(child, bound)


def validate_expr(expr: A.Expr, env: Env) -> None:
    """Binding check: every referenced alias/property must resolve."""
    for alias, prop in _expr_alias_refs(expr):
        ref = env.get(alias)
        if ref is None:
            raise TranspilerBindingError(f"Alias '{alias}' does not exist")
        if prop is not None:
            if isinstance(ref, ValueRef):
                # allowed (extension): struct-field access on a piped map
                # value and temporal accessors (d.year) — resolved by the
                # expression compiler / Catalyst, not the binder
                continue
            if prop not in ref.property_names:
                raise TranspilerBindingError(
                    f"Property '{prop}' is not defined on '{alias}' ({ref.label})"
                )


def _references_outside_aggregates(expr, grouping_exprs, bound=frozenset()):
    """First entity/value reference inside ``expr`` that sits OUTSIDE any
    aggregate call and is not a projected grouping expression (nor a
    lambda-bound variable) — the Neo4j "implicit grouping expression"
    check. Returns a display name or None."""
    import dataclasses

    if isinstance(expr, A.AggCall):
        return None
    if any(expr == g for g in grouping_exprs):
        return None
    if isinstance(expr, A.Property):
        if expr.alias in bound:
            return None
        return f"{expr.alias}.{expr.prop}"
    if isinstance(expr, A.Variable):
        return None if expr.name in bound else expr.name
    inner = bound
    if isinstance(expr, (A.ListComprehension, A.Quantified)):
        inner = bound | {expr.var}
    elif isinstance(expr, A.Reduce):
        inner = bound | {expr.acc, expr.var}
    if dataclasses.is_dataclass(expr) and not isinstance(expr, type):
        for f in dataclasses.fields(expr):
            v = getattr(expr, f.name)
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                if isinstance(item, tuple):
                    item = item[-1] if item else None
                if isinstance(item, A.Expr):
                    hit = _references_outside_aggregates(
                        item, grouping_exprs, inner
                    )
                    if hit:
                        return hit
    return None


class _SingleQueryPlanner:
    def __init__(self, schema: GraphSchema, ordered_aggregates: bool = False):
        self.ordered_aggregates = ordered_aggregates
        self.schema = schema
        self.counter = itertools.count()
        # every alias this planner generated — `WITH */RETURN *` excludes
        # by membership here, so a user's own `__foo_1` alias survives *
        self.generated_aliases: set[str] = set()

    def _gen_alias(self, base: str) -> str:
        alias = f"__{base}_{next(self.counter)}"
        self.generated_aliases.add(alias)
        return alias

    def plan(self, sq: A.SingleQuery, seed: LogicalOp | None = None) -> LogicalOp:
        cur = self._plan_clauses(seed, sq.clauses)
        if cur is None:  # pragma: no cover — parser guarantees a RETURN
            raise TranspilerInternalError("Empty query plan")
        return cur

    def _plan_clauses(
        self, cur: LogicalOp | None, clauses: list[A.Clause]
    ) -> LogicalOp | None:
        prev_clause: A.Clause | None = None
        for clause in clauses:
            if isinstance(clause, A.MatchClause):
                if clause.optional:
                    cur = self.plan_optional_match(cur, clause)
                else:
                    cur = self.plan_match(cur, clause)
            elif isinstance(clause, A.UnwindClause):
                cur = self.plan_unwind(cur, clause)
            elif isinstance(clause, A.CallSubqueryClause):
                cur = self.plan_call(cur, clause)
            elif isinstance(clause, A.ProjectionClause):
                # order-sensitive aggregates: an aggregating projection
                # directly after `WITH ... ORDER BY` inherits that order
                # for collect()/first()/last() (engine option)
                hint: list[A.SortItem] = []
                if (
                    self.ordered_aggregates
                    and isinstance(prev_clause, A.ProjectionClause)
                    and prev_clause.order_by
                    and any(A.contains_aggregate(e) for _, e in clause.items)
                ):
                    import copy

                    hint = copy.deepcopy(prev_clause.order_by)
                cur = self.plan_projection(cur, clause, order_hint=hint)
            else:  # pragma: no cover
                raise TranspilerInternalError(f"Unknown clause {clause!r}")
            prev_clause = clause
        return cur

    # -- MATCH ---------------------------------------------------------------

    def plan_match(
        self,
        piped: LogicalOp | None,
        clause: A.MatchClause,
        known_labels: dict[str, str] | None = None,
        prefix_overrides: dict[str, str] | None = None,
    ) -> LogicalOp:
        """Plan a MATCH clause, peeling exists() pattern predicates off the
        WHERE first — they become LEFT SEMI / LEFT ANTI joins on top of the
        planned fabric, not Column expressions."""
        residual, pattern_preds = self._split_pattern_predicates(clause.where)
        # nested predicates (under OR/XOR/CASE/NOT-of-AND/...) need the
        # planned fabric first — they become boolean flag columns below
        has_nested = residual is not None and any(
            isinstance(n, (A.PatternPredicate, A.PatternComprehension))
            for n in residual.walk()
        )
        if pattern_preds or has_nested:
            clause = A.MatchClause(
                clause.patterns, clause.optional, None if has_nested else residual
            )
        # anonymous multi-label nodes get their alias assigned HERE so it
        # survives the var-length deepcopy expansion and is visible to the
        # extra-label pass below
        for part in clause.patterns:
            for n in part.nodes:
                if n.extra_labels and n.alias is None:
                    n.alias = self._gen_alias("mlbl")
        op = self._plan_match_body(piped, clause, known_labels, prefix_overrides)
        if has_nested:
            residual, op = self._rewrite_pattern_predicates(residual, op)
            validate_expr(residual, op.env)
            op = SelectionOp(op, predicate=residual, env=dict(op.env))
        for part, where, negated in pattern_preds:
            op = self._plan_pattern_predicate(op, part, negated, where)
        op = self._apply_extra_labels(op, clause.patterns)
        return op

    def _apply_extra_labels(
        self, op: LogicalOp, patterns: list[A.PatternPart]
    ) -> LogicalOp:
        """Multi-label nodes: each extra label intersects via a semi join."""
        seen_extra: set[tuple[str, str]] = set()
        for part in patterns:
            for n in part.nodes:
                for lbl in n.extra_labels:
                    if n.alias is None:  # pragma: no cover — pre-assigned
                        raise TranspilerInternalError(
                            "unnamed multi-label node reached planning"
                        )
                    if (n.alias, lbl) not in seen_extra:
                        seen_extra.add((n.alias, lbl))
                        op = self._plan_extra_label(op, n.alias, lbl)
        return op

    def _plan_extra_label(
        self, op: LogicalOp, alias: str, label: str
    ) -> LogicalOp:
        """`(n:A:B)`: n's scan is bound to the PRIMARY label A; each extra
        label B adds a LEFT SEMI join of n's id against B's node table —
        the node must exist under both labels. Properties resolve against
        the primary label only (documented extension semantics)."""
        ref = op.env.get(alias)
        if not isinstance(ref, EntityRef) or ref.kind != "node":
            raise TranspilerBindingError(
                f"Extra label ':{label}' applies to '{alias}', which is "
                "not a node entity"
            )
        sch = self.schema.get_node(label)
        extra_ref = EntityRef(
            alias=alias, kind="node", node=sch,
            col_prefix=self._gen_alias(f"xl_{alias}"),
        )
        scan = DataSourceOp([extra_ref], env={})
        pairs = [
            (
                ref.col(ref.node.id_property),
                extra_ref.col(sch.id_property),
            )
        ]
        return JoinOp(op, scan, "semi", pairs, [], env=dict(op.env))

    def _split_pattern_predicates(
        self, where: A.Expr | None
    ) -> tuple[A.Expr | None, list[tuple[A.PatternPart, A.Expr | None, bool]]]:
        """Extract top-level AND conjuncts that are [NOT] exists(pattern).

        Returns (residual where, [(pattern part, inner where, negated),
        ...]). Pattern predicates anywhere else (under OR/XOR/CASE/...)
        stay in the residual; the caller lowers them to boolean flag
        columns via ``_rewrite_pattern_predicates`` (left join + coalesce)
        — the top-level conjuncts here keep the cheaper semi/anti joins."""
        preds: list[tuple[A.PatternPart, A.Expr | None, bool]] = []

        def split(e: A.Expr) -> A.Expr | None:
            if isinstance(e, A.PatternPredicate):
                preds.append((e.part, e.where, False))
                return None
            if (
                isinstance(e, A.Unary)
                and e.op == "NOT"
                and isinstance(e.operand, A.PatternPredicate)
            ):
                preds.append((e.operand.part, e.operand.where, True))
                return None
            if isinstance(e, A.Binary) and e.op == A.BinaryOp.AND:
                left, right = split(e.left), split(e.right)
                if left is None:
                    return right
                if right is None:
                    return left
                e.left, e.right = left, right
                return e
            return e

        if where is None:
            return None, preds
        return split(where), preds

    def _plan_pattern_predicate(
        self,
        op: LogicalOp,
        part: A.PatternPart,
        negated: bool,
        where: A.Expr | None = None,
    ) -> LogicalOp:
        """[NOT] exists(pattern) / EXISTS { pattern WHERE p } as a
        top-level AND conjunct: LEFT SEMI (or LEFT ANTI) join back on the
        shared node ids. The output env is unchanged — a semi join adds
        no columns."""
        right, pairs = self._plan_predicate_pattern_fabric(op, part, where)
        return JoinOp(
            op, right, "anti" if negated else "semi", pairs, [], env=dict(op.env)
        )

    def _plan_exists_flag(
        self,
        op: LogicalOp,
        part: A.PatternPart,
        flag_col: str,
        where: A.Expr | None = None,
    ) -> LogicalOp:
        """exists(pattern) in boolean-expression position (under OR / in a
        projection item): LEFT join against the distinct shared keys,
        materializing ``flag_col`` (true/null; consumers coalesce to
        false). Same pattern fabric as the semi/anti path."""
        right, pairs = self._plan_predicate_pattern_fabric(op, part, where)
        return ExistsFlagOp(op, right, pairs, flag_col, env=dict(op.env))

    def _rewrite_pattern_predicates(
        self, expr: A.Expr | None, op: LogicalOp
    ) -> tuple[A.Expr | None, LogicalOp]:
        """Replace every remaining PatternPredicate inside ``expr`` with
        ``coalesce(<flag col>, false)``, attaching one ExistsFlagOp per
        predicate to ``op``. No-op when the expression has none."""
        if expr is None:
            return None, op

        def rec(e: A.Expr) -> A.Expr:
            nonlocal op
            if isinstance(e, A.PatternPredicate):
                flag = self._gen_alias("exists_flag")
                op = self._plan_exists_flag(op, e.part, flag, e.where)
                return A.FuncCall(
                    "coalesce", [ColRef(flag), A.Literal(False)]
                )
            if isinstance(e, A.PatternComprehension):
                col = self._gen_alias("pat_collect")
                op = self._plan_pattern_comprehension(op, e, col)
                return ColRef(col)
            if isinstance(e, A.Binary):
                e.left, e.right = rec(e.left), rec(e.right)
                return e
            if isinstance(e, A.Unary):
                e.operand = rec(e.operand)
                return e
            if isinstance(e, A.FuncCall):
                e.args = [rec(a) for a in e.args]
                return e
            if isinstance(e, A.AggCall):
                if e.arg is not None:
                    e.arg = rec(e.arg)
                e.extras = [rec(a) for a in e.extras]
                return e
            if isinstance(e, A.CaseExpr):
                e.whens = [(rec(c), rec(v)) for c, v in e.whens]
                if e.else_ is not None:
                    e.else_ = rec(e.else_)
                return e
            if isinstance(e, A.ListComprehension):
                e.list_expr = rec(e.list_expr)
                if e.where is not None:
                    e.where = rec(e.where)
                if e.map_expr is not None:
                    e.map_expr = rec(e.map_expr)
                return e
            if isinstance(e, A.Quantified):
                e.list_expr = rec(e.list_expr)
                e.where = rec(e.where)
                return e
            if isinstance(e, A.ListIndex):
                e.base, e.index = rec(e.base), rec(e.index)
                return e
            if isinstance(e, A.ListSlice):
                e.base = rec(e.base)
                if e.start is not None:
                    e.start = rec(e.start)
                if e.stop is not None:
                    e.stop = rec(e.stop)
                return e
            if isinstance(e, A.MapLiteral):
                e.items = [(k, rec(v)) for k, v in e.items]
                return e
            if isinstance(e, A.FieldAccess):
                e.base = rec(e.base)
                return e
            if isinstance(e, A.ListLiteral):
                e.items = [rec(i) for i in e.items]
                return e
            if isinstance(e, A.Reduce):
                e.init = rec(e.init)
                e.list_expr = rec(e.list_expr)
                e.body = rec(e.body)
                return e
            return e

        return rec(expr), op

    def _plan_pattern_comprehension(
        self, op: LogicalOp, pc: A.PatternComprehension, out_col: str
    ) -> LogicalOp:
        """`[(a)-[:V]->(b) WHERE p | e]`: plan the pattern standalone
        (fresh prefixes for shared aliases), filter with the inner WHERE,
        then grouped-collect the mapped expression and LEFT join back."""
        extras = [pc.where, pc.map_expr]
        right, pairs = self._plan_predicate_pattern_fabric(
            op, pc.part, extras=extras
        )
        inner_where, map_expr = extras
        if inner_where is not None:
            validate_expr(inner_where, right.env)
            right = SelectionOp(
                right, predicate=inner_where, env=dict(right.env)
            )
        validate_expr(map_expr, right.env)
        return CollectPatternOp(
            op, right, pairs, map_expr, out_col, env=dict(op.env)
        )

    def _thread_fabric_scalars(
        self,
        op: LogicalOp,
        part: A.PatternPart,
        where: A.Expr | None,
        extras: list | None = None,
    ) -> tuple[LogicalOp | None, A.Expr | None, dict[str, str]]:
        """Round-11 continuation: outer SCALAR bindings referenced inside
        an exists()/pattern-comprehension fabric (inline maps, inline
        WHEREs, the EXISTS-subquery WHERE) previously failed to resolve
        ("Alias does not exist") because the fabric plans standalone.
        Collect them, rewrite each reference to a FRESH alias, and return
        a DISTINCT projection of those value columns as the fabric's
        piped seed — the caller adds (outer col, fresh col) join pairs,
        exactly the scalar-import mechanics of CALL subqueries. Null
        import values correctly yield false/[]: equality with null never
        holds, like the Cypher predicate itself."""
        env = op.env
        bound = {n.alias for n in part.nodes if n.alias} | {
            r.alias for r in part.rels if r.alias
        }
        if part.path_alias:
            bound.add(part.path_alias)
        mapping: dict[str, str] = {}

        def fresh_for(a: str) -> str:
            if a not in mapping:
                mapping[a] = self._gen_alias(f"exsv_{a}")
            return mapping[a]

        def rewrite(e):
            if isinstance(e, A.Variable):
                if e.name not in bound and isinstance(
                    env.get(e.name), ValueRef
                ):
                    return A.Variable(fresh_for(e.name))
                return e
            if isinstance(e, A.Property):
                # any path depth (ADVICE r11): the fresh ValueRef column
                # supports nested access, so `m.a.b` over an outer map
                # scalar threads exactly like `m.a`
                if e.alias not in bound and isinstance(
                    env.get(e.alias), ValueRef
                ):
                    e.alias = fresh_for(e.alias)
                return e
            if not isinstance(e, A.Expr):
                return e
            for f, v in vars(e).items():
                if isinstance(v, A.Expr):
                    setattr(e, f, rewrite(v))
                elif isinstance(v, list):
                    nv = []
                    for item in v:
                        if isinstance(item, A.Expr):
                            nv.append(rewrite(item))
                        elif isinstance(item, tuple):
                            nv.append(
                                tuple(
                                    rewrite(x)
                                    if isinstance(x, A.Expr)
                                    else x
                                    for x in item
                                )
                            )
                        else:
                            nv.append(item)
                    setattr(e, f, nv)
            return e

        for n in part.nodes:
            n.props = [(k, rewrite(v)) for k, v in n.props]
            if n.where is not None:
                n.where = rewrite(n.where)
        for r in part.rels:
            r.props = [(k, rewrite(v)) for k, v in r.props]
            if r.where is not None:
                r.where = rewrite(r.where)
        if where is not None:
            where = rewrite(where)
        if extras is not None:
            # pattern-comprehension WHERE / map expressions: rewritten
            # in place through the same mapping (the list is mutated so
            # the caller sees the fresh aliases)
            for i, e in enumerate(extras):
                if e is not None:
                    extras[i] = rewrite(e)
        if not mapping:
            return None, where, {}
        seed = ProjectOp(
            op,
            [(f, A.Variable(a)) for a, f in mapping.items()],
            distinct=True,
            env={f: ValueRef(f) for f in mapping.values()},
        )
        return seed, where, mapping

    def _plan_predicate_pattern_fabric(
        self,
        op: LogicalOp,
        part: A.PatternPart,
        where: A.Expr | None = None,
        extras: list | None = None,
    ) -> tuple[LogicalOp, list[tuple[str, str]]]:
        """Plan an exists() pattern standalone with fresh column prefixes
        for the shared node aliases (the OPTIONAL MATCH fork mechanics);
        returns the planned fabric and the (left, right) id-column join
        pairs. Outer scalar references inside the pattern (and in the
        caller's ``extras`` expressions, rewritten in place) are threaded
        through a distinct-value seed (_thread_fabric_scalars)."""
        env = op.env
        seed, where, scalar_map = self._thread_fabric_scalars(
            op, part, where, extras
        )
        shared = [
            n.alias
            for n in part.nodes
            if n.alias is not None and n.alias in env
        ]
        # round-11 continuation: no shared alias and no outer scalar =
        # an UNCORRELATED subquery (COUNT { MATCH (n:Label) },
        # EXISTS { MATCH (a)-[:X]->(b) } with fresh aliases) — planned
        # with empty join pairs; the semi/anti/flag/collect compiles
        # probe a limit-1 / global-aggregate broadcast instead
        for a in shared:
            ref = env[a]
            if not isinstance(ref, EntityRef) or ref.kind != "node":
                raise TranspilerBindingError(
                    f"exists() alias '{a}' is not a node entity"
                )
        clause = A.MatchClause([part], optional=False, where=None)
        # anonymous multi-label nodes inside the predicate pattern need
        # aliases before the extra-label pass, like in plan_match
        for n in part.nodes:
            if n.extra_labels and n.alias is None:
                n.alias = self._gen_alias("mlbl")
        prefix_overrides = {a: self._gen_alias(f"ex_{a}") for a in shared}
        known_labels = {a: env[a].node.label for a in shared}
        right = self._plan_match_body(
            seed, clause, known_labels=known_labels,
            prefix_overrides=prefix_overrides,
        )
        # extra labels on predicate-pattern nodes (shared or fresh) apply
        # to the pattern's own plan before the semi join
        right = self._apply_extra_labels(right, [part])
        if where is not None:
            # EXISTS { ... WHERE p } subquery form: the inner filter sees
            # the pattern's own scope (plus shared aliases and threaded
            # outer scalars)
            validate_expr(where, right.env)
            right = SelectionOp(right, predicate=where, env=dict(right.env))
        pairs = []
        for a in shared:
            left_ref, right_ref = env[a], right.env[a]
            pairs.append(
                (
                    left_ref.col(left_ref.node.id_property),
                    right_ref.col(right_ref.node.id_property),
                )
            )
        for a, f in scalar_map.items():
            pairs.append((env[a].col, f))
        return right, pairs

    @staticmethod
    def _reject_nondeterministic_call_body(body: list) -> None:
        """CALL { } bodies run once per DISTINCT correlation key (import
        value / entity identity) — or once total when uncorrelated — and
        join back to the outer rows; Neo4j invokes the body PER OUTER
        ROW. Indistinguishable for deterministic bodies; divergent for
        rand()/randomUUID(), so those raise a typed error instead of
        silently diverging (ADVICE r11)."""
        nondet = {"rand", "randomuuid"}
        for c in body:
            exprs = []
            w = getattr(c, "where", None)
            if w is not None:
                exprs.append(w)
            if isinstance(c, A.ProjectionClause):
                exprs.extend(e for _, e in c.items)
                exprs.extend(s.expr for s in c.order_by)
            if isinstance(c, A.UnwindClause):
                exprs.append(c.expr)
            if isinstance(c, A.MatchClause):
                # ADVICE r12 (medium): inline pattern predicates and
                # property maps — MATCH (n:L WHERE rand() < 0.5) or
                # (n:L {p: rand()}) — desugar into the same
                # once-per-correlation-key evaluation, so they must be
                # fenced like the clause-level WHERE
                for part in c.patterns:
                    for pat in (*part.nodes, *part.rels):
                        pw = getattr(pat, "where", None)
                        if pw is not None:
                            exprs.append(pw)
                        exprs.extend(
                            pe for _, pe in getattr(pat, "props", [])
                        )
            for e in exprs:
                for nd in e.walk():
                    if isinstance(nd, A.FuncCall) and nd.name in nondet:
                        raise TranspilerNotSupportedError(
                            f"{nd.name}() inside a CALL {{ }} body: the "
                            "body runs once per distinct correlation "
                            "key, not per outer row, so "
                            "non-deterministic functions would diverge "
                            "from Neo4j's per-row invocation — compute "
                            "it outside the subquery and import it"
                        )

    def _plan_match_body(
        self,
        piped: LogicalOp | None,
        clause: A.MatchClause,
        known_labels: dict[str, str] | None = None,
        prefix_overrides: dict[str, str] | None = None,
    ) -> LogicalOp:
        """Bounded variable-length relationships (extension) expand into
        fixed-length variants whose join fabrics are UNION ALL-ed over the
        clause's *named* aliases — one output row per path, with
        per-variant relationship-uniqueness enforcing Cypher's
        edge-distinct path semantics; WHERE applies after the union."""
        variants = self._expand_var_length(clause)
        if len(variants) == 1:
            return self._plan_match_single(
                piped, variants[0], known_labels, prefix_overrides
            )
        ops = []
        zero_dropped: TranspilerBindingError | None = None
        for vc in variants:
            vc.where = None
            try:
                o = self._plan_match_single(
                    piped, vc, known_labels, prefix_overrides
                )
            except TranspilerBindingError as err:
                # Only the two label-inference diagnoses the merged-endpoint
                # splice can legitimately produce are swallowed (ADVICE r8:
                # a blanket except here would hide real regressions in the
                # zero variant behind silently-missing length-0 rows)
                expected_static_empty = str(err).startswith(
                    ("Cannot bind relationship", "Conflicting labels for alias")
                )
                if vc.zero_where is not None and expected_static_empty:
                    # (round 8, ADVICE r7 medium) a zero-length splice
                    # rewired the continuation hops onto the merged
                    # endpoint; when the merged node's label cannot
                    # satisfy an adjacent hop (e.g. (c:Customer)
                    # -[:PLACED*0..1]->(o:Orders)-[:CONTAINS]->(l): the
                    # zero variant would need Customer@CONTAINS), NO
                    # length-0 path exists — the variant is statically
                    # empty, so drop it instead of failing the query
                    zero_dropped = err
                    continue
                if getattr(err, "reason", None) == "statically_impossible":
                    # round 12 (structured since round 13, ADVICE r12):
                    # a fixed-length variant whose chain DEAD-ENDS under
                    # the bound labels (zero admissible candidate edges
                    # for some hop, BOTH endpoint labels concrete — e.g.
                    # the 2-hop variant of (o:Orders)-[:CONTAINS*1..2]->
                    # (x) when CONTAINS only leaves Orders) contributes
                    # zero rows in Neo4j; drop it. If EVERY variant
                    # drops, the diagnosis surfaces below.
                    zero_dropped = zero_dropped or err
                    continue
                raise
            o = self._materialize_paths(o, vc)
            ops.append(o)
        if not ops:
            # every variant was a statically-empty zero-length splice
            # (degenerate, e.g. *0..0 between mismatched labels with a
            # continuation) — surface the binding diagnosis
            raise zero_dropped
        common: Env = {
            a: r for a, r in ops[0].env.items() if not a.startswith("__unnamed_")
        }
        if not common:
            raise TranspilerNotSupportedError(
                "A variable-length pattern needs at least one named alias"
            )
        aliases = list(common.keys())
        op: LogicalOp = TrimOp(ops[0], aliases, env=dict(common))
        for o in ops[1:]:
            trimmed = TrimOp(o, aliases, env=dict(common))
            op = SetOp(op, trimmed, all=True, env=dict(common))
        if clause.where is not None:
            validate_expr(clause.where, op.env)
            op = SelectionOp(op, predicate=clause.where, env=dict(op.env))
        return op

    @staticmethod
    def _substitute_projected_aggregates(
        expr: A.Expr, items: list[tuple[str, A.Expr]]
    ) -> A.Expr:
        """Replace subtrees of ``expr`` that are structurally equal to an
        aggregate-containing projection item with that item's alias."""

        def rec(e: A.Expr) -> A.Expr:
            for alias, iexpr in items:
                if e == iexpr and A.contains_aggregate(iexpr):
                    return A.Variable(alias)
            if isinstance(e, A.Binary):
                e.left, e.right = rec(e.left), rec(e.right)
            elif isinstance(e, A.Unary):
                e.operand = rec(e.operand)
            elif isinstance(e, A.FuncCall):
                e.args = [rec(a) for a in e.args]
            elif isinstance(e, A.CaseExpr):
                e.whens = [(rec(c), rec(v)) for c, v in e.whens]
                if e.else_ is not None:
                    e.else_ = rec(e.else_)
            return e

        return rec(expr)

    def _materialize_paths(
        self, op: LogicalOp, clause: A.MatchClause
    ) -> LogicalOp:
        """Turn every PathRef bound by this variant into physical
        length/nodes/relationships columns (AddColsOp) and swap the env
        entry to a MaterializedPathRef. Per-variant constituents differ
        across a bounded ``*n..m`` expansion, but the three computed
        columns are union-compatible — that is what makes nodes(p) work
        on variable-length paths."""
        from .logical import AddColsOp, MaterializedPathRef

        path_aliases = [
            a for a, r in op.env.items() if isinstance(r, PathRef)
        ]
        if not path_aliases:
            return op
        items: list[tuple[str, A.Expr]] = []
        new_env: Env = dict(op.env)
        for pa in path_aliases:
            mref = MaterializedPathRef(
                pa, f"__path_{pa}_len", f"__path_{pa}_nodes", f"__path_{pa}_rels"
            )
            items.extend(
                [
                    (mref.len_col, A.FuncCall("length", [A.Variable(pa)])),
                    (mref.nodes_col, A.FuncCall("nodes", [A.Variable(pa)])),
                    (mref.rels_col, A.FuncCall("relationships", [A.Variable(pa)])),
                ]
            )
            new_env[pa] = mref
        return AddColsOp(op, items, compile_env=dict(op.env), env=new_env)

    def _expand_var_length(self, clause: A.MatchClause) -> list[A.MatchClause]:
        """Expand *n..m relationships into every fixed-length combination."""
        import copy
        import itertools

        slots: list[tuple[int, int]] = []  # (pattern idx, rel idx)
        for pi, part in enumerate(clause.patterns):
            for ri, rel in enumerate(part.rels):
                if rel.min_hops is not None and rel.max_hops is None:
                    raise TranspilerNotSupportedError(
                        "Unbounded variable-length relationships are resolved "
                        "by the engine front-end (CypherEngine rewrites them "
                        "to reachability scans); plan_query alone cannot "
                        "expand them"
                    )
                if rel.min_hops is not None:
                    slots.append((pi, ri))
        if not slots:
            return [clause]
        ranges = [
            range(
                clause.patterns[pi].rels[ri].min_hops,
                clause.patterns[pi].rels[ri].max_hops + 1,
            )
            for pi, ri in slots
        ]
        combos = list(itertools.product(*ranges))
        if len(combos) > 32:
            raise TranspilerNotSupportedError(
                "Variable-length expansion exceeds 32 fixed-length variants"
            )
        # round 9: pattern variables over *0..m are supported — the
        # zero-length variant's PathRef falls out of the splice (the part
        # keeps only the left node: length 0, nodes [n], relationships []
        # — Neo4j's zero-length path), and the empty relationships()
        # array (array<null>) coerces into the sibling variants' struct
        # arrays at the union.
        out: list[A.MatchClause] = []
        for combo in combos:
            vc = copy.deepcopy(clause)
            # replace right-to-left so earlier rel indices stay valid
            for (pi, ri), length in sorted(
                zip(slots, combo), key=lambda x: (-x[0][0], -x[0][1])
            ):
                part = vc.patterns[pi]
                proto = part.rels[ri]
                if length == 0:
                    # zero-length path (round 7, Neo4j *0..m): both
                    # endpoints bind the SAME node. The right endpoint
                    # moves to a disjoint single-node part and an
                    # id-equality conjunct ties it to the left one
                    # (Catalyst rewrites the cross join + equality into
                    # an equi-join); the path continues from the left
                    # node. Different declared endpoint labels can never
                    # match at length 0 — a constant-false conjunct makes
                    # that variant statically empty (ids of different
                    # labels must never compare: values collide across
                    # tables).
                    left, right = part.nodes[ri], part.nodes[ri + 1]
                    if left.label is None and right.label is None:
                        # edge-derived inference would have typed both
                        # endpoints from the verb in the non-zero
                        # variants; removing the rel loses that, so apply
                        # it here (round 8). A declared label is NOT
                        # overridden: at length 0 the merged node is the
                        # declared one, unconstrained by the verb.
                        pairs_lr = {
                            (e.source_label, e.sink_label)
                            for e in self.schema.edges_by_verb(
                                proto.verb or ""
                            )
                        }
                        if proto.direction is A.Direction.BACKWARD:
                            pairs_lr = {(t, s) for s, t in pairs_lr}
                        elif proto.direction is A.Direction.EITHER:
                            pairs_lr |= {(t, s) for s, t in pairs_lr}
                        lls = {s for s, _ in pairs_lr}
                        rls = {t for _, t in pairs_lr}
                        if len(lls) == 1:
                            left.label = next(iter(lls))
                        if len(rls) == 1:
                            right.label = next(iter(rls))
                    mismatch = (
                        left.label is not None
                        and right.label is not None
                        and left.label != right.label
                    )
                    if left.label is None:
                        left.label = right.label
                    elif right.label is None:
                        right.label = left.label
                    if left.alias is None:
                        left.alias = self._gen_alias("unnamed")
                    if right.alias is None:
                        right.alias = self._gen_alias("unnamed")
                    part.rels[ri : ri + 1] = []
                    part.nodes.pop(ri + 1)
                    vc.patterns.append(A.PatternPart([right], []))
                    eq: A.Expr = (
                        A.Literal(False)
                        if mismatch
                        else A.Binary(
                            A.BinaryOp.EQ,
                            A.FuncCall("id", [A.Variable(left.alias)]),
                            A.FuncCall("id", [A.Variable(right.alias)]),
                        )
                    )
                    vc.zero_where = (
                        eq
                        if vc.zero_where is None
                        else A.Binary(A.BinaryOp.AND, vc.zero_where, eq)
                    )
                    continue
                hops = [
                    # props apply to EVERY hop (Neo4j: `[:T*2 {k: v}]`
                    # constrains each traversed relationship)
                    A.RelPattern(
                        None,
                        proto.verb,
                        proto.direction,
                        props=[(k, copy.deepcopy(v)) for k, v in proto.props],
                    )
                    for _ in range(length)
                ]
                mid_nodes = [A.NodePattern(None, None) for _ in range(length - 1)]
                part.rels[ri : ri + 1] = hops
                part.nodes[ri + 1 : ri + 1] = mid_nodes
            out.append(vc)
        return out

    def _plan_match_single(
        self,
        piped: LogicalOp | None,
        clause: A.MatchClause,
        known_labels: dict[str, str] | None = None,
        prefix_overrides: dict[str, str] | None = None,
    ) -> LogicalOp:
        env: Env = dict(piped.env) if piped is not None else {}
        prefix_overrides = prefix_overrides or {}

        # 1. assign generated aliases to anonymous entities
        for part in clause.patterns:
            for n in part.nodes:
                if n.alias is None:
                    n.alias = self._gen_alias("unnamed")
            for r in part.rels:
                if r.alias is None:
                    r.alias = self._gen_alias("unnamed")

        # 1b. desugar inline property maps `{k: v}` into WHERE equality
        # conjuncts on the (now guaranteed) alias — `(n:L {k: v})` ≡
        # `(n:L) ... WHERE n.k = v`. Runs after alias generation so
        # anonymous patterns work; prepended to the clause's WHERE, so in
        # OPTIONAL MATCH it filters inside the optional side (Neo4j
        # semantics) and Catalyst pushes the equality into the scan.
        prop_pred: A.Expr | None = None
        for part in clause.patterns:
            for ent in (*part.nodes, *part.rels):
                for key, value in ent.props:
                    eq = A.Binary(A.BinaryOp.EQ, A.Property(ent.alias, key), value)
                    prop_pred = (
                        eq
                        if prop_pred is None
                        else A.Binary(A.BinaryOp.AND, prop_pred, eq)
                    )
                # inline pattern predicate `(n:L WHERE pred)` /
                # `[r:T WHERE pred]` (Neo4j 5, extension): same desugar
                # as the property map — ANDed into the clause WHERE, so
                # it filters inside an OPTIONAL MATCH fork
                if getattr(ent, "where", None) is not None:
                    prop_pred = (
                        ent.where
                        if prop_pred is None
                        else A.Binary(A.BinaryOp.AND, prop_pred, ent.where)
                    )
        if clause.zero_where is not None:
            # *0..m zero-length variant equalities (survive the
            # variant-union planner's clearing of the user WHERE)
            prop_pred = (
                clause.zero_where
                if prop_pred is None
                else A.Binary(A.BinaryOp.AND, prop_pred, clause.zero_where)
            )
        if prop_pred is not None:
            clause.where = (
                prop_pred
                if clause.where is None
                else A.Binary(A.BinaryOp.AND, prop_pred, clause.where)
            )

        node_aliases: list[str] = []
        rel_aliases: list[str] = []
        for part in clause.patterns:
            for n in part.nodes:
                if n.alias not in node_aliases:
                    node_aliases.append(n.alias)
            for r in part.rels:
                if r.alias in rel_aliases:
                    raise TranspilerNotSupportedError(
                        f"Relationship alias '{r.alias}' is used more than once in "
                        "a MATCH (reference LogicalPlan.cs:660-667)"
                    )
                rel_aliases.append(r.alias)
        for ra in rel_aliases:
            if ra in node_aliases:
                raise TranspilerBindingError(
                    f"Alias '{ra}' is used for both a node and a relationship"
                )
            if ra in env:
                raise TranspilerNotSupportedError(
                    f"Relationship alias '{ra}' is already bound by an earlier clause"
                )

        # 2. label inference to fixpoint (reference CypherVisitor.cs:644-788)
        labels: dict[str, str] = dict(known_labels or {})

        def stamp(alias: str, label: str):
            prev = labels.get(alias)
            if prev is not None and prev != label:
                raise TranspilerBindingError(
                    f"Conflicting labels for alias '{alias}': {prev} vs {label}"
                )
            labels[alias] = label

        for alias in node_aliases:
            ref = env.get(alias)
            if ref is not None:
                if not isinstance(ref, EntityRef) or ref.kind != "node":
                    raise TranspilerBindingError(
                        f"Alias '{alias}' is not a node entity"
                    )
                stamp(alias, ref.node.label)
        for part in clause.patterns:
            for n in part.nodes:
                if n.label is not None:
                    stamp(n.alias, n.label)

        hops: list[tuple[str, A.RelPattern, str]] = []
        for part in clause.patterns:
            for l, r, rt in part.hops():
                if r.alt_verbs:
                    raise TranspilerNotSupportedError(
                        "Multi-type relationships [:A|B] are resolved by "
                        "the engine front-end (CypherEngine rewrites them "
                        "to a virtual union edge); plan_query alone cannot "
                        "bind them"
                    )
                hops.append((l.alias, r, rt.alias))

        rels: dict[str, tuple[EdgeSchema, bool]] = {}
        for _ in range(len(hops) + 2):
            changed = False
            for la, r, ra in hops:
                if r.alias in rels:
                    continue
                cands: list[tuple[EdgeSchema, bool]] = []
                if r.direction in (A.Direction.FORWARD, A.Direction.EITHER):
                    cands += [
                        (e, True)
                        for e in self.schema.candidate_edges(
                            r.verb, labels.get(la), labels.get(ra)
                        )
                    ]
                if r.direction in (A.Direction.BACKWARD, A.Direction.EITHER):
                    cands += [
                        (e, False)
                        for e in self.schema.candidate_edges(
                            r.verb, labels.get(ra), labels.get(la)
                        )
                    ]
                uniq = list({(e.id, lis): (e, lis) for e, lis in cands}.values())
                if len(uniq) == 1:
                    e, lis = uniq[0]
                    rels[r.alias] = (e, lis)
                    stamp(la, e.source_label if lis else e.sink_label)
                    stamp(ra, e.sink_label if lis else e.source_label)
                    changed = True
                elif (
                    len(uniq) == 2
                    and r.direction == A.Direction.EITHER
                    and uniq[0][0].id == uniq[1][0].id
                    and uniq[0][0].source_label == uniq[0][0].sink_label
                ):
                    raise TranspilerNotSupportedError(
                        "Undirected relationship between same-label endpoints is "
                        "not supported (reference LogicalPlan.cs:603-612)"
                    )
            if not changed:
                break
        for la, r, ra in hops:
            if r.alias not in rels:
                n = 0
                if r.verb is not None:
                    n = len(self.schema.edges_by_verb(r.verb))
                # distinguish a hop that is STATICALLY IMPOSSIBLE under
                # the labels the fixpoint DID bind (zero admissible
                # candidates — e.g. a too-long bounded-variant chain
                # that dead-ends) from a genuinely ambiguous one; the
                # variant expansion drops impossible variants like Neo4j
                # returns zero rows for that length (round 12)
                cands = 0
                if r.direction in (A.Direction.FORWARD, A.Direction.EITHER):
                    cands += len(
                        self.schema.candidate_edges(
                            r.verb, labels.get(la), labels.get(ra)
                        )
                    )
                if r.direction in (A.Direction.BACKWARD, A.Direction.EITHER):
                    cands += len(
                        self.schema.candidate_edges(
                            r.verb, labels.get(ra), labels.get(la)
                        )
                    )
                # classification rides a STRUCTURED attribute (ADVICE
                # r12: message sniffing misclassified would-be-ambiguous
                # hops) — "statically impossible" additionally requires
                # every BOUND endpoint label to be a CONCRETE schema
                # label, so an unrewritten disjunction can never be
                # silently dropped as an empty variant. An UNBOUND
                # endpoint (None) does not block the classification:
                # candidate_edges treats it as a wildcard, so zero
                # candidates is genuinely a dead end (e.g. the too-long
                # bounded-variant chain where no edge leaves the bound
                # side at all).
                concrete = all(
                    labels.get(x) is None or self.schema.has_node(labels[x])
                    for x in (la, ra)
                )
                if n == 0:
                    reason, note = "no_such_edge", " (no such edge)"
                elif cands == 0 and concrete:
                    reason = "statically_impossible"
                    note = " (statically impossible)"
                else:
                    reason, note = "ambiguous", " (ambiguous)"
                err = TranspilerBindingError(
                    f"Cannot bind relationship "
                    f"'{r.verb or '(untyped)'}' between '{labels.get(la, '?')}' and "
                    f"'{labels.get(ra, '?')}'" + note
                )
                err.reason = reason
                raise err
        for alias in node_aliases:
            if alias not in labels:
                raise TranspilerBindingError(
                    f"Cannot infer a label for node alias '{alias}'"
                )

        # 3. edge-node scan fusion: bind an edge and its endpoint node to one
        # scan when they share the backing table and the edge endpoint key IS
        # the node id column (true for every FK-derived edge). Removes a
        # self-join per hop — the dominant scale win for FK graph overlays.
        fused_with: dict[str, tuple[str, str]] = {}  # rel -> (node alias, role)
        for la, r, ra in hops:
            e, lis = rels[r.alias]
            src_alias = la if lis else ra
            sink_alias = ra if lis else la
            for node_alias, key_prop, role in (
                (sink_alias, e.sink_id_property, "sink"),
                (src_alias, e.source_id_property, "source"),
            ):
                if node_alias in env:
                    continue  # inherited alias is already materialized upstream
                nsch = self.schema.get_node(labels[node_alias])
                if nsch.table == e.table and key_prop == nsch.id_property:
                    fused_with[r.alias] = (node_alias, role)
                    break

        # 4. data sources per fresh alias (fused entities share one scan)
        refs: dict[str, EntityRef] = {
            a: r for a, r in env.items() if isinstance(r, EntityRef)
        }
        groups: list[dict] = []
        if piped is not None:
            groups.append({"op": piped, "aliases": set(env.keys())})

        node_scans: dict[str, dict] = {}

        for alias in node_aliases:
            if alias in env:
                continue
            node = self.schema.get_node(labels[alias])
            ref = EntityRef(
                alias, "node", node=node, col_prefix=prefix_overrides.get(alias)
            )
            refs[alias] = ref
            g = {"entities": [ref], "aliases": {alias}}
            node_scans[alias] = g
            groups.append(g)
        for alias in rel_aliases:
            e, lis = rels[alias]
            ref = EntityRef(alias, "edge", edge=e, left_is_source=lis)
            refs[alias] = ref
            if alias in fused_with:
                g = node_scans[fused_with[alias][0]]
                g["entities"].append(ref)
                g["aliases"].add(alias)
            else:
                groups.append({"entities": [ref], "aliases": {alias}})
        for g in groups:
            if "entities" in g:
                g["op"] = DataSourceOp(
                    g["entities"], env={r.alias: r for r in g["entities"]}
                )

        # 5. join fabric (reference LogicalPlan.cs:880-967)
        def find_group(alias: str) -> dict:
            for g in groups:
                if alias in g["aliases"]:
                    return g
            raise TranspilerInternalError(f"Alias '{alias}' missing from join groups")

        extra_eq: list[tuple[str, str]] = []

        def connect(a_alias: str, a_col: str, b_alias: str, b_col: str):
            ga, gb = find_group(a_alias), find_group(b_alias)
            if ga is gb:
                extra_eq.append((a_col, b_col))
                return
            # keep earlier group (piped side) on the left
            if groups.index(ga) > groups.index(gb):
                ga, gb = gb, ga
                a_col, b_col = b_col, a_col
            merged_env: Env = {**ga["op"].env, **gb["op"].env}
            op = JoinOp(ga["op"], gb["op"], "inner", [(a_col, b_col)], env=merged_env)
            ga["op"] = op
            ga["aliases"] |= gb["aliases"]
            groups.remove(gb)

        for la, r, ra in hops:
            e, lis = rels[r.alias]
            rel_ref = refs[r.alias]
            src_col = rel_ref.col(e.source_id_property)
            sink_col = rel_ref.col(e.sink_id_property)
            l_ref, r_ref = refs[la], refs[ra]
            fused = fused_with.get(r.alias)
            for node_alias, node_ref, rel_col, role in (
                (la, l_ref, src_col if lis else sink_col, "source" if lis else "sink"),
                (ra, r_ref, sink_col if lis else src_col, "sink" if lis else "source"),
            ):
                if fused == (node_alias, role):
                    continue  # same physical row — no join needed
                connect(
                    node_alias,
                    node_ref.col(node_ref.node.id_property),
                    r.alias,
                    rel_col,
                )

        # disjoint segments -> cross join (reference pass 3, LogicalPlan.cs:952-967)
        while len(groups) > 1:
            g0, g1 = groups[0], groups[1]
            merged_env = {**g0["op"].env, **g1["op"].env}
            g0["op"] = JoinOp(g0["op"], g1["op"], "cross", [], env=merged_env)
            g0["aliases"] |= g1["aliases"]
            groups.remove(g1)
        op = groups[0]["op"]

        # 5. cycle equalities as a filter (Catalyst folds it into the join)
        if extra_eq:
            pred = None
            for a_col, b_col in extra_eq:
                eq = A.Binary(A.BinaryOp.EQ, ColRef(a_col), ColRef(b_col))
                pred = eq if pred is None else A.Binary(A.BinaryOp.AND, pred, eq)
            op = SelectionOp(op, predicate=pred, env=dict(op.env))

        # 6. implicit relationship uniqueness (reference LogicalPlan.cs:969-1017)
        by_edge: dict[str, list[str]] = {}
        for alias in rel_aliases:
            by_edge.setdefault(rels[alias][0].id, []).append(alias)
        uniq_pred = None
        for edge_id_, aliases in by_edge.items():
            for i in range(len(aliases)):
                for j in range(i + 1, len(aliases)):
                    r1, r2 = refs[aliases[i]], refs[aliases[j]]
                    e = rels[aliases[i]][0]
                    if e.identity_properties:
                        # symmetrized undirected edge: identity is the
                        # ORIGINAL (src, dst) pair, so both orientations
                        # of one relationship compare equal
                        key_props = list(e.identity_properties)
                    else:
                        key_props = [e.source_id_property, e.sink_id_property]
                        if e.type_property is not None:
                            # `[:A|B]` union edge: parallel edges of
                            # different types between the same nodes are
                            # distinct
                            key_props.append(e.type_property)
                    cond = None
                    for kp in key_props:
                        neq = A.Binary(
                            A.BinaryOp.NEQ,
                            ColRef(r1.col(kp)),
                            ColRef(r2.col(kp)),
                        )
                        cond = (
                            neq
                            if cond is None
                            else A.Binary(A.BinaryOp.OR, cond, neq)
                        )
                    uniq_pred = (
                        cond
                        if uniq_pred is None
                        else A.Binary(A.BinaryOp.AND, uniq_pred, cond)
                    )
        if uniq_pred is not None:
            op = SelectionOp(op, predicate=uniq_pred, env=dict(op.env))

        # 6b. pattern variables `p = (...)` (extension): bind a PathRef
        # over the part's constituent refs for length()/nodes()/
        # relationships(). Fixed-length only — var-length variants have
        # differing constituents, which cannot union (guarded in
        # _expand_var_length).
        for part in clause.patterns:
            if part.path_alias is None:
                continue
            pa = part.path_alias
            if pa in op.env:
                raise TranspilerBindingError(
                    f"Path alias '{pa}' is already bound"
                )
            path_ref = PathRef(
                pa,
                [refs[n.alias] for n in part.nodes],
                [refs[r.alias] for r in part.rels],
            )
            new_env = dict(op.env)
            new_env[pa] = path_ref
            op.env = new_env

        # 7. WHERE
        if clause.where is not None:
            validate_expr(clause.where, op.env)
            op = SelectionOp(op, predicate=clause.where, env=dict(op.env))
        return op

    # -- OPTIONAL MATCH --------------------------------------------------------

    def plan_optional_match(
        self, piped: LogicalOp | None, clause: A.MatchClause
    ) -> LogicalOp:
        if piped is None:  # pragma: no cover — parser rejects
            raise TranspilerNotSupportedError("OPTIONAL MATCH cannot be first")
        env = piped.env
        pattern_nodes: list[str] = []
        for part in clause.patterns:
            for n in part.nodes:
                if n.alias is not None and n.alias not in pattern_nodes:
                    pattern_nodes.append(n.alias)
        shared = [a for a in pattern_nodes if a in env]
        for a in shared:
            ref = env[a]
            if not isinstance(ref, EntityRef) or ref.kind != "node":
                raise TranspilerBindingError(
                    f"OPTIONAL MATCH alias '{a}' is not a node entity"
                )
        if not shared:
            raise TranspilerNotSupportedError(
                "OPTIONAL MATCH must share at least one node alias with the "
                "preceding query part"
            )
        prefix_overrides = {a: self._gen_alias(f"opt_{a}") for a in shared}
        known_labels = {a: env[a].node.label for a in shared}
        right = self.plan_match(
            None, clause, known_labels=known_labels, prefix_overrides=prefix_overrides
        )
        pairs = []
        drop_right: list[str] = []
        for a in shared:
            left_ref, right_ref = env[a], right.env[a]
            pairs.append(
                (
                    left_ref.col(left_ref.node.id_property),
                    right_ref.col(right_ref.node.id_property),
                )
            )
            drop_right.extend(right_ref.columns())
        new_env: Env = dict(env)
        for a, ref in right.env.items():
            if a in shared:
                continue
            if a in new_env:
                raise TranspilerBindingError(
                    f"Alias '{a}' from OPTIONAL MATCH is already bound"
                )
            if isinstance(ref, PathRef):
                # shared-alias constituents reference the optional side's
                # fresh-prefixed columns, which drop_right removes — remap
                # them to the surviving left-side refs
                ref = PathRef(
                    ref.alias,
                    [env.get(r.alias, r) for r in ref.node_refs],
                    list(ref.rel_refs),
                )
            new_env[a] = ref
        return JoinOp(piped, right, "left", pairs, drop_right, env=new_env)

    # -- CALL { subquery } -------------------------------------------------------

    def _expand_scope_star(
        self, piped: LogicalOp | None, clause: A.CallSubqueryClause
    ) -> A.CallSubqueryClause:
        """``CALL (*) { ... }`` (Neo4j 5.23): expand the star against the
        outer scope into the ordinary import-WITH form — the imports are
        the outer aliases the body actually references (an unreferenced
        outer scalar must not trip the node-entity-import fence; a
        referenced one fails it with the accurate typed error). A body
        definition (WITH/RETURN item, UNWIND alias) that collides with an
        UNREFERENCED outer alias is rejected up front (ADVICE r8) — under
        `(*)` EVERY outer variable is in scope in Neo4j 5.23, so
        `WITH 1 AS t CALL (*) { WITH 2 AS t ... }` is 'variable already
        defined', not a silent shadow (a referenced one is imported and
        hits the existing rebind fence)."""
        used = self._referenced_names(clause.query)
        outer_env = piped.env if piped is not None else {}
        defined = self._defined_names(clause.query)
        shadowed = sorted(
            a for a in outer_env if a in defined and not a.startswith("__")
        )
        if shadowed:
            raise TranspilerBindingError(
                f"CALL (*) body redefines outer alias(es) {shadowed}: "
                "under (*) every outer variable is in scope (Neo4j "
                "'variable already defined')"
            )
        imports = [a for a in outer_env if a in used and not a.startswith("__")]
        if imports:

            def singles(q):
                if isinstance(q, A.UnionQuery):
                    yield from singles(q.left)
                    yield from singles(q.right)
                else:
                    yield q

            for sq in singles(clause.query):
                sq.clauses.insert(
                    0,
                    A.ProjectionClause(
                        items=[(a, A.Variable(a)) for a in imports]
                    ),
                )
        return A.CallSubqueryClause(clause.query, clause.optional)

    @staticmethod
    def _null_extend_first(sub: LogicalOp, optional: bool) -> LogicalOp:
        """Uncorrelated CALL as the FIRST clause. Plain CALL passes the
        subquery plan through; OPTIONAL CALL (ADVICE r8) must yield ONE
        null-extended row when the subquery output is empty (Neo4j 5.24) —
        a condition-less LEFT join from the implicit single-row source."""
        if not optional:
            return sub
        return JoinOp(OneRowOp(env={}), sub, "left", [], env=dict(sub.env))

    @staticmethod
    def _defined_names(query) -> set[str]:
        """Every alias a CALL body DEFINES in its own scope: WITH/RETURN
        items, UNWIND aliases, procedure YIELD bindings, and the OUTPUT
        aliases of nested subqueries (a nested plain CALL's intermediate
        WITH lives in the nested scope and does not leak)."""
        names: set[str] = set()

        def from_single(sq):
            for c in sq.clauses:
                if isinstance(c, A.ProjectionClause):
                    # a bare self-passthrough (`WITH c` → ('c', c)) is a
                    # re-projection, not a definition — re-exporting an
                    # imported alias through an intermediate WITH is legal
                    names.update(
                        a
                        for a, e in c.items
                        if not (isinstance(e, A.Variable) and e.name == a)
                    )
                elif isinstance(c, A.UnwindClause):
                    names.add(c.alias)
                elif isinstance(c, A.CallProcedureClause):
                    if c.yields:
                        names.update(al for _, al in c.yields)
                    else:
                        out = c.out_alias or c.yield_name
                        if out:
                            names.add(out)
                elif isinstance(c, A.CallSubqueryClause):
                    walk(c.query, returns_only=True)

        def returns_of(sq):
            last = sq.clauses[-1] if sq.clauses else None
            if isinstance(last, A.ProjectionClause):
                names.update(a for a, _ in last.items)

        def walk(q, returns_only=False):
            if isinstance(q, A.UnionQuery):
                walk(q.left, returns_only)
                walk(q.right, returns_only)
            elif returns_only:
                returns_of(q)
            else:
                from_single(q)

        walk(query)
        return names

    @staticmethod
    def _referenced_names(query) -> set[str]:
        """Every variable/alias name a CALL body mentions — expressions,
        pattern node/rel aliases, nested subqueries."""
        names: set[str] = set()

        def from_expr(e):
            for n in e.walk():
                if isinstance(n, A.Variable):
                    names.add(n.name)
                elif isinstance(
                    n, (A.PatternPredicate, A.PatternComprehension)
                ):
                    from_part(n.part)
                    w = getattr(n, "where", None)
                    if w is not None:
                        from_expr(w)

        def from_part(part):
            for nd in part.nodes:
                if nd.alias:
                    names.add(nd.alias)
                for _k, v in nd.props:
                    from_expr(v)
                if nd.where is not None:
                    from_expr(nd.where)
            for rl in part.rels:
                if rl.alias:
                    names.add(rl.alias)
                for _k, v in rl.props:
                    from_expr(v)
                w = getattr(rl, "where", None)
                if w is not None:
                    from_expr(w)

        def from_single(sq):
            for c in sq.clauses:
                if isinstance(c, A.MatchClause):
                    for p in c.patterns:
                        from_part(p)
                    if c.where is not None:
                        from_expr(c.where)
                elif isinstance(c, A.ProjectionClause):
                    for _a, e in c.items:
                        from_expr(e)
                    if c.where is not None:
                        from_expr(c.where)
                    for si in c.order_by:
                        from_expr(si.expr)
                elif isinstance(c, A.UnwindClause):
                    from_expr(c.expr)
                elif isinstance(c, A.CallProcedureClause):
                    # procedure arguments may reference outer aliases
                    # (ADVICE r8), e.g. db.propertyKeys(lbl)
                    for arg in c.args:
                        if isinstance(arg, A.Expr):
                            from_expr(arg)
                    if c.where is not None:
                        from_expr(c.where)
                elif isinstance(c, A.CallSubqueryClause):
                    walk_query(c.query)

        def walk_query(q):
            if isinstance(q, A.UnionQuery):
                walk_query(q.left)
                walk_query(q.right)
            else:
                from_single(q)

        walk_query(query)
        return names

    def plan_call(
        self, piped: LogicalOp | None, clause: A.CallSubqueryClause
    ) -> LogicalOp:
        """``CALL { <query> }`` (extension; the reference rejects CALL).

        Uncorrelated form: the inner query plans standalone and CROSS
        joins into the outer row stream (Neo4j row semantics: outer rows
        x subquery rows).

        Correlated form (`CALL { WITH a ... RETURN ... }`): decorrelated
        by THREADING the imported node aliases through every inner
        projection — an aggregating inner WITH/RETURN then implicitly
        groups per imported entity, and an inner DISTINCT dedups per
        outer row, exactly Neo4j's per-invocation semantics. The inner
        plan joins back on the imported node ids. When the final RETURN
        is all-aggregates, the join is LEFT and count()/sum() coalesce to
        0 and collect() to [] (aggregate-over-empty yields one row in
        Neo4j); any non-aggregate output item makes it an INNER join
        (zero subquery rows drop the outer row, also Neo4j).

        Uncorrelated UNION (`CALL { q1 UNION q2 }`): each branch plans
        standalone, SetOp combines them, and the union CROSS joins into
        the outer row stream like any uncorrelated subquery.

        Fenced (typed errors): scalar/path imports, ORDER BY / SKIP /
        LIMIT inside a correlated subquery (per-outer-row windows),
        correlated UNION (an import WITH in any branch), rebinding an
        import alias."""
        if getattr(clause, "in_transactions", False):
            raise TranspilerNotSupportedError(
                "CALL { } IN TRANSACTIONS is a batched WRITE form — "
                "run it through cypher_write(); the read planner has "
                "no transaction boundaries to honor"
            )
        if clause.scope_star:
            clause = self._expand_scope_star(piped, clause)
        if isinstance(clause.query, A.UnionQuery):
            flat: list[tuple[A.SingleQuery, bool]] = []

            def flatten(q, op_all=False):
                if isinstance(q, A.UnionQuery):
                    flatten(q.left)
                    flat.append((q.right, q.all))
                else:
                    flat.append((q, op_all))

            flatten(clause.query)

            def has_import(br: A.SingleQuery) -> bool:
                first = br.clauses[0] if br.clauses else None
                return (
                    isinstance(first, A.ProjectionClause)
                    and not first.is_return
                    and bool(first.items)
                    and all(
                        isinstance(e, A.Variable) and a == e.name
                        for a, e in first.items
                    )
                )

            if not any(has_import(br) for br, _ in flat):
                sub = plan_query(
                    clause.query, self.schema, self.ordered_aggregates
                )
                outer_env = piped.env if piped is not None else {}
                collide = set(sub.env) & set(outer_env)
                if collide:
                    raise TranspilerBindingError(
                        f"CALL {{ }} returns aliases already bound outside: "
                        f"{sorted(collide)}"
                    )
                if piped is None:
                    return self._null_extend_first(sub, clause.optional)
                return JoinOp(
                    piped,
                    sub,
                    # OPTIONAL CALL: a condition-less LEFT join keeps
                    # outer rows when the subquery yields nothing
                    "left" if clause.optional else "cross",
                    [],
                    env={**piped.env, **sub.env},
                )
            # correlated UNION (round 6): each branch is planned as its
            # own correlated CALL against the SAME outer op (the existing
            # import-threading/decorrelation, incl. per-branch
            # aggregate-over-empty LEFT-join defaults), then the JOINED
            # outputs union — outer x (branch1 rows ∪ branch2 rows),
            # Neo4j invocation semantics. UNION (distinct) dedups full
            # rows — but Cypher streams legally carry DUPLICATE outer
            # rows (fan-out then WITH without DISTINCT), and Neo4j's
            # dedup is per INVOCATION, so (round 7) the outer op is
            # tagged with a unique row-id spine that rides through every
            # branch and the union's distinct, then is trimmed off:
            # identical outer rows keep separate invocation outputs.
            if piped is None:
                raise TranspilerBindingError(
                    "CALL { WITH ... } imports need an outer scope to "
                    "import from"
                )
            outer: LogicalOp = piped
            rid: str | None = None
            # the row-id spine serves two masters: per-invocation dedup of
            # UNION (distinct), and — for OPTIONAL CALL — the key the
            # whole-invocation null-extension joins back on
            if clause.optional or any(not is_all for _, is_all in flat[1:]):
                rid = self._gen_alias("call_rid")
                outer = RowIdOp(
                    piped,
                    col=rid,
                    env={**piped.env, rid: ValueRef(rid)},
                )
            normed: list[LogicalOp] = []
            aliases: list[str] | None = None
            for br, _ in flat:
                # branches plan NON-optional (round 8, ADVICE r7 high): a
                # per-branch LEFT join would emit a spurious null-extended
                # row whenever ANY branch missed, even though another
                # branch matched — Neo4j null-extends only when the WHOLE
                # invocation output is empty, handled once below
                joined = self.plan_call(
                    outer, A.CallSubqueryClause(br, False)
                )
                if aliases is None:
                    aliases = sorted(joined.env.keys())
                elif sorted(joined.env.keys()) != aliases:
                    shown = [a for a in aliases if a != rid]
                    got = [
                        a for a in sorted(joined.env.keys()) if a != rid
                    ]
                    raise TranspilerBindingError(
                        "CALL { UNION } branches must return the same "
                        f"columns: {shown} vs {got}"
                    )
                # normalize each branch to the same projected column set
                # so unionByName aligns (entity refs keep their shared
                # outer column prefixes)
                normed.append(
                    self.plan_projection(
                        joined,
                        A.ProjectionClause(
                            items=[(a, A.Variable(a)) for a in aliases],
                            is_return=False,
                        ),
                    )
                )
            out = normed[0]
            for i in range(1, len(normed)):
                out = SetOp(
                    out, normed[i], all=flat[i][1], env=dict(out.env)
                )
            visible = [a for a in aliases if a != rid]
            if clause.optional:
                # apply optionality ONCE over the unioned per-invocation
                # output: project it down to (row id, subquery outputs) and
                # LEFT-join the outer spine back on the row id — an outer
                # row null-extends only when EVERY branch produced nothing
                new_out = [a for a in visible if a not in piped.env]
                rid2 = self._gen_alias("call_rid_r")
                proj = self.plan_projection(
                    out,
                    A.ProjectionClause(
                        items=[(rid2, A.Variable(rid))]
                        + [(a, A.Variable(a)) for a in new_out],
                        is_return=False,
                    ),
                )
                out = JoinOp(
                    outer,
                    proj,
                    "left",
                    [(rid, rid2)],
                    drop_right=[rid2],
                    env={
                        **outer.env,
                        **{a: ValueRef(a) for a in new_out},
                    },
                )
            if rid is not None:
                out = TrimOp(
                    out,
                    visible,
                    env={a: out.env[a] for a in visible},
                )
            return out
        inner = clause.query
        body = list(inner.clauses)
        imports: list[str] = []
        first = body[0] if body else None
        if (
            isinstance(first, A.ProjectionClause)
            and not first.is_return
            and not first.distinct
            and not first.star
            and first.where is None
            and not first.order_by
            and first.skip is None
            and first.limit is None
            and first.items
            and all(
                isinstance(e, A.Variable) and a == e.name
                for a, e in first.items
            )
        ):
            imports = [a for a, _ in first.items]
            body = body[1:]

        # round 12 (VERDICT r11 'missing' #6 tail): PATH imports desugar
        # to scalar imports of the path functions the body actually uses
        # — `CALL { WITH p RETURN length(p) ... }` extends the OUTER
        # pipe with `length(p)/nodes(p)/relationships(p)` value columns
        # (computed where p is in scope) and rewrites the body to import
        # those scalars; any other use of the path inside the body keeps
        # a typed error (a path is a column group, not a joinable row
        # identity)
        path_imports = [
            a
            for a in imports
            if piped is not None
            and isinstance(
                piped.env.get(a), (PathRef, MaterializedPathRef)
            )
        ]
        path_internal: set[str] = set()
        if path_imports:
            pfn = ("length", "nodes", "relationships")
            fresh_map: dict[tuple[str, str], str] = {}

            def prw(e):
                if (
                    isinstance(e, A.FuncCall)
                    and e.name in pfn
                    and len(e.args) == 1
                    and isinstance(e.args[0], A.Variable)
                    and e.args[0].name in path_imports
                ):
                    key = (e.args[0].name, e.name)
                    if key not in fresh_map:
                        fresh_map[key] = self._gen_alias(f"pimp_{e.name}")
                    return A.Variable(fresh_map[key])
                if not isinstance(e, A.Expr):
                    return e
                for f, v in vars(e).items():
                    if isinstance(v, A.Expr):
                        setattr(e, f, prw(v))
                    elif isinstance(v, list):
                        nv = []
                        for item in v:
                            if isinstance(item, A.Expr):
                                nv.append(prw(item))
                            elif isinstance(item, tuple):
                                nv.append(
                                    tuple(
                                        prw(x)
                                        if isinstance(x, A.Expr)
                                        else x
                                        for x in item
                                    )
                                )
                            else:
                                nv.append(item)
                        setattr(e, f, nv)
                return e

            for c in body:
                w = getattr(c, "where", None)
                if w is not None:
                    c.where = prw(w)
                if isinstance(c, A.ProjectionClause):
                    c.items = [(al, prw(e)) for al, e in c.items]
                    for s in c.order_by:
                        s.expr = prw(s.expr)
                if isinstance(c, A.UnwindClause):
                    c.expr = prw(c.expr)
            # any surviving reference to the path alias is unsupported
            for c in body:
                exprs = []
                w = getattr(c, "where", None)
                if w is not None:
                    exprs.append(w)
                if isinstance(c, A.ProjectionClause):
                    exprs.extend(e for _, e in c.items)
                    exprs.extend(s.expr for s in c.order_by)
                if isinstance(c, A.UnwindClause):
                    exprs.append(c.expr)
                for e in exprs:
                    for nd in e.walk():
                        if (
                            isinstance(nd, A.Variable)
                            and nd.name in path_imports
                        ):
                            raise TranspilerNotSupportedError(
                                f"CALL {{ WITH {nd.name} }}: a path "
                                "import supports only length()/nodes()/"
                                "relationships() of the path inside "
                                "the body"
                            )
            ext_items = [
                (fresh, A.FuncCall(fn, [A.Variable(pa)]))
                for (pa, fn), fresh in fresh_map.items()
            ]
            if ext_items:
                piped = self.plan_projection(
                    piped,
                    A.ProjectionClause(items=ext_items, star=True),
                )
            imports = [a for a in imports if a not in path_imports] + [
                fresh for fresh in fresh_map.values()
            ]
            # the desugared scalars are INTERNAL: they must not leak
            # into the CALL's output env (a correlated-UNION flow would
            # otherwise see per-branch fresh names as differing columns)
            path_internal = set(fresh_map.values())
            if not imports:
                # the path was imported but never used: the body is
                # effectively uncorrelated — but Neo4j still runs it
                # per outer row; a cross join is identical for a
                # deterministic body (non-determinism is rejected below)
                pass

        self._reject_nondeterministic_call_body(body)
        if not imports:
            sub = self.plan(A.SingleQuery(body))
            outer_env = piped.env if piped is not None else {}
            collide = set(sub.env) & set(outer_env)
            if collide:
                raise TranspilerBindingError(
                    f"CALL {{ }} returns aliases already bound outside: "
                    f"{sorted(collide)}"
                )
            if piped is None:
                return self._null_extend_first(sub, clause.optional)
            return JoinOp(
                piped,
                sub,
                "left" if clause.optional else "cross",
                [],
                env={**piped.env, **sub.env},
            )

        if piped is None:
            raise TranspilerBindingError(
                "CALL { WITH ... } imports need an outer scope to import "
                "from"
            )
        env = piped.env
        for a in imports:
            ref = env.get(a)
            if ref is None:
                raise TranspilerBindingError(f"Alias '{a}' does not exist")
            if isinstance(ref, EntityRef) and ref.kind == "node":
                continue
            if isinstance(ref, EntityRef) and ref.kind == "edge":
                # round 12 (VERDICT r11 #6): RELATIONSHIP imports — the
                # correlated seed is a fresh-prefixed scan of the edge
                # table, joined back on the edge identity columns
                # (source, sink [+ type discriminator / identity props])
                continue
            if isinstance(ref, ValueRef):
                # round-11 continuation: SCALAR imports — the correlated
                # seed is a DISTINCT projection of the outer's value
                # column (the body runs once per distinct import value;
                # equivalent to Neo4j's per-row invocation for a
                # deterministic body), joined back null-safely so a null
                # import value keeps its subquery rows
                continue
            raise TranspilerNotSupportedError(
                f"CALL {{ WITH {a} }}: only node/relationship entity "
                "and scalar imports are supported (path imports are "
                "not)"
            )
        final = body[-1]  # parser guarantees a trailing RETURN
        out_aliases = [a for a, _ in final.items]
        collide = (set(out_aliases) - set(imports)) & set(env)
        if collide:
            raise TranspilerBindingError(
                f"CALL {{ }} returns aliases already bound outside: "
                f"{sorted(collide)}"
            )
        # a projection where EVERY item contains an aggregate yields
        # exactly one row per outer row (per-import grouping), including
        # over an empty match set — LEFT join + defaults. Top-level
        # count/sum coalesce to 0 and collect to [] (Neo4j aggregate-over-
        # empty values); aggregates WRAPPED in expressions (round(sum(x)))
        # stay null over an empty set (documented divergence: Neo4j would
        # evaluate the wrapper over the default, e.g. round(0) = 0.0)
        all_agg = bool(final.items) and all(
            A.contains_aggregate(e) for _, e in final.items
        )
        agg_kind = {
            a: e.name for a, e in final.items if isinstance(e, A.AggCall)
        }

        # thread the imports: intermediate projections keep the alias
        # alive under its own name; the FINAL projection re-exports each
        # import under a fresh alias (fresh column prefix) so the
        # join-back keys cannot collide with the outer side's columns
        import_out = {a: self._gen_alias(f"callimp_{a}") for a in imports}
        new_body: list[A.Clause] = []
        for c in body:
            if isinstance(c, A.ProjectionClause):
                have = {al for al, _ in c.items}
                if c is final:
                    extra = [
                        (import_out[a], A.Variable(a)) for a in imports
                    ]
                else:
                    extra = [
                        (a, A.Variable(a))
                        for a in imports
                        if a not in have
                    ]
                c = A.ProjectionClause(
                    extra + list(c.items),
                    distinct=c.distinct,
                    where=c.where,
                    order_by=list(c.order_by),
                    skip=c.skip,
                    limit=c.limit,
                    is_return=False,  # entity items allowed; this is not
                    # the query's final projection
                    star=c.star,
                    exclude=c.exclude,
                )
            new_body.append(c)

        # correlated seed: one fresh-prefixed scan per imported node (the
        # exists-fabric mechanics); scalar imports seed from a DISTINCT
        # projection of the outer's value column — body clauses bind
        # against it
        seed: LogicalOp | None = None
        scalar_seed_items = [
            (a, A.Variable(a))
            for a in imports
            if isinstance(env[a], ValueRef)
        ]
        if scalar_seed_items:
            seed = ProjectOp(
                piped,
                scalar_seed_items,
                distinct=True,
                env={a: ValueRef(a) for a, _ in scalar_seed_items},
            )
        for a in imports:
            if isinstance(env[a], ValueRef):
                continue
            if env[a].kind == "edge":
                ref = EntityRef(
                    a, "edge", edge=env[a].edge,
                    left_is_source=env[a].left_is_source,
                    col_prefix=self._gen_alias(f"call_{a}"),
                )
            else:
                nsch = self.schema.get_node(env[a].node.label)
                ref = EntityRef(
                    a, "node", node=nsch,
                    col_prefix=self._gen_alias(f"call_{a}"),
                )
            scan = DataSourceOp([ref], env={a: ref})
            seed = (
                scan
                if seed is None
                else JoinOp(
                    seed, scan, "cross", [], env={**seed.env, **scan.env}
                )
            )
        # plan clause-by-clause: a projection's ORDER BY / SKIP / LIMIT
        # inside a correlated subquery is PER OUTER ROW (Neo4j invocation
        # semantics) — plan_projection's order/limit stage is overridden
        # with a row_number window partitioned by the imported node ids
        # (the top-k-per-entity idiom, no global sort); carry/trim and the
        # reference's ORDER-then-WHERE subclause ordering stay intact

        def window_override(
            op: LogicalOp,
            order_by: list[A.SortItem],
            skip: int | None,
            limit: int | None,
        ) -> LogicalOp:
            part_cols: list[str] = []
            for a in imports:
                key = import_out[a] if import_out[a] in op.env else a
                ref = op.env.get(key)
                if isinstance(ref, EntityRef):
                    part_cols.extend(ref.key_cols())
                elif isinstance(ref, ValueRef):
                    part_cols.append(ref.col)
                else:
                    raise TranspilerBindingError(
                        f"CALL {{ }} import alias '{a}' was rebound "
                        "before its ORDER BY/LIMIT could partition on it"
                    )
            return WindowLimitOp(
                op,
                part_cols,
                order_by,
                skip,
                limit,
                rn_col=self._gen_alias("rn"),
                env=dict(op.env),
            )

        cur: LogicalOp | None = seed
        for c in new_body:
            if isinstance(c, A.ProjectionClause):
                cur = self.plan_projection(
                    cur, c, order_limit_override=window_override
                )
            else:
                cur = self._plan_clauses(cur, [c])
        sub = cur

        pairs: list[tuple[str, str]] = []
        drop_right: list[str] = []
        any_scalar = False
        for a in imports:
            sub_ref = sub.env.get(import_out[a])
            outer_ref = env[a]
            if isinstance(outer_ref, ValueRef):
                if not isinstance(sub_ref, ValueRef):
                    raise TranspilerBindingError(
                        f"CALL {{ }} import alias '{a}' was rebound to a "
                        "non-scalar inside the subquery"
                    )
                any_scalar = True
                pairs.append((outer_ref.col, sub_ref.col))
                drop_right.append(sub_ref.col)
                continue
            if (
                not isinstance(sub_ref, EntityRef)
                or sub_ref.kind != outer_ref.kind
            ):
                raise TranspilerBindingError(
                    f"CALL {{ }} import alias '{a}' was rebound to a "
                    "different kind inside the subquery"
                )
            pairs.extend(zip(outer_ref.key_cols(), sub_ref.key_cols()))
            drop_right.extend(
                dict.fromkeys(sub_ref.columns() + sub_ref.key_cols())
            )

        new_env: Env = {
            a: r for a, r in env.items() if a not in path_internal
        }
        for a in out_aliases:
            new_env[a] = ValueRef(a)
        joined = JoinOp(
            piped,
            sub,
            # OPTIONAL CALL (round 7): outer rows with no subquery output
            # survive with null output columns (Neo4j 5.24); all-aggregate
            # returns were already LEFT (aggregate-over-empty row)
            "left" if (all_agg or clause.optional) else "inner",
            pairs,
            drop_right,
            null_safe=any_scalar,
            env=new_env,
        )
        if not all_agg:
            return joined
        # aggregate-over-empty: one row per outer row with count/sum = 0
        # and collect = [] (others null) — re-project with coalesce
        items: list[tuple[str, A.Expr]] = []
        for alias in env:
            if alias in path_internal:
                continue
            items.append((alias, A.Variable(alias)))
        for a in out_aliases:
            kind = agg_kind.get(a)
            if kind in ("count", "sum"):
                items.append(
                    (a, A.FuncCall("coalesce", [ColRef(a), A.Literal(0)]))
                )
            elif kind == "collect":
                items.append(
                    (a, A.FuncCall("coalesce", [ColRef(a), A.ListLiteral([])]))
                )
            else:
                items.append((a, A.Variable(a)))
        return ProjectOp(
            joined,
            items,
            output_aliases=[a for a, _ in items],
            env=new_env,
        )

    # -- UNWIND ------------------------------------------------------------------

    def plan_unwind(
        self, piped: LogicalOp | None, clause: A.UnwindClause
    ) -> LogicalOp:
        env: Env = dict(piped.env) if piped is not None else {}
        if clause.alias in env:
            raise TranspilerBindingError(
                f"UNWIND alias '{clause.alias}' is already bound"
            )
        if piped is not None:
            # `UNWIND [(a)-->(b) | b.x] AS v` — pattern comprehensions /
            # predicates in the UNWIND expression lower to flag/collect
            # joins against the piped op first
            expr, piped = self._rewrite_pattern_predicates(clause.expr, piped)
            clause.expr = expr
            env = dict(piped.env)
            validate_expr(clause.expr, env)
        elif any(
            isinstance(n, (A.PatternPredicate, A.PatternComprehension))
            for n in clause.expr.walk()
        ):
            raise TranspilerNotSupportedError(
                "A pattern inside a standalone UNWIND has nothing to bind "
                "against — add a preceding MATCH"
            )
        env[clause.alias] = ValueRef(clause.alias)
        return UnwindOp(piped, clause.expr, clause.alias, env=env)

    # -- WITH / RETURN ------------------------------------------------------------

    def plan_projection(
        self,
        piped: LogicalOp | None,
        clause: A.ProjectionClause,
        order_hint: list[A.SortItem] | None = None,
        order_limit_override=None,
    ) -> LogicalOp:
        # ``order_limit_override(op, order_by, skip, limit)`` replaces the
        # global ORDER BY/SKIP/LIMIT SelectionOp — correlated CALL { }
        # subqueries use it to apply a per-outer-row window instead, with
        # carry/validation/trim behavior unchanged
        if piped is None:
            # standalone WITH/RETURN (extension): project over a one-row,
            # zero-column source — `RETURN 1+1 AS x`, `WITH $p AS x ...`
            piped = OneRowOp(env={})
        # `WITH *` / `RETURN *` (extension): expand to every in-scope
        # alias (skipping planner-internal __ aliases), before explicit
        # items. RETURN * still rejects path aliases (use length()/
        # nodes()/relationships()); entity aliases project as structs
        # via the RETURN-entity rewrite below.
        if clause.star:
            explicit = {a for a, _ in clause.items}
            star_items: list[tuple[str, A.Expr]] = []
            for alias, ref in piped.env.items():
                # skip only aliases THIS planner generated (tracked by
                # _gen_alias) — a user's own `__foo_1` alias survives * —
                # plus any aliases an engine desugar marked as internal
                # (clause.exclude, e.g. lazy index-winner join helpers)
                if (
                    alias in explicit
                    or alias in self.generated_aliases
                    or alias in clause.exclude
                ):
                    continue
                if clause.is_return and isinstance(
                    ref, (PathRef, MaterializedPathRef)
                ):
                    raise TranspilerNotSupportedError(
                        f"RETURN * would return path alias '{alias}' "
                        "— not supported; return length()/nodes()/"
                        "relationships() of it"
                    )
                star_items.append((alias, A.Variable(alias)))
            clause.items = star_items + clause.items
            clause.star = False
            if not clause.items:
                raise TranspilerBindingError(
                    "WITH */RETURN * found nothing in scope to project"
                )
        # `RETURN n` / `RETURN r` entity projection (extension; the
        # reference REJECTS returning entities, LogicalPlan.cs:324-328 /
        # CypherVisitor.cs:780-785 — its most user-visible fence): a
        # returned entity compiles to a named STRUCT of its properties
        # (the properties() machinery), so DISTINCT / grouping / ORDER BY
        # on the returned column work by value. An unmatched OPTIONAL
        # entity returns a null struct, matching Neo4j's null node.
        if clause.is_return:
            clause.items = [
                (
                    alias,
                    A.FuncCall("properties", [expr])
                    if isinstance(expr, A.Variable)
                    and isinstance(piped.env.get(expr.name), EntityRef)
                    else expr,
                )
                for alias, expr in clause.items
            ]
        # exists() in projection-item position (`RETURN exists(...) AS f`):
        # attach flag joins to the piped op and substitute boolean columns
        # before planning the projection itself
        if any(
            isinstance(n, (A.PatternPredicate, A.PatternComprehension))
            for _, e in clause.items
            for n in e.walk()
        ):
            new_items = []
            for alias, expr in clause.items:
                expr, piped = self._rewrite_pattern_predicates(expr, piped)
                new_items.append((alias, expr))
            clause.items = new_items
        in_env = piped.env
        has_agg = any(A.contains_aggregate(e) for _, e in clause.items)
        if has_agg:
            # Neo4j parity: inside an aggregating item, any non-aggregated
            # entity/value reference must itself be a projected grouping
            # expression (`RETURN v, sum(x) + v` is fine, `sum(x) + x` is
            # not) — without this check Spark's raw MISSING_GROUP_BY
            # analysis error leaks instead of a typed one
            grouping = [
                e for _, e in clause.items if not A.contains_aggregate(e)
            ]
            for alias, e in clause.items:
                if not A.contains_aggregate(e):
                    continue
                mixed = _references_outside_aggregates(e, grouping)
                if mixed:
                    raise TranspilerBindingError(
                        f"Projection item '{alias}' mixes an aggregate with "
                        f"the non-aggregated reference '{mixed}'; aggregate "
                        "it or also project it as its own grouping item"
                    )
        # `ORDER BY <aggregate expr>` (extension; Neo4j idiom): rewrite
        # subtrees structurally equal to a projected aggregate item to the
        # item's alias BEFORE the implicit-field scoping check — the
        # aggregate's inner references live in the pre-projection scope
        for s in clause.order_by:
            if A.contains_aggregate(s.expr):
                s.expr = self._substitute_projected_aggregates(
                    s.expr, clause.items
                )

        out_env: Env = {}
        for alias, expr in clause.items:
            if isinstance(expr, A.Variable):
                ref = in_env.get(expr.name)
                if ref is None:
                    raise TranspilerBindingError(f"Alias '{expr.name}' does not exist")
                if isinstance(ref, EntityRef):
                    if clause.is_return:
                        raise TranspilerNotSupportedError(
                            "Returning node/relationship entities from RETURN is "
                            "not supported (reference LogicalPlan.cs:324-328); "
                            "return their properties instead"
                        )
                    out_env[alias] = ref.renamed(alias)
                elif isinstance(ref, (PathRef, MaterializedPathRef)):
                    if clause.is_return:
                        raise TranspilerNotSupportedError(
                            "Returning a path variable is not supported; "
                            "return length()/nodes()/relationships() of it"
                        )
                    out_env[alias] = ref.renamed(alias)
                else:
                    out_env[alias] = ValueRef(alias)
            else:
                validate_expr(expr, in_env)
                out_env[alias] = ValueRef(alias)

        # scoping of post-projection WHERE / ORDER BY (reference LogicalPlan.cs:203-288)
        scope_exprs: list[A.Expr] = []
        if clause.where is not None:
            scope_exprs.append(clause.where)
        scope_exprs.extend(s.expr for s in clause.order_by)
        def scope_refs(e: A.Expr):
            yield from _expr_alias_refs(e)
            # exists(pattern) predicates reference their SHARED node
            # aliases (aliases bound in the pattern itself are fresh
            # bindings, not references)
            for n in e.walk():
                if isinstance(n, A.PatternPredicate):
                    for np in n.part.nodes:
                        if np.alias is not None and (
                            np.alias in in_env or np.alias in out_env
                        ):
                            yield np.alias, None

        carry = False
        for e in scope_exprs:
            for alias, _prop in scope_refs(e):
                if alias in out_env:
                    continue
                if alias not in in_env:
                    raise TranspilerBindingError(f"Alias '{alias}' does not exist")
                if clause.distinct or has_agg:
                    raise TranspilerBindingError(
                        f"Alias '{alias}' is not visible after DISTINCT/aggregation "
                        "(reference LogicalPlan.cs:216-249)"
                    )
                carry = True

        proj_env: Env = dict(out_env)
        if carry:
            for alias, ref in in_env.items():
                if alias not in proj_env:
                    proj_env[alias] = ref
        # an order hint only survives if every sort expression still binds
        # in the projection's input scope (implicit fields may have been
        # trimmed away); best-effort by design
        valid_hint: list[A.SortItem] = []
        if order_hint:
            try:
                for s in order_hint:
                    validate_expr(s.expr, in_env)
                valid_hint = order_hint
            except TranspilerBindingError:
                valid_hint = []
        op: LogicalOp = ProjectOp(
            piped,
            list(clause.items),
            distinct=clause.distinct,
            has_agg=has_agg,
            carry=carry,
            output_aliases=[a for a, _ in clause.items],
            order_hint=valid_hint,
            env=proj_env,
        )
        # subclause order matches the reference (LogicalPlanner/LogicalPlan.cs:
        # 255-267): ORDER BY + SKIP/LIMIT are applied FIRST, the WHERE filter
        # on top — so `WITH x ORDER BY x LIMIT 5 WHERE x > 2` limits then filters
        if clause.order_by or clause.skip is not None or clause.limit is not None:
            for s in clause.order_by:
                if A.contains_aggregate(s.expr):
                    # substitution above found no matching projection item
                    raise TranspilerNotSupportedError(
                        "ORDER BY may only use aggregate expressions that "
                        "also appear as projection items; alias the "
                        "aggregate in the projection first"
                    )
                validate_expr(s.expr, op.env)
            if order_limit_override is not None:
                op = order_limit_override(
                    op, list(clause.order_by), clause.skip, clause.limit
                )
            else:
                op = SelectionOp(
                    op,
                    order_by=list(clause.order_by),
                    skip=clause.skip,
                    limit=clause.limit,
                    env=dict(op.env),
                )
        if clause.where is not None:
            # WITH ... WHERE also accepts exists() pattern predicates over
            # entity aliases still in scope — same semi/anti join lowering
            residual, pattern_preds = self._split_pattern_predicates(
                clause.where
            )
            if residual is not None:
                # nested exists() under OR/... lowers to flag columns
                residual, op = self._rewrite_pattern_predicates(residual, op)
                validate_expr(residual, op.env)
                op = SelectionOp(op, predicate=residual, env=dict(op.env))
            for part, where, negated in pattern_preds:
                op = self._plan_pattern_predicate(op, part, negated, where)
        if carry:
            op = TrimOp(op, [a for a, _ in clause.items], env=out_env)
        return op
