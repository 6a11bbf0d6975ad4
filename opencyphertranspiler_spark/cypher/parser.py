"""Recursive-descent parser for the supported openCypher surface.

Covers the reference's accepted grammar (SURVEY.md §2.6) plus the declared
extensions (SURVEY.md §2.7b: COUNT(*), SKIP, UNWIND, working UNION,
property maps, multi-label/-verb patterns, variable-length relationships,
pattern variables, parameters, comprehensions, CALL subqueries and the
schema-introspection CALL procedures, ...). Write clauses parse only in
``allow_writes`` mode (engine.cypher_write); the read entry point keeps
the reference's typed rejection for them, as it does for the handful of
constructs that remain out of scope (procedure arguments, FOREACH).

Expression precedence mirrors the openCypher grammar chain used by the
reference visitor (/root/reference/src/openCypherParser/AST/CypherVisitor.cs:1348-1558):
OR < XOR < AND < NOT < comparison < string/list/null postfix < +- < */% < ^ < unary.
"""

from __future__ import annotations

from ..exceptions import TranspilerNotSupportedError, TranspilerSyntaxError
from . import ast as A
from .lexer import Token, tokenize

COMPARISON_TOKENS = {
    "=": A.BinaryOp.EQ,
    "<>": A.BinaryOp.NEQ,
    "<": A.BinaryOp.LT,
    "<=": A.BinaryOp.LE,
    ">": A.BinaryOp.GT,
    ">=": A.BinaryOp.GE,
}


class Parser:
    def __init__(self, text: str, allow_writes: bool = False):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0
        # write clauses (CREATE/MERGE/SET/REMOVE/DELETE) parse only when
        # requested via engine.cypher_write(); the read entry point keeps
        # the reference's typed rejection (SURVEY.md §2.7)
        self.allow_writes = allow_writes

    # -- token helpers ------------------------------------------------------
    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.cur
        if t.kind != "eof":
            self.i += 1
        return t

    def accept_punct(self, *vals: str) -> Token | None:
        if self.cur.is_punct(*vals):
            return self.advance()
        return None

    def accept_kw(self, *names: str) -> Token | None:
        if self.cur.is_kw(*names):
            return self.advance()
        return None

    def expect_punct(self, val: str) -> Token:
        if not self.cur.is_punct(val):
            raise TranspilerSyntaxError(
                f"Expected '{val}' at position {self.cur.pos}, got {self.cur.value!r}"
            )
        return self.advance()

    def expect_kw(self, name: str) -> Token:
        if not self.cur.is_kw(name):
            raise TranspilerSyntaxError(
                f"Expected {name} at position {self.cur.pos}, got {self.cur.value!r}"
            )
        return self.advance()

    def expect_ident(self) -> str:
        if self.cur.kind != "ident":
            raise TranspilerSyntaxError(
                f"Expected identifier at position {self.cur.pos}, got {self.cur.value!r}"
            )
        return str(self.advance().value)

    def expect_name(self) -> str:
        """A symbolic name position (label, verb, property, AS alias):
        keywords are allowed as names here, per the openCypher grammar."""
        t = self.cur
        if t.kind == "ident":
            return str(self.advance().value)
        if t.kind == "kw":
            self.advance()
            return str(t.value)  # keyword spelling, canonical upper-case
        raise TranspilerSyntaxError(
            f"Expected a name at position {t.pos}, got {t.value!r}"
        )

    # -- entry ---------------------------------------------------------------
    def parse_query(self) -> A.Query:
        q: A.Query = self.parse_single_query()
        while self.accept_kw("UNION"):
            all_ = bool(self.accept_kw("ALL"))
            right = self.parse_single_query()
            if any(isinstance(c, A.WriteClause) for c in right.clauses):
                raise TranspilerNotSupportedError(
                    "UNION over a write query is not supported"
                )
            q = A.UnionQuery(q, right, all_)
        self.accept_punct(";")
        if self.cur.kind != "eof":
            raise TranspilerSyntaxError(
                f"Unexpected trailing input at position {self.cur.pos}: {self.cur.value!r}"
            )
        return q

    def parse_single_query(self) -> A.SingleQuery:
        clauses: list[A.Clause] = []
        WRITE_KWS = ("CREATE", "MERGE", "SET", "DELETE", "DETACH", "REMOVE")

        def has_write() -> bool:
            # writes in the CURRENT segment only: a WITH after a write
            # clause is a clause-sequential boundary (writes.py segments)
            # that re-opens the full clause grammar
            for c in reversed(clauses):
                if isinstance(c, A.WriteClause):
                    return True
                if isinstance(c, A.ProjectionClause):
                    return False
            return False

        while True:
            t = self.cur
            if t.is_kw(*WRITE_KWS) and not self.allow_writes:
                raise TranspilerNotSupportedError(
                    f"Write clause {t.value} is not supported (read-only engine; "
                    "use engine.cypher_write() for the functional write extension)"
                )
            if t.is_kw(*WRITE_KWS):
                clauses.append(self.parse_write_clause())
                continue
            if (
                t.kind == "ident"
                and str(t.value).upper() == "FOREACH"
                and self.allow_writes
                and not has_write()
            ):
                # FOREACH (x IN list | writes) desugars to UNWIND + writes:
                # per-element application falls out of the binding rows
                clauses.extend(self.parse_foreach())
                self._saw_foreach = True
                continue
            if has_write():
                # after a write clause: further writes, a final RETURN, or
                # a WITH — the WITH is a clause-sequential segment boundary
                # (Neo4j's own rule: "WITH is required between CREATE and
                # MATCH"); writes.py executes each segment against the
                # previous segment's post-write tables, so clauses after
                # the WITH observe the writes before it
                if t.kind == "eof":
                    break
                # round 7: RETURN/WITH after FOREACH is supported — the
                # executor cuts a synthetic boundary after the FOREACH's
                # writes and compiles it over the reading plan MINUS the
                # desugared UNWIND, restoring pre-FOREACH cardinality
                # (writes.py _split_segments / run_to_boundary)
                if t.is_kw("RETURN"):
                    clauses.append(self.parse_projection(is_return=True))
                    break
                if t.is_kw("WITH"):
                    clauses.append(self.parse_projection(is_return=False))
                    continue
                if t.is_punct("}"):
                    # inside `CALL { <writes> }` (round 14: the
                    # IN TRANSACTIONS body is write-only) — the brace
                    # closes the subquery; the caller consumes it
                    break
                if t.kind == "ident" and str(t.value).upper() == "FOREACH":
                    # round 7: FOREACH after other writes (the classic
                    # conditional-write idiom MERGE ... FOREACH (_ IN
                    # CASE ...)) — a synthetic `WITH *` boundary is cut
                    # first, so the earlier writes run at their own
                    # cardinality and the FOREACH observes them
                    # (clause-sequential, like Neo4j)
                    clauses.append(
                        A.ProjectionClause(items=[], star=True, is_return=False)
                    )
                    clauses.extend(self.parse_foreach())
                    self._saw_foreach = True
                    continue
                if t.is_kw("MATCH", "OPTIONAL", "UNWIND", "CALL"):
                    raise TranspilerNotSupportedError(
                        f"WITH is required between a write clause and "
                        f"{t.value} (the WITH is the clause-sequential "
                        "boundary: clauses after it observe the writes)"
                    )
                raise TranspilerNotSupportedError(
                    f"{t.value} after a write clause is not supported; "
                    "only further write clauses, a boundary WITH, or a "
                    "final RETURN may follow"
                )
            if t.is_kw("MATCH") or (
                t.is_kw("OPTIONAL") and not self.peek().is_kw("CALL")
            ):
                clauses.append(self.parse_match())
            elif t.is_kw("UNWIND"):
                clauses.append(self.parse_unwind())
            elif t.is_kw("WITH"):
                clauses.append(self.parse_projection(is_return=False))
            elif t.is_kw("RETURN"):
                clauses.append(self.parse_projection(is_return=True))
                break
            elif t.is_kw("CALL") or t.is_kw("OPTIONAL"):
                # OPTIONAL CALL { } (round 7; Neo4j 5.24): outer rows
                # with no subquery output survive with nulls
                optional = bool(self.accept_kw("OPTIONAL"))
                call = self.parse_call_subquery()
                if optional:
                    if not isinstance(call, A.CallSubqueryClause):
                        raise TranspilerNotSupportedError(
                            "OPTIONAL CALL is only supported for CALL { } "
                            "subqueries, not procedures"
                        )
                    call.optional = True
                clauses.append(call)
                if isinstance(call, A.CallProcedureClause) and call.standalone:
                    break  # implicit RETURN of the procedure's column
                if (
                    isinstance(call, A.CallSubqueryClause)
                    and call.in_transactions
                    and self.cur.kind == "eof"
                ):
                    # a batched write statement may end at the CALL —
                    # there is nothing to RETURN (round 14)
                    break
            else:
                raise TranspilerSyntaxError(
                    f"Expected a clause keyword at position {t.pos}, got {t.value!r}"
                )
        # standalone WITH/RETURN (no reading clause) is allowed as an
        # extension — the planner supplies a one-row source (the reference
        # rejects it, CypherVisitor.cs:447-450,828-831)
        for prev, nxt in zip(clauses, clauses[1:]):
            if (
                isinstance(prev, A.MatchClause)
                and prev.optional
                and isinstance(nxt, A.MatchClause)
                and not nxt.optional
            ):
                raise TranspilerNotSupportedError(
                    "MATCH cannot directly follow OPTIONAL MATCH "
                    "(reference CypherVisitor.cs:344-359)"
                )
        first_match = next(
            (c for c in clauses if isinstance(c, A.MatchClause)), None
        )
        if first_match is not None and first_match.optional:
            prior = clauses[: clauses.index(first_match)]
            if not any(
                isinstance(
                    c, (A.MatchClause, A.UnwindClause, A.CallSubqueryClause)
                )
                for c in prior
            ):
                raise TranspilerNotSupportedError(
                    "OPTIONAL MATCH cannot be the first reading clause"
                )
        return A.SingleQuery(clauses)

    # -- clauses ---------------------------------------------------------------
    def parse_match(self) -> A.MatchClause:
        optional = bool(self.accept_kw("OPTIONAL"))
        self.expect_kw("MATCH")
        patterns = [self.parse_pattern_part()]
        while self.accept_punct(","):
            patterns.append(self.parse_pattern_part())
        where = None
        if self.accept_kw("WHERE"):
            where = self.parse_expr()
        return A.MatchClause(patterns, optional, where)

    def parse_call_subquery(self):
        """``CALL { <query> [UNION [ALL] <query>]* }`` (extension), or a
        schema-introspection procedure ``CALL db.labels() [YIELD col [AS
        alias]]`` (extension; the engine desugars it to an UNWIND over
        plan-time schema constants — see engine._resolve_procedures). A
        UNION inside the braces is supported in the uncorrelated form only
        (the planner fences correlated UNION)."""
        self.expect_kw("CALL")
        scope_vars: list[str] | None = None
        if self.cur.is_punct("("):
            # scope clause `CALL (a, b) { ... }` (Neo4j 5.23 syntax,
            # extension) — pure sugar for the import-WITH form: the
            # variable list is prepended as `WITH a, b` to every branch
            self.advance()
            if self.accept_punct("*"):
                # `CALL (*) { }` (Neo4j 5.23): import every outer
                # variable the body references. The scope isn't known
                # until planning, so mark the clause and let plan_call
                # expand it into the ordinary import-WITH form.
                self.expect_punct(")")
                if not self.cur.is_punct("{"):
                    raise TranspilerSyntaxError(
                        f"Expected {{ after CALL (*) at position "
                        f"{self.cur.pos}, got {self.cur.value!r}"
                    )
                self.expect_punct("{")
                inner: A.Query = self.parse_single_query()
                while self.accept_kw("UNION"):
                    all_ = bool(self.accept_kw("ALL"))
                    inner = A.UnionQuery(
                        inner, self.parse_single_query(), all_
                    )
                self.expect_punct("}")
                in_tx, batch = self._maybe_in_transactions()
                self._check_call_body_writes(inner, in_tx)
                return A.CallSubqueryClause(
                    inner, scope_star=True,
                    in_transactions=in_tx, batch_rows=batch,
                )
            scope_vars = []
            if not self.cur.is_punct(")"):
                scope_vars.append(self.expect_ident())
                while self.accept_punct(","):
                    scope_vars.append(self.expect_ident())
            self.expect_punct(")")
            if not self.cur.is_punct("{"):
                raise TranspilerSyntaxError(
                    f"Expected {{ after CALL (...) at position "
                    f"{self.cur.pos}, got {self.cur.value!r}"
                )
        if not self.cur.is_punct("{"):
            return self.parse_call_procedure()
        self.expect_punct("{")

        def with_scope(q: "A.SingleQuery") -> "A.SingleQuery":
            if not scope_vars:
                return q
            imp = A.ProjectionClause(
                items=[(v, A.Variable(v)) for v in scope_vars]
            )
            q.clauses.insert(0, imp)
            return q

        inner: A.Query = with_scope(self.parse_single_query())
        while self.accept_kw("UNION"):
            all_ = bool(self.accept_kw("ALL"))
            right = with_scope(self.parse_single_query())
            inner = A.UnionQuery(inner, right, all_)
        self.expect_punct("}")
        in_tx, batch = self._maybe_in_transactions()
        self._check_call_body_writes(inner, in_tx)
        return A.CallSubqueryClause(
            inner, in_transactions=in_tx, batch_rows=batch
        )

    @staticmethod
    def _check_call_body_writes(inner: "A.Query", in_tx: bool) -> None:
        """Write clauses inside ``CALL { }`` are only executed by the
        IN TRANSACTIONS form (round 14) — without the suffix the
        subquery is a READ in this engine, so a write body would be
        silently dropped; fence it with a typed error instead."""
        if in_tx:
            return

        def singles(q):
            if isinstance(q, A.UnionQuery):
                yield from singles(q.left)
                yield from singles(q.right)
            else:
                yield q

        for sq in singles(inner):
            if any(isinstance(c, A.WriteClause) for c in sq.clauses):
                raise TranspilerNotSupportedError(
                    "Write clauses inside CALL { } are only supported "
                    "with the IN TRANSACTIONS suffix (cypher_write); a "
                    "plain CALL { } subquery is read-only"
                )

    def _maybe_in_transactions(self) -> "tuple[bool, int | None]":
        """Optional ``IN TRANSACTIONS [OF <n> ROWS]`` suffix after a
        ``CALL { }`` (round 14; Neo4j's batched bulk-write form —
        executed by cypher_write, rejected with a typed error by the
        read planner). ``ON ERROR ...`` / ``REPORT STATUS`` error
        handling is a typed fence. TRANSACTIONS/OF/ROWS are contextual
        words (not reserved keywords), matched case-insensitively."""

        def is_word(tok, *words):
            return tok.kind == "ident" and tok.value.upper() in words

        if not (self.cur.is_kw("IN") and is_word(self.peek(), "TRANSACTIONS")):
            return False, None
        self.advance()
        self.advance()
        batch: int | None = None
        if is_word(self.cur, "OF"):
            self.advance()
            if self.cur.kind != "int":
                raise TranspilerSyntaxError(
                    f"Expected a row count after IN TRANSACTIONS OF at "
                    f"position {self.cur.pos}, got {self.cur.value!r}"
                )
            batch = int(self.cur.value)
            self.advance()
            if not is_word(self.cur, "ROWS", "ROW"):
                raise TranspilerSyntaxError(
                    f"Expected ROWS after IN TRANSACTIONS OF <n> at "
                    f"position {self.cur.pos}, got {self.cur.value!r}"
                )
            self.advance()
            if batch < 1:
                raise TranspilerSyntaxError(
                    "IN TRANSACTIONS OF <n> ROWS needs a positive n"
                )
        if is_word(self.cur, "ON", "REPORT"):
            raise TranspilerNotSupportedError(
                "IN TRANSACTIONS error handling (ON ERROR ... / "
                "REPORT STATUS) is not supported — batches either all "
                "apply or the statement raises"
            )
        return True, batch

    def parse_unwind(self) -> A.UnwindClause:
        self.expect_kw("UNWIND")
        expr = self.parse_expr()
        self.expect_kw("AS")
        alias = self.expect_ident()
        return A.UnwindClause(expr, alias)

    def parse_call_procedure(self) -> A.CallProcedureClause:
        """Qualified procedure name + ``()`` + optional YIELD. Name
        validity (and the single-output-column restriction) is checked by
        the engine, which owns the schema."""
        parts = [self.expect_ident()]
        while self.accept_punct("."):
            parts.append(self.expect_name())
        name = ".".join(parts).lower()
        if not self.cur.is_punct("("):
            raise TranspilerSyntaxError(
                f"Expected ( after CALL {name} at position {self.cur.pos}"
            )
        self.expect_punct("(")
        args = []
        if not self.cur.is_punct(")"):
            args.append(self.parse_expr())
            while self.accept_punct(","):
                args.append(self.parse_expr())
        self.expect_punct(")")
        yield_name = out_alias = where = None
        yields: list[tuple[str, str]] = []
        if self.accept_soft_kw("YIELD"):
            while True:
                nm = self.expect_name()
                al = self.expect_ident() if self.accept_kw("AS") else nm
                yields.append((nm, al))
                if not self.accept_punct(","):
                    break
            yield_name, out_alias = yields[0]
            if self.accept_kw("WHERE"):
                where = self.parse_expr()
        standalone = self.cur.kind == "eof" or self.cur.is_punct(";")
        if yield_name is None and not standalone:
            # Neo4j parity: an in-query procedure call must name its output
            raise TranspilerSyntaxError(
                f"CALL {name} must YIELD its output column when followed "
                "by other clauses"
            )
        return A.CallProcedureClause(
            name, yield_name, out_alias, standalone, where, args, yields
        )

    def parse_foreach(self, nested: bool = False) -> list:
        """``FOREACH (x IN list | <write clauses>)`` (extension) —
        desugared to ``UNWIND list AS x`` (marked ``foreach=True``)
        followed by the inner writes, which the snapshot write executor
        applies per binding row. RETURN/WITH afterwards is supported
        (round 7): the executor's synthetic boundary restores pre-FOREACH
        cardinality and scopes ``x`` to the body. A FOREACH after other
        write clauses stays fenced.

        Nested FOREACH (round 7): the inner loop desugars to a further
        foreach-UNWIND, so the flattened clause list reads
        ``UNWIND x, <outer writes>, UNWIND y, <inner writes>`` — both
        unwinds land in the reading prefix (ordered), and every write
        applies at the (x, y) cardinality. Under the documented per-key
        max() write model that yields the same final state as Neo4j's
        sequential application for SET/REMOVE/DELETE/MERGE; a CREATE in
        an OUTER body would run once per inner element (wrong
        multiplicity), so that one form keeps a typed fence — put the
        CREATE in the innermost body or a separate FOREACH."""
        self.advance()  # FOREACH (soft keyword: an ident token)
        self.expect_punct("(")
        var = self.expect_ident()
        self.expect_kw("IN")
        list_expr = self.parse_expr()
        self.expect_punct("|")
        inner: list = []
        own_creates = False
        has_nested = False
        while not self.cur.is_punct(")"):
            t = self.cur
            if t.kind == "ident" and str(t.value).upper() == "FOREACH":
                inner.extend(self.parse_foreach(nested=True))
                has_nested = True
                continue
            if not t.is_kw("CREATE", "MERGE", "SET", "DELETE", "DETACH", "REMOVE"):
                raise TranspilerSyntaxError(
                    f"Expected a write clause inside FOREACH at position "
                    f"{t.pos}, got {t.value!r}"
                )
            c = self.parse_write_clause()
            if isinstance(c, A.CreateClause):
                own_creates = True
            inner.append(c)
        self.expect_punct(")")
        if not inner:
            raise TranspilerSyntaxError("FOREACH requires at least one write clause")
        if has_nested and own_creates:
            raise TranspilerNotSupportedError(
                "CREATE in the OUTER body of a nested FOREACH is not "
                "supported (the flattened desugar would run it once per "
                "inner element) — move the CREATE into the innermost "
                "body or its own FOREACH"
            )
        return [A.UnwindClause(list_expr, var, foreach=True)] + inner

    # -- write clauses (extension; reference rejects all of them) ----------
    def accept_soft_kw(self, name: str) -> bool:
        """Non-reserved keyword (``ON``): matched as a bare identifier so
        it stays usable as a property/alias name everywhere else."""
        if self.cur.kind == "ident" and str(self.cur.value).upper() == name:
            self.advance()
            return True
        return False

    def parse_write_clause(self) -> A.WriteClause:
        t = self.cur
        if t.is_kw("SET"):
            return self.parse_set()
        if t.is_kw("REMOVE"):
            return self.parse_remove()
        if t.is_kw("CREATE"):
            return self.parse_create()
        if t.is_kw("MERGE"):
            return self.parse_merge()
        # DELETE / DETACH DELETE
        detach = bool(self.accept_kw("DETACH"))
        self.expect_kw("DELETE")
        aliases = [self.expect_ident()]
        while self.accept_punct(","):
            aliases.append(self.expect_ident())
        return A.DeleteClause(aliases, detach)

    def parse_set_item(self) -> A.SetItem:
        alias = self.expect_ident()
        if self.accept_punct(":"):
            # SET n:Label — label facet addition (round 6 extension)
            return A.SetLabelItem(alias, self.expect_name())
        if self.cur.is_punct("+") and self.peek().is_punct("="):
            # SET n += {map} (round 6 extension): merge map keys into the
            # entity; null values remove (Neo4j semantics)
            self.advance()
            self.advance()
            expr = self.parse_expr()
            if not isinstance(
                expr, (A.MapLiteral, A.Parameter, A.MapProjection)
            ):
                raise TranspilerNotSupportedError(
                    "SET n += requires a map literal, a $param bound to "
                    "a map, or a map projection (src {.prop, ...})"
                )
            return A.SetPlusItem(alias, expr)
        if self.cur.is_punct("="):
            # SET n = {map} (round 7 extension): REPLACE the entity's
            # properties — declared non-id properties absent from the
            # map are removed (Neo4j semantics)
            self.advance()
            expr = self.parse_expr()
            if not isinstance(
                expr, (A.MapLiteral, A.Parameter, A.MapProjection)
            ):
                raise TranspilerNotSupportedError(
                    "SET n = requires a map literal, a $param bound to a "
                    "map, or a map projection (property replacement); "
                    "use SET n.prop = ... for a single property"
                )
            return A.SetReplaceItem(alias, expr)
        self.expect_punct(".")
        prop = self.expect_name()
        if self.cur.is_punct("."):
            raise TranspilerNotSupportedError(
                "SET on a nested property path is not supported"
            )
        self.expect_punct("=")
        return A.SetItem(alias, prop, self.parse_expr())

    def parse_set(self) -> A.SetClause:
        self.expect_kw("SET")
        items = [self.parse_set_item()]
        while self.accept_punct(","):
            items.append(self.parse_set_item())
        return A.SetClause(items)

    def parse_remove(self) -> A.RemoveClause:
        self.expect_kw("REMOVE")
        items = []
        labels = []
        while True:
            alias = self.expect_ident()
            if self.accept_punct(":"):
                # REMOVE n:Label — label facet removal (round 6 extension)
                labels.append((alias, self.expect_name()))
            else:
                self.expect_punct(".")
                items.append((alias, self.expect_name()))
            if not self.accept_punct(","):
                break
        return A.RemoveClause(items, labels)

    @staticmethod
    def _reject_pattern_where(part, kw: str) -> None:
        # inline WHERE is a MATCH-side predicate; Neo4j rejects it in
        # CREATE/MERGE patterns too
        for ent in (*part.nodes, *part.rels):
            if getattr(ent, "where", None) is not None:
                raise TranspilerSyntaxError(
                    f"An inline WHERE is not allowed in a {kw} pattern"
                )

    def parse_create(self) -> A.CreateClause:
        self.expect_kw("CREATE")
        patterns = [self.parse_pattern_part()]
        while self.accept_punct(","):
            patterns.append(self.parse_pattern_part())
        for p in patterns:
            self._reject_pattern_where(p, "CREATE")
        return A.CreateClause(patterns)

    def parse_merge(self) -> A.MergeClause:
        self.expect_kw("MERGE")
        pattern = self.parse_pattern_part()
        self._reject_pattern_where(pattern, "MERGE")
        on_create: list[A.SetItem] = []
        on_match: list[A.SetItem] = []
        while self.accept_soft_kw("ON"):
            if self.accept_kw("CREATE"):
                target = on_create
            elif self.accept_kw("MATCH"):
                target = on_match
            else:
                raise TranspilerSyntaxError(
                    f"Expected CREATE or MATCH after ON at position "
                    f"{self.cur.pos}"
                )
            self.expect_kw("SET")
            target.append(self.parse_set_item())
            while self.accept_punct(","):
                target.append(self.parse_set_item())
        return A.MergeClause(pattern, on_create, on_match)

    def parse_projection(self, is_return: bool) -> A.ProjectionClause:
        self.advance()  # WITH / RETURN
        distinct = bool(self.accept_kw("DISTINCT"))
        items: list[tuple[str, A.Expr]] = []
        # `WITH *` / `RETURN *` (extension): expand to every in-scope
        # alias at PLAN time (the parser has no environment); optional
        # extra items follow a comma
        star = False
        if self.cur.is_punct("*"):
            star = True
            self.advance()
            if not self.accept_punct(","):
                return A.ProjectionClause(
                    items,
                    distinct,
                    *self._parse_projection_tail(is_return),
                    is_return,
                    star,
                )
        while True:
            expr = self.parse_expr()
            if self.accept_kw("AS"):
                alias = self.expect_name()
            else:
                alias = self._implicit_alias(expr)
            items.append((alias, expr))
            if not self.accept_punct(","):
                break
        seen = set()
        for alias, _ in items:
            if alias in seen:
                raise TranspilerSyntaxError(f"Duplicate projection alias '{alias}'")
            seen.add(alias)
        return A.ProjectionClause(
            items,
            distinct,
            *self._parse_projection_tail(is_return),
            is_return,
            star,
        )

    def _parse_projection_tail(
        self, is_return: bool
    ) -> tuple[A.Expr | None, list[A.SortItem], int | None, int | None]:
        order_by: list[A.SortItem] = []
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            while True:
                e = self.parse_expr()
                asc = True
                if self.accept_kw("DESC", "DESCENDING"):
                    asc = False
                else:
                    self.accept_kw("ASC", "ASCENDING")
                order_by.append(A.SortItem(e, asc))
                if not self.accept_punct(","):
                    break
        skip = limit = None
        if self.accept_kw("SKIP"):
            skip = self._expect_nonneg_int("SKIP")
        if self.accept_kw("LIMIT"):
            limit = self._expect_nonneg_int("LIMIT")
        where = None
        if self.accept_kw("WHERE"):
            if is_return:
                raise TranspilerSyntaxError("WHERE is not allowed after RETURN")
            where = self.parse_expr()
        return where, order_by, skip, limit

    def _expect_nonneg_int(self, what: str) -> int:
        t = self.cur
        if t.kind != "int" or int(t.value) < 0:
            raise TranspilerSyntaxError(
                f"{what} requires a non-negative integer literal at position {t.pos}"
            )
        self.advance()
        return int(t.value)

    def _implicit_alias(self, expr: A.Expr) -> str:
        if isinstance(expr, A.Variable):
            return expr.name
        if isinstance(expr, A.Property):
            return ".".join([expr.alias, expr.prop, *expr.path])
        raise TranspilerSyntaxError(
            "Computed projection items require an explicit alias (use AS)"
        )

    # -- patterns ----------------------------------------------------------------
    def parse_pattern_part(self) -> A.PatternPart:
        # pattern variable `p = (a)-[]-(b)` (extension; reference rejects,
        # CypherVisitor.cs:998-1002): binds the path for length()/nodes()/
        # relationships(); fixed-length patterns only (planner enforces)
        path_alias = None
        if self.cur.kind == "ident" and self.peek().is_punct("="):
            path_alias = self.expect_ident()
            self.expect_punct("=")
        # `shortestPath((a)-[:V*]->(b))` / `allShortestPaths(...)`
        # wrappers (extension; the engine rewrites the unbounded hop to a
        # distance-carrying virtual edge — allShortestPaths keeps EVERY
        # minimal-length path per endpoint pair, round 11)
        shortest = False
        all_shortest = False
        if (
            self.cur.kind == "ident"
            and str(self.cur.value).lower()
            in ("shortestpath", "allshortestpaths")
            and self.peek().is_punct("(")
        ):
            shortest = True
            all_shortest = str(self.cur.value).lower() == "allshortestpaths"
            self.advance()
            self.expect_punct("(")
        nodes = [self.parse_node_pattern()]
        rels: list[A.RelPattern] = []
        while self.cur.is_punct("-", "<"):
            rels.append(self.parse_rel_pattern())
            nodes.append(self.parse_node_pattern())
        if shortest:
            self.expect_punct(")")
            if len(rels) != 1 or rels[0].min_hops is None or rels[0].max_hops is not None:
                raise TranspilerNotSupportedError(
                    "shortestPath() requires a single unbounded hop, e.g. "
                    "shortestPath((a)-[:V*]->(b))"
                )
        return A.PatternPart(nodes, rels, path_alias, shortest, all_shortest)

    def parse_node_pattern(self) -> A.NodePattern:
        self.expect_punct("(")
        alias = None
        if self.cur.kind == "ident":
            alias = self.expect_ident()
        label = None
        extra: list[str] = []
        if self.accept_punct(":"):
            # multi-label (extension): first label is primary, the rest
            # intersect via semi joins on the node id
            label = self.expect_name()
            # label disjunction `(n:A|B)` (Neo4j 5, extension): stored as
            # 'A|B'; the engine rewrites it to a tagged-union scan before
            # planning (engine.py:_resolve_multi_label)
            while self.accept_punct("|"):
                label += "|" + self.expect_name()
            while self.accept_punct(":"):
                if "|" in label:
                    raise TranspilerNotSupportedError(
                        "Label disjunction (n:A|B) cannot combine with "
                        "label conjunction (n:A:B)"
                    )
                extra.append(self.expect_name())
        props = self.parse_property_map() if self.cur.is_punct("{") else []
        where = None
        if self.cur.is_kw("WHERE"):
            # inline pattern predicate `(n:L WHERE pred)` (Neo4j 5,
            # extension) — desugared like the property map
            self.advance()
            where = self.parse_expr()
        self.expect_punct(")")
        return A.NodePattern(alias, label, extra, props, where)

    def parse_property_map(self) -> list[tuple[str, A.Expr]]:
        """Inline property map `{k: v, ...}` (extension; the reference
        rejects them, CypherVisitor.cs:1094-1097) — pure sugar: the
        planner desugars each pair to a WHERE equality conjunct on the
        pattern's alias, so `(n:L {k: v})` ≡ `(n:L) ... WHERE n.k = v`."""
        self.expect_punct("{")
        props: list[tuple[str, A.Expr]] = []
        if not self.cur.is_punct("}"):
            while True:
                key = self.expect_name()
                self.expect_punct(":")
                props.append((key, self.parse_expr()))
                if not self.accept_punct(","):
                    break
        self.expect_punct("}")
        return props

    def parse_map_projection(self, alias: str) -> A.Expr:
        """``alias {.prop, .*, key: expr, var}`` (Neo4j map projection,
        extension). Key positions follow the symbolic-name grammar
        (keywords allowed, like property maps)."""
        self.expect_punct("{")
        items: list[tuple[str, object]] = []
        if not self.cur.is_punct("}"):
            while True:
                if self.accept_punct("."):
                    if self.accept_punct("*"):
                        items.append(("all", None))
                    else:
                        items.append(("prop", self.expect_name()))
                elif (
                    self.cur.kind in ("ident", "kw")
                    and self.peek().is_punct(":")
                ):
                    key = self.expect_name()
                    self.expect_punct(":")
                    items.append(("entry", (key, self.parse_expr())))
                elif self.cur.kind == "ident":
                    items.append(("var", self.expect_ident()))
                else:
                    raise TranspilerSyntaxError(
                        "Expected '.prop', '.*', 'key: expr' or a "
                        f"variable in map projection at position "
                        f"{self.cur.pos}, got {self.cur.value!r}"
                    )
                if not self.accept_punct(","):
                    break
        self.expect_punct("}")
        if not items:
            raise TranspilerNotSupportedError(
                "An empty map projection `n {}` is not supported — a "
                "Spark struct needs at least one field; use properties(n) "
                "for the full property map"
            )
        return A.MapProjection(alias, items)

    def parse_rel_pattern(self) -> A.RelPattern:
        # assembled from single-char tokens:  <-[..]-   -[..]->   -[..]-
        # plus bracketless shorthands:  <--   -->   --
        left_arrow = bool(self.accept_punct("<"))
        self.expect_punct("-")
        alias = verb = None
        alt_verbs: list[str] = []
        rel_props: list[tuple[str, A.Expr]] = []
        if self.accept_punct("["):
            if self.cur.kind == "ident":
                alias = self.expect_ident()
            if self.accept_punct(":"):
                # multiple types `[:A|B]` / `[:A|:B]` (extension; the
                # reference rejects them, CypherVisitor.cs:1181-1207):
                # collected here, rewritten by the engine to a single
                # virtual union edge before planning
                verb = self.expect_name()
                while self.accept_punct("|"):
                    self.accept_punct(":")  # Neo4j also allows [:A|:B]
                    alt = self.expect_name()
                    if alt == verb or alt in alt_verbs:
                        raise TranspilerSyntaxError(
                            f"Duplicate relationship type '{alt}' in "
                            "alternation"
                        )
                    alt_verbs.append(alt)
            min_hops = max_hops = None
            if self.accept_punct("*"):
                # variable-length (extension): *n, *n..m, *..m expand to a
                # bounded union of join chains; * and *n.. (no upper bound)
                # compile to REACHABILITY over an iterative transitive
                # closure — distinct endpoint pairs, not one row per path
                # (the reference rejects all of these outright,
                # CypherVisitor.cs:2035-2039).
                min_hops = 1
                unbounded = True
                if self.cur.kind == "int":
                    min_hops = int(self.advance().value)
                    max_hops = min_hops  # exact *n unless .. follows
                    unbounded = False
                if self.accept_punct("."):
                    self.expect_punct(".")
                    max_hops = None
                    unbounded = True
                    if self.cur.kind == "int":
                        max_hops = int(self.advance().value)
                        unbounded = False
                if min_hops < 0 or (max_hops is not None and max_hops < min_hops):
                    raise TranspilerSyntaxError(
                        f"Invalid variable-length range *{min_hops}..{max_hops}"
                    )
                # *0.. unbounded (round 8): reachability ∪ length-0
                # identity pairs — handled by engine._resolve_unbounded
                if not unbounded and max_hops > 8:
                    raise TranspilerNotSupportedError(
                        "Variable-length upper bound is limited to 8 hops"
                    )
                if alias is not None:
                    raise TranspilerNotSupportedError(
                        "A variable-length relationship cannot be bound to an "
                        "alias"
                    )
            if self.cur.is_punct("{"):
                rel_props = self.parse_property_map()
            if self.cur.is_kw("WHERE"):
                # inline pattern predicate `[r:T WHERE pred]` (Neo4j 5,
                # extension) — single hop only: a var-length hop has no
                # single relationship for the predicate to bind to
                self.advance()
                if min_hops is not None:
                    raise TranspilerNotSupportedError(
                        "An inline WHERE on a variable-length relationship "
                        "is not supported — use a property map (filters "
                        "every hop) or a post-MATCH WHERE"
                    )
                rel_where = self.parse_expr()
            else:
                rel_where = None
            self.expect_punct("]")
        else:
            min_hops = max_hops = None
            rel_where = None
        self.expect_punct("-")
        right_arrow = bool(self.accept_punct(">"))
        if left_arrow and right_arrow:
            raise TranspilerSyntaxError("Relationship cannot point both ways")
        if left_arrow:
            direction = A.Direction.BACKWARD
        elif right_arrow:
            direction = A.Direction.FORWARD
        else:
            direction = A.Direction.EITHER
        # GQL / Neo4j 5 quantified relationships (round 8): postfix
        # `-[:R]->{n,m}` / `{n}` / `{n,}` / `{,m}`, `->+` (one-or-more)
        # and `->*` (zero-or-more) — pure sugar over the bracket *n..m
        # spellings, so the same expansion/reachability machinery and the
        # same validations apply. Unambiguous position: a node pattern
        # always starts with '(' here.
        q_min = q_max = None
        has_q = False
        if self.accept_punct("{"):
            has_q = True
            if self.cur.kind == "int":
                q_min = int(self.advance().value)
            if self.accept_punct(","):
                if self.cur.kind == "int":
                    q_max = int(self.advance().value)
                if q_min is None and q_max is None:
                    # GQL/Neo4j reject a quantifier with neither bound;
                    # silently reading `{,}` as zero-or-more would run
                    # invalid queries (ADVICE r8)
                    raise TranspilerSyntaxError(
                        "Relationship quantifier {,} needs at least one "
                        "bound: use {n,}, {,m} or {n,m}"
                    )
            else:
                if q_min is None:
                    raise TranspilerSyntaxError(
                        f"Empty relationship quantifier {{}} at position "
                        f"{self.cur.pos}"
                    )
                q_max = q_min  # {n} = exactly n
            if q_min is None:
                q_min = 0  # {,m}
            self.expect_punct("}")
        elif self.accept_punct("+"):
            has_q, q_min, q_max = True, 1, None
        elif self.accept_punct("*"):
            has_q, q_min, q_max = True, 0, None
        if has_q:
            if min_hops is not None:
                raise TranspilerSyntaxError(
                    "Duplicate quantifier: use either [*n..m] inside the "
                    "brackets or a postfix {n,m}, not both"
                )
            if q_max is not None and q_max < q_min:
                raise TranspilerSyntaxError(
                    f"Invalid relationship quantifier {{{q_min},{q_max}}}"
                )
            if q_max is not None and q_max > 8:
                raise TranspilerNotSupportedError(
                    "Variable-length upper bound is limited to 8 hops"
                )
            if alias is not None:
                raise TranspilerNotSupportedError(
                    "A variable-length relationship cannot be bound to an "
                    "alias"
                )
            if rel_where is not None:
                raise TranspilerNotSupportedError(
                    "An inline WHERE on a variable-length relationship "
                    "is not supported — use a property map (filters every "
                    "hop) or a post-MATCH WHERE"
                )
            min_hops, max_hops = q_min, q_max
        # undirected variable-length `-[:V*n..m]-` / `-[:V*]-` is allowed
        # (extension): the engine symmetrizes the edge set per hop
        return A.RelPattern(
            alias, verb, direction, min_hops, max_hops, alt_verbs, rel_props,
            rel_where,
        )

    # -- expressions ----------------------------------------------------------
    def parse_expr(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        e = self.parse_xor()
        while self.accept_kw("OR"):
            e = A.Binary(A.BinaryOp.OR, e, self.parse_xor())
        return e

    def parse_xor(self) -> A.Expr:
        e = self.parse_and()
        while self.accept_kw("XOR"):
            e = A.Binary(A.BinaryOp.XOR, e, self.parse_and())
        return e

    def parse_and(self) -> A.Expr:
        e = self.parse_not()
        while self.accept_kw("AND"):
            e = A.Binary(A.BinaryOp.AND, e, self.parse_not())
        return e

    def parse_not(self) -> A.Expr:
        if self.accept_kw("NOT"):
            return A.Unary("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> A.Expr:
        e = self.parse_string_list_null()
        while self.cur.kind == "punct" and str(self.cur.value) in COMPARISON_TOKENS:
            op = COMPARISON_TOKENS[str(self.advance().value)]
            e = A.Binary(op, e, self.parse_string_list_null())
        return e

    def parse_string_list_null(self) -> A.Expr:
        e = self.parse_add_sub()
        while True:
            if self.accept_punct("=~"):
                e = A.Binary(A.BinaryOp.REGMATCH, e, self.parse_add_sub())
            elif self.accept_kw("IN"):
                e = A.Binary(A.BinaryOp.IN, e, self.parse_add_sub())
            elif self.cur.is_kw("STARTS"):
                self.advance()
                self.expect_kw("WITH")
                e = A.FuncCall("startswith", [e, self.parse_add_sub()])
            elif self.cur.is_kw("ENDS"):
                self.advance()
                self.expect_kw("WITH")
                e = A.FuncCall("endswith", [e, self.parse_add_sub()])
            elif self.accept_kw("CONTAINS"):
                e = A.FuncCall("contains", [e, self.parse_add_sub()])
            elif self.cur.is_kw("IS"):
                self.advance()
                if self.accept_kw("NOT"):
                    self.expect_kw("NULL")
                    e = A.FuncCall("isnotnull", [e])
                else:
                    self.expect_kw("NULL")
                    e = A.FuncCall("isnull", [e])
            elif self.cur.is_punct("["):
                raise TranspilerNotSupportedError(
                    "List index/slice expressions are not supported"
                )
            else:
                return e

    def parse_add_sub(self) -> A.Expr:
        e = self.parse_mul_div()
        while self.cur.is_punct("+", "-"):
            op = A.BinaryOp.PLUS if self.advance().value == "+" else A.BinaryOp.MINUS
            e = A.Binary(op, e, self.parse_mul_div())
        return e

    def parse_mul_div(self) -> A.Expr:
        e = self.parse_power()
        while self.cur.is_punct("*", "/", "%"):
            tok = str(self.advance().value)
            op = {
                "*": A.BinaryOp.MULTIPLY,
                "/": A.BinaryOp.DIVIDE,
                "%": A.BinaryOp.MODULO,
            }[tok]
            e = A.Binary(op, e, self.parse_power())
        return e

    def parse_power(self) -> A.Expr:
        e = self.parse_unary()
        while self.cur.is_punct("^"):
            self.advance()
            e = A.Binary(A.BinaryOp.POW, e, self.parse_unary())
        return e

    def parse_unary(self) -> A.Expr:
        if self.cur.is_punct("-"):
            self.advance()
            operand = self.parse_unary()
            if isinstance(operand, A.Literal) and isinstance(
                operand.value, (int, float)
            ):
                return A.Literal(-operand.value)
            return A.Unary("-", operand)
        if self.cur.is_punct("+"):
            self.advance()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> A.Expr:
        e = self.parse_atom()
        while self.cur.is_punct(".", "["):
            if self.cur.is_punct(".") and self.peek().is_punct("."):
                break  # `..` is the slice separator, not property access
            if self.cur.is_punct("["):
                # list index `l[i]` / slice `l[a..b]` (extension; Neo4j
                # semantics: 0-based, slice end-exclusive, negative index
                # counts from the end)
                self.advance()
                start = None
                if not self.cur.is_punct("."):
                    start = self.parse_expr()
                if self.cur.is_punct("."):
                    self.expect_punct(".")
                    self.expect_punct(".")
                    stop = None
                    if not self.cur.is_punct("]"):
                        stop = self.parse_expr()
                    e = A.ListSlice(e, start, stop)
                else:
                    if start is None:
                        raise TranspilerSyntaxError(
                            f"Empty list index at position {self.cur.pos}"
                        )
                    e = A.ListIndex(e, start)
                self.expect_punct("]")
                continue
            self.advance()
            prop = self.expect_name()
            if isinstance(e, A.Variable):
                e = A.Property(e.name, prop)
            elif isinstance(e, A.Property):
                # struct-field path (extension): n.meta.width
                e = A.Property(e.alias, e.prop, e.path + [prop])
            else:
                # struct-field access on a computed value (extension):
                # relationships(p)[0].type, {a: 1}.a — Catalyst-checked
                e = A.FieldAccess(e, prop)
        return e

    def parse_atom(self) -> A.Expr:
        t = self.cur
        if t.kind in ("int", "float", "string"):
            self.advance()
            return A.Literal(t.value)
        if t.is_kw("TRUE"):
            self.advance()
            return A.Literal(True)
        if t.is_kw("FALSE"):
            self.advance()
            return A.Literal(False)
        if t.is_kw("NULL"):
            self.advance()
            return A.Literal(None)
        if t.is_punct("$"):
            self.advance()
            return A.Parameter(self.expect_name())
        if t.is_punct("{"):
            # map literal in expression position (extension; reference
            # rejects, CypherVisitor.cs:2040-2044) -> named struct
            return A.MapLiteral(self.parse_property_map())
        if t.is_punct("("):
            # bare pattern predicate `(a)-[:V]->(b)` in expression position
            # (Neo4j idiom, same lowering as exists(...)): try-parse a
            # pattern with >= 1 hop, else backtrack to parenthesized expr
            mark = self.i
            try:
                part = self.parse_pattern_part()
                if part.rels:
                    return A.PatternPredicate(part)
            except (TranspilerSyntaxError, TranspilerNotSupportedError):
                pass
            self.i = mark
            self.advance()
            e = self.parse_expr()
            self.expect_punct(")")
            return e
        if t.is_punct("["):
            self.advance()
            # pattern comprehension `[(a)-[:V]->(b) WHERE p | e]`
            # (extension): try-parse a >= 1-hop pattern, else backtrack
            if self.cur.is_punct("("):
                mark = self.i
                try:
                    part = self.parse_pattern_part()
                    if part.rels:
                        where = None
                        if self.accept_kw("WHERE"):
                            where = self.parse_expr()
                        self.expect_punct("|")
                        map_expr = self.parse_expr()
                        self.expect_punct("]")
                        return A.PatternComprehension(part, where, map_expr)
                except (TranspilerSyntaxError, TranspilerNotSupportedError):
                    pass
                self.i = mark
            # list comprehension `[x IN list WHERE p | e]` (extension;
            # reference rejects comprehensions, CypherVisitor.cs:1903-1912)
            if self.cur.kind == "ident" and self.peek().is_kw("IN"):
                var = self.expect_ident()
                self.expect_kw("IN")
                lst = self.parse_expr()
                where = None
                if self.accept_kw("WHERE"):
                    where = self.parse_expr()
                map_expr = None
                if self.accept_punct("|"):
                    map_expr = self.parse_expr()
                self.expect_punct("]")
                return A.ListComprehension(var, lst, where, map_expr)
            items: list[A.Expr] = []
            if not self.cur.is_punct("]"):
                while True:
                    items.append(self.parse_expr())
                    if self.cur.is_punct("."):
                        raise TranspilerNotSupportedError(
                            "Range literals are not supported"
                        )
                    if not self.accept_punct(","):
                        break
            self.expect_punct("]")
            return A.ListLiteral(items)
        if t.is_kw("CASE"):
            return self.parse_case()
        if t.is_kw("NOT"):
            self.advance()
            return A.Unary("NOT", self.parse_not())
        if t.is_kw("EXISTS"):
            self.advance()
            if self.cur.is_punct("{"):
                return self._parse_subquery_tail("exists")
            self.expect_punct("(")
            return self._parse_exists_tail()
        if t.is_kw("ALL", "ANY", "NONE", "SINGLE") and self.peek().is_punct("("):
            # ALL is also the UNION ALL keyword, so quantifiers spelled
            # with keyword tokens land here instead of the ident path
            name = str(t.value).lower()
            self.advance()
            self.expect_punct("(")
            return self._parse_quantifier_tail(name)
        if t.kind == "ident":
            # COUNT { (a)-[:V]->(b) [WHERE p] } subquery (modern
            # openCypher, extension)
            if str(t.value).lower() == "count" and self.peek().is_punct("{"):
                self.advance()
                return self._parse_subquery_tail("count")
            # COLLECT { ... RETURN e } subquery (Neo4j 5, extension) —
            # checked before the map-projection hook so `collect {` never
            # parses as a projection of a variable named collect
            if str(t.value).lower() == "collect" and self.peek().is_punct("{"):
                self.advance()
                return self._parse_subquery_tail("collect")
            # namespaced temporal functions `datetime.truncate('month', x)`,
            # `date.truncate(...)`, `duration.between(a, b)` (extension;
            # these namespace names shadow same-named user aliases only in
            # the `name.fn(...)` call position)
            if (
                str(t.value).lower() in ("date", "datetime", "duration")
                and self.peek().is_punct(".")
                and self.peek(2).kind == "ident"
                and self.peek(3).is_punct("(")
            ) or (
                # `vector.similarity.cosine(a, b)` (Neo4j 5.18) — the only
                # two-segment function namespace
                str(t.value).lower() == "vector"
                and self.peek().is_punct(".")
                and self.peek(2).kind == "ident"
                and self.peek(3).is_punct(".")
                and self.peek(4).kind == "ident"
                and self.peek(5).is_punct("(")
            ):
                ns = str(self.advance().value).lower()
                self.advance()  # the dot
                fn = self.expect_ident().lower()
                if self.accept_punct("."):
                    fn += "." + self.expect_ident().lower()
                self.expect_punct("(")
                args: list[A.Expr] = []
                if not self.cur.is_punct(")"):
                    while True:
                        args.append(self.parse_expr())
                        if not self.accept_punct(","):
                            break
                self.expect_punct(")")
                return A.FuncCall(f"{ns}.{fn}", args)
            # function call?
            if self.peek().is_punct("("):
                return self.parse_func_call()
            name = self.expect_ident()
            if self.cur.is_punct("{"):
                # map projection `alias {.prop, .*, key: expr, var}`
                # (Neo4j sugar, extension) — the only construct where an
                # expression-position identifier is followed by `{`
                return self.parse_map_projection(name)
            return A.Variable(name)
        if t.is_kw("CONTAINS", "END"):  # identifiers that collide with keywords
            self.advance()
            return A.Variable(str(t.value).lower())
        raise TranspilerSyntaxError(
            f"Unexpected token {t.value!r} at position {t.pos}"
        )

    def parse_case(self) -> A.Expr:
        """Searched CASE, plus the simple `CASE <expr> WHEN <val>` form
        (extension; the reference rejects it, CypherVisitor.cs:1776-1782)
        desugared to searched equality: WHEN <val> -> WHEN <expr> = <val>.
        Equality-with-null never matches (3VL), same as Cypher's simple
        CASE, so the desugaring is exact."""
        import copy

        self.expect_kw("CASE")
        subject: A.Expr | None = None
        if not self.cur.is_kw("WHEN"):
            subject = self.parse_expr()
        whens: list[tuple[A.Expr, A.Expr]] = []
        while self.accept_kw("WHEN"):
            cond = self.parse_expr()
            if subject is not None:
                cond = A.Binary(A.BinaryOp.EQ, copy.deepcopy(subject), cond)
            self.expect_kw("THEN")
            val = self.parse_expr()
            whens.append((cond, val))
        if not whens:
            raise TranspilerSyntaxError("CASE requires at least one WHEN")
        else_ = None
        if self.accept_kw("ELSE"):
            else_ = self.parse_expr()
        self.expect_kw("END")
        return A.CaseExpr(whens, else_)

    def _parse_quantifier_tail(self, name: str) -> A.Expr:
        """After 'all(' / 'any(' / 'none(' / 'single(': quantified list
        predicate `x IN list WHERE p` (extension; the reference rejects
        these, CypherVisitor.cs:1903-1912)."""
        var = self.expect_ident()
        self.expect_kw("IN")
        lst = self.parse_expr()
        self.expect_kw("WHERE")
        pred = self.parse_expr()
        self.expect_punct(")")
        return A.Quantified(name, var, lst, pred)

    def _parse_subquery_tail(self, kind: str) -> A.Expr:
        """`EXISTS { (a)-[:V]->(b) [WHERE p] }` / `COUNT { ... }` /
        `COLLECT { ... RETURN e }` (modern openCypher subquery syntax,
        extension): lowered onto the existing pattern-predicate
        (semi/anti/flag joins) and pattern-comprehension (grouped
        collect) machinery — COUNT {} is exactly
        size([pattern WHERE p | 1]) and COLLECT {} is exactly
        [pattern WHERE p | e]. An optional leading MATCH keyword is
        accepted; multi-clause subqueries are rejected with a typed
        error."""
        self.expect_punct("{")
        self.accept_kw("MATCH")
        part = self.parse_pattern_part()
        if not part.rels and not any(
            n.alias is not None for n in part.nodes
        ):
            # a rel-less pattern with no alias at all cannot correlate
            # and has nothing to count distinct rows by
            raise TranspilerNotSupportedError(
                f"{kind.upper()} {{ }} on a bare anonymous node is not "
                "supported — alias the node, e.g. "
                f"{kind.upper()} {{ MATCH (n:Label) }}"
            )
        where = None
        if self.accept_kw("WHERE"):
            where = self.parse_expr()
        ret = None
        if kind == "collect":
            # COLLECT {} REQUIRES the inner RETURN (Neo4j grammar)
            if self.cur.is_kw("WITH", "ORDER", "MATCH", "UNWIND"):
                raise TranspilerNotSupportedError(
                    "COLLECT { } supports a single MATCH pattern with an "
                    "optional WHERE and a final RETURN item — multi-clause "
                    "subqueries (WITH/ORDER BY/extra MATCH) are not "
                    "supported; use CALL { ... RETURN collect(e) } instead"
                )
            self.expect_kw("RETURN")
            if self.accept_kw("DISTINCT"):
                raise TranspilerNotSupportedError(
                    "COLLECT { ... RETURN DISTINCT e } is not supported — "
                    "the pattern-comprehension lowering keeps one element "
                    "per pattern row; wrap a WITH-aggregated query in "
                    "CALL { } for per-row dedup"
                )
            ret = self.parse_expr()
        if not self.cur.is_punct("}"):
            raise TranspilerNotSupportedError(
                f"{kind.upper()} {{ }} supports a single MATCH pattern "
                "with an optional WHERE"
                + (" and a final RETURN item" if kind == "collect" else "")
                + " — multi-clause subqueries (WITH/ORDER BY/LIMIT) are "
                "not supported"
            )
        self.expect_punct("}")
        if kind == "exists":
            return A.PatternPredicate(part, where)
        if kind == "collect":
            return A.PatternComprehension(part, where, ret)
        return A.FuncCall(
            "size", [A.PatternComprehension(part, where, A.Literal(1))]
        )

    def _parse_exists_tail(self) -> A.Expr:
        """After 'exists(': pattern predicate (semi join) or IS-NOT-NULL.

        exists((a)-[:V]->(b)) -> PatternPredicate; exists(n.prop) -> the
        Neo4j-legacy property-existence form. Backtracks if the
        parenthesized form is not a pattern."""
        if self.cur.is_punct("("):
            mark = self.i
            try:
                part = self.parse_pattern_part()
                self.expect_punct(")")
                return A.PatternPredicate(part)
            except TranspilerSyntaxError:
                self.i = mark
        arg = self.parse_expr()
        self.expect_punct(")")
        return A.FuncCall("isnotnull", [arg])

    def parse_func_call(self) -> A.Expr:
        name = self.expect_ident().lower()
        self.expect_punct("(")
        if name == "exists":
            return self._parse_exists_tail()
        if name in ("all", "any", "none", "single"):
            return self._parse_quantifier_tail(name)
        if name == "reduce":
            # reduce(acc = init, x IN list | expr) — openCypher fold
            acc = self.expect_ident()
            self.expect_punct("=")
            init = self.parse_expr()
            self.expect_punct(",")
            var = self.expect_ident()
            self.expect_kw("IN")
            lst = self.parse_expr()
            self.expect_punct("|")
            body = self.parse_expr()
            self.expect_punct(")")
            if acc == var:
                raise TranspilerSyntaxError(
                    "reduce() accumulator and element variables must differ"
                )
            return A.Reduce(acc, init, var, lst, body)
        distinct = bool(self.accept_kw("DISTINCT"))
        if name in A.AGG_FUNCTION_NAMES:
            if name == "count" and self.cur.is_punct("*"):
                self.advance()
                self.expect_punct(")")
                return A.AggCall("count", None, distinct)
            arg = self.parse_expr()
            extras: list[A.Expr] = []
            while self.accept_punct(","):
                extras.append(self.parse_expr())
            # tolerate reference-style count(DISTINCT(x)) — DISTINCT already eaten
            self.expect_punct(")")
            if distinct and name not in ("count", "collect"):
                raise TranspilerNotSupportedError(
                    "DISTINCT is only supported inside count() and collect() "
                    "(reference SQLRenderer.cs:708-711)"
                )
            # Neo4j's last() is a LIST function; the reference's LAST is an
            # aggregate. Disambiguate by the argument's syntactic shape:
            # list-producing expressions (literals, comprehensions, slices,
            # list-returning calls, collect()) get the list semantics —
            # which also legalizes the `last(collect(x))` idiom the
            # nested-aggregate rule would otherwise reject.
            if name == "last" and not extras and _is_list_shaped(arg):
                return A.FuncCall("last_element", [arg])
            if any(A.contains_aggregate(e) for e in [arg, *extras]):
                raise TranspilerNotSupportedError(
                    "Nested aggregation functions are not supported"
                )
            return A.AggCall(name, arg, distinct, extras)
        if distinct:
            raise TranspilerSyntaxError(f"DISTINCT is not valid inside {name}()")
        args: list[A.Expr] = []
        if not self.cur.is_punct(")"):
            while True:
                args.append(self.parse_expr())
                if not self.accept_punct(","):
                    break
        self.expect_punct(")")
        return A.FuncCall(name, args)


_LIST_RETURNING_FNS = {
    "range", "split", "keys", "labels", "nodes", "relationships", "tail",
    "reverse", "last_element",
}


def _is_list_shaped(e: A.Expr) -> bool:
    """Syntactically list-producing expressions (for last() overloading)."""
    if isinstance(e, (A.ListLiteral, A.ListComprehension, A.ListSlice,
                      A.PatternComprehension)):
        return True
    if isinstance(e, A.FuncCall) and e.name in _LIST_RETURNING_FNS:
        return True
    if isinstance(e, A.AggCall) and e.name == "collect":
        return True
    return False


def parse(text: str, allow_writes: bool = False) -> A.Query:
    """Parse a Cypher query string into the AST (IR #1).

    ``allow_writes=True`` (used by ``engine.cypher_write``) accepts the
    functional write extension (CREATE/MERGE/SET/REMOVE/DELETE); the
    default keeps the reference's read-only scope fence."""
    return Parser(text, allow_writes=allow_writes).parse_query()
