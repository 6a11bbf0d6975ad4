"""Operator compiler: logical DAG (IR #2) -> PySpark DataFrame (lazy).

This is the counterpart of the reference's SQLRenderer
(/root/reference/src/SQLRenderer/SQLRenderer.cs:1066-1083 recursive dispatch),
except the target is a declarative DataFrame plan that Catalyst optimizes:
predicate pushdown, column pruning (entity properties never referenced are
pruned all the way to the parquet scan), join-strategy selection
(broadcast for dimension-sized node tables), and AQE re-planning all come
for free because every operator lowers to built-in DataFrame operations —
no RDDs, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cypher import ast as A
from ..exceptions import TranspilerInternalError
from ..plans.logical import (
    AddColsOp,
    CollectPatternOp,
    DataSourceOp,
    EntityRef,
    ExistsFlagOp,
    JoinOp,
    LogicalOp,
    MaterializedPathRef,
    OneRowOp,
    SeedOp,
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
from ..sources.registry import TableRegistry
from .expressions import ExprCompiler, qcol


class Compiler:
    def __init__(
        self,
        spark: SparkSession,
        tables: TableRegistry,
        params: dict | None = None,
    ):
        self.spark = spark
        self.tables = tables
        self.params = params or {}
        # RowIdOp instances compile ONCE (identity-keyed): every branch
        # of a correlated CALL { UNION } must see the same row ids
        self._rowid_cache: dict[int, DataFrame] = {}

    def compile(self, op: LogicalOp) -> DataFrame:
        if isinstance(op, DataSourceOp):
            return self._data_source(op)
        if isinstance(op, JoinOp):
            return self._join(op)
        if isinstance(op, SelectionOp):
            return self._selection(op)
        if isinstance(op, ProjectOp):
            return self._project(op)
        if isinstance(op, TrimOp):
            return self._trim(op)
        if isinstance(op, SetOp):
            return self._set(op)
        if isinstance(op, UnwindOp):
            return self._unwind(op)
        if isinstance(op, ExistsFlagOp):
            return self._exists_flag(op)
        if isinstance(op, CollectPatternOp):
            return self._collect_pattern(op)
        if isinstance(op, OneRowOp):
            # one row, zero columns — the standalone WITH/RETURN source
            return self.spark.range(1).select()
        if isinstance(op, SeedOp):
            # carried binding across a write-segment boundary (writes.py)
            return op.df
        if isinstance(op, RowIdOp):
            cached = self._rowid_cache.get(id(op))
            if cached is None:
                # localCheckpoint pins the numbering: without it a
                # post-shuffle recompute could deliver rows to partitions
                # in a different order per consumer branch. The outer
                # stream of a correlated CALL { UNION } is the only
                # construct that pays this materialization.
                cached = (
                    self.compile(op.input)
                    .withColumn(op.col, F.monotonically_increasing_id())
                    .localCheckpoint(eager=False)
                )
                self._rowid_cache[id(op)] = cached
            return cached
        if isinstance(op, AddColsOp):
            df = self.compile(op.input)
            ec = ExprCompiler(op.compile_env, df, self.params)
            return df.select(
                "*", *[ec.compile(e).alias(name) for name, e in op.items]
            )
        if isinstance(op, WindowLimitOp):
            return self._window_limit(op)
        raise TranspilerInternalError(f"Unknown operator {op!r}")

    # -- scan -----------------------------------------------------------------
    def _data_source(self, op: DataSourceOp) -> DataFrame:
        # all entities of a fused scan share one backing table (planner invariant)
        first = op.entities[0]
        sch = first.node if first.kind == "node" else first.edge
        df = self.tables.get(sch.table)
        # namespace every property as __{alias}_{prop}; Catalyst prunes the
        # unreferenced ones down to the parquet ReadSchema
        cols = []
        for ref in op.entities:
            cols.extend(F.col(p).alias(ref.col(p)) for p in ref.property_names)
        return df.select(cols)

    # -- join -----------------------------------------------------------------
    def _join(self, op: JoinOp) -> DataFrame:
        left = self.compile(op.left)
        right = self.compile(op.right)
        if op.how == "cross":
            return left.crossJoin(right)
        # all column names are globally unique (per-alias namespacing), so
        # name-based equality conditions are unambiguous even for self-joins
        if not op.pairs and op.how in ("semi", "anti"):
            # uncorrelated exists()/NOT exists(): only the right side's
            # non-emptiness matters — probe a broadcast limit-1 row
            probe = F.broadcast(right.limit(1))
            how = "left_semi" if op.how == "semi" else "left_anti"
            return left.join(probe, on=F.lit(True), how=how)
        cond = None
        for l_col, r_col in op.pairs:
            eq = (
                F.col(l_col).eqNullSafe(F.col(r_col))
                if op.null_safe
                else F.col(l_col) == F.col(r_col)
            )
            cond = eq if cond is None else cond & eq
        # 'semi'/'anti' carry exists()/NOT exists() pattern predicates
        how = {"semi": "left_semi", "anti": "left_anti"}.get(op.how, op.how)
        df = left.join(right, on=cond, how=how)
        if op.drop_right:
            df = df.drop(*op.drop_right)
        return df

    # -- pattern comprehension -------------------------------------------------
    def _collect_pattern(self, op: CollectPatternOp) -> DataFrame:
        left = self.compile(op.left)
        right = self.compile(op.right)
        ec = ExprCompiler(op.right.env, right, self.params)
        val = ec.compile(op.map_expr)
        rkeys = [r for _, r in op.pairs]
        if not rkeys:
            # uncorrelated comprehension / COUNT { }: one global
            # collect row, broadcast-crossed onto every left row
            agg = right.groupBy().agg(
                F.collect_list(val).alias(op.out_col)
            )
            joined = left.crossJoin(F.broadcast(agg))
            dtype = agg.schema[op.out_col].dataType
            return joined.withColumn(
                op.out_col,
                F.coalesce(qcol(op.out_col), F.array().cast(dtype)),
            )
        agg = right.groupBy(*[qcol(c) for c in rkeys]).agg(
            F.collect_list(val).alias(op.out_col)
        )
        cond = None
        for l_col, r_col in op.pairs:
            eq = F.col(l_col) == F.col(r_col)
            cond = eq if cond is None else cond & eq
        joined = left.join(agg, on=cond, how="left").drop(*rkeys)
        # Neo4j: a non-matching row yields [], not null
        dtype = agg.schema[op.out_col].dataType
        return joined.withColumn(
            op.out_col,
            F.coalesce(qcol(op.out_col), F.array().cast(dtype)),
        )

    # -- exists() as a boolean column -----------------------------------------
    def _exists_flag(self, op: ExistsFlagOp) -> DataFrame:
        left = self.compile(op.left)
        right = self.compile(op.right)
        rkeys = [r for _, r in op.pairs]
        if not rkeys:
            # uncorrelated exists in flag position: a broadcast limit-1
            # probe — flag true everywhere iff the subquery is non-empty
            rdf = F.broadcast(
                right.limit(1).select(F.lit(True).alias(op.flag_col))
            )
            return left.join(rdf, on=F.lit(True), how="left")
        # DISTINCT on the shared keys keeps the left row count intact
        # (a matching pattern may bind many ways); the flag is true where
        # the left join hits, null where it misses
        rdf = (
            right.select(*[qcol(c) for c in rkeys])
            .distinct()
            .withColumn(op.flag_col, F.lit(True))
        )
        cond = None
        for l_col, r_col in op.pairs:
            eq = F.col(l_col) == F.col(r_col)
            cond = eq if cond is None else cond & eq
        return left.join(rdf, on=cond, how="left").drop(*rkeys)

    # -- per-group order/limit (correlated CALL subqueries) --------------------
    def _window_limit(self, op: WindowLimitOp) -> DataFrame:
        from pyspark.sql import Window

        df = self.compile(op.input)
        ec = ExprCompiler(op.env, df, self.params)
        sort_cols = []
        for s in op.order_by:
            c = ec.compile(s.expr)
            # openCypher null ordering, same as the global SelectionOp path
            sort_cols.append(
                c.asc_nulls_last() if s.ascending else c.desc_nulls_first()
            )
        if not sort_cols:
            # SKIP/LIMIT without ORDER BY: per-group arbitrary order
            sort_cols = [F.lit(1)]
        w = Window.partitionBy(
            *[qcol(c) for c in op.partition_cols]
        ).orderBy(*sort_cols)
        df = df.withColumn(op.rn_col, F.row_number().over(w))
        rn = qcol(op.rn_col)  # filter on the materialized column — a
        # window expression is not allowed inside a WHERE clause
        lo = op.skip or 0
        cond = rn > F.lit(lo)
        if op.limit is not None:
            cond = cond & (rn <= F.lit(lo + op.limit))
        return df.filter(cond).drop(op.rn_col)

    # -- filter / order / limit -------------------------------------------------
    def _selection(self, op: SelectionOp) -> DataFrame:
        df = self.compile(op.input)
        if op.predicate is not None:
            ec = ExprCompiler(op.env, df, self.params)
            return df.filter(ec.compile(op.predicate))
        ec = ExprCompiler(op.env, df, self.params)
        if op.order_by:
            sort_cols = []
            for s in op.order_by:
                c = ec.compile(s.expr)
                # openCypher null ordering: nulls LAST ascending, FIRST
                # descending (opposite of Spark's default) — also matches
                # the DuckDB oracle's default NULLS LAST for ASC
                sort_cols.append(
                    c.asc_nulls_last() if s.ascending else c.desc_nulls_first()
                )
            df = df.orderBy(*sort_cols)
        if op.skip is not None:
            df = df.offset(op.skip)
        if op.limit is not None:
            df = df.limit(op.limit)
        return df

    # -- projection ---------------------------------------------------------------
    def _project(self, op: ProjectOp) -> DataFrame:
        in_df = self.compile(op.input)
        in_env = op.input.env
        ec = ExprCompiler(in_env, in_df, self.params)
        ec.order_hint = op.order_hint

        def entity_cols(alias: str, expr: A.Expr) -> list:
            """Select list renaming an entity passthrough to its new alias."""
            in_ref = in_env[expr.name]
            out_ref = op.env[alias]
            return [
                F.col(in_ref.col(p)).alias(out_ref.col(p))
                for p in in_ref.property_names
            ]

        def is_entity_item(expr: A.Expr) -> bool:
            return isinstance(expr, A.Variable) and isinstance(
                in_env.get(expr.name), EntityRef
            )

        def is_path_item(expr: A.Expr) -> bool:
            # path variable passthrough: constituent (or materialized)
            # columns keep their physical names — an identity selection
            return isinstance(expr, A.Variable) and isinstance(
                in_env.get(expr.name), (PathRef, MaterializedPathRef)
            )

        if op.has_agg:
            group_cols: list = []
            agg_cols: list = []
            out_cols: list[str] = []
            grouped: set[str] = set()  # output names; a path variable and
            # one of its constituent entities may overlap column-for-column
            for alias, expr in op.items:
                if A.contains_aggregate(expr):
                    agg_cols.append(ec.compile(expr).alias(alias))
                    out_cols.append(alias)
                elif is_entity_item(expr):
                    for c, name in zip(
                        entity_cols(alias, expr), op.env[alias].columns()
                    ):
                        if name not in grouped:
                            group_cols.append(c)
                            out_cols.append(name)
                            grouped.add(name)
                elif is_path_item(expr):
                    for name in in_env[expr.name].columns():
                        if name not in grouped:
                            group_cols.append(qcol(name))
                            out_cols.append(name)
                            grouped.add(name)
                else:
                    group_cols.append(ec.compile(expr).alias(alias))
                    out_cols.append(alias)
                    grouped.add(alias)
            if group_cols:
                df = in_df.groupBy(*group_cols).agg(*agg_cols)
            else:
                df = in_df.agg(*agg_cols)
            df = df.select(*[qcol(c) for c in out_cols])
            if op.distinct:
                df = df.distinct()
            return df

        select_cols: list = []
        seen: set[str] = set()
        for alias, expr in op.items:
            if is_entity_item(expr):
                for c, name in zip(
                    entity_cols(alias, expr), op.env[alias].columns()
                ):
                    if name not in seen:
                        select_cols.append(c)
                        seen.add(name)
            elif is_path_item(expr):
                for c in in_env[expr.name].columns():
                    if c not in seen:
                        select_cols.append(qcol(c))
                        seen.add(c)
            else:
                select_cols.append(ec.compile(expr).alias(alias))
                seen.add(alias)
        if op.carry:
            for alias, ref in op.env.items():
                if alias in op.output_aliases:
                    continue
                for c in ref.columns():
                    if c not in seen:
                        select_cols.append(qcol(c))
                        seen.add(c)
        df = in_df.select(*select_cols)
        if op.distinct:
            df = df.distinct()
        return df

    def _trim(self, op: TrimOp) -> DataFrame:
        df = self.compile(op.input)
        cols: list[str] = []
        for alias in op.aliases:
            for c in op.env[alias].columns():
                if c not in cols:
                    cols.append(c)
        return df.select(*[qcol(c) for c in cols])

    # -- set ------------------------------------------------------------------
    def _set(self, op: SetOp) -> DataFrame:
        left = self.compile(op.left)
        right = self.compile(op.right)
        df = left.unionByName(right)
        if not op.all:
            df = df.distinct()
        return df

    # -- unwind ----------------------------------------------------------------
    def _unwind(self, op: UnwindOp) -> DataFrame:
        if op.input is None:
            one = self.spark.range(1)
            ec = ExprCompiler({}, one, self.params)
            return one.select(F.explode(ec.compile(op.expr)).alias(op.alias))
        df = self.compile(op.input)
        ec = ExprCompiler(op.input.env, df, self.params)
        return df.select("*", F.explode(ec.compile(op.expr)).alias(op.alias))
