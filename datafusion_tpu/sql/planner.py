"""SqlToRel: SQL AST -> LogicalPlan.

Equivalent of /root/reference/datafusion/src/sql/planner.rs (3,723 LoC):
statements (:101-129), queries with CTEs + UNION (:131-206), joins incl.
USING/NATURAL, GROUP BY/HAVING with alias/position resolution, wildcard
expansion, ORDER BY over aliases/positions with hidden-column extension —
plus native subquery planning (scalar / IN / EXISTS with correlated outer
references), which the reference fork lacks; decorrelation happens in
optimizer/decorrelate.py.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional

from ..errors import PlanError, SchemaError
from ..logical.builder import LogicalPlanBuilder
from ..logical.dfschema import DFSchema
from ..logical.expr import (
    AggregateFunction,
    Alias,
    Column,
    Expr,
    Literal,
    OuterColumn,
    SortExpr,
    Wildcard,
    WindowFunction,
    find_aggregate_exprs,
    find_window_exprs,
    transform_expr,
)
from ..logical.plan import (
    Aggregate,
    CreateExternalTable,
    CreateMemoryTable,
    CrossJoin,
    Distinct,
    EmptyRelation,
    Explain,
    Filter,
    Join,
    Limit,
    LogicalPlan,
    Projection,
    Skip,
    Sort,
    SubqueryAlias,
    TableScan,
    Union,
    Window,
)
from ..types import ScalarValue
from . import ast as A
from .parser import parse_sql, parse_sql_type


class ContextProvider:
    """What the planner needs from the session (reference planner.rs:73-82)."""

    def get_table_provider(self, name: str):  # -> TableProvider | None
        raise NotImplementedError

    def get_view(self, name: str):  # -> LogicalPlan | None
        return None

    def get_variable(self, name: str) -> Optional[ScalarValue]:
        return None

    def get_function(self, name: str):  # -> ScalarUDF | None (planner.rs:77)
        return None

    def get_aggregate_function(self, name: str):  # -> AggregateUDF | None
        return None


class SqlToRel:
    def __init__(self, provider: ContextProvider):
        self.provider = provider

    # ==================================================================
    def statement_to_plan(self, stmt) -> LogicalPlan:
        if isinstance(stmt, A.QueryStatement):
            return self.query_to_plan(stmt.query)
        if isinstance(stmt, A.ExplainStmt):
            inner = self.statement_to_plan(stmt.statement)
            return Explain(inner, stmt.verbose, stmt.analyze)
        if isinstance(stmt, A.CreateExternalTableStmt):
            from ..types import Field, Schema

            schema = None
            if stmt.columns:
                schema = Schema(
                    [Field(n, parse_sql_type(t), True) for n, t in stmt.columns]
                )
            return CreateExternalTable(
                stmt.name, stmt.location, stmt.file_type, stmt.has_header, schema
            )
        if isinstance(stmt, A.CreateTableAsStmt):
            return CreateMemoryTable(stmt.name, self.query_to_plan(stmt.query))
        if isinstance(stmt, A.CreateViewStmt):
            plan = self.query_to_plan(stmt.query)
            if stmt.column_aliases:
                exprs = [
                    Alias(Column(f.name, f.qualifier), a)
                    for f, a in zip(plan.schema().fields, stmt.column_aliases)
                ]
                rest = [
                    Column(f.name, f.qualifier)
                    for f in plan.schema().fields[len(stmt.column_aliases):]
                ]
                plan = Projection(exprs + rest, plan)
            from ..logical.plan import Extension

            return _CreateView(stmt.name, plan)
        if isinstance(stmt, (A.DropTableStmt, A.DropViewStmt)):
            return _DropTable(stmt.name, stmt.if_exists, isinstance(stmt, A.DropViewStmt))
        if isinstance(stmt, A.ShowStmt):
            return _ShowVariable(stmt.variable)
        raise PlanError(f"unsupported statement {type(stmt).__name__}")

    # ==================================================================
    def query_to_plan(
        self,
        q: A.Query,
        ctes: dict[str, LogicalPlan] | None = None,
        outer_schemas: list[DFSchema] | None = None,
    ) -> LogicalPlan:
        ctes = dict(ctes or {})
        outer_schemas = outer_schemas or []
        for name, cq in q.ctes:
            ctes[name] = SubqueryAlias(self.query_to_plan(cq, ctes, outer_schemas), name)

        plan, projected_schema_names = self._set_expr_to_plan(
            q.body, ctes, outer_schemas, q.order_by
        )

        # ORDER BY handled inside select planning (needs pre-projection
        # columns); for set ops plan it here
        if q.order_by and isinstance(q.body, (A.SetOp, A.Query)):
            schema = plan.schema()
            sort_exprs = [
                self._resolve_order_expr(s, schema, [], ctes, outer_schemas)
                for s in q.order_by
            ]
            plan = Sort(sort_exprs, plan)

        if q.offset is not None:
            plan = Skip(q.offset, plan)
        if q.limit is not None:
            plan = Limit(q.limit, plan)
        return plan

    def _set_expr_to_plan(self, body, ctes, outer_schemas, order_by):
        if isinstance(body, A.Select):
            return self._select_to_plan(body, ctes, outer_schemas, order_by), None
        if isinstance(body, A.Query):
            return self.query_to_plan(body, ctes, outer_schemas), None
        if isinstance(body, A.SetOp):
            left, _ = self._set_expr_to_plan(body.left, ctes, outer_schemas, [])
            right, _ = self._set_expr_to_plan(body.right, ctes, outer_schemas, [])
            if body.op in ("union", "union_all"):
                inputs = []
                for p in (left, right):
                    if isinstance(p, Union):
                        inputs += p.inputs_
                    else:
                        inputs.append(p)
                plan = Union(inputs)
                if body.op == "union":
                    plan = Distinct(plan)
                return plan, None
            if body.op in ("intersect", "except"):
                # rewrite as semi/anti join on all columns
                lcols = [Column(f.name, f.qualifier) for f in left.schema().fields]
                rcols = [Column(f.name, f.qualifier) for f in right.schema().fields]
                on = list(zip(lcols, rcols))
                jt = "semi" if body.op == "intersect" else "anti"
                return Distinct(Join(left, right, on, jt)), None
            raise PlanError(f"set op {body.op}")
        raise PlanError(f"unsupported query body {type(body).__name__}")

    # ==================================================================
    # SELECT
    # ==================================================================
    def _select_to_plan(
        self, sel: A.Select, ctes, outer_schemas, order_by: list[SortExpr]
    ) -> LogicalPlan:
        # ---- FROM ----------------------------------------------------------
        if sel.from_:
            plan = self._plan_table_ref(sel.from_[0], ctes, outer_schemas)
            for tr in sel.from_[1:]:
                right = self._plan_table_ref(tr, ctes, outer_schemas)
                plan = CrossJoin(plan, right)
        else:
            plan = EmptyRelation(produce_one_row=True, schema_=DFSchema.empty())

        schema = plan.schema()

        # ---- WHERE ----------------------------------------------------------
        if sel.where is not None:
            pred = self._resolve_expr(sel.where, schema, ctes, outer_schemas)
            plan = Filter(pred, plan)

        # ---- projection exprs (wildcards expanded) ---------------------------
        proj_exprs: list[Expr] = []
        for e in sel.projection:
            if isinstance(e, Wildcard):
                for f in schema.fields:
                    if e.qualifier is None or f.qualifier == e.qualifier:
                        proj_exprs.append(Column(f.name, f.qualifier))
            else:
                proj_exprs.append(self._resolve_expr(e, schema, ctes, outer_schemas))

        alias_map = {
            e.name: e.expr for e in proj_exprs if isinstance(e, Alias)
        }

        # ---- HAVING -----------------------------------------------------------
        having = (
            self._resolve_expr(sel.having, schema, ctes, outer_schemas, alias_map)
            if sel.having is not None
            else None
        )

        # ---- ORDER BY (resolve against aliases/positions/input) --------------
        sort_exprs: list[SortExpr] = []
        for s in order_by:
            sort_exprs.append(
                self._resolve_order_expr(s, schema, proj_exprs, ctes, outer_schemas, alias_map)
            )

        # ---- GROUP BY ----------------------------------------------------------
        group_exprs: list[Expr] = []
        for g in sel.group_by:
            ge = self._resolve_group_expr(g, schema, proj_exprs, ctes, outer_schemas, alias_map)
            group_exprs.append(ge)

        # ---- ROLLING_WINDOW (CubeStore extension, sql/planner.rs:695) ------
        if sel.rolling_window is not None:
            plan, proj_exprs, sort_exprs = self._plan_rolling_window(
                sel, plan, schema, proj_exprs, sort_exprs, having, group_exprs,
                ctes, outer_schemas,
            )
            having = None
            group_exprs = []

        # ---- aggregation ---------------------------------------------------------
        all_post = proj_exprs + ([having] if having is not None else []) + [
            s.expr for s in sort_exprs
        ]
        agg_exprs = find_aggregate_exprs(all_post)
        window_exprs = find_window_exprs(proj_exprs)

        if group_exprs or agg_exprs:
            agg_unique = _dedup_by_repr(agg_exprs)
            plan = Aggregate(plan, group_exprs, agg_unique)
            agg_schema = plan.schema()
            mapping = {}
            for ge in group_exprs:
                mapping[repr(ge)] = Column(ge.output_name())
            for ae in agg_unique:
                mapping[repr(ae)] = Column(ae.output_name())
            proj_exprs = [_rewrite_post_agg(e, mapping, agg_schema) for e in proj_exprs]
            if having is not None:
                having = _rewrite_post_agg(having, mapping, agg_schema)
                plan = Filter(having, plan)
            sort_exprs = [
                SortExpr(_rewrite_post_agg(s.expr, mapping, agg_schema), s.ascending, s.nulls_first)
                for s in sort_exprs
            ]
        elif having is not None:
            raise PlanError("HAVING requires GROUP BY or aggregates")

        # ---- window functions -------------------------------------------------
        if window_exprs:
            win_unique = _dedup_by_repr(window_exprs)
            plan = Window(plan, win_unique)
            wschema = plan.schema()
            mapping = {repr(w): Column(w.output_name()) for w in win_unique}
            proj_exprs = [_rewrite_post_agg(e, mapping, wschema) for e in proj_exprs]
            sort_exprs = [
                SortExpr(_rewrite_post_agg(s.expr, mapping, wschema), s.ascending, s.nulls_first)
                for s in sort_exprs
            ]

        # ---- projection + ORDER BY (with hidden sort columns) -------------------
        # DISTINCT applies before ORDER BY (which then may only reference
        # selected columns)
        proj_names = [e.output_name() for e in proj_exprs]
        if sel.distinct:
            plan = Projection(proj_exprs, plan)
            plan = Distinct(plan)
            if sort_exprs:
                rewritten = []
                for s in sort_exprs:
                    matched = None
                    for pe, pname in zip(proj_exprs, proj_names):
                        target = pe.expr if isinstance(pe, Alias) else pe
                        if repr(s.expr) == repr(target) or (
                            isinstance(s.expr, Column) and s.expr.name == pname
                        ):
                            matched = Column(pname)
                            break
                    if matched is None:
                        raise PlanError(
                            "ORDER BY with DISTINCT must reference selected columns"
                        )
                    rewritten.append(SortExpr(matched, s.ascending, s.nulls_first))
                plan = Sort(rewritten, plan)
            return plan
        if sort_exprs:
            # sort exprs that are already projection outputs become column refs
            rewritten_sorts = []
            extra: list[Expr] = []
            for s in sort_exprs:
                matched = None
                for pe, pname in zip(proj_exprs, proj_names):
                    target = pe.expr if isinstance(pe, Alias) else pe
                    if repr(s.expr) == repr(target) or repr(s.expr) == pname or (
                        isinstance(s.expr, Column) and s.expr.name == pname
                    ):
                        matched = Column(pname)
                        break
                if matched is None:
                    extra.append(s.expr)
                    rewritten_sorts.append(s)
                else:
                    rewritten_sorts.append(SortExpr(matched, s.ascending, s.nulls_first))
            if extra:
                plan = Projection(proj_exprs + extra, plan)
                plan = Sort(rewritten_sorts, plan)
                plan = Projection(
                    [Column(n) for n in proj_names], plan
                )
            else:
                plan = Projection(proj_exprs, plan)
                plan = Sort(rewritten_sorts, plan)
        else:
            plan = Projection(proj_exprs, plan)
        return plan

    # ==================================================================
    # FROM refs
    # ==================================================================
    def _plan_table_ref(self, tr, ctes, outer_schemas) -> LogicalPlan:
        if isinstance(tr, A.TableName):
            base = None
            if tr.name in ctes:
                base = ctes[tr.name]
            else:
                view = self.provider.get_view(tr.name)
                if view is not None:
                    base = SubqueryAlias(view, tr.alias or tr.name)
                    return base
                provider = self.provider.get_table_provider(tr.name)
                if provider is None:
                    raise PlanError(f"table '{tr.name}' not found")
                base = TableScan(tr.alias or tr.name, provider)
                return base
            if tr.alias:
                base = SubqueryAlias(base, tr.alias)
            return base
        if isinstance(tr, A.DerivedTable):
            sub = self.query_to_plan(tr.query, ctes, outer_schemas)
            if tr.column_aliases:
                fields = sub.schema().fields
                exprs = []
                for i, f in enumerate(fields):
                    if i < len(tr.column_aliases):
                        exprs.append(Alias(Column(f.name, f.qualifier), tr.column_aliases[i]))
                    else:
                        exprs.append(Column(f.name, f.qualifier))
                sub = Projection(exprs, sub)
            return SubqueryAlias(sub, tr.alias)
        if isinstance(tr, A.JoinClause):
            left = self._plan_table_ref(tr.left, ctes, outer_schemas)
            right = self._plan_table_ref(tr.right, ctes, outer_schemas)
            if tr.join_type == "cross":
                return CrossJoin(left, right)
            lschema = left.schema()
            rschema = right.schema()
            joined = lschema.join(rschema)
            if tr.natural:
                common = [
                    n for n in lschema.field_names() if n in set(rschema.field_names())
                ]
                on = [
                    (self._qualify(n, lschema), self._qualify(n, rschema))
                    for n in common
                ]
                return Join(left, right, on, tr.join_type)
            if tr.using:
                on = [
                    (self._qualify(n, lschema), self._qualify(n, rschema))
                    for n in tr.using
                ]
                return Join(left, right, on, tr.join_type)
            cond = self._resolve_expr(tr.on, joined, ctes, outer_schemas)
            on, residual = _extract_equijoin(cond, lschema, rschema)
            if not on:
                # no equi conditions: cross join + filter
                plan = CrossJoin(left, right)
                if tr.join_type != "inner":
                    return Join(left, right, [], tr.join_type, cond)
                return Filter(cond, plan) if cond is not None else plan
            return Join(left, right, on, tr.join_type, residual)
        raise PlanError(f"unsupported table ref {type(tr).__name__}")

    def _qualify(self, name: str, schema: DFSchema) -> Column:
        f = schema.field_from_column(name)
        return Column(f.name, f.qualifier)

    # ==================================================================
    # expression resolution
    # ==================================================================
    def _plan_rolling_window(
        self, sel, plan, schema, proj_exprs, sort_exprs, having, group_exprs,
        ctes, outer_schemas,
    ):
        """Build the RollingWindowAggregate extension node and rebase the
        select list onto its outputs (sql/planner.rs:695-780)."""
        from ..logical.expr import find_rolling_aggregate_exprs
        from ..logical.plan import Extension
        from ..logical.rolling import RollingWindowAggregate

        if group_exprs:
            raise PlanError(
                "GROUP BY and ROLLING_WINDOW are not allowed in the same query"
            )
        rw = sel.rolling_window
        rolling_aggs = find_rolling_aggregate_exprs(
            proj_exprs + [s.expr for s in sort_exprs]
        )
        if not rolling_aggs:
            raise PlanError("ROLLING_WINDOW without ROLLING() aggregates")

        def as_column(e, kind):
            r = self._resolve_expr(e, schema, ctes, outer_schemas)
            if not isinstance(r, Column):
                raise PlanError(f"{kind} '{e!r}' is not a column")
            return r

        dim = as_column(rw.dimension, "DIMENSION inside rolling window")
        pby = [
            as_column(p, "PARTITION BY item inside rolling window")
            for p in rw.partition_by
        ]
        frm = self._resolve_expr(rw.from_, schema, ctes, outer_schemas)
        to = self._resolve_expr(rw.to, schema, ctes, outer_schemas)
        every = self._resolve_expr(rw.every, schema, ctes, outer_schemas)
        gbd = (
            self._resolve_expr(rw.group_by_dimension, schema, ctes, outer_schemas)
            if rw.group_by_dimension is not None
            else None
        )
        plain_aggs = find_aggregate_exprs(proj_exprs + [s.expr for s in sort_exprs])
        if gbd is not None and not plain_aggs:
            raise PlanError(
                "GROUP BY DIMENSION without aggregate functions inside ROLLING_WINDOW"
            )
        if plain_aggs and gbd is None:
            raise PlanError(
                "Use of aggregate functions in ROLLING_WINDOW requires GROUP BY DIMENSION"
            )
        node = RollingWindowAggregate(
            plan,
            dim,
            frm,
            to,
            every,
            pby,
            _dedup_by_repr(rolling_aggs),
            gbd,
            _dedup_by_repr(plain_aggs),
        )
        plan = Extension(node)
        ext_schema = plan.schema()
        mapping = {}
        for r in node.rolling_aggs:
            mapping[repr(r)] = Column(r.output_name())
        for a in node.aggs:
            mapping[repr(a)] = Column(a.output_name())
        proj_exprs = [_rewrite_post_agg(e, mapping, ext_schema) for e in proj_exprs]
        sort_exprs = [
            SortExpr(
                _rewrite_post_agg(s.expr, mapping, ext_schema), s.ascending, s.nulls_first
            )
            for s in sort_exprs
        ]
        return plan, proj_exprs, sort_exprs

    def _resolve_expr(
        self, e: Expr, schema: DFSchema, ctes, outer_schemas, alias_map=None
    ) -> Expr:
        """Resolve column refs (qualifying them), plan subqueries, resolve
        outer references."""

        def fix(node: Expr) -> Expr:
            from ..logical.expr import (
                AggregateUDFExpr,
                Exists,
                InSubquery,
                ScalarFunction as _SF,
                ScalarSubquery,
                ScalarUDFExpr,
            )

            # resolve UDF/UDAF names against the session registry
            # (sql/planner.rs sql_fn_name_to_expr -> Expr::ScalarUDF)
            if isinstance(node, _SF):
                udaf = self.provider.get_aggregate_function(node.name)
                if udaf is not None:
                    return AggregateUDFExpr(node.name, node.args, False, udaf)
                udf = self.provider.get_function(node.name)
                if udf is not None:
                    return ScalarUDFExpr(udf, node.args)
            if isinstance(node, Column) and node.name.startswith("@"):
                # @var / @@sysvar -> VarProvider lookup (variable/mod.rs:33)
                v = self.provider.get_variable(node.name)
                if v is None:
                    raise PlanError(f"variable '{node.name}' is not defined")
                from ..logical.expr import Literal as _Lit

                return _Lit(v)
            if isinstance(node, Column) and not node.name.startswith("@"):
                try:
                    f = schema.field_from_column(node.name, node.relation)
                    return Column(f.name, f.qualifier)
                except SchemaError:
                    if alias_map and node.relation is None and node.name in alias_map:
                        return alias_map[node.name]
                    for outer in outer_schemas:
                        try:
                            f = outer.field_from_column(node.name, node.relation)
                            return OuterColumn(f.name, f.qualifier, f.dtype)
                        except SchemaError:
                            continue
                    raise
            if isinstance(node, ScalarSubquery) and isinstance(node.subquery, A.Query):
                sub = self.query_to_plan(
                    node.subquery, ctes, [schema] + outer_schemas
                )
                return ScalarSubquery(sub)
            if isinstance(node, InSubquery) and isinstance(node.subquery, A.Query):
                sub = self.query_to_plan(
                    node.subquery, ctes, [schema] + outer_schemas
                )
                return InSubquery(node.expr, sub, node.negated)
            if isinstance(node, Exists) and isinstance(node.subquery, A.Query):
                sub = self.query_to_plan(
                    node.subquery, ctes, [schema] + outer_schemas
                )
                return Exists(sub, node.negated)
            return node

        return transform_expr(e, fix)

    def _resolve_group_expr(self, g, schema, proj_exprs, ctes, outer_schemas, alias_map):
        if isinstance(g, Literal) and g.value.dtype.is_integer:
            pos = int(g.value.value)
            if not (1 <= pos <= len(proj_exprs)):
                raise PlanError(f"GROUP BY position {pos} out of range")
            e = proj_exprs[pos - 1]
            return e.expr if isinstance(e, Alias) else e
        # try direct resolution; fall back to select alias
        try:
            return self._resolve_expr(g, schema, ctes, outer_schemas)
        except SchemaError:
            if isinstance(g, Column) and alias_map and g.name in alias_map:
                return alias_map[g.name]
            raise

    def _resolve_order_expr(self, s: SortExpr, schema, proj_exprs, ctes, outer_schemas, alias_map=None):
        e = s.expr
        if isinstance(e, Literal) and e.value.dtype.is_integer and proj_exprs:
            pos = int(e.value.value)
            if not (1 <= pos <= len(proj_exprs)):
                raise PlanError(f"ORDER BY position {pos} out of range")
            pe = proj_exprs[pos - 1]
            name = pe.output_name()
            return SortExpr(Column(name), s.ascending, s.nulls_first)
        if isinstance(e, Column) and alias_map and e.relation is None and e.name in alias_map:
            return SortExpr(alias_map[e.name], s.ascending, s.nulls_first)
        return SortExpr(
            self._resolve_expr(e, schema, ctes, outer_schemas, alias_map),
            s.ascending,
            s.nulls_first,
        )


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _dedup_by_repr(exprs: list[Expr]) -> list[Expr]:
    seen = {}
    for e in exprs:
        seen.setdefault(repr(e), e)
    return list(seen.values())


def _rewrite_post_agg(e: Expr, mapping: dict[str, Expr], agg_schema: DFSchema) -> Expr:
    """Replace group/aggregate subtrees with references to the aggregate's
    output columns (sql/utils.rs rebase_expr equivalent)."""

    def fix(node: Expr) -> Expr:
        r = repr(node)
        if r in mapping:
            return mapping[r]
        return node

    # top-down replacement: check the node itself before its children
    def walk(node: Expr) -> Expr:
        r = repr(node)
        if r in mapping:
            return mapping[r]
        kids = node.children()
        if kids:
            node = node.with_children([walk(k) for k in kids])
        return node

    return walk(e)


def _extract_equijoin(cond: Expr, lschema: DFSchema, rschema: DFSchema):
    """Split an ON condition into equi-join pairs + residual filter
    (planner.rs extract_join_keys equivalent)."""
    from ..logical.expr import BinaryExpr

    conjuncts = _split_conjunction(cond)
    on: list[tuple[Column, Column]] = []
    residual: list[Expr] = []
    lnames = {(f.qualifier, f.name) for f in lschema.fields}
    rnames = {(f.qualifier, f.name) for f in rschema.fields}
    for c in conjuncts:
        if (
            isinstance(c, BinaryExpr)
            and c.op == "="
            and isinstance(c.left, Column)
            and isinstance(c.right, Column)
        ):
            lk = (c.left.relation, c.left.name)
            rk = (c.right.relation, c.right.name)
            if lk in lnames and rk in rnames:
                on.append((c.left, c.right))
                continue
            if lk in rnames and rk in lnames:
                on.append((c.right, c.left))
                continue
        residual.append(c)
    res = _conjunction(residual)
    return on, res


def _split_conjunction(e: Expr) -> list[Expr]:
    from ..logical.expr import BinaryExpr

    if isinstance(e, BinaryExpr) and e.op == "and":
        return _split_conjunction(e.left) + _split_conjunction(e.right)
    return [e]


def _conjunction(exprs: list[Expr]) -> Optional[Expr]:
    from ..logical.expr import BinaryExpr

    if not exprs:
        return None
    out = exprs[0]
    for e in exprs[1:]:
        out = BinaryExpr(out, "and", e)
    return out


# ---- DDL helper plans (consumed by ExecutionContext) -------------------------


class _CreateView(LogicalPlan):
    def __init__(self, name: str, plan: LogicalPlan):
        self.name = name
        self.plan = plan

    def schema(self):
        return DFSchema.empty()

    def inputs(self):
        return [self.plan]

    def _display_line(self):
        return f"CreateView: {self.name}"


class _DropTable(LogicalPlan):
    def __init__(self, name: str, if_exists: bool, is_view: bool):
        self.name = name
        self.if_exists = if_exists
        self.is_view = is_view

    def schema(self):
        return DFSchema.empty()

    def _display_line(self):
        return f"DropTable: {self.name}"


class _ShowVariable(LogicalPlan):
    def __init__(self, variable: str):
        self.variable = variable

    def schema(self):
        from ..logical.dfschema import DFField
        from ..types.dtypes import STRING

        return DFSchema([DFField("name", STRING, False), DFField("setting", STRING, False)])

    def _display_line(self):
        return f"ShowVariable: {self.variable}"
