"""Recursive-descent SQL parser.

Replaces sqlparser-rs + DFParser (/root/reference/datafusion/src/sql/
parser.rs:91,275).  Covers the engine's SQL surface: SELECT with CTEs,
joins (INNER/LEFT/RIGHT/FULL/CROSS, ON/USING/NATURAL), GROUP BY/HAVING,
ORDER BY/LIMIT/OFFSET, UNION [ALL], subqueries (FROM-derived, scalar, IN,
EXISTS), CASE, CAST/TRY_CAST, EXTRACT, BETWEEN, [NOT] IN, [NOT] LIKE,
IS [NOT] NULL, INTERVAL/DATE/TIMESTAMP literals, CREATE EXTERNAL TABLE
(STORED AS CSV|PARQUET|NDJSON LOCATION), CREATE TABLE AS, DROP TABLE,
EXPLAIN [VERBOSE|ANALYZE], SHOW.
"""

from __future__ import annotations

import datetime as _dt

from ..errors import ParserError
from ..functions.aggregates import is_aggregate_function
from ..functions.windows import is_window_function
from ..logical.expr import (
    AggregateFunction,
    Alias,
    Between,
    BinaryExpr,
    Case,
    Cast,
    Column,
    Exists,
    Expr,
    InList,
    InSubquery,
    IsNotNull,
    IsNull,
    Literal,
    Negative,
    Not,
    ScalarFunction,
    ScalarSubquery,
    SortExpr,
    Wildcard,
    WindowFrame,
    WindowFrameBound,
    WindowFunction,
)
from ..types import ScalarValue
from ..types.dtypes import (
    BOOL,
    DATE32,
    FLOAT32,
    FLOAT64,
    INT16,
    INT32,
    INT64,
    INT8,
    INTERVAL_DT,
    INTERVAL_YM,
    STRING,
    TIMESTAMP_US,
    DataType,
    decimal,
)
from . import ast as A
from .lexer import Token, tokenize

_RESERVED_STOP = {
    "from",
    "where",
    "group",
    "having",
    "order",
    "limit",
    "offset",
    "union",
    "intersect",
    "except",
    "on",
    "using",
    "inner",
    "left",
    "right",
    "full",
    "cross",
    "join",
    "natural",
    "as",
    "when",
    "then",
    "else",
    "end",
    "and",
    "or",
    "not",
    "asc",
    "desc",
    "nulls",
    "by",
    "with",
    "select",
    "set",
    "rolling_window",
}


class Parser:
    def __init__(self, sql: str):
        self.tokens = tokenize(sql)
        self.i = 0

    # ---- token helpers -------------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.tokens[min(self.i + k, len(self.tokens) - 1)]

    def next(self) -> Token:
        t = self.tokens[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "ident" and t.value in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def expect_kw(self, kw: str):
        if not self.eat_kw(kw):
            raise ParserError(f"expected {kw.upper()}, found {self.peek().value!r}")

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.value in ops

    def eat_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.next()
            return True
        return False

    def expect_op(self, op: str):
        if not self.eat_op(op):
            raise ParserError(f"expected '{op}', found {self.peek().value!r}")

    # ======================================================================
    # statements
    # ======================================================================
    def parse_statements(self) -> list:
        out = []
        while self.peek().kind != "eof":
            out.append(self.parse_statement())
            while self.eat_op(";"):
                pass
        return out

    def parse_statement(self):
        if self.at_kw("explain"):
            self.next()
            verbose = self.eat_kw("verbose")
            analyze = self.eat_kw("analyze")
            return A.ExplainStmt(self.parse_statement(), verbose, analyze)
        if self.at_kw("create"):
            return self._parse_create()
        if self.at_kw("drop"):
            self.next()
            is_view = self.eat_kw("view")
            if not is_view:
                self.expect_kw("table")
            if_exists = False
            if self.eat_kw("if"):
                self.expect_kw("exists")
                if_exists = True
            name = self._parse_object_name()
            if is_view:
                return A.DropViewStmt(name, if_exists)
            return A.DropTableStmt(name, if_exists)
        if self.at_kw("show"):
            self.next()
            parts = [self.next().value]
            while self.eat_op("."):
                parts.append(self.next().value)
            return A.ShowStmt(".".join(parts))
        return A.QueryStatement(self.parse_query())

    def _parse_create(self):
        self.expect_kw("create")
        if self.eat_kw("external"):
            self.expect_kw("table")
            name = self._parse_object_name()
            columns = []
            if self.eat_op("("):
                while True:
                    cname = self._parse_ident()
                    ctype = self._parse_type_name()
                    columns.append((cname, ctype))
                    if not self.eat_op(","):
                        break
                self.expect_op(")")
            self.expect_kw("stored")
            self.expect_kw("as")
            ftype = self.next().value.upper()
            has_header = False
            if self.eat_kw("with"):
                self.expect_kw("header")
                self.expect_kw("row")
                has_header = True
            self.expect_kw("location")
            loc = self.next()
            if loc.kind != "string":
                raise ParserError("expected string literal after LOCATION")
            return A.CreateExternalTableStmt(name, columns, ftype, loc.value, has_header)
        if self.eat_kw("view"):
            name = self._parse_object_name()
            col_aliases = []
            if self.eat_op("("):
                while True:
                    col_aliases.append(self._parse_ident())
                    if not self.eat_op(","):
                        break
                self.expect_op(")")
            self.expect_kw("as")
            return A.CreateViewStmt(name, self.parse_query(), col_aliases)
        self.expect_kw("table")
        name = self._parse_object_name()
        self.expect_kw("as")
        return A.CreateTableAsStmt(name, self.parse_query())

    def _parse_object_name(self) -> str:
        parts = [self._parse_ident()]
        while self.eat_op("."):
            parts.append(self._parse_ident())
        return ".".join(parts)

    def _parse_ident(self) -> str:
        t = self.peek()
        if t.kind in ("ident", "quoted_ident"):
            self.next()
            return t.value
        raise ParserError(f"expected identifier, found {t.value!r}")

    def _parse_type_name(self) -> str:
        parts = [self._parse_ident()]
        while self.at_kw("precision", "varying", "unsigned"):
            parts.append(self._parse_ident())
        if self.eat_op("("):
            args = [self.next().value]
            while self.eat_op(","):
                args.append(self.next().value)
            self.expect_op(")")
            parts.append("(" + ",".join(args) + ")")
        return " ".join(parts)

    # ======================================================================
    # queries
    # ======================================================================
    def parse_query(self) -> A.Query:
        ctes: list[tuple[str, A.Query]] = []
        if self.eat_kw("with"):
            while True:
                name = self._parse_ident()
                self.expect_kw("as")
                self.expect_op("(")
                q = self.parse_query()
                self.expect_op(")")
                ctes.append((name, q))
                if not self.eat_op(","):
                    break
        body = self._parse_set_expr()
        order_by: list[SortExpr] = []
        if self.eat_kw("order"):
            self.expect_kw("by")
            order_by = self._parse_order_by_list()
        limit = None
        offset = None
        # LIMIT and OFFSET in either order (postgres allows both orders)
        for _ in range(2):
            if self.eat_kw("limit"):
                t = self.next()
                limit = int(t.value)
            elif self.eat_kw("offset"):
                t = self.next()
                offset = int(t.value)
                self.eat_kw("rows", "row")
        return A.Query(body, ctes, order_by, limit, offset)

    def _parse_order_by_list(self) -> list[SortExpr]:
        out = []
        while True:
            e = self.parse_expr()
            asc = True
            if self.eat_kw("desc"):
                asc = False
            else:
                self.eat_kw("asc")
            nulls_first = not asc
            if self.eat_kw("nulls"):
                if self.eat_kw("first"):
                    nulls_first = True
                else:
                    self.expect_kw("last")
                    nulls_first = False
            out.append(SortExpr(e, asc, nulls_first))
            if not self.eat_op(","):
                break
        return out

    def _parse_set_expr(self):
        left = self._parse_set_primary()
        while self.at_kw("union", "intersect", "except"):
            op = self.next().value
            all_ = self.eat_kw("all")
            self.eat_kw("distinct")
            right = self._parse_set_primary()
            name = op + ("_all" if all_ else "")
            left = A.SetOp(name, left, right)
        return left

    def _parse_set_primary(self):
        if self.eat_op("("):
            q = self.parse_query()
            self.expect_op(")")
            return q
        return self._parse_select()

    def _parse_select(self) -> A.Select:
        self.expect_kw("select")
        distinct = self.eat_kw("distinct")
        self.eat_kw("all")
        projection = []
        while True:
            projection.append(self._parse_select_item())
            if not self.eat_op(","):
                break
        from_ = []
        if self.eat_kw("from"):
            while True:
                from_.append(self._parse_table_ref())
                if not self.eat_op(","):
                    break
        where = None
        if self.eat_kw("where"):
            where = self.parse_expr()
        rolling = None
        if self.eat_kw("rolling_window"):
            rolling = self._parse_rolling_window_spec()
        group_by = []
        if self.eat_kw("group"):
            self.expect_kw("by")
            while True:
                group_by.append(self.parse_expr())
                if not self.eat_op(","):
                    break
        having = None
        if self.eat_kw("having"):
            having = self.parse_expr()
        return A.Select(projection, from_, where, group_by, having, distinct, rolling)

    def _parse_rolling_window_spec(self) -> "A.RollingWindowSpec":
        """ROLLING_WINDOW(DIMENSION d, [PARTITION BY c...,] FROM x TO y
        EVERY z [, GROUP BY DIMENSION expr]) — CubeStore extension
        (reference sql/planner.rs:695)."""
        self.expect_op("(")
        self.expect_kw("dimension")
        dim = self.parse_expr()
        self.expect_op(",")
        partition_by = []
        if self.eat_kw("partition"):
            self.expect_kw("by")
            while True:
                partition_by.append(self.parse_expr())
                if self.eat_op(","):
                    if self.at_kw("from"):
                        break
                    continue
                break
        self.expect_kw("from")
        frm = self.parse_expr()
        self.expect_kw("to")
        to = self.parse_expr()
        self.expect_kw("every")
        every = self.parse_expr()
        gbd = None
        if self.eat_op(","):
            self.expect_kw("group")
            self.expect_kw("by")
            self.expect_kw("dimension")
            gbd = self.parse_expr()
        self.expect_op(")")
        return A.RollingWindowSpec(dim, partition_by, frm, to, every, gbd)

    def _parse_select_item(self) -> Expr:
        if self.at_op("*"):
            self.next()
            return Wildcard()
        # qualified wildcard t.*
        if (
            self.peek().kind in ("ident", "quoted_ident")
            and self.peek(1).kind == "op"
            and self.peek(1).value == "."
            and self.peek(2).kind == "op"
            and self.peek(2).value == "*"
            and self.peek().value not in _RESERVED_STOP
        ):
            q = self.next().value
            self.next()
            self.next()
            return Wildcard(q)
        e = self.parse_expr()
        if self.eat_kw("as"):
            return Alias(e, self._parse_ident())
        t = self.peek()
        if t.kind in ("ident", "quoted_ident") and (
            t.kind == "quoted_ident" or t.value not in _RESERVED_STOP
        ):
            self.next()
            return Alias(e, t.value)
        return e

    # ---- FROM ---------------------------------------------------------------
    def _parse_table_ref(self):
        left = self._parse_table_factor()
        while True:
            natural = False
            if self.at_kw("natural"):
                self.next()
                natural = True
            if self.at_kw("cross"):
                self.next()
                self.expect_kw("join")
                right = self._parse_table_factor()
                left = A.JoinClause(left, right, "cross")
                continue
            jt = None
            if self.at_kw("inner"):
                self.next()
                jt = "inner"
            elif self.at_kw("left"):
                self.next()
                self.eat_kw("outer")
                jt = "left"
            elif self.at_kw("right"):
                self.next()
                self.eat_kw("outer")
                jt = "right"
            elif self.at_kw("full"):
                self.next()
                self.eat_kw("outer")
                jt = "full"
            if jt is None and self.at_kw("join"):
                jt = "inner"
            if jt is None:
                if natural:
                    raise ParserError("NATURAL must be followed by a join")
                return left
            self.expect_kw("join")
            right = self._parse_table_factor()
            on = None
            using: list[str] = []
            if not natural:
                if self.eat_kw("on"):
                    on = self.parse_expr()
                elif self.eat_kw("using"):
                    self.expect_op("(")
                    while True:
                        using.append(self._parse_ident())
                        if not self.eat_op(","):
                            break
                    self.expect_op(")")
            left = A.JoinClause(left, right, jt, on, using, natural)

    def _parse_table_factor(self):
        if self.eat_op("("):
            # subquery or parenthesized join
            if self.at_kw("select", "with") or self.at_op("("):
                q = self.parse_query()
                self.expect_op(")")
                alias = self._parse_table_alias()
                if alias is None:
                    alias = f"__subquery_{id(q) % 10000}"
                col_aliases = []
                if self.eat_op("("):
                    while True:
                        col_aliases.append(self._parse_ident())
                        if not self.eat_op(","):
                            break
                    self.expect_op(")")
                return A.DerivedTable(q, alias, col_aliases)
            ref = self._parse_table_ref()
            self.expect_op(")")
            return ref
        name = self._parse_object_name()
        alias = self._parse_table_alias()
        return A.TableName(name, alias)

    def _parse_table_alias(self):
        if self.eat_kw("as"):
            return self._parse_ident()
        t = self.peek()
        if t.kind == "quoted_ident" or (
            t.kind == "ident" and t.value not in _RESERVED_STOP
        ):
            self.next()
            return t.value
        return None

    # ======================================================================
    # expressions (precedence climbing)
    # ======================================================================
    def parse_expr(self) -> Expr:
        return self._parse_or()

    def _parse_or(self) -> Expr:
        left = self._parse_and()
        while self.eat_kw("or"):
            left = BinaryExpr(left, "or", self._parse_and())
        return left

    def _parse_and(self) -> Expr:
        left = self._parse_not()
        while self.eat_kw("and"):
            left = BinaryExpr(left, "and", self._parse_not())
        return left

    def _parse_not(self) -> Expr:
        if self.eat_kw("not"):
            return Not(self._parse_not())
        return self._parse_comparison()

    def _parse_comparison(self) -> Expr:
        left = self._parse_additive()
        while True:
            if self.at_op("=", "!=", "<>", "<", "<=", ">", ">="):
                op = self.next().value
                if op == "<>":
                    op = "!="
                right = self._parse_additive()
                left = BinaryExpr(left, op, right)
                continue
            negated = False
            save = self.i
            if self.eat_kw("not"):
                negated = True
            if self.eat_kw("between"):
                low = self._parse_additive()
                self.expect_kw("and")
                high = self._parse_additive()
                left = Between(left, negated, low, high)
                continue
            if self.eat_kw("like"):
                right = self._parse_additive()
                left = BinaryExpr(left, "not like" if negated else "like", right)
                continue
            if self.eat_kw("in"):
                self.expect_op("(")
                if self.at_kw("select", "with"):
                    q = self.parse_query()
                    self.expect_op(")")
                    left = InSubquery(left, q, negated)
                else:
                    items = [self.parse_expr()]
                    while self.eat_op(","):
                        items.append(self.parse_expr())
                    self.expect_op(")")
                    left = InList(left, items, negated)
                continue
            if negated:
                self.i = save  # NOT belongs to something else
                break
            if self.eat_kw("is"):
                neg = self.eat_kw("not")
                if self.eat_kw("null"):
                    left = IsNotNull(left) if neg else IsNull(left)
                elif self.eat_kw("true"):
                    e = BinaryExpr(left, "=", Literal(ScalarValue.boolean(True)))
                    left = Not(e) if neg else e
                elif self.eat_kw("false"):
                    e = BinaryExpr(left, "=", Literal(ScalarValue.boolean(False)))
                    left = Not(e) if neg else e
                else:
                    raise ParserError("expected NULL/TRUE/FALSE after IS")
                continue
            break
        return left

    def _parse_additive(self) -> Expr:
        left = self._parse_multiplicative()
        while True:
            if self.at_op("+", "-"):
                op = self.next().value
                left = BinaryExpr(left, op, self._parse_multiplicative())
            elif self.at_op("||"):
                self.next()
                right = self._parse_multiplicative()
                left = ScalarFunction("concat", [left, right])
            else:
                return left

    def _parse_multiplicative(self) -> Expr:
        left = self._parse_unary()
        while self.at_op("*", "/", "%"):
            op = self.next().value
            left = BinaryExpr(left, op, self._parse_unary())
        return left

    def _parse_unary(self) -> Expr:
        if self.eat_op("-"):
            e = self._parse_unary()
            if isinstance(e, Literal) and e.value.dtype.is_numeric:
                return Literal(ScalarValue(e.value.dtype, -e.value.value))
            return Negative(e)
        if self.eat_op("+"):
            return self._parse_unary()
        return self._parse_postfix()

    def _parse_postfix(self) -> Expr:
        e = self._parse_primary()
        while self.eat_op("::"):
            tname = self._parse_type_name()
            e = Cast(e, parse_sql_type(tname))
        return e

    # ---- primary --------------------------------------------------------------
    def _parse_primary(self) -> Expr:
        t = self.peek()

        if t.kind == "number":
            self.next()
            if "." in t.value or "e" in t.value.lower():
                # decimal literal with explicit scale (matches sqlparser
                # number handling + DataFusion float64 literal); keep float64
                return Literal(ScalarValue.float64(float(t.value)))
            v = int(t.value)
            return Literal(ScalarValue.int64(v))
        if t.kind == "string":
            self.next()
            return Literal(ScalarValue.utf8(t.value))
        if t.kind == "op" and t.value == "(":
            self.next()
            if self.at_kw("select", "with"):
                q = self.parse_query()
                self.expect_op(")")
                return ScalarSubquery(q)
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == "op" and t.value == "@":
            self.next()
            prefix = "@"
            # @@sysvar (ShowVariable system variables, variable/mod.rs:33)
            if self.peek().kind == "op" and self.peek().value == "@":
                self.next()
                prefix = "@@"
            name = prefix + self._parse_ident()
            return Column(name)

        if t.kind not in ("ident", "quoted_ident"):
            raise ParserError(f"unexpected token {t.value!r} in expression")

        kw = t.value if t.kind == "ident" else None

        # keyword-literals / special forms
        if kw == "null":
            self.next()
            return Literal(ScalarValue.null())
        if kw == "true":
            self.next()
            return Literal(ScalarValue.boolean(True))
        if kw == "false":
            self.next()
            return Literal(ScalarValue.boolean(False))
        if kw == "case":
            return self._parse_case()
        if kw in ("cast", "try_cast"):
            self.next()
            self.expect_op("(")
            e = self.parse_expr()
            self.expect_kw("as")
            tname = self._parse_type_name()
            self.expect_op(")")
            return Cast(e, parse_sql_type(tname), safe=(kw == "try_cast"))
        if kw == "extract":
            self.next()
            self.expect_op("(")
            part = self._parse_ident()
            self.expect_kw("from")
            e = self.parse_expr()
            self.expect_op(")")
            return ScalarFunction(
                "date_part", [Literal(ScalarValue.utf8(part)), e]
            )
        if kw == "substring":
            # SUBSTRING(x FROM a [FOR b]) or SUBSTRING(x, a, b)
            self.next()
            self.expect_op("(")
            e = self.parse_expr()
            args = [e]
            if self.eat_kw("from"):
                args.append(self.parse_expr())
                if self.eat_kw("for"):
                    args.append(self.parse_expr())
            else:
                while self.eat_op(","):
                    args.append(self.parse_expr())
            self.expect_op(")")
            return ScalarFunction("substr", args)
        if kw == "rolling":
            # ROLLING(agg [RANGE bound]) — CubeStore rolling aggregate
            self.next()
            self.expect_op("(")
            inner = self.parse_expr()
            if not isinstance(inner, AggregateFunction):
                raise ParserError("ROLLING() requires an aggregate function")
            start = WindowFrameBound("preceding", None)
            end = WindowFrameBound("current")
            if self.at_kw("range", "rows"):
                frame = self._parse_window_frame()
                start, end = frame.start, frame.end
            self.expect_op(")")
            from ..logical.expr import RollingAggregate

            return RollingAggregate(inner, start, end)
        if kw == "exists":
            self.next()
            self.expect_op("(")
            q = self.parse_query()
            self.expect_op(")")
            return Exists(q)
        if kw == "interval":
            self.next()
            return self._parse_interval()
        if kw == "date":
            nt = self.peek(1)
            if nt.kind == "string":
                self.next()
                self.next()
                d = _dt.date.fromisoformat(nt.value)
                return Literal(ScalarValue.date32(d))
        if kw in ("timestamp", "datetime"):
            nt = self.peek(1)
            if nt.kind == "string":
                self.next()
                self.next()
                s = nt.value.replace(" ", "T")
                ts = _dt.datetime.fromisoformat(s)
                if ts.tzinfo is None:
                    ts = ts.replace(tzinfo=_dt.timezone.utc)
                return Literal(ScalarValue.timestamp_us(ts))

        # identifier: function call or (qualified) column
        name = self._parse_ident()
        if self.at_op("(") :
            return self._parse_function(name)
        parts = [name]
        while (
            self.at_op(".")
            and self.peek(1).kind in ("ident", "quoted_ident")
        ):
            self.next()
            parts.append(self._parse_ident())
        if len(parts) == 1:
            return Column(parts[0])
        return Column(parts[-1], ".".join(parts[:-1]))

    def _parse_case(self) -> Expr:
        self.expect_kw("case")
        base = None
        if not self.at_kw("when"):
            base = self.parse_expr()
        when_then = []
        while self.eat_kw("when"):
            w = self.parse_expr()
            self.expect_kw("then")
            th = self.parse_expr()
            when_then.append((w, th))
        else_expr = None
        if self.eat_kw("else"):
            else_expr = self.parse_expr()
        self.expect_kw("end")
        return Case(base, when_then, else_expr)

    def _parse_interval(self) -> Expr:
        t = self.next()
        if t.kind == "string":
            body = t.value.strip()
        elif t.kind == "number":
            body = t.value
        else:
            raise ParserError("expected INTERVAL literal")
        unit = None
        nt = self.peek()
        if nt.kind == "ident" and nt.value in (
            "year", "years", "month", "months", "day", "days",
            "hour", "hours", "minute", "minutes", "second", "seconds", "week", "weeks",
        ):
            unit = self.next().value
        if unit is None:
            parts = body.split()
            if len(parts) == 2:
                body, unit = parts
            else:
                raise ParserError(f"cannot parse INTERVAL '{body}'")
        qty = float(body)
        unit = unit.rstrip("s")
        if unit in ("year",):
            return Literal(ScalarValue(INTERVAL_YM, int(qty * 12)))
        if unit in ("month",):
            return Literal(ScalarValue(INTERVAL_YM, int(qty)))
        ms = {
            "week": 7 * 86_400_000,
            "day": 86_400_000,
            "hour": 3_600_000,
            "minute": 60_000,
            "second": 1000,
        }[unit]
        return Literal(ScalarValue(INTERVAL_DT, int(qty * ms)))

    def _parse_function(self, name: str) -> Expr:
        self.expect_op("(")
        distinct = False
        args: list[Expr] = []
        star = False
        if self.at_op("*"):
            self.next()
            star = True
        elif not self.at_op(")"):
            distinct = self.eat_kw("distinct")
            args.append(self.parse_expr())
            while self.eat_op(","):
                args.append(self.parse_expr())
        self.expect_op(")")

        # OVER clause -> window function
        if self.at_kw("over"):
            self.next()
            self.expect_op("(")
            partition_by: list[Expr] = []
            order_by: list[SortExpr] = []
            frame = None
            if self.eat_kw("partition"):
                self.expect_kw("by")
                partition_by.append(self.parse_expr())
                while self.eat_op(","):
                    partition_by.append(self.parse_expr())
            if self.eat_kw("order"):
                self.expect_kw("by")
                order_by = self._parse_order_by_list()
            if self.at_kw("rows", "range", "groups"):
                frame = self._parse_window_frame()
            self.expect_op(")")
            return WindowFunction(name, args, partition_by, order_by, frame)

        if star:
            if name.lower() == "count":
                return AggregateFunction("count", [])
            raise ParserError(f"{name}(*) is not valid")
        if is_aggregate_function(name):
            return AggregateFunction(name.lower(), args, distinct)
        if is_window_function(name):
            raise ParserError(f"window function {name} requires OVER clause")
        return ScalarFunction(name.lower(), args)

    def _parse_window_frame(self) -> WindowFrame:
        units = self.next().value  # rows/range/groups
        def bound() -> WindowFrameBound:
            if self.eat_kw("unbounded"):
                if self.eat_kw("preceding"):
                    return WindowFrameBound("preceding", None)
                self.expect_kw("following")
                return WindowFrameBound("following", None)
            if self.eat_kw("current"):
                self.expect_kw("row")
                return WindowFrameBound("current")
            raw = self.next().value
            # RANGE frames take fractional offsets (e.g. over decimal keys)
            n = int(raw) if "." not in str(raw) else float(raw)
            if self.eat_kw("preceding"):
                return WindowFrameBound("preceding", n)
            self.expect_kw("following")
            return WindowFrameBound("following", n)

        if self.eat_kw("between"):
            start = bound()
            self.expect_kw("and")
            end = bound()
            return WindowFrame(units, start, end)
        start = bound()
        return WindowFrame(units, start, WindowFrameBound("current"))


# ---------------------------------------------------------------------------
# SQL type names -> DataType (SqlToRel::convert_data_type, planner.rs:1929)
# ---------------------------------------------------------------------------


def parse_sql_type(name: str) -> DataType:
    n = name.strip().lower()
    base = n.split("(")[0].strip()
    args = []
    if "(" in n:
        args = [int(x) for x in n[n.index("(") + 1 : n.index(")")].split(",")]
    m = {
        "boolean": BOOL,
        "bool": BOOL,
        "tinyint": INT8,
        "smallint": INT16,
        "int": INT32,
        "integer": INT32,
        "bigint": INT64,
        "float": FLOAT32,
        "real": FLOAT32,
        "double": FLOAT64,
        "double precision": FLOAT64,
        "varchar": STRING,
        "char": STRING,
        "text": STRING,
        "string": STRING,
        "date": DATE32,
        "timestamp": TIMESTAMP_US,
        "datetime": TIMESTAMP_US,
    }
    if base in m:
        return m[base]
    if base in ("decimal", "numeric"):
        p = args[0] if args else 18
        s = args[1] if len(args) > 1 else 0
        if p > 18:
            # int64-backed decimal (the fork's Int64Decimal,
            # scalar.rs:54-58) holds 18 full decimal digits; the fork's
            # Int96Decimal tier is deliberately out of scope — reject
            # loudly instead of wrapping silently (docs/user-guide.md
            # "Supported types")
            raise ParserError(
                f"DECIMAL({p},{s}) exceeds the supported precision: this "
                "engine stores decimals as int64*10^-s (max precision 18). "
                "Use DECIMAL(<=18, s) or DOUBLE."
            )
        return decimal(p, s)
    raise ParserError(f"unsupported SQL type '{name}'")


def parse_sql(sql: str) -> list:
    """Parse one or more ;-separated statements."""
    return Parser(sql).parse_statements()
