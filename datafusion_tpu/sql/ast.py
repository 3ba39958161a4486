"""SQL statement AST (queries reference logical Exprs directly for scalar
expressions; relational structure mirrors sqlparser-rs's Query/Select).

Reference equivalent: the forked sqlparser-rs AST consumed by
/root/reference/datafusion/src/sql/planner.rs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..logical.expr import Expr, SortExpr
from ..types import Schema


# ---- table references -------------------------------------------------------


@dataclass
class TableName:
    name: str
    alias: Optional[str] = None


@dataclass
class DerivedTable:
    query: "Query"
    alias: str
    column_aliases: list[str] = field(default_factory=list)


@dataclass
class JoinClause:
    left: "TableRef"
    right: "TableRef"
    join_type: str  # inner/left/right/full/cross
    on: Optional[Expr] = None
    using: list[str] = field(default_factory=list)
    natural: bool = False


TableRef = "TableName | DerivedTable | JoinClause"


# ---- select core -------------------------------------------------------------


@dataclass
class RollingWindowSpec:
    """ROLLING_WINDOW(DIMENSION d, [PARTITION BY ...,] FROM x TO y EVERY z
    [, GROUP BY DIMENSION expr]) — the CubeStore SQL extension."""

    dimension: Expr
    partition_by: list[Expr]
    from_: Expr
    to: Expr
    every: Expr
    group_by_dimension: Optional[Expr] = None


@dataclass
class Select:
    projection: list[Expr]  # Wildcard for *, Alias/other Exprs otherwise
    from_: list[object]  # TableRefs (comma = cross join)
    where: Optional[Expr] = None
    group_by: list[Expr] = field(default_factory=list)
    having: Optional[Expr] = None
    distinct: bool = False
    rolling_window: Optional[RollingWindowSpec] = None


@dataclass
class SetOp:
    op: str  # 'union' | 'union_all' | 'intersect' | 'except'
    left: object  # Select | SetOp
    right: object


@dataclass
class Query:
    body: object  # Select | SetOp | Query
    ctes: list[tuple[str, "Query"]] = field(default_factory=list)
    order_by: list[SortExpr] = field(default_factory=list)
    limit: Optional[int] = None
    offset: Optional[int] = None


# ---- statements ----------------------------------------------------------------


@dataclass
class QueryStatement:
    query: Query


@dataclass
class CreateExternalTableStmt:
    """CREATE EXTERNAL TABLE t (cols) STORED AS CSV LOCATION '...'
    (the DFParser extension, reference sql/parser.rs:275)."""

    name: str
    columns: list[tuple[str, str]]  # (name, sql type string)
    file_type: str
    location: str
    has_header: bool = False


@dataclass
class CreateTableAsStmt:
    name: str
    query: Query


@dataclass
class CreateViewStmt:
    name: str
    query: Query
    column_aliases: list[str] = field(default_factory=list)


@dataclass
class DropViewStmt:
    name: str
    if_exists: bool = False


@dataclass
class DropTableStmt:
    name: str
    if_exists: bool = False


@dataclass
class ExplainStmt:
    statement: object
    verbose: bool = False
    analyze: bool = False


@dataclass
class ShowStmt:
    variable: str
