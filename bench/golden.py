"""Golden-answer oracle: run TPC-H SQL through sqlite3 on the same generated
data, mirroring the reference's `verify_query` harness
(/root/reference/benchmarks/src/bin/tpch.rs:1008-1070, which compares engine
output against dbgen's answers row by row).

sqlite can't parse DATE/INTERVAL arithmetic or EXTRACT, so queries are
rewritten: date±interval folds to a literal (both engines then see the same
constant) and EXTRACT(YEAR ...) becomes strftime.
"""

from __future__ import annotations

import datetime as _dt
import re
import sqlite3

import numpy as np

from .tpch_datagen import DATE_COLUMNS

_EPOCH = _dt.date(1970, 1, 1)


def load_sqlite(data: dict[str, dict]) -> sqlite3.Connection:
    conn = sqlite3.connect(":memory:")
    # SQL-standard LIKE is case-sensitive (as in DataFusion/Postgres);
    # sqlite defaults to case-insensitive ASCII LIKE, which wrongly
    # excludes lowercase "customer ... complaints" suppliers in TPC-H q16
    conn.execute("PRAGMA case_sensitive_like = ON")
    for tname, cols in data.items():
        names = list(cols)
        decls = ", ".join(f'"{n}"' for n in names)
        conn.execute(f"CREATE TABLE {tname} ({decls})")
        arrays = []
        for n in names:
            a = cols[n]
            if n in DATE_COLUMNS:
                arrays.append(
                    [str(_EPOCH + _dt.timedelta(days=int(v))) for v in a]
                )
            elif a.dtype == object:
                arrays.append([str(v) for v in a])
            elif np.issubdtype(a.dtype, np.floating):
                arrays.append([float(v) for v in a])
            else:
                arrays.append([int(v) for v in a])
        rows = list(zip(*arrays))
        ph = ", ".join("?" for _ in names)
        conn.executemany(f"INSERT INTO {tname} VALUES ({ph})", rows)
    # join-key indexes: without them sqlite evaluates TPC-H's correlated
    # EXISTS subqueries (q4/q21/q22) as nested full scans — hours at SF>=0.1
    for tname, cols in (
        ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
        ("orders", ["o_orderkey", "o_custkey"]),
        ("customer", ["c_custkey"]),
        ("supplier", ["s_suppkey"]),
        ("part", ["p_partkey"]),
        ("partsupp", ["ps_partkey", "ps_suppkey"]),
    ):
        if tname in data:
            for c in cols:
                conn.execute(f'CREATE INDEX IF NOT EXISTS idx_{tname}_{c} ON {tname}("{c}")')
    conn.commit()
    return conn


_DATE_ARITH = re.compile(
    r"(?:date\s*'|'date\s+)(\d{4}-\d{2}-\d{2})'\s*([+-])\s*interval\s*'(\d+)'\s*(year|month|day)s?",
    re.I,
)
_SUBSTRING_FROM = re.compile(
    r"substring\s*\(\s*([a-z_0-9.]+)\s+from\s+(\d+)\s+for\s+(\d+)\s*\)", re.I
)
_DATE_LIT = re.compile(r"date\s*('(\d{4}-\d{2}-\d{2})')", re.I)
_EXTRACT = re.compile(r"extract\s*\(\s*(\w+)\s+from\s+([a-z_0-9.]+)\s*\)", re.I)


def _fold_date(m: re.Match) -> str:
    d = _dt.date.fromisoformat(m.group(1))
    sign = 1 if m.group(2) == "+" else -1
    n = int(m.group(3))
    unit = m.group(4).lower()
    if unit == "day":
        d2 = d + _dt.timedelta(days=sign * n)
    else:
        months = d.year * 12 + d.month - 1 + sign * n * (12 if unit == "year" else 1)
        y, mo = divmod(months, 12)
        import calendar

        day = min(d.day, calendar.monthrange(y, mo + 1)[1])
        d2 = _dt.date(y, mo + 1, day)
    return f"'{d2.isoformat()}'"


def to_sqlite_sql(sql: str) -> str:
    out = _DATE_ARITH.sub(_fold_date, sql)
    out = _DATE_LIT.sub(lambda m: m.group(1), out)
    out = _SUBSTRING_FROM.sub(lambda m: f"substr({m.group(1)}, {m.group(2)}, {m.group(3)})", out)
    out = _EXTRACT.sub(
        lambda m: f"cast(strftime('%{'Y' if m.group(1).lower()=='year' else 'm'}', {m.group(2)}) as integer)",
        out,
    )
    return out


def run_golden(conn: sqlite3.Connection, sql: str) -> list[tuple]:
    cur = conn.execute(to_sqlite_sql(sql))
    return cur.fetchall()


def compare_results(
    engine_rows: list[tuple],
    golden_rows: list[tuple],
    ordered: bool,
    rtol: float = 1e-9,
    atol: float = 1e-6,
    order_spec: list[tuple] | None = None,
) -> str | None:
    """None if equal; otherwise a description of the first mismatch.

    ``order_spec`` = [(col_idx, desc), ...] for ORDER BY queries whose
    sort keys can TIE (q3/q5's revenue at SF>=10): row order among tied
    rows is engine-defined, so equality is (a) multiset equality plus
    (b) the engine's rows being correctly ordered on the spec columns —
    exactly the SQL contract, instead of the positional compare that
    `ordered=True` does (tpch.rs verify_query compares positionally but
    against answers produced with the same tie order)."""
    if order_spec is not None and ordered:
        err = _check_row_order(engine_rows, order_spec)
        if err:
            return err
        ordered = False

    def norm_row(row):
        out = []
        for v in row:
            if isinstance(v, _dt.date):
                out.append(str(v))
            elif isinstance(v, float):
                out.append(v)
            elif v is None:
                out.append(None)
            else:
                out.append(v)
        return tuple(out)

    a = [norm_row(r) for r in engine_rows]
    b = [norm_row(r) for r in golden_rows]
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if not ordered:
        keyfn = lambda r: tuple(
            (x is None, str(type(x)), round(x, 4) if isinstance(x, float) else x)
            for x in r
        )
        a = sorted(a, key=keyfn)
        b = sorted(b, key=keyfn)
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return f"row {i}: width {len(ra)} vs {len(rb)}"
        for j, (x, y) in enumerate(zip(ra, rb)):
            if x is None and y is None:
                continue
            if x is None or y is None:
                return f"row {i} col {j}: {x!r} vs {y!r}"
            if isinstance(x, float) or isinstance(y, float):
                fx, fy = float(x), float(y)
                if not np.isclose(fx, fy, rtol=rtol, atol=atol):
                    return f"row {i} col {j}: {fx} vs {fy}"
            else:
                if str(x) != str(y):
                    return f"row {i} col {j}: {x!r} vs {y!r}"
    return None


def _check_row_order(rows: list[tuple], spec: list[tuple]) -> str | None:
    """Engine rows must be non-decreasing on the (col, desc) spec."""

    def key(r):
        out = []
        for idx, desc in spec:
            v = r[idx]
            if isinstance(v, _dt.date):
                v = str(v)
            if isinstance(v, float):
                v = -v if desc else v
            elif isinstance(v, int):
                v = -v if desc else v
            elif desc:  # strings: invert per-char for descending
                v = tuple(-ord(c) for c in str(v))
            out.append((v is None, v))
        return tuple(out)

    prev = None
    for i, r in enumerate(rows):
        k = key(r)
        if prev is not None and k < prev:
            return f"row {i}: ORDER BY violation on spec {spec}"
        prev = k
    return None


def table_to_rows(t) -> list[tuple]:
    """Engine Table -> list of row tuples with dates as ISO strings."""
    cols = []
    for name, col in zip(t.names, t.columns):
        vals = col.to_pylist(t.nrows)
        if col.dtype.kind == "date32":
            data, valid = col.to_numpy(t.nrows)
            vals = [
                str(_EPOCH + _dt.timedelta(days=int(d))) if ok else None
                for d, ok in zip(data, valid)
            ]
        cols.append(vals)
    return list(zip(*cols)) if cols else []
