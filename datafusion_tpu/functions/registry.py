"""Scalar function catalog: return-type inference + vectorized dispatch.

Equivalent of the reference's BuiltinScalarFunction enum + dispatch
(/root/reference/datafusion/src/physical_plan/functions.rs:103-229, 3,823
LoC) covering math (math_expressions.rs), string (string_expressions.rs),
unicode, regex, datetime (datetime_expressions.rs + fork cube_ext/datetime),
crypto and misc functions.

TPU mapping: math functions run on the VPU via jnp; string functions run
host-side once per *distinct* dictionary value and ship back as code LUTs
(one device gather); datetime functions are integer calendar arithmetic
(functions/datetime_fns.py).
"""

from __future__ import annotations

import hashlib
import math
import re as _re
from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column as CVec
from ..columnar.dictionary import StringDict
from ..errors import PlanError
from ..types.dtypes import (
    BOOL,
    DATE32,
    FLOAT64,
    INT32,
    INT64,
    STRING,
    TIMESTAMP_US,
    DataType,
    NULLTYPE,
)

# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

_MATH_UNARY = {
    "sqrt": jnp.sqrt,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "asin": jnp.arcsin,
    "acos": jnp.arccos,
    "atan": jnp.arctan,
    "exp": jnp.exp,
    "ln": jnp.log,
    "log": jnp.log10,
    "log10": jnp.log10,
    "log2": jnp.log2,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "round": jnp.round,
    "trunc": jnp.trunc,
    "abs": jnp.abs,
    "signum": jnp.sign,
}

_STRING_TO_STRING = {
    "upper": lambda s: s.upper(),
    "lower": lambda s: s.lower(),
    "trim": lambda s: s.strip(),
    "btrim": lambda s: s.strip(),
    "ltrim": lambda s: s.lstrip(),
    "rtrim": lambda s: s.rstrip(),
    "reverse": lambda s: s[::-1],
    "initcap": lambda s: _re.sub(r"\w+", lambda m: m.group(0).capitalize(), s),
    "md5": lambda s: hashlib.md5(s.encode()).hexdigest(),
    "sha224": lambda s: hashlib.sha224(s.encode()).hexdigest(),
    "sha256": lambda s: hashlib.sha256(s.encode()).hexdigest(),
    "sha384": lambda s: hashlib.sha384(s.encode()).hexdigest(),
    "sha512": lambda s: hashlib.sha512(s.encode()).hexdigest(),
}

_STRING_TO_INT = {
    "character_length": len,
    "char_length": len,
    "length": len,
    "bit_length": lambda s: len(s.encode()) * 8,
    "octet_length": lambda s: len(s.encode()),
    "ascii": lambda s: ord(s[0]) if s else 0,
}

_SCALAR_NAMES = (
    set(_MATH_UNARY)
    | set(_STRING_TO_STRING)
    | set(_STRING_TO_INT)
    | {
        "power",
        "pow",
        "atan2",
        "concat",
        "concat_ws",
        "substr",
        "substring",
        "left",
        "right",
        "lpad",
        "rpad",
        "repeat",
        "replace",
        "split_part",
        "starts_with",
        "strpos",
        "translate",
        "regexp_match",
        "regexp_replace",
        "to_hex",
        "chr",
        "nullif",
        "coalesce",
        "to_timestamp",
        "to_timestamp_millis",
        "to_timestamp_micros",
        "to_timestamp_seconds",
        "date_part",
        "datepart",
        "extract",
        "date_trunc",
        "now",
        "date_add",
        "date_sub",
        "date_bin",
        "convert_tz",
        "random",
        "isnull",
    }
)


def is_scalar_function(name: str) -> bool:
    return name.lower() in _SCALAR_NAMES


def scalar_return_type(name: str, arg_types: list[DataType]) -> DataType:
    n = name.lower()
    if n in _MATH_UNARY:
        if n in ("abs", "signum", "floor", "ceil", "round", "trunc") and arg_types and (
            arg_types[0].is_integer or arg_types[0].is_decimal
        ):
            return arg_types[0]
        return FLOAT64
    if n in ("power", "pow", "atan2", "random"):
        return FLOAT64
    if n in _STRING_TO_STRING or n in (
        "concat",
        "concat_ws",
        "substr",
        "substring",
        "left",
        "right",
        "lpad",
        "rpad",
        "repeat",
        "replace",
        "split_part",
        "translate",
        "regexp_replace",
        "to_hex",
        "chr",
    ):
        return STRING
    if n in _STRING_TO_INT:
        return INT32
    if n in ("starts_with",):
        return BOOL
    if n in ("strpos",):
        return INT32
    if n in ("regexp_match",):
        return STRING
    if n in ("nullif", "coalesce"):
        for t in arg_types:
            if t != NULLTYPE:
                return t
        return NULLTYPE
    if n in (
        "to_timestamp",
        "to_timestamp_millis",
        "to_timestamp_micros",
        "to_timestamp_seconds",
        "now",
        "date_bin",
        "convert_tz",
    ):
        return TIMESTAMP_US
    if n in ("date_part", "datepart", "extract"):
        return INT32
    if n in ("date_trunc",):
        return arg_types[1] if len(arg_types) > 1 else TIMESTAMP_US
    if n in ("date_add", "date_sub"):
        return arg_types[0] if arg_types else DATE32
    if n in ("isnull",):
        return BOOL
    raise PlanError(f"unknown scalar function '{name}'")


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _string_map(col: CVec, fn, out_dtype: DataType) -> CVec:
    """Apply str->str or str->scalar per distinct value, gather on device."""
    d = col.dictionary
    assert d is not None
    if out_dtype.is_string:
        nd, remap = d.map_values(fn)
        if len(remap) == 0:
            remap = np.zeros(1, dtype=np.int32)
        out = jnp.asarray(remap)[jnp.clip(col.data, 0, len(remap) - 1)]
        return CVec(STRING, out, col.valid, nd)
    lut = np.array(
        [fn(s) for s in d.values] if len(d) else [0],
        dtype=out_dtype.storage_np_dtype(),
    )
    out = jnp.asarray(lut)[jnp.clip(col.data, 0, len(lut) - 1)]
    return CVec(out_dtype, out, col.valid)


def _col_to_host_strings(col: CVec) -> list:
    d = col.dictionary
    assert d is not None
    codes = np.asarray(col.data)
    valid = np.asarray(col.valid)
    vals = d.decode(codes)
    return [v if ok else None for v, ok in zip(vals, valid)]


def _strings_to_col(strs: list, valid_extra=None) -> CVec:
    d, codes = StringDict.from_strings(strs)
    valid = np.array([s is not None for s in strs], dtype=bool)
    if valid_extra is not None:
        valid = valid & np.asarray(valid_extra)
    return CVec(STRING, jnp.asarray(codes), jnp.asarray(valid), d)


def _as_host_scalar(col: CVec):
    """First value of a constant column (literals evaluate to full columns)."""
    lit = getattr(col, "literal", None)
    if lit is not None:
        # literal CVec: read the host-known value (device data may be a
        # tracer under whole-stage jit)
        if col.dtype.is_string:
            return str(lit.value)
        return lit.value
    if col.dtype.is_string:
        assert col.dictionary is not None and len(col.dictionary) >= 1
        return str(col.dictionary.values[int(np.asarray(col.data[0]))])
    return np.asarray(col.data[0]).item()


def dispatch_scalar(
    name: str, args: list[CVec], out_dtype: DataType, capacity: int
) -> CVec:
    n = name.lower()

    # ---- math ----------------------------------------------------------------
    if n in _MATH_UNARY:
        c = args[0]
        if c.dtype.is_decimal:
            if n == "abs":
                return CVec(c.dtype, jnp.abs(c.data), c.valid)
            if n in ("floor", "ceil", "round", "trunc"):
                scale = 10**c.dtype.scale
                f = {"floor": jnp.floor, "ceil": jnp.ceil, "round": jnp.round, "trunc": jnp.trunc}[n]
                v = f(c.data.astype(jnp.float64) / scale) * scale
                return CVec(c.dtype, v.astype(jnp.int64), c.valid)
            data = c.data.astype(jnp.float64) / (10**c.dtype.scale)
        else:
            data = c.data
        if out_dtype.is_integer:
            return CVec(out_dtype, _MATH_UNARY[n](data).astype(out_dtype.storage_np_dtype()), c.valid)
        out = _MATH_UNARY[n](data.astype(jnp.float64))
        return CVec(FLOAT64, out, c.valid)
    if n in ("power", "pow"):
        a, b = args
        out = jnp.power(a.data.astype(jnp.float64), b.data.astype(jnp.float64))
        return CVec(FLOAT64, out, a.valid & b.valid)
    if n == "atan2":
        a, b = args
        return CVec(
            FLOAT64,
            jnp.arctan2(a.data.astype(jnp.float64), b.data.astype(jnp.float64)),
            a.valid & b.valid,
        )
    if n == "random":
        # evaluated host-side per call (non-deterministic like the reference)
        return CVec(FLOAT64, jnp.asarray(np.random.rand(capacity)), jnp.ones(capacity, bool))

    # ---- generic -----------------------------------------------------------
    if n == "nullif":
        a, b = args
        if a.dtype.is_string and b.dtype.is_string:
            from ..exprs.physical import harmonize_strings

            a2, b2 = harmonize_strings(a, b)
            eq = (a2.data == b2.data) & a2.valid & b2.valid
            return CVec(a.dtype, a2.data, a2.valid & ~eq, a2.dictionary)
        eq = (a.data == b.data) & a.valid & b.valid
        return CVec(a.dtype, a.data, a.valid & ~eq, a.dictionary)
    if n == "coalesce":
        from ..exprs.physical import cast_column, harmonize_strings

        out = cast_column(args[0], out_dtype)
        for nxt in args[1:]:
            nxt = cast_column(nxt, out_dtype)
            if out_dtype.is_string:
                out, nxt = harmonize_strings(out, nxt)
            data = jnp.where(out.valid, out.data, nxt.data)
            valid = out.valid | nxt.valid
            out = CVec(out_dtype, data, valid, out.dictionary)
        return out
    if n == "isnull":
        return CVec(BOOL, ~args[0].valid, jnp.ones(capacity, bool))

    # ---- datetime -------------------------------------------------------------
    from . import datetime_fns as DT

    if n in ("date_part", "datepart", "extract"):
        part = _as_host_scalar(args[0])
        c = args[1]
        if c.dtype == DATE32:
            out = DT.extract_field(str(part), c.data)
        else:
            days, us = DT.timestamp_to_days_us(c.data)
            out = DT.extract_field(str(part), days, us)
        return CVec(INT32, out.astype(jnp.int32), c.valid)
    if n == "date_trunc":
        gran = _as_host_scalar(args[0])
        c = args[1]
        if c.dtype == DATE32:
            return CVec(DATE32, DT.date_trunc_days(str(gran), c.data), c.valid)
        return CVec(TIMESTAMP_US, DT.date_trunc_us(str(gran), c.data), c.valid)
    if n in ("to_timestamp", "to_timestamp_micros"):
        from ..exprs.physical import cast_column

        return cast_column(args[0], TIMESTAMP_US)
    if n == "to_timestamp_seconds":
        c = args[0]
        if c.dtype.is_integer:
            return CVec(TIMESTAMP_US, c.data.astype(jnp.int64) * 1_000_000, c.valid)
        from ..exprs.physical import cast_column

        return cast_column(c, TIMESTAMP_US)
    if n == "to_timestamp_millis":
        c = args[0]
        if c.dtype.is_integer:
            return CVec(TIMESTAMP_US, c.data.astype(jnp.int64) * 1000, c.valid)
        from ..exprs.physical import cast_column

        return cast_column(c, TIMESTAMP_US)
    if n == "now":
        import time

        now_us = int(time.time() * 1e6)
        return CVec(
            TIMESTAMP_US,
            jnp.full(capacity, now_us, jnp.int64),
            jnp.ones(capacity, bool),
        )

    # ---- string: single-column str->str / str->int via dictionary LUT ------
    if n in _STRING_TO_STRING:
        return _string_map(args[0], _STRING_TO_STRING[n], STRING)
    if n in _STRING_TO_INT:
        return _string_map(args[0], _STRING_TO_INT[n], INT32)

    # string fns with scalar (literal) extra args -> still per-distinct-value
    if n in ("substr", "substring"):
        c = args[0]
        start = int(_as_host_scalar(args[1]))
        length = int(_as_host_scalar(args[2])) if len(args) > 2 else None
        py_start = max(start - 1, 0)

        def f(s):
            return s[py_start : py_start + length] if length is not None else s[py_start:]

        return _string_map(c, f, STRING)
    if n == "left":
        k = int(_as_host_scalar(args[1]))
        return _string_map(args[0], lambda s: s[:k] if k >= 0 else s[: len(s) + k], STRING)
    if n == "right":
        k = int(_as_host_scalar(args[1]))
        return _string_map(args[0], lambda s: s[-k:] if k > 0 else s[-k - len(s):] if k < 0 else "", STRING)
    if n == "repeat":
        k = int(_as_host_scalar(args[1]))
        return _string_map(args[0], lambda s: s * k, STRING)
    if n == "lpad":
        k = int(_as_host_scalar(args[1]))
        fill = str(_as_host_scalar(args[2])) if len(args) > 2 else " "

        def f(s):
            if len(s) >= k:
                return s[:k]
            pad = (fill * k)[: k - len(s)]
            return pad + s

        return _string_map(args[0], f, STRING)
    if n == "rpad":
        k = int(_as_host_scalar(args[1]))
        fill = str(_as_host_scalar(args[2])) if len(args) > 2 else " "

        def f(s):
            if len(s) >= k:
                return s[:k]
            return s + (fill * k)[: k - len(s)]

        return _string_map(args[0], f, STRING)
    if n == "replace":
        frm = str(_as_host_scalar(args[1]))
        to = str(_as_host_scalar(args[2]))
        return _string_map(args[0], lambda s: s.replace(frm, to), STRING)
    if n == "translate":
        frm = str(_as_host_scalar(args[1]))
        to = str(_as_host_scalar(args[2]))
        tbl = str.maketrans(frm[: len(to)], to[: len(frm)], frm[len(to):])
        return _string_map(args[0], lambda s: s.translate(tbl), STRING)
    if n == "split_part":
        delim = str(_as_host_scalar(args[1]))
        idx = int(_as_host_scalar(args[2]))

        def f(s):
            parts = s.split(delim)
            return parts[idx - 1] if 1 <= idx <= len(parts) else ""

        return _string_map(args[0], f, STRING)
    if n == "starts_with":
        prefix = str(_as_host_scalar(args[1]))
        d = args[0].dictionary
        assert d is not None
        lut = d.predicate_lut(lambda s: s.startswith(prefix))
        if len(lut) == 0:
            lut = np.zeros(1, dtype=bool)
        out = jnp.asarray(lut)[jnp.clip(args[0].data, 0, len(lut) - 1)]
        return CVec(BOOL, out, args[0].valid)
    if n == "strpos":
        sub = str(_as_host_scalar(args[1]))
        return _string_map(args[0], lambda s: s.find(sub) + 1, INT32)
    if n == "regexp_replace":
        pat = str(_as_host_scalar(args[1]))
        rep = str(_as_host_scalar(args[2])).replace("\\", "\\\\")
        rx = _re.compile(pat)
        count = 1
        if len(args) > 3 and "g" in str(_as_host_scalar(args[3])):
            count = 0
        return _string_map(args[0], lambda s: rx.sub(rep.replace("\\\\", "\\"), s, count=count), STRING)
    if n == "regexp_match":
        pat = str(_as_host_scalar(args[1]))
        rx = _re.compile(pat)

        def f(s):
            m = rx.search(s)
            return m.group(0) if m else ""

        return _string_map(args[0], f, STRING)
    if n == "to_hex":
        c = args[0]
        host = np.asarray(c.data)
        strs = [format(int(v), "x") for v in host]
        return _strings_to_col(strs, np.asarray(c.valid))
    if n == "chr":
        return _string_map_int_to_str(args[0], lambda v: chr(int(v)))
    if n in ("concat", "concat_ws"):
        # column-column string computation: combinatorial dictionaries are
        # unbounded, so this one materializes through the host (rare op)
        sep = ""
        cols = args
        if n == "concat_ws":
            sep = str(_as_host_scalar(args[0]))
            cols = args[1:]
        hosts = []
        for c in cols:
            if c.dtype.is_string:
                hosts.append(_col_to_host_strings(c))
            else:
                data = np.asarray(c.data)
                v = np.asarray(c.valid)
                hosts.append([str(x) if ok else None for x, ok in zip(data, v)])
        out = []
        for row in zip(*hosts):
            if n == "concat":
                out.append("".join(x for x in row if x is not None))
            else:
                out.append(sep.join(x for x in row if x is not None))
        return _strings_to_col(out)

    raise PlanError(f"scalar function '{name}' not implemented")


def _string_map_int_to_str(col: CVec, fn) -> CVec:
    host = np.asarray(col.data)
    valid = np.asarray(col.valid)
    strs = [fn(v) if ok else None for v, ok in zip(host, valid)]
    return _strings_to_col(strs)
