"""Logical data types for the engine.

Capability parity with the reference's type surface (Arrow `DataType` plus the
CubeStore fork's decimal family, /root/reference/datafusion/src/scalar.rs:38-94
`ScalarValue` variants: Boolean, Float32/64, Int8..64, UInt8..64,
Int64Decimal(scale), Utf8, Date32, TimestampNanosecond/Microsecond,
IntervalYearMonth/DayTime), re-expressed for TPU storage:

- every type has a fixed-width device representation (a jnp dtype);
- DECIMAL(p, s) is stored as int64 scaled by 10**s (mirrors the fork's
  Int64Decimal, scalar.rs:56-63);
- STRING is stored on device as int32 dictionary codes; the dictionary of
  unique byte strings lives host-side (SURVEY.md §7 design translation);
- DATE32 is days since epoch (int32), TIMESTAMP is microseconds since epoch
  (int64); INTERVAL_YM is whole months (int32), INTERVAL_DT is milliseconds
  (int64).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class DataType:
    """A logical column type.

    ``kind`` is one of: bool, int8..int64, uint8..uint64, float32, float64,
    decimal, date32, timestamp, interval_ym, interval_dt, string, null.
    """

    kind: str
    precision: int = 0  # decimal only
    scale: int = 0  # decimal only
    tz: str | None = None  # timestamp only
    elem: "DataType | None" = None  # fixed_size_list only: element type
    list_size: int = 0  # fixed_size_list only

    # ---- classification ------------------------------------------------
    @property
    def is_signed_integer(self) -> bool:
        return self.kind in ("int8", "int16", "int32", "int64")

    @property
    def is_unsigned_integer(self) -> bool:
        return self.kind in ("uint8", "uint16", "uint32", "uint64")

    @property
    def is_integer(self) -> bool:
        return self.is_signed_integer or self.is_unsigned_integer

    @property
    def is_float(self) -> bool:
        return self.kind in ("float32", "float64")

    @property
    def is_decimal(self) -> bool:
        return self.kind == "decimal"

    @property
    def is_numeric(self) -> bool:
        return self.is_integer or self.is_float or self.is_decimal

    @property
    def is_temporal(self) -> bool:
        return self.kind in ("date32", "timestamp", "interval_ym", "interval_dt")

    @property
    def is_string(self) -> bool:
        return self.kind == "string"

    @property
    def is_bool(self) -> bool:
        return self.kind == "bool"

    @property
    def is_null(self) -> bool:
        return self.kind == "null"

    @property
    def is_list(self) -> bool:
        return self.kind == "fixed_size_list"

    # ---- device storage --------------------------------------------------
    def storage_np_dtype(self) -> np.dtype:
        """The numpy/jnp dtype used for this type's device buffer."""
        m = {
            "bool": np.bool_,
            "int8": np.int8,
            "int16": np.int16,
            "int32": np.int32,
            "int64": np.int64,
            "uint8": np.uint8,
            "uint16": np.uint16,
            "uint32": np.uint32,
            "uint64": np.uint64,
            "float32": np.float32,
            "float64": np.float64,
            "decimal": np.int64,
            "date32": np.int32,
            "timestamp": np.int64,
            "interval_ym": np.int32,
            "interval_dt": np.int64,
            "string": np.int32,  # dictionary codes
            "null": np.int8,
        }
        if self.kind == "fixed_size_list":
            # device layout: data shape (capacity, list_size) of element
            # storage (the SoA analogue of Arrow FixedSizeList values)
            return self.elem.storage_np_dtype()
        return np.dtype(m[self.kind])

    def integer_bit_width(self) -> int:
        return self.storage_np_dtype().itemsize * 8

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        if self.kind == "decimal":
            return f"DECIMAL({self.precision},{self.scale})"
        if self.kind == "timestamp" and self.tz:
            return f"TIMESTAMP[{self.tz}]"
        if self.kind == "fixed_size_list":
            return f"FIXEDSIZELIST<{self.elem!r}, {self.list_size}>"
        return self.kind.upper()

    def sql_name(self) -> str:
        m = {
            "bool": "BOOLEAN",
            "int8": "TINYINT",
            "int16": "SMALLINT",
            "int32": "INT",
            "int64": "BIGINT",
            "uint8": "TINYINT UNSIGNED",
            "uint16": "SMALLINT UNSIGNED",
            "uint32": "INT UNSIGNED",
            "uint64": "BIGINT UNSIGNED",
            "float32": "FLOAT",
            "float64": "DOUBLE",
            "date32": "DATE",
            "timestamp": "TIMESTAMP",
            "interval_ym": "INTERVAL YEAR TO MONTH",
            "interval_dt": "INTERVAL DAY TO SECOND",
            "string": "VARCHAR",
            "null": "NULL",
        }
        if self.kind == "decimal":
            return f"DECIMAL({self.precision},{self.scale})"
        if self.kind == "fixed_size_list":
            return f"{self.elem.sql_name()}[{self.list_size}]"
        return m[self.kind]


BOOL = DataType("bool")
INT8 = DataType("int8")
INT16 = DataType("int16")
INT32 = DataType("int32")
INT64 = DataType("int64")
UINT8 = DataType("uint8")
UINT16 = DataType("uint16")
UINT32 = DataType("uint32")
UINT64 = DataType("uint64")
FLOAT32 = DataType("float32")
FLOAT64 = DataType("float64")
DATE32 = DataType("date32")
TIMESTAMP_US = DataType("timestamp")
INTERVAL_YM = DataType("interval_ym")
INTERVAL_DT = DataType("interval_dt")
STRING = DataType("string")
NULLTYPE = DataType("null")


# int64 storage holds 18 full decimal digits — the fork's Int64Decimal
# tier (/root/reference/datafusion/src/scalar.rs:54-58).  Its Int96Decimal
# (p>18) tier is deliberately unsupported: the SQL layer REJECTS
# DECIMAL(p>18) declarations (sql/parser.py) rather than wrapping silently
# (docs/user-guide.md "Supported types").
DECIMAL_MAX_PRECISION = 18


def decimal(precision: int, scale: int) -> DataType:
    """DECIMAL(p, s) stored as int64 * 10**-s (fork's Int64Decimal)."""
    return DataType("decimal", precision=precision, scale=scale)


_SIGNED = [INT8, INT16, INT32, INT64]
_UNSIGNED = [UINT8, UINT16, UINT32, UINT64]


def numeric_common_type(lhs: DataType, rhs: DataType) -> DataType | None:
    """Binary numeric coercion: the common type two numeric operands promote
    to.  Mirrors the reference's `numerical_coercion`
    (/root/reference/datafusion/src/physical_plan/expressions/coercion.rs).
    """
    if not (lhs.is_numeric and rhs.is_numeric):
        return None
    if lhs == rhs:
        return lhs
    # float dominates
    if FLOAT64 in (lhs, rhs):
        return FLOAT64
    if FLOAT32 in (lhs, rhs):
        if lhs.is_decimal or rhs.is_decimal:
            return FLOAT64
        return FLOAT32
    # decimal: widen to the larger scale
    if lhs.is_decimal or rhs.is_decimal:
        if lhs.is_decimal and rhs.is_decimal:
            s = max(lhs.scale, rhs.scale)
            p = max(lhs.precision - lhs.scale, rhs.precision - rhs.scale) + s
            return decimal(min(p, DECIMAL_MAX_PRECISION), s)
        other = rhs if lhs.is_decimal else lhs
        dec = lhs if lhs.is_decimal else rhs
        if other.is_integer:
            return decimal(DECIMAL_MAX_PRECISION, dec.scale)
        return FLOAT64
    # integer widening
    def rank(t: DataType) -> int:
        return t.integer_bit_width()

    if lhs.is_signed_integer and rhs.is_signed_integer:
        return lhs if rank(lhs) >= rank(rhs) else rhs
    if lhs.is_unsigned_integer and rhs.is_unsigned_integer:
        return lhs if rank(lhs) >= rank(rhs) else rhs
    # mixed sign: promote to the signed type that fits both (int64 cap)
    bits = max(rank(lhs), rank(rhs))
    for t in _SIGNED:
        if t.integer_bit_width() > bits or t.integer_bit_width() == 64:
            if t.integer_bit_width() >= bits:
                return t
    return INT64
