"""ScalarValue: a single typed constant.

Equivalent of the reference's ScalarValue
(/root/reference/datafusion/src/scalar.rs:38-94).  Python-native storage:
bool/int/float/str/None plus a DataType tag.  DECIMAL scalars store the
*unscaled* int (value * 10**scale), matching the fork's Int64Decimal.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from .dtypes import (
    BOOL,
    DATE32,
    FLOAT64,
    INT64,
    NULLTYPE,
    STRING,
    TIMESTAMP_US,
    DataType,
)

_EPOCH = _dt.date(1970, 1, 1)


@dataclass(frozen=True)
class ScalarValue:
    dtype: DataType
    value: Any  # None encodes SQL NULL of this dtype

    # ---- constructors ----------------------------------------------------
    @staticmethod
    def null() -> "ScalarValue":
        return ScalarValue(NULLTYPE, None)

    @staticmethod
    def boolean(v: bool | None) -> "ScalarValue":
        return ScalarValue(BOOL, v)

    @staticmethod
    def int64(v: int | None) -> "ScalarValue":
        return ScalarValue(INT64, v)

    @staticmethod
    def float64(v: float | None) -> "ScalarValue":
        return ScalarValue(FLOAT64, v)

    @staticmethod
    def utf8(v: str | None) -> "ScalarValue":
        return ScalarValue(STRING, v)

    @staticmethod
    def date32(v: int | _dt.date | None) -> "ScalarValue":
        if isinstance(v, _dt.date):
            v = (v - _EPOCH).days
        return ScalarValue(DATE32, v)

    @staticmethod
    def timestamp_us(v: int | _dt.datetime | None) -> "ScalarValue":
        if isinstance(v, _dt.datetime):
            v = int(v.timestamp() * 1_000_000)
        return ScalarValue(TIMESTAMP_US, v)

    @staticmethod
    def of(v: Any) -> "ScalarValue":
        """Infer a ScalarValue from a Python literal."""
        if v is None:
            return ScalarValue.null()
        if isinstance(v, bool):
            return ScalarValue.boolean(v)
        if isinstance(v, int):
            return ScalarValue.int64(v)
        if isinstance(v, float):
            return ScalarValue.float64(v)
        if isinstance(v, str):
            return ScalarValue.utf8(v)
        if isinstance(v, _dt.datetime):
            return ScalarValue.timestamp_us(v)
        if isinstance(v, _dt.date):
            return ScalarValue.date32(v)
        if isinstance(v, ScalarValue):
            return v
        raise TypeError(f"cannot build ScalarValue from {type(v)}")

    # ---- helpers ----------------------------------------------------------
    @property
    def is_null(self) -> bool:
        return self.value is None

    def to_python(self) -> Any:
        """Rescale decimals / convert temporals back to Python values."""
        if self.value is None:
            return None
        if self.dtype.is_decimal:
            return self.value / (10 ** self.dtype.scale)
        if self.dtype == DATE32:
            return _EPOCH + _dt.timedelta(days=int(self.value))
        if self.dtype == TIMESTAMP_US:
            return _dt.datetime.fromtimestamp(self.value / 1e6, tz=_dt.timezone.utc)
        return self.value

    def __repr__(self) -> str:
        if self.value is None:
            return f"NULL::{self.dtype!r}"
        return f"{self.value!r}::{self.dtype!r}"
