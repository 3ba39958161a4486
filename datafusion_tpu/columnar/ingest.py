"""Arrow interop: pyarrow Table/RecordBatch <-> device Table.

Host-side ingestion layer (SURVEY.md §7 step 1): variable-width data is
handled here, once, at the host boundary — strings become sorted-dictionary
codes, decimals become scaled int64, temporals become epoch-relative ints.
The device only ever sees fixed-width buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..errors import InternalError
from ..types.dtypes import (
    BOOL,
    DATE32,
    FLOAT32,
    FLOAT64,
    INT8,
    INT16,
    INT32,
    INT64,
    STRING,
    TIMESTAMP_US,
    UINT8,
    UINT16,
    UINT32,
    UINT64,
    DataType,
    decimal,
)
from .column import Column
from .dictionary import StringDict
from .table import Table, round_capacity

_PA_TO_DT = {
    pa.bool_(): BOOL,
    pa.int8(): INT8,
    pa.int16(): INT16,
    pa.int32(): INT32,
    pa.int64(): INT64,
    pa.uint8(): UINT8,
    pa.uint16(): UINT16,
    pa.uint32(): UINT32,
    pa.uint64(): UINT64,
    pa.float32(): FLOAT32,
    pa.float64(): FLOAT64,
    pa.date32(): DATE32,
}


def arrow_type_to_dtype(t: pa.DataType) -> DataType:
    if t in _PA_TO_DT:
        return _PA_TO_DT[t]
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return STRING
    if pa.types.is_dictionary(t):
        return STRING
    if pa.types.is_timestamp(t):
        return TIMESTAMP_US
    if pa.types.is_decimal(t):
        return decimal(t.precision, t.scale)
    if pa.types.is_date64(t):
        return DATE32
    raise InternalError(f"unsupported arrow type {t}")


def dtype_to_arrow_type(dt: DataType) -> pa.DataType:
    for k, v in _PA_TO_DT.items():
        if v == dt:
            return k
    if dt.is_string:
        return pa.string()
    if dt == TIMESTAMP_US:
        return pa.timestamp("us")
    if dt.is_decimal:
        return pa.decimal128(max(dt.precision, 1), dt.scale)
    raise InternalError(f"unsupported dtype {dt}")


def arrow_column_to_numpy(arr: pa.ChunkedArray | pa.Array):
    """Host-side conversion: arrow column -> (dtype, np data, np valid,
    dictionary).  No device transfer — HostTable ingestion (out-of-HBM
    tables) uses this directly."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dt = arrow_type_to_dtype(arr.type)
    valid = np.asarray(arr.is_valid())

    if dt.is_string:
        if pa.types.is_dictionary(arr.type):
            arr = arr.cast(pa.string())
        py = arr.to_pylist()
        d, codes = StringDict.from_strings(py)
        return dt, codes, valid, d

    if dt.is_decimal:
        py = arr.to_pylist()
        scale = 10 ** dt.scale
        data = np.array(
            [int(round(float(v) * scale)) if v is not None else 0 for v in py],
            dtype=np.int64,
        )
        return dt, data, valid, None

    if dt == TIMESTAMP_US:
        data = arr.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        data = data.astype("datetime64[us]").astype(np.int64)
        return dt, np.where(valid, data, 0), valid, None

    if dt == DATE32:
        data = arr.cast(pa.date32()).to_numpy(zero_copy_only=False)
        data = data.astype("datetime64[D]").astype(np.int64)
        return dt, np.where(valid, data, 0), valid, None

    data = arr.to_numpy(zero_copy_only=False)
    if data.dtype == object or np.issubdtype(data.dtype, np.floating) and dt.is_integer:
        data = np.array([v if v is not None else 0 for v in arr.to_pylist()])
    if np.issubdtype(data.dtype, np.floating) and dt.is_float:
        data = np.where(valid, data, 0.0)
    return dt, data, valid, None


def _arrow_column_to_device(arr: pa.ChunkedArray | pa.Array) -> Column:
    dt, data, valid, d = arrow_column_to_numpy(arr)
    return Column.from_numpy(dt, data, valid, d)


def arrow_to_table(t: pa.Table | pa.RecordBatch) -> Table:
    names = list(t.schema.names)
    nrows = t.num_rows
    cap = round_capacity(nrows)
    cols = [
        _arrow_column_to_device(t.column(i)).with_capacity(cap)
        for i in range(len(names))
    ]
    return Table(names, cols, nrows)


def table_to_arrow(t: Table) -> pa.Table:
    arrays, fields = [], []
    for name, col in zip(t.names, t.columns):
        vals = col.to_pylist(t.nrows)
        patype = dtype_to_arrow_type(col.dtype)
        if col.dtype.is_decimal:
            import decimal as _d

            q = _d.Decimal(1).scaleb(-col.dtype.scale)
            vals = [
                _d.Decimal(str(v)).quantize(q) if v is not None else None
                for v in vals
            ]
        arrays.append(pa.array(vals, type=patype))
        fields.append(pa.field(name, patype))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))
