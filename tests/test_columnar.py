"""Columnar substrate tests (Tables, dictionaries, Arrow interop)."""

import numpy as np
import pyarrow as pa
import pytest

from datafusion_tpu.columnar import StringDict, Table
from datafusion_tpu.types.dtypes import DATE32, FLOAT64, INT64, STRING, decimal


def test_from_pydict_roundtrip():
    t = Table.from_pydict({"a": [1, 2, 3], "b": [1.5, None, 2.5], "s": ["x", None, "y"]})
    assert t.nrows == 3
    assert t.to_pydict() == {
        "a": [1, 2, 3],
        "b": [1.5, None, 2.5],
        "s": ["x", None, "y"],
    }


def test_capacity_padding():
    t = Table.from_pydict({"a": list(range(5000))})
    assert t.capacity == 8192
    assert t.to_pydict()["a"] == list(range(5000))


def test_decimal_ingest():
    t = Table.from_pydict({"d": [1.25, 2.5]}, dtypes={"d": decimal(15, 2)})
    assert t.columns[0].dtype.scale == 2
    assert t.to_pydict()["d"] == [1.25, 2.5]
    # stored as scaled ints
    assert np.asarray(t.columns[0].data[:2]).tolist() == [125, 250]


def test_string_dict_sorted_and_merge():
    d1, codes1 = StringDict.from_strings(["b", "a", "b", None])
    assert list(d1.values) == ["a", "b"]
    assert codes1.tolist()[0] == 1
    d2, _ = StringDict.from_strings(["c", "a"])
    merged, ra, rb = StringDict.merge(d1, d2)
    assert list(merged.values) == ["a", "b", "c"]
    assert ra.tolist() == [0, 1]
    assert rb.tolist() == [0, 2]


def test_arrow_roundtrip():
    at = pa.table(
        {
            "i": pa.array([1, 2, None], type=pa.int64()),
            "s": pa.array(["x", None, "z"]),
            "f": pa.array([1.0, 2.0, 3.0]),
        }
    )
    t = Table.from_arrow(at)
    assert t.to_pydict() == {"i": [1, 2, None], "s": ["x", None, "z"], "f": [1.0, 2.0, 3.0]}
    back = t.to_arrow()
    assert back.column("i").to_pylist() == [1, 2, None]


def test_date_ingest():
    t = Table.from_pydict(
        {"d": np.array(["2020-01-01", "2020-03-01"], dtype="datetime64[D]")},
        dtypes={"d": DATE32},
    )
    vals = t.to_pydict()["d"]
    assert str(vals[0]) == "2020-01-01"
