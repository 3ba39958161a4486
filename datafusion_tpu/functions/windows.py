"""Window function catalog (reference window_functions.rs:96-122):
RowNumber, Rank, DenseRank, PercentRank, CumeDist, Ntile, Lag, Lead,
FirstValue, LastValue, NthValue — plus any aggregate used as a window
function."""

from __future__ import annotations

from ..errors import PlanError
from ..types.dtypes import DataType, FLOAT64, INT64, UINT64
from .aggregates import aggregate_return_type, is_aggregate_function

BUILTIN_WINDOW_FUNCS = {
    "row_number",
    "rank",
    "dense_rank",
    "percent_rank",
    "cume_dist",
    "ntile",
    "lag",
    "lead",
    "first_value",
    "last_value",
    "nth_value",
}


def is_window_function(name: str) -> bool:
    return name.lower() in BUILTIN_WINDOW_FUNCS


def window_return_type(fun: str, arg_types: list[DataType], schema=None) -> DataType:
    f = fun.lower()
    if f in ("row_number", "rank", "dense_rank", "ntile"):
        return UINT64
    if f in ("percent_rank", "cume_dist"):
        return FLOAT64
    if f in ("lag", "lead", "first_value", "last_value", "nth_value"):
        if not arg_types:
            raise PlanError(f"{fun} requires an argument")
        return arg_types[0]
    if is_aggregate_function(f):
        return aggregate_return_type(f, arg_types)
    raise PlanError(f"unknown window function '{fun}'")
