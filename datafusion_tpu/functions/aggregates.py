"""Aggregate function catalog: return types + partial/final state schemas.

Equivalent of the reference's aggregates.rs (AggregateFunction enum,
return_type, :55-133) and the per-function Accumulator implementations
(expressions/sum.rs, avg.rs, count.rs, min_max.rs, distinct_expressions.rs).

Unlike the reference's per-group row Accumulators, aggregation here is a
segment-reduction over sorted group ids (ops/kernels.py), so each function
is described by (a) the jnp per-row prepared value(s) and (b) segment
reductions + a finalize step.  Two-phase (Partial/Final) state mirrors
hash_aggregate.rs modes: sum -> sum; count -> sum; avg -> (sum, count);
min/max -> min/max; var/stddev -> (n, sum, sum_sq); corr/covar -> moments.
"""

from __future__ import annotations

from ..errors import PlanError
from ..types.dtypes import (
    BOOL,
    DataType,
    FLOAT64,
    INT64,
    NULLTYPE,
    UINT64,
    decimal,
)

AGG_FUNCS = {
    "count",
    "sum",
    "min",
    "max",
    "avg",
    "mean",
    "approx_distinct",
    "array_agg",
    "variance",
    "var",
    "var_samp",
    "var_pop",
    "stddev",
    "stddev_samp",
    "stddev_pop",
    "covar",
    "covar_samp",
    "covar_pop",
    "corr",
}


def is_aggregate_function(name: str) -> bool:
    return name.lower() in AGG_FUNCS


def aggregate_return_type(fun: str, arg_types: list[DataType]) -> DataType:
    f = fun.lower()
    t = arg_types[0] if arg_types else NULLTYPE
    if f == "count" or f == "approx_distinct":
        return INT64
    if f == "sum":
        if t.is_decimal:
            return decimal(38, t.scale)
        if t.is_float:
            return FLOAT64
        if t.is_unsigned_integer:
            return UINT64
        if t.is_integer:
            return INT64
        if t == NULLTYPE:
            return INT64
        raise PlanError(f"SUM over {t!r} not supported")
    if f in ("min", "max"):
        return t
    if f in ("avg", "mean"):
        if t.is_numeric or t == NULLTYPE:
            return FLOAT64
        raise PlanError(f"AVG over {t!r} not supported")
    if f in (
        "variance",
        "var",
        "var_samp",
        "var_pop",
        "stddev",
        "stddev_samp",
        "stddev_pop",
        "covar",
        "covar_samp",
        "covar_pop",
        "corr",
    ):
        return FLOAT64
    if f == "array_agg":
        return t
    raise PlanError(f"unknown aggregate function '{fun}'")
