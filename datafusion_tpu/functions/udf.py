"""User-defined functions: ScalarUDF and AggregateUDF.

Reference equivalents: ScalarUDF (/root/reference/datafusion/src/physical_plan/
udf.rs:38), AggregateUDF (udaf.rs:44), registered through
ExecutionContext::register_udf/udaf (execution/context.rs:249,264).

TPU-native contracts (vectorized, jit-traceable — the reference's
row-oriented Accumulator trait has no data-parallel equivalent):

  ScalarUDF.fun(*data_arrays) -> data_array (or (data, valid) to control
  null handling; default propagates null when any argument is null).

  AggregateUDF is a commutative MONOID: `zero` identity + associative
  `step(acc, x) -> acc`, evaluated as a segmented scan on device, plus an
  optional `finalize(acc, count)`.  sum-of-squares, product, bit_or,
  bool_and, min-by-abs ... all fit; true sequential accumulators do not
  (and would not vectorize on any SIMD engine).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from ..types.dtypes import DataType


@dataclass
class ScalarUDF:
    name: str
    input_types: list[DataType]
    return_type: DataType
    fun: Callable  # (*jnp data arrays) -> data array | (data, valid)

    def __post_init__(self):
        self.name = self.name.lower()


@dataclass
class AggregateUDF:
    name: str
    input_type: DataType
    return_type: DataType
    zero: object  # identity element (python scalar)
    step: Callable  # (acc, x) -> acc ; associative + commutative
    finalize: Optional[Callable] = None  # (acc, count) -> value

    def __post_init__(self):
        self.name = self.name.lower()


def create_udf(name, input_types, return_type, fun) -> ScalarUDF:
    """Convenience mirroring datafusion::physical_plan::udf::create_udf."""
    return ScalarUDF(name, list(input_types), return_type, fun)


def create_udaf(name, input_type, return_type, zero, step, finalize=None) -> AggregateUDF:
    return AggregateUDF(name, input_type, return_type, zero, step, finalize)
