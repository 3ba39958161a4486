"""Scalar UDF + aggregate UDAF (reference: simple_udf.rs / simple_udaf.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.functions.udf import create_udaf, create_udf
from datafusion_tpu.types.dtypes import FLOAT64


def main():
    ctx = ExecutionContext()
    ctx.register_table("t", Table.from_pydict({"x": [1.0, 2.0, 3.0, 4.0]}))

    # vectorized scalar UDF: runs on-device inside the fused stage
    ctx.register_udf(create_udf("pow2", [FLOAT64], FLOAT64, lambda x: x * x))

    # UDAF as a commutative monoid: geometric mean via log-sum
    ctx.register_udaf(
        create_udaf(
            "geomean_exp",
            FLOAT64,
            FLOAT64,
            zero=0.0,
            step=lambda a, b: a + b,
            finalize=lambda acc, cnt: jnp.exp(acc / jnp.maximum(cnt, 1)),
        )
    )
    ctx.register_udf(create_udf("lg", [FLOAT64], FLOAT64, lambda x: jnp.log(x)))
    print(ctx.sql("SELECT sum(pow2(x)) AS ss FROM t").collect().to_pydict())
    print(ctx.sql("SELECT geomean_exp(lg(x)) AS g FROM t").collect().to_pydict())


if __name__ == "__main__":
    main()
