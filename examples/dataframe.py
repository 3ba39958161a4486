"""DataFrame API (reference: datafusion-examples/examples/dataframe.rs,
dataframe_in_memory.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpu import ExecutionContext, col, lit
from datafusion_tpu.columnar import Table
from datafusion_tpu.logical.expr import AggregateFunction, Alias, SortExpr


def main():
    ctx = ExecutionContext()
    ctx.register_table(
        "users",
        Table.from_pydict(
            {
                "name": ["ada", "bob", "cyd", "dan"],
                "age": [35, 24, 51, 24],
                "city": ["x", "y", "x", "y"],
            }
        ),
    )
    df = (
        ctx.table("users")
        .filter(col("age") > lit(20))
        .aggregate(
            [col("city")],
            [
                Alias(AggregateFunction("count", []), "n"),
                Alias(AggregateFunction("avg", [col("age")]), "avg_age"),
            ],
        )
        .sort(SortExpr(col("city"), True, False))
    )
    print(df.collect().to_pydict())


if __name__ == "__main__":
    main()
