"""Distributed SQL on a standalone in-proc cluster
(reference: ballista-examples/src/bin/ballista-sql.rs with
BallistaContext::standalone)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_tpu.columnar import Table
from datafusion_tpu.distributed import DistributedContext


def main():
    ctx = DistributedContext(standalone=True, num_executors=2, target_partitions=4)
    try:
        ctx.register_table(
            "sales",
            Table.from_pydict(
                {
                    "region": ["e", "w", "e", "n", "w", "e"] * 50,
                    "amount": list(range(300)),
                }
            ),
        )
        df = ctx.sql(
            "SELECT region, sum(amount) AS total, count(*) AS n "
            "FROM sales GROUP BY region ORDER BY total DESC"
        )
        print(df.collect().to_pydict())
    finally:
        ctx.close()


if __name__ == "__main__":
    main()
