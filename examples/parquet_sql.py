"""SQL over parquet with row-group pruning
(reference: datafusion-examples/examples/parquet_sql.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from datafusion_tpu import ExecutionContext


def main():
    path = os.path.join(tempfile.mkdtemp(), "t.parquet")
    pq.write_table(
        pa.table({"id": list(range(1000)), "v": [i * 0.5 for i in range(1000)]}),
        path,
        row_group_size=100,  # 10 row groups -> the query below reads only 1
    )
    ctx = ExecutionContext()
    ctx.register_parquet("t", path)
    df = ctx.sql("SELECT count(*) AS c, avg(v) AS a FROM t WHERE id >= 900")
    print(df.collect().to_pydict())


if __name__ == "__main__":
    main()
