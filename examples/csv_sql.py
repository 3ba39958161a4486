"""SQL over a CSV file (reference: datafusion-examples/examples/csv_sql.rs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from datafusion_tpu import ExecutionContext


def main():
    path = os.path.join(tempfile.mkdtemp(), "example.csv")
    with open(path, "w") as f:
        f.write("c1,c2,c3\n")
        for i in range(100):
            f.write(f"{'abcde'[i % 5]},{i},{i * 1.5}\n")

    ctx = ExecutionContext()
    ctx.register_csv("example", path)  # parsed by the native C++ loader
    df = ctx.sql(
        "SELECT c1, MIN(c3) AS mn, MAX(c3) AS mx FROM example "
        "WHERE c2 > 10 AND c2 < 90 GROUP BY c1 ORDER BY c1"
    )
    print(df.collect().to_pandas())


if __name__ == "__main__":
    main()
