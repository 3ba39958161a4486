"""CLI (datafusion-cli equivalent): print formats + script/command modes."""

import io
import json

from datafusion_tpu.cli import format_table, print_result, split_statements


def _table():
    from datafusion_tpu.columnar import Table

    return Table.from_pydict({"a": [1, None], "s": ["x", "y"]})


def test_format_table():
    out = format_table(["a", "s"], [[1, "x"], [None, "y"]])
    lines = out.splitlines()
    assert lines[1] == "| a | s |"
    assert "| 1 | x |" in lines
    assert "|   | y |" in lines


def test_print_formats():
    t = _table()
    for fmt, probe in [
        ("csv", "a,s\n1,x\n,y"),
        ("tsv", "a\ts\n1\tx\n\ty"),
    ]:
        buf = io.StringIO()
        print_result(t, fmt, file=buf)
        assert buf.getvalue().strip() == probe

    buf = io.StringIO()
    print_result(t, "json", file=buf)
    assert json.loads(buf.getvalue()) == [
        {"a": 1, "s": "x"},
        {"a": None, "s": "y"},
    ]

    buf = io.StringIO()
    print_result(t, "ndjson", file=buf)
    rows = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert rows == [{"a": 1, "s": "x"}, {"a": None, "s": "y"}]


def test_split_statements():
    assert split_statements("SELECT 1; SELECT ';' ; SELECT 2") == [
        "SELECT 1",
        "SELECT ';'",
        "SELECT 2",
    ]


def test_command_mode(capsys):
    from datafusion_tpu.cli import main

    rc = main(["--quiet", "-c", "SELECT 1 AS one, 'a' AS b"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "one" in out and "| 1" in out
