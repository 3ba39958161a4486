"""FK-specialized warm joins: fan-out <= 1 learned from the cold run lets
phase B skip candidate expansion entirely; a later violation of the FK
assumption must flag the speculation window and rerun exactly.

Reference anchor: hash_join.rs probes any fan-out through one code path;
the TPU engine specializes the (dominant) fan-out<=1 shape because the
expansion's merge sorts are its two largest passes.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table
from datafusion_tpu.ops import join as J


@pytest.fixture(autouse=True)
def _force_learned_path(monkeypatch):
    """Below SHRINK_SYNC_MIN_CAP the probe-capacity speculation preempts
    capacity learning; zero it so CI-sized tables exercise the learned
    (FK-specialized) path that big tables take."""
    monkeypatch.setattr(J, "SHRINK_SYNC_MIN_CAP", 0)


def _ctx(rows):
    ctx = ExecutionContext()
    ctx.register_table(
        "f",
        Table.from_pydict(
            {"k": [i % 50 for i in range(600)], "x": list(range(600))}
        ),
    )
    ctx.register_table("d", Table.from_pydict(rows))
    return ctx


FK_ROWS = {"k": list(range(50)), "y": [i * 10 for i in range(50)]}
DUP_ROWS = {"k": [i % 50 for i in range(100)], "y": [i * 10 for i in range(100)]}


@pytest.mark.parametrize("jt", ["inner", "left", "semi", "anti"])
def test_fk_warm_join_matches_cold(jt):
    if jt in ("semi", "anti"):
        sql = f"SELECT k, x FROM f WHERE k {'IN' if jt == 'semi' else 'NOT IN'} (SELECT k FROM d)"
    elif jt == "inner":
        sql = "SELECT f.k, x, y FROM f JOIN d ON f.k = d.k"
    else:
        sql = "SELECT f.k, x, y FROM f LEFT JOIN d ON f.k = d.k"
    ctx = _ctx(FK_ROWS)
    key = lambda d: sorted(zip(*d.values()), key=repr)
    cold = ctx.sql(sql).collect().to_pydict()
    for _ in range(2):  # warm runs take the learned-capacity (FK) path
        warm = ctx.sql(sql).collect().to_pydict()
        assert key(warm) == key(cold), jt


def test_fk_violation_reruns_exactly():
    # learn FK-ness on a 1:1 build, then swap in a SAME-SIGNATURE table
    # with duplicate keys: the fan-out flag must force an exact rerun and
    # the result must match a fresh engine
    sql = "SELECT f.k, x, y FROM f JOIN d ON f.k = d.k"
    key = lambda d: sorted(zip(*d.values()), key=repr)
    ctx = _ctx(FK_ROWS)
    for _ in range(3):
        ctx.sql(sql).collect()  # learn + exercise the FK path

    ctx2 = _ctx(DUP_ROWS)  # same table signature, duplicated keys
    got = ctx2.sql(sql).collect().to_pydict()
    fresh = _ctx(DUP_ROWS)
    want = fresh.sql(sql).collect().to_pydict()
    assert key(got) == key(want)
    assert len(got["k"]) == 1200  # 600 probe rows x 2 duplicate builds


def test_fanout_join_still_learns_and_matches():
    sql = "SELECT f.k, x, y FROM f JOIN d ON f.k = d.k ORDER BY x, y"
    ctx = _ctx(DUP_ROWS)
    cold = ctx.sql(sql).collect().to_pydict()
    for _ in range(2):
        assert ctx.sql(sql).collect().to_pydict() == cold
