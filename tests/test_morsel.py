"""Out-of-HBM morsel streaming (SURVEY §7 hard part (g)): host-resident
tables execute fused stages per fixed-capacity morsel — one compiled
program for the whole scan — with partial->final aggregate merging, and
must match the device-resident engine row-exactly."""

import numpy as np
import pytest

from datafusion_tpu import ExecutionContext
from datafusion_tpu.columnar import Table


def _data(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "k": rng.integers(0, 7, n).astype(np.int64),
        "s": np.array(["ab", "cd", "ef"], dtype=object)[rng.integers(0, 3, n)],
        "v": rng.normal(size=n),
        "q": rng.integers(0, 100, n).astype(np.int64),
    }


@pytest.fixture(scope="module")
def ctxs():
    data = _data()
    dev = ExecutionContext()
    dev.register_table("t", Table.from_pydict(data))
    host = ExecutionContext()
    # tiny morsels force many chunks (5000 rows -> 5 morsels)
    host.register_host_table("t", Table.from_pydict(data), morsel_rows=1024)
    return dev, host


QUERIES = [
    "SELECT k, s, count(*) c, sum(v) sv, avg(q) aq, min(v) mv, max(q) xq "
    "FROM t GROUP BY k, s ORDER BY k, s",
    "SELECT count(*), sum(q) FROM t WHERE v > 0.5",
    "SELECT k, v FROM t WHERE q > 95 ORDER BY v DESC LIMIT 7",
    "SELECT count(distinct k) FROM t",
    "SELECT k, count(distinct s) c, sum(q) s2 FROM t GROUP BY k ORDER BY k",
    "SELECT sum(v) FROM t WHERE s = 'ab' AND q BETWEEN 10 AND 20",
]


@pytest.mark.parametrize("q", QUERIES)
def test_morsel_matches_device(ctxs, q):
    dev, host = ctxs
    a = dev.sql(q).collect().to_pydict()
    b = host.sql(q).collect().to_pydict()
    assert list(a) == list(b) or len(a) == len(b)
    for va, vb in zip(a.values(), b.values()):
        assert len(va) == len(vb)
        for x, y in zip(va, vb):
            if isinstance(x, float):
                assert abs(x - y) < 1e-6 * max(1.0, abs(x)), (x, y)
            else:
                assert x == y, (x, y)


def test_morsel_plan_engages():
    """EXPLAIN shows the morsel stage (not whole-table materialization)."""
    host = ExecutionContext()
    host.register_host_table("t", Table.from_pydict(_data(3000)), morsel_rows=1024)
    rows = host.sql("EXPLAIN SELECT k, sum(v) FROM t GROUP BY k").collect()
    txt = " ".join(str(v) for v in rows.to_pydict().values())
    assert "MorselStageExec" in txt, txt


def test_morsel_single_morsel_degenerate():
    """A host table smaller than one morsel still works (single slice)."""
    host = ExecutionContext()
    host.register_host_table("t", Table.from_pydict(_data(100)), morsel_rows=4096)
    out = host.sql("SELECT count(*) FROM t").collect().to_pydict()
    assert list(out.values())[0] == [100]


@pytest.fixture(scope="module")
def join_ctxs():
    rng = np.random.default_rng(1)
    n = 5000
    li = {
        "okey": rng.integers(0, 900, n).astype(np.int64),
        "qty": rng.integers(1, 50, n).astype(np.int64),
        "price": np.round(rng.uniform(1, 100, n), 2),
        "flag": np.array(["A", "B", "C"], dtype=object)[rng.integers(0, 3, n)],
    }
    orders = {
        "okey2": np.arange(900, dtype=np.int64),
        "cust": rng.integers(0, 40, 900).astype(np.int64),
        "status": np.array(["O", "F"], dtype=object)[rng.integers(0, 2, 900)],
    }
    dev = ExecutionContext()
    dev.register_table("li", Table.from_pydict(li))
    dev.register_table("o", Table.from_pydict(orders))
    host = ExecutionContext()
    host.register_host_table("li", Table.from_pydict(li), morsel_rows=1024)
    host.register_table("o", Table.from_pydict(orders))
    return dev, host


JOIN_QUERIES = [
    "SELECT o.cust, count(*) c, sum(li.price) sp FROM li JOIN o ON li.okey = o.okey2 "
    "WHERE li.qty > 5 GROUP BY o.cust ORDER BY o.cust",
    "SELECT count(*) FROM li WHERE EXISTS "
    "(SELECT 1 FROM o WHERE o.okey2 = li.okey AND o.status = 'O')",
    "SELECT count(*), sum(qty) FROM li WHERE okey NOT IN "
    "(SELECT okey2 FROM o WHERE status = 'F')",
    "SELECT li.flag, count(o.cust) c, sum(li.qty) sq FROM li LEFT JOIN o "
    "ON li.okey = o.okey2 AND o.status='O' GROUP BY li.flag ORDER BY li.flag",
    "SELECT li.okey, li.price, o.cust FROM li JOIN o ON li.okey = o.okey2 "
    "ORDER BY li.price DESC, li.okey LIMIT 9",
    "SELECT o.status, count(DISTINCT li.flag) cf FROM li JOIN o "
    "ON li.okey = o.okey2 GROUP BY o.status ORDER BY o.status",
]


@pytest.mark.parametrize("q", JOIN_QUERIES)
def test_morsel_join_matches_device(join_ctxs, q):
    """Streamed joins over a host-resident probe (MorselJoinStageExec):
    build side HBM-resident, probe morsels stream through join -> partial
    agg -> final merge; row-exact vs the device-resident engine (the
    reference's pipelined streaming hash join, hash_join.rs)."""
    dev, host = join_ctxs
    a = dev.sql(q).collect().to_pydict()
    b = host.sql(q).collect().to_pydict()
    assert len(a) == len(b)
    for va, vb in zip(a.values(), b.values()):
        assert len(va) == len(vb)
        for x, y in zip(va, vb):
            if isinstance(x, float):
                assert abs(x - y) < 1e-6 * max(1.0, abs(x)), (x, y)
            else:
                assert x == y, (x, y)


def test_morsel_join_plan_engages(join_ctxs):
    from datafusion_tpu.physical.morsel import MorselJoinStageExec

    _, host = join_ctxs
    lp = host.sql(JOIN_QUERIES[0]).logical_plan()
    phys = host.create_physical_plan(host.optimize(lp))

    def find(p):
        return isinstance(p, MorselJoinStageExec) or any(
            find(c) for c in p.children()
        )

    assert find(phys)


DEVICE_OUTER_QUERIES = [
    "SELECT o.status, count(*) c, count(li.qty) cq, sum(li.qty) sq FROM li "
    "RIGHT JOIN o ON li.okey = o.okey2 GROUP BY o.status ORDER BY o.status",
    "SELECT count(*) c, count(li.qty) cl, count(o.cust) co FROM li "
    "FULL JOIN o ON li.okey = o.okey2",
    "SELECT o.okey2, li.qty FROM li RIGHT JOIN o ON li.okey = o.okey2 "
    "WHERE o.cust = 7 ORDER BY o.okey2, li.qty LIMIT 12",
    "SELECT li.flag, count(*) c FROM li FULL JOIN o ON li.okey = o.okey2 "
    "GROUP BY li.flag ORDER BY li.flag",
]


@pytest.mark.parametrize("q", DEVICE_OUTER_QUERIES)
def test_morsel_join_device_outer(join_ctxs, q):
    """right/full outer with the host table as probe: a __rowid visited
    mask accumulates across morsels (hash_join.rs:649's visited bitmap
    carried across the probe stream) and one final unmatched batch feeds
    the same partial-aggregate pipeline."""
    dev, host = join_ctxs
    a = dev.sql(q).collect().to_pydict()
    b = host.sql(q).collect().to_pydict()
    assert a == b, q


def test_morsel_join_host_right_outer_with_filter():
    """host-RIGHT device-side-outer with a residual filter: the filter's
    host-side column indices are remapped past the __rowid column (it sits
    between the build and host columns in the per-morsel join schema)."""
    from datafusion_tpu.datasource.host import HostMemoryExec, HostTable
    from datafusion_tpu.exprs.physical import PhysBinary, PhysCol, PhysLit
    from datafusion_tpu.ops.basic import MemoryExec
    from datafusion_tpu.ops.join import HashJoinExec
    from datafusion_tpu.physical.fuse import FuseStages
    from datafusion_tpu.physical.morsel import MorselJoinStageExec
    from datafusion_tpu.types import ScalarValue
    from datafusion_tpu.types.dtypes import BOOL, INT64

    rng = np.random.default_rng(6)
    ot = Table.from_pydict(
        {
            "okey2": (np.arange(300) * 2).astype(np.int64),
            "cust": rng.integers(0, 40, 300).astype(np.int64),
        }
    )
    lit = Table.from_pydict(
        {
            "okey": rng.integers(0, 600, 4000).astype(np.int64),
            "qty": rng.integers(1, 50, 4000).astype(np.int64),
        }
    )
    hst = HostTable.from_table(lit, morsel_rows=1024)
    on = [(PhysCol("okey2", 0, INT64), PhysCol("okey", 0, INT64))]

    def filt():
        return PhysBinary(
            PhysCol("qty", 3, INT64), ">", PhysLit(ScalarValue.int64(25)), BOOL
        )

    omem = MemoryExec(ot, ot.schema())
    join = HashJoinExec(omem, HostMemoryExec(hst, hst.schema()), on, "left", filt())
    fused = FuseStages().optimize(join)
    assert isinstance(fused, MorselJoinStageExec) and not fused.host_on_left
    got = fused.execute()
    want = HashJoinExec(omem, MemoryExec(lit, lit.schema()), on, "left", filt()).execute()

    def rows(t):
        return sorted(
            zip(*t.to_pydict().values()),
            key=lambda r: tuple((x is None, x) for x in r),
        )

    assert rows(got) == rows(want)


def test_host_resident_tpch_on_mesh_never_materializes():
    """Out-of-HBM composes with the mesh (reference streams scans under ANY
    plan, parquet.rs:596-636): host-resident lineitem at an SF exceeding a
    single shard's capacity runs q1 (fused aggregate) and q18 (join-heavy,
    group-by + semi-join shape) golden-exact on the 8-device mesh, and the
    full table NEVER materializes on one device — ShardedTable.from_host
    ships each device only its N/ndev slice."""
    import jax

    from bench.tpch import check
    from datafusion_tpu.datasource.host import HostTable
    from datafusion_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-virtual-device mesh")

    materialized = []
    orig = HostTable.materialize

    def spy(self):
        materialized.append(self.nrows)
        return orig(self)

    HostTable.materialize = spy
    try:
        res = check(
            0.01, [1, 18], verbose=False, mesh=make_mesh(8),
            host_tables=("lineitem",),
        )
    finally:
        HostTable.materialize = orig
    assert res[1] is None, f"q1: {res[1]}"
    assert res[18] is None, f"q18: {res[18]}"
    assert not materialized, (
        f"host table materialized on a single device: {materialized}"
    )
