"""Pallas fused small-domain aggregation kernel (ops/pallas_kernels.py),
run in interpreter mode on CPU.  Exactness of the 8-bit limb decomposition
is the load-bearing property: decimal (int64-scaled) sums must match int64
arithmetic bit-for-bit (hash_aggregate.rs:409 equivalence)."""

import numpy as np
import pytest

import jax.numpy as jnp

from datafusion_tpu.ops.pallas_kernels import TILE_SUBLANES, smalldomain_sum_count

TILE = TILE_SUBLANES * 128


@pytest.mark.parametrize("ntiles,domain,k", [(1, 3, 1), (2, 5, 2), (3, 2, 3)])
def test_limb_sums_exact(ntiles, domain, k):
    rng = np.random.default_rng(ntiles * 100 + domain * 10 + k)
    n = TILE * ntiles
    gid = rng.integers(0, domain + 1, n).astype(np.int32)  # == domain: dead
    cols = [
        rng.integers(-(10**14), 10**14, n).astype(np.int64) for _ in range(k)
    ]
    masks = [rng.random(n) > 0.2 for _ in range(k)]

    sums, counts = smalldomain_sum_count(
        jnp.asarray(gid),
        tuple(jnp.asarray(c) for c in cols),
        tuple(jnp.asarray(m) for m in masks),
        domain,
        interpret=True,
    )
    sums = np.asarray(sums)
    counts = np.asarray(counts)
    for d in range(domain):
        for ci in range(k):
            sel = (gid == d) & masks[ci]
            assert sums[d, ci] == cols[ci][sel].sum()
            assert counts[d, ci] == sel.sum()


def test_all_dead_rows():
    n = TILE
    gid = np.full(n, 9, np.int32)  # everything outside the domain
    sums, counts = smalldomain_sum_count(
        jnp.asarray(gid),
        (jnp.asarray(np.ones(n, np.int64)),),
        (jnp.asarray(np.ones(n, bool)),),
        4,
        interpret=True,
    )
    assert np.asarray(sums).sum() == 0
    assert np.asarray(counts).sum() == 0


def test_sql_through_pallas_path(monkeypatch):
    """Full SQL (Q1-shaped) through the forced-interpret pallas path must be
    row-exact vs pandas, including exact decimal sums."""
    monkeypatch.setenv("DATAFUSION_TPU_FORCE_PALLAS", "interpret")
    from datafusion_tpu import ExecutionContext
    from datafusion_tpu.columnar import Table
    from datafusion_tpu.types.dtypes import decimal

    rng = np.random.default_rng(0)
    n = 50000  # cap rounds to 65536 = one kernel tile
    t = Table.from_pydict(
        {
            "flag": rng.choice(["A", "N", "R"], n),
            "qty": (rng.integers(1, 51, n) * 100).astype(np.int64),
            "price": rng.integers(90000, 10500000, n),
        },
        dtypes={"qty": decimal(15, 2), "price": decimal(15, 2)},
    )
    ctx = ExecutionContext()
    ctx.register_table("t", t)
    out = (
        ctx.sql(
            "SELECT flag, sum(qty) sq, sum(price) sp, avg(qty) aq, count(*) c "
            "FROM t GROUP BY flag ORDER BY flag"
        )
        .collect()
        .to_pandas()
    )
    df = t.to_pandas()
    exp = (
        df.groupby("flag")
        .agg(sq=("qty", "sum"), sp=("price", "sum"), aq=("qty", "mean"), c=("qty", "size"))
        .reset_index()
    )
    assert list(out["c"]) == list(exp["c"])
    assert np.allclose(out["sq"], exp["sq"])
    assert np.allclose(out["sp"], exp["sp"])
    assert np.allclose(out["aq"], exp["aq"])
