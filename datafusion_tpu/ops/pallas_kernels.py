"""Pallas TPU kernels for hot aggregate paths.

Reference hot loop being replaced: the per-row group-accumulator loop of
HashAggregateExec (/root/reference/datafusion/src/physical_plan/
hash_aggregate.rs:409 `group_aggregate_batch`).  The XLA path in
physical/stage_compiler.py lowers small-domain GROUP BY to one [D, N]
masked broadcast-reduction per aggregate, which re-reads the group-id
vector once per aggregate.  This kernel makes ONE pass over the data for
ALL aggregates: a double-buffered DMA pipeline streams row tiles from HBM
into VMEM and folds them into persistent VMEM accumulators.

Two environment constraints shape the implementation (bench/MICRO.md
rules 10-11):

- Mosaic here is 32-bit only (f64 reductions and int64 kernels fail to
  compile), while TPC-H decimal sums need exact int64 arithmetic.
  Exactness comes from 8-bit limb decomposition: each int64 column arrives
  as two int32 word planes, each word splits into four unsigned 8-bit
  limbs, per-lane limb sums accumulate in int32 (rows/lane at 2^23-row
  capacity is 2^16; 2^16 * 255 < 2^31 — no overflow), and the host-side
  epilogue recombines sum(x) == sum_limbs(limb_sum_i * 2^(8*i)) in
  wrapping int64 arithmetic, which is exact.
- The remote-compile service rejects ANY Mosaic kernel that uses a pallas
  grid, so tiling is hand-rolled: inputs stay in HBM (`pltpu.ANY`), a
  `fori_loop` walks row tiles, and `pltpu.make_async_copy` double-buffers
  HBM->VMEM so the next tile's DMA overlaps the current tile's compute.
  All in-kernel scalars/indices are pinned to int32: under x64 jax's bare
  literals are i64 and Mosaic's i64<->i32 convert helper recurses.

Layout: every [N] row vector is viewed as [N/128, 128] — rows map to
sublanes, the 128 lanes are parallel accumulation slots.  Accumulator
indexing is static (python-unrolled over groups x columns x limbs), so
every store is a full 128-lane row store.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

TILE_SUBLANES = 512  # 512 x 128 = 65,536 rows per tile
PLANES = 9  # 8 x 8-bit limbs + 1 count plane per column


def _make_kernel(domain: int, ncols: int, ntiles: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nplanes = 1 + 3 * ncols  # gid + (w0, w1, mask) per column
    tr = TILE_SUBLANES

    def kernel(*refs):
        hbm = refs[:nplanes]
        out_ref = refs[nplanes]

        def body(bufs, acc, sems):
            i32 = partial(jnp.asarray, dtype=jnp.int32)

            def dma(plane, slot, ci):
                # every slice index pinned to int32: under x64 python ints
                # become i64, which tpu.memref_slice rejects
                return pltpu.make_async_copy(
                    hbm[plane].at[pl.ds(ci * i32(tr), tr), :],
                    bufs.at[i32(plane), slot],
                    sems.at[i32(plane), slot],
                )

            def start_all(slot, ci):
                for p in range(nplanes):
                    dma(p, slot, ci).start()

            def wait_all(slot, ci):
                for p in range(nplanes):
                    dma(p, slot, ci).wait()

            zero = i32(0)
            one = i32(1)
            acc[...] = jnp.zeros_like(acc)
            start_all(zero, zero)

            def step(ci, carry):
                slot = jax.lax.rem(ci, i32(2))
                nxt = jax.lax.rem(ci + one, i32(2))

                @pl.when(ci + one < i32(ntiles))
                def _():
                    start_all(nxt, ci + one)

                wait_all(slot, ci)

                gid = bufs[i32(0), slot]
                for c in range(ncols):
                    w0 = bufs[i32(1 + 3 * c), slot]
                    w1 = bufs[i32(2 + 3 * c), slot]
                    m = bufs[i32(3 + 3 * c), slot] != zero
                    limbs = [
                        (w0 >> 0) & 0xFF, (w0 >> 8) & 0xFF,
                        (w0 >> 16) & 0xFF, (w0 >> 24) & 0xFF,
                        (w1 >> 0) & 0xFF, (w1 >> 8) & 0xFF,
                        (w1 >> 16) & 0xFF, (w1 >> 24) & 0xFF,
                    ]
                    for d in range(domain):
                        hit = (gid == i32(d)) & m
                        base = (d * ncols + c) * PLANES
                        for p in range(8):
                            acc[base + p, :] += jnp.sum(
                                jnp.where(hit, limbs[p], zero),
                                axis=0,
                                dtype=jnp.int32,
                            )
                        acc[base + 8, :] += jnp.sum(
                            jnp.where(hit, one, zero), axis=0, dtype=jnp.int32
                        )
                return carry

            jax.lax.fori_loop(i32(0), i32(ntiles), step, i32(0))
            out_ref[...] = acc[...]

        pl.run_scoped(
            body,
            bufs=pltpu.VMEM((nplanes, 2, tr, 128), jnp.int32),
            acc=pltpu.VMEM((domain * ncols * PLANES, 128), jnp.int32),
            sems=pltpu.SemaphoreType.DMA((nplanes, 2)),
        )

    return kernel


@partial(jax.jit, static_argnames=("domain", "interpret"))
def smalldomain_sum_count(
    gid: jnp.ndarray,
    cols64: tuple,
    vmasks: tuple,
    domain: int,
    interpret: bool = False,
):
    """Exact grouped sums + counts of int64 columns for a small group domain.

    gid    : [N] int32 group id per row (anything >= domain means 'no group')
    cols64 : tuple of [N] int64 value columns
    vmasks : tuple of [N] bool validity masks (dead rows already False)
    Returns (sums [domain, k] int64, counts [domain, k] int64).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = gid.shape[0]
    k = len(cols64)
    tile = TILE_SUBLANES * 128
    assert n % tile == 0, f"capacity {n} must be a multiple of {tile}"
    ntiles = n // tile

    def shape2d(x):
        return x.reshape(n // 128, 128)

    ins = [shape2d(gid.astype(jnp.int32))]
    for c, m in zip(cols64, vmasks):
        words = jax.lax.bitcast_convert_type(c, jnp.int32)  # [N, 2]
        ins.append(shape2d(words[:, 0]))
        ins.append(shape2d(words[:, 1]))
        ins.append(shape2d(m.astype(jnp.int32)))

    nrows_acc = domain * k * PLANES
    out = pl.pallas_call(
        _make_kernel(domain, k, ntiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in ins],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows_acc, 128), jnp.int32),
        interpret=interpret,
    )(*ins)

    # lanes -> int64, limbs -> values (wrapping int64 arithmetic is exact)
    lane_sums = jnp.sum(out.astype(jnp.int64), axis=1)  # [D*k*PLANES]
    lane_sums = lane_sums.reshape(domain, k, PLANES)
    weights = (jnp.int64(1) << (8 * jnp.arange(8, dtype=jnp.int64)))
    sums = jnp.sum(lane_sums[:, :, :8] * weights[None, None, :], axis=-1)
    counts = lane_sums[:, :, 8]
    return sums, counts
