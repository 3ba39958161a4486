"""Whole-query compilation: trace an entire warm physical plan into ONE
XLA program.

The reference executes a query as one plan object whose operators stream
batches through each other (/root/reference/datafusion/src/physical_plan/
planner.rs:341 — one plan, one execution).  The TPU translation of that
economics is one *program*: once every join in a plan has learned
(expansion, output) capacities and every fused stage has a learned output
capacity, the full warm execution path is trace-pure — no host syncs —
so the whole tree (scans -> fused stages -> join phases A+B -> fused
tails) can be traced under a single `jax.jit` with the leaf tables'
buffers as arguments and the per-join overflow flags summed into one
scalar output.

Why it pays: a warm multi-join query (TPC-H q2/q7/q9/q18) otherwise runs
as ~5-15 separate programs; each dispatch through a remote-TPU tunnel
costs ~10-30 ms of host latency, and XLA cannot fuse or overlap across
program boundaries.  One program = one dispatch, and XLA schedules the
whole query as a single dependency graph.

Contract with the speculation machinery (ops/kernels.py):

- The trace happens inside the caller's speculation window, so every join
  takes its learned-capacity path and records a *traced* overflow flag.
  Those traced flags are collected off the thread-local window and summed
  into the program's flag output; at run time the caller records the
  CONCRETE flag into its window, preserving the one-sync-per-query
  overflow contract.
- Any node that needs a host value (a cold join sizing its buffers, a
  morsel-streamed scan, EXPLAIN) raises a concretization error during
  tracing; the attempt is abandoned and the plan keeps executing node by
  node.  After MAX_ATTEMPTS failed traces the plan stops trying.
- A speculative overflow at run time invalidates the compiled program:
  the exact rerun re-learns capacities, and the next run re-traces with
  the new sizes.
"""

from __future__ import annotations

import os
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.table import Table

_TRACE = threading.local()  # .bindings: {id(node): (view, node)} | absent


def active() -> bool:
    """True while a whole-query trace is being built on this thread."""
    return getattr(_TRACE, "bindings", None) is not None


def bound_view(node) -> Table | None:
    """The tracer-view table bound to a leaf scan during a whole-query
    trace (MemoryExec checks this before returning its concrete table)."""
    b = getattr(_TRACE, "bindings", None)
    if b is None:
        return None
    ent = b.get(id(node))
    if ent is None or ent[1] is not node:
        return None
    return ent[0]


def concrete_of(node) -> Table:
    """Execute a leaf scan OUTSIDE the current trace bindings: the
    concrete table (eager data), used for runtime probes whose results
    become static constants of the traced program (valid because the plan
    cache pins the data for the life of the program)."""
    b = getattr(_TRACE, "bindings", None)
    _TRACE.bindings = None
    try:
        return node.execute()
    finally:
        _TRACE.bindings = b


def _discover_leaves(plan, out, seen):
    """All MemoryExec scans reachable from `plan`, including the ones
    hidden under StageExec (whose children() is empty by design)."""
    from ..ops.basic import MemoryExec
    from .fuse import StageExec

    if id(plan) in seen:
        return
    seen.add(id(plan))
    if isinstance(plan, MemoryExec):
        if not any(n is plan for n in out):
            out.append(plan)
        return
    if isinstance(plan, StageExec):
        _discover_leaves(plan._source, out, seen)
        return
    for c in plan.children():
        _discover_leaves(c, out, seen)


def _contains_untraceable(plan) -> bool:
    """True when the tree contains a node whose execution is inherently
    host-driven (morsel streaming loops, EXPLAIN formatting) — a
    whole-query trace attempt would always fail."""
    from ..datasource.host import HostMemoryExec
    from ..ops.basic import ExplainExec
    from .fuse import StageExec
    from .morsel import MorselJoinStageExec, MorselStageExec

    bad = (MorselStageExec, MorselJoinStageExec, HostMemoryExec, ExplainExec)
    seen: set = set()

    def walk(n) -> bool:
        if id(n) in seen:
            return False
        seen.add(id(n))
        if isinstance(n, bad):
            return True
        kids = list(n.children())
        if isinstance(n, StageExec):
            kids.append(n._source)
        return any(walk(c) for c in kids)

    return walk(plan)


class WholeQuery:
    """Per-plan-object whole-query program (plans are cached per
    (sql, catalog version) in ExecutionContext, so one instance sees every
    warm run of its query)."""

    MAX_ATTEMPTS = 3

    def __init__(self, phys):
        self.phys = phys
        self._fn = None
        self._out_meta = None  # (names, [(dtype, dictionary, vrange)])
        self._has_flag = False  # set at trace time: any speculative flags?
        self._attempts = 0
        # fast-fail: plans containing host-streaming (morsel) or
        # host-formatting nodes can never whole-trace — marking them dead
        # up front avoids paying a doomed full trace on every warm run
        # until MAX_ATTEMPTS runs out
        self._dead = _contains_untraceable(phys)

    # ------------------------------------------------------------------
    def invalidate(self):
        """Speculative overflow: learned capacities are about to change;
        drop the compiled program so the next run re-traces."""
        self._fn = None
        self._out_meta = None
        self._attempts = 0

    # ------------------------------------------------------------------
    def execute(self) -> Table | None:
        """Run the whole-query program, building it on first use.
        Returns None when the plan cannot (yet) be whole-traced."""
        if self._dead:
            return None
        from ..ops import kernels as K

        if not K.spec_active():
            return None  # exact mode / no window: run node-by-node
        leaves = []
        _discover_leaves(self.phys, leaves, set())
        if not leaves:
            return None  # constant plans (EXPLAIN, VALUES) gain nothing
        leaf_tables = [n.execute() for n in leaves]
        flat: list = []
        for t in leaf_tables:
            for c in t.columns:
                flat.append(c.data)
                flat.append(c.valid)

        if self._fn is None:
            self._attempts += 1
            if self._attempts > self.MAX_ATTEMPTS:
                self._dead = True
                return None
            outs = self._build(leaves, leaf_tables, flat)
            if outs is None:
                return None
        else:
            try:
                outs = self._fn(*flat)
            except Exception:
                # leaf shapes drifted from the learning run (re-registered
                # table etc.): rebuild once on the next execution
                self._fn = None
                return None
        names, col_meta = self._out_meta
        if self._has_flag:
            *bufs, nrows, flag = outs
            K.spec_record(flag)
        else:
            # flag-free trace (no speculative joins/stages): emitting a
            # constant-zero flag would cost the window's one host sync
            # (~28 ms through the TPU tunnel) on queries that never
            # needed it — q1/q6-class single-stage plans
            *bufs, nrows = outs
        half = len(bufs) // 2
        cols = [
            Column(dt, d, v, dic, vrange=vr)
            for (dt, dic, vr), d, v in zip(col_meta, bufs[:half], bufs[half:])
        ]
        out = Table(list(names), cols, nrows)
        out._cap_learned = True
        return out

    # ------------------------------------------------------------------
    def _build(self, leaves, leaf_tables, flat):
        """Trace + compile + run once.  Returns the first run's outputs,
        or None when the plan is not (yet) whole-traceable."""
        from ..ops import kernels as K

        def program(*args):
            # rebuild tracer views of each leaf table (static nrows: the
            # plan cache is keyed on the catalog version, so a leaf's
            # row count is fixed for the life of this program)
            bindings = {}
            it = iter(args)
            for node, t in zip(leaves, leaf_tables):
                cols = [
                    Column(c.dtype, next(it), next(it), c.dictionary, vrange=c.vrange)
                    for c in t.columns
                ]
                bindings[id(node)] = (Table(list(t.names), cols, t.nrows), node)
            s = K.SPECULATION
            base_len = len(s.flags)
            _TRACE.bindings = bindings
            try:
                out = self.phys.execute()
            finally:
                _TRACE.bindings = None
                traced_flags = s.flags[base_len:]
                del s.flags[base_len:]
            self._has_flag = bool(traced_flags)
            self._out_meta = (
                list(out.names),
                [(c.dtype, c.dictionary, c.vrange) for c in out.columns],
            )
            bufs = tuple(c.data for c in out.columns) + tuple(
                c.valid for c in out.columns
            )
            outs = bufs + (jnp.asarray(out.nrows_dev),)
            if traced_flags:
                flag = jnp.int32(0)
                for f in traced_flags:
                    flag = flag + jnp.asarray(f, jnp.int32)
                outs = outs + (flag,)
            return outs

        s = K.SPECULATION
        snap = len(s.flags)
        fn = jax.jit(program)
        try:
            # first call traces AND runs; subsequent runs reuse the
            # compiled program
            outs = fn(*flat)
        except Exception:
            del s.flags[snap:]  # drop any tracer flags a partial trace left
            self._fn = None
            return None
        self._fn = fn
        return outs


def _enabled() -> bool:
    return not os.environ.get("DFTPU_NO_WHOLE_QUERY")


def try_whole_query(phys) -> Table | None:
    """Entry point for ExecutionContext.collect: attempt the whole-query
    program for a previously-executed plan.  Returns the result Table or
    None (caller falls back to node-by-node execution)."""
    if not _enabled():
        return None
    wq = getattr(phys, "_whole_query", None)
    if wq is None:
        # first collect of this plan object: let the node-by-node path
        # run once to learn capacities (a premature trace would just fail
        # on the cold joins' sizing syncs)
        phys._whole_query = WholeQuery(phys)
        return None
    return wq.execute()


def invalidate(phys) -> None:
    wq = getattr(phys, "_whole_query", None)
    if wq is not None:
        wq.invalidate()
