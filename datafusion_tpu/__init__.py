"""datafusion_tpu — a TPU-native vectorized SQL/DataFrame query-execution engine.

A from-scratch reimplementation of the *capabilities* of DataFusion + Ballista
(reference: /root/reference, surveyed in SURVEY.md) designed TPU-first:

- Columnar batches live in HBM as structure-of-arrays jax buffers with validity
  masks and dictionary-encoded strings (instead of Arrow Rust arrays).
- Operators are whole-column jit-compiled XLA programs (instead of Tokio
  pull-based RecordBatch streams): filter/projection expression evaluation,
  sort/segment based hash aggregate and equi-join, radix/lexicographic sort.
- Multi-chip scale-out is SPMD over a jax.sharding.Mesh with all-to-all
  hash shuffles over ICI (instead of Ballista's gRPC/Flight shuffle).

Layer map mirrors the reference (SURVEY.md §1):
  L0/L1 columnar substrate  -> datafusion_tpu.columnar, datafusion_tpu.types
  L2 physical ops/exprs     -> datafusion_tpu.ops, datafusion_tpu.exprs,
                               datafusion_tpu.functions
  L3 logical plan/optimizer -> datafusion_tpu.logical, datafusion_tpu.optimizer
       + SQL front end      -> datafusion_tpu.sql
  L4 physical planning      -> datafusion_tpu.physical
  L5 session/API            -> datafusion_tpu.execution
  L6 catalog & datasources  -> datafusion_tpu.catalog, datafusion_tpu.datasource
  L7 distributed            -> datafusion_tpu.parallel
  L8 front ends/tooling     -> datafusion_tpu.cli, bench/
"""

import os as _os

import jax as _jax

# Honor JAX_PLATFORMS while the config is still unset: a site hook may
# have registered another backend before this import, and the env var
# alone is silently overridden.  An explicit jax.config.update
# ("jax_platforms", ...) made before importing this package (e.g.
# tests/conftest.py forcing cpu) ALWAYS wins — a library import must not
# undo the embedding program's choice (the host profile itself may export
# JAX_PLATFORMS, so env-always-wins would re-override conftest).  Entry
# points we own (cli.py, distributed.rpc) re-assert the env explicitly.
if _os.environ.get("JAX_PLATFORMS") and getattr(_jax.config, "jax_platforms", None) in (None, ""):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - backend already initialized
        pass

# The engine requires 64-bit ints/floats for SQL semantics (BIGINT, DOUBLE,
# DECIMAL-as-int64).  TPU MXU work stays in 32/16-bit; columnar transforms are
# memory-bound elementwise/segment ops where x64 emulation is acceptable.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: kernel variants are keyed on
# (dtype, capacity-bucket), so repeated queries and repeated sessions reuse
# compiled programs instead of re-invoking XLA.
# (opt-in via env: XLA:CPU AOT cache entries are machine-feature-pinned and
# noisy to reload, so this is off unless explicitly requested)
_cache_dir = _os.environ.get("DATAFUSION_TPU_JAX_CACHE")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass

from .errors import DataFusionError  # noqa: E402

try:  # full API — available once all layers are present
    from .execution.context import ExecutionConfig, ExecutionContext  # noqa: E402
    from .execution.dataframe import DataFrame  # noqa: E402
    from .logical.expr import col, lit  # noqa: E402
except ImportError:  # pragma: no cover - partial builds during bring-up
    pass

__version__ = "0.1.0"

__all__ = [
    "ExecutionContext",
    "ExecutionConfig",
    "DataFrame",
    "DataFusionError",
    "col",
    "lit",
]
