"""ctypes bindings for the native host runtime (native/libdftpu.so).

The reference engine's runtime is native end-to-end; here the device
compute path is XLA/Pallas and the HOST hot paths are C++ (native/
dftpu_native.cpp): the columnar CSV/TBL data loader, the shuffle hash
partitioner, and bulk gather for spill writes.  Everything degrades
gracefully to the pure-Python implementations when the library has not
been built (build with `make -C native`; it is also built on demand the
first time this module is imported with a toolchain present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdftpu.so")

_lib = None
_lib_lock = threading.Lock()
_tried = False

# column kind codes (must match ColKind in dftpu_native.cpp)
K_INT64, K_FLOAT64, K_DATE32, K_DECIMAL, K_BOOL, K_STRING, K_TIMESTAMP = range(7)


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            capture_output=True,
            timeout=120,
        )
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.dftpu_csv_open.restype = ctypes.c_void_p
        lib.dftpu_csv_open.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.dftpu_csv_nrows.restype = ctypes.c_long
        lib.dftpu_csv_nrows.argtypes = [ctypes.c_void_p]
        lib.dftpu_csv_column.restype = None
        lib.dftpu_csv_column.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.dftpu_csv_dict_size.restype = ctypes.c_long
        lib.dftpu_csv_dict_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.dftpu_csv_dict_bytes.restype = ctypes.c_long
        lib.dftpu_csv_dict_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.dftpu_csv_dict_has_newline.restype = ctypes.c_int
        lib.dftpu_csv_dict_has_newline.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.dftpu_csv_dict_values.restype = None
        lib.dftpu_csv_dict_values.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_char_p,
        ]
        lib.dftpu_csv_free.restype = None
        lib.dftpu_csv_free.argtypes = [ctypes.c_void_p]
        lib.dftpu_partition.restype = None
        lib.dftpu_partition.argtypes = [
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def _kind_of(dtype) -> int | None:
    k = dtype.kind
    if k in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"):
        return K_INT64
    if k in ("float32", "float64"):
        return K_FLOAT64
    if k == "date32":
        return K_DATE32
    if k == "decimal":
        return K_DECIMAL
    if k == "bool":
        return K_BOOL
    if k == "string":
        return K_STRING
    if k == "timestamp":
        return K_TIMESTAMP
    return None


def load_csv(path: str, schema, delimiter: str = ",", has_header: bool = True):
    """Parse a CSV/TBL file into a Table using the native loader.

    Returns None when the library is unavailable or the schema has a type
    the loader does not handle (caller falls back to pyarrow).
    """
    lib = get_lib()
    if lib is None:
        return None
    kinds = []
    scales = []
    for f in schema.fields:
        kk = _kind_of(f.dtype)
        if kk is None:
            return None
        kinds.append(kk)
        scales.append(f.dtype.scale if f.dtype.is_decimal else 0)
    n = len(kinds)
    kinds_c = (ctypes.c_int * n)(*kinds)
    scales_c = (ctypes.c_int * n)(*scales)
    h = lib.dftpu_csv_open(
        path.encode(), delimiter.encode()[:1], 1 if has_header else 0, n, kinds_c, scales_c
    )
    if not h:
        return None
    try:
        nrows = lib.dftpu_csv_nrows(h)
        if nrows < 0:
            return None
        from .columnar.column import Column
        from .columnar.dictionary import StringDict
        from .columnar.table import Table, round_capacity

        cap = round_capacity(nrows)
        cols = []
        for j, f in enumerate(schema.fields):
            kk = kinds[j]
            valid = np.zeros(nrows, dtype=np.uint8)
            if kk in (K_INT64, K_DECIMAL, K_TIMESTAMP):
                data = np.zeros(nrows, dtype=np.int64)
            elif kk == K_FLOAT64:
                data = np.zeros(nrows, dtype=np.float64)
            elif kk == K_BOOL:
                data = np.zeros(nrows, dtype=np.uint8)
            else:  # date32 / string codes
                data = np.zeros(nrows, dtype=np.int32)
            lib.dftpu_csv_column(
                h,
                j,
                data.ctypes.data_as(ctypes.c_void_p),
                valid.ctypes.data_as(ctypes.c_void_p),
            )
            dic = None
            if kk == K_STRING:
                if lib.dftpu_csv_dict_has_newline(h, j):
                    return None  # rare: fall back to pyarrow
                nb = lib.dftpu_csv_dict_bytes(h, j)
                nv = lib.dftpu_csv_dict_size(h, j)
                buf = ctypes.create_string_buffer(int(nb) + 1)
                lib.dftpu_csv_dict_values(h, j, buf)
                raw = buf.raw[: int(nb)].decode("utf-8", errors="replace")
                vals = raw.split("\n")[: int(nv)]
                dic = StringDict(np.array(vals, dtype=object))
            storage = f.dtype.storage_np_dtype()
            cols.append(
                Column.from_numpy(
                    f.dtype, data.astype(storage, copy=False), valid.astype(bool), dic, capacity=cap
                )
            )
        return Table([f.name for f in schema.fields], cols, int(nrows))
    finally:
        lib.dftpu_csv_free(h)


def partition_order(hashes: np.ndarray, m: int):
    """Counting-sort permutation for shuffle bucketing.

    Returns (order[n] int64, starts[m+1] int64) or None if unavailable.
    Stable within each bucket (same contract as stable argsort by bucket).
    """
    lib = get_lib()
    if lib is None:
        return None
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    n = len(h)
    order = np.empty(n, dtype=np.int64)
    starts = np.empty(m + 1, dtype=np.int64)
    lib.dftpu_partition(
        h.ctypes.data_as(ctypes.c_void_p),
        n,
        m,
        order.ctypes.data_as(ctypes.c_void_p),
        starts.ctypes.data_as(ctypes.c_void_p),
    )
    return order, starts
