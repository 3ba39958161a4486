"""Device-resident columns: structure-of-arrays with validity masks.

Replaces Arrow arrays + validity bitmaps (reference L0, SURVEY.md §1) with
jnp buffers in HBM: ``data`` (fixed-width storage dtype) + ``valid`` (bool
mask).  Strings carry a host-side sorted StringDict (see dictionary.py).
Buffers are padded to a static capacity; live-row count is tracked by the
owning Table.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..types.dtypes import DataType
from .dictionary import StringDict


def list_null_sentinel(elem: DataType):
    """In-band null sentinel for fixed-size-list ELEMENTS: NaN for floats,
    INT_MIN for integer-backed types, code -1 for dictionary strings."""
    st = elem.storage_np_dtype()
    if np.issubdtype(st, np.floating):
        return st.type(np.nan)
    if elem.is_string:
        return np.int32(-1)
    if st == np.bool_:
        return np.bool_(False)  # bool lists: nulls collapse to false
    return st.type(np.iinfo(st).min)


def list_element_valid(elem: DataType, data: np.ndarray) -> np.ndarray:
    """Element-validity mask recovered from the in-band sentinels."""
    st = elem.storage_np_dtype()
    if np.issubdtype(st, np.floating):
        return ~np.isnan(data)
    if elem.is_string:
        return data >= 0
    if st == np.bool_:
        return np.ones(data.shape, bool)
    return data != np.iinfo(st).min


@dataclass
class Column:
    """One column: device data + device validity + logical type (+ dict)."""

    dtype: DataType
    data: jnp.ndarray  # shape (capacity,), storage dtype; lists: (capacity, k)
    valid: jnp.ndarray  # shape (capacity,), bool
    dictionary: StringDict | None = None  # strings only
    # host-known constant value when the column came from a literal; lets
    # host-side scalar-arg functions (substr/lpad/date_part...) read the
    # value without touching device data (which may be a tracer under
    # whole-stage jit compilation)
    literal: object = None
    # host-known (min, max) of the live values for integer-backed columns,
    # recorded at ingest and propagated through row-subset operators
    # (filter/sort/join/shuffle).  Purely an optimization hint: when the
    # range fits int32, sort keys and gather rides run at native 32-bit
    # width instead of x64-emulated int64 (~2x on the hot sort/gather
    # passes, bench/MICRO.md).  The fork's 32-bit comparators
    # (total_cmp_32, SURVEY.md §1 L0) exist for the same reason.
    vrange: tuple | None = None

    @property
    def capacity(self) -> int:
        return int(self.data.shape[0])

    @staticmethod
    def from_numpy(
        dtype: DataType,
        data: np.ndarray,
        valid: np.ndarray | None = None,
        dictionary: StringDict | None = None,
        capacity: int | None = None,
    ) -> "Column":
        n = len(data)
        cap = capacity if capacity is not None else n
        storage = dtype.storage_np_dtype()
        buf = np.zeros(cap, dtype=storage)
        buf[:n] = data.astype(storage, copy=False)
        v = np.zeros(cap, dtype=bool)
        if valid is None:
            v[:n] = True
        else:
            v[:n] = valid
        vrange = None
        if (
            buf.ndim == 1
            and storage.kind in "iu"
            and storage.itemsize == 8
            and n > 0
        ):
            live = buf[:n][v[:n]]
            if live.size:
                vrange = (int(live.min()), int(live.max()))
        return Column(dtype, jnp.asarray(buf), jnp.asarray(v), dictionary, vrange=vrange)

    def to_numpy(self, nrows: int) -> tuple[np.ndarray, np.ndarray]:
        """(data, valid) for the first ``nrows`` live rows, as numpy."""
        return np.asarray(self.data[:nrows]), np.asarray(self.valid[:nrows])

    def to_pylist(self, nrows: int) -> list:
        """Decode to Python values (strings decoded, decimals rescaled)."""
        data, valid = self.to_numpy(nrows)
        if self.dtype.is_list:
            # element nulls are IN-BAND sentinels (NaN / INT_MIN / code -1:
            # they survive fused stages, gathers, and shuffles, unlike a
            # side validity plane), decoded here per element position
            # (reference array() -> FixedSizeList, array_expressions.rs:63)
            k = self.dtype.list_size
            ev = list_element_valid(self.dtype.elem, data)
            elems = [
                Column(
                    self.dtype.elem,
                    jnp.asarray(data[:, j]),
                    jnp.asarray(ev[:, j]),
                    self.dictionary,
                ).to_pylist(nrows)
                for j in range(k)
            ]
            if not k:
                return [[] if ok else None for ok in valid]
            return [
                list(vals) if ok else None
                for vals, ok in zip(zip(*elems), valid)
            ]
        if self.dtype.is_string:
            assert self.dictionary is not None
            vals = self.dictionary.decode(data)
            return [v if ok else None for v, ok in zip(vals, valid)]
        if self.dtype.is_decimal:
            scale = 10 ** self.dtype.scale
            return [int(v) / scale if ok else None for v, ok in zip(data, valid)]
        if self.dtype.kind == "date32":
            import datetime as _dt

            epoch = _dt.date(1970, 1, 1)
            return [
                epoch + _dt.timedelta(days=int(v)) if ok else None
                for v, ok in zip(data, valid)
            ]
        if self.dtype.kind == "timestamp":
            import datetime as _dt

            return [
                _dt.datetime.fromtimestamp(int(v) / 1e6, tz=_dt.timezone.utc).replace(tzinfo=None)
                if ok
                else None
                for v, ok in zip(data, valid)
            ]
        if self.dtype.is_bool:
            return [bool(v) if ok else None for v, ok in zip(data, valid)]
        if self.dtype.is_float:
            return [float(v) if ok else None for v, ok in zip(data, valid)]
        return [v.item() if ok else None for v, ok in zip(data, valid)]

    def with_capacity(self, capacity: int) -> "Column":
        """Grow/shrink padding to a new static capacity."""
        cap = self.capacity
        if capacity == cap:
            return self
        if capacity > cap:
            pad = capacity - cap
            data = jnp.concatenate([self.data, jnp.zeros(pad, self.data.dtype)])
            valid = jnp.concatenate([self.valid, jnp.zeros(pad, bool)])
        else:
            data = self.data[:capacity]
            valid = self.valid[:capacity]
        return Column(self.dtype, data, valid, self.dictionary, vrange=self.vrange)
