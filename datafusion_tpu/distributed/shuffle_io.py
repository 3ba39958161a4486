"""Shuffle spill files: the at-rest columnar interchange format.

Equivalent of Ballista's Arrow-IPC shuffle files
(/root/reference/ballista/rust/core/src/execution_plans/shuffle_writer.rs:130-260,
/root/reference/ballista/rust/core/src/utils.rs:69 write_stream_to_disk):
a completed stage's output partitions are durable files that never re-run,
fetched by the next stage's readers.  On a TPU pod, intra-slice exchange
uses ICI collectives (datafusion_tpu.parallel.shuffle); these files are the
DCN/host-level data plane between stages on different hosts, and the spill
format for out-of-HBM tables.

Format (``.dfs``, "DataFusion-TPU Shuffle" v1):
    magic  b"DFS1"
    u32 LE header_len
    header: UTF-8 JSON {
        "nrows": int,
        "columns": [{"name", "kind", "precision", "scale", "tz",
                      "np_dtype", "dict": [values]|None}, ...],
    }
    per column, in order: data bytes (nrows * itemsize, C order)
                          valid bytes (nrows * 1, uint8)

A C-level writer/reader for the same format lives in native/ (used when
built; this module is the portable fallback and the format's reference
implementation).
"""

from __future__ import annotations

import json
import os
import struct

import jax.numpy as jnp
import numpy as np

from ..columnar.column import Column
from ..columnar.dictionary import StringDict
from ..columnar.table import Table, round_capacity
from ..errors import InternalError
from ..types.dtypes import DataType

MAGIC = b"DFS1"


def _dtype_to_meta(dt: DataType) -> dict:
    return {
        "kind": dt.kind,
        "precision": dt.precision,
        "scale": dt.scale,
        "tz": dt.tz,
    }


def _dtype_from_meta(m: dict) -> DataType:
    return DataType(m["kind"], m.get("precision", 0), m.get("scale", 0), m.get("tz"))


def write_table(path: str, t: Table) -> dict:
    """Write the live rows of ``t``; returns PartitionStats
    (rows/batches/bytes, mirroring shuffle_writer.rs:260-300)."""
    n = t.nrows
    cols_meta = []
    bufs: list[bytes] = []
    for name, c in zip(t.names, t.columns):
        data = np.asarray(c.data[:n])
        valid = np.asarray(c.valid[:n]).astype(np.uint8)
        meta = _dtype_to_meta(c.dtype)
        meta["name"] = name
        meta["np_dtype"] = data.dtype.str
        meta["dict"] = (
            [str(v) for v in c.dictionary.values] if c.dictionary is not None else None
        )
        cols_meta.append(meta)
        bufs.append(data.tobytes(order="C"))
        bufs.append(valid.tobytes(order="C"))
    header = json.dumps({"nrows": int(n), "columns": cols_meta}).encode("utf-8")
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        for b in bufs:
            f.write(b)
    os.replace(tmp, path)  # atomic: readers never see partial files
    nbytes = sum(len(b) for b in bufs)
    return {"rows": int(n), "batches": 1, "bytes": nbytes, "path": path}


def read_table(path: str) -> Table:
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:4] != MAGIC:
        raise InternalError(f"{path}: bad shuffle file magic")
    (hlen,) = struct.unpack("<I", raw[4:8])
    header = json.loads(raw[8 : 8 + hlen].decode("utf-8"))
    n = header["nrows"]
    off = 8 + hlen
    names, cols = [], []
    cap = round_capacity(n)
    for m in header["columns"]:
        dt = _dtype_from_meta(m)
        np_dt = np.dtype(m["np_dtype"])
        sz = n * np_dt.itemsize
        data = np.frombuffer(raw[off : off + sz], dtype=np_dt)
        off += sz
        valid = np.frombuffer(raw[off : off + n], dtype=np.uint8).astype(bool)
        off += n
        dic = (
            StringDict(np.array(m["dict"], dtype=object))
            if m["dict"] is not None
            else None
        )
        names.append(m["name"])
        cols.append(Column.from_numpy(dt, data, valid, dic, capacity=cap))
    return Table(names, cols, n)


def concat_read(paths: list[str], schema) -> Table:
    """Read several partition files and concatenate (ShuffleReaderExec's
    join_all of fetched streams, shuffle_reader.rs:97-157)."""
    tables = [read_table(p) for p in paths if os.path.exists(p)]
    tables = [t for t in tables if t.nrows > 0]
    if not tables:
        return Table.empty(schema)
    if len(tables) == 1:
        return tables[0]
    total = sum(t.nrows for t in tables)
    cap = round_capacity(total)
    names = tables[0].names
    cols = []
    for j in range(len(names)):
        parts_d = [np.asarray(t.columns[j].data[: t.nrows]) for t in tables]
        parts_v = [np.asarray(t.columns[j].valid[: t.nrows]) for t in tables]
        dt = tables[0].columns[j].dtype
        dics = [t.columns[j].dictionary for t in tables]
        if dt.is_string:
            # N-way merge: one union dictionary, per-part code remaps
            all_vals = np.unique(
                np.concatenate(
                    [d.values.astype(str) for d in dics if d is not None and len(d)]
                    or [np.array([], dtype=str)]
                )
            )
            merged = StringDict(all_vals.astype(object))
            new_parts = []
            for d, dic0 in zip(parts_d, dics):
                if dic0 is None or len(dic0) == 0:
                    new_parts.append(d)
                    continue
                rm = np.searchsorted(all_vals, dic0.values.astype(str)).astype(np.int32)
                new_parts.append(rm[np.clip(d, 0, len(rm) - 1)])
            parts_d = new_parts
            dic = merged
        else:
            dic = None
        data = np.concatenate(parts_d) if parts_d else np.zeros(0, dt.storage_np_dtype())
        valid = np.concatenate(parts_v) if parts_v else np.zeros(0, bool)
        cols.append(Column.from_numpy(dt, data, valid, dic, capacity=cap))
    return Table(list(names), cols, total)
