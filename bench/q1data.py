"""Fast lineitem-only generator for the Q1/Q6 benchmarks (pure numpy, no
Python string loops — SF1 in a couple of seconds)."""

from __future__ import annotations

import numpy as np

from datafusion_tpu.columnar.column import Column
from datafusion_tpu.columnar.dictionary import StringDict
from datafusion_tpu.columnar.table import Table, round_capacity
from datafusion_tpu.types.dtypes import DATE32, STRING, decimal

_EPOCH = np.datetime64("1970-01-01", "D")


def generate_lineitem_q1(sf: float = 1.0, seed: int = 7) -> Table:
    rng = np.random.default_rng(seed)
    n = int(6_001_215 * sf)
    dec2 = decimal(15, 2)

    qty = rng.integers(1, 51, n).astype(np.int64) * 100  # scaled(2)
    price = rng.integers(90_000, 10_500_000, n).astype(np.int64)  # scaled(2)
    disc = rng.integers(0, 11, n).astype(np.int64)  # scaled(2): 0.00-0.10
    tax = rng.integers(0, 9, n).astype(np.int64)
    ship_lo = (np.datetime64("1992-01-02", "D") - _EPOCH).astype(int)
    ship_hi = (np.datetime64("1998-12-01", "D") - _EPOCH).astype(int)
    shipdate = rng.integers(ship_lo, ship_hi, n).astype(np.int32)
    rf = rng.integers(0, 3, n).astype(np.int32)  # codes into sorted dict
    ls = rng.integers(0, 2, n).astype(np.int32)

    cap = round_capacity(n)
    rf_dict = StringDict(np.array(["A", "N", "R"], dtype=object))
    ls_dict = StringDict(np.array(["F", "O"], dtype=object))

    cols = {
        "l_quantity": Column.from_numpy(dec2, qty, capacity=cap),
        "l_extendedprice": Column.from_numpy(dec2, price, capacity=cap),
        "l_discount": Column.from_numpy(dec2, disc, capacity=cap),
        "l_tax": Column.from_numpy(dec2, tax, capacity=cap),
        "l_returnflag": Column.from_numpy(STRING, rf, dictionary=rf_dict, capacity=cap),
        "l_linestatus": Column.from_numpy(STRING, ls, dictionary=ls_dict, capacity=cap),
        "l_shipdate": Column.from_numpy(DATE32, shipdate, capacity=cap),
    }
    return Table(list(cols), list(cols.values()), n)
