"""Second golden oracle: the 22 TPC-H queries as hand-written pandas
programs (VERDICT r1 next-step #8 — a second engine next to sqlite so a
shared semantic divergence can't hide a real bug; the reference verifies
against dbgen's printed answers, benchmarks/src/bin/tpch.rs:1008-1070).

Each function takes the datagen dict ({table: {col: np.ndarray}}) and
returns rows (list of tuples) in the query's output column order, dates
rendered as ISO strings (the same row shape `bench.golden.table_to_rows`
produces for the engine).  Implementations follow the SQL in
/root/reference/benchmarks/queries/q*.sql, including the files' quirks
(q1's folded 1998-09-02 literal; q20's `'date 1994-01-01' + interval '1'
year`, read as 1994-01-01..1995-01-01 like the engine and the sqlite
rewriter do).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

_EPOCH = np.datetime64("1970-01-01", "D")


def _days(iso: str) -> int:
    return int((np.datetime64(iso, "D") - _EPOCH).astype(int))


def _iso(days) -> str:
    return str(_EPOCH + np.timedelta64(int(days), "D"))


def _year(days_col: pd.Series) -> pd.Series:
    return (
        _EPOCH + days_col.to_numpy().astype("timedelta64[D]")
    ).astype("datetime64[Y]").astype(int) + 1970


def _frames(data: dict) -> dict[str, pd.DataFrame]:
    return {t: pd.DataFrame(cols) for t, cols in data.items()}


def _rows(df: pd.DataFrame, date_cols=()) -> list[tuple]:
    df = df.copy()
    for c in date_cols:
        df[c] = df[c].map(_iso)
    out = []
    for r in df.itertuples(index=False):
        out.append(
            tuple(
                None
                if (isinstance(v, float) and np.isnan(v))
                else (v.item() if isinstance(v, np.generic) else v)
                for v in r
            )
        )
    return out


def q1(d):
    li = d["lineitem"]
    li = li[li.l_shipdate <= _days("1998-09-02")].copy()
    li["disc_price"] = li.l_extendedprice * (1 - li.l_discount)
    li["charge"] = li.disc_price * (1 + li.l_tax)
    g = li.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("l_quantity", "sum"),
        sum_base_price=("l_extendedprice", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        avg_qty=("l_quantity", "mean"),
        avg_price=("l_extendedprice", "mean"),
        avg_disc=("l_discount", "mean"),
        count_order=("l_quantity", "size"),
    )
    g = g.sort_values(["l_returnflag", "l_linestatus"])
    return _rows(g)


def q2(d):
    ps, s, n, r, p = d["partsupp"], d["supplier"], d["nation"], d["region"], d["part"]
    eu = r[r.r_name == "EUROPE"]
    nn = n.merge(eu, left_on="n_regionkey", right_on="r_regionkey")
    ss = s.merge(nn, left_on="s_nationkey", right_on="n_nationkey")
    pss = ps.merge(ss, left_on="ps_suppkey", right_on="s_suppkey")
    minc = pss.groupby("ps_partkey", as_index=False).ps_supplycost.min()
    minc.columns = ["ps_partkey", "min_cost"]
    pp = p[
        (p.p_size == 15) & p.p_type.str.endswith("BRASS")
    ]
    j = pp.merge(pss, left_on="p_partkey", right_on="ps_partkey").merge(
        minc, on="ps_partkey"
    )
    j = j[j.ps_supplycost == j.min_cost]
    j = j[
        ["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr", "s_address", "s_phone", "s_comment"]
    ].sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
    )
    return _rows(j)


def q3(d):
    c, o, li = d["customer"], d["orders"], d["lineitem"]
    c = c[c.c_mktsegment == "BUILDING"]
    o = o[o.o_orderdate < _days("1995-03-15")]
    li = li[li.l_shipdate > _days("1995-03-15")].copy()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"], as_index=False).rev.sum()
    g = g[["l_orderkey", "rev", "o_orderdate", "o_shippriority"]]
    g = g.sort_values(["rev", "o_orderdate"], ascending=[False, True])
    return _rows(g, date_cols=["o_orderdate"])


def q4(d):
    o, li = d["orders"], d["lineitem"]
    o = o[(o.o_orderdate >= _days("1993-07-01")) & (o.o_orderdate < _days("1993-10-01"))]
    ok = set(li[li.l_commitdate < li.l_receiptdate].l_orderkey)
    o = o[o.o_orderkey.isin(ok)]
    g = o.groupby("o_orderpriority", as_index=False).agg(order_count=("o_orderkey", "size"))
    return _rows(g.sort_values("o_orderpriority"))


def q5(d):
    c, o, li, s, n, r = (
        d["customer"], d["orders"], d["lineitem"], d["supplier"], d["nation"], d["region"],
    )
    r = r[r.r_name == "ASIA"]
    n = n.merge(r, left_on="n_regionkey", right_on="r_regionkey")
    o = o[(o.o_orderdate >= _days("1994-01-01")) & (o.o_orderdate < _days("1995-01-01"))]
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j.c_nationkey == j.s_nationkey]
    j = j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby("n_name", as_index=False).rev.sum()
    return _rows(g.sort_values("rev", ascending=False))


def q6(d):
    li = d["lineitem"]
    m = (
        (li.l_shipdate >= _days("1994-01-01"))
        & (li.l_shipdate < _days("1995-01-01"))
        & (li.l_discount >= 0.06 - 0.01)
        & (li.l_discount <= 0.06 + 0.01)
        & (li.l_quantity < 24)
    )
    return [(float((li.l_extendedprice[m] * li.l_discount[m]).sum()),)]


def q7(d):
    s, li, o, c, n = d["supplier"], d["lineitem"], d["orders"], d["customer"], d["nation"]
    li = li[
        (li.l_shipdate >= _days("1995-01-01")) & (li.l_shipdate <= _days("1996-12-31"))
    ]
    j = (
        li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n.add_prefix("s_n_"), left_on="s_nationkey", right_on="s_n_n_nationkey")
        .merge(n.add_prefix("c_n_"), left_on="c_nationkey", right_on="c_n_n_nationkey")
    )
    j = j[
        ((j.s_n_n_name == "FRANCE") & (j.c_n_n_name == "GERMANY"))
        | ((j.s_n_n_name == "GERMANY") & (j.c_n_n_name == "FRANCE"))
    ].copy()
    j["l_year"] = _year(j.l_shipdate)
    j["volume"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["s_n_n_name", "c_n_n_name", "l_year"], as_index=False).volume.sum()
    g = g.sort_values(["s_n_n_name", "c_n_n_name", "l_year"])
    return _rows(g)


def q8(d):
    p, s, li, o, c, n, r = (
        d["part"], d["supplier"], d["lineitem"], d["orders"], d["customer"], d["nation"], d["region"],
    )
    p = p[p.p_type == "ECONOMY ANODIZED STEEL"]
    o = o[(o.o_orderdate >= _days("1995-01-01")) & (o.o_orderdate <= _days("1996-12-31"))]
    am = r[r.r_name == "AMERICA"]
    n1 = n.merge(am, left_on="n_regionkey", right_on="r_regionkey")
    j = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n1[["n_nationkey"]], left_on="c_nationkey", right_on="n_nationkey")
        .merge(
            n[["n_nationkey", "n_name"]].add_prefix("s2_"),
            left_on="s_nationkey",
            right_on="s2_n_nationkey",
        )
    ).copy()
    j["o_year"] = _year(j.o_orderdate)
    j["volume"] = j.l_extendedprice * (1 - j.l_discount)
    j["brazil"] = np.where(j.s2_n_name == "BRAZIL", j.volume, 0.0)
    g = j.groupby("o_year", as_index=False).agg(b=("brazil", "sum"), v=("volume", "sum"))
    g["mkt_share"] = g.b / g.v
    return _rows(g[["o_year", "mkt_share"]].sort_values("o_year"))


def q9(d):
    p, s, li, ps, o, n = (
        d["part"], d["supplier"], d["lineitem"], d["partsupp"], d["orders"], d["nation"],
    )
    p = p[p.p_name.str.contains("green")]
    j = (
        li.merge(p[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
        .merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        .merge(ps, left_on=["l_partkey", "l_suppkey"], right_on=["ps_partkey", "ps_suppkey"])
        .merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(n[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey")
    ).copy()
    j["o_year"] = _year(j.o_orderdate)
    j["amount"] = j.l_extendedprice * (1 - j.l_discount) - j.ps_supplycost * j.l_quantity
    g = j.groupby(["n_name", "o_year"], as_index=False).amount.sum()
    g = g.sort_values(["n_name", "o_year"], ascending=[True, False])
    return _rows(g)


def q10(d):
    c, o, li, n = d["customer"], d["orders"], d["lineitem"], d["nation"]
    o = o[(o.o_orderdate >= _days("1993-10-01")) & (o.o_orderdate < _days("1994-01-01"))]
    li = li[li.l_returnflag == "R"]
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
    ).copy()
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(
        ["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name", "c_address", "c_comment"],
        as_index=False,
    ).rev.sum()
    g = g[
        ["c_custkey", "c_name", "rev", "c_acctbal", "n_name", "c_address", "c_phone", "c_comment"]
    ].sort_values("rev", ascending=False)
    return _rows(g)


def q11(d):
    ps, s, n = d["partsupp"], d["supplier"], d["nation"]
    de = n[n.n_name == "GERMANY"]
    ss = s.merge(de, left_on="s_nationkey", right_on="n_nationkey")
    j = ps.merge(ss[["s_suppkey"]], left_on="ps_suppkey", right_on="s_suppkey").copy()
    j["val"] = j.ps_supplycost * j.ps_availqty
    total = float(j.val.sum()) * 0.0001
    g = j.groupby("ps_partkey", as_index=False).val.sum()
    g = g[g.val > total].sort_values("val", ascending=False)
    return _rows(g)


def q12(d):
    li, o = d["lineitem"], d["orders"]
    li = li[
        li.l_shipmode.isin(["MAIL", "SHIP"])
        & (li.l_commitdate < li.l_receiptdate)
        & (li.l_shipdate < li.l_commitdate)
        & (li.l_receiptdate >= _days("1994-01-01"))
        & (li.l_receiptdate < _days("1995-01-01"))
    ]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").copy()
    hi = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    j["high"] = hi.astype(int)
    j["low"] = (~hi).astype(int)
    g = j.groupby("l_shipmode", as_index=False).agg(
        high_line_count=("high", "sum"), low_line_count=("low", "sum")
    )
    return _rows(g.sort_values("l_shipmode"))


def q13(d):
    c, o = d["customer"], d["orders"]
    o = o[~o.o_comment.str.contains("special.*requests", regex=True)]
    cnt = o.groupby("o_custkey").o_orderkey.size()
    c_count = c.c_custkey.map(cnt).fillna(0).astype(int)
    g = (
        pd.DataFrame({"c_count": c_count})
        .groupby("c_count", as_index=False)
        .agg(custdist=("c_count", "size"))
    )
    g = g.sort_values(["custdist", "c_count"], ascending=[False, False])
    return _rows(g)


def q14(d):
    li, p = d["lineitem"], d["part"]
    li = li[(li.l_shipdate >= _days("1995-09-01")) & (li.l_shipdate < _days("1995-10-01"))]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey").copy()
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    promo = float(j.rev[j.p_type.str.startswith("PROMO")].sum())
    return [(100.0 * promo / float(j.rev.sum()),)]


def q15(d):
    li, s = d["lineitem"], d["supplier"]
    li = li[(li.l_shipdate >= _days("1996-01-01")) & (li.l_shipdate < _days("1996-04-01"))].copy()
    li["rev"] = li.l_extendedprice * (1 - li.l_discount)
    rev = li.groupby("l_suppkey", as_index=False).rev.sum()
    mx = rev.rev.max()
    j = s.merge(rev[rev.rev == mx], left_on="s_suppkey", right_on="l_suppkey")
    j = j[["s_suppkey", "s_name", "s_address", "s_phone", "rev"]].sort_values("s_suppkey")
    return _rows(j)


def q16(d):
    ps, p, s = d["partsupp"], d["part"], d["supplier"]
    bad = set(s[s.s_comment.str.contains("Customer.*Complaints", regex=True)].s_suppkey)
    p = p[
        (p.p_brand != "Brand#45")
        & ~p.p_type.str.startswith("MEDIUM POLISHED")
        & p.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])
    ]
    j = ps.merge(p, left_on="ps_partkey", right_on="p_partkey")
    j = j[~j.ps_suppkey.isin(bad)]
    g = j.groupby(["p_brand", "p_type", "p_size"], as_index=False).agg(
        supplier_cnt=("ps_suppkey", "nunique")
    )
    g = g[["p_brand", "p_type", "p_size", "supplier_cnt"]].sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    )
    return _rows(g)


def q17(d):
    li, p = d["lineitem"], d["part"]
    p = p[(p.p_brand == "Brand#23") & (p.p_container == "MED BOX")]
    avg_q = li.groupby("l_partkey").l_quantity.mean() * 0.2
    j = li.merge(p[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
    j = j[j.l_quantity < j.l_partkey.map(avg_q)]
    return [(float(j.l_extendedprice.sum()) / 7.0,)]


def q18(d):
    c, o, li = d["customer"], d["orders"], d["lineitem"]
    big = li.groupby("l_orderkey").l_quantity.sum()
    keys = set(big[big > 300].index)
    o = o[o.o_orderkey.isin(keys)]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    g = j.groupby(
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        as_index=False,
    ).l_quantity.sum()
    g = g[["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "l_quantity"]]
    g = g.sort_values(["o_totalprice", "o_orderdate"], ascending=[False, True])
    return _rows(g, date_cols=["o_orderdate"])


def q19(d):
    li, p = d["lineitem"], d["part"]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    base = j.l_shipmode.isin(["AIR", "AIR REG"]) & (j.l_shipinstruct == "DELIVER IN PERSON")
    m1 = (
        (j.p_brand == "Brand#12")
        & j.p_container.isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
        & (j.l_quantity >= 1) & (j.l_quantity <= 11)
        & (j.p_size >= 1) & (j.p_size <= 5)
    )
    m2 = (
        (j.p_brand == "Brand#23")
        & j.p_container.isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
        & (j.l_quantity >= 10) & (j.l_quantity <= 20)
        & (j.p_size >= 1) & (j.p_size <= 10)
    )
    m3 = (
        (j.p_brand == "Brand#34")
        & j.p_container.isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
        & (j.l_quantity >= 20) & (j.l_quantity <= 30)
        & (j.p_size >= 1) & (j.p_size <= 15)
    )
    m = base & (m1 | m2 | m3)
    rev = (j.l_extendedprice[m] * (1 - j.l_discount[m])).sum()
    return [(float(rev),)]


def q20(d):
    s, n, ps, p, li = d["supplier"], d["nation"], d["partsupp"], d["part"], d["lineitem"]
    forest = set(p[p.p_name.str.startswith("forest")].p_partkey)
    li = li[
        (li.l_shipdate >= _days("1994-01-01")) & (li.l_shipdate < _days("1995-01-01"))
    ]
    half = li.groupby(["l_partkey", "l_suppkey"]).l_quantity.sum() * 0.5
    psf = ps[ps.ps_partkey.isin(forest)]
    thr = psf.set_index(["ps_partkey", "ps_suppkey"]).index.map(half)
    keep = psf[psf.ps_availqty > np.asarray(thr, dtype=float)]
    supp = set(keep.ps_suppkey)
    ca = n[n.n_name == "CANADA"]
    j = s.merge(ca, left_on="s_nationkey", right_on="n_nationkey")
    j = j[j.s_suppkey.isin(supp)][["s_name", "s_address"]].sort_values("s_name")
    return _rows(j)


def q21(d):
    s, li, o, n = d["supplier"], d["lineitem"], d["orders"], d["nation"]
    sa = n[n.n_name == "SAUDI ARABIA"]
    late = li[li.l_receiptdate > li.l_commitdate]
    nsupp = li.groupby("l_orderkey").l_suppkey.nunique()
    late_supp = late.groupby("l_orderkey").l_suppkey.agg(["nunique", "first"])
    fo = set(o[o.o_orderstatus == "F"].o_orderkey)
    l1 = late[late.l_orderkey.isin(fo)]
    # exists l2: order has >= 2 distinct suppliers
    l1 = l1[l1.l_orderkey.map(nsupp) >= 2]
    # not exists l3: the only late supplier in the order is l1's own
    ls_n = l1.l_orderkey.map(late_supp["nunique"])
    ls_f = l1.l_orderkey.map(late_supp["first"])
    l1 = l1[(ls_n == 1) & (ls_f == l1.l_suppkey)]
    j = l1.merge(s, left_on="l_suppkey", right_on="s_suppkey").merge(
        sa, left_on="s_nationkey", right_on="n_nationkey"
    )
    g = j.groupby("s_name", as_index=False).agg(numwait=("s_name", "size"))
    g = g.sort_values(["numwait", "s_name"], ascending=[False, True])
    return _rows(g)


def q22(d):
    c, o = d["customer"], d["orders"]
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cc = c[c.c_phone.str[:2].isin(codes)].copy()
    avg = float(cc.c_acctbal[cc.c_acctbal > 0.0].mean())
    has_order = set(o.o_custkey)
    cc = cc[(cc.c_acctbal > avg) & ~cc.c_custkey.isin(has_order)]
    cc["cntrycode"] = cc.c_phone.str[:2]
    g = cc.groupby("cntrycode", as_index=False).agg(
        numcust=("c_acctbal", "size"), totacctbal=("c_acctbal", "sum")
    )
    return _rows(g.sort_values("cntrycode"))


QUERIES = {i: globals()[f"q{i}"] for i in range(1, 23)}


def pandas_query(data: dict, q: int) -> list[tuple]:
    return QUERIES[q](_frames(data))
