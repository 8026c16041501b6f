#!/usr/bin/env python3
"""Canary for the cross-engine quantile-interpolation ulp hazard.

DistributedQuantile.scala interpolates with Spark builtin
`percentile`'s tree: (hi-pos)*vlo + (pos-lo)*vhi. DuckDB 1.0.0's
quantile_cont evaluates the un-fused vlo*(1-d) + vhi*d, an
algebraically-equal but DIFFERENT FP tree: on adversarial
(vlo, vhi, q) ulp cases the two disagree in the last ulp ~8% of the
time (and no fused/unfused re-association reproduces DuckDB 100%, so
chasing bit-identity is a dead end -- measured round 13, see
SURVEY.md). The repo therefore never COMPARES a value against an
interpolated breakpoint (cuts go through DistributedQuantile.cuts,
which uses exact bracket-rank values), and quantile OUTPUTS are
always 6dp floor-rounded onto an exact 1e-6 grid.

This gate asserts the remaining load-bearing fact: on the REAL test
tables x the q-grid the registered queries actually use, the two
trees agree bit-for-bit. If a DuckDB upgrade or new data ever breaks
that, this fails loudly BEFORE a 6dp-floored output can flip.

Usage: python3 tools/quantile_bitcheck.py <sfdir>
Exit 1 on any real-data bit mismatch. The adversarial sweep at the
end is informational (documents that the trees genuinely differ).
"""
import math
import random
import struct
import sys

import duckdb

BITS = lambda x: struct.pack("<d", float(x)).hex()


def spark_tree(vals, q):
    n = len(vals)
    pos = q * (n - 1)
    lo = math.floor(pos)
    hi = math.ceil(pos)
    if lo == hi:
        return float(vals[int(lo)])
    return (hi - pos) * float(vals[int(lo)]) + (pos - lo) * float(vals[int(hi)])


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    bad = 0

    # every q registered anywhere in the repo's queries: quartiles,
    # terciles, deciles, p01/p05/p95/p99, medians
    qgrid = [0.01, 0.05, 0.1, 0.2, 0.25, 0.3, 1 / 3, 0.4, 0.5, 0.6, 2 / 3,
             0.7, 0.75, 0.8, 0.9, 0.95, 0.99]
    cases = 0
    for tbl, colname in [("orders", "o_totalprice"), ("lineitem", "l_extendedprice"),
                         ("lineitem", "l_quantity"), ("lineitem", "l_discount"),
                         ("events", "value"), ("part", "p_retailprice"),
                         ("customer", "c_acctbal"), ("supplier", "s_acctbal")]:
        vals = con.execute(
            f"SELECT {colname} FROM read_parquet('{sfdir}/{tbl}.parquet') "
            f"WHERE {colname} IS NOT NULL ORDER BY 1").fetchnumpy()[colname]
        for q in qgrid:
            duck = con.execute(
                f"SELECT quantile_cont({colname}, {q!r}) "
                f"FROM read_parquet('{sfdir}/{tbl}.parquet')").fetchone()[0]
            mine = spark_tree(vals, q)
            cases += 1
            if BITS(duck) != BITS(mine):
                bad += 1
                print(f"BIT MISMATCH {tbl}.{colname} q={q}: duck={duck!r} spark={mine!r}")

    # informational: prove the trees are NOT identical in general, so
    # nobody re-introduces a value>breakpoint comparison "because the
    # gate is green"
    random.seed(13)
    div = trials = 0
    for _ in range(1000):
        vlo = round(random.uniform(-1e6, 1e6), random.choice([0, 2, 6]))
        vhi = vlo + abs(round(random.uniform(0, 1e4), random.choice([0, 2, 6]))) \
            + random.random() * 1e-3
        n = random.choice([4, 7, 10, 101, 5003])
        q = (1 + random.random() * 0.999999) / (n - 1)
        pos = q * (n - 1)
        if int(pos) != 1 or pos == int(pos):
            continue
        trials += 1
        con.execute("DROP TABLE IF EXISTS t; CREATE TABLE t(v DOUBLE)")
        con.execute(f"INSERT INTO t VALUES ({vlo - 1000.0!r}), ({vlo!r}), ({vhi!r})")
        con.execute(f"INSERT INTO t SELECT {vhi + 1000.0!r} FROM range({n - 3})")
        duck = con.execute(f"SELECT quantile_cont(v, {q!r}) FROM t").fetchone()[0]
        mine = spark_tree([vlo - 1000.0, vlo, vhi] + [vhi + 1000.0] * (n - 3), q)
        if BITS(duck) != BITS(mine):
            div += 1

    print(f"quantile_bitcheck: {bad}/{cases} real-data bit mismatches "
          f"(duckdb {duckdb.__version__}); adversarial divergence {div}/{trials} "
          f"(expected nonzero -- the trees differ, which is why cuts are rank-exact)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
