#!/usr/bin/env python3
"""Regression test for tools/compare.py's render-kind guard.

Round 12 shipped a red driver key (ordinal_association) that the
local gate called green: Spark emitted DECIMAL(38,0) (pandas
object(Decimal), renders "33242693") while the oracle's
CAST(x AS DECIMAL(38,0)) crossed DuckDB's pandas bridge as float64
(renders "33242693.0"); numeric == said equal, the driver's
rendered-value hash said FAIL. This test replays exactly that
spelling plus the int-vs-float sibling and a green control, and
asserts the gate flags the two reds and passes the control.

Usage: python3 tools/test_compare_gate.py [sfdir]
"""
import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = "/tmp/compare_gate_test"


def write_spark_result(name, table):
    d = os.path.join(OUT, name)
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "part-00000.parquet"))


def main():
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT)

    import decimal
    # red 1: the unfixed B193 spelling -- Spark DECIMAL(38,0) vs an
    # oracle DECIMAL(38,0) that pandas-bridges to float64
    write_spark_result("gate_decimal_vs_float", pa.table(
        {"c": pa.array([decimal.Decimal("33242693")], pa.decimal128(38, 0))}))
    # red 2: plain int64 vs float64
    write_spark_result("gate_int_vs_float", pa.table(
        {"c": pa.array([33242693], pa.int64())}))
    # green control: BIGINT on both sides
    write_spark_result("gate_bigint_ok", pa.table(
        {"c": pa.array([33242693], pa.int64())}))

    oracle = {
        # CAST to DECIMAL(38,0): precision 38 > int64, so DuckDB's
        # pandas bridge emits float64 -- the round-12 failure shape
        "gate_decimal_vs_float": "SELECT CAST(33242693 AS DECIMAL(38,0)) AS c",
        "gate_int_vs_float": "SELECT CAST(33242693 AS DOUBLE) AS c",
        "gate_bigint_ok": "SELECT CAST(33242693 AS BIGINT) AS c",
    }
    with open(os.path.join(OUT, "oracle_sql.json"), "w") as f:
        json.dump(oracle, f)

    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "compare.py"), SFDIR, OUT],
        capture_output=True, text=True)
    out = p.stdout + p.stderr
    ok = True
    if p.returncode != 1:
        print(f"FAIL: expected exit 1 from compare.py, got {p.returncode}")
        ok = False
    for red in ("gate_decimal_vs_float", "gate_int_vs_float"):
        if f"VALUE MISMATCH {red}" not in out or "would hash-mismatch" not in out:
            print(f"FAIL: gate did not flag {red}")
            ok = False
    if "OK gate_bigint_ok" not in out:
        print("FAIL: gate flagged the green control gate_bigint_ok")
        ok = False
    print(out if not ok else "compare-gate regression test: all 3 behaviors correct")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
