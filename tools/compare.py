#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfdir> <verify_outdir>

Reads each <outdir>/<name> parquet (Spark result) and runs
<outdir>/oracle_sql.json[name] in DuckDB over the same test tables,
then compares schemas and value multisets (columns sorted by name,
rows sorted), reporting exact-match / mismatch per query.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISSING spark output: {name}"); fails.append(name); continue
    try:
        duck = con.execute(sql).df()
    except Exception as e:
        print(f"ORACLE ERROR {name}: {e}"); fails.append(name); continue
    files = glob.glob(f"{spark_dir}/*.parquet")
    spark = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    sc, dc = sorted(spark.columns), sorted(duck.columns)
    if sc != dc:
        print(f"SCHEMA MISMATCH {name}: spark={sc} duck={dc}"); fails.append(name); continue
    spark = spark.fillna("\x00null")
    duck = duck.fillna("\x00null")
    s = spark[sc].sort_values(sc, key=lambda col: col.astype(str)).reset_index(drop=True)
    d = duck[dc].sort_values(dc, key=lambda col: col.astype(str)).reset_index(drop=True)
    if len(s) != len(d):
        print(f"ROWCOUNT MISMATCH {name}: spark={len(s)} duck={len(d)}"); fails.append(name); continue
    # normalize dtypes for compare
    def render_kind(col):
        """How the driver's render-then-hash sees this column: 'i' for
        int-rendered scalars ("123" -- int64, object Decimal(38,0),
        Python int), 'f' for float-rendered ("123.0"), else dtype kind.
        DuckDB HUGEINT and DECIMAL(38,0) cross the pandas bridge as
        float64 or object(Decimal) depending on width/path, so a
        numeric == compare is NOT the driver's semantics (round-12
        ordinal_association: Decimal('33242693') vs 33242693.0 passed
        == but hash-mismatched)."""
        k = col.dtype.kind
        if k == "O":
            import decimal
            for v in col:
                if v is None or (isinstance(v, float) and pd.isna(v)):
                    continue
                if isinstance(v, decimal.Decimal):
                    try:
                        return "i" if v == v.to_integral_value() \
                            and str(v) == str(v.to_integral_value()) else "D"
                    except decimal.InvalidOperation:
                        return "D"
                if isinstance(v, bool):
                    return "b"
                if isinstance(v, int):
                    return "i"
                if isinstance(v, float):
                    return "f"
                return k
        return k
    diffs = []
    for c in sc:
        a, b = s[c], d[c]
        # the driver hashes rendered values, so an int-rendered column on
        # one side and a float- or scaled-decimal-rendered one on the
        # other ("123" vs "123.0" vs "123.000000") is a FAIL even when
        # numerically equal -- int64 vs float64, AND object(Decimal) vs
        # float64 (the round-12 blind spot: the old guard only looked at
        # dtype kinds, which Decimal objects don't expose).
        ka, kb = render_kind(a), render_kind(b)
        if ka != kb and {ka, kb} <= {"i", "f", "D"}:
            diffs.append(c + f" [render {ka}-vs-{kb}: would hash-mismatch]")
            continue
        try:
            if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                eq = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                eq = (a.astype(object).where(~a.isna(), None)
                      == b.astype(object).where(~b.isna(), None)).all()
        except Exception as e:
            eq = False
        if not eq:
            diffs.append(c)
    if diffs:
        print(f"VALUE MISMATCH {name}: cols {diffs}")
        for c in diffs[:2]:
            c = c.split(" ")[0]
            neq = s[c] != d[c]
            print(f"  {c}: spark={s[c][neq].head(3).tolist()} duck={d[c][neq].head(3).tolist()}")
        fails.append(name)
    else:
        print(f"OK {name} ({len(s)} rows)")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match; fails: {fails}")
sys.exit(1 if fails else 0)
