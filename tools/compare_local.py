#!/usr/bin/env python3
"""Local pre-validation harness mimicking the driver's DuckDB oracle
compare: run Verify first, then this. Driver-side python/duckdb only —
NOT part of the library.

Usage: python3 tools/compare_local.py <sfDir> <verifyOutDir> [only,names]
(the optional third arg restricts the compare to those queries — the
dev-loop twin of SPARK_GRAFT_ONLY; the driver never passes it)
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    ok = bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            bad += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            bad += 1
            continue
        exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        mismatch = None
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            if str(ev.dtype) != str(gv.dtype):
                mismatch = f"dtype[{c}] {gv.dtype} != {ev.dtype}"
                break
            for i in range(len(ev)):
                a, b = ev.iloc[i], gv.iloc[i]
                if a is None or (isinstance(a, float) and math.isnan(a)):
                    same = b is None or (isinstance(b, float) and math.isnan(b))
                else:
                    same = a == b
                if not same:
                    mismatch = f"value[{c}][{i}] got={b!r} exp={a!r}"
                    break
            if mismatch:
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            bad += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
            ok += 1
    print(f"\n{ok} ok, {bad} fail")
    return 1 if bad else 0

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
