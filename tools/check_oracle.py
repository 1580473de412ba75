#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/<table>.parquet
as a DuckDB view, runs each oracle SQL, and compares against the Spark
parquet dump at <verifyOutDir>/<name>/. Strict: sorts columns by name,
compares row-by-row IN ORDER (no row sort), exact values. Passing here
should imply passing any reasonable driver compare.
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            failures += 1
            continue
        bad = None
        ev, gv = exp.values.tolist(), got.values.tolist()
        for i, (er, gr) in enumerate(zip(ev, gv)):
            er = [canon(x) for x in er]
            gr = [canon(x) for x in gr]
            if er != gr:
                bad = (i, er, gr)
                break
        if bad:
            i, er, gr = bad
            print(f"FAIL {name}: row {i} differs\n  oracle: {er}\n  spark : {gr}")
            failures += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)

main()
