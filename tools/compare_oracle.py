#!/usr/bin/env python3
"""Local pre-check that mimics the driver's correctness gate: for each
query parquet dumped by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same sf dir and compare as sorted sets.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            failures.append((name, "NO SPARK OUTPUT"))
            print(f"FAIL {name}: no spark output")
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"SQL ERROR {e}"))
            print(f"FAIL {name}: {e}")
            continue
        sc = sorted(spark_df.columns)
        dc = sorted(duck_df.columns)
        if sc != dc:
            failures.append((name, f"schema {sc} vs {dc}"))
            print(f"FAIL {name}: schema {sc} vs {dc}")
            continue
        a = spark_df[sc].sort_values(sc).reset_index(drop=True)
        b = duck_df[sc].sort_values(sc).reset_index(drop=True)
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            continue
        # value compare via csv-ish string repr (mirrors a hash compare)
        astr = a.astype(str)
        bstr = b.astype(str)
        if not astr.equals(bstr):
            diff = (astr != bstr).any(axis=1)
            n = int(diff.sum())
            failures.append((name, f"{n} differing rows"))
            print(f"FAIL {name}: {n}/{len(a)} differing rows")
            ex = diff[diff].index[:3]
            for i in ex:
                print("  spark:", a.loc[i].to_dict())
                print("  duck :", b.loc[i].to_dict())
        else:
            print(f"OK   {name} ({len(a)} rows)")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
