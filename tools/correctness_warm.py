#!/usr/bin/env python3
"""Warm-path correctness record (VERDICT r09 task 4): compare a
graft.Verify dump taken with SPARK_GRAFT_ARTIFACT_DIR set (second pass —
every artifact family loaded from its parquet snapshot) against the
DuckDB oracle, and write CORRECTNESS_warm.json.

Usage: correctness_warm.py <sfDir> <verifyOutDir> <ensureLogFile> [out.json]
  ensureLogFile: the pass's stderr capture holding the
  "[verify] artifact_ensure <family> warm|cold" lines.
"""
import json, sys, glob, os, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, ensure_log, out_json):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ensures = {}
    for line in open(ensure_log):
        m = re.search(r"artifact_ensure (\S+) (warm|cold)", line)
        if m:
            ensures[m.group(1)] = m.group(2)
    queries, matched = {}, 0
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            queries[name] = "no spark output"
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
            duck_df = con.sql(sql).df()
        except Exception as e:
            queries[name] = f"sql error: {e}"[:200]
            continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            queries[name] = f"schema {sc} vs {dc}"
            continue
        a = spark_df[sc].sort_values(sc).reset_index(drop=True).astype(str)
        b = duck_df[sc].sort_values(sc).reset_index(drop=True).astype(str)
        if len(a) != len(b):
            queries[name] = f"rows {len(a)} vs {len(b)}"
        elif not a.equals(b):
            queries[name] = "hash mismatch"
        else:
            queries[name] = "match"
            matched += 1
    rec = {
        "metric": "correctness_warm",
        "sf": sf_dir,
        "artifact_mode": "warm",
        "artifact_ensure": ensures,
        "oracle_total": len(oracle),
        "matched": matched,
        "failures": {k: v for k, v in queries.items() if v != "match"},
        "queries": queries,
    }
    json.dump(rec, open(out_json, "w"), indent=1)
    print(f"{matched}/{len(oracle)} warm-path queries match "
          f"(ensures: {ensures}) -> {out_json}")
    return 0 if matched == len(oracle) else 1


if __name__ == "__main__":
    sf, out = sys.argv[1], sys.argv[2]
    log = sys.argv[3]
    dest = sys.argv[4] if len(sys.argv) > 4 else "CORRECTNESS_warm.json"
    sys.exit(main(sf, out, log, dest))
