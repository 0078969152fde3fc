#!/usr/bin/env python3
"""Local replica of the judge's DuckDB timing of the oracle bench queries.

Usage: duckbench.py <sfDir> <verifyOutDir> [queryName ...]

Times each bench query's oracle SQL in DuckDB (2 warm-ups + best of five,
the same protocol as graft.Bench) over views of the fixture parquet. Query
names default to the bench set recorded by graft.Verify (bench_queries.json
if present, else every oracle entry).
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        try:
            names = json.load(open(f"{out_dir}/bench_queries.json"))
        except FileNotFoundError:
            names = sorted(oracle)
    results = {}
    for name in names:
        if name not in oracle:
            results[name] = None
            continue
        sql = oracle[name]
        con.sql(sql).fetchall(); con.sql(sql).fetchall()  # warm-ups
        best = min(_timed(con, sql) for _ in range(5))
        results[name] = round(best, 4)
    total = sum(v for v in results.values() if v is not None)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 4),
                      "unit": "sec", "queries": results, "sf": sf_dir}))

def _timed(con, sql):
    t0 = time.perf_counter()
    con.sql(sql).fetchall()
    return time.perf_counter() - t0

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
