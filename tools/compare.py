#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify: load Spark's parquet result, run the
oracle SQL in DuckDB over views of the same fixture tables, sort columns by
name, and compare row count / values. Floats compare exactly first, then
with 1e-9 relative tolerance so we can distinguish "hard mismatch" from
"summation-order jitter" while iterating.
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got_rel = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
            exp_rel = con.sql(sql)
            got, got_cols = got_rel.fetchall(), list(got_rel.columns)
            exp, exp_cols = exp_rel.fetchall(), list(exp_rel.columns)
            # The driver hashes pandas-materialized frames, so its compare is
            # dtype-KIND-sensitive: DuckDB widens e.g. sum(INTEGER) to
            # HUGEINT, pandas materializes HUGEINT as float64, Spark wrote
            # int64 → driver hash FAIL even when every value matches (r2's
            # e_sessionize). Pandas hashing merges integer WIDTHS though —
            # r2's driver hash-passed 9 queries where Spark wrote int32 and
            # DuckDB int64 — so compare the dtype KIND (int/float/bool/obj/
            # datetime), merging signed+unsigned ints, not the exact width.
            # Full materialization, not LIMIT 0: NULLs flip pandas int64 →
            # float64 only when data is present, and the driver sees data.
            # (fetchall values stay the comparison source — .df() here is
            # only for dtypes, so each side executes twice, not thrice.)
            got_dt = got_rel.df().dtypes
            exp_dt = exp_rel.df().dtypes
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1; continue
        def kind(dt):
            k = dt.kind
            return "i" if k == "u" else k
        dt_diff = [(c, str(got_dt[c]), str(exp_dt[c])) for c in sorted(got_cols)
                   if kind(got_dt[c]) != kind(exp_dt[c])]
        if dt_diff:
            print(f"FAIL {name}: dtype mismatch (driver hash would fail): " +
                  ", ".join(f"{c} spark={g} oracle={e}" for c, g, e in dt_diff))
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1; continue
        # column-sorted projection
        gp = [got_cols.index(c) for c in sorted(got_cols)]
        ep = [exp_cols.index(c) for c in sorted(exp_cols)]
        exact = True; close = True; first_diff = None
        for i, (gr, er) in enumerate(zip(got, exp)):
            g = [gr[j] for j in gp]; e = [er[j] for j in ep]
            if g == e:
                continue
            exact = False
            for a, b in zip(g, e):
                if a == b:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
                        continue
                close = False
                if first_diff is None:
                    first_diff = (i, a, b)
            if not close:
                break
        if exact:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        elif close:
            print(f"NEAR {name} ({len(got)} rows) — float jitter only (would "
                  f"fail a strict hash!)"); n_fail += 1
        else:
            print(f"FAIL {name}: first diff at row {first_diff}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
