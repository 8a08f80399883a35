#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after the
tables in <sfDir>, and compares: schema (sorted column names), row count, and
values (rows sorted, columns sorted by name). Exact compare; float diffs are
reported with max abs delta so fp-noise is distinguishable from real bugs.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(got)})")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: schema mismatch spark={gc} oracle={ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount spark={len(got)} oracle={len(exp)}"); n_fail += 1; continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        bad = None; max_delta = 0.0
        for c in gc:
            for i, (a, b) in enumerate(zip(g[c], e[c])):
                a, b = norm(a), norm(b)
                if isinstance(a, float) and isinstance(b, float):
                    if a != b:
                        d = abs(a - b)
                        max_delta = max(max_delta, d)
                        if d > 1e-9 * max(1.0, abs(a), abs(b)):
                            bad = (c, i, a, b); break
                elif str(a) != str(b):
                    bad = (c, i, a, b); break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            note = f" (max fp delta {max_delta:.2e})" if max_delta > 0 else ""
            print(f"PASS {name}: {len(got)} rows{note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
