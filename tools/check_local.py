#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check_local.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over views named after the
tables in <sfDir>, and compares: schema (sorted column names), row count, and
values (rows sorted, columns sorted by name). Floats are compared EXACTLY,
including the sign of zero (the driver hashes bit-exactly; Python's
`-0.0 == 0.0` is how the round-9 q194 signed-zero red passed locally) —
the max abs delta across a failing column is printed as a DIAGNOSTIC to
tell fp-noise from a real bug, never as a tolerance.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def floats_equal(a, b):
    """Driver-strict: NaN == NaN, but -0.0 != +0.0 and no epsilon."""
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return a == b and math.copysign(1.0, a) == math.copysign(1.0, b)

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
        # report the FIRST mismatching column only, with a max-delta
        # diagnostic computed over THAT column alone (an earlier version
        # aggregated deltas across columns, so the '(max fp delta ...)'
        # note could describe a different column than the col= it named,
        # and a noisy float column forced a scan of every later column)
        bad = None; max_delta = 0.0
        for c in gc:
            for i, (a, b) in enumerate(zip(g[c], e[c])):
                if isinstance(a, float) and isinstance(b, float):
                    if not floats_equal(a, b):
                        if not (math.isnan(a) or math.isnan(b)):
                            max_delta = max(max_delta, abs(a - b))
                        if bad is None:
                            bad = (c, i, a, b)
                elif str(a) != str(b):
                    if bad is None:
                        bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            sa, sb = bad[2], bad[3]
            fmt = lambda v: (f"{v!r}(sign={math.copysign(1, v):+.0f})"
                             if isinstance(v, float) and v == 0.0 else f"{v!r}")
            note = f" (max fp delta {max_delta:.2e})" if max_delta > 0 else ""
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} "
                  f"spark={fmt(sa)} oracle={fmt(sb)}{note}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
