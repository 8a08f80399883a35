#!/usr/bin/env python3
"""Regression tests for the signed-zero class (round-9 q194) and the
hardened local gate. Run: python3 tools/test_signed_zero.py

Covers the round-10 verdict's "Done =" criteria:
 1. DuckDB really does emit -0.0 from round(tiny_negative, d) — the
    divergence mechanism — and the `+ 0.0` idiom normalizes it.
 2. check_local.floats_equal is signed-zero-exact (the pre-fix q194
    shipped because Python's == treats -0.0 == 0.0).
 3. An end-to-end gate run over a crafted spark(+0.0) vs oracle(-0.0)
    pair — the exact pre-fix q194 shape — reports FAIL and exit 1.
"""
import json, math, os, subprocess, sys, tempfile
import duckdb

sys.path.insert(0, os.path.dirname(__file__))
from check_local import floats_equal


def sign(x):
    return math.copysign(1.0, x)


def test_duckdb_mechanism():
    # the q194 shape: a grid-cancellation residue one ulp below zero
    neg = duckdb.sql("SELECT round(-1e-12, 6)").fetchone()[0]
    assert neg == 0.0 and sign(neg) == -1.0, f"expected -0.0, got {neg!r}"
    # the fix idiom in the oracle dialect: IEEE -0.0 + 0.0 = +0.0
    fixed = duckdb.sql("SELECT round(-1e-12, 6) + 0.0").fetchone()[0]
    assert fixed == 0.0 and sign(fixed) == +1.0, f"idiom failed: {fixed!r}"
    # and it is the identity elsewhere (incl. sign preservation)
    other = duckdb.sql("SELECT round(-2.5e-6, 6) + 0.0").fetchone()[0]
    assert other == -3e-06, other
    print("PASS duckdb mechanism: round(-1e-12,6) is -0.0; '+ 0.0' normalizes")


def test_floats_equal_strict():
    assert not floats_equal(0.0, -0.0), "gate is signed-zero blind"
    assert not floats_equal(-0.0, 0.0), "gate is signed-zero blind"
    assert floats_equal(-0.0, -0.0) and floats_equal(0.0, 0.0)
    assert floats_equal(float("nan"), float("nan"))
    assert not floats_equal(float("nan"), 0.0)
    assert not floats_equal(1.0, 1.0 + 1e-15), "gate grew a tolerance"
    print("PASS floats_equal: exact incl. sign of zero, NaN==NaN, no epsilon")


def test_gate_end_to_end():
    # spark side emits +0.0 (Spark's Round), oracle emits -0.0 (DuckDB's)
    # — the pre-fix q194 divergence; the hardened gate must FAIL it
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "out")
        os.makedirs(os.path.join(out, "q_signed_zero"))
        duckdb.sql(
            "COPY (SELECT 'src4' AS k, 0.0::DOUBLE AS beta) TO "
            f"'{out}/q_signed_zero/part.parquet' (FORMAT PARQUET)")
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({"q_signed_zero":
                       "SELECT 'src4' AS k, round(-1e-12, 6) AS beta"}, f)
        p = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "check_local.py"),
             "/root/testdata/sf0.001", out],
            capture_output=True, text=True)
        assert p.returncode == 1, f"gate passed a signed-zero divergence:\n{p.stdout}"
        assert "FAIL q_signed_zero" in p.stdout, p.stdout
        assert "sign=" in p.stdout, "diagnostic lost the sign"
    print("PASS gate end-to-end: +0.0 vs -0.0 parquet/oracle pair FAILs (exit 1)")


if __name__ == "__main__":
    test_duckdb_mechanism()
    test_floats_equal_strict()
    test_gate_end_to_end()
    print("all signed-zero regression tests pass")
