#!/usr/bin/env python3
"""Convert a tools/check_local.py run into the CORRECTNESS_local_* JSON
artifact format (status PASS/FAIL/ROWS_ONLY per query + the sf dir).

Usage: python3 tools/gate_to_json.py <sfDir> <verifyOutDir> <outJson>
"""
import sys, json, subprocess, re

def main(sf_dir, out_dir, out_json):
    p = subprocess.run(
        [sys.executable, "tools/check_local.py", sf_dir, out_dir],
        capture_output=True, text=True)
    # a checker CRASH (vs. a clean run with failures, which exits 1 after
    # printing per-query lines) must not be recorded as an empty-green
    # artifact — distinguish by presence of the summary line
    if not any(" pass, " in l for l in p.stdout.splitlines()):
        sys.stderr.write(f"check_local.py produced no summary "
                         f"(exit {p.returncode}):\n{p.stdout}\n{p.stderr}\n")
        return 2
    queries = {}
    for line in p.stdout.splitlines():
        m = re.match(r"(PASS|FAIL|SKIP) (\S+?):.*?(\d+) rows", line)
        if not m:
            m2 = re.match(r"(PASS|FAIL|SKIP) (\S+?): (\d+) rows", line)
            m = m2 or re.match(r"(PASS|FAIL|SKIP) (\S+?):.*rows=(\d+)", line)
        if m:
            status = {"PASS": "PASS", "FAIL": "FAIL", "SKIP": "ROWS_ONLY"}[m.group(1)]
            queries[m.group(2)] = {"rows": int(m.group(3)), "status": status}
        else:
            m3 = re.match(r"(FAIL) (\S+?):", line)
            if m3:
                queries[m3.group(2)] = {"rows": -1, "status": "FAIL"}
    json.dump({"queries": dict(sorted(queries.items())), "sf": sf_dir},
              open(out_json, "w"))
    print(f"{out_json}: {sum(1 for q in queries.values() if q['status']=='PASS')} pass, "
          f"{sum(1 for q in queries.values() if q['status']=='FAIL')} fail, "
          f"{len(queries)} total")
    print(p.stdout.splitlines()[-1] if p.stdout else p.stderr[-500:])
    return 0 if not any(q["status"] == "FAIL" for q in queries.values()) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
