#!/usr/bin/env python3
"""Cross-SF verification sweep, as a runnable artifact.

The single-SF driver gate structurally cannot see bug classes that only
manifest at other data scales — round 5's biased hyperplane family and
fixed ADC re-rank budget were both caught ONLY by re-running the full
gate at sf0.001/sf0.1. This script institutionalizes that session
practice: it runs graft.Verify + the DuckDB oracle compare at EVERY
scale factor and writes one machine-readable summary.

Run:  python3 tools/sweep.py [roundTag]     (default: r6)
Out:  SWEEP_<roundTag>.json — per-SF gate counts, every non-OK gate by
      name, wall-clock; overall "green" flag.
Cost: one full Verify per SF (~1.5–25 min total depending on load; sf0.1
      dominates). Exit 0 iff every gate at every SF is OK.
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["sf0.001", "sf0.01", "sf0.1"]

tag = sys.argv[1] if len(sys.argv) > 1 else "r6"
env = {**os.environ, "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "8")}
summary = {}
green = True

for sf in SFS:
    out = os.path.join(REPO, "target", f"sweep_{sf}")
    t0 = time.time()
    v = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify /root/testdata/{sf} {out}"],
        capture_output=True, text=True, cwd=REPO, env=env)
    # Spark noise goes to stderr; REAL per-gate failures are tagged
    verify_failed = sorted(set(
        re.findall(r"\[verify\] (\S+) failed", v.stdout + v.stderr)))
    # --json: the per-gate CORRECTNESS-shaped replica. The driver's own
    # artifact arrived EMPTY in rounds 13 and 14, so per-query
    # adjudication must never depend on that drop — the sf0.01 leg's
    # report is published as SWEEP_QUERIES_<tag>.json (driver parity:
    # the driver compares at sf0.01), the other SFs' land in target/.
    qjson = (os.path.join(REPO, f"SWEEP_QUERIES_{tag}.json") if sf == "sf0.01"
             else os.path.join(REPO, "target", f"sweep_queries_{sf}.json"))
    c = subprocess.run(
        ["python3", "tools/check_oracle.py", f"/root/testdata/{sf}", out,
         "--json", qjson],
        capture_output=True, text=True, cwd=REPO)
    per_gate = dict(re.findall(r"^(\S+): (OK|.*)$", c.stdout, re.M))
    not_ok = sorted(n for n, s in per_gate.items()
                    if not s.startswith("OK") and not n.startswith("---"))
    tail = re.search(r"--- (\d+)/(\d+) oracle-checked queries OK ---", c.stdout)
    ok_n, total_n = (int(tail.group(1)), int(tail.group(2))) if tail else (0, 0)
    sf_green = (not verify_failed and not not_ok
                and total_n > 0 and ok_n == total_n)
    green = green and sf_green
    summary[sf] = {
        "green": sf_green,
        "oracle_ok": ok_n,
        "oracle_total": total_n,
        "verify_failed": verify_failed,
        "oracle_not_ok": not_ok,
        "seconds": round(time.time() - t0, 1),
    }
    print(f"[sweep] {sf}: {ok_n}/{total_n} OK"
          f"{' verify-failed=' + str(verify_failed) if verify_failed else ''}"
          f"{' not-ok=' + str(not_ok) if not_ok else ''}"
          f" ({summary[sf]['seconds']}s)")

path = os.path.join(REPO, f"SWEEP_{tag}.json")
with open(path, "w") as f:
    json.dump({"green": green, "sfs": summary}, f, indent=2, sort_keys=True)
print(f"[sweep] {'GREEN' if green else 'RED'} → {path}")
sys.exit(0 if green else 1)
