#!/usr/bin/env python3
"""Generate the COVERAGE.md totals line from a Verify output dir.

Usage: python3 tools/coverage_totals.py /tmp/verify_out
Counts queries = result dirs dumped by graft.Verify; oracled = keys in
oracle_sql.json; rows-only = the difference. Paste the printed line into
COVERAGE.md so the gate doc can never drift from the gate.
"""
import json
import os
import sys

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
dirs = sorted(
    d for d in os.listdir(out)
    if os.path.isdir(os.path.join(out, d)) and not d.startswith("_"))
with open(os.path.join(out, "oracle_sql.json")) as f:
    oracled = set(json.load(f))
missing = oracled - set(dirs)
if missing:
    print(f"WARNING: oracle entries with no dump: {sorted(missing)}",
          file=sys.stderr)
n, k = len(dirs), len(oracled & set(dirs))
print(f"Totals: {n} queries — {k} oracle-checked, {n - k} rows-only")
print("rows-only:", ", ".join(sorted(set(dirs) - oracled)))
