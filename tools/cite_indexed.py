#!/usr/bin/env python3
"""Print the indexed_sf1 speedups + run_id of the LAST final line in
BENCH_LOCAL.jsonl — the exact line the driver ships as the round's
artifact. COVERAGE.md's standing-index citation must quote THIS
output (r14 verdict #2: cited run_id == shipped artifact run_id; no
hand-picked runs)."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.jsonl"
last = None
for line in open(path):
    line = line.strip()
    if not line:
        continue
    d = json.loads(line)
    b = d.get("bench", {})
    if b.get("partial") is False and not b.get("compact"):
        last = d
if last is None:
    sys.exit("no final line in " + path)
b = last["bench"]
print("run_id:", last["run_id"])
print("headline total:", b.get("value"), "total_r4set:", b.get("total_r4set"))
print("load_flag:", json.dumps(b.get("load_flag")))
idx = b.get("indexed_sf1")
if isinstance(idx, dict):
    sp = idx.get("speedup_vs_scratch", {})
    for k in sorted(sp, key=lambda k: -sp[k]):
        print(f"  indexed_sf1 {k}: {sp[k]}x")
    print("  noise_band:", json.dumps(idx.get("noise_band")))
else:
    print("indexed_sf1:", json.dumps(idx))
