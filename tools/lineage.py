#!/usr/bin/env python3
"""Per-run / per-section lineage summary of BENCH_LOCAL.jsonl.

Usage: python3 tools/lineage.py [sf_dir_suffix] [n_last]

Prints, for each FINAL artifact line of the given sf (default sf0.1),
the run id, code fingerprint, headline total + load_flag, and each
section's op-sum, runs, tmp_delta, and load_flag — the mechanical view
COVERAGE.md cites instead of hand-picking numbers.
"""
import json
import sys

SECTIONS = [
    "maintenance", "sf1", "indexed_sf1", "maintenance_sf1", "skew",
    "skew_vec", "maintenance_skew", "sf10", "maintenance_sf10",
]


def flag_summary(flag):
    if flag is None:
        return "-"
    if "recovered_by_rerun" in flag:
        return "recovered(med=%.2f)" % flag.get("median_inflation", -1)
    if "guard_error" in flag:
        return "guard_error"
    return "FLAG(med=%.2f%s)" % (
        flag.get("median_inflation", -1),
        ",code_mismatch" if flag.get("code_mismatch") else "")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    n_last = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    lines = []
    for line in open("BENCH_LOCAL.jsonl"):
        if '"partial":false' in line and '"compact":true' not in line \
                and '"sf":"' in line and sf + '"' in line:
            lines.append(json.loads(line))
    for d in lines[-n_last:]:
        b = d["bench"]
        print("run %s code=%s set=%s total=%.1fs load=%s" % (
            d["run_id"], b.get("code", "?"), b.get("query_set", "?"),
            b.get("value", -1), flag_summary(b.get("load_flag"))))
        for s in SECTIONS:
            sec = b.get(s)
            if not isinstance(sec, dict):
                continue
            ops = sec.get("queries") or sec.get("ops") or sec.get("skew") \
                or {k: v for k, v in sec.items()
                    if isinstance(v, (int, float)) and k != "tmp_delta"}
            opsum = sum(v for v in ops.values()
                        if isinstance(v, (int, float)) and v > 0)
            bits = []
            if "runs" in sec:
                bits.append("runs=%s" % sec["runs"])
            if "tmp_delta" in sec:
                bits.append("tmp=%+d" % sec["tmp_delta"])
            if sec.get("flagged"):
                bits.append("flagged=%s" % ",".join(sec["flagged"]))
            skipped = sec.get("skipped")
            if skipped:
                print("  %-17s skipped: %s" % (s, skipped))
            else:
                print("  %-17s sum=%7.1fs load=%-22s %s" % (
                    s, opsum, flag_summary(sec.get("load_flag")),
                    " ".join(bits)))
        pre = (b.get("maintenance_sf10") or {}).get("pre_state") or {}
        if pre:
            print("  pre_state(maint10): tmp_entries=%s graft_tmp=%s" % (
                pre.get("tmp_entries"), pre.get("graft_tmp_entries")))
        print()


if __name__ == "__main__":
    main()
