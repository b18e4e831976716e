#!/usr/bin/env python3
"""Diff two graft.Bench JSON captures (dev tool, engine-independent).

Usage: python3 scripts/bench_compare.py PREV.json CUR.json [--reg-factor 2.0]

Prints totals, the calibration probes/load of each capture (a contended
capture shows inflated probes — see Bench.scala), per-query regressions
beyond max(reg_factor x, +1s), and queries new/gone between captures.
"""
import json, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
factor = 2.0
for i, a in enumerate(sys.argv):
    if a == "--reg-factor" and i + 1 < len(sys.argv):
        factor = float(sys.argv[i + 1])
prev, cur = (json.load(open(p)) for p in args[:2])
pq, cq = prev["queries"], cur["queries"]

def probes(d):
    return "probes %.2f/%.2f load %.2f" % (
        d.get("probe_pre", -1), d.get("probe_post", -1), d.get("load_avg", -1))

print("prev total %.1fs (%s)" % (prev["value"], probes(prev)))
print("cur  total %.1fs (%s)" % (cur["value"], probes(cur)))
new = {k: round(v, 2) for k, v in cq.items() if k not in pq}
gone = sorted(k for k in pq if k not in cq)
if new: print("new:", new)
if gone: print("gone:", gone)
regs = {k: (round(pq[k], 2), round(cq[k], 2))
        for k in cq if k in pq and cq[k] > max(factor * pq[k], pq[k] + 1.0)}
print("regressions (>%gx and >+1s): %s" % (factor, regs or "none"))
sys.exit(1 if regs else 0)
