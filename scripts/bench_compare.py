#!/usr/bin/env python3
"""Diff two graft.Bench JSON captures (dev tool, engine-independent).

Usage: python3 scripts/bench_compare.py PREV.json CUR.json
         [--reg-factor 2.0] [--clean-floor SECONDS]

Prints totals, each capture's calibration probes and load average, the
probe SPREAD (max/median over the pre/interleaved/post probe series — a
contended capture inflates the probes that bracket the contention
window, so spread > ~2x marks the timing run itself as untrustworthy;
see Bench.scala), per-query regressions beyond max(reg_factor x, +1s),
and queries new/gone between captures.

Exit status: 1 if there are per-query regressions AND both captures'
probe spreads look clean (a contaminated capture is a measurement
problem, not a regression), else 0.
"""
import argparse
import json
import os

# Two independent contamination signals over the probe series:
#  - spread (max/median > limit): a contention WINDOW inside the run
#    inflates the probes bracketing it (r7's mid-run artifact);
#  - absolute floor (min > floor): contention spanning the WHOLE run
#    inflates every probe about equally, so the spread stays flat but
#    even the quietest probe is far off the known-clean probe time for
#    the fixed 100M-row probe plan (r7's driver capture: probes
#    0.29/0.40, spread 1.4x — floor catches it).
SPREAD_LIMIT = 2.0
# Machine-specific: ~0.10-0.15s on the round container. On a slower box
# every capture would trip a hardcoded floor — and since regressions on
# a "contended" capture exit 0, that would silently disable the gate —
# so the floor is tunable per machine (flag wins over env over default).
DEFAULT_CLEAN_FLOOR = float(os.environ.get("GRAFT_CLEAN_FLOOR", "0.25"))


def probe_series(d):
    # "probes" (r8+) is the full pre/interleaved/post series; older
    # captures only carried the two endpoint probes.
    ps = d.get("probes")
    if not ps:
        ps = [p for p in (d.get("probe_pre"), d.get("probe_post")) if p is not None]
    return [p for p in ps if p and p > 0]


def describe(tag, d, clean_floor):
    ps = probe_series(d)
    if not ps:
        print("%s total %.1fs (no probes)" % (tag, d["value"]))
        return False
    med = sorted(ps)[len(ps) // 2]
    spread = max(ps) / med
    contended = spread > SPREAD_LIMIT or min(ps) > clean_floor
    # newer captures stamp their own verdict (Bench also folds in the
    # start load average); trust the stamp when present
    if d.get("contended") is not None:
        contended = contended or bool(d["contended"])
    flag = "  << CONTENDED CAPTURE" if contended else ""
    print("%s total %.1fs (probes n=%d min %.2f med %.2f max %.2f spread %.2fx load %.2f)%s"
          % (tag, d["value"], len(ps), min(ps), med, max(ps), spread,
             d.get("load_avg", -1), flag))
    if len(ps) > 2 and contended:
        print("  probe series:", " ".join("%.2f" % p for p in ps))
    return contended


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("prev", help="previous Bench JSON capture")
    ap.add_argument("cur", help="current Bench JSON capture")
    ap.add_argument("--reg-factor", type=float, default=2.0,
                    help="per-query slowdown factor counted as a regression")
    ap.add_argument("--clean-floor", type=float, default=DEFAULT_CLEAN_FLOOR,
                    help="probe seconds above which even a flat-spread capture "
                         "counts as contended (machine-specific; also settable "
                         "via GRAFT_CLEAN_FLOOR)")
    args = ap.parse_args()

    prev = json.load(open(args.prev))
    cur = json.load(open(args.cur))
    # Driver-side BENCH_r*.json wraps the engine's line under "parsed".
    if "queries" not in prev and isinstance(prev.get("parsed"), dict):
        prev = prev["parsed"]
    if "queries" not in cur and isinstance(cur.get("parsed"), dict):
        cur = cur["parsed"]
    for tag, d, p in (("prev", prev, args.prev), ("cur", cur, args.cur)):
        if "queries" not in d:
            raise SystemExit(
                f"{tag} capture {p} has no query timings (truncated driver "
                f"capture with parsed=null? use the engine-written "
                f"bench_latest.json instead)")
    pq, cq = prev["queries"], cur["queries"]

    contended_prev = describe("prev", prev, args.clean_floor)
    contended_cur = describe("cur ", cur, args.clean_floor)

    new = {k: round(v, 2) for k, v in cq.items() if k not in pq}
    gone = sorted(k for k in pq if k not in cq)
    if new:
        print("new:", new)
    if gone:
        print("gone:", gone)

    regs = {k: (round(pq[k], 2), round(cq[k], 2))
            for k in cq if k in pq and cq[k] > max(args.reg_factor * pq[k], pq[k] + 1.0)}
    print("regressions (>%gx and >+1s): %s" % (args.reg_factor, regs or "none"))
    clean = not (contended_prev or contended_cur)
    if regs and not clean:
        print("NOTE: the probes mark a capture as contended — re-measure "
              "before treating the regressions as real.")
    return 1 if (regs and clean) else 0


if __name__ == "__main__":
    raise SystemExit(main())
