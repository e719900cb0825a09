#!/usr/bin/env python3
"""Round-by-round scaling table from two manifest dirs (N vs 4N cores).
Usage: scaling_report.py <manifests_N> <manifests_4N> <N> <4N>
"""
import json, sys, glob, os

def rounds(d):
    out = {}
    for f in glob.glob(os.path.join(d, "round-*.json")):
        m = json.load(open(f))
        out[m["round"]] = m["metrics"]
    return out

a, b = rounds(sys.argv[1]), rounds(sys.argv[2])
n, n4 = int(sys.argv[3]), int(sys.argv[4])
factor = n4 / n
print(f"| round | scheduled | {n}c wall (s) | {n4}c wall (s) | speedup | efficiency |")
print("|---|---|---|---|---|---|")
ta = tb = 0.0
for r in sorted(set(a) & set(b)):
    wa, wb = a[r]["wall_ms"] / 1000, b[r]["wall_ms"] / 1000
    ta += wa; tb += wb
    sp = wa / wb
    print(f"| {r} | {a[r]['scheduled_rows']:,} | {wa:.1f} | {wb:.1f} "
          f"| {sp:.2f}x | {sp/factor:.2f} |")
tot_sched = sum(a[r]["scheduled_rows"] for r in sorted(set(a) & set(b)))
print(f"| total | {tot_sched:,} | {ta:.1f} | {tb:.1f} "
      f"| {ta/tb:.2f}x | {ta/tb/factor:.2f} |")
ra, rb = tot_sched / ta, tot_sched / tb
print(f"\nrate {n}c = {ra:,.0f} urls/s; rate {n4}c = {rb:,.0f} urls/s; "
      f"efficiency = {rb/(factor*ra):.3f}")
# steady-state = the two largest rounds (the 10^10 operating regime)
big = sorted(set(a) & set(b),
             key=lambda r: a[r]["scheduled_rows"])[-2:]
sa = sum(a[r]["wall_ms"] for r in big) / 1000
sb = sum(b[r]["wall_ms"] for r in big) / 1000
ss = sum(a[r]["scheduled_rows"] for r in big)
print(f"steady-state (rounds {big}): {ss:,} urls; "
      f"{n}c {sa:.0f}s vs {n4}c {sb:.0f}s; efficiency = {sa/sb/factor:.3f}")
