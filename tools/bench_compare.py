#!/usr/bin/env python3
"""Compare a fresh BENCH_LOCAL.json against a committed record.

Usage: bench_compare.py [gitRef:path] [threshold]

Prints gates whose per-gate time moved more than `threshold`× in either
direction (default 2.0), plus totals — the repo's standing
noise-adjudication step before recording a bench (PERF.md).
"""
import json
import subprocess
import sys

ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD:BENCH_LOCAL.json"
thr = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0

new = json.load(open("BENCH_LOCAL.json"))
old = json.loads(subprocess.check_output(["git", "show", ref]))

nq, oq = new["queries"], old["queries"]
common = sorted(set(nq) & set(oq))
movers = []
for k in common:
    if oq[k] > 0.05 and (nq[k] / oq[k] > thr or oq[k] / nq[k] > thr) \
            and abs(nq[k] - oq[k]) > 0.3:
        movers.append((nq[k] / oq[k], k))
for r, k in sorted(movers, reverse=True):
    print(f"  {k:40s} {oq[k]:7.2f}s -> {nq[k]:7.2f}s  ({r:.2f}x)")
print(f"{len(movers)} movers > {thr}x (of {len(common)} common gates)")
new_only = sorted(set(nq) - set(oq))
if new_only:
    print(f"new gates: " + ", ".join(f"{k}={nq[k]:.2f}s" for k in new_only))
print(f"total: {old['value']:.1f}s/{len(oq)} -> {new['value']:.1f}s/{len(nq)}"
      f"  ({old['value']/len(oq):.3f} -> {new['value']/len(nq):.3f} s/gate)")
