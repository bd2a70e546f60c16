#!/usr/bin/env python3
"""Emit the scaling-ratio table for a sf0.1 -> sfN bench pair.

Reads two bench.json records (written by graft.Bench) and prints a
markdown table of per-query times and the time ratio, sorted worst
first. A query is flagged **superlinear** when its ratio exceeds the
data multiplier times the tolerance head-room (default mult=10,
flag at > 0.8*mult: ratios near the multiplier are linear-in-rows,
well below it means fixed costs amortize, above it means the plan
grows faster than the data).

Usage: sweep_ratio.py <bench_sf0.1.json> <bench_sfN.json> [mult]
"""
import json
import sys

base = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
mult = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
flag_at = 0.8 * mult

bq, gq = base["queries"], big["queries"]
rows = []
for name in sorted(bq):
    if name not in gq:
        continue
    t0, t1 = bq[name], gq[name]
    ratio = t1 / t0 if t0 > 0 else float("inf")
    rows.append((name, t0, t1, ratio))
rows.sort(key=lambda r: -r[3])

print(f"| query | sf0.1 s | sf{mult/10:g} s | ratio |")
print("|---|---|---|---|")
for name, t0, t1, ratio in rows:
    mark = " **superlinear**" if ratio > flag_at and t1 > 1.0 else ""
    print(f"| {name} | {t0:.2f} | {t1:.2f} | {ratio:.1f}x{mark} |")

total0 = sum(r[1] for r in rows)
total1 = sum(r[2] for r in rows)
print()
print(f"Total: {total0:.1f} s -> {total1:.1f} s "
      f"({total1 / total0:.1f}x for {mult:g}x data) over {len(rows)} queries.")
flagged = [r[0] for r in rows if r[3] > flag_at and r[2] > 1.0]
print(f"Flagged (> {flag_at:g}x and > 1 s at scale): "
      + (", ".join(flagged) if flagged else "none") + ".")
