#!/usr/bin/env python3
"""Dev-only scaling-exponent report: given two or more bench_out.json files
(from graft.Bench at increasing data scales) plus their relative data-size
factors, compute each query's scaling exponent between consecutive scale
points -- alpha = log(t_hi / t_lo) / log(size_hi / size_lo) -- and print a
markdown table sorted by the largest-step exponent.

alpha ~ 1 means linear scaling, < 1 sub-linear (fixed overheads amortizing,
or the query's work is range-bounded by design), > 1 super-linear (needs a
documented reason, e.g. an exact O(block^2) contract).

Usage: scale_report.py label1=path1:size1 label2=path2:size2 [...]
e.g.:  scale_report.py sf0.01=bench_sf001.json:1 sf0.1=bench_sf01.json:10 \
           sf1d=bench_sf1d.json:100
"""
import json
import math
import sys

points = []
for arg in sys.argv[1:]:
    label, rest = arg.split("=", 1)
    path, size = rest.rsplit(":", 1)
    with open(path) as f:
        data = json.load(f)
    points.append((label, float(size), data["queries"], data["value"]))

points.sort(key=lambda p: p[1])
queries = sorted(set().union(*[set(p[2]) for p in points]))

steps = [(points[i], points[i + 1]) for i in range(len(points) - 1)]
rows = []
for q in queries:
    cells, alphas = [], []
    for (l1, s1, q1, _), (l2, s2, q2, _) in steps:
        t1, t2 = q1.get(q, -1), q2.get(q, -1)
        if t1 is None or t2 is None or t1 <= 0 or t2 <= 0:
            cells.append("-")
            alphas.append(None)
            continue
        a = math.log(t2 / t1) / math.log(s2 / s1)
        cells.append(f"{t1:.2f}s->{t2:.2f}s a={a:.2f}")
        alphas.append(a)
    last = next((a for a in reversed(alphas) if a is not None), None)
    rows.append((q, cells, last))

rows.sort(key=lambda r: (r[2] is None, -(r[2] or 0)))
hdr = " | ".join(f"{a[0]}->{b[0]}" for a, b in steps)
print(f"| query | {hdr} |")
print("|---|" + "---|" * len(steps))
for q, cells, _ in rows:
    print(f"| {q} | " + " | ".join(cells) + " |")

tot = " ".join(f"{l}={v:.1f}s(n={len(qs)})" for l, _, qs, v in points)
print(f"\ntotals: {tot}")
for (l1, s1, _, v1), (l2, s2, _, v2) in steps:
    a = math.log(v2 / v1) / math.log(s2 / s1)
    print(f"total exponent {l1}->{l2}: {a:.2f}")
sup = [q for q, _, last in rows if last is not None and last > 1.1]
print(f"super-linear (last-step alpha > 1.1): {sup}")
