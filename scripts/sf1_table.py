#!/usr/bin/env python3
"""Build the sf0.1-vs-sf1 ratio table (r14, the r13 verdict's #5).

Inputs: the committed bench_out.json (sf0.1) and bench_out_sf1.json
(derived sf1, duckdb_sec swapped in from the sf1 baseline run). For the
comparable entries (same definition as survey_numbers.py) prints per-sf
Spark/DuckDB ratios and the scale factor of each engine's own time, and
the headline geomeans — the point is watching the sf0.1 ratios (which
embed Spark's fixed ~0.2-0.4 s plan+schedule floor against millisecond
DuckDB scans) collapse toward plan-true cost at 10x the data.

Usage: sf1_table.py [bench_out.json] [bench_out_sf1.json]
"""
import json
import math
import sys

b01 = json.load(open(sys.argv[1] if len(sys.argv) > 1 else 'bench_out.json'))
b1 = json.load(open(sys.argv[2] if len(sys.argv) > 2 else 'bench_out_sf1.json'))


def comparable(d):
    q, dd = d['queries'], d['duckdb_sec']
    return {k: (q[k], dd[k]) for k in q
            if (k.startswith('q') or k.startswith(('text_', 'dedup_', 'ann_')))
            and isinstance(dd.get(k), (int, float))}


c01, c1 = comparable(b01), comparable(b1)
both = sorted(set(c01) & set(c1))


def geo(rs):
    return math.exp(sum(math.log(r) for r in rs) / len(rs))


print(f"| entry | sf0.1 spark | sf0.1 duck | ratio | sf1 spark | sf1 duck | ratio | spark x | duck x |")
print("|---|---|---|---|---|---|---|---|---|")
for k in both:
    s0, d0 = c01[k]
    s1, d1 = c1[k]
    print(f"| {k} | {s0:.2f} | {d0:.3f} | {s0 / d0:.1f}x | {s1:.2f} | {d1:.3f} | "
          f"{s1 / d1:.1f}x | {s1 / s0:.1f} | {d1 / d0:.1f} |")
r0 = [c01[k][0] / c01[k][1] for k in both]
r1 = [c1[k][0] / c1[k][1] for k in both]
print(f"\nentries both-finite: {len(both)}")
print(f"geomean sf0.1: {geo(r0):.2f}x   within-2x: {sum(1 for r in r0 if r <= 2)}/{len(r0)}")
print(f"geomean sf1  : {geo(r1):.2f}x   within-2x: {sum(1 for r in r1 if r <= 2)}/{len(r1)}")
only01 = sorted(set(c01) - set(c1))
if only01:
    print(f"sf1 DuckDB DNF/missing ({len(only01)}): {', '.join(only01)}")
