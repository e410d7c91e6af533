#!/usr/bin/env python3
"""Merge per-query mins from one or more bench_result JSON lines into
src/main/resources/graft/bench_baseline.txt (min(old, new) per query;
new queries appended). Usage: merge_baseline.py run1.json [run2.json ...]"""
import json, re, sys

BASE = 'src/main/resources/graft/bench_baseline.txt'
lines = open(BASE).read().splitlines()
base = {}
for ln in lines:
    m = re.match(r'^(q\d+)\s+([\d.]+)', ln)
    if m: base[m.group(1)] = float(m.group(2))
old_total = sum(base.values())
for f in sys.argv[1:]:
    run = json.loads(open(f).read().splitlines()[0])
    for k, v in run['queries'].items():
        base[k] = min(base.get(k, float('inf')), v)
hdr = [ln for ln in lines if ln.startswith('#')]
out = hdr + [f"{q} {base[q]}" for q in sorted(base, key=lambda x: int(x[1:]))]
open(BASE, 'w').write('\n'.join(out) + '\n')
print(f"merged {len(sys.argv)-1} runs: {len(base)} queries, "
      f"composite {old_total:.2f} -> {sum(base.values()):.2f} s")
