#!/usr/bin/env python3
"""Compare an sf1 (10x) bench run against the recorded sf0.1 per-query
baseline and flag superlinear scaling.

Usage: python3 tools/scale_check.py [sf1_bench.json] [flag_ratio]

A query that costs t at sf0.1 should cost ~10t at sf1 if its work is
linear in data volume. Ratios meaningfully above 10 point at quadratic
candidate generation, a partition strategy that stopped fitting, or a
single-task stage (exactly what a 100 TB cluster run would hit). Small
queries amortize fixed per-query costs (planning, codegen, task launch),
so sub-second-baseline queries routinely show ratios FAR below 10 and
only large ratios on them indicate real work growth; the flag threshold
therefore applies to the measured seconds, not just the ratio.
"""
import json
import sys

BENCH = sys.argv[1] if len(sys.argv) > 1 else "target/bench_result.json"
FLAG_RATIO = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
BASELINE = "src/main/resources/graft/bench_baseline.txt"

# operators with a documented superlinear-but-bounded contract get their
# contract bound instead of the default flag ratio
CONTRACT = {
    # IVF with a sqrt(n) codebook is n^1.5 by design (Similarity.ivfAutoK):
    # at 10x data the contract allows 10^1.5 ~= 31.6x.
    # Codebook ceiling: k tracks ceil(sqrt(n)) up to 65536 (n ~= 4.3B
    # vectors); past Similarity.FlatScanMax=2048 assignment is two-level
    # coarse/fine (~2*sqrt(k)*d flops/row), so the ceiling is a plan-
    # literal-size bound (65536 x 64 doubles ~= 33 MB), not a flop bound.
    # Beyond 4.3B vectors: shard the corpus, per-shard codebooks.
    "q40": 32.0,
    # SemDeDup shares the same sqrt(n)-cells structure (Similarity.semDedup):
    # within-cell comparisons are sum(s_c^2) ~= n^1.5 at sqrt(n) occupancy
    "q142": 32.0,
    # sharded IVF rides the same n^1.5 contract per shard; total probe
    # volume is n^1.5/sqrt(S), so the q40 bound covers it with slack
    "q203": 32.0,
}

base = {}
for line in open(BASELINE):
    line = line.strip()
    if line and not line.startswith("#"):
        k, v = line.split()
        base[k] = float(v)

d = json.load(open(BENCH))
qs = d["queries"]
rows = []
for k, t in qs.items():
    b = base.get(k)
    rows.append((k, b, t, (t / b) if b else None))

rows.sort(key=lambda r: -(r[3] or 0))
print(f"{'query':8} {'sf0.1':>7} {'sf1':>8} {'ratio':>7}")
flagged = []
for k, b, t, r in rows:
    tag = ""
    if r is not None and r > CONTRACT.get(k, FLAG_RATIO) and t > 2.0:
        tag = "  <-- SUPERLINEAR?"
        flagged.append(k)
    elif r is not None and k in CONTRACT and r > FLAG_RATIO:
        tag = f"  (within {CONTRACT[k]}x contract)"
    print(f"{k:8} {b if b is not None else float('nan'):7.2f} "
          f"{t:8.2f} {r if r is not None else float('nan'):7.1f}{tag}")

# totals over the OVERLAP only, so queries missing a baseline row can't
# inflate the ratio; bail with a diagnostic rather than divide by zero
overlap = [(b, t) for _, b, t, _ in rows if b]
if not overlap:
    print("\nno bench query matches any baseline row - check that "
          f"{BASELINE} is current (keys are qNN short names)")
    sys.exit(2)
total_b = sum(b for b, _ in overlap)
total_t = sum(t for _, t in overlap)
skipped = len(rows) - len(overlap)
note = f"; {skipped} queries lack a baseline row and are excluded" \
    if skipped else ""
print(f"\ntotal ({len(overlap)} baselined queries): sf0.1={total_b:.1f}s "
      f"sf1={total_t:.1f}s ratio={total_t / total_b:.1f} (linear target "
      f"~10, below = fixed-cost amortization){note}")
if flagged:
    print(f"flagged ({FLAG_RATIO}x+ and >2s): {', '.join(flagged)}")
    sys.exit(1)
print("no superlinear outliers")
