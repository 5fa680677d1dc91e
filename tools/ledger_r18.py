#!/usr/bin/env python3
"""Round-18 ledger helper: min across the closing sweeps vs BENCH_REF.

Usage: python3 tools/ledger_r18.py s1.json [s2.json ...]
Prints per-query: min(sweeps), ref, ratio — sorted by ratio desc; flags
new queries (no ref) and candidate ref tightenings (min < ref).
"""
import json, sys

sweeps = [json.load(open(p))["queries"] for p in sys.argv[1:]]
ref = json.load(open("BENCH_REF.json"))
refq = ref.get("queries", ref)

keys = set()
for s in sweeps:
    keys |= set(s)
best = {k: min(s[k] for s in sweeps if k in s) for k in keys}

new, tighten, watch = [], [], []
rows = []
for k, v in best.items():
    r = refq.get(k)
    if r is None:
        new.append((k, v))
        continue
    ratio = v / r
    rows.append((ratio, k, v, r))
    if v < r:
        tighten.append((k, v, r))
    if ratio >= 1.4:
        watch.append((k, v, r, round(ratio, 2)))

rows.sort(reverse=True)
print("== worst ratios vs ref ==")
for ratio, k, v, r in rows[:15]:
    print(f"  {k:28s} {v:7.3f} ref {r:7.3f}  {ratio:.2f}x")
med = sorted(x[0] for x in rows)[len(rows) // 2]
print(f"median ratio {med:.3f} over {len(rows)} ref'd queries")
print(f"\n== new queries (seed refs) ==")
for k, v in sorted(new):
    print(f"  {k:28s} {v:7.3f}")
print(f"\n== tightenings (min < ref): {len(tighten)} ==")
for k, v, r in sorted(tighten):
    print(f"  {k:28s} {v:7.3f} < {r:7.3f}")
print(f"\n== still >=1.4x (watch) ==")
for k, v, r, ratio in sorted(watch, key=lambda x: -x[3]):
    print(f"  {k:28s} {v:7.3f} ref {r:7.3f}  {ratio}x")
