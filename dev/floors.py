#!/usr/bin/env python3
"""Build the per-query steady-state warm-floor table from one or more
Bench runs (r10 advice #1 / r11 advice #7: a committed floor per query so
driver-warm drift adjudication is a mechanical diff, not archaeology).

Usage: python3 dev/floors.py bench1.log [bench2.log ...]

Each input is a file containing Bench stdout (the three JSON lines). The
floor for a query is the MIN warm value across the given runs (idle-host
best-of-N). Emits a markdown table sorted by query name.
"""
import json, re, sys

maps = []
for path in sys.argv[1:]:
    text = open(path).read()
    m = re.search(r'\{"bench_warm_pass_cs":(\{[^}]*\})\}', text)
    if not m:
        sys.exit(f"{path}: no bench_warm_pass_cs line")
    maps.append(json.loads(m.group(1)))

keys = sorted(maps[0], key=lambda k: int(k))
floors = {k: min(m[k] for m in maps) for k in keys}
total = sum(floors.values()) / 100.0

print("| query | floor (s) | query | floor (s) | query | floor (s) |")
print("|---|---|---|---|---|---|")
row = []
for k in keys:
    row.append(f"q{k} | {floors[k] / 100:.2f}")
    if len(row) == 3:
        print("| " + " | ".join(row) + " |")
        row = []
if row:
    print("| " + " | ".join(row) + (" | |" * (3 - len(row))) + " |")
print()
print(f"Sum of floors: **{total:.1f} s** over {len(keys)} queries "
      f"({len(maps)} run(s), min per query).")
