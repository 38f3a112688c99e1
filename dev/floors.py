#!/usr/bin/env python3
"""Build the per-query steady-state warm-floor table from one or more
Bench runs (r10 advice #1 / r11 advice #7: a committed floor per query so
driver-warm drift adjudication is a mechanical diff, not archaeology).

Usage: python3 dev/floors.py bench1.log [bench2.log ...]

Each input is a file containing Bench stdout (the JSON lines). The floor
for a query is the MIN warm value across the given runs (idle-host
best-of-N). Emits a markdown table sorted by query name.

Round 17 (VERDICT r16 item 2): when the logs carry the complete
"bench_self_util_all_pct" map (r17+ bench), a SECOND table is emitted —
the per-query quiet-util range (min-max % across runs). driftcheck.py
anchors on the LAST such table in BASELINE-notes.md to label a flagged
slot mechanically: util inside/above its quiet range = did more WORK
(regression); util well below it = got fewer CYCLES (starved).
"""
import json, re, sys

UTIL_HEADER = ("| query | util % (min-max) | query | util % (min-max) "
               "| query | util % (min-max) |")

maps = []
util_maps = []
for path in sys.argv[1:]:
    text = open(path).read()
    m = re.search(r'\{"bench_warm_pass_cs":(\{[^}]*\})\}', text)
    if not m:
        sys.exit(f"{path}: no bench_warm_pass_cs line")
    maps.append(json.loads(m.group(1)))
    u = re.search(r'\{"bench_self_util_all_pct":(\{[^}]*\})\}', text)
    if u:
        util_maps.append(json.loads(u.group(1)))

keys = sorted(maps[0], key=lambda k: int(k))
floors = {k: min(m[k] for m in maps) for k in keys}
total = sum(floors.values()) / 100.0


def three_col(header, fmt_cell):
    print(header)
    print("|---|---|---|---|---|---|")
    row = []
    for k in keys:
        row.append(fmt_cell(k))
        if len(row) == 3:
            print("| " + " | ".join(row) + " |")
            row = []
    if row:
        print("| " + " | ".join(row) + (" | |" * (3 - len(row))) + " |")


three_col("| query | floor (s) | query | floor (s) | query | floor (s) |",
          lambda k: f"q{k} | {floors[k] / 100:.2f}")
print()
print(f"Sum of floors: **{total:.1f} s** over {len(keys)} queries "
      f"({len(maps)} run(s), min per query).")

# warmup floor (r20 protocol): min warmup_sec across the given runs, in
# the exact declaration format driftcheck.py's warmup adjudication parses
warmups = [float(m.group(1)) for p in sys.argv[1:]
           for m in [re.search(r'"warmup_sec":([\d.]+)', open(p).read())] if m]
cpus = [m.group(1) for p in sys.argv[1:]
        for m in [re.search(r'"cpus":"?(\w+|\*)"?,"sf"', open(p).read())] if m]
mixed_cpus = cpus and len(set(cpus)) > 1
if warmups:
    print()
    if mixed_cpus:
        # mixed local[N] regimes (advice r20): a cross-regime min would be
        # unrepresentatively low and over-flag drift at driftcheck's 3x
        # bar — skip emission rather than emit an untagged mixed floor
        print(f"Warmup floor: SKIPPED — runs span cpus regimes "
              f"{sorted(set(cpus))}; declare per-regime floors from "
              f"single-regime run sets instead.")
    else:
        tag = f" (cpus={cpus[0]})" if cpus else ""
        print(f"Warmup floor{tag}: **{min(warmups):.1f} s** "
              f"(min of {len(warmups)} run(s)).")
probes = [int(m.group(1)) / 100.0 for p in sys.argv[1:]
          for m in [re.search(r'"warmup_probe_cs":(\d+)', open(p).read())] if m]
if probes and not mixed_cpus:
    tag = f" (cpus={cpus[0]})" if cpus else ""
    print(f"Warmup probe floor{tag}: **{min(probes):.2f} s** "
          f"(min of {len(probes)} run(s); carries residual session-start "
          f"JIT — normalize the probe by THIS, not the calib floor).")

if util_maps:
    # a -1 entry means /proc was unreadable for that slot — drop it rather
    # than let it masquerade as a 0% quiet baseline
    def vals(k):
        return [u[k] for u in util_maps if k in u and u[k] >= 0]
    covered = [k for k in keys if vals(k)]
    print()
    print(f"Per-query quiet self-utilization (%, min-max across "
          f"{len(util_maps)} run(s) carrying the complete map; the flagged-"
          f"slot reading baseline — see driftcheck.py):")
    print()
    three_col(UTIL_HEADER,
              lambda k: (f"q{k} | {min(vals(k))}-{max(vals(k))}"
                         if vals(k) else f"q{k} | -"))
    missing = [k for k in keys if not vals(k)]
    if missing:
        print()
        print(f"(no util sample: {', '.join('q' + k for k in missing)})")
