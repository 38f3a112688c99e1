#!/usr/bin/env python3
"""Mechanical driver-warm drift adjudication: diff a driver BENCH_r{N}.json
(or a local bench log) against the committed per-query warm-floor table in
BASELINE-notes.md (the LAST floor table in the file — later tables
supersede earlier ones by convention).

Usage: python3 dev/driftcheck.py BENCH_r13.json [--ratio 2.0]

Reading rules (BASELINE-notes, protocol v2): driver-warm / floor <= ~2x is
host contention; a query consistently above the ratio is a real regression
to root-cause with QProbe. Exit code 0 always — this is an adjudication
AID, not a gate; the 2x suite gate is the driver's.
"""
import json
import re
import sys


def warm_map(path):
    """Per-query warm seconds from a driver BENCH json or a raw bench log."""
    text = open(path).read()
    # driver json wraps the bench stdout tail; raw logs contain it directly
    try:
        j = json.loads(text)
        text = j.get("tail", text)
    except ValueError:
        pass
    text = text.replace("\\\"", '"')  # tail is an escaped-JSON string
    m = re.search(r'\{"bench_warm_pass_cs":(\{[^}]*\})\}', text)
    if not m:
        sys.exit(f"{path}: no bench_warm_pass_cs map found")
    return {k.lstrip("q"): v / 100.0 for k, v in json.loads(m.group(1)).items()}


def floor_table():
    """The LAST committed floor table in BASELINE-notes.md."""
    text = open("BASELINE-notes.md").read()
    rows = {}
    # tables repeat; later entries overwrite earlier ones (supersede order)
    for m in re.finditer(r"\| (q\d+) \| ([\d.]+) ", text):
        rows[m.group(1).lstrip("q")] = float(m.group(2))
    if not rows:
        sys.exit("BASELINE-notes.md: no floor table found")
    return rows


def main():
    path = sys.argv[1]
    ratio = float(sys.argv[sys.argv.index("--ratio") + 1]) if "--ratio" in sys.argv else 2.0
    warm, floors = warm_map(path), floor_table()
    flagged, missing = [], []
    for q in sorted(warm, key=lambda k: int(k)):
        w = warm[q]
        f = floors.get(q)
        if f is None:
            missing.append(q)
            continue
        r = w / f if f > 0 else float("inf")
        mark = "  <-- ABOVE RATIO" if (r > ratio or w < 0) else ""
        print(f"q{q:>3}  warm {w:6.2f}  floor {f:5.2f}  ratio {r:5.2f}{mark}")
        if r > ratio or w < 0:
            flagged.append((q, w, f, r))
    total_w = sum(v for v in warm.values() if v >= 0)
    total_f = sum(floors[q] for q in warm if q in floors)
    print(f"\nsuite: warm {total_w:.1f} s vs floor-sum {total_f:.1f} s "
          f"= {total_w / total_f:.2f}x (host-contention multiplier)")
    if missing:
        print(f"no committed floor yet (new queries?): {', '.join('q' + q for q in missing)}")
    if flagged:
        print(f"{len(flagged)} quer{'y' if len(flagged) == 1 else 'ies'} above "
              f"{ratio}x floor — normalize by the suite multiplier first, then QProbe "
              f"what remains: " + ", ".join("q" + q for q, *_ in flagged))
    else:
        print(f"no query above {ratio}x its floor — no drift to adjudicate")


if __name__ == "__main__":
    main()
