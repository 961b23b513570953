#!/usr/bin/env python3
"""Re-seed Bench.sf1MaxRatio from a committed sf1 bench artifact (builder
tooling; NOT part of the library). Rule (SURVEY §6 / VERDICT r11 #3): for
every row the artifact measured, ceiling = 1.5x the measured sf1/sf0.1
ratio — the ADJUDICATED (isolated) ratio where the artifact carries one —
rounded UP to one decimal, floor 1.5. Prints the Scala map body so the
committed gate is a mechanical copy of the committed artifact, never prose.

Usage: reseed_ratios.py BENCH_rN_sf1.json
"""
import json, math, sys

art = json.load(open(sys.argv[1]))
ratios = dict(art.get("ratios", {}))
ratios.update(art.get("ratio_adjudicated", {}))  # isolated beats in-suite

rows = []
for name in sorted(ratios):
    r = ratios[name]
    ceil = max(1.5, math.ceil(r * 1.5 * 10) / 10)
    rows.append((name, ceil))

out, line = [], "    "
for name, ceil in rows:
    ent = f'"{name}" -> {ceil}, '
    if len(line) + len(ent) > 74:
        out.append(line.rstrip())
        line = "    "
    line += ent
out.append(line.rstrip().rstrip(","))
print("\n".join(out))
