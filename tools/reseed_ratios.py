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
from fractions import Fraction

art = json.load(open(sys.argv[1]))
ratios = dict(art.get("ratios", {}))
ratios.update(art.get("ratio_adjudicated", {}))  # isolated beats in-suite

rows = []
for name in sorted(ratios):
    # Exact decimal arithmetic (ADVICE r13): binary-float ceil(r*15) can
    # round a tenth high (4.2 -> 6.4 instead of 6.3), drifting the
    # 'mechanical copy' rule from its stated decimal form.
    r = Fraction(str(ratios[name]))
    tenths = math.ceil(r * 15)  # ceil(r * 1.5 * 10), exact on Fraction
    ceil = max(Fraction(3, 2), Fraction(tenths, 10))
    rows.append((name, float(ceil)))

out, line = [], "    "
for name, ceil in rows:
    ent = f'"{name}" -> {ceil}, '
    if len(line) + len(ent) > 74:
        out.append(line.rstrip())
        line = "    "
    line += ent
out.append(line.rstrip().rstrip(","))
print("\n".join(out))
