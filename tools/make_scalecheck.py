#!/usr/bin/env python3
"""Assemble SCALECHECK_rN.json from the scale-tool output lines (builder
tooling; VERDICT r13 #3 — the sf1/sf10 spot-check RESULTS previously lived
only in SURVEY prose, the "measured but not committed" class one level
down). Feed it the collected stdout lines of:

  - tools/sf1_pair_spotcheck.py   ("<name>: OK pairs=N score_mismatch=0 ...")
  - graft.tools.LshPrefilterAb    ("[lsh-ab] sfDir=... prefilterOn=N ... IDENTICAL")
  - graft.tools.SemDedupScaleDiag ("RESULT sf=... n=N k=K ... pair_mass=M ...")
  - graft.tools.LshScaleDiag      ("RESULT sf=... multi_buckets=... pairs_capped=...")
  - an isolated bench one-liner   ("ISOLATED <query> sf=<dir> median_sec=<t> budget=<b>")
  - a scale oracle-compare line   ("ORACLE sf=<dir> names=<csv> ok=<n> bad=<n>",
    the summary of tools/oracle_check.py run at a scale dir)

Every recognized line becomes one typed JSON entry carrying its raw line,
so the artifact is a mechanical transform of tool output, never prose.
Lines that match no shape are an ERROR (a silently dropped check would
read as "ran and passed").

Usage: make_scalecheck.py ROUND < raw_lines.txt > SCALECHECK_rN.json
"""
import json, re, sys

round_n = int(sys.argv[1])
entries = []
errors = []

def sf_tag(path):
    m = re.search(r"sf[\d.]+", path)
    return m.group(0) if m else path

for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    m = re.fullmatch(r"(\w+): (OK|FAIL) pairs=(\d+) score_mismatch=(\d+) "
                 r"below_threshold=(\d+)(?: err_mismatch=(\d+))?(?: sf=(\S+))?", line)
    if m:
        e = {"check": "pair_spotcheck", "name": m.group(1),
             "verdict": m.group(2), "n_pairs": int(m.group(3)),
             "score_mismatch": int(m.group(4)),
             "below_threshold": int(m.group(5)),
             "tool": "tools/sf1_pair_spotcheck.py", "raw": line}
        if m.group(6) is not None:
            e["err_mismatch"] = int(m.group(6))
        if m.group(7):
            e["sf"] = sf_tag(m.group(7))
        entries.append(e)
        continue
    m = re.fullmatch(r"\[lsh-ab\] sfDir=(\S+) prefilterOn=(\d+) prefilterOff=(\d+) "
                 r"onlyOn=(\d+) onlyOff=(\d+) (IDENTICAL|MISMATCH)", line)
    if m:
        entries.append({"check": "prefilter_ab", "name": "d02_minhash_lsh",
                        "sf": sf_tag(m.group(1)),
                        "pairs_on": int(m.group(2)), "pairs_off": int(m.group(3)),
                        "only_on": int(m.group(4)), "only_off": int(m.group(5)),
                        "verdict": m.group(6),
                        "tool": "graft.tools.LshPrefilterAb", "raw": line})
        continue
    m = re.fullmatch(r"RESULT sf=(\S+) n=(\d+) k=(\d+) n_cells=(\d+) "
                 r"max_cell=(\d+) pair_mass=(\d+) n_assigned=(\d+)", line)
    if m:
        entries.append({"check": "semdedup_pair_census",
                        "name": "x03_semdedup_scaledk", "sf": sf_tag(m.group(1)),
                        "n": int(m.group(2)), "k": int(m.group(3)),
                        "n_cells": int(m.group(4)), "max_cell": int(m.group(5)),
                        "pair_mass": int(m.group(6)),
                        "n_assigned": int(m.group(7)),
                        "tool": "graft.tools.SemDedupScaleDiag", "raw": line})
        continue
    m = re.fullmatch(r"RESULT sf=(\S+) multi_buckets=(\d+) max_bucket=(\d+) "
                 r"pairs_uncapped=([\d.eE+]+) pairs_capped=([\d.eE+]+)", line)
    if m:
        entries.append({"check": "lsh_bucket_census", "name": "d02_minhash_lsh",
                        "sf": sf_tag(m.group(1)),
                        "multi_buckets": int(m.group(2)),
                        "max_bucket": int(m.group(3)),
                        "pairs_uncapped": float(m.group(4)),
                        "pairs_capped": float(m.group(5)),
                        "tool": "graft.tools.LshScaleDiag", "raw": line})
        continue
    m = re.fullmatch(r"ISOLATED (\S+) sf=(\S+) median_sec=([\d.]+) budget=([\d.]+)", line)
    if m:
        t, b = float(m.group(3)), float(m.group(4))
        entries.append({"check": "isolated_rerun", "name": m.group(1),
                        "sf": sf_tag(m.group(2)), "median_sec": t, "budget": b,
                        "verdict": "within_budget" if t <= b else "breach",
                        "raw": line})
        continue
    m = re.fullmatch(r"SPILLWALL (\S+) sf=(\S+) walls_sec=(\S+) shuffle_mb=(\S+) "
                 r"spill_mb=(\S+)", line)
    if m:
        walls = [float(x) for x in m.group(3).split(",")]
        entries.append({"check": "spill_wall_reruns", "name": m.group(1),
                        "sf": sf_tag(m.group(2)), "walls_sec": walls,
                        "shuffle_mb": [float(x) for x in m.group(4).split(",")],
                        "spill_mb": [float(x) for x in m.group(5).split(",")],
                        "raw": line})
        continue
    m = re.fullmatch(r"XALG (\S+) sf=(\S+) rows_a=(\d+) rows_b=(\d+) "
                 r"only_a=(\d+) only_b=(\d+) (IDENTICAL|MISMATCH)", line)
    if m:
        entries.append({"check": "cross_algorithm_compare",
                        "name": m.group(1), "sf": sf_tag(m.group(2)),
                        "rows_a": int(m.group(3)), "rows_b": int(m.group(4)),
                        "only_a": int(m.group(5)), "only_b": int(m.group(6)),
                        "verdict": m.group(7),
                        "tool": "duckdb EXCEPT over the two Verify dumps",
                        "raw": line})
        continue
    m = re.fullmatch(r"ORACLE sf=(\S+) names=(\S+) ok=(\d+) bad=(\d+)", line)
    if m:
        names = m.group(2).split(",")
        entries.append({"check": "oracle_compare_at_scale",
                        "name": ",".join(names), "sf": sf_tag(m.group(1)),
                        "n_queries": len(names), "ok": int(m.group(3)),
                        "bad": int(m.group(4)),
                        "verdict": "OK" if int(m.group(4)) == 0
                                   and int(m.group(3)) == len(names) else "FAIL",
                        "tool": "tools/oracle_check.py", "raw": line})
        continue
    errors.append(line)

if errors:
    sys.stderr.write("UNRECOGNIZED LINES (refusing to drop silently):\n"
                     + "\n".join(errors) + "\n")
    sys.exit(1)

# all_ok covers VERDICT-BEARING checks only; measurement-only entries
# (censuses, spill-wall re-runs) carry no pass/fail by design — they are
# inputs to a SURVEY adjudication, and their count is surfaced so the
# top-level flag cannot read as "everything was adjudicated and passed".
verdicted = [e for e in entries if "verdict" in e]
ok = all(e["verdict"] in ("OK", "IDENTICAL", "within_budget")
         for e in verdicted)
json.dump({"round": round_n, "n_checks": len(entries),
           "n_verdicted": len(verdicted),
           "n_measurement_only": len(entries) - len(verdicted),
           "all_ok": ok, "checks": entries}, sys.stdout, indent=1)
sys.stdout.write("\n")
