#!/usr/bin/env python3
"""Standing bench-isolation methodology (verdict r15 item 5): every round,
any query whose IN-SUITE ratio vs the comparator exceeds a threshold
(default 1.5x) gets an automatic BenchOne isolation — rounds 14 and 15
both burned an analysis cycle proving that 1.8-1.9x in-suite readings
were suite-context/VM-steal noise (isolated: 0.93-1.19x), so the
isolation is now emitted mechanically instead of argued reactively.

Usage:
  python3 tools/isolate_outliers.py <evidence.json> [comparator.json] [threshold]

Prints the outlier table and the exact BenchOne command to run (it does
NOT run it itself: isolations must run on an otherwise-idle machine, and
the caller decides when that is). Paste BenchOne's per-rep output into
the SCALING.md round addendum next to the in-suite numbers.
"""
import json
import sys

ev_path = sys.argv[1]
cmp_path = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_sf01_comparator.json"
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

ev = json.load(open(ev_path))["queries"]
cmp_q = json.load(open(cmp_path))["queries"]

rows = []
for name, secs in sorted(ev.items()):
    if name in cmp_q and cmp_q[name] > 0:
        r = secs / cmp_q[name]
        if r > threshold:
            rows.append((r, name, secs, cmp_q[name]))

overlap = [n for n in ev if n in cmp_q]
agg = sum(ev[n] for n in overlap) / sum(cmp_q[n] for n in overlap)
print(f"# {len(overlap)} overlapping queries, aggregate ratio {agg:.3f}x")
if not rows:
    print(f"# no query over {threshold}x — nothing to isolate")
    sys.exit(0)

print(f"# {len(rows)} in-suite outliers over {threshold}x:")
for r, name, secs, base in sorted(rows, reverse=True):
    print(f"#   {name:<28} {secs:7.3f}s vs {base:7.3f}s = {r:.2f}x")
names = ",".join(name for _, name, _, _ in sorted(rows, reverse=True))
print("# isolate with (idle machine, read reps 2+):")
print(f'SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchOne {names} /root/testdata/sf0.1"')
