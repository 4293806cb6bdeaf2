#!/usr/bin/env python3
"""Merge a sectioned IndexBench run into an existing per-SF evidence JSON.

IndexBench can re-record a subset of sections (e.g. `mh,cluster` at sf10)
so a single-layout change doesn't pay a full big-SF re-run. This merges
the new run's rows over the old file's, records WHICH rows came from the
newer recording under `rerecorded`, and leaves everything else untouched.

Usage: merge_bench_sections.py <old.json> <new.json> <tag> [out.json]
"""
import json
import sys

old_p, new_p, tag = sys.argv[1], sys.argv[2], sys.argv[3]
out_p = sys.argv[4] if len(sys.argv) > 4 else old_p

old = json.load(open(old_p))
new = json.load(open(new_p))

# provenance covers every merged section (ADVICE r13: keys that only
# appeared in the byte/cpu sections were never recorded, and a repeated
# tag overwrote the prior list instead of unioning)
merged_keys = []
for sect in ("builds", "probes", "probe_file_bytes", "probe_input_bytes",
             "probe_cpu_sec", "probe_shuffle_bytes"):
    if sect not in new:
        continue
    old.setdefault(sect, {})
    for k, v in new[sect].items():
        old[sect][k] = v
        merged_keys.append(k)

rer = old.setdefault("rerecorded", {})
rer[tag] = sorted(set(rer.get(tag, [])) | set(merged_keys))

with open(out_p, "w") as f:
    json.dump(old, f, separators=(",", ":"))
    f.write("\n")
print(f"merged {len(set(merged_keys))} rows from {new_p} into {out_p} as '{tag}'")
