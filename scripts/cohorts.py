#!/usr/bin/env python3
"""Split the registry into fresh-JVM bench cohorts for the sf100 gate.

Why: in the one-JVM 100-query sweep, sub-second queries read 1.5-3x above
their warm floor because they time against a block-manager/page-cache
polluted by the multi-minute queries that ran before them (VERDICT r9,
"what's wrong" #4). Splitting the gate puts the fast half in its own clean
JVM and spreads the heavy half across balanced cohorts, so per-query sf100
numbers become measurements instead of upper bounds.

Usage: cohorts.py <registry-names-file> [<prior-gate-artifact.json>]
Prints one cohort per line (space-separated query names):
  line 1          = fast cohort (prior sf100 time < FAST_CUTOFF)
  lines 2..N_HEAVY+1 = heavy cohorts, greedy-packed by prior time (desc)
Queries with no prior reading (new this round) are assumed heavy until
measured. The caller verifies the printed cohorts against the registry
list; this script also asserts the split is a disjoint cover.
"""
import json
import sys

FAST_CUTOFF = 5.0   # seconds at sf100
N_HEAVY = 3

names = [l.strip() for l in open(sys.argv[1]) if l.strip()]
prev = {}
firsts = set()
if len(sys.argv) > 2 and sys.argv[2]:
    try:
        doc = json.load(open(sys.argv[2]))
        prev = doc.get("queries", {})
        # A cohort-first reading from an UNWARMED prior gate absorbed that
        # JVM's cold start (r10: 83.9s vs 30.1s warm) — classifying on it
        # makes a genuinely fast query bounce to a heavy cohort and the
        # composition oscillate round over round (ADVICE r10). Drop those
        # readings (treat the query as unmeasured) unless the prior gate
        # ran with the per-cohort prewarm, whose firsts are trustworthy.
        # Trust the derived boolean (merge_cohorts.py r12: present only
        # when every cohort sidecar carried prewarm_sec); fall back to the
        # r11 note-string for artifacts that predate the field.
        if not doc.get("prewarmed", "prewarm" in doc.get("cohort_note", "")):
            firsts = set(doc.get("cohort_firsts", {}).values())
            if not firsts:  # pre-r11 artifacts: derive from the cohort lists
                firsts = {sorted(qs)[0] for qs in doc.get("cohorts", {}).values() if qs}
            for n in firsts:
                prev.pop(n, None)
    except Exception as e:
        print(f"[cohorts] prior artifact unreadable ({e}); all queries heavy",
              file=sys.stderr)

# Frame-family AFFINITY (r11): queries sharing a cached signature frame
# (DedupOps.materialized kinds — shingles3/shgroups, simhash60/simgroups,
# embedgroups/embedfpbands) must land in the SAME cohort, else the
# multi-minute frame build lands on whichever member runs first in each
# JVM and per-query attribution churns round over round (r11 vs r10:
# d2 +78s / ds3 -18s from exactly this migration). sim1-sim7 join the
# embed family for the embeddings.parquet page-cache affinity even
# though only sim6 shares the JVM frames.
# every prefix is underscore-delimited (ADVICE r11: a bare "sim" would
# silently capture any future query whose name merely starts with sim,
# e.g. a simhash-named probe)
FAMILIES = {
    "sh":   ("d2_", "d5_", "d10_", "d13_", "ds3_"),
    "simh": ("d3_", "d4_", "d7_", "d8_"),
    "emb":  ("d6_", "d12_", "sim1_", "sim2_", "sim3_", "sim4_", "sim5_",
             "sim6_", "sim7_"),
}


def family(n):
    for f, prefixes in FAMILIES.items():
        if any(n.startswith(p) for p in prefixes):
            return f
    return None


# fast cohort: under-cutoff queries with NO family (a family member in the
# fast JVM would pay the whole frame build there — the r10 c1 ds3 reading)
fast = [n for n in names
        if family(n) is None and 0 <= prev.get(n, -1.0) < FAST_CUTOFF]
heavy = [n for n in names if n not in set(fast)]


def weight(n):
    return prev[n] if prev.get(n, -1.0) >= 0 else 600.0


# pack UNITS (whole families, then heavy singletons) by weight descending
units = {}
for n in heavy:
    units.setdefault(family(n) or n, []).append(n)
bins = [[] for _ in range(N_HEAVY)]
loads = [0.0] * N_HEAVY
for key, members in sorted(
        units.items(), key=lambda kv: -sum(weight(n) for n in kv[1])):
    i = loads.index(min(loads))
    bins[i].extend(members)
    loads[i] += sum(weight(n) for n in members)

cohorts = [c for c in [fast] + bins if c]
covered = set()
for c in cohorts:
    assert not (set(c) & covered), "query assigned to two cohorts"
    covered |= set(c)
assert covered == set(names), (
    f"split is not a cover: missing {sorted(set(names) - covered)}")
for c in cohorts:
    print(" ".join(sorted(c)))
print(f"[cohorts] {len(cohorts)} cohorts: fast={len(fast)} "
      f"heavy_loads={[round(x) for x in loads]}", file=sys.stderr)
