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
        if "prewarm" not in doc.get("cohort_note", ""):
            firsts = set(doc.get("cohort_firsts", {}).values())
            if not firsts:  # pre-r11 artifacts: derive from the cohort lists
                firsts = {sorted(qs)[0] for qs in doc.get("cohorts", {}).values() if qs}
            for n in firsts:
                prev.pop(n, None)
    except Exception as e:
        print(f"[cohorts] prior artifact unreadable ({e}); all queries heavy",
              file=sys.stderr)

fast = [n for n in names if 0 <= prev.get(n, -1.0) < FAST_CUTOFF]
heavy = [n for n in names if n not in set(fast)]

# greedy bin-pack heavy queries by prior time (descending; unknown -> first,
# weighted as 600s so one bin doesn't accumulate all the unknowns)
bins = [[] for _ in range(N_HEAVY)]
loads = [0.0] * N_HEAVY
for n in sorted(heavy, key=lambda n: -prev.get(n, 1e9)):
    i = loads.index(min(loads))
    bins[i].append(n)
    loads[i] += prev[n] if prev.get(n, -1.0) >= 0 else 600.0

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
