#!/usr/bin/env python3
"""Merge per-cohort Bench sidecars into the single sf100 gate artifact.

Fails loudly if the cohorts are not a disjoint cover of the full registry
(a query measured twice, missing, or unknown) or if any query failed —
a gate artifact must be impossible to read as "covered everything" when
it didn't.

Usage: merge_cohorts.py <out.json> <generation> <registry-names-file> <cohort1.json> ...
"""
import json
import sys

out, gen, namesf = sys.argv[1], sys.argv[2], sys.argv[3]
names = set(l.strip() for l in open(namesf) if l.strip())
merged, failed, cohorts = {}, [], {}
for f in sorted(sys.argv[4:]):
    d = json.load(open(f))
    qs = d["queries"]
    dup = set(qs) & set(merged)
    assert not dup, f"queries measured in two cohorts: {sorted(dup)}"
    merged.update(qs)
    failed += d.get("failed", [])
    cohorts[f] = sorted(qs)

# Bench runs each cohort's queries in sorted order with WARMUP=0, so the
# alphabetically-first query of every cohort absorbs that JVM's cold start
# (session spin-up, codegen, sf-dir parquet footers, shared signature
# frames) — its reading is an upper bound. Name them so a reader never
# mistakes the absorption for a regression (r10: a2_duplicate_ids read
# 83.9s as c3's first query vs 30.1s mid-suite in r9).
firsts = {f: qs[0] for f, qs in cohorts.items() if qs}

missing = names - set(merged)
extra = set(merged) - names
assert not missing, f"cohorts do not cover registry: missing {sorted(missing)}"
assert not extra, f"unknown queries in cohorts: {sorted(extra)}"

total = sum(v for v in merged.values() if v >= 0)
doc = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": merged, "sf": "scale/sf100", "generation": gen,
    "cohorts": cohorts,
    "cohort_firsts": firsts,
    "cohort_note": ("fresh JVM per cohort, single-pass cold; fast cohort "
                    "(prior <5s) first so sub-second queries time against "
                    "an unpolluted block manager; each cohort's "
                    "alphabetically-first query (cohort_firsts) absorbs "
                    "that JVM's cold start — treat it as an upper bound"),
}
bad = sorted(set(failed) | {k for k, v in merged.items() if v < 0})
if bad:
    doc["n_failed"] = len(bad)
    doc["failed"] = bad
json.dump(doc, open(out, "w"))
print(f"[scale_gate] sf100 suite {total:.0f}s over {len(merged)} queries "
      f"in {len(cohorts)} cohorts ({len(bad)} failed)")
if bad:
    print(f"[scale_gate] ERROR: failed at sf100: {bad}")
    sys.exit(1)
