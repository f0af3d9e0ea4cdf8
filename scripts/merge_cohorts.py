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
prewarmed = True
for f in sorted(sys.argv[4:]):
    d = json.load(open(f))
    qs = d["queries"]
    dup = set(qs) & set(merged)
    assert not dup, f"queries measured in two cohorts: {sorted(dup)}"
    merged.update(qs)
    failed += d.get("failed", [])
    cohorts[f] = sorted(qs)
    # Bench writes prewarm_sec to its sidecar only when it actually ran
    # the SPARK_GRAFT_BENCH_PREWARM pass — derive the prewarm claim from
    # that, never hardcode it (ADVICE r11: a gate run without the env var
    # must not advertise trustworthy cohort-first readings)
    prewarmed = prewarmed and ("prewarm_sec" in d)

# Each cohort JVM should be PREWARMED before its first query (footer
# reads + one codegen-heavy noop — Bench's SPARK_GRAFT_BENCH_PREWARM),
# making alphabetically-first readings measurements, not cold-start
# upper bounds (r10's unwarmed gate had a2 read 83.9s as a first vs
# 30.1s mid-suite). Firsts are still named for audit: cohorts.py trusts
# prior readings only when the "prewarmed" field below — derived from
# every sidecar carrying prewarm_sec, not asserted — is true.
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
    "prewarmed": prewarmed,
    "cohort_note": ("fresh JVM per cohort, single-pass cold; prewarmed=" +
                    str(prewarmed).lower() + " (derived from prewarm_sec "
                    "in every cohort sidecar, not asserted); fast cohort "
                    "(prior <5s) first so sub-second queries time against "
                    "an unpolluted block manager; cohort_firsts listed for "
                    "audit — with the prewarm they are measurements, not "
                    "cold-start upper bounds"),
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
