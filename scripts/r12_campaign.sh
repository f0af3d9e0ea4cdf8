#!/usr/bin/env bash
# Round-12 measurement campaign, part 2 (after the solo-probe forensics):
#   1. Full sf100 gate + sf1 oracle replay — prior artifact selection now
#      round-tag-ranked (r11b), g1 RUN_LAST, per-cohort prewarm +
#      DECLARED cache warm (see scale_gate.sh comments).
#   2. 400M-edge CC probe with diskBound round barriers (VERDICT r11 #3).
#   3. Shingle-family decade probe: d2 at 10x sf100 docs (VERDICT r11 #7).
# Strictly serialized — each job wants all 32 cores and the page cache.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p bench

run() { echo "[r12] $(date +%H:%M:%S) $*" >&2; "$@"; }

run env SKIP_BUILD=1 bash scripts/scale_gate.sh r12 > /tmp/r12_gate.log 2>&1 \
  || { echo "[r12] ERROR: gate failed, see /tmp/r12_gate.log" >&2; exit 1; }

run env SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.CcProbe 4000000 100 star diskbound" \
  > /tmp/r12_cc400m.log 2>&1
grep '"metric":"cc_probe"' /tmp/r12_cc400m.log > bench/cc_probe_400m_r12.json \
  || { echo "[r12] ERROR: CC probe wrote no metric line" >&2; exit 1; }

run env SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.DocsDecadeProbe $PWD/scale/sf100 $PWD/scale/docs_decade 10" \
  > /tmp/r12_docs_decade.log 2>&1
grep '"metric":"docs_decade_probe"' /tmp/r12_docs_decade.log \
  > bench/docs_decade_d2_r12.json \
  || { echo "[r12] ERROR: decade probe wrote no metric line" >&2; exit 1; }

echo "[r12] campaign complete $(date +%H:%M:%S)" >&2
