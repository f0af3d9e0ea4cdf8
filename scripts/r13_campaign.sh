#!/usr/bin/env bash
# Round-13 campaign (VERDICT r12 demands, in dependency order):
#   1. Solo attribution probes for the r12 gate's unattributed 7-29x
#      regressions (d1/p8/bpe1): fresh prewarmed+cachewarmed JVM each,
#      now with all FOUR sentinels (noop / O_DIRECT disk / cachewarm /
#      the new scratch-IO probe). Decides weather-vs-regression.
#   2. Full sf100 gate + sf1 oracle replay via scale_gate.sh r13 —
#      the COMPLETE 100-query artifact r12 never produced.
#   3. CC 400M-edge probe (carried from r11 #3).
#   4. Docs decade probe (carried from r11 #7).
# Strictly serialized; each leg sweeps orphans first. Every leg checks
# the replica generation stamp BEFORE running (ADVICE r12: r12_finish
# stamped a merge without checking).
set -uo pipefail
cd "$(dirname "$0")/.."

GEN=$(cat /root/testdata/sf0.1/*.parquet | md5sum | cut -d' ' -f1)
for rep in sf1 sf100; do
  have=$(cat "scale/$rep/GENERATION" 2>/dev/null || echo "unstamped")
  if [ "$have" != "$GEN" ]; then
    echo "[r13] ERROR: scale/$rep generation '$have' != base '$GEN'" >&2
    exit 1
  fi
done

sweep() {
  pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe|ScaleUp)" >/dev/null && return 0
  rm -rf /tmp/blockmgr-* 2>/dev/null || true
  find /tmp -maxdepth 1 -name 'spark-*' ! -name spark-events \
    -exec rm -rf {} + 2>/dev/null || true
}

# --- 1. solo attribution probes --------------------------------------------
for q in d1_exact_dedup dsl_p8_type_groups bpe1_merge_table; do
  sweep
  out="bench/sf100_solo_${q%%_*}_r13.json"
  rm -f "$out"
  echo "[r13] $(date +%H:%M:%S) solo probe $q" >&2
  SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" SPARK_GRAFT_BENCH_OUT="$PWD/$out" \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
  SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    sbt -batch "runMain graft.Bench --exact $q" > "/tmp/r13_solo_${q%%_*}.log" 2>&1
  [ -f "$out" ] || { echo "[r13] ERROR solo $q wrote no sidecar" >&2; exit 1; }
  cat "$out" >&2
done

# --- 2. full sf100 gate + sf1 oracle replay --------------------------------
echo "[r13] $(date +%H:%M:%S) full scale gate" >&2
bash scripts/scale_gate.sh r13 || { echo "[r13] ERROR gate failed" >&2; exit 1; }

# --- 3. CC 400M probe -------------------------------------------------------
sweep
echo "[r13] $(date +%H:%M:%S) CC 400M probe" >&2
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.CcProbe 4000000 100 star diskbound" \
  > /tmp/r13_cc400m.log 2>&1
grep '"metric":"cc_probe"' /tmp/r13_cc400m.log > bench/cc_probe_400m_r13.json \
  || { echo "[r13] ERROR CC probe no metric" >&2; exit 1; }

# --- 4. docs decade probe ---------------------------------------------------
sweep
echo "[r13] $(date +%H:%M:%S) docs decade probe" >&2
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.DocsDecadeProbe $PWD/scale/sf100 $PWD/scale/docs_decade 10" \
  > /tmp/r13_docs_decade.log 2>&1
grep '"metric":"docs_decade_probe"' /tmp/r13_docs_decade.log \
  > bench/docs_decade_d2_r13.json \
  || { echo "[r13] ERROR decade probe no metric" >&2; exit 1; }

echo "[r13] done $(date +%H:%M:%S)" >&2
