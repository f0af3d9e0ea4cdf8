#!/usr/bin/env bash
# Round-14 campaign (VERDICT r13 demands, in dependency order):
#   1. CC 400M-edge probe (carried since r11 — VERDICT r13 #1). Runs
#      first: it frees the rebuildable decade replica for headroom on
#      this thin-provisioned, volatile-avail backing store.
#   2. Docs decade probe (same carry; rebuilds + stamps the replica,
#      96g heap after the first attempt died ENOSPC spilling at 64g).
#   3. Direct solo probes of the six storm-tail sf100 queries the r13 gate
#      recorded at 2.3-25.8x r11b without direct attribution (VERDICT #2):
#      d5, d9, d4, d6, a7 — fresh prewarmed+cachewarmed JVM each, all four
#      sentinels + the new per-query timeline/mini-probe.
#   4. g1_pagerank solo probe with GC logging + an io-pressure/steal
#      sampler to localize the 144 s whole-JVM stalls (VERDICT #6).
#   5. Clean sf0.1 bench attempt under a weather gate (VERDICT #4).
# Strictly serialized; every leg sweeps orphans and samples the weather
# first (median-of-3 — the regime flickers at seconds granularity).
set -uo pipefail
cd "$(dirname "$0")/.."

GEN=$(cat /root/testdata/sf0.1/*.parquet | md5sum | cut -d' ' -f1)
for rep in sf1 sf100; do
  have=$(cat "scale/$rep/GENERATION" 2>/dev/null || echo "unstamped")
  [ "$have" = "$GEN" ] || { echo "[r14] ERROR scale/$rep gen mismatch" >&2; exit 1; }
done

sweep() {
  pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe|ScaleUp)" >/dev/null && return 0
  rm -rf /tmp/blockmgr-* 2>/dev/null || true
  find /tmp -maxdepth 1 -name 'spark-*' ! -name spark-events \
    -exec rm -rf {} + 2>/dev/null || true
}

scratch_mbps() {
  local f=/tmp/.r14_scratch_probe.$$ out
  out=$(LC_ALL=C dd if=/dev/zero of="$f" bs=4M count=16 conv=fsync 2>&1 | tail -1)
  rm -f "$f"
  case "$out" in
    *MB/s*) echo "$out" | sed 's/.*, *//; s/ MB\/s.*//' ;;
    *GB/s*) echo "$out" | sed 's/.*, *//; s/ GB\/s.*//' | awk '{printf "%.1f", $1 * 1000}' ;;
    *) echo "" ;;
  esac
}
wait_for_weather() { # floor retries
  local floor="$1" tries="$2" i m1 m2 m3 med
  for i in $(seq 1 "$tries"); do
    m1=$(scratch_mbps); m2=$(scratch_mbps); m3=$(scratch_mbps)
    [ -n "$m1" ] && [ -n "$m2" ] && [ -n "$m3" ] || return 0
    med=$(printf '%s\n%s\n%s\n' "$m1" "$m2" "$m3" | sort -g | sed -n 2p)
    if awk -v m="$med" -v f="$floor" 'BEGIN{exit !(m >= f)}'; then
      echo "[r14] weather ok: median ${med} MB/s of [$m1 $m2 $m3]" >&2; return 0
    fi
    echo "[r14] weather degraded: median ${med} of [$m1 $m2 $m3] < ${floor}; wait $i/$tries" >&2
    sleep 120
  done
  echo "[r14] WARNING proceeding under degraded weather (median ${med})" >&2
}

# --- 1. CC 400M probe --------------------------------------------------------
# ~32 GB peak scratch at the claimed bounded-by-one-round behavior; the
# backing store is thin-provisioned and volatile, so free the decade
# replica (rebuildable) first and refuse below 34 GB.
if [ ! -s bench/cc_probe_400m_r14.json ]; then
  rm -rf scale/docs_decade scale/sf10   # rebuildable replicas; CC needs the headroom
  FREE_GB=$(df -BG --output=avail /tmp | tail -1 | tr -dc '0-9')
  if [ -z "$FREE_GB" ] || [ "$FREE_GB" -lt 34 ]; then
    echo "[r14] ERROR: ${FREE_GB:-?} GB free < 34 GB needed for CC 400M" >&2; exit 1
  fi
  sweep; wait_for_weather "${SCRATCH_FLOOR_MBPS:-25}" 3
  echo "[r14] $(date +%H:%M:%S) CC 400M probe" >&2
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    sbt -batch "runMain graft.CcProbe 4000000 100 star diskbound" \
    > /tmp/r14_cc400m.log 2>&1
  grep '"metric":"cc_probe"' /tmp/r14_cc400m.log > bench/cc_probe_400m_r14.json \
    || { echo "[r14] ERROR CC probe no metric (see /tmp/r14_cc400m.log)" >&2; exit 1; }
  cat bench/cc_probe_400m_r14.json >&2
fi

# --- 2. docs decade probe ----------------------------------------------------
# Runs AFTER the CC leg (both need most of the volatile thin-provisioned
# store; CC deletes the replica, this leg rebuilds it). First r14 attempt
# died ENOSPC 58 min in with ~29 GB free: the 10x d2's checkpointed
# signature blocks spill past that. Mitigations: 96g driver heap so
# MEMORY_AND_DISK_SER blocks mostly stay resident, and a fresh preflight.
run_decade() {
  sweep
  SPARK_DRIVER_MEM=96g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    sbt -batch "runMain graft.DocsDecadeProbe $PWD/scale/sf100 $PWD/scale/docs_decade 10" \
    > /tmp/r14_docs_decade.log 2>&1
  grep '"metric":"docs_decade_probe"' /tmp/r14_docs_decade.log \
    > bench/docs_decade_d2_r14.json
}
if [ ! -s bench/docs_decade_d2_r14.json ]; then
  wait_for_weather "${SCRATCH_FLOOR_MBPS:-25}" 3
  echo "[r14] $(date +%H:%M:%S) docs decade probe" >&2
  have=$(cat scale/docs_decade/GENERATION 2>/dev/null || echo "unstamped")
  if [ "$have" != "$GEN" ] && [ "$have" != "unstamped" ]; then
    echo "[r14] docs_decade stamped $have != $GEN — rebuilding" >&2
    rm -rf scale/docs_decade
  fi
  if ! run_decade; then
    if grep -q "WRONG RESULT" /tmp/r14_docs_decade.log; then
      echo "[r14] decade invariant failed — stale replica; rebuilding once" >&2
      rm -rf scale/docs_decade
      run_decade || { echo "[r14] ERROR decade probe failed after rebuild" >&2; exit 1; }
    else
      echo "[r14] ERROR decade probe failed (see /tmp/r14_docs_decade.log)" >&2; exit 1
    fi
  fi
  [ -s bench/docs_decade_d2_r14.json ] \
    || { echo "[r14] ERROR decade probe wrote no metric" >&2; exit 1; }
  echo "$GEN" > scale/docs_decade/GENERATION
  cat bench/docs_decade_d2_r14.json >&2
fi

# --- 3. solo attribution probes for the storm-tail five ----------------------
for q in d5_ngram_jaccard d9_span_dupes d4_simhash_pairs d6_embed_neardup \
         a7_dedup_first_wins; do
  out="bench/sf100_solo_${q%%_*}_r14.json"
  [ -s "$out" ] && continue
  sweep; wait_for_weather "${SCRATCH_FLOOR_MBPS:-25}" 3
  echo "[r14] $(date +%H:%M:%S) solo probe $q" >&2
  SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" SPARK_GRAFT_BENCH_OUT="$PWD/$out" \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
  SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
  SPARK_GRAFT_BENCH_MINIPROBE=1 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    sbt -batch "runMain graft.Bench --exact $q" > "/tmp/r14_solo_${q%%_*}.log" 2>&1
  [ -s "$out" ] || { echo "[r14] ERROR solo $q wrote no sidecar" >&2; exit 1; }
  cat "$out" >&2
done

# --- 4. g1 solo probe with GC log + io-pressure/steal sampler ----------------
if [ ! -s bench/sf100_solo_g1_r14.json ]; then
  sweep; wait_for_weather "${SCRATCH_FLOOR_MBPS:-25}" 3
  echo "[r14] $(date +%H:%M:%S) g1 probe (GC log + pressure sampler)" >&2
  : > bench/g1_pressure_r14.log
  (
    while :; do
      echo "t=$(date +%s) steal=$(awk '/^cpu /{print $9}' /proc/stat) $(grep -h . /proc/pressure/io | tr '\n' ' ')"
      sleep 5
    done >> bench/g1_pressure_r14.log
  ) &
  SAMPLER=$!
  SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" \
  SPARK_GRAFT_BENCH_OUT="$PWD/bench/sf100_solo_g1_r14.json" \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
  SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
  SPARK_GRAFT_BENCH_MINIPROBE=1 \
  SPARK_GRAFT_JAVA_OPTS="-Xlog:gc*:file=$PWD/bench/g1_gc_r14.log:time,uptime:filecount=1,filesize=50m" \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    sbt -batch "runMain graft.Bench --exact g1_pagerank" > /tmp/r14_solo_g1.log 2>&1
  kill "$SAMPLER" 2>/dev/null || true
  [ -s bench/sf100_solo_g1_r14.json ] \
    || { echo "[r14] ERROR g1 probe wrote no sidecar" >&2; exit 1; }
  cat bench/sf100_solo_g1_r14.json >&2
fi

# --- 5. clean sf0.1 bench attempt (driver protocol, weather-gated) -----------
if [ ! -s bench/bench_sf0.1_r14_preview.json ]; then
  sweep; wait_for_weather "${SCRATCH_FLOOR_MBPS_CLEAN:-50}" 5
  echo "[r14] $(date +%H:%M:%S) clean sf0.1 bench attempt" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT="$PWD/bench/bench_sf0.1_r14_preview.json" \
    sbt -batch "runMain graft.Bench" > /tmp/r14_bench_sf01.log 2>&1
  [ -s bench/bench_sf0.1_r14_preview.json ] \
    || { echo "[r14] ERROR sf0.1 bench wrote no sidecar" >&2; exit 1; }
  head -c 400 bench/bench_sf0.1_r14_preview.json >&2; echo >&2
fi

echo "[r14] done $(date +%H:%M:%S)" >&2
