#!/usr/bin/env bash
# Round-15 campaign (VERDICT r14 "Next round" #1-#6), strictly serial:
#   0. sf0.1 preview bench in the FIRST green window (70 s — cheap to
#      front-run; 5th attempt at a clean BENCH row)
#   1. full sf100 gate behind wait_for_weather (the single
#      highest-leverage act: clears or confirms a7/d4/d9/d6 inside their
#      family bins and refreshes the standing baseline)
#   2. g1 solo probe with GC log + io-pressure/steal sampler (r14 queued
#      it last and the round ended mid-run)
#   3. a7 green-weather solo retry (no shared frames — solo IS
#      comparable for a7)
#   4. embed mini family bin: d12_semantic_keep_one builds the
#      embedgroups/embedfpbands frames, d6_embed_neardup consumes them —
#      gate order (Bench sorts), per-query timeline gives d6's
#      incremental reading vs its 24.9 s r11b in-gate standing
#   5. docs-decade probe, 5th attempt, with the scratch math done FIRST:
#      by now every sf100-reading leg is done, so the non-document sf100
#      tables (~14.4 GB of lineitem/orders/events/part/customer/supplier)
#      are rebuildable dead weight — delete them, verify >=40 GB free,
#      run with 96g heap so MEMORY_AND_DISK_SER blocks stay resident
#      (r14 launched at 29 GB and died ENOSPC at 58 min)
#   6. second sf0.1 preview attempt (weather may be greener by now; keep
#      both artifacts — the round's BENCH row wants a green-sentinel
#      reading from ANY window)
#
# Every leg waits for green scratch weather first (median-of-3, the r14
# protocol): the a7 r14 solo was unusable precisely because the probe
# launched into a storm. All launches via the harness's background Bash
# (never nohup — detached groups get reaped).
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p bench

sweep() {
  pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe|ScaleUp)" >/dev/null && return 0
  rm -rf /tmp/blockmgr-* 2>/dev/null || true
  find /tmp -maxdepth 1 -name 'spark-*' ! -name spark-events -exec rm -rf {} + 2>/dev/null || true
}

# same probe scale_gate.sh uses (bytes/elapsed, not unit parsing — the
# kB/s regimes are exactly the ones that must NOT read as "unavailable")
scratch_mbps() {
  local f=/tmp/.r15_scratch_probe.$$ out
  out=$(LC_ALL=C dd if=/dev/zero of="$f" bs=4M count=16 conv=fsync 2>&1 | tail -1)
  rm -f "$f"
  echo "$out" | LC_ALL=C awk -F', ' '/bytes/ && / copied/ {
    b = $1 + 0; t = $(NF-1) + 0
    if (t > 0) printf "%.1f", b / t / 1000000 }'
}
wait_for_weather() {
  local floor="${SCRATCH_FLOOR_MBPS:-50}" tries="${WEATHER_RETRIES:-10}" i m1 m2 m3 med
  for i in $(seq 1 "$tries"); do
    m1=$(scratch_mbps); m2=$(scratch_mbps); m3=$(scratch_mbps)
    if [ -z "$m1" ] || [ -z "$m2" ] || [ -z "$m3" ]; then
      echo "[r15] weather probe unavailable; proceeding" >&2; return 0
    fi
    med=$(printf '%s\n%s\n%s\n' "$m1" "$m2" "$m3" | sort -g | sed -n 2p)
    if awk -v m="$med" -v f="$floor" 'BEGIN{exit !(m >= f)}'; then
      echo "[r15] $(date +%H:%M:%S) weather ok: median ${med} MB/s of [$m1 $m2 $m3]"
      return 0
    fi
    echo "[r15] $(date +%H:%M:%S) weather degraded: median ${med} of [$m1 $m2 $m3] < ${floor}; wait $i/$tries (120 s)" >&2
    sleep 120
  done
  echo "[r15] WARNING: still degraded after $tries waits — proceeding, timeline will bracket" >&2
}

run_bench() { # out log extra-env... -- names...
  local out="$1" log="$2"; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  sweep
  wait_for_weather
  echo "[r15] $(date +%H:%M:%S) bench --exact $* -> $out" >&2
  env SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" SPARK_GRAFT_BENCH_OUT="$PWD/$out" \
    SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
    SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
    SPARK_GRAFT_BENCH_MINIPROBE=1 \
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    "${envs[@]}" \
    sbt -batch "runMain graft.Bench --exact $*" > "$log" 2>&1
  [ -s "$out" ] || { echo "[r15] ERROR $out not written (see $log)" >&2; exit 1; }
  cat "$out" >&2
}

sf01_preview() { # suffix
  local out="bench/bench_sf0.1_r15_preview$1.json"
  [ -s "$out" ] && return 0
  sweep
  wait_for_weather
  echo "[r15] $(date +%H:%M:%S) sf0.1 preview bench -> $out" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT="$PWD/$out" SPARK_GRAFT_BENCH_MINIPROBE=1 \
    sbt -batch "runMain graft.Bench" > "/tmp/r15_bench_sf01$1.log" 2>&1
  [ -s "$out" ] || { echo "[r15] ERROR sf0.1 preview no sidecar" >&2; exit 1; }
  head -c 400 "$out" >&2; echo >&2
}

# --- 0. first-green-window sf0.1 preview -----------------------------------
sf01_preview ""

# --- 1. full sf100 gate ----------------------------------------------------
# MIN_FREE_GB=33: the stale (unstamped) docs_decade replica was deleted
# before this campaign, leaving ~37 GB on the thin-provisioned store —
# below the 45 GB default but above g1's ~20 GB diskBound churn plus
# cohort shuffle residue; cohorts sweep orphans between JVMs.
if [ ! -s bench/sf100_cold_r15.json ]; then
  MIN_FREE_GB=33 scripts/scale_gate.sh r15 > /tmp/r15_gate.log 2>&1
  gate_rc=$?
  tail -5 /tmp/r15_gate.log >&2
  [ -s bench/sf100_cold_r15.json ] || { echo "[r15] ERROR gate produced no merged artifact (rc=$gate_rc, see /tmp/r15_gate.log)" >&2; exit 1; }
fi

# --- 2. g1 solo probe (GC + pressure capture, VERDICT r14 #2) --------------
if [ ! -s bench/sf100_solo_g1_r15.json ]; then
  : > bench/g1_pressure_r15.log
  ( while :; do
      echo "t=$(date +%s) steal=$(awk '/^cpu /{print $9}' /proc/stat) $(grep -h . /proc/pressure/io | tr '\n' ' ')"
      sleep 5
    done >> bench/g1_pressure_r15.log ) &
  SAMPLER=$!
  run_bench bench/sf100_solo_g1_r15.json /tmp/r15_solo_g1.log \
    SPARK_GRAFT_JAVA_OPTS="-Xlog:gc*:file=$PWD/bench/g1_gc_r15.log:time,uptime:filecount=1,filesize=50m" \
    -- g1_pagerank
  kill "$SAMPLER" 2>/dev/null || true
fi

# --- 3. a7 green-weather solo retry (VERDICT r14 #6) -----------------------
[ -s bench/sf100_solo_a7_r15.json ] || run_bench \
  bench/sf100_solo_a7_r15.json /tmp/r15_solo_a7.log -- a7_dedup_first_wins

# --- 4. embed mini family bin (VERDICT r14 #5) -----------------------------
[ -s bench/sf100_family_embed_r15.json ] || run_bench \
  bench/sf100_family_embed_r15.json /tmp/r15_family_embed.log \
  -- d12_semantic_keep_one d6_embed_neardup

# --- 5. docs-decade probe, 5th attempt (VERDICT r14 #3) --------------------
if [ ! -s bench/docs_decade_d2_r15.json ]; then
  # every sf100-reading leg above is done: the non-document sf100 tables
  # are now rebuildable dead weight on a thin-provisioned store (next
  # round's gate rebuilds them in ~20 min); documents.parquet stays (the
  # probe's input and its sf100 invariant leg)
  for tbl in lineitem orders events part customer supplier partsupp region nation; do
    rm -rf "scale/sf100/$tbl.parquet" 2>/dev/null || true
  done
  sweep
  FREE_GB=$(df -BG --output=avail /tmp | tail -1 | tr -dc '0-9')
  echo "[r15] docs-decade preflight: ${FREE_GB} GB free" >&2
  if [ "${FREE_GB:-0}" -lt 40 ]; then
    echo "[r15] ERROR: docs-decade needs >=40 GB at launch (r14 died ENOSPC from 29)" >&2
    printf '{"failed":"preflight","free_gb":%s,"note":"r15 docs-decade skipped: <40 GB free at launch"}\n' "${FREE_GB:-0}" > bench/docs_decade_d2_r15.json
  else
    wait_for_weather
    echo "[r15] $(date +%H:%M:%S) docs-decade probe (96g heap)" >&2
    SPARK_DRIVER_MEM=96g \
      sbt -batch "runMain graft.DocsDecadeProbe $PWD/scale/sf100 $PWD/scale/docs_decade 10" \
      > /tmp/r15_docs_decade.log 2>&1
    grep '"metric"' /tmp/r15_docs_decade.log | tail -1 > bench/docs_decade_d2_r15.json
    if [ ! -s bench/docs_decade_d2_r15.json ]; then
      echo "[r15] ERROR docs-decade wrote no JSON (see /tmp/r15_docs_decade.log)" >&2
      printf '{"failed":"no_output","note":"r15 docs-decade probe died; see SCALE.md r15"}\n' > bench/docs_decade_d2_r15.json
    else
      cat bench/docs_decade_d2_r15.json >&2
    fi
  fi
fi

# --- 6. second sf0.1 preview window ----------------------------------------
sf01_preview "2"

echo "[r15] campaign done $(date +%H:%M:%S)" >&2
