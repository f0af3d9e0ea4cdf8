#!/usr/bin/env bash
# Round-14 tail, revised after the d5 solo probe (488 s vs r11b in-gate
# 17 s): the shingle-family queries' r11b standings were measured INSIDE
# a family-affinity bin whose earlier queries had already built the
# shared signature frames in the same JVM — a solo probe pays the whole
# family build and is an upper bound, not a comparable. The comparable
# is a mini family bin: d2 d4 d5 d9 in one JVM (Bench runs sorted, so
# d2 builds the frames first) with the per-query timeline giving each
# query's incremental reading. d6 (embed family: builds are cheap,
# r12-measured) and a7 (no shared frames) stay solo. Then g1 with
# GC+pressure capture, then the sf0.1 bench.
set -uo pipefail
cd "$(dirname "$0")/.."
sweep() {
  pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe|ScaleUp)" >/dev/null && return 0
  rm -rf /tmp/blockmgr-* 2>/dev/null || true
  find /tmp -maxdepth 1 -name 'spark-*' ! -name spark-events -exec rm -rf {} + 2>/dev/null || true
}
run_bench() { # out log extra-env... -- names...
  local out="$1" log="$2"; shift 2
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  sweep
  echo "[r14] $(date +%H:%M:%S) bench --exact $* -> $out" >&2
  env SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" SPARK_GRAFT_BENCH_OUT="$PWD/$out" \
    SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
    SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
    SPARK_GRAFT_BENCH_MINIPROBE=1 \
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    "${envs[@]}" \
    sbt -batch "runMain graft.Bench --exact $*" > "$log" 2>&1
  [ -s "$out" ] || { echo "[r14] ERROR $out not written (see $log)" >&2; exit 1; }
  cat "$out" >&2
}

[ -s bench/sf100_family_shingle_r14.json ] || run_bench \
  bench/sf100_family_shingle_r14.json /tmp/r14_family_shingle.log \
  -- d2_minhash_lsh d4_simhash_pairs d5_ngram_jaccard d9_span_dupes

[ -s bench/sf100_solo_d6_r14.json ] || run_bench \
  bench/sf100_solo_d6_r14.json /tmp/r14_solo_d6.log -- d6_embed_neardup

[ -s bench/sf100_solo_a7_r14.json ] || run_bench \
  bench/sf100_solo_a7_r14.json /tmp/r14_solo_a7.log -- a7_dedup_first_wins

if [ ! -s bench/sf100_solo_g1_r14.json ]; then
  : > bench/g1_pressure_r14.log
  ( while :; do
      echo "t=$(date +%s) steal=$(awk '/^cpu /{print $9}' /proc/stat) $(grep -h . /proc/pressure/io | tr '\n' ' ')"
      sleep 5
    done >> bench/g1_pressure_r14.log ) &
  SAMPLER=$!
  run_bench bench/sf100_solo_g1_r14.json /tmp/r14_solo_g1.log \
    SPARK_GRAFT_JAVA_OPTS="-Xlog:gc*:file=$PWD/bench/g1_gc_r14.log:time,uptime:filecount=1,filesize=50m" \
    -- g1_pagerank
  kill "$SAMPLER" 2>/dev/null || true
fi

if [ ! -s bench/bench_sf0.1_r14_preview.json ]; then
  sweep
  echo "[r14] $(date +%H:%M:%S) sf0.1 bench" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT="$PWD/bench/bench_sf0.1_r14_preview.json" \
    sbt -batch "runMain graft.Bench" > /tmp/r14_bench_sf01.log 2>&1
  [ -s bench/bench_sf0.1_r14_preview.json ] || { echo "[r14] ERROR bench no sidecar" >&2; exit 1; }
  head -c 300 bench/bench_sf0.1_r14_preview.json >&2; echo >&2
fi
echo "[r14] tail2 done $(date +%H:%M:%S)" >&2
