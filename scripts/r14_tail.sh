#!/usr/bin/env bash
# Round-14 campaign tail: solos first (they need the green-weather
# window and clear four weak flags), then g1 with GC+pressure capture,
# then the sf0.1 bench, then the decade probe LAST (longest, least
# likely to fit the round). Legs artifact-guarded like r14_campaign.sh;
# see that script for per-leg rationale.
set -uo pipefail
cd "$(dirname "$0")/.."
GEN=$(cat /root/testdata/sf0.1/*.parquet | md5sum | cut -d' ' -f1)
sweep() {
  pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe|ScaleUp)" >/dev/null && return 0
  rm -rf /tmp/blockmgr-* 2>/dev/null || true
  find /tmp -maxdepth 1 -name 'spark-*' ! -name spark-events -exec rm -rf {} + 2>/dev/null || true
}
for q in d5_ngram_jaccard d9_span_dupes d4_simhash_pairs d6_embed_neardup a7_dedup_first_wins; do
  out="bench/sf100_solo_${q%%_*}_r14.json"
  [ -s "$out" ] && continue
  sweep
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
if [ ! -s bench/sf100_solo_g1_r14.json ]; then
  sweep
  echo "[r14] $(date +%H:%M:%S) g1 probe (GC log + pressure sampler)" >&2
  : > bench/g1_pressure_r14.log
  ( while :; do
      echo "t=$(date +%s) steal=$(awk '/^cpu /{print $9}' /proc/stat) $(grep -h . /proc/pressure/io | tr '\n' ' ')"
      sleep 5
    done >> bench/g1_pressure_r14.log ) &
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
  [ -s bench/sf100_solo_g1_r14.json ] || { echo "[r14] ERROR g1 no sidecar" >&2; exit 1; }
  cat bench/sf100_solo_g1_r14.json >&2
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
if [ ! -s bench/docs_decade_d2_r14.json ]; then
  sweep
  echo "[r14] $(date +%H:%M:%S) docs decade probe (96g)" >&2
  SPARK_DRIVER_MEM=96g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    sbt -batch "runMain graft.DocsDecadeProbe $PWD/scale/sf100 $PWD/scale/docs_decade 10" \
    > /tmp/r14_docs_decade.log 2>&1
  grep '"metric":"docs_decade_probe"' /tmp/r14_docs_decade.log \
    > bench/docs_decade_d2_r14.json \
    || { echo "[r14] ERROR decade probe no metric" >&2; exit 1; }
  echo "$GEN" > scale/docs_decade/GENERATION
  cat bench/docs_decade_d2_r14.json >&2
fi
echo "[r14] tail done $(date +%H:%M:%S)" >&2
