#!/usr/bin/env bash
# Round-13 campaign tail: cohorts 2-4 (cohort 1 recorded by the gate run
# that died on c2's silent JVM exit), merge, sf1 oracle replay, CC 400M
# probe, docs decade probe. Serialized. Unlike the r12 version: fails
# fast on an empty cohort line, checks generation stamps up front, keeps
# every JVM's stderr, and sweeps orphans sparing /tmp/spark-events.
set -uo pipefail
cd "$(dirname "$0")/.."

GEN=$(cat /root/testdata/sf0.1/*.parquet | md5sum | cut -d' ' -f1)
for rep in sf1 sf100; do
  have=$(cat "scale/$rep/GENERATION" 2>/dev/null || echo "unstamped")
  [ "$have" = "$GEN" ] || { echo "[r13] ERROR scale/$rep gen mismatch" >&2; exit 1; }
done

sweep() {
  pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe|ScaleUp)" >/dev/null && return 0
  rm -rf /tmp/blockmgr-* 2>/dev/null || true
  find /tmp -maxdepth 1 -name 'spark-*' ! -name spark-events \
    -exec rm -rf {} + 2>/dev/null || true
}

runc() { # cohort-index query-list...
  i=$1; shift
  [ $# -ge 1 ] || { echo "[r13] ERROR cohort $i has no queries" >&2; exit 1; }
  cout="bench/sf100_cold_r13_c${i}.json"
  rm -f "$cout"
  sweep
  echo "[r13] $(date +%H:%M:%S) cohort $i ($# queries, $(df -BG --output=avail /tmp | tail -1 | tr -dc '0-9') GB free)" >&2
  SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" SPARK_GRAFT_BENCH_OUT="$PWD/$cout" \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
  SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
  SPARK_GRAFT_BENCH_RUN_LAST=g1_pagerank \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    sbt -batch "runMain graft.Bench --exact $*" </dev/null \
    > "/tmp/r13_c${i}.log" 2>&1
  rc=$?
  grep '"metric"' "/tmp/r13_c${i}.log" >> bench/sf100_cold_r13_stdout.json || true
  [ -f "$cout" ] || { echo "[r13] ERROR cohort $i no sidecar (sbt rc=$rc; see /tmp/r13_c${i}.log)" >&2; exit 1; }
}

runc 2 $(sed -n '2p' /tmp/graft_cohorts.txt)
runc 3 $(sed -n '3p' /tmp/graft_cohorts.txt)
runc 4 $(sed -n '4p' /tmp/graft_cohorts.txt)

python3 scripts/merge_cohorts.py bench/sf100_cold_r13.json "$GEN" \
  /tmp/graft_registry_names.txt bench/sf100_cold_r13_c*.json \
  || { echo "[r13] ERROR merge failed" >&2; exit 1; }

echo "[r13] $(date +%H:%M:%S) sf1 verify + oracle replay" >&2
rm -rf /tmp/graft_scale_gate_sf1
sweep
sbt -batch "runMain graft.Verify $PWD/scale/sf1 /tmp/graft_scale_gate_sf1" \
  > /tmp/r13_verify_sf1.log 2>&1 \
  || { echo "[r13] ERROR sf1 verify failed" >&2; exit 1; }
echo "generation $GEN" > bench/oracle_sf1_r13.log
python3 -u scripts/check_oracle.py /tmp/graft_scale_gate_sf1 "$PWD/scale/sf1" \
  | tee -a bench/oracle_sf1_r13.log

echo "[r13] $(date +%H:%M:%S) docs decade probe" >&2
sweep
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.DocsDecadeProbe $PWD/scale/sf100 $PWD/scale/docs_decade 10" \
  > /tmp/r13_docs_decade.log 2>&1
grep '"metric":"docs_decade_probe"' /tmp/r13_docs_decade.log \
  > bench/docs_decade_d2_r13.json \
  || { echo "[r13] ERROR decade probe no metric" >&2; exit 1; }

echo "[r13] $(date +%H:%M:%S) CC 400M probe" >&2
sweep
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.CcProbe 4000000 100 star diskbound" \
  > /tmp/r13_cc400m.log 2>&1
grep '"metric":"cc_probe"' /tmp/r13_cc400m.log > bench/cc_probe_400m_r13.json \
  || { echo "[r13] ERROR CC probe no metric" >&2; exit 1; }

echo "[r13] done $(date +%H:%M:%S)" >&2
