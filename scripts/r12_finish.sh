#!/usr/bin/env bash
# Round-12 campaign tail: cohorts 3+4 (1+2 already recorded), merge, sf1
# oracle replay, CC 400M probe, docs decade probe. Serialized.
set -uo pipefail
cd "$(dirname "$0")/.."
GEN=$(cat /root/testdata/sf0.1/*.parquet | md5sum | cut -d' ' -f1)

runc() { # cohort-index query-list...
  i=$1; shift
  cout="bench/sf100_cold_r12_c${i}.json"
  rm -f "$cout"
  # orphan sweep between serial JVMs (see scale_gate.sh)
  pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe)" >/dev/null \
    || rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
  echo "[r12] $(date +%H:%M:%S) cohort $i ($# queries)" >&2
  SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" SPARK_GRAFT_BENCH_OUT="$PWD/$cout" \
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
  SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
  SPARK_GRAFT_BENCH_RUN_LAST=g1_pagerank \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    sbt -batch "runMain graft.Bench --exact $*" > "/tmp/r12_c${i}.log" 2>&1
  [ -f "$cout" ] || { echo "[r12] ERROR cohort $i no sidecar" >&2; exit 1; }
}

runc 3 $(sed -n '3p' /tmp/graft_cohorts_r12.txt)
runc 4 $(sed -n '4p' /tmp/graft_cohorts_r12.txt)

python3 scripts/merge_cohorts.py bench/sf100_cold_r12.json "$GEN" \
  /tmp/graft_registry_names_r12.txt bench/sf100_cold_r12_c*.json \
  || { echo "[r12] ERROR merge failed" >&2; exit 1; }

echo "[r12] $(date +%H:%M:%S) sf1 verify + oracle replay" >&2
rm -rf /tmp/graft_scale_gate_sf1
pgrep -f "graft\." >/dev/null || rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
sbt -batch "runMain graft.Verify $PWD/scale/sf1 /tmp/graft_scale_gate_sf1" \
  > /tmp/r12_verify_sf1.log 2>&1
echo "generation $GEN" > bench/oracle_sf1_r12.log
python3 -u scripts/check_oracle.py /tmp/graft_scale_gate_sf1 "$PWD/scale/sf1" \
  | tee -a bench/oracle_sf1_r12.log

echo "[r12] $(date +%H:%M:%S) CC 400M probe" >&2
pgrep -f "graft\." >/dev/null || rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.CcProbe 4000000 100 star diskbound" \
  > /tmp/r12_cc400m.log 2>&1
grep '"metric":"cc_probe"' /tmp/r12_cc400m.log > bench/cc_probe_400m_r12.json \
  || { echo "[r12] ERROR CC probe no metric" >&2; exit 1; }

echo "[r12] $(date +%H:%M:%S) docs decade probe" >&2
pgrep -f "graft\." >/dev/null || rm -rf /tmp/blockmgr-* /tmp/spark-* 2>/dev/null || true
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  sbt -batch "runMain graft.DocsDecadeProbe $PWD/scale/sf100 $PWD/scale/docs_decade 10" \
  > /tmp/r12_docs_decade.log 2>&1
grep '"metric":"docs_decade_probe"' /tmp/r12_docs_decade.log \
  > bench/docs_decade_d2_r12.json \
  || { echo "[r12] ERROR decade probe no metric" >&2; exit 1; }

echo "[r12] done $(date +%H:%M:%S)" >&2
