#!/usr/bin/env bash
# End-of-round decade gate: one command that (1) ensures the sf1/sf10/sf100
# replicas exist (graft.ScaleUp key-shifted replication of the sf0.1 base),
# (2) runs the full bench single-pass cold at sf100, and (3) replays the
# DuckDB oracle at sf1 for the 60 non-pair queries (the six pair-dedup
# oracles are hours-quadratic in DuckDB at sf1 — the ORACLE's cost, not the
# engine's; those six stay covered by the sf0.01/sf0.1 gate plus
# DedupCollapseSpec). Artifacts land in bench/ so decade regressions
# surface per-round, not per-audit.
#
# Usage: scripts/scale_gate.sh [round-tag]      (default tag: date stamp)
# Env:   SKIP_BUILD=1    don't (re)build missing replicas — fail instead
#        SKIP_SF100=1    skip the sf100 bench pass
#        SKIP_ORACLE=1   skip the sf1 oracle replay
#
# Times (32-core local[32]): replica build ~25 min all three, sf100 bench
# ~30 min cold, sf1 verify+replay ~15 min.
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:-$(date +%Y%m%d)}"
BASE=/root/testdata/sf0.1
mkdir -p bench

# Orphaned Spark scratch from killed JVMs eats the disk headroom g1's
# diskBound pass needs (~20 GB): the r12 gate's cohort-2 JVM died on a
# full disk because a previously-killed run had left a 17 GB blockmgr
# dir behind. The gate runs its JVMs strictly serially, so if no graft
# JVM is live at start, every scratch dir is an orphan. The glob must
# spare /tmp/spark-events — Spark's default event-log dir, which the
# stage-decomposition probes populate (ADVICE r12).
sweep_orphans() {
  if ! pgrep -f "graft\.(Bench|Verify|CcProbe|DocsDecadeProbe|ScaleUp)" >/dev/null; then
    rm -rf /tmp/blockmgr-* 2>/dev/null || true
    find /tmp -maxdepth 1 -name 'spark-*' ! -name spark-events \
      -exec rm -rf {} + 2>/dev/null || true
  fi
}
sweep_orphans

# Disk-headroom preflight (VERDICT r12 #3): the sf100 gate needs ~45 GB
# free on the scratch device — 15.6 GB replica reads aside, g1's diskBound
# checkpoints churn ~17-20 GB and shuffle scratch rides on top; r12's
# cohort-2 JVM died mid-gate on ENOSPC. Refuse to start (after sweeping)
# rather than die hours in; record free-at-start for the artifact trail.
FREE_GB=$(df -BG --output=avail /tmp | tail -1 | tr -dc '0-9')
# an empty reading (unsupported --output, odd mount) must be a hard error,
# not a silently-passing '[ "" -lt 45 ]' shell error (ADVICE r13)
if [ -z "$FREE_GB" ]; then
  echo "[scale_gate] ERROR: disk-headroom preflight unavailable (df gave no reading)" >&2
  exit 1
fi
echo "[scale_gate] scratch device free at start: ${FREE_GB} GB"
if [ "$FREE_GB" -lt "${MIN_FREE_GB:-45}" ]; then
  echo "[scale_gate] ERROR: only ${FREE_GB} GB free on /tmp's device;" >&2
  echo "  the gate needs ~45 GB (g1 diskBound churn + shuffle scratch)." >&2
  echo "  Free space or override with MIN_FREE_GB." >&2
  exit 1
fi

# Weather preflight (VERDICT r13 #3): the buffered write+fsync path on the
# scratch device is what every shuffle block / spill / checkpoint rides;
# this host's pathological regime runs it at single-digit MB/s (vs
# ~600 MB/s O_DIRECT on the same device) and made the r12/r13 gates record
# 7-29x readings on correct plans. Refuse to START a cohort while the
# regime is degraded: probe with a 64 MiB dd+fsync, retry with backoff up
# to WEATHER_RETRIES (default 10 x 120 s), then proceed WITH a loud
# warning — the in-artifact per-query timeline (+ mini probes) brackets
# whatever weather remains, and an outright abort could starve a round on
# a chronically slow host. Floor default 50 MB/s (healthy readings are
# 100x that; storms are <25).
scratch_mbps() {
  local f=/tmp/.gate_scratch_probe.$$ out
  out=$(LC_ALL=C dd if=/dev/zero of="$f" bs=4M count=16 conv=fsync 2>&1 | tail -1)
  rm -f "$f"
  # compute MB/s from dd's byte count and elapsed seconds instead of
  # parsing the human-readable unit: in the worst storms (<~1 MB/s)
  # coreutils dd prints kB/s or B/s, a unit-parse miss returned "", and
  # wait_for_weather treated the probe as unavailable — silently OPENING
  # the gate during exactly the weather it exists to block (ADVICE r14)
  echo "$out" | LC_ALL=C awk -F', ' '/bytes/ && / copied/ {
    b = $1 + 0; t = $(NF-1) + 0
    if (t > 0) printf "%.1f", b / t / 1000000 }'
}
wait_for_weather() {
  # median of 3 probes: the regime FLICKERS at seconds granularity (r14
  # shell sweep: the same 4M-block probe read 8.8 and 76.9 MB/s three
  # minutes apart) — a single reading is a sample, not a state
  local floor="${SCRATCH_FLOOR_MBPS:-50}" tries="${WEATHER_RETRIES:-10}" i m1 m2 m3 med
  for i in $(seq 1 "$tries"); do
    m1=$(scratch_mbps); m2=$(scratch_mbps); m3=$(scratch_mbps)
    if [ -z "$m1" ] || [ -z "$m2" ] || [ -z "$m3" ]; then
      echo "[scale_gate] weather probe unavailable; proceeding" >&2; return 0
    fi
    med=$(printf '%s\n%s\n%s\n' "$m1" "$m2" "$m3" | sort -g | sed -n 2p)
    if awk -v m="$med" -v f="$floor" 'BEGIN{exit !(m >= f)}'; then
      echo "[scale_gate] scratch weather ok: median ${med} MB/s of [$m1 $m2 $m3] (floor ${floor})"
      return 0
    fi
    echo "[scale_gate] scratch degraded: median ${med} MB/s of [$m1 $m2 $m3] < ${floor}; wait $i/$tries (120 s)" >&2
    sleep 120
  done
  echo "[scale_gate] WARNING: scratch still degraded after $tries waits (median ${med} MB/s) — proceeding; per-query timeline will bracket it" >&2
}

# --- 0. testdata generation stamp ------------------------------------------
# The driver regenerates /root/testdata per round; decade numbers are only
# comparable against replicas derived from the SAME generation (the r7 "t7
# 110 s ceiling" was chased for a turn because a stale replica impersonated
# a plan property). Hash the base parquet bytes once and (a) stamp every
# replica dir at build time, (b) refuse to run against a replica whose
# stamp is absent or different, (c) stamp every artifact this script writes.
GEN=$(cat "$BASE"/*.parquet | md5sum | cut -d' ' -f1)
echo "[scale_gate] testdata generation $GEN"

# --- 1. replicas (scale/ is outside sbt's clean blast radius) -------------
for spec in sf1:10 sf10:100 sf100:1000; do
  name="${spec%%:*}"; factor="${spec##*:}"
  if [ -f "scale/$name/lineitem.parquet" ] || [ -d "scale/$name/lineitem.parquet" ]; then
    have=$(cat "scale/$name/GENERATION" 2>/dev/null || echo "unstamped")
    if [ "$have" = "$GEN" ]; then
      echo "[scale_gate] scale/$name present (generation ok), skipping build"
    elif [ "${STALE_REBUILD:-0}" = "1" ]; then
      echo "[scale_gate] scale/$name generation $have != $GEN — rebuilding"
      rm -rf "scale/$name"
      SPARK_DRIVER_MEM=64g sbt -batch "runMain graft.ScaleUp $BASE scale/$name $factor"
      echo "$GEN" > "scale/$name/GENERATION"
    else
      echo "[scale_gate] ERROR: scale/$name was built from generation" >&2
      echo "  '$have' but the base is now '$GEN' — its numbers are not" >&2
      echo "  comparable. Re-run with STALE_REBUILD=1 to rebuild it." >&2
      exit 1
    fi
  elif [ "${SKIP_BUILD:-0}" = "1" ]; then
    echo "[scale_gate] ERROR: scale/$name missing and SKIP_BUILD=1" >&2
    exit 1
  else
    echo "[scale_gate] building scale/$name (factor $factor from $BASE)"
    SPARK_DRIVER_MEM=64g sbt -batch "runMain graft.ScaleUp $BASE scale/$name $factor"
    echo "$GEN" > "scale/$name/GENERATION"
  fi
done

# --- 2. sf100 cold bench, fresh-JVM cohorts --------------------------------
# The gate artifact is Bench's FULL-MAP sidecar (SPARK_GRAFT_BENCH_OUT),
# not the size-tiered stdout line: the stdout truncation drops the ~40
# fastest queries once the suite is large, which is exactly how the r8
# sweep's 17-query failure cascade stayed invisible. The sidecar always
# carries every query plus an explicit "failed" list.
#
# Cohorts (r10): one JVM for all 100 queries left the fast half timing
# against a block-manager/page-cache polluted by the multi-minute queries
# before them (readings 1.5-3x above warm floor — upper bounds, not
# measurements). The gate now runs a FRESH JVM per cohort: the fast cohort
# (prior sf100 time < 5s) first in a clean JVM, the heavy rest greedy-packed
# into 3 balanced cohorts from the most recent prior gate artifact. The
# merge step proves the cohorts are a disjoint cover of the FULL registry
# (from `Bench --list`) — a skipped or double-measured query fails the gate.
if [ "${SKIP_SF100:-0}" != "1" ]; then
  out="bench/sf100_cold_${TAG}.json"
  # stale same-TAG artifacts must never satisfy the gate: if a bench JVM
  # dies before writing its sidecar, the missing file is an error, not a
  # fallthrough to last run's numbers (ADVICE r9)
  rm -f "$out" "bench/sf100_cold_${TAG}_c"*.json "bench/sf100_cold_${TAG}_stdout.json"
  sbt -batch "runMain graft.Bench --list" 2>/dev/null | grep '^query:' \
    | sed 's/^query://' | sort > /tmp/graft_registry_names.txt
  n_reg=$(wc -l < /tmp/graft_registry_names.txt)
  if [ "$n_reg" -lt 1 ]; then
    echo "[scale_gate] ERROR: Bench --list returned no queries" >&2; exit 1
  fi
  # Prior artifact = the one the cohort packing derives its bins from.
  # Selection is by ROUND TAG (r11b > r11 > r10 ...), not mtime: after a
  # fresh checkout every committed artifact shares the checkout mtime, so
  # `ls -t` is filesystem-order roulette — the r12 campaign's first gate
  # attempt picked the ancient sf100_cold_postfix.json and silently
  # re-binned everything the family-affinity work had just stabilized.
  # Non-rN tags (postfix, single_pass, date stamps) rank below every rN
  # and among themselves by mtime. PRIOR=path overrides explicitly.
  prev="${PRIOR:-$(ls -t bench/sf100_cold_*.json 2>/dev/null \
    | grep -v -e '_stdout' -e '_c[0-9]' \
    | python3 -c '
import re, sys
def key(p):
    m = re.search(r"sf100_cold_r(\d+)([a-z]?)\.json$", p)
    # stdin is ls -t (newest first) and max() is first-wins on ties, so
    # plain max() picks the NEWEST mtime among equal-key non-rN tags;
    # reversed() inverted that (ADVICE r12)
    return (1, int(m.group(1)), m.group(2)) if m else (0, 0, "")
paths = [l.strip() for l in sys.stdin if l.strip()]
print(max(paths, key=key) if paths else "")')}"
  echo "[scale_gate] $n_reg registry queries; cohorts from prior ${prev:-<none>}"
  python3 scripts/cohorts.py /tmp/graft_registry_names.txt "${prev:-}" \
    > /tmp/graft_cohorts.txt
  i=0
  while IFS= read -r line; do
    i=$((i+1))
    cout="bench/sf100_cold_${TAG}_c${i}.json"
    # between-cohort hygiene: a cohort JVM that died leaves its scratch
    # behind; sweeping only at gate start let r12's cohort 2 inherit a
    # 17 GB orphan and die on ENOSPC (VERDICT r12 #3)
    sweep_orphans
    wait_for_weather
    echo "[scale_gate] cohort $i ($(echo "$line" | wc -w) queries, $(df -BG --output=avail /tmp | tail -1 | tr -dc '0-9') GB free) -> $cout"
    # --exact: cohort lines carry FULL names; prefix matching would run a
    # longer-named query in a shorter name's cohort the day one registry
    # name becomes a prefix of another (ADVICE r10). PREWARM: footers +
    # codegen noop before the first query, so cohort-first readings are
    # measurements, not cold-start upper bounds (VERDICT r10 #2).
    # RUN_LAST=g1_pagerank: g1's diskBound pass churns ~17 GB through the
    # page cache; every query after it in the same JVM read cache-cold
    # (r11: t13 31.9s vs 9.4s scattered). Last in its JVM, the tax is
    # structurally zero — and the env var is a no-op for cohorts that
    # don't contain g1 (VERDICT r11 #2).
    # CACHEWARM=1 (r12): every historical gate ran minutes after its
    # session wrote the replicas, i.e. with the dataset page-cache-
    # resident; this host's COLD buffered reads run 5-20 MB/s (vs GB/s
    # O_DIRECT), so an accidentally-cold cohort reads 4.5-9x slow with
    # flat CPU sentinels (r12: d12 solo 457s cold vs 52.8s warm, same
    # plan). Warming per cohort turns the regime every standing baseline
    # was actually recorded in into a DECLARED, recorded step
    # (cachewarm_sec in the sidecar is also the buffered-path sentinel).
    # NB: comments must stay ABOVE this env-prefix block — a comment line
    # inside the backslash continuation silently splits the command and
    # strands the earlier env vars as shell-local assignments (the r12
    # gate's first cohort benched the DEFAULT testdata dir that way).
    SPARK_GRAFT_SF_DIR="$PWD/scale/sf100" SPARK_GRAFT_BENCH_OUT="$cout" \
    SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_BENCH_WARMUP=0 SPARK_GRAFT_BENCH_DUAL=0 \
    SPARK_GRAFT_BENCH_PREWARM=1 SPARK_GRAFT_BENCH_CACHEWARM=1 \
    SPARK_GRAFT_BENCH_RUN_LAST=g1_pagerank SPARK_GRAFT_BENCH_MINIPROBE=1 \
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
      sbt -batch "runMain graft.Bench --exact $line" </dev/null \
        2>"/tmp/gate_${TAG}_c${i}.err" \
      | grep '"metric"' >> "bench/sf100_cold_${TAG}_stdout.json" || true
    if [ ! -f "$cout" ]; then
      echo "[scale_gate] ERROR: cohort $i wrote no sidecar (bench JVM died?)" >&2
      exit 1
    fi
  done < /tmp/graft_cohorts.txt
  python3 scripts/merge_cohorts.py "$out" "$GEN" /tmp/graft_registry_names.txt \
    "bench/sf100_cold_${TAG}_c"*.json
fi

# --- 3. sf1 oracle replay (FULL registry) ----------------------------------
# r11: the nine former pair-family exclusions (d2 d4 d5 d6 d7 d8 d12 sim6
# ds3) are gone — their oracles are now COLLAPSED like the engine's plans
# (group identical shingle-sets / texts / quantized vectors, band DISTINCT
# signatures only, expand qualifying group pairs), so the DuckDB side is
# linear in the duplication factor instead of hours-quadratic. The replay
# covers 100/100.
if [ "${SKIP_ORACLE:-0}" != "1" ]; then
  vout="/tmp/graft_scale_gate_sf1"
  log="bench/oracle_sf1_${TAG}.log"
  echo "[scale_gate] sf1 verify + oracle replay -> $log"
  rm -rf "$vout"
  sbt -batch "runMain graft.Verify $PWD/scale/sf1 $vout" 2>/dev/null | grep -E '\[verify\].*failed' || true
  echo "generation $GEN" > "$log"
  python3 -u scripts/check_oracle.py "$vout" "$PWD/scale/sf1" | tee -a "$log"
fi

echo "[scale_gate] done (tag $TAG, generation $GEN)"
