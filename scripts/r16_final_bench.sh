#!/bin/bash
# r16 final clean-bench loop: wait for a green scratch window (median-of-3
# probe, the scale_gate.sh protocol), run the full sf0.1 bench, accept the
# artifact only if ITS OWN sentinels are green (noop<=0.35 both ends,
# scratch>=50 both ends); otherwise wait and retry. Keeps every rejected
# artifact as bench/r16_after_try<N>.json for the weather record.
set -u
cd /root/repo
probe() {
  local f=/tmp/.r16_probe.$$ out
  out=$(LC_ALL=C dd if=/dev/zero of="$f" bs=4M count=16 conv=fsync 2>&1 | tail -1)
  rm -f "$f"
  echo "$out" | LC_ALL=C awk -F', ' '/bytes/ && / copied/ {
    b = $1 + 0; t = $(NF-1) + 0
    if (t > 0) printf "%.1f", b / t / 1000000 }'
}
median3() {
  local a b c; a=$(probe); b=$(probe); c=$(probe)
  printf '%s\n%s\n%s\n' "$a" "$b" "$c" | sort -g | sed -n 2p
}
for try in 1 2 3 4 5 6; do
  med=$(median3)
  echo "[r16-final] try $try scratch median ${med:-n/a} MB/s"
  if [ -n "$med" ] && awk -v m="$med" 'BEGIN{exit !(m >= 80)}'; then
    out="bench/r16_after_try${try}.json"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT="$out" \
      sbt -batch "runMain graft.Bench" > /tmp/r16_final_stdout.txt 2>/dev/null
    line=$(grep '"metric"' /tmp/r16_final_stdout.txt | tail -1)
    echo "$line"
    ok=$(python3 - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
green = (d["noop_sec"] <= 0.35 and d["noop_end_sec"] <= 0.35
         and d.get("scratch_mbps", 99) >= 50 and d.get("scratch_end_mbps", 99) >= 50
         and not d.get("failed"))
print("GREEN" if green else "TAINTED", round(d["value"], 1),
      d["noop_sec"], d["noop_end_sec"], d.get("scratch_mbps"), d.get("scratch_end_mbps"))
EOF
)
    echo "[r16-final] $ok"
    if [ "${ok%% *}" = "GREEN" ]; then
      cp "$out" bench/r16_after_sf0.1.json
      echo "[r16-final] accepted try $try -> bench/r16_after_sf0.1.json"
      exit 0
    fi
  fi
  sleep 180
done
echo "[r16-final] no green window in 6 tries; best-effort artifacts kept" >&2
exit 1
