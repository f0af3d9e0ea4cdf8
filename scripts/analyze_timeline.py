#!/usr/bin/env python3
"""Per-query weather attribution from a Bench sidecar's `timeline`.

Usage: analyze_timeline.py <sidecar.json> [pressure.log]

Prints one line per query: epoch window, wall seconds, the post-query
4 MiB scratch mini-probe reading (if SPARK_GRAFT_BENCH_MINIPROBE=1 was
set), and — when a pressure log from the campaign's sampler is given —
the max io-pressure avg10 and the steal-tick delta inside the query's
window. This is the tool that answers "WHICH query ran inside the
storm" from the artifact alone (SCALE.md r14).

Pressure log line shape (scripts/r14_campaign.sh leg 4):
  t=<epoch> steal=<ticks> some avg10=... full avg10=...
"""
import json
import re
import sys


def load_pressure(path):
    rows = []
    pat = re.compile(
        r"t=(\d+) steal=(\d+) some avg10=([\d.]+).* full avg10=([\d.]+)")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                rows.append((int(m.group(1)), int(m.group(2)),
                             float(m.group(3)), float(m.group(4))))
    return rows


def main():
    side = json.load(open(sys.argv[1]))
    pressure = load_pressure(sys.argv[2]) if len(sys.argv) > 2 else []
    tl = side.get("timeline") or {}
    if not tl:
        print("no timeline key in sidecar (pre-r14 artifact?)", file=sys.stderr)
        sys.exit(1)
    qs = side.get("queries") or {}
    t_first = min(v["t0"] for v in tl.values())
    print(f"{'query':32} {'start+s':>8} {'wall_s':>8} {'mini_MB/s':>9} "
          f"{'io_avg10max':>11} {'steal_d':>8}")
    for name, w in sorted(tl.items(), key=lambda kv: kv[1]["t0"]):
        t0, t1 = w["t0"], w["t1"]
        mini = w.get("scratch_mbps")
        inside = [r for r in pressure if t0 <= r[0] <= t1]
        io_max = max((r[2] for r in inside), default=None)
        steal_d = (inside[-1][1] - inside[0][1]) if len(inside) > 1 else None
        fmt = lambda v, d: (d % v) if v is not None else "-"
        print(f"{name:32} {t0 - t_first:8.1f} {qs.get(name, -1):8.2f} "
              f"{fmt(mini, '%9.1f'):>9} {fmt(io_max, '%11.2f'):>11} "
              f"{fmt(steal_d, '%8d'):>8}")


if __name__ == "__main__":
    main()
