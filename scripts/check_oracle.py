#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <outDir> [sfDir]

Reads each <outDir>/<name>/ parquet result (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against views over the
sfDir parquet tables, sorts columns by name and rows by all columns, and
compares cell values. Reports per-query PASS/FAIL with first diffs.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(normcell(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


def normcell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, list):
        return tuple(normcell(x) for x in v)
    return v


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    # optional extra args: query-name prefixes to check (mirrors Bench's
    # filter) — decade-scale replays use this to run the oracles DuckDB can
    # afford at that sf (its dedup pair expansion is quadratic where the
    # engine's collapsed plans are linear)
    # a leading '!' EXCLUDES a prefix (e.g. `!d2 !d4` = everything except
    # those) — the decade replay's way of skipping the six pair-dedup
    # oracles DuckDB can't afford, without enumerating the other 60
    raw = sys.argv[3:]
    includes = [p for p in raw if not p.startswith("!")]
    excludes = [p[1:] for p in raw if p.startswith("!")]
    def wanted(n):
        if any(n.startswith(p) for p in excludes):
            return False
        return not includes or any(n.startswith(p) for p in includes)
    prefixes = raw
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}

    # print-as-you-go (flushed): an hours-long decade-scale replay that
    # dies mid-run still leaves its completed verdicts on disk
    def record(name, verdict):
        results[name] = verdict
        print(f"RES {name}: {verdict}", flush=True)

    for qdir in sorted(p for p in out_dir.iterdir() if p.is_dir()):
        name = qdir.name
        if not wanted(name):
            continue
        try:
            rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            got_cols = rel.columns
            got_rows = rel.fetchall()
        except Exception as e:
            record(name, f"READ-FAIL {e}")
            continue
        if name not in oracle:
            record(name, f"NO-ORACLE rows={len(got_rows)}")
            continue
        try:
            orel = con.sql(oracle[name])
            exp_cols = orel.columns
            exp_rows = orel.fetchall()
        except Exception as e:
            record(name, f"ORACLE-FAIL {e}")
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            record(name, f"SCHEMA-MISMATCH got={gc} exp={ec}")
        elif gr != er:
            diffs = [
                (i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b
            ][:3]
            record(name,
                f"VALUE-MISMATCH rows got={len(gr)} exp={len(er)} first_diffs={diffs}")
        else:
            record(name, f"PASS rows={len(gr)}")

    # NO-ORACLE with rows>0 is the driver's weaker rows-only check, not a
    # failure (SKILL contract: oracle-less ops are acceptable)
    def ok(v):
        if v.startswith("PASS"):
            return True
        if v.startswith("NO-ORACLE"):
            return int(v.split("rows=")[1]) > 0
        return False

    if not results:
        # a typo'd prefix must not be indistinguishable from a passing gate
        print(f"\nERROR: no query outputs matched under {out_dir}"
              + (f" for prefixes {prefixes}" if prefixes else ""))
        sys.exit(2)
    nok = sum(1 for v in results.values() if ok(v))
    print(f"\n{nok}/{len(results)} OK")
    sys.exit(0 if nok == len(results) else 1)


if __name__ == "__main__":
    main()
