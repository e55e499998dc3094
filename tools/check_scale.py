#!/usr/bin/env python3
"""DuckDB oracle compare against a SCALE fixture (graft.tools.MakeScale
output): like check.py, but

- tables are Spark-written DIRECTORIES (table.parquet/part-*.parquet),
  so views glob instead of reading a single file;
- MakeScale writes events.ts as INT64 nanos (the round-1..4 physical
  type); when the column arrives as BIGINT the view converts it back to
  TIMESTAMP (micros) so every oracle string runs unchanged;
- an optional 3rd arg restricts the compare to a comma-separated query
  subset (the write-side family sweep only dumps what it checks).

Usage:
    sbt "runMain graft.Verify /tmp/graft_sf1 /tmp/vscale q1,q2"
    python3 tools/check_scale.py /tmp/graft_sf1 /tmp/vscale q1,q2
"""
import json
import os
import sys

import duckdb

from check import TABLES, canon, frame_sig


def view_sql(sf_dir: str, t: str) -> str:
    path = f"{sf_dir}/{t}.parquet"
    src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
    return src


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        src = view_sql(sf_dir, t)
        if t == "events":
            cols = {r[0]: r[1] for r in
                    con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()}
            if cols.get("ts") == "BIGINT":  # int64 nanos -> timestamp
                con.sql(f"CREATE VIEW {t} AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
                continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = canon(duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        gs, ws = frame_sig(got), frame_sig(want)
        if gs != ws:
            bad = [i for i, (a, b) in enumerate(zip(gs, ws)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at rows {bad}")
            for i in bad[:2]:
                print(f"  spark : {gs[i]}")
                print(f"  oracle: {ws[i]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(got)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
