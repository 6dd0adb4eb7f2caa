#!/usr/bin/env python3
"""DuckDB yardstick: executes every oracle statement against the given
testdata dir and reports per-statement + total wall time.

Recursive-CTE statements (WITH RECURSIVE) are excluded and listed — the
iterative-contraction connected-components family takes minutes-to-hours
as a SQL recursive closure at sf0.1 (45+ CPU-minutes observed round 10)
while Spark runs it in seconds; including them would make the comparison
meaningless in the other direction.

Usage: yardstick.py <oracle_sql.json | verify_out_dir> <testdata_sf_dir> [threads]
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(oracle_path, sf_dir, threads=32):
    if os.path.isdir(oracle_path):
        oracle_path = os.path.join(oracle_path, "oracle_sql.json")
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    recursive = sorted(n for n, sql in oracle.items()
                       if "WITH RECURSIVE" in sql.upper())
    runnable = sorted(n for n in oracle if n not in recursive)
    total = 0.0
    times = {}
    failed = []
    for name in runnable:
        t0 = time.time()
        try:
            con.sql(oracle[name]).fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        times[name] = dt
        total += dt
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{dt:7.2f}  {name}")
    print(f"\nyardstick: {total:.1f}s over {len(times)} non-recursive stmts "
          f"({len(recursive)} recursive excluded: {', '.join(recursive)}); "
          f"failed: {failed or 'none'}; threads={threads}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 32)
