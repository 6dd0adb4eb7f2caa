#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness compare.

Usage: oracle_check.py <verify_out_dir> <testdata_sf_dir>

For each query dir under <verify_out_dir>: read the Spark result parquet,
run the corresponding oracle SQL from oracle_sql.json in DuckDB (with views
named after the test tables over <testdata_sf_dir>), then compare
column-name-sorted, row-sorted values exactly.
"""
import sys, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [c for c in sorted(cols)], out


def norm(v):
    import datetime, decimal
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(out_dir, sf_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            sdf = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols, srows = canon(sdf.fetchall(), sdf.columns)
            odf = con.sql(oracle[name])
            ocols, orows = canon(odf.fetchall(), odf.columns)
            # PORTABILITY PRE-FLIGHT (round-9 lesson): an uncast
            # SUM(BIGINT) output is HUGEINT, which this harness's
            # fetchall() compares as a plain int (pass) while an
            # arrow/pandas-path comparer converts through a non-int
            # representation (driver hash mismatch). Fail the type here
            # even when the values match.
            huge = [c for c, t in zip(odf.columns, map(str, odf.types))
                    if "HUGEINT" in t or "INT128" in t]
            if huge:
                print(f"FAIL {name}: oracle output columns {huge} are "
                      f"HUGEINT - CAST them to BIGINT (driver comparers "
                      f"do not round-trip int128)")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  cols   {scols}")
            print(f"  spark  {srows[bad]}")
            print(f"  oracle {orows[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
