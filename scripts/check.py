#!/usr/bin/env python3
"""Ring-1 oracle compare (SURVEY.md §5): mimic the driver's t2 gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir>, reads the Spark result parquet from
<verifyOutDir>/<name>/, sorts columns by name on both sides, and compares
row counts + values. Exit 1 if any query mismatches.

This is a DEV tool (run manually), not part of the shipped library.
"""
import sys, json, os, math
from decimal import Decimal

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for comparison."""
    if isinstance(v, Decimal):
        return ("num", str(v.normalize()) if v != 0 else "0")
    if isinstance(v, float):
        if math.isnan(v):
            return ("num", "nan")
        d = Decimal(repr(v)).normalize()
        return ("num", str(d) if v != 0 else "0")
    if isinstance(v, int):
        return ("num", str(Decimal(v)))
    if isinstance(v, list):
        return ("list", tuple(canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, canon(x)) for k, x in v.items())))
    return (type(v).__name__, str(v))


def rows_of(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [cols[i] for i in order], [tuple(r[i] for i in order) for r in rows]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no Spark result dir (query crashed?)")
            n_fail += 1
            continue
        try:
            ocols, orows = rows_of(con, sql)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            scols, srows = rows_of(con, f"SELECT * FROM '{spark_dir}/*.parquet'")
        except Exception as e:
            print(f"FAIL {name}: cannot read Spark result: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ\n  spark : {scols}\n  oracle: {ocols}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orr) in enumerate(zip(srows, orows)):
            cs, co = tuple(canon(v) for v in sr), tuple(canon(v) for v in orr)
            if cs != co:
                bad = (i, sr, orr)
                break
        if bad:
            i, sr, orr = bad
            print(f"FAIL {name}: first diff at row {i}")
            for c, a, b in zip(scols, sr, orr):
                if canon(a) != canon(b):
                    print(f"    col {c}: spark={a!r} ({type(a).__name__}) "
                          f"oracle={b!r} ({type(b).__name__})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
