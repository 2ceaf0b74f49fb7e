#!/usr/bin/env python3
"""Oracle-runtime gate (VERDICT r14 #2).

Usage: python3 scripts/oracle_time.py <sfDir> <verifyOutDir> [perKeyBudget] [totalBudget]

Round 14 was zeroed by ONE oracle: q_graph_hits' un-materialized CTE
chain took 786.5 s standalone in DuckDB 1.0 (the driver's t2 compare
blew its budget and wrote CORRECTNESS_r14.json = {}), while the whole
rest of the surface was green. The failure was invisible locally
because scripts/check.py verifies VALUES, not runtimes. This gate
times every oracleSql key from a Verify dump's oracle_sql.json on the
same DuckDB the driver uses and FAILS the close when any key exceeds
the per-key budget (default 10 s) or the sweep exceeds the total
budget (default 600 s). Slow keys are interrupted at 2x the per-key
budget via duckdb's interrupt() so one landmine cannot hang the gate
itself.

Writes scripts/oracle_timing.json (committed round artifact — see
close_check.py) with per-key seconds so the judge can audit the sweep.

This is a DEV tool (run manually at round close), not part of the
shipped library.
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    per_key = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    total_budget = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    timings = {}
    breaches = []
    hangs = []
    t_sweep = time.time()
    for name in sorted(oracles):
        sql = oracles[name]
        done = threading.Event()

        # bind THIS iteration's event/name at definition time — a
        # late-scheduled watchdog reading loop vars by closure would
        # wait on a later key's event and interrupt the wrong query,
        # misattributing a hang (ADVICE r15)
        def watchdog(done=done, name=name):
            # hard stop at 2x budget: record the hang, keep sweeping
            if not done.wait(per_key * 2):
                print(f"WATCHDOG interrupting {name}")
                con.interrupt()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
        except Exception as e:
            dt = time.time() - t0
            if "INTERRUPT" in str(e).upper() or dt >= per_key * 2 - 0.5:
                hangs.append(name)
            else:
                # a broken oracle fails check.py, not this gate; still flag
                print(f"ERROR {name}: {str(e).splitlines()[0][:120]}")
        finally:
            done.set()
        timings[name] = round(dt, 3)
        if dt > per_key:
            breaches.append(name)

    total = time.time() - t_sweep
    report = {"_sf_dir": sf_dir, "_per_key_budget_s": per_key,
              "_total_budget_s": total_budget,
              "_total_s": round(total, 1), "_n_oracles": len(timings),
              "_breaches": sorted(breaches), "_hangs": sorted(hangs)}
    report.update(dict(sorted(timings.items())))
    with open("scripts/oracle_timing.json", "w") as f:
        json.dump(report, f, indent=1)

    top = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    print(f"{len(timings)} oracles, total {total:.1f}s "
          f"(budget {total_budget:.0f}s); slowest:")
    for k, v in top:
        print(f"  {v:7.2f}s {k}")
    ok = not breaches and not hangs and total <= total_budget
    if breaches:
        print(f"PER-KEY BREACH (> {per_key:.0f}s): {', '.join(breaches)}")
    if hangs:
        print(f"INTERRUPTED (> {per_key * 2:.0f}s): {', '.join(hangs)}")
    if total > total_budget:
        print(f"TOTAL BREACH: {total:.1f}s > {total_budget:.0f}s")
    print("Oracle-runtime gate:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
