#!/usr/bin/env python3
"""Round-close hygiene gate (VERDICT r11 #3).

Usage: python3 scripts/close_check.py [bench_queries.json] [budgets.json]

The round-artifact commit convention broke three consecutive rounds
(r9-r11: BENCH_r*/CORRECTNESS_r* left untracked, LEAKCHECK/
bench_queries left modified at snapshot time, new keys left without
cpu budgets). A checklist did not stick; a FAILING gate is the only
convention that ever has in this repo. Run this at round close (after
recording budgets, before the final commit); it exits non-zero when:

  1. any round artifact is untracked or modified-uncommitted in git
     (BENCH_r*.json, CORRECTNESS_r*.json, LEAKCHECK.json,
     COPYCHECK.json, VERDICT.md, ADVICE.md, bench_queries.json,
     scripts/cpu_budgets.json), or
  2. any graded query in the bench recording has NO entry in
     scripts/cpu_budgets.json (cpu_gate.py only WARNS on these, so
     CPU regressions in new keys would be ungated next round), or
  3. a budgeted key no longer exists in the bench recording (stale
     budget — a renamed/removed key would silently shrink the gate), or
  4. (VERDICT r14 #3) the registered surface and SURVEY.md §2 drift:
     every bench key must be mentioned in §2 and every §2-mentioned
     key must be registered — r14 shipped three green keys that were
     invisible to the graded inventory, or
  5. (VERDICT r14 #2) scripts/oracle_timing.json is missing, records
     a per-key/total budget breach or an interrupted oracle, or times
     a key that is no longer registered. One un-materialized CTE
     oracle (q_graph_hits, 786.5 s in DuckDB 1.0) zeroed the whole
     r14 correctness artifact; run scripts/oracle_time.py after every
     oracle change so that class of landmine fails HERE, not at the
     driver's compare.

This is a DEV tool (run manually at round close), not part of the
shipped library.
"""
import json
import os
import re
import subprocess
import sys

ARTIFACTS = ("BENCH_r", "CORRECTNESS_r", "LEAKCHECK.json",
             "COPYCHECK.json", "VERDICT.md", "ADVICE.md",
             "bench_queries.json", "scripts/cpu_budgets.json",
             "scripts/oracle_timing.json")


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_queries.json"
    budget_path = sys.argv[2] if len(sys.argv) > 2 else "scripts/cpu_budgets.json"
    failures = []

    st = subprocess.run(["git", "status", "--porcelain"],
                        capture_output=True, text=True, check=True).stdout
    for line in st.splitlines():
        status, path = line[:2], line[3:].strip()
        # rename lines are 'R  old -> new' — the artifact check and the
        # message should see the NEW path (ADVICE r12)
        if " -> " in path:
            path = path.split(" -> ", 1)[1]
        if any(path.startswith(a) or path == a for a in ARTIFACTS):
            if status == "??":
                kind = "UNTRACKED"
            elif status[0] in "ARC" and status[1] == " ":
                kind = "STAGED-UNCOMMITTED"
            else:
                kind = "MODIFIED-UNCOMMITTED"
            failures.append(f"  {kind} {path}")

    with open(bench_path) as f:
        cpu = json.load(f).get("cpu", {})
    with open(budget_path) as f:
        budgets = {k: v for k, v in json.load(f).items()
                   if not k.startswith("_")}
    for name in sorted(set(cpu) - set(budgets)):
        failures.append(f"  NO-BUDGET {name} (cpu_gate would only warn)")
    for name in sorted(set(budgets) - set(cpu)):
        failures.append(f"  STALE-BUDGET {name} (not in bench recording)")

    # 4. SURVEY.md §2 <-> registered-surface equality (VERDICT r14 #3).
    # "Mentioned in §2" = any backticked q_* token between the §2 and
    # §3 headers; the bench recording covers every registered key, so
    # its cpu map is the registered surface.
    with open("SURVEY.md") as f:
        txt = f.read()
    s2 = txt[txt.index("## §2."):txt.index("## §3.")]
    survey = set(re.findall(r"`(q_[a-z0-9_]+)`", s2))
    for name in sorted(set(cpu) - survey):
        failures.append(f"  NOT-IN-SURVEY {name} (registered but absent "
                        "from SURVEY.md §2 — off the graded inventory)")
    for name in sorted(survey - set(cpu)):
        failures.append(f"  NOT-REGISTERED {name} (SURVEY.md §2 mentions "
                        "it but SparkEntry/bench does not carry it)")

    # 5. Oracle-runtime artifact (VERDICT r14 #2): must exist, be clean
    # of breaches/hangs, inside the total budget, and free of stale keys.
    ot_path = "scripts/oracle_timing.json"
    if not os.path.exists(ot_path):
        failures.append(f"  NO-ORACLE-TIMING {ot_path} "
                        "(run scripts/oracle_time.py)")
    else:
        with open(ot_path) as f:
            ot = json.load(f)
        for name in ot.get("_breaches", []):
            failures.append(f"  ORACLE-SLOW {name} "
                            f"({ot.get(name)}s > {ot.get('_per_key_budget_s')}s)")
        for name in ot.get("_hangs", []):
            failures.append(f"  ORACLE-HANG {name} (interrupted — the "
                            "r14 q_graph_hits failure mode)")
        if ot.get("_total_s", 0) > ot.get("_total_budget_s", 600):
            failures.append(f"  ORACLE-TOTAL {ot['_total_s']}s > "
                            f"{ot['_total_budget_s']}s")
        stale = {k for k in ot if not k.startswith("_")} - set(cpu)
        for name in sorted(stale):
            failures.append(f"  STALE-ORACLE-TIMING {name} "
                            "(timed but no longer registered)")

    if failures:
        print("Round-close gate: FAIL")
        for f_ in failures:
            print(f_)
        return 1
    print(f"Round-close gate: PASS ({len(cpu)} keys budgeted, "
          "artifacts committed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
