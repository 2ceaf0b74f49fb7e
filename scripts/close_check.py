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
     budget — a renamed/removed key would silently shrink the gate).

This is a DEV tool (run manually at round close), not part of the
shipped library.
"""
import json
import subprocess
import sys

ARTIFACTS = ("BENCH_r", "CORRECTNESS_r", "LEAKCHECK.json",
             "COPYCHECK.json", "VERDICT.md", "ADVICE.md",
             "bench_queries.json", "scripts/cpu_budgets.json")


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
