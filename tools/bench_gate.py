#!/usr/bin/env python3
"""Compare a graft.Bench JSON line against the FROZEN per-query budgets in
tools/bench_budgets.json (see BASELINE.md "frozen bench budgets").

Usage: bench_gate.py <bench.json|-> [budgets.json]

The bench file may be either the raw one-line {"metric":...} JSON printed by
graft.Bench or a driver BENCH_r*.json wrapper whose "tail" embeds it.

Exit 0 = every query within budget; exit 1 = violations (listed) or queries
missing from the budget table (a new query must get a frozen budget in the
same commit that adds it).
"""
import json
import os
import re
import sys


def load_bench(path):
    text = sys.stdin.read() if path == "-" else open(path).read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d["queries"]
    if isinstance(d, dict) and "tail" in d:
        text = d["tail"]
    # the bench line is one-per-line JSON possibly embedded in log noise:
    # take the LAST line carrying it, sliced from its first '{"metric"' to
    # that line's final '}' (a lazy cross-line regex truncates mid-object)
    line = None
    for cand in text.splitlines():
        if '{"metric"' in cand:
            line = cand
    if line is None:
        raise SystemExit(f"no bench JSON line found in {path}")
    return json.loads(line[line.index('{"metric"'):line.rindex("}") + 1])["queries"]


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "-"
    budget_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_budgets.json")
    queries = load_bench(bench_path)
    budgets = json.load(open(budget_path))["budgets"]

    bad = []
    for q, sec in sorted(queries.items()):
        if q not in budgets:
            bad.append(f"UNBUDGETED {q}: {sec:.2f}s — freeze a budget for it")
            continue
        b = budgets[q]["budget_sec"]
        status = "OK" if sec <= b else "OVER"
        print(f"{status:4} {q:28} {sec:6.2f}s / budget {b:.2f}s")
        if sec > b:
            bad.append(f"OVER {q}: {sec:.2f}s > {b:.2f}s "
                       f"(basis {budgets[q]['basis_sec']}s, {budgets[q]['basis']})")
    # an incomplete bench run (query crashed mid-bench, stale file from an
    # older tree) must FAIL — missing coverage is how regressions hide
    for q in sorted(set(budgets) - set(queries)):
        print(f"MISS {q:28} budgeted but not in this bench run")
        bad.append(f"MISS {q}: budgeted but absent from the bench run")

    if bad:
        print("\n" + "\n".join(bad))
        sys.exit(1)
    print(f"\n{len(queries)} queries within budget")


if __name__ == "__main__":
    main()
