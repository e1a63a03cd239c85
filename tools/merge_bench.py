#!/usr/bin/env python3
"""Merge bench runs into the converged BENCH_FULL record (per-query MIN).

Rows whose implementation changed this round must be named with --reset:
their record rows are re-established from the supplied runs only, so a
stale old-code min can never masquerade as the current code's throughput.

Unlike the retired round-10 tool, partial runs merge fine: a run that
covers only a subset of the record (e.g. one aborted query, or a focused
re-run of a few rows) contributes the rows it has. Only two things are
errors, and both are reported readably: a run containing queries the
record does not know, and a --reset query that no supplied run covers
(a reset row with no new-code measurement would silently vanish).

Usage: python3 tools/merge_bench.py [--reset q1,q2] <run.json> [run.json ...]
Writes BENCH_FULL.json in place; prints a per-row change report.
"""
import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reset", default="",
                    help="comma-separated queries whose code changed: record rows "
                         "are rebuilt from the supplied runs, not min'd with history")
    ap.add_argument("runs", nargs="+", help="bench run JSON files to merge")
    args = ap.parse_args()
    code_changed = {q for q in args.reset.split(",") if q}

    record = json.load(open("BENCH_FULL.json"))
    conv = record["queries"]

    run_mins = {}
    for path in args.runs:
        run = json.load(open(path))
        unknown = sorted(set(run["queries"]) - set(conv))
        if unknown:
            print(f"error: {path} contains queries not in the record: "
                  f"{', '.join(unknown)}")
            return 1
        missing = sorted(set(conv) - set(run["queries"]))
        if missing:
            shown = ", ".join(missing[:8]) + (", …" if len(missing) > 8 else "")
            print(f"note: {path} is a partial run; merging without "
                  f"{len(missing)} uncovered queries ({shown})")
        for k, v in run["queries"].items():
            run_mins[k] = min(v, run_mins.get(k, float("inf")))

    uncovered_resets = sorted(code_changed - set(run_mins))
    if uncovered_resets:
        print("error: --reset queries with no measurement in any supplied run "
              f"(a reset needs new-code rows): {', '.join(uncovered_resets)}")
        return 1
    bogus_resets = sorted(code_changed - set(conv))
    if bogus_resets:
        print(f"error: --reset queries not in the record: {', '.join(bogus_resets)}")
        return 1

    merged = {}
    for k in sorted(conv):
        if k in code_changed:
            merged[k] = run_mins[k]  # new-code rows only
        elif k in run_mins:
            merged[k] = min(conv[k], run_mins[k])
        else:
            merged[k] = conv[k]  # uncovered by these runs; record row stands
    for k in sorted(conv):
        if abs(merged[k] - conv[k]) > 1e-9:
            tag = "RESET (code changed)" if k in code_changed else "improved"
            print(f"  {k}: {conv[k]:.3f} -> {merged[k]:.3f}  [{tag}]")
    record["queries"] = merged
    record["value"] = sum(merged.values())
    print(f"total: {sum(conv.values()):.2f} -> {record['value']:.2f} "
          f"over {len(merged)} queries, {len(args.runs)} run(s) merged")
    with open("BENCH_FULL.json", "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
