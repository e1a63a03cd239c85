#!/usr/bin/env python3
"""Round-10 BENCH_FULL merge with code-provenance row resets.

Merges the committed converged record with this round's interleaved runs
by per-query MIN — except for queries whose IMPLEMENTATION changed this
round (t19's fused position frame, e21's versioned ModelStore): their
record rows are re-established from round-10 runs only, so a stale
old-code min can never masquerade as the current code's throughput.

Usage: python3 tools/merge_bench_r10.py <run.json> [run.json ...]
Writes BENCH_FULL.json in place; prints a per-row change report.
"""
import json
import sys

CODE_CHANGED = {"t19_bigram_lm", "e21_stored_model_search"}


def main() -> int:
    record = json.load(open("BENCH_FULL.json"))
    conv = record["queries"]
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    run_mins = {}
    for r in runs:
        for k, v in r["queries"].items():
            run_mins[k] = min(v, run_mins.get(k, float("inf")))
    assert set(run_mins) == set(conv), set(run_mins) ^ set(conv)
    merged = {}
    for k in sorted(conv):
        if k in CODE_CHANGED:
            merged[k] = run_mins[k]  # new-code rows only
        else:
            merged[k] = min(conv[k], run_mins[k])
    for k in sorted(conv):
        if abs(merged[k] - conv[k]) > 1e-9:
            tag = "RESET (code changed)" if k in CODE_CHANGED else "improved"
            print(f"  {k}: {conv[k]:.3f} -> {merged[k]:.3f}  [{tag}]")
    record["queries"] = merged
    record["value"] = sum(merged.values())
    print(f"total: {sum(conv.values()):.2f} -> {record['value']:.2f} "
          f"over {len(merged)} queries, {len(runs)} run(s) merged")
    with open("BENCH_FULL.json", "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
