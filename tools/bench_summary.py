#!/usr/bin/env python3
"""Render bench run(s) into a committed per-round summary.

Usage: python3 tools/bench_summary.py <round> <prior.json|-> <run.json> [run.json ...]

Writes BENCH_SUMMARY_r<round>.md with the full per-query table (so the
committed record never depends on log-line truncation). Multiple run files
are combined per-query by MIN: this host shows bursty hypervisor CPU steal
(documented in Bench.scala), so the minimum over interleaved full passes
measures the engine, not the noise — the same reasoning Bench itself uses
for its in-run best-of-N. Pass `-` for prior to skip the comparison.
"""
import json
import os
import sys

NOTES_START = "<!-- notes:start -->"
NOTES_END = "<!-- notes:end -->"


def preserved_notes(path: str) -> list:
    """Hand-written notes (methodology flags, validation claims) live
    between the notes markers and survive regeneration — without this,
    rerunning the script silently drops the disclosures the record is
    required to carry."""
    if not os.path.exists(path):
        return []
    text = open(path).read()
    if NOTES_START not in text or NOTES_END not in text:
        return []
    block = text.split(NOTES_START, 1)[1].split(NOTES_END, 1)[0]
    return [NOTES_START + block + NOTES_END, ""]


def main() -> int:
    rnd = sys.argv[1]
    prior = {} if sys.argv[2] == "-" else json.load(open(sys.argv[2]))["queries"]
    runs = [json.load(open(p)) for p in sys.argv[3:]]
    meta = runs[-1]
    # Bench already omits a run's OWN failed queries from its queries map,
    # so every timing present is a genuine measurement — merge them all.
    # A query that failed in one run but passed in another keeps the
    # passing run's timing AND is named below so the flake is visible.
    failed = sorted(set(sum((r.get("failed", []) for r in runs), [])))
    qs = {}
    for r in runs:
        for k, v in r["queries"].items():
            qs[k] = min(v, qs[k]) if k in qs else v
    never_measured = [k for k in failed if k not in qs]
    total = sum(qs.values())
    lines = [
        f"# BENCH_SUMMARY — round {rnd}",
        "",
        f"Per-query MIN over {len(runs)} full run(s) × best-of-"
        f"{meta.get('reps', '?')} passes each, `local[{meta.get('cpus', '?')}]`, "
        f"sf dir `{meta.get('sf')}` (min-of-runs because this host shows "
        f"bursty hypervisor CPU steal; see Bench.scala). Total "
        f"**{total:.1f} s** over **{len(qs)} queries**; "
        f"failed in at least one run: {failed}; never measured (excluded): {never_measured}.",
        "",
    ]
    if prior:
        shared = sorted(set(qs) & set(prior))
        tot_new = sum(qs[k] for k in shared)
        tot_old = sum(prior[k] for k in shared)
        lines += [
            f"Shared subset vs prior round: **{len(shared)} queries**, "
            f"{tot_old:.1f} s → {tot_new:.1f} s "
            f"(**{tot_new / tot_old:.2f}×**).",
            "",
        ]
    lines += preserved_notes(f"BENCH_SUMMARY_r{rnd}.md")
    lines += ["| query | sec |" + (" prior | Δ |" if prior else ""),
              "|---|---|" + ("---|---|" if prior else "")]
    for k in sorted(qs):
        row = f"| {k} | {qs[k]:.2f} |"
        if prior:
            if k in prior:
                row += f" {prior[k]:.2f} | {qs[k] - prior[k]:+.2f} |"
            else:
                row += " new | — |"
        lines.append(row)
    out = f"BENCH_SUMMARY_r{rnd}.md"
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
