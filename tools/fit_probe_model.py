#!/usr/bin/env python3
"""Probe-conditioned bench-total prediction (r13 VERDICT item 2).

Replaces the retired fixed 75-90s prediction band (which failed twice in
round 13: in-band probes produced passes at 68.6s and at 104.6-127.9s)
with a FUNCTION of the paired pre-run host probe:

    total_s = b0 + b1*tiny_job_ms_p50 + b2*big_job_s + b3*(1e5/sha256_mb_s)

fit by least squares over tools/probe_fit_r13.jsonl - the 32 round-13
deepening-campaign passes plus the two degraded-window full passes that
have paired probe lines (p1 early full, r13 driver close). Each campaign
row's probe is the host_probe.py line taken immediately before that
bench invocation (the pairing the campaign scripts enforced:
/tmp/bench_deepen_r13.sh wrote one probe line, then one run file, in
lockstep).

Adjudication rule derived from the residuals (see BENCH_SUMMARY_r14.md):
  - a driver pass within +2*RMSE of its probe-conditioned prediction is
    HOST-adjudicated (the close pass itself sits +2.7s off the fit);
  - beyond that, check the NEAREST-AFTER probe: a pre-run snapshot is a
    lower bound on the window's degradation, so if a later probe reads
    worse, re-predict with it - the pass is host-adjudicated if the two
    predictions BRACKET it (the p1 case: pre-probe predicts 107.8s, the
    soon-after 'before f3' probe predicts ~157s, the pass was 127.9s);
  - a pass above BOTH bracketing predictions makes the ENGINE the
    suspect and reopens the adjudication.

Usage:
  python3 tools/fit_probe_model.py                 # fit + residual table
  python3 tools/fit_probe_model.py TINY BIG SHA    # predict one pass
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "probe_fit_r13.jsonl")


def load():
    rows = [json.loads(l) for l in open(DATA)]
    X = [[1.0, r["tiny_job_ms_p50"], r["big_job_s"], 1e5 / r["sha256_mb_s"]]
         for r in rows]
    y = [r["total_s"] for r in rows]
    names = [r["pass_id"] for r in rows]
    return X, y, names


def lstsq(X, y):
    # normal equations via pure python (4x4) - keeps the tool dependency-free
    import itertools
    n, p = len(X), len(X[0])
    A = [[sum(X[i][a] * X[i][b] for i in range(n)) for b in range(p)] for a in range(p)]
    b = [sum(X[i][a] * y[i] for i in range(n)) for a in range(p)]
    # gaussian elimination with partial pivoting
    M = [row[:] + [b[i]] for i, row in enumerate(A)]
    for col in range(p):
        piv = max(range(col, p), key=lambda r: abs(M[r][col]))
        M[col], M[piv] = M[piv], M[col]
        for r in range(p):
            if r != col and M[r][col]:
                f = M[r][col] / M[col][col]
                M[r] = [M[r][k] - f * M[col][k] for k in range(p + 1)]
    return [M[i][p] / M[i][i] for i in range(p)]


def main():
    X, y, names = load()
    coef = lstsq(X, y)
    if len(sys.argv) == 4:
        tiny, big, sha = map(float, sys.argv[1:4])
        pred = coef[0] + coef[1] * tiny + coef[2] * big + coef[3] * 1e5 / sha
        resid = [y[i] - sum(c * x for c, x in zip(coef, X[i])) for i in range(len(y))]
        rmse = (sum(r * r for r in resid) / len(resid)) ** 0.5
        print(json.dumps({"pred_total_s": round(pred, 2),
                          "host_adjudicated_below_s": round(pred + 2 * rmse, 2)}))
        return 0
    pred = [sum(c * x for c, x in zip(coef, X[i])) for i in range(len(y))]
    resid = [y[i] - pred[i] for i in range(len(y))]
    rmse = (sum(r * r for r in resid) / len(resid)) ** 0.5
    ybar = sum(y) / len(y)
    r2 = 1 - sum(r * r for r in resid) / sum((v - ybar) ** 2 for v in y)
    print(f"total_s = {coef[0]:.2f} + {coef[1]:.4f}*tiny_p50_ms "
          f"+ {coef[2]:.2f}*big_job_s + {coef[3]:.4f}*(1e5/sha256_mb_s)")
    print(f"n={len(y)}  RMSE={rmse:.2f}s  R2={r2:.3f}  "
          f"host-adjudication bound = pred + {2 * rmse:.1f}s")
    for i in range(len(y)):
        print(f"  {names[i]:18s} actual={y[i]:7.2f} pred={pred[i]:7.2f} "
              f"resid={resid[i]:+6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
