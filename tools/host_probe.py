#!/usr/bin/env python3
"""Characterize HOST state for bench adjudication (driver-side tool).

The committed bench record is a per-query min because this host's
performance moves between (and within) rounds. Raw totals alone cannot
distinguish "the engine regressed" from "the host changed"; this probe
separates the two axes that matter for that call:

  - tiny_job_ms_*: latency of an empty Spark job (range(1).count()) —
    scheduler/driver round-trip cost. Many-small-job queries (k-means
    iterations, model caches, checkpoint chains) scale with THIS.
  - big_job_s: one CPU-bound whole-stage-codegen aggregate over 2e9
    rows on all cores — raw compute throughput. Scan-heavy queries
    scale with this.
  - openssl_sha256_mb_s: non-JVM single-core hardware throughput
    anchor (eliminates JVM/GC variance from the comparison).
  - cpu steal + PSI deltas over the probe window.

Round-12 calibration on this harness (PSI-quiet, steal <2%, three runs):
tiny_job_ms_min 56-66, tiny_job_ms_p50 85-90, big_job_s 0.88-0.96,
sha256 ~1260-1280 MB/s (the round-12 records printed ~1230-1250 under a
pre-round-13 unit slip that divided openssl's 1000-byte 'k' by 1024 —
multiply old prints by 1.024 to compare). The 60-90 ms empty-job cost is what inflated the
round-11/12 full-catalog passes to ~87 s vs the round-10-era ~64 s:
throughput held (big_job, sha256) while per-job latency blew up, so
many-small-job queries (k-means/PQ training, model caches) read ~2x
while single-big-scan queries read ~1.1x. A future round whose
full-catalog pass inflates while tiny-job latency inflates in step is
seeing host-state drift, not an engine regression.

Usage: python3 tools/host_probe.py   (prints one JSON line)
"""
import json
import re
import subprocess
import time


def cpu_counters():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice sys idle iowait irq softirq steal
    total = sum(int(x) for x in parts[1:9])
    steal = int(parts[8])
    with open("/proc/pressure/cpu") as f:
        psi = int(re.search(r"total=(\d+)", f.readline()).group(1))
    return total, steal, psi


def main():
    t_before = cpu_counters()
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "32")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(10):  # JIT/codegen warmup, not measured
        spark.range(1).count()
    lat = []
    for _ in range(100):
        t0 = time.perf_counter()
        spark.range(1).count()
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    t0 = time.perf_counter()
    spark.range(2_000_000_000).selectExpr("sum(id % 7)").collect()
    big = time.perf_counter() - t0
    spark.stop()

    sha = None
    try:
        out = subprocess.run(
            ["openssl", "speed", "-seconds", "1", "-bytes", "8192", "sha256"],
            capture_output=True, text=True, timeout=60).stdout + ""
        m = re.search(r"sha256\s.*?([\d.]+)k\s*$", out, re.M)
        if m:
            # openssl's 'k' is 1000 bytes, so MB/s (10^6) divides by 1000
            sha = float(m.group(1)) / 1000.0
    except Exception:
        pass

    t_after = cpu_counters()
    dt = t_after[0] - t_before[0]
    print(json.dumps({
        "tiny_job_ms_min": round(lat[0], 2),
        "tiny_job_ms_p50": round(lat[50], 2),
        "tiny_job_ms_p90": round(lat[90], 2),
        "big_job_s": round(big, 3),
        "openssl_sha256_mb_s": round(sha, 1) if sha else None,
        "steal_pct_window": round(100.0 * (t_after[1] - t_before[1]) / dt, 2) if dt else None,
        "psi_some_ms_window": (t_after[2] - t_before[2]) // 1000,
    }))


if __name__ == "__main__":
    main()
