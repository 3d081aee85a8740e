#!/usr/bin/env python3
"""Extraction-only throughput at one core count over a materialized pages
parquet (the north-rule job shape: read pages table → kernel → sink)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=None,
                    help="arrow maxRecordsPerBatch override")
    ap.add_argument("--resalt", action="store_true",
                    help="force the salt shuffle (default: trust input "
                    "partitioning, the zero-shuffle fast path)")
    args = ap.parse_args()

    from pdfspark.pipeline import build_session, extract_pages

    extra = {}
    if args.batch:
        extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(args.batch)
    spark = build_session(cores=args.cores, shuffle_partitions=args.cores * 2,
                          app=f"extract-bench-{args.cores}", extra_conf=extra)
    try:
        pages = spark.read.parquet(args.pages)
        n = pages.count()

        def one() -> float:
            t0 = time.perf_counter()
            extract_pages(
                pages, nsalt=args.cores * 2, resalt=args.resalt
            ).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        one()  # warmup
        times = sorted(one() for _ in range(args.runs))
        med = times[len(times) // 2]
        print(json.dumps({
            "cores": args.cores, "docs": n, "seconds": round(med, 3),
            "all_runs": [round(t, 3) for t in times],
            "docs_per_sec": round(n / med, 1),
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
