#!/usr/bin/env python3
"""Interleaved A/B: single-buffer percentile() vs exact-rank two-pass.
Old and new alternate in ONE session (CLAUDE.md r9 protocol), noop sink,
min of N reported."""
from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

from pyspark.sql import functions as F  # noqa: E402
from proto_percentiles import new_impl_raw, old_impl_raw  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def rounded(df):
    return df.select(
        F.round("p50_raw", 2).cast("double").alias("p50"),
        F.round("p95_raw", 2).cast("double").alias("p95"),
        F.round("lo_raw", 2).cast("double").alias("lo"),
        F.round("hi_raw", 2).cast("double").alias("hi"))


def main() -> None:
    from pdfspark.pipeline import build_session

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = build_session(cores=CPUS, shuffle_partitions=CPUS,
                          app="pct-ab")
    times = {"old": [], "new": []}
    try:
        # warm both once
        for tag, fn in (("old", old_impl_raw), ("new", new_impl_raw)):
            rounded(fn(spark, SF_DIR)).write.format("noop") \
                .mode("overwrite").save()
        for i in range(reps):
            for tag, fn in (("old", old_impl_raw), ("new", new_impl_raw)):
                spark.sparkContext.setJobDescription(f"pct-{tag}-{i}")
                t0 = time.perf_counter()
                rounded(fn(spark, SF_DIR)).write.format("noop") \
                    .mode("overwrite").save()
                times[tag].append(round(time.perf_counter() - t0, 3))
    finally:
        spark.stop()
    print(json.dumps({
        "sf_dir": SF_DIR, "cores": CPUS,
        "old_min": min(times["old"]), "new_min": min(times["new"]),
        "old": times["old"], "new": times["new"]}))


if __name__ == "__main__":
    main()
