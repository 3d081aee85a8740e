#!/usr/bin/env python3
"""Measured AQE skew-join evidence (ROADMAP r8-d).

Perf experiment ONLY — not an oracle input.  Builds a deliberately
skewed join from sf0.1 lineitem explode-scaled ~10x (≈6M rows): half
the fact rows collapse onto one hot key, then join a distinct-key dim
side.  Runs the identical query with AQE skew-join OFF and ON in the
same session and reports wall-clock plus the executed-plan skew-split
markers, upgrading the plan-test-only skew story with runtime proof.

Thresholds are scaled to the sandbox (1 MB skewed-partition threshold,
factor 2, 1 MB advisory target) so a ~70 MB hot partition among ~2 MB
siblings is over-threshold the way a multi-GB hot partition is at
production defaults (256 MB, factor 5); broadcast is disabled because at 100 TB
neither side of the modeled join fits an executor.

Usage: python3 scripts/skew_evidence.py [--cores 16] [--scale 10]
"""

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
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--scale", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdfspark.pipeline import build_session

    spark = build_session(
        cores=args.cores, shuffle_partitions=args.cores * 2,
        app="skew-evidence",
        extra_conf={
            # model the 100-TB shape: both join sides too big to broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "1m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.adaptive.coalescePartitions.enabled": "true",
        },
    )
    try:
        import tempfile

        li = spark.read.parquet(os.path.join(args.sf_dir,
                                             "lineitem.parquet"))
        tmp = tempfile.mkdtemp(prefix="skew_evidence_")
        # explode-scale and skew: half the rows land on hot key 0.
        # Both sides are MATERIALIZED as parquet tables, not persist()ed:
        # a cached distinct is already hash-partitioned on the join key,
        # its side joins via TableCacheQueryStage with no Exchange, and
        # OptimizeSkewedJoin (which pattern-matches two shuffle stages)
        # silently never fires — the on-disk-tables shape is also the
        # honest 100-TB model.
        (li.select("l_orderkey", "l_extendedprice", "l_quantity")
         .withColumn("rep", F.explode(
             F.array_repeat(F.lit(1), args.scale)))
         .withColumn(
             "skew_key",
             F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
             .otherwise(F.col("l_orderkey")))
         .drop("rep")
         # many map tasks, NOT an optimization nicety: AQE splits a
         # skewed reduce partition at map-output-block boundaries, so a
         # fact written from the testdata's 1-task scan (single row
         # group, BASELINE.md) yields ONE block per reduce partition and
         # the skew rule silently has nothing to split.  Production
         # fact tables have thousands of input splits; model that.
         .repartition(args.cores * 2)
         .write.parquet(f"{tmp}/fact"))
        (li.select(F.col("l_orderkey").alias("skew_key")).distinct()
         .union(spark.range(1).select(F.lit(0).alias("skew_key")))
         .distinct()
         .withColumn("dim_payload", F.col("skew_key") * 7)
         .write.parquet(f"{tmp}/dim"))
        fact = spark.read.parquet(f"{tmp}/fact")
        dim = spark.read.parquet(f"{tmp}/dim")

        def run() -> tuple:
            # the join must be terminal: a same-key aggregation after it
            # would pin the join's output partitioning and AQE would skip
            # the skew split rather than add a shuffle.  Both inputs are
            # persisted above — OptimizeSkewedJoin pattern-matches
            # SMJ(Sort(ShuffleStage), Sort(ShuffleStage)) only, so a
            # leftover aggregate between the dim shuffle and its sort
            # (e.g. an unpersisted distinct) silently disables the split.
            joined = fact.join(dim, "skew_key").select(
                "skew_key",
                (F.col("l_extendedprice") + F.col("dim_payload"))
                .alias("v"))
            t0 = time.perf_counter()
            joined.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            # final adaptive plan of the execution just finished — the
            # DataFrame's own queryExecution is a fresh unexecuted plan
            # and never carries runtime skew markers
            desc = (spark._jsparkSession.sharedState().statusStore()
                    .executionsList().last().physicalPlanDescription())
            marks = sum(1 for line in desc.splitlines()
                        if "Arguments:" in line and "skewed" in line)
            return dt, marks

        results = {}
        for mode, flag in (("skew_off", "false"), ("skew_on", "true"),
                           ("skew_off2", "false"), ("skew_on2", "true")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
            best, marks = min(
                (run() for _ in range(args.reps)), key=lambda t: t[0])
            results[mode] = {"sec": round(best, 3), "skew_marks": marks}
        n = fact.count()
        print(json.dumps({
            "rows": n, "cores": args.cores,
            "hot_key_fraction": round(
                fact.filter("skew_key = 0").count() / n, 3),
            **results,
        }))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
