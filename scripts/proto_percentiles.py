#!/usr/bin/env python3
"""Prototype/evidence harness: exact-rank two-pass percentile vs the
single-buffer percentile() aggregate. Compares FULL-PRECISION raw
values (pre-ROUND) and the rounded outputs at every SF, plus the
DuckDB oracle.

The CANONICAL implementation lives in pdfspark/queries.py
(_percentiles_exact_rank) and is pinned by
tests/test_plans.py::test_percentiles_exact_rank_branch_is_conditional_and_identical;
this copy exists only so the old-vs-new A/B (proto_percentiles_ab.py)
and the edge harness (proto_percentiles_edge.py) can construct both
variants side by side."""
from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import Window, functions as F


def new_impl_raw(spark, sf_dir):
    """Exact-rank percentiles; returns raw (unrounded) + rounded cols."""
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .createOrReplaceTempView("orders")
    v = (spark.table("orders")
         .select(F.col("o_totalprice").alias("x"))
         .where(F.col("x").isNotNull()))
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = v.repartitionByRange(nparts, "x").withColumn(
        "pid", F.spark_partition_id())
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
    woff = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("c").over(woff), F.lit(0)))
    meta = (v.agg(F.count("x").alias("n"),
                  F.min("x").alias("lo_raw"),
                  F.max("x").alias("hi_raw"))
            .withColumn("pos50",
                        (F.col("n") - F.lit(1)).cast("double") * F.lit(0.5))
            .withColumn("pos95",
                        (F.col("n") - F.lit(1)).cast("double") * F.lit(0.95)))
    tgt = meta.select(
        "n", "lo_raw", "hi_raw", "pos50", "pos95",
        F.floor("pos50").alias("l50"), F.ceil("pos50").alias("h50"),
        F.floor("pos95").alias("l95"), F.ceil("pos95").alias("h95"))
    needed = F.array("l50", "h50", "l95", "h95")
    sel_parts = (offsets.join(F.broadcast(tgt))
                 .where(F.exists(
                     needed,
                     lambda k: (k >= F.col("off"))
                     & (k < F.col("off") + F.col("c"))))
                 .select("pid", "off"))
    w = Window.partitionBy("pid").orderBy("x")
    gi = (ranged.join(F.broadcast(sel_parts), "pid")
          .withColumn("rn", F.row_number().over(w))
          .withColumn("gi", F.col("off") + F.col("rn") - 1))
    hits = gi.join(F.broadcast(tgt)).where(
        (F.col("gi") == F.col("l50")) | (F.col("gi") == F.col("h50"))
        | (F.col("gi") == F.col("l95")) | (F.col("gi") == F.col("h95")))
    vals = hits.agg(
        F.min(F.when(F.col("gi") == F.col("l50"), F.col("x"))).alias("v50l"),
        F.min(F.when(F.col("gi") == F.col("h50"), F.col("x"))).alias("v50h"),
        F.min(F.when(F.col("gi") == F.col("l95"), F.col("x"))).alias("v95l"),
        F.min(F.when(F.col("gi") == F.col("h95"), F.col("x"))).alias("v95h"))

    def interp(pos, lo, hi, vl, vh):
        # mirrors Percentile.getPercentile: integral position and
        # equal-neighbour fast paths return the lower key unmodified.
        return (F.when(F.col(hi) == F.col(lo), F.col(vl))
                .when(F.col(vl) == F.col(vh), F.col(vl))
                .otherwise(
                    (F.col(hi) - F.col(pos)) * F.col(vl)
                    + (F.col(pos) - F.col(lo)) * F.col(vh)))

    return vals.join(F.broadcast(tgt)).select(
        interp("pos50", "l50", "h50", "v50l", "v50h").alias("p50_raw"),
        interp("pos95", "l95", "h95", "v95l", "v95h").alias("p95_raw"),
        F.col("lo_raw"), F.col("hi_raw"))


def old_impl_raw(spark, sf_dir):
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT percentile(o_totalprice, 0.5) AS p50_raw,"
        " percentile(o_totalprice, 0.95) AS p95_raw,"
        " MIN(o_totalprice) AS lo_raw, MAX(o_totalprice) AS hi_raw"
        " FROM orders")


def main() -> None:
    from pdfspark.pipeline import build_session

    spark = build_session(cores=8, shuffle_partitions=16, app="proto-pct")
    import duckdb
    ok = True
    try:
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            sf_dir = f"/root/testdata/{sf}"
            old = old_impl_raw(spark, sf_dir).collect()[0]
            new = new_impl_raw(spark, sf_dir).collect()[0]
            rows = []
            for k in ("p50_raw", "p95_raw", "lo_raw", "hi_raw"):
                o, n = old[k], new[k]
                same = (o == n) and (
                    o is None or o.hex() == n.hex())
                rows.append((k, o, n, same))
                ok = ok and same
            duck = duckdb.sql(
                "SELECT quantile_cont(o_totalprice, 0.5),"
                " quantile_cont(o_totalprice, 0.95)"
                f" FROM '{sf_dir}/orders.parquet'").fetchone()
            print(sf, "bit-identical:" ,
                  all(r[3] for r in rows), rows, "duck:", duck)
    finally:
        spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
