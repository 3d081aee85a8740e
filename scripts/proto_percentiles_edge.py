#!/usr/bin/env python3
"""Edge-case harness for the exact-rank percentile: duplicates, integral
positions, N=1/2, equal neighbours — new pipeline vs percentile()."""
from __future__ import annotations

import os
import sys
import tempfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from proto_percentiles import new_impl_raw, old_impl_raw  # noqa: E402


def main() -> None:
    sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))
    from pdfspark.pipeline import build_session
    import pyarrow as pa
    import pyarrow.parquet as pq
    import random

    spark = build_session(cores=8, shuffle_partitions=16, app="proto-pct-edge")
    rng = random.Random(7)
    cases = {
        "n1": [42.0],
        "n2": [1.0, 2.0],
        "n21_integral": [float(i) for i in range(21)],
        "all_equal": [5.5] * 100,
        "dups_heavy": [float(rng.choice([1, 2, 2, 2, 3])) for _ in range(997)],
        "two_vals": [0.1] * 50 + [0.3] * 50,
        "rand_money": [round(rng.uniform(1, 500000), 2) for _ in range(12345)],
        "neg_and_pos": [rng.uniform(-1e6, 1e6) for _ in range(333)],
    }
    ok = True
    try:
        for name, vals in cases.items():
            with tempfile.TemporaryDirectory() as d:
                pq.write_table(
                    pa.table({"o_totalprice": pa.array(vals, pa.float64())}),
                    os.path.join(d, "orders.parquet"))
                old = old_impl_raw(spark, d).collect()[0]
                new = new_impl_raw(spark, d).collect()[0]
                same = all(
                    old[k] == new[k]
                    and (old[k] is None or old[k].hex() == new[k].hex())
                    for k in ("p50_raw", "p95_raw", "lo_raw", "hi_raw"))
                ok = ok and same
                print(name, "bit-identical:", same,
                      dict(old.asDict()) if not same else "",
                      dict(new.asDict()) if not same else "")
    finally:
        spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
