#!/usr/bin/env python3
"""mapInPandas vs mapInArrow for the fused extraction stage (ROADMAP r8-a).

Runs the existing roundtrip_extract (pandas batches) against a
mapInArrow twin that builds pyarrow RecordBatches directly — same kernel,
same rows — interleaved best-of-N, then checks the two outputs are
row-identical (sorted by doc URL).

Usage: python3 scripts/arrow_experiment.py [--sf-dir DIR] [--cores 8]
                                           [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def roundtrip_extract_arrow(spark, sf_dir, fmt="pdf"):
    from pdfspark.pipeline import (EXTRACT_SCHEMA, _documents_repartitioned,
                                   _synth_page, _append_extract_row)

    docs = _documents_repartitioned(spark, sf_dir)

    def gen_extract(batches):
        import sys

        if REPO_ROOT not in sys.path:
            sys.path.insert(0, REPO_ROOT)
        import pyarrow as pa
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_schema

        from pdfspark.kernel.extract import extract_document
        from pdfspark.pipeline import _append_extract_row, _synth_page

        arrow_schema = to_arrow_schema(EXTRACT_SCHEMA)
        tc = TaskContext.get()
        part_id = tc.partitionId() if tc is not None else -1
        col_names = arrow_schema.names
        for b in batches:
            cols = {name: [] for name in col_names}
            for doc_id, text, lang in zip(b.column("doc_id").to_pylist(),
                                          b.column("text").to_pylist(),
                                          b.column("lang").to_pylist()):
                i = int(doc_id)
                url, buf = _synth_page(i, text, lang, fmt, 0)
                _append_extract_row(cols, url, buf, part_id,
                                    extract_document)
            yield pa.RecordBatch.from_pydict(
                {n: pa.array(cols[n], type=arrow_schema.field(n).type)
                 for n in col_names},
                schema=arrow_schema)

    return docs.mapInArrow(gen_extract, EXTRACT_SCHEMA)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pdfspark.pipeline import build_session, roundtrip_extract

    spark = build_session(cores=args.cores,
                          shuffle_partitions=args.cores * 2,
                          app="arrow-experiment")

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    pandas_df = roundtrip_extract(spark, args.sf_dir)
    arrow_df = roundtrip_extract_arrow(spark, args.sf_dir)
    run(pandas_df)  # warm both paths
    run(arrow_df)
    tp, ta = [], []
    for _ in range(args.reps):
        tp.append(run(pandas_df))
        ta.append(run(arrow_df))
    print(f"mapInPandas best={min(tp):.3f}s all={[round(t,3) for t in tp]}")
    print(f"mapInArrow  best={min(ta):.3f}s all={[round(t,3) for t in ta]}")

    # byte-identity: same rows from both bodies
    a = pandas_df.select("url", "text", "n_chars", "error").orderBy("url")
    b = arrow_df.select("url", "text", "n_chars", "error").orderBy("url")
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"row_diff={diff}")
    spark.stop()


if __name__ == "__main__":
    main()
