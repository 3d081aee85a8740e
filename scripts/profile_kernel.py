#!/usr/bin/env python3
"""cProfile the fused synth+extract hot loop, no Spark (ROADMAP r8-b).

Mirrors pipeline.roundtrip_extract's per-row work: _synth_page(i, text,
lang, fmt, 0) + extract_document(buf), over the driver's
documents.parquet.  Single process so cProfile sees the real kernel
self-time rather than Arrow/executor plumbing.

Usage: python3 scripts/profile_kernel.py [--sf-dir DIR] [--limit N]
                                         [--fmt pdf] [--sort tottime]
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=1000)
    ap.add_argument("--fmt", default="pdf")
    ap.add_argument("--sort", default="tottime")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--no-profile", action="store_true",
                    help="plain timing only (for quick before/after)")
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from pdfspark.pipeline import _synth_page
    from pdfspark.kernel.extract import extract_document

    tbl = pq.read_table(os.path.join(args.sf_dir, "documents.parquet"),
                        columns=["doc_id", "text", "lang"])
    rows = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist(),
                    tbl["lang"].to_pylist()))
    if args.limit and len(rows) < args.limit:
        # repeat the corpus to reach the requested doc count
        k = (args.limit + len(rows) - 1) // len(rows)
        rows = (rows * k)[:args.limit]
    elif args.limit:
        rows = rows[:args.limit]

    def work() -> int:
        n_ok = 0
        for doc_id, text, lang in rows:
            _, buf = _synth_page(int(doc_id), text, lang, args.fmt, 0)
            res = extract_document(buf)
            if not res.error:
                n_ok += 1
        return n_ok

    work()  # warm imports, caches
    t0 = time.perf_counter()
    if args.no_profile:
        n_ok = work()
        dt = time.perf_counter() - t0
    else:
        prof = cProfile.Profile()
        prof.enable()
        n_ok = work()
        prof.disable()
        dt = time.perf_counter() - t0
        stats = pstats.Stats(prof)
        stats.sort_stats(args.sort).print_stats(args.top)
    print(f"docs={len(rows)} ok={n_ok} wall={dt:.3f}s "
          f"docs/s={len(rows) / dt:.1f}")


if __name__ == "__main__":
    main()
