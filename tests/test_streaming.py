"""Structured Streaming: the kernel over a file-source stream with
checkpointed exactly-once sink + incremental resume."""

import os

from pdfspark.corpus import all_cases
from pdfspark.pipeline import pages_from_fixtures
from pdfspark.streaming import run_stream_once


def test_stream_extracts_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_from_fixtures(spark)
    pages.write.mode("overwrite").parquet(in_dir)
    run_stream_once(spark, in_dir, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    n_pdf = sum(1 for c in all_cases() if c.pdf.startswith(b"%PDF-"))
    assert got.count() == n_pdf
    texts = {r.url: r.text for r in got.collect()}
    for c in all_cases():
        if c.pdf.startswith(b"%PDF-"):
            url = f"https://fixture.test/{c.case_id}/000000.pdf"
            assert texts[url] == c.expected_text, c.case_id

    # add a second batch of files → only the new rows are processed
    pages_from_fixtures(spark, copies=2).filter(
        "url LIKE '%/000001.pdf'"
    ).write.mode("append").parquet(in_dir)
    run_stream_once(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 2 * n_pdf
    assert got2.select("url").distinct().count() == 2 * n_pdf
