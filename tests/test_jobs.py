"""Job-composition layer: resumable spans job, pages job sinks, locate
task — the user-facing equivalents of the reference's run scripts."""

import shutil
import tempfile

from deepseek_ocr_spark import corpus, jobs
from deepseek_ocr_spark.operators.spans_pipeline import extract_spans


def test_spans_job_resume_cycle(spark):
    in_dir = tempfile.mkdtemp(prefix="job_in_")
    out_dir = tempfile.mkdtemp(prefix="job_out_")
    try:
        corpus.spark_documents(spark, seed=9, n_docs=80).write.mode(
            "overwrite"
        ).parquet(in_dir)
        s1 = jobs.run_spans_job(spark, in_dir, out_dir, partitions=4)
        assert s1["slices_committed_now"] == 16
        s2 = jobs.run_spans_job(spark, in_dir, out_dir)
        assert s2["resumed"] and s2["slices_committed_now"] == 0
        got = {
            r["doc_id"]: r["blocks_kept"]
            for r in spark.read.parquet(f"{out_dir}/spans").collect()
        }
        direct = {
            r["doc_id"]: r["blocks_kept"]
            for r in extract_spans(spark.read.parquet(in_dir)).collect()
        }
        assert got == direct
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def test_pages_job_sinks(spark):
    in_dir = tempfile.mkdtemp(prefix="pj_in_")
    out_dir = tempfile.mkdtemp(prefix="pj_out_")
    try:
        corpus.spark_pages(spark, seed=9, n_docs=40).write.mode(
            "overwrite"
        ).parquet(in_dir)
        jobs.run_pages_job(spark, in_dir, out_dir)
        docs = spark.read.parquet(f"{out_dir}/documents")
        md = spark.read.parquet(f"{out_dir}/markdown")
        metrics = spark.read.parquet(f"{out_dir}/metrics").collect()[0]
        assert docs.count() == 40 and md.count() == 40
        assert metrics["docs"] == 40
        assert metrics["pages_kept"] <= metrics["pages_in"]
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)


def test_locate_job(spark):
    in_dir = tempfile.mkdtemp(prefix="loc_in_")
    try:
        corpus.spark_documents(spark, seed=9, n_docs=60).write.mode(
            "overwrite"
        ).parquet(in_dir)
        hits = jobs.locate_job(spark, in_dir, "title").collect()
        assert len(hits) > 0
        assert all(r["kind"] == "title" for r in hits)
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
