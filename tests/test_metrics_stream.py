"""Streaming windowed metrics: watermark + event-time windows over the
document stream; result must equal the batch rollup on the same data,
and late-beyond-watermark rows must be dropped from closed windows."""

import shutil
import tempfile

from pyspark.sql import functions as F

from deepseek_ocr_spark import corpus
from deepseek_ocr_spark.streaming.metrics_stream import (
    docs_with_event_time,
    windowed_host_metrics,
)


def _timestamped_docs(spark, n=80):
    docs = corpus.spark_documents(spark, seed=13, n_docs=n)
    # deterministic event times spread over ~90 minutes
    return docs_with_event_time(
        docs.withColumn(
            "ingest_ts",
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(mins=F.pmod(F.xxhash64("doc_id"), F.lit(90)).cast("int")),
        )
    )


def test_streaming_windows_equal_batch(spark):
    in_dir = tempfile.mkdtemp(prefix="mw_in_")
    ckpt = tempfile.mkdtemp(prefix="mw_ck_")
    try:
        batch_docs = _timestamped_docs(spark)
        batch_docs.write.mode("overwrite").parquet(in_dir)
        expected = {
            (str(r["win"]["start"]), r["host"]): (
                r["docs"],
                r["blocks_kept"],
                r["parse_failures"],
            )
            for r in windowed_host_metrics(
                spark.read.parquet(in_dir)
            ).collect()
        }
        stream = (
            spark.readStream.schema(spark.read.parquet(in_dir).schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(in_dir)
        )
        q = (
            windowed_host_metrics(stream)
            .writeStream.format("memory")
            .queryName("win_metrics")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (str(r["win"]["start"]), r["host"]): (
                r["docs"],
                r["blocks_kept"],
                r["parse_failures"],
            )
            for r in spark.sql("SELECT * FROM win_metrics").collect()
        }
        assert got == expected and len(got) > 5
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
