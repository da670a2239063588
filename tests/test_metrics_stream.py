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


def test_late_beyond_watermark_dropped_in_append_mode(spark):
    """The watermark must actually bound state and drop late rows: in
    append mode a window is emitted once the watermark passes its end,
    and a row arriving after that (event_time < watermark) must not
    reopen or recount it. complete-mode tests cannot see this — the
    watermark is inert there (code-review r3 finding)."""
    import os

    in_dir = tempfile.mkdtemp(prefix="mwl_in_")
    stage = tempfile.mkdtemp(prefix="mwl_st_")
    ckpt = tempfile.mkdtemp(prefix="mwl_ck_")

    def _stage(name, rows_ts, mtime):
        """One single-file micro-batch: docs 0..len-1 re-timestamped."""
        docs = corpus.spark_documents(spark, seed=13, n_docs=len(rows_ts))
        ts = F.array(*[F.to_timestamp(F.lit(t)) for t in rows_ts])
        idx = F.regexp_extract("doc_id", r"(\d+)$", 1).cast("int")
        staged = docs_with_event_time(
            docs.withColumn("ingest_ts", F.element_at(ts, idx + 1))
        )
        tmp = f"{stage}/{name}"
        staged.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = f"{in_dir}/{name}.parquet"
        shutil.copyfile(f"{tmp}/{part}", dst)
        os.utime(dst, (mtime, mtime))
        return staged

    try:
        # Spark 3.4+ splits the watermark: late-event FILTERING in batch
        # N uses the watermark of batch N-1, eviction uses batch N's
        # (verified empirically on 4.1: a late row one batch after the
        # advancer is still merged). So the late row must arrive two
        # batches after the advancer to be behind the filter watermark.
        schema = _stage(
            "b1",
            # two docs in window [00:00, 00:10) + one at 03:00 that
            # advances the watermark to 02:30 after this batch
            ["2026-01-01 00:05:00", "2026-01-01 00:08:00",
             "2026-01-01 03:00:00"],
            1_000_000_000,
        ).schema
        _stage("b2", ["2026-01-01 03:40:00"], 1_000_000_100)
        _stage(
            "b3",
            # late row back in [00:00, 00:10): the filter watermark is
            # now 02:30, the window is closed and emitted — drop it
            ["2026-01-01 00:09:00"],
            1_000_000_200,
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(in_dir)
        )
        q = (
            windowed_host_metrics(stream)
            .writeStream.format("memory")
            .queryName("win_metrics_late")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql("SELECT * FROM win_metrics_late").collect()
        first_win = [
            r for r in rows if str(r["win"]["start"]).startswith("2026-01-01 00:00")
        ]
        # the [00:00, 00:10) window was finalized with exactly the two
        # on-time docs; the late third doc did not reopen/recount it
        assert sum(r["docs"] for r in first_win) == 2, rows
        # and the drop is observable in the state-operator metrics
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
        )
        assert dropped == 1, [
            p["stateOperators"][0] for p in q.recentProgress
        ]
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


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
