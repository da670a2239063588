"""Cross-micro-batch stateful dedup: duplicates arriving in LATER
micro-batches must be suppressed by state, not batch-local grouping."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from deepseek_ocr_spark import corpus
from deepseek_ocr_spark.streaming.stateful_dedup import (
    streaming_exact_dedup,
    streaming_exact_dedup_flat,
)


def test_cross_batch_dedup(spark):
    in_dir = tempfile.mkdtemp(prefix="sd_in_")
    ckpt = tempfile.mkdtemp(prefix="sd_ck_")
    try:
        docs = corpus.spark_documents(spark, seed=21, n_docs=40).cache()
        # batch file 1: originals; batch file 2: same content, new doc ids
        docs.coalesce(1).write.mode("overwrite").parquet(in_dir)
        dups = docs.select(
            F.concat(F.lit("dup-"), "doc_id").alias("doc_id"), "spans"
        )
        dups.coalesce(1).write.mode("append").parquet(in_dir)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)  # one file per micro-batch
            .parquet(in_dir)
        )
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.sql("SELECT * FROM dedup_out").collect()
        # 40 distinct contents; batch 1 announces each canonical doc,
        # batch 2 (the dup- copies) appends one cumulative-count update
        # row per digest — cross-batch suppression is observable
        assert len(out) == 80
        assert len({r["digest"] for r in out}) == 40
        # every row for a digest names the SAME canonical doc, and it is
        # never one of the dup- copies (they arrive strictly later)
        canon: dict[str, set] = {}
        for r in out:
            canon.setdefault(r["digest"], set()).add(r["doc_id"])
        assert all(len(v) == 1 for v in canon.values())
        assert all(not r["doc_id"].startswith("dup-") for r in out)
        # authoritative count = max per digest: exactly 1 suppressed copy
        latest: dict[str, int] = {}
        for r in out:
            latest[r["digest"]] = max(
                latest.get(r["digest"], 0), r["n_duplicates_suppressed"]
            )
        assert all(v == 1 for v in latest.values())
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_typed_ids_and_null_content(spark):
    """Review r5: the span variant must survive a BIGINT doc_id stream
    (cast to the StringType state/output schema like the flat variant)
    and NULL spans rows (digest as empty content, never a NULL digest
    into the non-nullable output field)."""
    in_dir = tempfile.mkdtemp(prefix="sd_typed_")
    ckpt = tempfile.mkdtemp(prefix="sd_typed_ck_")
    try:
        rows = spark.createDataFrame(
            [
                (1, [("text", "alpha")]),
                (2, [("text", "alpha")]),   # dup of 1
                (3, None),                   # NULL spans
                (4, []),                     # empty spans == NULL content
            ],
            "doc_id bigint, spans array<struct<kind string, text string>>",
        )
        rows.coalesce(1).write.mode("overwrite").parquet(in_dir)
        stream = spark.readStream.schema(rows.schema).parquet(in_dir)
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_typed")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = {r["digest"]: r for r in spark.sql("SELECT * FROM dedup_typed").collect()}
        # two contents: "alpha" and empty; NULL and [] share the empty digest
        assert len(out) == 2
        assert {(r["doc_id"], r["n_duplicates_suppressed"]) for r in out.values()} == {
            ("1", 1),  # doc 2 suppressed as an alpha dup
            ("3", 1),  # doc 4's [] collapses onto doc 3's NULL digest
        }
        assert all(r["digest"] is not None for r in out.values())
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_null_doc_id_raises(spark):
    """Review r5: a NULL id would reach the pandas state fn and abort
    the query opaquely (min() over all-NULL -> NaN vs the non-nullable
    output schema); the mixing.py convention is to RAISE with a
    message instead."""
    in_dir = tempfile.mkdtemp(prefix="sd_nullid_")
    ckpt = tempfile.mkdtemp(prefix="sd_nullid_ck_")
    try:
        rows = spark.createDataFrame(
            [("1", "alpha"), (None, "beta")], "doc_id string, text string"
        )
        rows.coalesce(1).write.mode("overwrite").parquet(in_dir)
        stream = spark.readStream.schema(rows.schema).parquet(in_dir)
        q = (
            streaming_exact_dedup_flat(stream)
            .writeStream.format("memory")
            .queryName("dedup_nullid")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(Exception, match="NULL doc_id"):
            q.awaitTermination()
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
