"""Structured Streaming front-end for the extraction engine (SURVEY
§1.2 streams / §2.3 N8 analogue: the reference streams token deltas per
document; our unit of streaming is the document row).

Because extract_spans is a ZERO-SHUFFLE stateless projection
(spans_pipeline.py), the exact same DataFrame program runs unchanged
under readStream → writeStream: no watermark, no state store, no
output-mode constraints (append). Micro-batches of newly-landed
documents flow through the identical Catalyst plan the batch engine
uses — one code path, two execution modes.

Late data cannot exist (each document is independent); exactly-once is
the file-sink's atomic-commit-log guarantee (the Iceberg streaming sink
at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.spans_pipeline import extract_spans
from ..schema import DOCUMENTS_SCHEMA


def stream_documents(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming source over a landing directory of documents parquet."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_extract(docs_stream: DataFrame) -> DataFrame:
    """The flagship pipeline, streaming: identical plan to batch."""
    return extract_spans(docs_stream)


def run_available_now(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """Drain everything currently in input_dir through the streaming
    engine (Trigger.AvailableNow), then stop — the batch-equivalence
    harness used by tests and the resume story for incremental loads."""
    q = (
        stream_extract(stream_documents(spark, input_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
