"""Streaming extraction metrics: event-time windowed aggregation with a
watermark over the document arrival stream.

The reference has no stateful streaming semantics (each document is
independent; SURVEY §2.7 'streaming-only: none required') — this is the
engine-side addition a production ingest needs: per-host extraction
metrics (docs, spans kept/dropped, parse failures) rolled up in
10-minute event-time windows, tolerating late arrivals up to the
watermark. State is bounded: |hosts| × |open windows| rows.

Plan shape: the zero-shuffle extraction runs inside the micro-batch
(stateless map), the only stateful operator is the windowed aggregation
— one shuffle keyed on (window, host), exactly like the batch metrics
rollup, plus the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.spans_pipeline import extract_spans


def docs_with_event_time(docs: DataFrame, ts_col: str = "ingest_ts") -> DataFrame:
    """Input adapter: documents stream carrying an ingest timestamp.

    Host = second hyphen component of doc_id (the corpus convention).
    try_element_at, not [1]: under ANSI mode (on by default, Spark 4) a
    hyphen-free doc_id would make the array index THROW and kill the
    streaming query; hostless docs group under their own id instead."""
    return docs.withColumn(
        "host",
        F.coalesce(
            F.try_element_at(F.split("doc_id", "-"), F.lit(2)),
            F.col("doc_id"),
        ),
    ).withColumn("event_time", F.col(ts_col))


def windowed_host_metrics(
    doc_stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-host, per-event-time-window extraction metrics with late-data
    tolerance = watermark. Works identically on batch DataFrames (the
    watermark is a no-op there), which is how the test oracles it."""
    extracted = extract_spans(doc_stream, passthrough=("host", "event_time"))
    if extracted.isStreaming:
        extracted = extracted.withWatermark("event_time", watermark)
    return extracted.groupBy(
        F.window("event_time", window).alias("win"), "host"
    ).agg(
        F.count("*").cast("bigint").alias("docs"),
        F.sum("blocks_kept").cast("bigint").alias("blocks_kept"),
        F.sum("blocks_dropped").cast("bigint").alias("blocks_dropped"),
        F.sum("parse_failures").cast("bigint").alias("parse_failures"),
        F.sum("char_yield").cast("bigint").alias("char_yield"),
    )
