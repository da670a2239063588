"""Production job compositions — what a user of the reference runs
instead of run_dpsk_ocr_pdf.py / run_dpsk_ocr_image.py /
run_dpsk_ocr_eval_batch.py.

Each job wires the full at-scale path: cost-tiered repartitioning →
extraction → sinks (spans parquet + markdown + metrics) with resumable
lineage. Entry points are also exposed as a CLI:

    spark-submit --py-files dist/deepseek_ocr_spark.zip run_extract.py \
        --input /data/documents --output /out --job spans [--resume]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.extraction import extract_pdf
from .operators.spans_pipeline import extract_spans
from .plans.coalesce import doc_cost, repartition_by_cost
from .plans.lineage import run_extract_resumable
from .sources.sinks import write_markdown_table


def run_spans_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    resume: bool = True,
    partitions: int | None = None,
) -> dict:
    """Flagship: interleaved documents parquet → extracted spans +
    metrics + lineage (resumable). The analogue of the reference's
    PDF pipeline operating on the span table shape."""
    docs = spark.read.parquet(input_path)
    if partitions:
        docs = repartition_by_cost(docs, doc_cost("spans"), partitions).drop("_tier")
    if resume:
        return run_extract_resumable(spark, docs, output_dir)
    out = extract_spans(docs)
    out.write.mode("overwrite").parquet(f"{output_dir}/spans")
    return {"resumed": False, "slices_committed_now": 1}


def run_pages_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    write_markdown: bool = True,
) -> DataFrame:
    """Raw model-output pages parquet → per-document clean markdown +
    interleaved spans + metrics (run_dpsk_ocr_pdf.py:286-329 analogue:
    .mmd sink + span table + per-doc metrics)."""
    pages = spark.read.parquet(input_path)
    docs = extract_pdf(pages)
    docs.write.mode("overwrite").parquet(f"{output_dir}/documents")
    if write_markdown:
        write_markdown_table(
            spark.read.parquet(f"{output_dir}/documents"), output_dir
        )
    (
        spark.read.parquet(f"{output_dir}/documents")
        .groupBy()
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.sum("pages_in").cast("bigint").alias("pages_in"),
            F.sum("pages_kept").cast("bigint").alias("pages_kept"),
            F.sum("parse_failures").cast("bigint").alias("parse_failures"),
            F.sum("blocks_dropped").cast("bigint").alias("blocks_dropped"),
            F.sum("media_spans").cast("bigint").alias("media_spans"),
            F.sum("char_yield").cast("bigint").alias("char_yield"),
        )
        .write.mode("overwrite")
        .parquet(f"{output_dir}/metrics")
    )
    return docs


def locate_job(
    spark: SparkSession, input_path: str, label: str
) -> DataFrame:
    """T6 'locate' task over the span table: spans whose kind matches,
    with document and offset (config.py prompt 'Locate <|ref|>x<|/ref|>')."""
    docs = spark.read.parquet(input_path)
    hits = F.filter("spans", lambda s: s["kind"] == label)
    return (
        docs.select("doc_id", F.explode(hits).alias("span"))
        .select(
            "doc_id",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.offset").alias("offset"),
        )
    )
