"""PySpark-native document-extraction engine (see README.md).

Quick start:

    from deepseek_ocr_spark.session import get_spark
    from deepseek_ocr_spark.jobs import run_spans_job

    spark = get_spark()
    run_spans_job(spark, "/data/documents", "/out")
"""

from . import config  # noqa: F401  (validates presets at import)

__all__ = [
    "config",
    "corpus",
    "jobs",
    "oracle",
    "queries",
    "schema",
    "session",
]
