"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship interleaved-span extraction pipeline;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (registry lives in deepseek_ocr_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deepseek_ocr_spark import queries as _Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: interleaved span-table extraction (pipeline B) —
    media-ref resolution, boilerplate drop, grounding strip, normalize,
    repetition collapse — exploded to flat span rows."""
    return _Q.pipeline_b_extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query — all 50 registry entries,
    including the two flagship pipelines (composed from their stage
    CTEs in round 4; they are additionally validated byte-exactly vs
    the pure-Python reference oracle in tests/)."""
    return _Q.oracle_sql()
