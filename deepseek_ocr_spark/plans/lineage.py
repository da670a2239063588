"""Idempotent resumable runs with per-partition lineage + metrics
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY §4.3).

Layout under a run directory:
    out/spans/      extracted span table, appended one slice per commit
    out/metrics/    per-slice aggregate metrics (docs, spans, failures,
                    char yield) — the extraction-metrics table
    out/lineage/    one row per committed slice: (slice_id, n_docs,
                    committed_at_ns monotonic id) — the resume log

Resume protocol: a restarted run lists committed slice_ids from
lineage/, left-anti-joins them against the input's slice assignment,
and processes only the remainder. A slice's spans+metrics+lineage rows
are written in that order, lineage last — a crash between writes leaves
at worst an uncommitted slice whose spans rows are rewritten (then
deduplicated by slice overwrite semantics: each slice writes to its own
subdirectory, so a rerun overwrites rather than duplicates).

At 10^12 docs the same protocol rides on Iceberg: slice commit =
snapshot append with the lineage row in snapshot summary metadata, and
resume = anti-join against the lineage table read at the latest
snapshot. Parquet subdirectories stand in for snapshots in this sandbox
(no Iceberg runtime jar); the orchestration code is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.spans_pipeline import extract_spans

N_SLICES = 16


def assign_slices(docs: DataFrame, n_slices: int = N_SLICES) -> DataFrame:
    """Deterministic slice per doc (content-hash based — stable across
    restarts and partitionings)."""
    return docs.withColumn(
        "slice_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_slices)).cast("int")
    )


def committed_slices(spark: SparkSession, out_dir: str) -> set[int]:
    path = f"{out_dir}/lineage"
    if not os.path.exists(path):
        return set()
    try:
        return {
            r["slice_id"]
            for r in spark.read.parquet(path).select("slice_id").distinct().collect()
        }
    except Exception:
        return set()


def run_extract_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_slices: int = N_SLICES,
    fail_after_slices: int | None = None,
) -> dict:
    """Extract spans for every doc not yet committed; returns run stats.

    fail_after_slices: test hook — simulate a crash after N slice
    commits (SURVEY §5 test plan (d): kill between snapshots ⇒ rerun
    completes idempotently).
    """
    sliced = assign_slices(docs, n_slices)
    done = committed_slices(spark, out_dir)
    todo = sorted(set(range(n_slices)) - done)
    committed = 0
    for sid in todo:
        if fail_after_slices is not None and committed >= fail_after_slices:
            break
        part = sliced.filter(F.col("slice_id") == sid).drop("slice_id")
        out = extract_spans(part)
        out.write.mode("overwrite").parquet(f"{out_dir}/spans/slice={sid}")
        metrics = out.agg(
            F.lit(sid).alias("slice_id"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("blocks_kept").cast("bigint").alias("blocks_kept"),
            F.sum("blocks_dropped").cast("bigint").alias("blocks_dropped"),
            F.sum("parse_failures").cast("bigint").alias("parse_failures"),
            F.sum("media_spans").cast("bigint").alias("media_spans"),
            F.sum("char_yield").cast("bigint").alias("char_yield"),
        )
        metrics.write.mode("overwrite").parquet(f"{out_dir}/metrics/slice={sid}")
        # lineage row LAST — the commit point
        metrics.select(
            "slice_id", "n_docs", F.monotonically_increasing_id().alias("commit_seq")
        ).write.mode("overwrite").parquet(f"{out_dir}/lineage/slice={sid}")
        committed += 1
    return {
        "slices_total": n_slices,
        "slices_previously_done": len(done),
        "slices_committed_now": committed,
        "resumed": len(done) > 0,
    }


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/spans")
