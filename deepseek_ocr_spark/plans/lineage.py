"""Idempotent resumable runs with per-partition lineage + metrics
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY §4.3).

Layout under a run directory (all three partitioned by slice_id):
    out/spans/      extracted span table, slice_id=N partition dirs
    out/metrics/    per-slice aggregate metrics (docs, spans, failures,
                    char yield) — the extraction-metrics table
    out/lineage/    one row per committed slice: (slice_id, n_docs,
                    commit_seq driver-side monotonic counter) — the
                    resume log

Resume protocol: a restarted run lists committed slice_ids from
lineage/, subtracts them from the slice universe, and processes only
the remainder — in one job per COMMIT GROUP over one scan each (dynamic
partition overwrite keeps committed partitions untouched; group size =
all pending by default, smaller for finer checkpoint granularity — see
run_extract_resumable). Spans, then metrics, then lineage are written
in that order, lineage last — a crash between writes leaves at worst
one uncommitted group whose spans partitions are rewritten on rerun
(overwrite, not duplicate).

At 10^12 docs the same protocol rides on Iceberg: slice commit =
snapshot append with the lineage row in snapshot summary metadata, and
resume = anti-join against the lineage table read at the latest
snapshot. Parquet subdirectories stand in for snapshots in this sandbox
(no Iceberg runtime jar); the orchestration code is identical.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
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


def fresh_read_error(e: AnalysisException) -> bool:
    """Classify a store/resume-log read failure: True means "nothing
    committed yet" — the dir is missing, or it exists but holds no
    committed parquet (crash between mkdir and the first commit: only
    _temporary/ inside, so there is no schema to infer). Anything else
    (corrupt footer, a table missing an expected column, IO error)
    means corruption and must PROPAGATE — treating it as "fresh" would
    silently rebuild/rescan over a damaged store. Single-sourced here
    because three callers (committed_slices, run_dedup_job's store
    reads, run_cluster_job) need the SAME fresh-vs-corrupt line; when
    they drifted, a crash before the first signature commit bricked
    the dedup store (every rerun re-raised UNABLE_TO_INFER_SCHEMA)
    while the lineage log correctly read the same state as fresh."""
    msg = str(e)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "UNABLE_TO_INFER_SCHEMA" in msg
    )


def committed_slices(spark: SparkSession, out_dir: str) -> set[int]:
    path = f"{out_dir}/lineage"
    try:
        return {
            r["slice_id"]
            for r in spark.read.parquet(path).select("slice_id").distinct().collect()
        }
    except AnalysisException as e:
        # Existence goes through spark.read, never os.path — the run dir
        # is a Hadoop-FS path (HDFS/S3 at scale); a driver-local exists()
        # check is always False there, which would silently disable
        # resume and rescan the whole input every run. Fresh-vs-corrupt
        # line: fresh_read_error (a lineage table missing slice_id
        # surfaces as a different error class and propagates).
        if fresh_read_error(e):
            return set()
        raise


def run_extract_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    n_slices: int = N_SLICES,
    fail_after_slices: int | None = None,
    commit_group_size: int | None = None,
    fail_after_groups: int | None = None,
) -> dict:
    """Extract spans for every doc not yet committed; returns run stats.

    Single-input-scan shape: a commit GROUP of pending slices is written
    by ONE job (``partitionBy("slice_id")`` under dynamic partition
    overwrite, so already-committed partitions are untouched and a
    crashed rerun overwrites rather than duplicates). Per-slice metrics
    are then aggregated from the *written output* (a scan of the small
    result, never a rescan of the input), and the group's lineage rows
    are written LAST — the commit point.

    Checkpoint granularity (ADVICE r2): ``commit_group_size=None``
    (default) runs ALL pending slices as one group — minimum scan cost,
    but a crash mid-run commits nothing. Smaller groups trade extra
    input scans (one per group, each pruned to the group's slices) for
    partial progress: a crash loses at most one group's work. At 10^12
    docs group ≈ a few hundred Iceberg partitions is the sweet spot;
    here the default suits the bench and the grouped path is
    crash-tested (tests/test_scale_layer.py).

    fail_after_slices: test hook — restrict this run to the first N
    pending slices (SURVEY §5 test plan (d)).
    fail_after_groups: test hook — raise after N group commits,
    simulating a mid-RUN kill with partial progress durably committed.
    """
    done = committed_slices(spark, out_dir)
    todo = sorted(set(range(n_slices)) - done)
    if fail_after_slices is not None:
        todo = todo[:fail_after_slices]
    gsize = commit_group_size or len(todo) or 1
    groups = [todo[i : i + gsize] for i in range(0, len(todo), gsize)]

    def _commit_group(group: list[int], seq_base: int) -> None:
        pending = assign_slices(docs, n_slices).filter(
            F.col("slice_id").isin([int(s) for s in group])
        )
        out = extract_spans(pending, passthrough=("slice_id",))
        out.write.mode("overwrite").partitionBy("slice_id").parquet(
            f"{out_dir}/spans"
        )
        # metrics from the written output — the input is scanned once
        # per group. Schema passed explicitly: a group whose slices
        # contain zero docs writes no part files, and schema inference
        # would throw instead of committing n_docs=0 lineage rows.
        # (Empty slices get a lineage row but no metrics row.)
        written = spark.read.schema(out.schema).parquet(
            f"{out_dir}/spans"
        ).filter(F.col("slice_id").isin([int(s) for s in group]))
        metrics = written.groupBy("slice_id").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("blocks_kept").cast("bigint").alias("blocks_kept"),
            F.sum("blocks_dropped").cast("bigint").alias("blocks_dropped"),
            F.sum("parse_failures").cast("bigint").alias("parse_failures"),
            F.sum("media_spans").cast("bigint").alias("media_spans"),
            F.sum("char_yield").cast("bigint").alias("char_yield"),
        )
        # evaluate the aggregation ONCE (bounded: ≤ |group| rows), then
        # write the metrics table from the collected rows — .write then
        # .collect() on the lazy plan would scan+aggregate the written
        # spans twice per group
        metrics_rows = metrics.collect()
        spark.createDataFrame(metrics_rows, metrics.schema).write.mode(
            "overwrite"
        ).partitionBy("slice_id").parquet(f"{out_dir}/metrics")
        # lineage rows LAST — the commit point. commit_seq is a
        # driver-side monotonic counter continuing from prior runs
        # (bounded collect: ≤ n_slices rows).
        n_by_slice = {r["slice_id"]: r["n_docs"] for r in metrics_rows}
        lineage_rows = [
            (int(sid), int(n_by_slice.get(sid, 0)), seq_base + i)
            for i, sid in enumerate(group)
        ]
        spark.createDataFrame(
            lineage_rows, "slice_id int, n_docs bigint, commit_seq bigint"
        ).write.mode("overwrite").partitionBy("slice_id").parquet(
            f"{out_dir}/lineage"
        )

    committed_now = 0
    if todo:
        prev_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            for gi, group in enumerate(groups):
                if fail_after_groups is not None and gi >= fail_after_groups:
                    raise RuntimeError(
                        "simulated crash between group commits "
                        f"({committed_now}/{len(todo)} slices committed)"
                    )
                _commit_group(group, seq_base=len(done) + committed_now)
                committed_now += len(group)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    return {
        "slices_total": n_slices,
        "slices_previously_done": len(done),
        "slices_committed_now": committed_now,
        "resumed": len(done) > 0,
    }


def read_result(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/spans")
