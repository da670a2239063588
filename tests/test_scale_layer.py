"""Scale-layer tests: salted aggregation equivalence, cost-tiered
repartitioning, resumable lineage (SURVEY §5 test plan (d)), and
streaming/batch equivalence of the flagship pipeline."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark import corpus
from deepseek_ocr_spark.operators.spans_pipeline import extract_spans
from deepseek_ocr_spark.plans.coalesce import doc_cost, repartition_by_cost
from deepseek_ocr_spark.plans.lineage import (
    read_result,
    run_extract_resumable,
)
from deepseek_ocr_spark.plans.salting import salted_sum_count


@pytest.fixture(scope="module")
def docs(spark):
    return corpus.spark_documents(spark, seed=42, n_docs=200).cache()


def test_salted_agg_equals_plain(spark, docs):
    """Two-phase salted aggregation must be semantics-preserving over
    the Zipf-skewed host key."""
    hosted = docs.withColumn("host", F.split("doc_id", "-")[1]).withColumn(
        "n_spans", F.size("spans").cast("long")
    )
    salted = {
        (r["host"], r["n"], r["total_spans"])
        for r in salted_sum_count(
            hosted,
            keys=["host"],
            sums={"total_spans": F.col("n_spans")},
            salt_cols=["doc_id"],
        ).collect()
    }
    plain = {
        (r["host"], r["n"], r["total_spans"])
        for r in hosted.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("n_spans").alias("total_spans"),
        )
        .collect()
    }
    assert salted == plain


def test_cost_tier_repartition_preserves_rows(spark, docs):
    from deepseek_ocr_spark.plans.coalesce import cost_tier

    out = repartition_by_cost(docs, doc_cost("spans"), partitions=8)
    assert out.count() == docs.count()
    # the internal helper column must not leak into the caller's schema
    assert out.columns == docs.columns
    # tiers are coarse: a handful of distinct values
    n_tiers = (
        docs.select(cost_tier(doc_cost("spans")).alias("tier"))
        .distinct()
        .count()
    )
    assert 1 <= n_tiers <= 16
    # extraction result unaffected by the repartitioning
    a = {r["doc_id"]: r["blocks_kept"] for r in extract_spans(docs).collect()}
    b = {r["doc_id"]: r["blocks_kept"] for r in extract_spans(out).collect()}
    assert a == b


def test_resume_after_simulated_crash(spark, docs):
    out_dir = tempfile.mkdtemp(prefix="lineage_")
    try:
        # first run dies after committing 5 of 16 slices
        r1 = run_extract_resumable(spark, docs, out_dir, fail_after_slices=5)
        assert r1["slices_committed_now"] == 5
        # rerun resumes from lineage, completes the rest
        r2 = run_extract_resumable(spark, docs, out_dir)
        assert r2["resumed"] and r2["slices_previously_done"] == 5
        assert r2["slices_committed_now"] == 11
        # result identical to a straight batch run: no loss, no dupes
        resumed = {
            r["doc_id"]: r["blocks_kept"] for r in read_result(spark, out_dir).collect()
        }
        direct = {
            r["doc_id"]: r["blocks_kept"] for r in extract_spans(docs).collect()
        }
        assert resumed == direct
        # third run is a no-op
        r3 = run_extract_resumable(spark, docs, out_dir)
        assert r3["slices_committed_now"] == 0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_resume_after_mid_run_kill_with_group_commits(spark, docs):
    """ADVICE r2: grouped commit granularity restores TRUE mid-run crash
    coverage — the run is killed BETWEEN group commits (an exception,
    not a pre-restricted slice set), partial progress is durably
    committed, and the rerun completes to a byte-identical result."""
    out_dir = tempfile.mkdtemp(prefix="lineage_grp_")
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            run_extract_resumable(
                spark, docs, out_dir, commit_group_size=4, fail_after_groups=2
            )
        # 2 groups of 4 slices survived the kill
        committed = spark.read.parquet(f"{out_dir}/lineage")
        assert committed.count() == 8
        r2 = run_extract_resumable(spark, docs, out_dir, commit_group_size=4)
        assert r2["resumed"] and r2["slices_previously_done"] == 8
        assert r2["slices_committed_now"] == 8
        resumed = {
            r["doc_id"]: r["blocks_kept"] for r in read_result(spark, out_dir).collect()
        }
        direct = {
            r["doc_id"]: r["blocks_kept"] for r in extract_spans(docs).collect()
        }
        assert resumed == direct
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_resume_with_empty_pending_slices(spark, docs):
    """A run whose pending slices hold zero docs must still commit
    (n_docs=0 lineage rows), not crash on schema inference over an
    empty partitioned write (code-review r2 finding)."""
    out_dir = tempfile.mkdtemp(prefix="lineage_empty_")
    try:
        empty = docs.filter("1 = 0")
        r1 = run_extract_resumable(spark, empty, out_dir)
        assert r1["slices_committed_now"] == 16
        lineage = spark.read.parquet(f"{out_dir}/lineage")
        rows = {r["slice_id"]: r["n_docs"] for r in lineage.collect()}
        assert rows == {i: 0 for i in range(16)}
        # rerun is a no-op
        r2 = run_extract_resumable(spark, empty, out_dir)
        assert r2["slices_committed_now"] == 0 and r2["resumed"]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_streaming_equals_batch(spark, docs):
    from deepseek_ocr_spark.streaming.stream_extract import run_available_now

    in_dir = tempfile.mkdtemp(prefix="stream_in_")
    out_dir = tempfile.mkdtemp(prefix="stream_out_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        docs.write.mode("overwrite").parquet(in_dir)
        run_available_now(spark, in_dir, out_dir, ckpt)
        streamed = {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
            ]
            for r in spark.read.parquet(out_dir).collect()
        }
        batch = {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
            ]
            for r in extract_spans(spark.read.parquet(in_dir)).collect()
        }
        assert streamed == batch
    finally:
        for d in (in_dir, out_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_repartition_salted_spreads_hot_key(spark, docs):
    """The salt must spread the HOT key itself (review r4: a salt
    derived from the key is constant per key value and spreads nothing
    — the old test salted on unique doc_id, which dodged the bug)."""
    from deepseek_ocr_spark.plans.salting import repartition_salted

    hosted = docs.withColumn("host", F.split("doc_id", "-")[1])
    # plain repartition on the Zipf host key: hot host -> one partition
    plain = hosted.repartition(16, "host")
    salted = repartition_salted(hosted, ["host"], 16, salt_cols=["doc_id"])
    assert salted.count() == hosted.count()
    assert "_salt" not in salted.columns  # helper column must not leak

    def max_partition(df):
        sizes = df.rdd.glom().map(len).collect()
        return max(sizes)

    # the hot host (~46% of docs) must not all land in one task
    assert max_partition(salted) < max_partition(plain)

    # key-derived salt is a guaranteed no-op: reject it loudly
    with pytest.raises(ValueError, match="pure function of the key"):
        repartition_salted(hosted, ["host"], 16, salt_cols=["host"])


def test_aqe_skew_join_split_fires(spark):
    """VERDICT r2 #7: AQE's skew-join split must demonstrably absorb a
    Zipf-skewed join key (the complement of the manual salted-agg path
    in plans/salting.py). One host carries ~94% of the left side; with
    broadcast disabled the sort-merge join's hot partition exceeds the
    (test-lowered) skew threshold and AQE rewrites the join with
    skew=true in the final adaptive plan."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        # Zipf-ish: h0 has 150k events, h1..h49 have ~200 each
        events = spark.range(160_000).select(
            F.when(F.col("id") < 150_000, F.lit("h0"))
            .otherwise(F.concat(F.lit("h"), (F.pmod(F.col("id"), 49) + 1).cast("string")))
            .alias("host"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        hosts = spark.range(50).select(
            F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
            (F.col("id") * 10).alias("weight"),
        )
        # NB: no groupBy(host) downstream — AQE skips the skew split
        # when the join output's hash partitioning is required by a
        # later stage (it would have to re-shuffle the split partitions)
        # payload (incompressible sha2 hex) must survive the projection:
        # skew detection uses COMPRESSED map-output sizes, and a
        # partition of 150k identical "h0" strings compresses below any
        # sane threshold
        joined = events.join(hosts, on="host").select("host", "payload", "weight")
        rows = joined.collect()
        assert len(rows) == 160_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_committed_slices_propagates_corruption(spark):
    """Resume-log read failures must PROPAGATE, not read as 'fresh run'
    (review r5): a lineage table that exists but lacks slice_id means
    store corruption — silently returning set() would rescan the whole
    input and dynamic-overwrite committed partitions, masking it."""
    from pyspark.errors import AnalysisException

    from deepseek_ocr_spark.plans.lineage import committed_slices

    out_dir = tempfile.mkdtemp(prefix="lineage_bad_")
    try:
        # missing dir entirely -> fresh run (storage-agnostic: must go
        # through spark.read, not a driver-local os.path check)
        assert committed_slices(spark, f"{out_dir}/nope") == set()
        # lineage present but schema-corrupt -> raise
        spark.createDataFrame([(1,)], "wrong_col int").write.parquet(
            f"{out_dir}/lineage"
        )
        with pytest.raises(AnalysisException):
            committed_slices(spark, out_dir)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_repartition_salted_default_skips_binary(spark):
    """The default salt source must not hash multi-MB binary payloads
    per row (review r5) — with only binary columns outside the key the
    default has no safe source and must raise for an explicit choice."""
    from deepseek_ocr_spark.plans.salting import repartition_salted

    df = spark.createDataFrame(
        [("h0", bytearray(b"x" * 64), i) for i in range(10)],
        "host string, content binary, seq int",
    )
    out = repartition_salted(df, ["host"], 4)
    # 'seq' is the only atomic non-key column; binary excluded -> the
    # hot single-host frame still spreads across partitions
    assert out.rdd.glom().map(len).filter(lambda n: n > 0).count() > 1
    only_binary = df.select("host", "content")
    with pytest.raises(ValueError, match="salt"):
        repartition_salted(only_binary, ["host"], 4)
