"""Sequence packing invariants: exact partition of the input, bounded
pack totals, oversize isolation, determinism, and measured utilization
on a realistic token-count distribution."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.operators.packing import pack_sequences, packing_stats

BUDGET = 1000


@pytest.fixture(scope="module")
def counted_docs(spark):
    """2,000 docs with a skewed count distribution incl. oversize."""
    return spark.range(2000).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("doc_id"),
        (
            F.when(F.col("id") % 97 == 0, 1500)  # oversize
            .when(F.col("id") % 5 == 0, 40 + F.col("id") % 60)  # short
            .otherwise(100 + (F.col("id") * 37) % 400)
        )
        .cast("long")
        .alias("n_tokens"),
    )


def test_packing_invariants(spark, counted_docs):
    packs = pack_sequences(counted_docs, BUDGET).collect()
    # exact partition: every doc exactly once
    all_ids = [d for p in packs for d in p["doc_ids"]]
    assert sorted(all_ids) == sorted(
        r["doc_id"] for r in counted_docs.collect()
    )
    counts = {r["doc_id"]: r["n_tokens"] for r in counted_docs.collect()}
    for p in packs:
        assert p["total_tokens"] == sum(counts[d] for d in p["doc_ids"])
        if p["oversize"]:
            # oversize docs are isolated, never mixed
            assert p["n_docs"] == 1
            assert counts[p["doc_ids"][0]] >= BUDGET
        else:
            last_added_bound = BUDGET + max(counts[d] for d in p["doc_ids"]) - 1
            assert p["total_tokens"] <= last_added_bound, p
            assert all(counts[d] < BUDGET for d in p["doc_ids"])


def test_packing_deterministic(spark, counted_docs):
    a = sorted(tuple(r) for r in pack_sequences(counted_docs, BUDGET).collect())
    b = sorted(
        tuple(r)
        for r in pack_sequences(
            counted_docs.repartition(7), BUDGET
        ).collect()
    )
    assert a == b  # shard hash + in-shard order make packing layout-free


def test_packing_utilization_and_stats(spark, counted_docs):
    packs = pack_sequences(counted_docs, BUDGET)
    stats = packing_stats(packs, BUDGET).collect()[0]
    assert stats["n_oversize"] == 21  # id % 97 == 0 in [0, 2000)
    assert stats["budget"] == BUDGET
    # streaming fill on ~100-500-token docs should fill most of the
    # budget on average (shards with few docs drag the tail)
    assert stats["mean_utilization"] >= 0.5, stats
    # full-pack subset (every shard's non-final packs) is well-filled
    full = packs.filter(~F.col("oversize") & (F.col("utilization") >= 0.8))
    assert full.count() > 0


def test_packing_rejects_bad_budget(spark, counted_docs):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(counted_docs, 0)


def test_packing_rejects_negative_count(spark):
    """Review r5: a negative count makes the running prefix sum
    non-monotone — floor(prev/budget) could assign later docs to
    earlier (or negative) packs, silently. Same loud-failure policy as
    the NULL-count guard."""
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [("a", 100), ("b", -5000), ("c", 100)], "doc_id string, n_tokens long"
    )
    with pytest.raises(SparkRuntimeException, match="negative"):
        pack_sequences(df, 1000).collect()


def test_packing_rejects_duplicate_doc_id(spark):
    """Review r5: two rows sharing a doc_id are tie-broken by arrival
    order in the fill window, so the same input could yield different
    pack compositions run to run — raise instead of flickering."""
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [("a", 100), ("b", 200), ("b", 300)], "doc_id string, n_tokens long"
    )
    with pytest.raises(SparkRuntimeException, match="duplicate"):
        pack_sequences(df, 1000).collect()


def test_exact_budget_doc_is_not_oversize(spark):
    """A doc of exactly budget tokens fills one pack perfectly — it must
    NOT be flagged oversize (callers drop/truncate oversize packs, which
    would silently lose perfectly-sized documents); only counts STRICTLY
    above budget are isolated."""
    docs = spark.createDataFrame(
        [(1, BUDGET), (2, BUDGET + 1), (3, 10)],
        "doc_id long, n_tokens long",
    )
    rows = pack_sequences(docs, BUDGET, n_shards=1).collect()
    over = [r for r in rows if r["oversize"]]
    assert len(over) == 1 and over[0]["doc_ids"] == [2]
    assert over[0]["total_tokens"] == BUDGET + 1
    normal = {d for r in rows if not r["oversize"] for d in r["doc_ids"]}
    assert normal == {1, 3}


def test_adaptive_shards_scales_with_corpus():
    from deepseek_ocr_spark.operators.packing import (
        DEFAULT_SHARDS,
        adaptive_shards,
    )

    # tiny corpus: one shard (≈12 ideal packs can't feed 256 shards)
    assert adaptive_shards(25_000, 2048) == 1
    # mid corpus: shards grow with ideal packs / target_packs_per_shard
    assert adaptive_shards(2048 * 8 * 40, 2048) == 40
    # huge corpus: capped at the parallelism bound
    assert adaptive_shards(10**12, 2048) == DEFAULT_SHARDS
    # degenerate inputs
    assert adaptive_shards(0, 2048) == 1
    with pytest.raises(ValueError, match="budget"):
        adaptive_shards(1000, 0)


def test_adaptive_shards_fixes_small_corpus_utilization(spark):
    """256 fixed shards on a small corpus leave ~1 near-empty pack per
    shard (utilization ~0.06); the adaptive shard count restores a
    filled pack stream. This is what run_training_prep_job does."""
    from deepseek_ocr_spark.operators.packing import adaptive_shards

    docs = spark.createDataFrame(
        [(i, 64) for i in range(400)], "doc_id long, n_tokens long"
    )  # 25,600 tokens → 12 ideal packs at budget 2048
    n = adaptive_shards(400 * 64, 2048)
    packs = pack_sequences(docs, 2048, n_shards=n)
    stats = packing_stats(packs, 2048).collect()[0]
    assert stats["mean_utilization"] >= 0.85, stats
