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
