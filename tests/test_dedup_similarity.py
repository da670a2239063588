"""Dedup + similarity operator tests: planted near-duplicates must be
found by the approximate paths (MinHash-LSH, SimHash, hyperplane LSH),
and the approximate paths must never disagree with the exact metrics
they report (jaccard / hamming / cosine are recomputed exactly)."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs_blocked,
    minhash_lsh_pairs,
    simhash_pairs,
)
from deepseek_ocr_spark.operators.similarity import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def dup_docs(spark):
    """40 base docs + near-dup of each 4th (one word changed) + exact
    dup of each 10th."""
    import random

    rnd = random.Random(7)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(40):
        toks = [words[rnd.randrange(10)] for _ in range(30)]
        rows.append((i, " ".join(toks)))
        if i % 4 == 0:
            mod = list(toks)
            mod[5] = "CHANGED"
            rows.append((1000 + i, " ".join(mod)))
        if i % 10 == 0:
            rows.append((2000 + i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    groups = exact_dedup(dup_docs).collect()
    # the 4 exact dups (i % 10 == 0) each form a group of 2
    assert len(groups) == 4
    assert all(g["n_dups"] == 2 for g in groups)


def test_minhash_lsh_finds_planted_pairs(spark, dup_docs):
    found = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(dup_docs, jaccard_threshold=0.5).collect()
    }
    # every exact dup must be found (jaccard 1.0, all bands agree)
    for i in range(0, 40, 10):
        assert (i, 2000 + i) in found, f"exact dup {i} missed"
    # near dups (1 word of 30 changed → jaccard ≈ 0.8): ≥ 80% recall
    near = [(i, 1000 + i) for i in range(0, 40, 4)]
    recall = sum(p in found for p in near) / len(near)
    assert recall >= 0.8, f"near-dup recall {recall}"
    # precision: reported jaccard must equal exact blocked jaccard
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs_blocked(
            dup_docs.withColumn("blk", F.lit(1)), ["blk"], threshold=0.0
        ).collect()
    }
    for r in minhash_lsh_pairs(dup_docs, jaccard_threshold=0.5).collect():
        assert abs(exact[(r["doc_a"], r["doc_b"])] - r["jaccard"]) < 1e-6


def test_simhash_finds_exact_dups(spark, dup_docs):
    found = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(dup_docs, max_hamming=3).collect()
    }
    for i in range(0, 40, 10):
        assert found.get((i, 2000 + i)) == 0, f"exact dup {i} missed"


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    """5 clusters of 10 vectors each: cluster center ± small noise —
    nearest neighbors are in-cluster by construction."""
    import random

    rnd = random.Random(11)
    rows = []
    for c in range(5):
        center = [rnd.gauss(0, 1) for _ in range(16)]
        for j in range(10):
            vec = [x + rnd.gauss(0, 0.05) for x in center]
            rows.append((c * 10 + j, vec, c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_in_cluster(spark, clustered_vecs):
    q = clustered_vecs.filter(F.col("vec_id").isin(0, 10, 20))
    out = cosine_topk(clustered_vecs, q, k=3).collect()
    assert len(out) == 9
    for r in out:
        assert r["neighbor_id"] // 10 == r["query_id"] // 10, (
            "neighbor crossed cluster boundary"
        )
        assert r["sim"] > 0.99


def test_lsh_topk_recall(spark, clustered_vecs):
    """Tight clusters land in one hyperplane bucket → LSH recall ≈ 1."""
    q = clustered_vecs.filter(F.col("vec_id").isin(0, 10, 20))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(clustered_vecs, q, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(clustered_vecs, q, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_ivf_topk_recall(spark, clustered_vecs):
    """IVF with cells ≈ clusters: in-cluster neighbors stay in the
    probed cells → high recall vs brute force."""
    from deepseek_ocr_spark.operators.similarity import ivf_topk

    q = clustered_vecs.filter(F.col("vec_id").isin(0, 10, 20))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(clustered_vecs, q, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(clustered_vecs, q, k=3, n_cells=5, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall}"
