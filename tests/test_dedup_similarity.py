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


@pytest.mark.parametrize("mode", ["fast", "portable"])
def test_incremental_dedup_probes_store_without_history_text(spark, mode):
    """Slice-vs-history dedup: the second slice is checked against the
    FIRST slice's stored signatures (no history text recomputation) and
    against itself; history×history pairs are never re-emitted."""
    from deepseek_ocr_spark.operators.dedup import incremental_minhash_dedup

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()

    def text(seed, n=30):
        import random

        rnd = random.Random(seed)
        return " ".join(words[rnd.randrange(10)] for _ in range(n))

    slice_a = spark.createDataFrame(
        [(i, text(i)) for i in range(20)] + [(20, text(5))],  # 20 dups 5
        "doc_id long, text string",
    )
    dups_a, sigs_a = incremental_minhash_dedup(slice_a, None, hash_mode=mode)
    got_a = {(r["doc_id"], r["dup_of"], r["dup_in_store"]) for r in dups_a.collect()}
    assert got_a == {(20, 5, False)}

    # persist the store exactly as a pipeline would
    import tempfile

    store = tempfile.mkdtemp(prefix="sigstore_") + "/sigs"
    sigs_a.write.mode("overwrite").parquet(store)

    near = text(7).split()
    near[0] = "CHANGED"
    slice_b = spark.createDataFrame(
        [
            (100, text(5)),  # exact dup of stored doc 5
            (101, " ".join(near)),  # near dup of stored doc 7
            (102, text(1002)),  # clean
            (110, text(1003)),
            (111, text(1003)),  # intra-slice dup of 110
        ],
        "doc_id long, text string",
    )
    store_sigs = spark.read.parquet(store)
    dups_b, sigs_b = incremental_minhash_dedup(
        slice_b, store_sigs, hash_mode=mode
    )
    got_b = {(r["doc_id"], r["dup_of"], r["dup_in_store"]) for r in dups_b.collect()}
    assert (100, 5, True) in got_b
    assert (101, 7, True) in got_b
    assert (111, 110, False) in got_b
    # every reported dup names a NEW doc on the left; clean docs absent
    assert all(d in {100, 101, 110, 111} for d, _, _ in got_b)
    assert 102 not in {d for d, _, _ in got_b}
    # 100 is an exact dup of 5 — jaccard must verify at 1.0
    assert {
        r["jaccard"] for r in dups_b.collect() if r["doc_id"] == 100
    } == {1.0}
    assert sigs_b.count() == 5


def test_incremental_dedup_rerun_not_self_dup(spark):
    """Re-running a slice whose ids already sit in the store must not
    report every doc as a jaccard-1.0 duplicate of ITSELF (review r4):
    the stored branch excludes dup_of == doc_id. Genuine store dups of
    OTHER docs still surface."""
    from deepseek_ocr_spark.operators.dedup import incremental_minhash_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "totally different content in this document body"),
        ],
        "doc_id long, text string",
    )
    _, sigs = incremental_minhash_dedup(docs, None)
    # re-run the SAME slice against a store already containing its ids
    dups, _ = incremental_minhash_dedup(docs, sigs)
    got = {(r["doc_id"], r["dup_of"]) for r in dups.collect()}
    assert all(a != b for a, b in got), f"self-dups reported: {got}"
    # the cross pair (1 vs 1's own stored sig) is gone; nothing else
    # collides between these two texts
    assert got == set()

    # overlap re-run with a genuinely new dup: the pair must be emitted
    # EXACTLY once (the overlapping b side carries two (id, sh) rows per
    # stored doc — unchecked, the verify join matched each pair twice),
    # and dup_in_store must deterministically prefer the store branch
    slice2 = docs.unionByName(
        spark.createDataFrame(
            [(3, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
    )
    rows = incremental_minhash_dedup(slice2, sigs)[0].collect()
    assert len(rows) == 1, rows
    assert (rows[0]["doc_id"], rows[0]["dup_of"]) == (3, 1)
    assert rows[0]["dup_in_store"] is True


def test_incremental_dedup_caps_identical_doc_flood(spark):
    """An all-identical slice must not explode the candidate join
    (M²/2 pairs): the target side of each bucket is capped at
    LSH_BUCKET_CAP, yet every doc after the first is still flagged
    (the smallest id survives truncation and catches them all)."""
    from deepseek_ocr_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        incremental_minhash_dedup,
    )

    m = 3 * LSH_BUCKET_CAP
    docs = spark.createDataFrame(
        [(i, "same text repeated in every single document here") for i in range(m)],
        "doc_id long, text string",
    )
    dups, _ = incremental_minhash_dedup(docs, None)
    flagged = {r["doc_id"] for r in dups.collect()}
    assert flagged == set(range(1, m))


@pytest.mark.parametrize("mode", ["fast", "portable"])
def test_minhash_simhash_on_oversize_docs(spark, mode):
    """End-to-end dedup on docs LONGER than one kernel slab
    (_KERNEL_CHUNK = 512 hashes): the signature kernels must take the
    sub-slab fold path for such docs — the synthetic corpus never makes
    them, so this is the only operator-level coverage. Exact dups of a
    1,500-token doc must be found with jaccard 1.0 / hamming 0, and an
    unrelated long doc must not pair with them."""
    import random

    from deepseek_ocr_spark.operators.dedup import (
        jaccard_pairs_blocked,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    rnd = random.Random(11)
    vocab = [f"word{v}" for v in range(4000)]
    long_a = " ".join(rnd.choice(vocab) for _ in range(1500))
    near_a = long_a.split()
    near_a[700] = "CHANGED"
    rows = [
        (1, long_a),
        (2, long_a),
        (3, " ".join(near_a)),
        (4, " ".join(rnd.choice(vocab) for _ in range(1500))),
        (5, "short doc for contrast"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    mh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, jaccard_threshold=0.5, hash_mode=mode
        ).collect()
    }
    assert mh.get((1, 2)) == 1.0, f"exact long dup missed: {mh}"
    assert (1, 3) in mh and (2, 3) in mh, f"near long dup missed: {mh}"
    assert not any(4 in p or 5 in p for p in mh), f"false pair: {mh}"
    # reported jaccard equals the exact blocked jaccard (verify stage
    # re-shingles — independent of the kernels)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs_blocked(
            docs.withColumn("blk", F.lit(1)), ["blk"], threshold=0.0
        ).collect()
    }
    for p, j in mh.items():
        assert abs(exact[p] - j) < 1e-6

    sh = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=3, hash_mode=mode).collect()
    }
    assert sh.get((1, 2)) == 0, f"simhash exact long dup missed: {sh}"
    assert not any(5 in p for p in sh), f"simhash false pair: {sh}"


def test_jaccard_blocked_accepts_string_doc_ids(spark):
    """The quadratic baseline must run on the engine's own string
    doc_id shape (schema.py contract); under ANSI mode a hard-coded
    bigint cast would throw CAST_INVALID_INPUT (code-review r3)."""
    rows = [
        ("doc-host00.example-00000001", "the quick brown fox jumps over"),
        ("doc-host00.example-00000002", "the quick brown fox jumps over"),
        ("doc-host00.example-00000003", "completely unrelated text body here"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string").withColumn(
        "blk", F.lit(1)
    )
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs_blocked(df, ["blk"], threshold=0.1).collect()
    }
    assert got == {(rows[0][0], rows[1][0], 1.0)}


@pytest.mark.parametrize("mode", ["fast", "portable"])
def test_minhash_lsh_finds_planted_pairs(spark, dup_docs, mode):
    found = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            dup_docs, jaccard_threshold=0.5, hash_mode=mode
        ).collect()
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
    for r in minhash_lsh_pairs(
        dup_docs, jaccard_threshold=0.5, hash_mode=mode
    ).collect():
        assert abs(exact[(r["doc_a"], r["doc_b"])] - r["jaccard"]) < 1e-6


def test_lsh_bucket_stats_surfaces_truncation(spark, dup_docs):
    """The LSH_BUCKET_CAP is observable: stats report bucket counts and
    flag truncated buckets (none on this tiny corpus; many identical
    docs must trip it)."""
    from deepseek_ocr_spark.operators.dedup import LSH_BUCKET_CAP, lsh_bucket_stats

    s = lsh_bucket_stats(dup_docs).collect()[0]
    assert s["n_buckets"] > 0 and s["n_multi"] > 0 and s["n_truncated"] == 0

    clones = spark.createDataFrame(
        [(i, "same text every time here") for i in range(LSH_BUCKET_CAP + 10)],
        "doc_id long, text string",
    )
    for mode in ("fast", "portable"):
        s2 = lsh_bucket_stats(clones, hash_mode=mode).collect()[0]
        assert s2["n_truncated"] > 0, mode
        assert s2["max_bucket"] == LSH_BUCKET_CAP + 10, mode


@pytest.mark.parametrize("mode", ["fast", "portable"])
def test_simhash_finds_exact_dups(spark, dup_docs, mode):
    found = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(dup_docs, max_hamming=3, hash_mode=mode).collect()
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


def test_lsh_multiprobe_improves_recall(spark, clustered_vecs):
    """n_probe=2 must never lose candidates vs n_probe=1 and the probe
    set must be the primary bucket plus a one-bit flip."""
    from deepseek_ocr_spark.operators.similarity import (
        hyperplane_bucket,
        probe_buckets,
    )

    rows = clustered_vecs.select(
        hyperplane_bucket(F.col("embedding"), 8).alias("b"),
        probe_buckets(F.col("embedding"), 8, 3).alias("probes"),
    ).collect()
    for r in rows:
        assert r["probes"][0] == r["b"]
        assert len(set(r["probes"])) == 3
        for extra in r["probes"][1:]:
            assert bin(extra ^ r["b"]).count("1") == 1

    q = clustered_vecs.filter(F.col("vec_id").isin(0, 10, 20))
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(clustered_vecs, q, k=3, n_probe=1).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(clustered_vecs, q, k=3, n_probe=3).collect()
    }
    assert len(multi) >= len(single)


def test_persisted_intermediates_do_not_accumulate(spark, dup_docs):
    """VERDICT r2 #5 acceptance: consecutive invocations of the
    persist()-ing operators hold steady-state cached storage — each run
    releases its predecessor's intermediate (persist_swap), and
    release() drops the last one."""
    from deepseek_ocr_spark.operators import _cache
    from deepseek_ocr_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs

    def n_persisted() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    _cache.release()
    base = n_persisted()
    minhash_lsh_pairs(dup_docs).count()
    simhash_pairs(dup_docs).count()
    first = n_persisted()
    assert first > base  # the caches exist at all
    for _ in range(2):
        minhash_lsh_pairs(dup_docs).count()
        simhash_pairs(dup_docs).count()
    assert n_persisted() == first, "cached storage grew across invocations"
    _cache.release()
    assert n_persisted() == base


def test_lsh_multitable_dedups_and_never_hurts_recall(spark, clustered_vecs):
    """4 OR'd tables: (1) output has no duplicate (query, neighbor)
    rows despite cross-table collisions, (2) recall vs exact is >= the
    single-table recall (table 0 is the same plane block, so the
    candidate set only grows), (3) scan stats report a sane fraction."""
    from deepseek_ocr_spark.operators.similarity import lsh_scan_stats

    q = clustered_vecs.filter(F.col("vec_id").isin(0, 10, 20))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(clustered_vecs, q, k=3).collect()
    }

    def recall(n_tables):
        rows = lsh_topk(
            clustered_vecs, q, k=3, n_planes=6, n_tables=n_tables
        ).collect()
        pairs = [(r["query_id"], r["neighbor_id"]) for r in rows]
        assert len(pairs) == len(set(pairs)), "duplicate pair rows"
        return len(exact & set(pairs)) / len(exact)

    assert recall(4) >= recall(1)

    st = lsh_scan_stats(clustered_vecs, q, n_planes=6, n_tables=4).collect()[0]
    assert 0.0 < st["scan_fraction"] <= 1.0
    assert st["n_exhaustive"] == 3 * 49


def test_hyperplane_dim_mismatch_raises(spark):
    """ADVICE r2 (medium): a declared dim that mismatches the actual
    vector width must raise, not silently collapse every bucket to 0."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from deepseek_ocr_spark.operators.similarity import hyperplane_bucket

    df = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(SparkRuntimeException, match="declared dim"):
        df.select(
            hyperplane_bucket(F.col("embedding"), 4, dim=4).alias("b")
        ).collect()
    # matching width still works and buckets are non-degenerate
    ok = df.select(
        hyperplane_bucket(F.col("embedding"), 4, dim=8).alias("b")
    ).collect()
    assert ok[0]["b"] is not None


@pytest.fixture(scope="module")
def seeded_vecs(spark):
    """clustered corpus whose ids place one representative of each
    cluster at 100+c — the seeded-IVF quantizer range."""
    import random

    rnd = random.Random(13)
    rows = []
    for c in range(5):
        center = [rnd.gauss(0, 1) for _ in range(16)]
        for j in range(10):
            vec = [x + rnd.gauss(0, 0.05) for x in center]
            vid = 100 + c if j == 0 else c * 10 + j
            rows.append((vid, vec, c))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_ivf_seeded_recall(spark, seeded_vecs):
    """Deterministic seeded quantizer (one seed per cluster): probed
    cells contain the true neighbors."""
    from deepseek_ocr_spark.operators.similarity import ivf_topk_seeded

    q = seeded_vecs.filter(F.col("vec_id").isin(1, 11, 21))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(seeded_vecs, q, k=3).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk_seeded(
            seeded_vecs, q, k=3, n_cells=5, n_probe=2, seed_base=100
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"seeded IVF recall {recall}"


def test_embedding_dup_bucketed_recall(spark, clustered_vecs):
    """LSH-blocked near-dup pairs: a strict subset of the exact blocked
    pairs (no false positives), with usable recall on tight clusters."""
    from deepseek_ocr_spark.operators.similarity import embedding_dup_pairs

    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dup_pairs(
            clustered_vecs, threshold=0.99, n_planes=0
        ).collect()
    }
    bucketed = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_dup_pairs(
            clustered_vecs, threshold=0.99, n_planes=4
        ).collect()
    }
    assert bucketed <= exact
    assert exact, "fixture must contain near-dup pairs"
    # subset holds above, so recall is just the size ratio
    recall = len(bucketed) / len(exact)
    assert recall >= 0.5, f"bucketed dup recall {recall}"
    # multi-table OR (VERDICT r3 #3): still no false positives, recall
    # monotone in tables, and each pair emitted exactly once
    multi_rows = embedding_dup_pairs(
        clustered_vecs, threshold=0.99, n_planes=4, n_tables=4
    ).collect()
    multi = {(r["vec_a"], r["vec_b"]) for r in multi_rows}
    assert len(multi_rows) == len(multi), "union+distinct must dedupe pairs"
    assert multi <= exact
    assert bucketed <= multi
    assert len(multi) / len(exact) >= recall


def test_embedding_dup_table_param_guards(spark, clustered_vecs):
    """Degenerate multi-table combinations raise instead of silently
    collapsing to a single full block join (review r4): n_tables<1, and
    n_tables>1 with n_planes=0 (no hyperplane blocking to OR over)."""
    from deepseek_ocr_spark.operators.similarity import (
        embedding_dup_pairs,
        embedding_dup_scan_stats,
    )

    with pytest.raises(ValueError, match="n_tables must be >= 1"):
        embedding_dup_pairs(clustered_vecs, n_planes=4, n_tables=0)
    with pytest.raises(ValueError, match="requires n_planes >= 1"):
        embedding_dup_pairs(clustered_vecs, n_planes=0, n_tables=4)
    with pytest.raises(ValueError, match="n_tables must be >= 1"):
        embedding_dup_scan_stats(clustered_vecs, n_planes=4, n_tables=0)


def test_embedding_dup_scan_stats_empty_input(spark, clustered_vecs):
    """An empty corpus yields a clean zero-candidates row, not a
    TypeError from SUM collecting as None (review r4)."""
    from deepseek_ocr_spark.operators.similarity import (
        embedding_dup_scan_stats,
    )

    row = embedding_dup_scan_stats(
        clustered_vecs.filter("vec_id < 0"), n_planes=4
    ).collect()[0]
    assert (row["n_candidates"], row["n_exhaustive"]) == (0, 0)
    assert row["scan_fraction"] == 0.0


def test_ivf_persisted_index_probe_prunes_partitions(
    spark, clustered_vecs, tmp_path
):
    """Build-once-probe-many: the persisted cell-partitioned IVF index
    must (a) return the same ranking as the in-memory one-shot path and
    (b) scan only the probed cell partitions (literal IN filter →
    parquet partition pruning)."""
    from deepseek_ocr_spark.operators.similarity import (
        centroids_from_df,
        centroids_to_df,
        ivf_fit_centroids,
        ivf_index,
        ivf_probe,
    )

    cents = ivf_fit_centroids(clustered_vecs, n_cells=5, seed=7)
    idx_p = str(tmp_path / "ivf_index")
    cen_p = str(tmp_path / "ivf_centroids")
    ivf_index(clustered_vecs, cents).write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(idx_p)
    centroids_to_df(spark, cents).write.mode("overwrite").parquet(cen_p)

    # reload everything from storage, as a separate probe job would
    stored_cents = centroids_from_df(spark.read.parquet(cen_p))
    assert stored_cents == cents
    stored_idx = spark.read.parquet(idx_p)
    q = clustered_vecs.filter(F.col("vec_id").isin(0, 10, 20))
    probed = ivf_probe(stored_idx, stored_cents, q, k=3, n_probe=2)
    baseline = ivf_probe(
        ivf_index(clustered_vecs, cents), cents, q, k=3, n_probe=2,
        prune=False,
    )
    got = sorted(tuple(r) for r in probed.collect())
    exp = sorted(tuple(r) for r in baseline.collect())
    assert got == exp and len(got) == 9
    # neighbors stay in-cluster (index round-trip didn't degrade search)
    assert all(n // 10 == qid // 10 for qid, n, _, _ in got)
    # the scan is partition-pruned to the probed cells only
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [cell" in plan, plan


def test_lsh_persisted_index_probe_prunes_partitions(
    spark, clustered_vecs, tmp_path
):
    """LSH twin of the IVF persisted-index test: a bucket-partitioned
    stored index probed with pruning must match the in-memory one-shot
    lsh_topk and scan only the probed bucket partitions."""
    from deepseek_ocr_spark.operators.similarity import (
        lsh_index,
        lsh_probe,
        lsh_topk,
    )

    kw = dict(n_planes=6, n_tables=2, dim=16)
    idx_p = str(tmp_path / "lsh_index")
    lsh_index(clustered_vecs, 6, 2, dim=16).write.partitionBy(
        "bucket"
    ).mode("overwrite").parquet(idx_p)
    q = clustered_vecs.filter(F.col("vec_id").isin(0, 10, 20))
    probed = lsh_probe(
        spark.read.parquet(idx_p), q, k=3, n_probe=2, **kw
    )
    got = sorted(tuple(r) for r in probed.collect())
    exp = sorted(
        tuple(r) for r in lsh_topk(clustered_vecs, q, k=3, n_probe=2, **kw).collect()
    )
    assert got == exp and len(got) > 0
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain(mode="formatted")
    assert "PartitionFilters: [bucket" in buf.getvalue()


def test_guards_fail_loudly(spark, clustered_vecs, seeded_vecs):
    """Silent-degradation paths must raise instead (code-review r2):
    over-wide embeddings would null-collapse every LSH bucket; missing
    IVF seed ids would empty the index."""
    from deepseek_ocr_spark.operators.similarity import (
        MAX_DIM,
        hyperplane_bucket,
        hyperplane_margins,
        ivf_topk_seeded,
    )

    with pytest.raises(ValueError, match="MAX_DIM"):
        hyperplane_margins(F.col("embedding"), 8, dim=MAX_DIM + 1)

    wide = spark.createDataFrame(
        [(0, [0.5] * (MAX_DIM + 4))], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="MAX_DIM"):
        wide.select(hyperplane_bucket(F.col("embedding"), 4)).collect()

    with pytest.raises(ValueError, match="seed_base"):
        ivf_topk_seeded(
            seeded_vecs, seeded_vecs.limit(1), n_cells=5, seed_base=5000
        )


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


def test_nearest_cells_single_parse_parity(spark, seeded_vecs):
    """_nearest_cells is ONE F.expr parse (the r3 Column form spent
    ~0.5s/side of driver-only py4j plan construction — the s3 bench
    regression, VERDICT r3 #2). Pin byte-equality against the Column
    form it replaced: same fold order, same distance values, same
    (d, cell) tiebreak."""
    from deepseek_ocr_spark.operators.similarity import (
        _collect_seed_centroids,
        _dlit,
        _nearest_cells,
    )

    cents = _collect_seed_centroids(
        seeded_vecs, 4, 100, "vec_id", "embedding"
    )

    def column_form(vec, centroids, n):
        d = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vec,
                        _dlit(c),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0).cast("double"),
                    lambda acc, x: acc + x,
                )
                for c in centroids
            ]
        )
        ranked = F.array_sort(
            F.zip_with(
                d,
                F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                lambda dist, i: F.struct(dist.alias("d"), i.alias("cell")),
            )
        )
        return F.transform(F.slice(ranked, 1, n), lambda s: s["cell"])

    got = seeded_vecs.select(
        "vec_id", _nearest_cells("embedding", cents, 2).alias("cells")
    ).collect()
    ref = seeded_vecs.select(
        "vec_id", column_form(F.col("embedding"), cents, 2).alias("cells")
    ).collect()
    assert sorted((r["vec_id"], tuple(r["cells"])) for r in got) == sorted(
        (r["vec_id"], tuple(r["cells"])) for r in ref
    )


def test_cosine_topk_guards_full_scan(spark):
    """The exact comparator refuses corpora above MAX_EXACT_ROWS unless
    explicitly allowed (VERDICT r3 #6) — the all-pairs path must not be
    mistakable for the production ANN path at scale."""
    import pytest as _pytest

    from deepseek_ocr_spark.operators import similarity as S

    big = spark.range(S.MAX_EXACT_ROWS + 10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    q = big.limit(1)
    with _pytest.raises(ValueError, match="MAX_EXACT_ROWS"):
        S.cosine_topk(big, q, k=1)
    # the escape hatch still works (don't collect the full result —
    # building the plan + one row is enough)
    assert (
        S.cosine_topk(big.limit(10), q, k=1, allow_full_scan=True).count() > 0
    )


def test_semantic_dedup_transitive_collapse(spark):
    """SemDeDup: within-cell cosine edges (a~b 0.995, b~c 0.995, but
    a~c 0.980 < threshold) must still collapse {a,b,c} into one kept
    canonical (transitive closure); unrelated vectors in another cell
    are all kept with NULL cluster_id."""
    import math

    from deepseek_ocr_spark.operators.similarity import semantic_dedup

    th = 0.1
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [math.cos(th), math.sin(th), 0.0, 0.0]),
        (3, [math.cos(2 * th), math.sin(2 * th), 0.0, 0.0]),
        (4, [2.0, 0.0, 0.0, 0.0]),  # scalar multiple of 1 -> cosine 1.0
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.0, 1.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        vecs,
        threshold=0.99,
        centroids=[[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.5, 0.5]],
    )
    got = {r["vec_id"]: (r["cluster_id"], r["kept"]) for r in out.collect()}
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (1, False),
        10: (None, True),
        11: (None, True),
    }


def test_semantic_dedup_fitted_quantizer_smoke(spark):
    """k-means path: planted exact-duplicate vectors collapse; count of
    kept rows = distinct directions (no cross-cell false merges on a
    well-separated synthetic corpus)."""
    import random

    from deepseek_ocr_spark.operators.similarity import semantic_dedup

    rnd = random.Random(5)
    rows = []
    for i in range(40):
        base = [rnd.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        if i % 4 == 0:
            rows.append((1000 + i, [2.0 * x for x in base]))  # cosine 1.0
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(vecs, threshold=0.999, n_cells=4, seed=7).collect()
    kept = [r for r in out if r["kept"]]
    dropped = [r for r in out if not r["kept"]]
    # every planted multiple must be dropped in favor of its base
    # (same direction -> same cell, cosine exactly 1.0)
    assert {r["vec_id"] for r in dropped} == {1000 + i for i in range(0, 40, 4)}
    assert len(kept) == 40
    for r in dropped:
        assert r["cluster_id"] == r["vec_id"] - 1000


def test_zero_vector_yields_null_sim_not_crash(spark):
    """Review r5: ANSI mode is ON, so an unguarded cosine denominator
    turns ONE all-zero embedding (missing/dirty vector) into a
    DIVIDE_BY_ZERO that kills the whole job. cosine() must yield NULL
    instead: zero vectors match no threshold, rank last in top-k, and
    never collapse a semantic-dedup cell."""
    df = spark.createDataFrame(
        [("1", [0.0, 0.0]), ("2", [1.0, 0.0]), ("3", [0.6, 0.8])],
        "vec_id string, embedding array<double>",
    )
    rows = cosine_topk(df, df, k=2, allow_full_scan=True).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # real pair scores unaffected
    (r23,) = [r for r in by_q["2"] if r["neighbor_id"] == "3"]
    assert r23["sim"] == 0.6
    # every sim involving the zero vector is NULL, and NULLs rank last
    for r in rows:
        if "1" in (r["query_id"], r["neighbor_id"]):
            assert r["sim"] is None
    for q in ("2", "3"):
        top = min(by_q[q], key=lambda r: r["rank"])
        assert top["sim"] is not None
