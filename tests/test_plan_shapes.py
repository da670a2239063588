"""Physical-plan shape assertions — lock in the scale properties PLANS.md
documents so a refactor can't silently regress them: pipeline B stays a
zero-shuffle zero-Python map, the bucketed/keyed joins stay equi-joins on
their intended keys, dimension joins stay broadcast, and scans stay
pruned."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark import corpus
from deepseek_ocr_spark import queries as Q
from deepseek_ocr_spark.operators.spans_pipeline import extract_spans

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_b_zero_shuffle_zero_python(spark):
    docs = corpus.spark_documents(spark, seed=42, n_docs=50)
    plan = _plan(extract_spans(docs))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_d5_join_keys_include_lsh_bucket(spark):
    """VERDICT r1 #4 acceptance: no all-pairs join on label alone."""
    plan = _plan(Q.d5_embedding_dup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join carries both the label and the bucket column
    join_lines = [
        ln for ln in plan.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln
    ]
    assert join_lines, plan[:2000]
    assert any("bkt" in ln and "blk" in ln for ln in join_lines), join_lines


def test_f1_is_windowed_lag_not_self_join(spark):
    """r3 shape: the ban is a lag window over (doc_id, ngram) — the
    nearest previous equal occurrence decides, so the r2 self-join
    (M² pairs per repeated ngram before its residual distance filter)
    is gone entirely. Degenerate pages cost O(M log M), not O(M²)."""
    plan = _plan(Q.f1_ngram_ban(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert any("lag" in ln and "doc_id" in ln and "ng" in ln for ln in win_lines), (
        win_lines
    )


def test_s2_joins_on_bucket_only(spark):
    plan = _plan(Q.s2_knn_lsh(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    join_lines = [ln for ln in plan.splitlines() if "HashJoin" in ln]
    assert any("bucket" in ln for ln in join_lines), join_lines


def test_s3_seeded_assignment_no_exchange(spark):
    """VERDICT r2 fix #2 acceptance: seeded-IVF cell assignment is pure
    literal arithmetic — no Exchange may appear before the probe join.
    The only exchanges in the whole plan are the two the top-k ranking
    legitimately needs (window partitionBy(query_id) + its sort)."""
    plan = _plan(Q.s3_knn_ivf(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin [cell" in plan  # probe join, corpus side streamed
    # the ONLY shuffle is the final top-k window's repartition by query_id;
    # the r2 shape had an extra Exchange hashpartitioning(vec_id) argmin
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) == 1 and "query_id" in shuffles[0], shuffles
    # and no per-vector argmin window survives (the r2 shape ranked rk<=n
    # over partitionBy(vec_id)); the only window keys on query_id
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows and all("query_id" in ln for ln in windows), windows


def test_dim_join_broadcasts_and_prunes(spark):
    plan = _plan(Q.q_join_part_type_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # lineitem scan reads a pruned column set, with join-key null filter pushed
    assert "PushedFilters: [IsNotNull(l_partkey)]" in plan
    assert "l_comment" not in plan


def test_tile_planner_zero_shuffle(spark):
    """r3: the 13-candidate grid argmin is an array fold, not
    explode→window — p1/p2/p4 must stay Scan→Project (the former shape
    repartitioned N×13 rows by every page column)."""
    # p1 left the registry in r5 (merged into p2's tile grain) but stays
    # the plan-pinned operator entry point
    for fn in (Q.p1_tile_planner, Q.p2_dynamic_tiling, Q.p4_pad_token_layout):
        plan = _plan(fn(spark, SF_DIR))
        assert "Exchange" not in plan, fn.__name__
        assert "Window" not in plan, fn.__name__


def test_corpus_mix_zero_shuffle(spark):
    """u6: holdout tag + domain-rate gate + epoch explode + union are
    all narrow — no Exchange, no Python anywhere in the plan (the md5
    gate is pure codegen)."""
    plan = _plan(Q.u6_corpus_mix(spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_s7_annotation_plan_single_doc_exchange(spark):
    """S7: one Exchange on doc_id (jdx numbering); the img_idx window's
    (doc_id, jdx) requirement must REUSE that partitioning, and the
    per-ref/per-box explosion ships no page bodies through a shuffle."""
    plan = _plan(Q.s7_annotation_plan(spark, SF_DIR))
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1 and "doc_id" in exchanges[0], exchanges
    assert "Python" not in plan


def test_s8_geometry_plot_pure_map(spark):
    plan = _plan(Q.s8_geometry_plot(spark, SF_DIR))
    assert "Exchange" not in plan and "Python" not in plan


def test_minhash_band_branch_ships_fixed_width_rows(spark):
    """The band explosion must not carry the shingle array — only
    (doc_id, band, band_sig) cross the exchange feeding the bucket agg."""
    from deepseek_ocr_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"text {i} alpha beta gamma") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(minhash_lsh_pairs(docs, hash_mode="portable"))
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    band_ex = [ln for ln in exchanges if "band" in ln]
    assert band_ex, exchanges
    assert all("sh#" not in ln for ln in band_ex), band_ex


def test_jaccard_verify_single_id_broadcast_filters_probe(spark):
    """The exact-Jaccard verify must (1) filter the probe table with a
    broadcast of the distinct candidate IDS before any wide join — so
    the full probe table never shuffles (on the incremental path it is
    the whole persisted store) — and (2) build exactly ONE driver-side
    broadcast relation in the verify section: the late-r4 two-broadcast
    form built three hash relations over full pair rows, a ~5-6 s
    level-independent driver section at 178k candidate pairs that
    dominated scaling loss. Pinned as: at least one BroadcastHashJoin,
    the candidate-doc shingle table cached (two InMemoryTableScans, one
    per pair-join side), and no Exchange carrying the probe's text
    column (only candidate shingles shuffle)."""
    from deepseek_ocr_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(i, f"text {i} alpha beta gamma") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(minhash_lsh_pairs(docs, hash_mode="portable"))
    bhj = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
    assert len(bhj) >= 1, plan
    imts = [ln for ln in plan.splitlines() if "InMemoryTableScan" in ln]
    assert len(imts) >= 2, plan
    text_ex = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "_text" in ln
    ]
    assert not text_ex, text_ex


def test_semantic_dedup_pair_join_reads_cached_index(spark):
    """semantic_dedup's within-cell self-join must read the CACHED
    indexed table on both sides: the cell assignment is an interpreted
    argmin fold over n_cells centroids, so an uncached join evaluates
    it twice (plus once under the collapse) and its cost GROWS with
    n_cells — the r5 finding where raising SemDeDup's own scale knob
    made the query slower. Pinned as ≥2 InMemoryTableScans in the pair
    subtree's plan."""
    from deepseek_ocr_spark.operators.similarity import (
        embedding_dup_pairs,
        ivf_index,
    )
    from deepseek_ocr_spark.operators._cache import persist_swap

    vecs = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cents = [[0.0, 0.0, 1.0], [4.0, 2.0, 1.0]]
    idx = persist_swap("semdedup_idx", ivf_index(vecs, cents))
    pairs = embedding_dup_pairs(
        idx, threshold=0.5, block_col="cell", id_col="neighbor_id",
        vec_col="vec",
    )
    plan = _plan(pairs)
    imts = [ln for ln in plan.splitlines() if "InMemoryTableScan" in ln]
    assert len(imts) >= 2, plan
    # and the operator itself registers the cache (removing its
    # persist_swap would leave this composition test green otherwise)
    from deepseek_ocr_spark.operators import _cache
    from deepseek_ocr_spark.operators.similarity import semantic_dedup

    _cache.release("semdedup_idx")
    semantic_dedup(vecs, threshold=0.999, centroids=cents)
    assert "semdedup_idx" in _cache._live
    _cache.release("semdedup_idx")


def test_p7b_packing_single_exchange_pruned_scan(spark):
    """P7b: the pack fill is ONE Exchange on (_shard, oversize); the
    pack-id groupBy keys are a superset of that partitioning so the
    aggregation reuses it (no second shuffle), and the documents scan
    reads only (doc_id, n_chars)."""
    plan = _plan(Q.p7b_sequence_packing(spark, SF_DIR))
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(exchanges) == 1, exchanges
    assert "_shard" in exchanges[0] and "oversize" in exchanges[0], exchanges
    assert "Python" not in plan
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "doc_id" in scan[0] and "n_chars" in scan[0], scan
    assert "text" not in scan[0], scan
