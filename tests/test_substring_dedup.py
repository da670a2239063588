"""Cross-document exact-substring dedup (ExactSubstr semantics): shared
n-token passages are flagged at every site but the globally first,
overlapping windows merge into one interval, and suppression cuts the
flagged tokens out of the text."""

import pytest

from deepseek_ocr_spark.operators.substring_dedup import (
    substring_dup_spans,
    suppress_duplicate_substrings,
)

N = 8  # small window for readable fixtures; the operator default is 50


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _u(prefix, k):
    """k unique filler tokens (never repeat across prefixes)."""
    return " ".join(f"{prefix}{i}" for i in range(k))


SHARED = " ".join(f"shared{i}" for i in range(12))  # 12 > N: windows overlap


def test_shared_passage_flagged_at_second_site_only(spark):
    docs = _docs(
        spark,
        [
            (1, _u("a", 5) + " " + SHARED + " " + _u("b", 5)),
            (2, _u("c", 5) + " " + SHARED + " " + _u("d", 5)),
        ],
    )
    got = substring_dup_spans(docs, n=N).collect()
    # doc 1 holds the globally-first sites; only doc 2's copy is flagged,
    # and its 5 overlapping windows (positions 5..9) merge to ONE
    # interval covering exactly the 12 shared tokens
    assert [(r["doc_id"], r["start_ord"], r["end_ord"]) for r in got] == [
        (2, 5, 16)
    ]


def test_keep_first_false_flags_every_site(spark):
    docs = _docs(
        spark,
        [
            (1, _u("a", 5) + " " + SHARED),
            (2, _u("c", 3) + " " + SHARED),
        ],
    )
    got = {
        (r["doc_id"], r["start_ord"], r["end_ord"])
        for r in substring_dup_spans(docs, n=N, keep_first=False).collect()
    }
    assert got == {(1, 5, 16), (2, 3, 14)}


def test_within_doc_repetition_flags_second_occurrence(spark):
    docs = _docs(spark, [(7, SHARED + " " + _u("x", 4) + " " + SHARED)])
    got = substring_dup_spans(docs, n=N).collect()
    assert [(r["doc_id"], r["start_ord"], r["end_ord"]) for r in got] == [
        (7, 16, 27)
    ]


def test_disjoint_passages_stay_separate_intervals(spark):
    s2 = " ".join(f"other{i}" for i in range(9))
    docs = _docs(
        spark,
        [
            (1, SHARED + " " + s2),
            (2, SHARED + " " + _u("q", 20) + " " + s2),
        ],
    )
    got = sorted(
        (r["doc_id"], r["start_ord"], r["end_ord"])
        for r in substring_dup_spans(docs, n=N).collect()
    )
    # doc 2: shared at 0..11, other at 32..40 — a 20-token unique gap
    # keeps them two intervals
    assert got == [(2, 0, 11), (2, 32, 40)]


def test_short_docs_and_no_dups_yield_nothing(spark):
    docs = _docs(
        spark,
        [
            (1, _u("a", N - 1)),  # shorter than one window
            (2, _u("b", 30)),  # unique content
            (3, None),  # NULL text
        ],
    )
    assert substring_dup_spans(docs, n=N).count() == 0


def test_suppress_cuts_flagged_tokens_and_keeps_rest(spark):
    d1 = _u("a", 5) + " " + SHARED + " " + _u("b", 5)
    d2 = _u("c", 5) + " " + SHARED + " " + _u("d", 5)
    docs = _docs(spark, [(1, d1), (2, d2)])
    got = {
        r["doc_id"]: r["text"]
        for r in suppress_duplicate_substrings(docs, n=N).collect()
    }
    # doc 1 (first site) untouched; doc 2 loses exactly the shared run
    assert got[1] == d1
    assert got[2] == _u("c", 5) + " " + _u("d", 5)


def test_window_hash_collision_free_on_distinct_windows(spark):
    """Sanity on the rolling hash: every window of a long all-unique
    token doc hashes distinctly, and an order swap changes the hash
    (the polynomial is order-sensitive — a window SUM would not be)."""
    from pyspark.sql import functions as F

    from deepseek_ocr_spark.operators.substring_dedup import (
        _kernel,
        token_hashes,
    )

    docs = _docs(
        spark,
        [(1, _u("t", 200)), (2, "x y " + _u("p", N - 2)), (3, "y x " + _u("p", N - 2))],
    )
    out = docs.select(
        "doc_id", _kernel(N)(token_hashes(F.col("text"))).alias("wh")
    ).collect()
    by_id = {r["doc_id"]: r["wh"] for r in out}
    assert len(set(by_id[1])) == 200 - N + 1
    assert by_id[2][0] != by_id[3][0]


def test_n_below_two_raises(spark):
    with pytest.raises(ValueError, match="n must be"):
        substring_dup_spans(_docs(spark, [(1, "a b")]), n=1)


def _brute_flagged(corpus, n, keep_first):
    """Pure-Python reference: token-coverage set per doc of windows whose
    literal token tuple occurs at >= 2 sites (optionally exempting the
    globally first site by (doc, pos))."""
    sites = {}
    for doc_id, toks in corpus:
        for i in range(len(toks) - n + 1):
            sites.setdefault(tuple(toks[i : i + n]), []).append((doc_id, i))
    flagged = {d: set() for d, _ in corpus}
    for occ in sites.values():
        if len(occ) < 2:
            continue
        exempt = min(occ) if keep_first else None
        for doc_id, i in occ:
            if (doc_id, i) != exempt:
                flagged[doc_id].update(range(i, i + n))
    return {d: s for d, s in flagged.items() if s}


def _spans_to_coverage(rows):
    cov = {}
    for r in rows:
        cov.setdefault(r["doc_id"], set()).update(
            range(r["start_ord"], r["end_ord"] + 1)
        )
    return cov


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_tok = st.sampled_from(["aa", "bb", "cc"])


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(
        st.lists(_tok, min_size=0, max_size=14), min_size=1, max_size=4
    ),
    keep_first=st.booleans(),
)
def test_fuzz_vs_bruteforce(spark_mod, corpus, keep_first):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    docs = spark_mod.createDataFrame(rows, "doc_id long, text string")
    got = _spans_to_coverage(
        substring_dup_spans(docs, n=3, keep_first=keep_first).collect()
    )
    want = _brute_flagged(list(enumerate(corpus)), 3, keep_first)
    assert got == want


@pytest.fixture(scope="module")
def spark_mod(spark):
    return spark


def test_suppress_preserves_original_casing(spark):
    """Detection is case-folded (lower()), but suppression must rebuild
    from the ORIGINAL tokens — a survivor's casing is untouched."""
    shared_a = SHARED  # lowercase in doc 1 → doc 1 is the first site
    shared_b = SHARED.upper()  # case-folded equal → still a dup site
    d1 = _u("a", 5) + " " + shared_a
    d2 = "Keep CASED tokens " + shared_b + " TaIl0 TaIl1 TaIl2 TaIl3 TaIl4"
    docs = _docs(spark, [(1, d1), (2, d2)])
    got = {
        r["doc_id"]: r["text"]
        for r in suppress_duplicate_substrings(docs, n=N).collect()
    }
    assert got[1] == d1
    assert got[2] == "Keep CASED tokens TaIl0 TaIl1 TaIl2 TaIl3 TaIl4"


def test_decontaminate_flags_only_overlapping_train_docs(spark):
    from deepseek_ocr_spark.operators.substring_dedup import decontaminate

    bench = _docs(spark, [(100, "The Quick Brown fox JUMPS over the lazy dog today")])
    train = _docs(
        spark,
        [
            # contains the benchmark 8-gram (case-folded match)
            (1, _u("a", 4) + " the quick brown FOX jumps over THE lazy " + _u("b", 3)),
            (2, _u("c", 30)),  # clean
            (3, _u("d", N - 1)),  # too short to hold a window
        ],
    )
    got = {
        r["doc_id"]: (r["contaminated"], r["n_hits"])
        for r in decontaminate(train, bench, n=N).collect()
    }
    assert got[1][0] and got[1][1] >= 1
    assert got[2] == (False, 0) and got[3] == (False, 0)
    # every train row survives with its columns intact (flag, not drop)
    assert set(got) == {1, 2, 3}


def test_decontaminate_oversized_benchmark_raises_eagerly(spark):
    """VERDICT r4 #5: the benchmark-window broadcast has an EAGER size
    guard — construction raises (before any train-side work) when the
    benchmark's distinct windows exceed the bound."""
    import pytest

    from deepseek_ocr_spark.operators.substring_dedup import decontaminate

    big_bench = _docs(
        spark, [(i, " ".join(f"tok{i}_{j}" for j in range(40))) for i in range(3)]
    )  # 3 docs × (40-13+1)=28 windows = 84 distinct windows
    train = _docs(spark, [(1, _u("a", 30))])
    with pytest.raises(ValueError, match="max_benchmark_windows"):
        decontaminate(train, big_bench, n=13, max_benchmark_windows=50)
    # None disables the probe (plan-only contexts)
    decontaminate(train, big_bench, n=13, max_benchmark_windows=None)
