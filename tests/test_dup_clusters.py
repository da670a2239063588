"""Connected-components duplicate-cluster collapse: dup_clusters must
equal the transitive closure of the pair list (checked against a pure
union-find reference on known topologies and under a hypothesis fuzz),
and collapse_duplicates must keep exactly one doc per cluster."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_spark.operators.dedup import collapse_duplicates, dup_clusters


def _uf_clusters(edges):
    """Pure-Python union-find reference: {node: min node in component},
    nodes = those appearing in at least one edge."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in parent:
        r = find(n)
        # root is not guaranteed minimal under path-compression order;
        # normalize via min over members
        out.setdefault(r, []).append(n)
    return {n: min(members) for members in out.values() for n in members}


def _run(spark, edges):
    if not edges:
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    else:
        pairs = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
        )
    rows = dup_clusters(pairs).collect()
    return {r["doc_id"]: r["cluster_id"] for r in rows}


def test_chain_is_one_cluster(spark):
    # A-B, B-C, C-D: no pair A-D, but the cluster is {A,B,C,D}
    got = _run(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components_and_direction_independence(spark):
    # edges given in arbitrary direction/order
    got = _run(spark, [(5, 2), (9, 8), (2, 1), (7, 8)])
    assert got == {1: 1, 2: 1, 5: 1, 7: 7, 8: 7, 9: 7}


def test_cycle_and_star(spark):
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (10, 12), (10, 13)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_empty_pairs(spark):
    assert _run(spark, []) == {}


def test_long_path_converges_within_log_bound(spark):
    """A 64-node path is the adversarial diameter case: plain
    propagation needs 63 rounds; pointer doubling must finish well
    inside the default max_iter=50 (expected ~log2(64)+2)."""
    edges = [(i, i + 1) for i in range(64)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(65)}


def test_string_ids_lexicographic_min(spark):
    pairs = spark.createDataFrame(
        [("docB", "docA"), ("docB", "docC")], "doc_a string, doc_b string"
    )
    rows = dup_clusters(pairs).collect()
    assert {r["doc_id"]: r["cluster_id"] for r in rows} == {
        "docA": "docA",
        "docB": "docA",
        "docC": "docA",
    }


def test_max_iter_raises_not_truncates(spark):
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="did not converge"):
        dup_clusters(pairs, max_iter=2)


def test_collapse_keeps_one_per_cluster_and_all_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    rows = collapse_duplicates(docs, pairs).collect()
    kept = sorted(r["doc_id"] for r in rows if r["kept"])
    assert kept == [0, 3, 4, 5, 7, 8, 9]
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[2]["cluster_id"] == 0 and not by_id[2]["kept"]
    assert by_id[6]["cluster_id"] == 5 and not by_id[6]["kept"]
    assert by_id[3]["cluster_id"] is None and by_id[3]["kept"]


@settings(max_examples=12, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=0,
        max_size=40,
    )
)
def test_fuzz_vs_union_find(spark_global, edges):
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark_global, edges) == _uf_clusters(edges)


@pytest.fixture(scope="module")
def spark_global(spark):
    # hypothesis can't take function-scoped fixtures; rebind the shared
    # session-scoped one at module scope.
    return spark
