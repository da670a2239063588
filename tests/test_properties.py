"""Property-based tests (hypothesis) for the pure-Python oracle layer —
fast invariants that complement the golden-equality suite. (Reference
test pattern: deterministic seeded fuzz, conftest.py:125-128.)"""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepseek_ocr_spark import oracle

WORD = st.text(alphabet="abcxyz", min_size=1, max_size=4)
TEXT = st.lists(WORD, min_size=0, max_size=60).map(" ".join)

SPAN = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "title", "table", "image", "footer", "nav"]),
        "text": TEXT,
        "media_ref": st.none(),
        "offset": st.integers(0, 100),
    }
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_collapse_idempotent(text):
    once = oracle._collapse_repeats(text)
    assert oracle._collapse_repeats(once) == once


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_collapse_never_grows(text):
    assert len(oracle._collapse_repeats(text)) <= len(text)


@settings(max_examples=200, deadline=None)
@given(st.lists(SPAN, min_size=0, max_size=20))
def test_oracle_spans_invariants(spans):
    # offsets must be unique for a valid doc; dedupe then densify
    seen = set()
    uniq = []
    for s in spans:
        if s["offset"] not in seen:
            seen.add(s["offset"])
            uniq.append(s)
    out = oracle.oracle_spans_doc(uniq)
    offs = [s["offset"] for s in out["spans"]]
    # dense 0..n-1 offsets after re-offsetting
    assert offs == list(range(len(offs)))
    # media refs numbered sequentially in order
    refs = [s["media_ref"] for s in out["spans"] if s["kind"] == "media"]
    assert refs == [f"images/{i}.jpg" for i in range(len(refs))]
    # no boilerplate kinds survive
    assert all(s["kind"] not in oracle.BOILER_KINDS for s in out["spans"])
    # metrics consistency
    m = out["metrics"]
    assert m["blocks_kept"] == len(out["spans"])
    assert m["blocks_kept"] + m["blocks_dropped"] == len(uniq)
    assert m["char_yield"] == sum(len(s["text"]) for s in out["spans"])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=60),
    st.integers(2, 5),
    st.integers(1, 30),
)
def test_ngram_ban_prefix_form_equals_fullmatch_form(tokens, n, w):
    """The reference processor's prefix-set formulation (ban token values
    completing a repeated prefix) is equivalent to 'the full ngram ending
    at t occurs starting in [t-w, t-n]' — the reformulation the
    relational operator (operators/ngram_ban.py) joins on."""
    got = set(oracle.oracle_ngram_ban(tokens, n, w))
    exp = set()
    for t in range(n, len(tokens)):
        cur = tuple(tokens[t - n + 1 : t + 1])
        for i in range(max(0, t - w), t - n + 1):
            if tuple(tokens[i : i + n]) == cur:
                exp.add(t)
                break
    assert got == exp


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(TEXT, st.booleans()), min_size=0, max_size=6))
def test_oracle_pdf_page_accounting(pages_spec):
    pages = [
        (t + oracle.EOS) if has_eos else t for (t, has_eos) in pages_spec
    ]
    out = oracle.oracle_pdf_doc(pages)
    m = out["metrics"]
    assert m["pages_in"] == len(pages)
    assert m["pages_kept"] == sum(1 for _, e in pages_spec if e)
    # kept pages join with the page separator
    assert out["clean_text"].count(oracle.PAGE_SPLIT) == m["pages_kept"]


# --- signature-kernel fold fuzz (pure numpy, no Spark) -----------------
# The pooled-buffer folds in operators/dedup.py chunk doc batches into
# _KERNEL_CHUNK-hash slabs and take a sub-slab path for docs longer than
# one slab. Lengths straddling the slab boundary are the risk surface
# (a doc past capacity used to hit _buf's silent clamp -> broadcast
# ValueError). Fuzz variable-length batches against a naive unpooled
# per-row reference.

import numpy as np

from deepseek_ocr_spark.operators import dedup as _D

_LEN = st.sampled_from(
    [0, 1, 5, _D._KERNEL_CHUNK - 1, _D._KERNEL_CHUNK, _D._KERNEL_CHUNK + 1,
     2 * _D._KERNEL_CHUNK, 2 * _D._KERNEL_CHUNK + 7, 3 * _D._KERNEL_CHUNK - 1]
)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(_LEN, st.integers(0, 2**31)), min_size=1, max_size=6))
def test_fold_segments_matches_naive_reference(specs):
    arrs = [
        np.random.RandomState(seed % 2**31).randint(
            0, 1 << 28, size=n
        ).astype(np.int64)
        for n, seed in specs
    ]
    lens = np.asarray([len(a) for a in arrs], dtype=np.int64)

    def derive(flat):
        t = _D._buf(len(flat), _D.MINHASH_K, np.int64)
        np.multiply(flat[:, None], _D._MH_A_V, out=t)
        t += _D._MH_B_V
        t %= _D.MH_PRIME
        return t

    got = _D._fold_segments(
        arrs, lens, derive, np.minimum, _D.MH_PRIME, _D.MINHASH_K
    )
    for k, a in enumerate(arrs):
        if len(a) == 0:
            ref = np.full(_D.MINHASH_K, _D.MH_PRIME, dtype=np.int64)
        else:
            ref = np.minimum.reduce(
                (a[:, None] * _D._MH_A_V + _D._MH_B_V) % _D.MH_PRIME, axis=0
            )
        assert np.array_equal(got[k], ref), (k, len(a))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(_LEN, st.integers(0, 2**31)), min_size=1, max_size=6))
def test_simhash_fold_matches_naive_reference(specs):
    arrs = [
        np.random.RandomState(seed % 2**31).randint(
            -(1 << 62), 1 << 62, size=n
        ).astype(np.int64)
        for n, seed in specs
    ]
    lens = np.asarray([len(a) for a in arrs], dtype=np.int64)

    def derive(flat):
        t = _D._buf(len(flat), _D.SIMHASH_BITS, np.int64)
        np.right_shift(flat[:, None], _D._BIT_J, out=t)
        t &= 1
        t *= 2
        t -= 1
        return t

    got = _D._fold_segments(arrs, lens, derive, np.add, 0, _D.SIMHASH_BITS)
    for k, a in enumerate(arrs):
        ref = (
            np.zeros(_D.SIMHASH_BITS, dtype=np.int64)
            if len(a) == 0
            else np.add.reduce(((a[:, None] >> _D._BIT_J) & 1) * 2 - 1, axis=0)
        )
        assert np.array_equal(got[k], ref), (k, len(a))
