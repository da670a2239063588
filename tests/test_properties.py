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
