"""F1 faithful windowed no-repeat-ngram: the relational Spark operator
must flag exactly the positions the reference processor would ban
(oracle.oracle_ngram_ban = statement port of process/ngram_norepeat.py),
across the reference's (ngram_size, window_size) parameter set."""

import random

import pytest

from deepseek_ocr_spark import oracle
from deepseek_ocr_spark.operators.ngram_ban import ngram_ban_flags

REF_PARAMS = [(20, 50), (30, 90), (40, 90)]  # run_dpsk_ocr_*.py configs
SMALL_PARAMS = [(2, 5), (3, 10), (3, 25), (4, 100)]


def _spark_positions(spark, texts, n, w, whitelist=("<td>", "</td>")):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    out = ngram_ban_flags(
        df, ngram_size=n, window_size=w, whitelist=whitelist
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["pos"])
    return got


def _oracle_positions(texts, n, w, whitelist=frozenset({"<td>", "</td>"})):
    out = {}
    for i, t in enumerate(texts):
        s = set(oracle.oracle_ngram_ban(t.split(), n, w, whitelist))
        if s:  # single oracle run per text (it is pure-Python and slow)
            out[str(i)] = s
    return out


@pytest.mark.parametrize("n,w", SMALL_PARAMS)
def test_random_sequences_match_reference(spark, n, w):
    rnd = random.Random(1000 * n + w)
    vocab = ["a", "b", "c", "d"]
    texts = [
        " ".join(rnd.choice(vocab) for _ in range(150)) for _ in range(12)
    ]
    assert _spark_positions(spark, texts, n, w) == _oracle_positions(texts, n, w)


@pytest.mark.parametrize("n,w", REF_PARAMS)
def test_reference_params_on_degenerate_pages(spark, n, w):
    """The reference params fire on exactly the degenerate-OCR shape:
    a phrase loop longer than the ngram but inside the window."""
    rnd = random.Random(n + w)
    vocab = [f"w{i}" for i in range(8)]
    texts = []
    for i in range(6):
        base = [rnd.choice(vocab) for _ in range(n + 5 + i)]
        texts.append(" ".join(base * 6))  # degenerate repetition loop
    got, exp = _spark_positions(spark, texts, n, w), _oracle_positions(texts, n, w)
    assert got == exp
    assert exp, "degenerate pages must produce bans"


def test_window_excludes_old_repeats(spark):
    """A repeat OUTSIDE the window is not banned; the same repeat inside
    a larger window is — the windowed-history semantics the span-level
    collapse cannot express."""
    filler = " ".join(f"u{i}" for i in range(30))
    text = f"x y z {filler} x y z"
    assert _spark_positions(spark, [text], 3, 20) == {}
    assert _spark_positions(spark, [text], 3, 100) == {"0": {35}}


def test_interleaved_repeat_is_caught(spark):
    """'a b c q a b c' — the phrase repeats with a gap; the consecutive
    -run collapse misses it, the faithful window ban catches position 6
    (VERDICT r1 gap #2)."""
    got = _spark_positions(spark, ["a b c q a b c"], 3, 50)
    assert got == {"0": {6}}


def test_whitelist_tokens_never_banned(spark):
    text = "<td> cell </td> <td> cell </td> <td> cell </td>"
    got = _spark_positions(spark, [text], 3, 50)
    exp = _oracle_positions([text], 3, 50)
    assert got == exp
    toks = text.split()
    banned_toks = {toks[p] for p in got.get("0", set())}
    assert banned_toks == {"cell"}

    # without the whitelist the markup tokens are banned too
    got_nw = _spark_positions(spark, [text], 3, 50, whitelist=())
    exp_nw = _oracle_positions([text], 3, 50, frozenset())
    assert got_nw == exp_nw
    assert got_nw["0"] > got["0"]


def test_window_smaller_than_ngram_bans_nothing(spark):
    assert _spark_positions(spark, ["a b a b a b a b"], 3, 2) == {}


def test_apply_ngram_ban_matches_oracle_suppression(spark):
    """clean_text must equal the token sequence with oracle-banned
    positions dropped, joined by single spaces."""
    from deepseek_ocr_spark.operators.ngram_ban import apply_ngram_ban

    rnd = random.Random(99)
    vocab = ["a", "b", "c"]
    texts = [" ".join(rnd.choice(vocab) for _ in range(80)) for _ in range(8)]
    texts.append("x y z q x y z <td> k </td> <td> k </td> <td> k </td>")
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_banned"])
        for r in apply_ngram_ban(df, ngram_size=3, window_size=25).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split()
        banned = set(
            oracle.oracle_ngram_ban(toks, 3, 25, frozenset({"<td>", "</td>"}))
        )
        kept = [tok for p, tok in enumerate(toks) if p not in banned]
        assert got[str(i)] == (" ".join(kept), len(kept), len(banned)), i


def test_apply_ngram_ban_null_text_doc_is_kept(spark):
    """A NULL-text doc must appear in the per-doc output under the
    engine-wide NULL ≡ '' split convention (one empty token, nothing
    banned) — split(NULL) used to posexplode to zero rows and silently
    drop the doc_id from the contract."""
    from deepseek_ocr_spark.operators.ngram_ban import apply_ngram_ban

    df = spark.createDataFrame(
        [("n0", None), ("n1", "x y x y x y")], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_banned"])
        for r in apply_ngram_ban(df, ngram_size=2, window_size=10).collect()
    }
    assert set(got) == {"n0", "n1"}
    assert got["n0"] == ("", 1, 0)


def test_degenerate_page_bounded_blowup(spark):
    """A pathological all-identical-token page: every ngram is equal, but
    the join fan-out is bounded by the window (each position matches at
    most window-n+1 earlier starts), so the op completes fast and all
    positions >= n are banned — matching the oracle."""
    n_tok = 5000
    text = " ".join(["loop"] * n_tok)
    got = _spark_positions(spark, [text], 3, 50)
    assert got == {"0": set(range(3, n_tok))}
