"""Gopher repetition signals: hand-computed fractions on small docs and
the composite gate at the published thresholds."""

from deepseek_ocr_spark.operators.quality import repetition_signals


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in repetition_signals(docs, **kw).collect()}


def test_duplicate_line_fractions(spark):
    got = _run(spark, [(1, "aaa\nbbb\naaa"), (2, "one\ntwo\nthree")])
    # doc 1: 3 lines, 2 distinct -> dup_line_frac 1/3; chars in
    # duplicated lines = both "aaa" copies = 6 of 9
    assert got[1]["dup_line_frac"] == round(1 / 3, 6)
    assert got[1]["dup_line_char_frac"] == round(6 / 9, 6)
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["dup_line_char_frac"] == 0.0


def test_adversarial_many_line_doc_is_subquadratic(spark):
    """20k-line doc with heavy line duplication: the sorted-adjacent
    dup-char fold is O(L log L) — under the old nested-filter form this
    single row cost ~4·10⁸ interpreted lane-ops (minutes); now it's one
    array_sort + three O(L) passes. Values pinned vs a Python
    reference."""
    uniq = [f"line-{i:05d}" for i in range(10_000)]
    dups = [f"dup-{i % 50:03d}" for i in range(10_000)]  # 50 values ×200
    lines = [v for pair in zip(uniq, dups) for v in pair]
    text = "\n".join(lines)
    got = _run(spark, [(1, text)], top_ns=(), dup_ns=())[1]
    n = len(lines)
    n_dupl = n - len(set(lines))
    dup_chars = sum(len(x) for x in dups)  # every dup-line value occurs 200x
    total = sum(len(x) for x in lines)
    assert got["dup_line_frac"] == round(n_dupl / n, 6)
    assert got["dup_line_char_frac"] == round(dup_chars / total, 6)


def test_single_and_two_line_edges(spark):
    # L=1 (no neighbors) and L=2 equal/unequal — slice boundary cases of
    # the sorted-adjacent fold
    got = _run(spark, [(1, "solo"), (2, "same\nsame"), (3, "a\nb")])
    assert got[1]["dup_line_char_frac"] == 0.0
    assert got[2]["dup_line_frac"] == 0.5
    assert got[2]["dup_line_char_frac"] == 1.0
    assert got[3]["dup_line_char_frac"] == 0.0


def test_top_ngram_char_fraction_flags_cycled_text(spark):
    # "x y" 2-gram occurs 4x, each gram is 3 chars (SEP joiner counts 1
    # like the space it stands for); doc chars = 15
    got = _run(spark, [(1, "x y x y x y x y")], top_ns=(2,), dup_ns=())
    assert got[1]["top_2gram_char_frac"] == round(4 * 3 / 15, 6)
    assert not got[1]["gopher_repetition_ok"]  # 0.8 > 0.20


def test_dup_ngram_char_fraction(spark):
    # a repeated 5-token run: "a b c d e" occurs twice inside
    # "a b c d e q1 q2 q3 q4 q5 q6 q7 q8 q9 a b c d e"
    text = "a b c d e " + " ".join(f"q{i}" for i in range(1, 10)) + " a b c d e"
    got = _run(spark, [(1, text)], top_ns=(), dup_ns=(5,))
    # duplicated 5-grams: exactly the two "a b c d e" occurrences
    # (9 chars each) over len(text) chars
    assert got[1]["dup_5gram_char_frac"] == round(2 * 9 / len(text), 6)
    expect_ok = (2 * 9 / len(text)) <= 0.15  # ≈0.39 → gate fails
    assert got[1]["gopher_repetition_ok"] == expect_ok


def test_clean_doc_passes_gate(spark):
    text = " ".join(f"w{i}" for i in range(60))
    got = _run(spark, [(1, text)])
    assert got[1]["gopher_repetition_ok"]
    assert got[1]["dup_line_frac"] == 0.0
    for n in (5, 6, 7, 8, 9, 10):
        assert got[1][f"dup_{n}gram_char_frac"] == 0.0


def test_empty_and_null_text_rows_survive(spark):
    got = _run(spark, [(1, ""), (2, None)])
    assert set(got) == {1, 2}
    for d in got.values():
        assert d["gopher_repetition_ok"]
        assert d["dup_line_frac"] == 0.0


def test_pii_signals_and_redaction(spark):
    from deepseek_ocr_spark.operators.quality import pii_signals, redact_pii

    rows = [
        (1, "reach me at jane.doe+x@example.co.uk or (555) 867-5309 via 192.168.1.254 thanks"),
        (2, "no pii here, just text about version 1.2.3.4.5 and a@b (not an email)"),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r for r in pii_signals(docs).collect()}
    assert (sig[1]["n_email"], sig[1]["n_phone"], sig[1]["n_ip"]) == (1, 1, 1)
    assert (sig[2]["n_email"], sig[2]["n_phone"], sig[2]["n_ip"]) == (0, 0, 0)
    assert (sig[3]["n_email"], sig[3]["n_phone"], sig[3]["n_ip"]) == (0, 0, 0)
    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert red[1] == (
        "reach me at |||EMAIL_ADDRESS||| or |||PHONE_NUMBER||| "
        "via |||IP_ADDRESS||| thanks"
    )
    assert red[2] == rows[1][1]


def test_phone_regex_rejects_longer_digit_runs(spark):
    """ADVICE r4: the phone pattern must not fire inside longer digit
    runs — guards (?<![\\d-]) ... (?![\\d-]) mirror the IP pattern's."""
    from deepseek_ocr_spark.operators.quality import pii_signals, redact_pii

    rows = [
        (1, "call 555-123-45678 now"),      # 5-digit tail: not a phone
        (2, "id 9555-123-4567 here"),       # 4-digit head: not a phone
        (3, "call 555-123-4567 now"),       # real phone
        (4, "dial +1 (555) 123-4567 ok"),   # real phone, +1/parens form
        (5, "serial 555-123-4567-89 x"),    # dash-embedded: not a phone
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r["n_phone"] for r in pii_signals(docs).collect()}
    assert sig == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}
    red = {r["doc_id"]: r["text"] for r in redact_pii(docs).collect()}
    assert red[1] == rows[0][1]
    assert red[2] == rows[1][1]
    assert red[3] == "call |||PHONE_NUMBER||| now"
    assert red[4] == "dial |||PHONE_NUMBER||| ok"
    assert red[5] == rows[4][1]


def _brute_fracs(toks, top_ns, dup_ns):
    """Pure-Python reference for the coverage kernel's published
    semantics: top = coverage of the max-count n-gram (coverage
    tie-break), dup = summed coverage of n-grams occurring > 1 time;
    gram chars = token chars + (n-1) separators; denominator =
    len(text)."""
    from collections import Counter

    total = len(" ".join(toks))
    out = {}
    for kind, ns in (("top", top_ns), ("dup", dup_ns)):
        for n in ns:
            grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            c = Counter(grams)
            if not c:
                out[f"{kind}_{n}"] = 0.0
                continue
            glen = {g: sum(map(len, g)) + (n - 1) for g in c}
            if kind == "top":
                mx = max(c.values())
                cov = max(cnt * glen[g] for g, cnt in c.items() if cnt == mx)
            else:
                cov = sum(cnt * glen[g] for g, cnt in c.items() if cnt > 1)
            out[f"{kind}_{n}"] = min(round(cov / total, 6), 1.0) if total else 0.0
    return out


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    toks=st.lists(
        st.sampled_from(["aa", "bbb", "c", "dddd"]), min_size=0, max_size=30
    )
)
def test_fuzz_coverage_kernel_vs_counter(spark_mod2, toks):
    docs = spark_mod2.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    row = repetition_signals(docs, top_ns=(2, 3), dup_ns=(4, 5)).collect()[0]
    want = _brute_fracs(toks, (2, 3), (4, 5))
    assert row["top_2gram_char_frac"] == want["top_2"]
    assert row["top_3gram_char_frac"] == want["top_3"]
    assert row["dup_4gram_char_frac"] == want["dup_4"]
    assert row["dup_5gram_char_frac"] == want["dup_5"]


import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_mod2(spark):
    return spark
