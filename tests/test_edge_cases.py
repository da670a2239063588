"""Edge-case correctness for the flagship span pipeline: empty/null
arrays, null/blank/unicode/metacharacter texts, sparse offsets — each
compared against the pure-Python oracle (or asserted non-crashing where
the oracle's domain doesn't define the input)."""

from pyspark.sql import functions as F

from deepseek_ocr_spark import oracle
from deepseek_ocr_spark.operators.spans_pipeline import extract_spans

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _run_both(spark, spans):
    df = spark.createDataFrame([("d", spans)], SCHEMA)
    got = extract_spans(df).collect()[0]
    exp = oracle.oracle_spans_doc(
        [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in spans
        ]
    )
    got_spans = [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["spans"]
    ]
    exp_spans = [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["spans"]
    ]
    assert got_spans == exp_spans
    for k in ("parse_failures", "blocks_dropped", "blocks_kept", "media_spans", "char_yield"):
        assert got[k] == exp["metrics"][k], k
    return got


def test_empty_span_array(spark):
    got = _run_both(spark, [])
    assert got["spans"] == [] and got["char_yield"] == 0


def test_null_spans_column_no_crash(spark):
    df = spark.createDataFrame([("d", None)], SCHEMA)
    row = extract_spans(df).collect()[0]
    assert row["spans"] in (None, [])


def test_null_text_span(spark):
    _run_both(spark, [("text", None, None, 0), ("image", None, None, 1)])


def test_blank_and_whitespace_spans_dropped(spark):
    got = _run_both(
        spark,
        [("text", "   ", None, 0), ("text", "\n\n", None, 1), ("text", "keep", None, 2)],
    )
    assert [s["text"] for s in got["spans"]] == ["keep"]


def test_unicode_texts(spark):
    _run_both(
        spark,
        [
            ("text", "汉字文本 مرحبا שלום", None, 0),
            ("title", "emoji 🎉🚀 ok", None, 1),
            ("text", "combining éé", None, 2),
            ("image", None, None, 3),
        ],
    )


def test_regex_metacharacters_in_data(spark):
    """User data containing replacement/group metacharacters must be
    treated as data by every regex stage."""
    _run_both(
        spark,
        [
            ("text", "price $1 and $2 and \\1 backref", None, 0),
            ("text", "a(b)c [d] {e} |f| ^g$ .h* +i? \\ trailing", None, 1),
            ("table", "<td>$1$1</td><td>$1$1</td><td>$1$1</td>", None, 2),
        ],
    )


def test_sparse_and_unordered_offsets(spark):
    """Offsets with gaps and shuffled order: output order follows offset
    sort, then re-densifies."""
    got = _run_both(
        spark,
        [
            ("text", "third", None, 30),
            ("image", None, None, 5),
            ("text", "second", None, 10),
        ],
    )
    assert [(s["offset"], s["text"]) for s in got["spans"]] == [
        (0, "![](images/0.jpg)\n"),
        (1, "second"),
        (2, "third"),
    ]


def test_grounding_inside_span_text(spark):
    """Grounding blocks embedded in span text are stripped (X7) and
    malformed det payloads counted (X3)."""
    got = _run_both(
        spark,
        [
            (
                "text",
                "before <|ref|>text<|/ref|><|det|>[[1,2,3,4]]<|/det|> after",
                None,
                0,
            ),
            ("text", "bad <|ref|>x<|/ref|><|det|>[[9, 9<|/det|> det", None, 1),
        ],
    )
    assert got["parse_failures"] == 1
    assert "<|ref|>" not in got["spans"][0]["text"]


def test_repetition_collapse_and_td_whitelist(spark):
    gram = "w1 w2 w3 w4 "
    got = _run_both(
        spark,
        [
            ("text", (gram * 7).strip() + " tail", None, 0),
            ("table", "<td>" + (gram * 7).strip() + "</td>", None, 1),
        ],
    )
    # collapsed to 2 occurrences (+ the unspaced tail copy survives)
    assert got["spans"][0]["text"].count("w1") < 7
    # <td> cell untouched
    assert got["spans"][1]["text"].count("w1") == 7


def test_huge_span_count(spark):
    """500-span doc: array-local numbering is O(k^2) — stays fast and
    correct at the cap the reference's own tiling bounds imply."""
    spans = [
        ("image", None, None, i) if i % 5 == 0 else ("text", f"t{i}", None, i)
        for i in range(500)
    ]
    got = _run_both(spark, spans)
    assert got["media_spans"] == 100
    assert got["spans"][0]["media_ref"] == "images/0.jpg"
