"""Golden span-sequence equality vs the pure-Python oracle (comparator
pattern, SURVEY §5.2): Spark pipelines A and B must reproduce the oracle
byte-exactly on (kind, text, media_ref, order) for every fixture doc."""

import pytest

from deepseek_ocr_spark import corpus, oracle
from deepseek_ocr_spark.operators.extraction import extract_pdf
from deepseek_ocr_spark.operators.spans_pipeline import extract_spans

N_DOCS = 120
SEED = 42


@pytest.fixture(scope="module")
def fixture_docs():
    docs = [corpus.gen_doc(SEED, i) for i in range(N_DOCS)]
    return docs


def _spans_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_pipeline_a_matches_oracle(spark, fixture_docs):
    pages_df = spark.createDataFrame(
        [
            (doc_id, page_no, content)
            for doc_id, _, pages in fixture_docs
            for page_no, content in pages
        ],
        "doc_id string, page_no int, content string",
    )
    got = {
        r["doc_id"]: r
        for r in extract_pdf(pages_df).collect()
    }
    assert len(got) == N_DOCS
    mismatches = 0
    for doc_id, _, pages in fixture_docs:
        expect = oracle.oracle_pdf_doc([c for _, c in pages])
        g = got[doc_id]
        assert g["clean_text"] == expect["clean_text"], doc_id
        exp_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in expect["spans"]
        ]
        got_spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ]
        if exp_spans != got_spans:
            mismatches += 1
        m = expect["metrics"]
        assert g["pages_in"] == m["pages_in"], doc_id
        assert g["pages_kept"] == m["pages_kept"], doc_id
        assert g["parse_failures"] == m["parse_failures"], doc_id
        assert g["blocks_dropped"] == m["blocks_dropped"], doc_id
        assert g["media_spans"] == m["media_spans"], doc_id
        assert g["char_yield"] == m["char_yield"], doc_id
    assert mismatches == 0


def test_pipeline_b_matches_oracle(spark, fixture_docs):
    docs_df = spark.createDataFrame(
        [
            (doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
            for doc_id, spans, _ in fixture_docs
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {r["doc_id"]: r for r in extract_spans(docs_df).collect()}
    assert len(got) == N_DOCS
    for doc_id, spans, _ in fixture_docs:
        expect = oracle.oracle_spans_doc(spans)
        g = got[doc_id]
        exp = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in expect["spans"]
        ]
        gotten = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ]
        assert gotten == exp, f"{doc_id}\n{gotten[:3]}\n{exp[:3]}"
        m = expect["metrics"]
        for k in ("parse_failures", "blocks_dropped", "blocks_kept", "media_spans", "char_yield"):
            assert g[k] == m[k], (doc_id, k, g[k], m[k])


def test_pipeline_b_exotic_kinds_match_oracle(spark):
    """Schema-legal kinds outside the usual vocabulary: an INPUT span
    already carrying kind='media' is an ordinary text span (processed,
    kept iff non-ws, NOT counted in media_spans), and kind=NULL must
    not null the kept predicate (isin isn't null-safe). Both previously
    diverged from oracle_spans_doc: 'media' was kept-with-NULL-ref and
    media-counted even when whitespace-only; NULL-kind spans vanished."""
    spans = [
        {"kind": "media", "text": "   ", "media_ref": None, "offset": 0},
        {"kind": "media", "text": "passthrough", "media_ref": None, "offset": 1},
        {"kind": None, "text": "null-kind text", "media_ref": None, "offset": 2},
        {"kind": None, "text": " \t ", "media_ref": None, "offset": 3},
        {"kind": "image", "text": None, "media_ref": None, "offset": 4},
        {"kind": "footer", "text": "page 3", "media_ref": None, "offset": 5},
    ]
    df = spark.createDataFrame(
        [("ek-0", [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    g = extract_spans(df).collect()[0]
    expect = oracle.oracle_spans_doc(spans)
    assert [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
    ] == [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expect["spans"]
    ]
    m = expect["metrics"]
    for k in ("blocks_dropped", "blocks_kept", "media_spans", "char_yield"):
        assert g[k] == m[k], (k, g[k], m[k])
    assert g["media_spans"] == 1  # only the true image


def test_pipeline_b_duplicate_offsets(spark):
    """Spans sharing an offset: media numbering and ordering must break
    ties by original array position, matching the oracle's stable sort
    (ADVICE r1: previously two same-offset images shared a media_ref)."""
    spans = [
        {"kind": "text", "text": "intro ", "media_ref": None, "offset": 0},
        {"kind": "image", "text": None, "media_ref": None, "offset": 5},
        {"kind": "image", "text": None, "media_ref": None, "offset": 5},
        {"kind": "text", "text": "tail", "media_ref": None, "offset": 5},
        {"kind": "image", "text": None, "media_ref": None, "offset": 2},
    ]
    df = spark.createDataFrame(
        [("dup-0", [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    g = extract_spans(df).collect()[0]
    expect = oracle.oracle_spans_doc(spans)
    assert [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
    ] == [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in expect["spans"]
    ]
    refs = [s["media_ref"] for s in g["spans"] if s["kind"] == "media"]
    assert refs == ["images/0.jpg", "images/1.jpg", "images/2.jpg"]


@pytest.mark.parametrize("seed", [7, 202, 9001])
def test_pipeline_b_other_seeds(spark, seed):
    """Golden equality must hold for any corpus seed, not just the
    canonical 42 (adversarial det payloads, dangling refs, etc. are all
    seed-dependent draws)."""
    docs = [corpus.gen_doc(seed, i) for i in range(60)]
    df = spark.createDataFrame(
        [
            (doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
            for doc_id, spans, _ in docs
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {r["doc_id"]: r for r in extract_spans(df).collect()}
    for doc_id, spans, _ in docs:
        expect = oracle.oracle_spans_doc(spans)
        g = got[doc_id]
        assert [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]
        ] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in expect["spans"]
        ], doc_id
        assert g["parse_failures"] == expect["metrics"]["parse_failures"], doc_id


def test_determinism(spark, fixture_docs):
    """Same input twice ⇒ identical spans (SURVEY §5 test plan (c))."""
    doc_id, spans, _ = fixture_docs[0]
    df = spark.createDataFrame(
        [(doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    a = extract_spans(df).collect()[0]
    b = extract_spans(df).collect()[0]
    assert a == b


def test_pipeline_b_adversarial_fuzz_batch(spark):
    """150 seeded adversarial span documents — hostile kinds, grounding
    tokens inside span text, null/empty/whitespace texts, duplicate and
    negative offsets, shuffled order, repeated texts (collapse path) —
    one extract_spans job, byte-exact vs the oracle per doc."""
    import random

    rnd = random.Random(424242)
    kinds = ["text", "title", "image", "footer", "nav", "table", "weird"]
    texts = [
        None,
        "",
        "   ",
        "plain body",
        "ünïcødé 漢字 \U0001f600",
        "<|ref|>image<|/ref|><|det|>[[1,2,3,4]]<|/det|>embedded",
        "<|ref|>x<|/ref|><|det|>broken<|/det|>",
        "<|ref|>unclosed",
        "a<td>c</td>b",
        r"\coloneqq and \eqqcolon",
        "<center>mid</center>",
        "dup dup dup",
        "\n\n\n\nblank runs\n\n\n",
    ]
    docs = []
    for i in range(150):
        n = rnd.randrange(0, 12)
        spans = []
        for _ in range(n):
            k = kinds[rnd.randrange(len(kinds))]
            spans.append(
                {
                    "kind": k,
                    "text": None if k == "image" else texts[rnd.randrange(len(texts))],
                    "media_ref": None,
                    # duplicates, negatives, gaps — order then shuffled
                    "offset": rnd.randrange(-2, 8),
                }
            )
        rnd.shuffle(spans)
        # repeated-text runs to exercise the collapse path
        if n and rnd.random() < 0.3:
            spans = spans + [dict(spans[0], offset=spans[0]["offset"] + 1)] * 2
        docs.append((f"adv{i:03d}", spans))

    df = spark.createDataFrame(
        [
            (d, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
            for d, spans in docs
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = {r["doc_id"]: r for r in extract_spans(df).collect()}
    assert len(got) == 150
    for d, spans in docs:
        exp = oracle.oracle_spans_doc(spans)
        g = got[d]
        gs = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]]
        es = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["spans"]]
        assert gs == es, d
        for k, v in exp["metrics"].items():
            assert g[k] == v, (d, k)
