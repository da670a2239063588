"""Pipeline-A edge cases vs the statement-exact oracle: null/empty
pages, EOS-only pages, duplicate identical media blocks (replace-all
semantics), grounding at page boundaries, all-dropped documents.
Plus a multi-micro-batch streaming equivalence check."""

import shutil
import tempfile

from deepseek_ocr_spark import oracle
from deepseek_ocr_spark.operators.extraction import extract_pdf
from deepseek_ocr_spark.schema import EOS_SENTINEL

PAGES_SCHEMA = "doc_id string, page_no int, content string"


def _run_both(spark, pages):
    df = spark.createDataFrame(
        [("d", i, c) for i, c in enumerate(pages)], PAGES_SCHEMA
    )
    got = extract_pdf(df).collect()[0]
    exp = oracle.oracle_pdf_doc(pages)
    assert got["clean_text"] == exp["clean_text"]
    got_spans = [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got["spans"]
    ]
    exp_spans = [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["spans"]
    ]
    assert got_spans == exp_spans
    m = exp["metrics"]
    for k in ("pages_in", "pages_kept", "parse_failures", "media_spans", "char_yield"):
        assert got[k] == m[k], k
    return got


IMG = "<|ref|>image<|/ref|><|det|>[[10,20,400,300]]<|/det|>"
TITLE = "<|ref|>title<|/ref|><|det|>[[5,5,900,60]]<|/det|>"


def test_all_pages_dropped(spark):
    got = _run_both(spark, ["runaway " * 20, "more runaway " * 10])
    assert got["pages_kept"] == 0 and got["clean_text"] == ""


def test_eos_only_page(spark):
    got = _run_both(spark, [EOS_SENTINEL])
    assert got["pages_kept"] == 1


def test_duplicate_identical_media_blocks(spark):
    """The reference's content.replace(match, ...) replaces ALL
    occurrences of an identical media block string with the FIRST
    occurrence's index (run_dpsk_ocr_pdf.py:310-311) — both copies
    become idx of the first enumerate hit."""
    page = f"a {IMG} b {IMG} c{EOS_SENTINEL}"
    got = _run_both(spark, [page])
    refs = [s["media_ref"] for s in got["spans"] if s["kind"] == "media"]
    # both occurrences rewritten, numbering per reference semantics
    assert len(refs) == 2


def test_media_numbering_skips_dropped_pages(spark):
    """jdx advances only on kept pages (run_dpsk_ocr_pdf.py:285,320)."""
    pages = [
        f"x {IMG} y{EOS_SENTINEL}",
        "runaway page " * 30,  # dropped
        f"z {IMG} w{EOS_SENTINEL}",
    ]
    got = _run_both(spark, pages)
    refs = [s["media_ref"] for s in got["spans"] if s["kind"] == "media"]
    assert refs == ["images/0_0.jpg", "images/1_0.jpg"]


def test_grounding_spanning_content(spark):
    _run_both(
        spark,
        [
            f"{TITLE}# Title\nbody text {IMG}\ntail{EOS_SENTINEL}",
            f"just text{EOS_SENTINEL}",
        ],
    )


def test_empty_and_null_pages(spark):
    df = spark.createDataFrame(
        [("d", 0, ""), ("d", 1, None), ("d", 2, f"ok{EOS_SENTINEL}")],
        PAGES_SCHEMA,
    )
    got = extract_pdf(df).collect()[0]
    assert got["pages_in"] == 3 and got["pages_kept"] == 1
    assert got["clean_text"] == f"ok\n{oracle.PAGE_SPLIT}\n"


def test_reserved_sentinel_in_input_raises(spark):
    """A page whose raw text contains the engine's reserved media-index
    placeholder would have that literal rewritten to page digits by the
    post-window substitution (the reference's at-match substitution
    preserves it); the engine fails loudly instead of corrupting."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from deepseek_ocr_spark.operators.extraction import _JDX

    df = spark.createDataFrame(
        [("d", 0, f"evil {_JDX} page{EOS_SENTINEL}")], PAGES_SCHEMA
    )
    with pytest.raises((PythonException, Py4JJavaError)):
        extract_pdf(df).collect()


def test_streaming_incremental_batches(spark):
    """maxFilesPerTrigger=1 forces multiple micro-batches; result must
    equal batch output regardless of batch boundaries."""
    from deepseek_ocr_spark import corpus
    from deepseek_ocr_spark.operators.spans_pipeline import extract_spans
    from deepseek_ocr_spark.streaming.stream_extract import (
        stream_documents,
        stream_extract,
    )

    in_dir = tempfile.mkdtemp(prefix="sin_")
    out_dir = tempfile.mkdtemp(prefix="sout_")
    ckpt = tempfile.mkdtemp(prefix="sck_")
    try:
        docs = corpus.spark_documents(spark, seed=7, n_docs=60)
        # 4 separate files → 4 micro-batches at maxFilesPerTrigger=1
        docs.repartition(4).write.mode("overwrite").parquet(in_dir)
        q = (
            stream_extract(stream_documents(spark, in_dir, max_files_per_trigger=1))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert q.lastProgress is not None
        streamed = {
            r["doc_id"]: r["blocks_kept"]
            for r in spark.read.parquet(out_dir).collect()
        }
        batch = {
            r["doc_id"]: r["blocks_kept"]
            for r in extract_spans(spark.read.parquet(in_dir)).collect()
        }
        assert streamed == batch and len(streamed) == 60
    finally:
        for d in (in_dir, out_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_adversarial_fuzz_batch_matches_oracle(spark):
    """150 seeded adversarial documents — malformed/partial grounding
    tokens, unparseable det payloads, duplicate identical blocks,
    unicode, EOS in odd positions, whitespace-only pages — through ONE
    extract_pdf job, every doc compared byte-exactly to the
    reference-semantics oracle (clean_text, span tuples, all metrics)."""
    import random

    rnd = random.Random(20260817)
    frags = [
        "plain body text here",
        "ünïcødé ƒun 漢字テスト emoji \U0001f600 done",
        "   \t  ",
        "\n\n\n\n",
        "<|ref|>image<|/ref|><|det|>[[100,200,300,400]]<|/det|>",
        "<|ref|>title<|/ref|><|det|>[[1,2,3,4]]<|/det|># Heading",
        "<|ref|>text<|/ref|><|det|>[[5,6,7,8],[9,10,11,12]]<|/det|>para",
        "<|ref|>image<|/ref|><|det|>not a list at all<|/det|>",
        "<|ref|>image<|/ref|><|det|>[[1,2],[3]]<|/det|>",
        "<|ref|>dangling ref without det",
        "stray <|/det|> closer",
        "<|ref|><|/ref|><|det|>[[0,0,0,0]]<|/det|>",
        "a<td>cell</td>b",
        r"formula \coloneqq stuff \eqqcolon end",
        "<center>centered</center>",
        "x " * 40,
        "",
    ]
    docs = []
    for i in range(150):
        pages = []
        for _ in range(rnd.randrange(1, 5)):
            parts = [frags[rnd.randrange(len(frags))] for _ in range(rnd.randrange(0, 8))]
            page = " ".join(parts)
            r = rnd.random()
            if r < 0.6:
                page += EOS_SENTINEL  # kept page
            elif r < 0.7:
                page = EOS_SENTINEL + page  # EOS at start
            # else: no EOS -> SKIP_REPEAT drop
            pages.append(page)
        docs.append((f"fz{i:03d}", pages))

    df = spark.createDataFrame(
        [(d, i, c) for d, pages in docs for i, c in enumerate(pages)],
        PAGES_SCHEMA,
    )
    got = {r["doc_id"]: r for r in extract_pdf(df).collect()}
    assert len(got) == 150
    for d, pages in docs:
        exp = oracle.oracle_pdf_doc(pages)
        g = got[d]
        assert g["clean_text"] == exp["clean_text"], d
        gs = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in g["spans"]]
        es = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp["spans"]]
        assert gs == es, d
        for k, v in exp["metrics"].items():
            assert g[k] == v, (d, k)
