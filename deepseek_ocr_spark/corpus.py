"""Deterministic synthetic corpus generator (FIXTURES.md).

Mirrors the reference's fixture philosophy — seeded, code-generated, no
checked-in data (mlx_port/tests/fixtures/generate_test_image.py, seed=42
at mlx_port/tests/conftest.py:125-128). Every document is a pure function
of (seed, doc_index), so generation distributes over Spark tasks and
reproduces byte-for-byte at any partitioning.

Two shapes are produced:
- ``pages(doc_id, page_no, content)`` — raw model-output text exactly as
  run_dpsk_ocr_pdf.py:286-287 receives it (grounding blocks, EOS
  sentinel, runaway-repetition pages, LaTeX, <center>, newline runs).
- ``documents(doc_id, spans)`` — the input_hint interleaved span table:
  one span per fragment, media spans with media_ref=NULL for the engine
  to resolve.

Host component of doc_id is Zipf-skewed to exercise salting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .schema import EOS_SENTINEL

WORDS = (
    "the quick table scan filter join merge sort window group order value "
    "key row column batch stream spark query part line customer data fast "
    "slow big small agg hash"
).split()

HOSTS = [f"host{i:02d}.example" for i in range(20)]
# Zipf-ish host weights (1/k over 20 hosts): host00 takes 1/H_20 ≈ 28%
# of docs, ~5.6x its uniform share — the skew the salting layer must
# absorb (north_rule "explicit salting of skewed hosts").
_HOST_W = 1.0 / np.arange(1, len(HOSTS) + 1)
HOST_P = _HOST_W / _HOST_W.sum()

TITLE_KINDS = ["title", "text", "table", "formula"]
BOILER_KINDS = ["footer", "nav"]


def _rng_for(seed: int, doc_idx: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, doc_idx]))


def _sentence(rng: np.random.Generator, n: int) -> str:
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), n))


def _bbox(rng: np.random.Generator) -> str:
    x1, y1 = int(rng.integers(0, 500)), int(rng.integers(0, 500))
    x2, y2 = x1 + int(rng.integers(10, 499)), y1 + int(rng.integers(10, 499))
    return f"[[{min(x1, 999)}, {min(y1, 999)}, {min(x2, 999)}, {min(y2, 999)}]]"


def _grounding(label: str, det: str) -> str:
    return f"<|ref|>{label}<|/ref|><|det|>{det}<|/det|>"


def _make_fragment(rng: np.random.Generator) -> tuple[str, str]:
    """Return (kind, raw_text) for one span-fragment."""
    roll = rng.random()
    if roll < 0.18:
        # media span: grounding block only (run_dpsk_ocr_pdf.py:131 shape)
        return "image", _grounding("image", _bbox(rng))
    if roll < 0.34:
        # layout-grounded block: grounding tokens + following content
        kind = TITLE_KINDS[int(rng.integers(0, len(TITLE_KINDS)))]
        body = _sentence(rng, int(rng.integers(3, 10)))
        if kind == "formula":
            body = f"\\[ E \\coloneqq mc^2 \\quad ({int(rng.integers(1, 9))}) \\]"
        return kind, _grounding(kind, _bbox(rng)) + body
    if roll < 0.38:
        # malformed det payload — eval() fails, span still stripped,
        # parse_failures increments (run_dpsk_ocr_pdf.py:138-148)
        return "text", _grounding("text", "[[12, 34") + _sentence(rng, 4)
    if roll < 0.40:
        # adversarial det payloads: python-literal-but-not-box, empty
        # list, multiline box, 3-int box, unclosed ref fragment
        adv = [
            "(1, 2)",
            "[]",
            "[[1,2,\n3,4]]",
            "[[9,9,9]]",
        ]
        det = adv[int(rng.integers(0, len(adv)))]
        extra = "<|ref|>dangling" if rng.random() < 0.3 else ""
        return "text", _grounding("text", det) + _sentence(rng, 3) + extra
    if roll < 0.46:
        kind = BOILER_KINDS[int(rng.integers(0, 2))]
        return kind, _grounding(kind, _bbox(rng)) + "| home | about | contact |"
    if roll < 0.52:
        # table cells — must survive repetition collapse (<td> whitelist,
        # process/ngram_norepeat.py:33)
        cell = _sentence(rng, 2)
        return "table", ("<td>" + cell + "</td>") * int(rng.integers(2, 5))
    if roll < 0.58:
        # LaTeX + newline-run payloads (T1/T2 targets)
        nl = "\n" * int(rng.integers(3, 5))
        return "text", f"x \\coloneqq y \\eqqcolon z{nl}<center>{_sentence(rng, 5)}</center>"
    return "text", _sentence(rng, int(rng.integers(5, 30)))


def gen_doc(seed: int, doc_idx: int) -> tuple[str, list[dict], list[tuple[int, str]]]:
    """Generate one document: (doc_id, input_spans, pages).

    input_spans: the input_hint shape — kind/text/media_ref(None for
    media)/offset, offsets dense in document order.
    pages: [(page_no, raw_content)] — fragments of a page concatenated
    with '\\n', EOS sentinel appended unless the page is a runaway
    repetition page (SKIP_REPEAT target, run_dpsk_ocr_pdf.py:289-293).
    """
    rng = _rng_for(seed, doc_idx)
    host = HOSTS[int(rng.choice(len(HOSTS), p=HOST_P))]
    doc_id = f"doc-{host}-{doc_idx:08d}"
    n_pages = int(rng.integers(1, 5))
    spans: list[dict] = []
    pages: list[tuple[int, str]] = []
    offset = 0
    for page_no in range(n_pages):
        runaway = rng.random() < 0.06 and n_pages > 1
        if runaway:
            phrase = _sentence(rng, 5)
            content = ((phrase + " ") * 50).rstrip()
            spans.append(
                {"kind": "text", "text": content, "media_ref": None, "offset": offset}
            )
            offset += 1
            pages.append((page_no, content))  # no EOS → dropped by SKIP_REPEAT
            continue
        frags = [_make_fragment(rng) for _ in range(int(rng.integers(2, 9)))]
        for kind, raw in frags:
            spans.append(
                {
                    "kind": kind,
                    "text": raw,
                    "media_ref": None,
                    "offset": offset,
                }
            )
            offset += 1
        content = "\n".join(raw for _, raw in frags) + EOS_SENTINEL
        pages.append((page_no, content))
    return doc_id, spans, pages


def gen_pages_pdf(seed: int, lo: int, hi: int) -> pd.DataFrame:
    """pages(doc_id, page_no, content) for doc indices [lo, hi)."""
    rows = []
    for i in range(lo, hi):
        doc_id, _, pages = gen_doc(seed, i)
        for page_no, content in pages:
            rows.append((doc_id, page_no, content))
    return pd.DataFrame(rows, columns=["doc_id", "page_no", "content"])


def gen_documents_pdf(seed: int, lo: int, hi: int) -> pd.DataFrame:
    """documents(doc_id, spans) — input_hint shape — for [lo, hi)."""
    rows = []
    for i in range(lo, hi):
        doc_id, spans, _ = gen_doc(seed, i)
        rows.append((doc_id, spans))
    return pd.DataFrame(rows, columns=["doc_id", "spans"])


def spark_pages(spark, seed: int, n_docs: int, partitions: int | None = None):
    """Distributed generation: one task per id-range slice, deterministic
    regardless of partition count (each doc derives from (seed, idx))."""
    from .schema import PAGES_SCHEMA

    parts = partitions or spark.sparkContext.defaultParallelism
    rng_free = spark.range(0, n_docs, 1, parts)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                yield gen_pages_pdf(seed, int(ids.min()), int(ids.max()) + 1)

    return rng_free.mapInPandas(gen, schema=PAGES_SCHEMA)


def spark_documents(spark, seed: int, n_docs: int, partitions: int | None = None):
    from .schema import DOCUMENTS_SCHEMA

    parts = partitions or spark.sparkContext.defaultParallelism
    rng_free = spark.range(0, n_docs, 1, parts)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids):
                out = gen_documents_pdf(seed, int(ids.min()), int(ids.max()) + 1)
                out["spans"] = out["spans"].map(
                    lambda sp: [
                        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in sp
                    ]
                )
                yield out

    return rng_free.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)
