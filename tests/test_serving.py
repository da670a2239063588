"""S9 REST serving layer: the /process endpoint must return exactly
what the batch pipeline computes (same extract_pdf plan, one-document
DataFrame), and the endpoint contract (errors, routes, locate) must
hold. Reference surface: mlx_port/server.py:113-174 (/process),
app.py:128-181."""

import json
import urllib.error
import urllib.request

import pytest

from deepseek_ocr_spark import corpus, oracle
from deepseek_ocr_spark.serving import ExtractServer

SEED = 42


@pytest.fixture(scope="module")
def server(spark):
    srv = ExtractServer(spark)
    srv.start()
    yield srv
    srv.stop()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=60
    ) as r:
        return json.loads(r.read())


def test_healthz(server):
    out = _get(server.port, "/healthz")
    assert out["status"] == "ok" and out["spark"]


def test_process_matches_batch_pipeline(server):
    """POST /process on a fixture doc == the reference-semantics oracle
    (hence == pipeline A, which the goldens pin to the same oracle)."""
    doc_id, _, pages = corpus.gen_doc(SEED, 3)
    contents = [c for _, c in pages]
    got = _post(server.port, "/process", {"doc_id": doc_id, "pages": contents})
    exp = oracle.oracle_pdf_doc(contents)
    assert got["doc_id"] == doc_id
    assert got["clean_text"] == exp["clean_text"]
    assert [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in got["spans"]
    ] == [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in exp["spans"]
    ]
    for k in ("pages_in", "pages_kept", "parse_failures", "media_spans"):
        assert got[k] == exp["metrics"][k], k


def test_process_single_content_shorthand(server):
    """'content' (one page) mirrors run_dpsk_ocr_image.py's single-image
    path and must equal the 1-element 'pages' form."""
    _, _, pages = corpus.gen_doc(SEED, 5)
    content = pages[0][1]
    a = _post(server.port, "/process", {"content": content})
    b = _post(server.port, "/process", {"pages": [content]})
    assert a["clean_text"] == b["clean_text"]
    assert a["spans"] == b["spans"]


def test_process_rejects_malformed(server):
    for payload in (
        {},
        {"pages": "not-a-list"},
        {"pages": [1, 2]},
        {"pages": []},  # all() on [] is vacuously true — must 400
        ["pages"],  # non-dict JSON: 'in' would match the element
        "string with pages inside",  # non-dict: substring containment
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server.port, "/process", payload)
        assert e.value.code == 400, payload
    # /locate param validation
    srv_404 = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(srv_404.port, "/locate?limit=abc")
    assert e.value.code in (400, 409)  # 409 when no table_path wins first
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server.port, "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/nope", {})
    assert e.value.code == 404


def test_locate_requires_table_then_serves_hits(spark, tmp_path):
    from deepseek_ocr_spark.operators.extraction import extract_pdf

    srv = ExtractServer(spark)
    srv.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(srv.port, "/locate?label=media")
        assert e.value.code == 409
    finally:
        srv.stop()

    rows = [
        (doc_id, page_no, content)
        for i in range(4)
        for doc_id, _, pages in [corpus.gen_doc(SEED, i)]
        for page_no, content in pages
    ]
    pages_df = spark.createDataFrame(
        rows, "doc_id string, page_no int, content string"
    )
    p = str(tmp_path / "documents")
    extract_pdf(pages_df).write.mode("overwrite").parquet(p)

    srv = ExtractServer(spark, table_path=p)
    srv.start()
    try:
        out = _get(srv.port, "/locate?label=media&limit=5")
        hits = out["hits"]
        assert 0 < len(hits) <= 5
        assert all(h["kind"] == "media" for h in hits)
        assert all("offset" in h and "doc_id" in h for h in hits)
    finally:
        srv.stop()


def test_process_all_pages_dropped_returns_honest_metrics(server):
    """A request whose pages all lack the EOS sentinel: extract_pdf
    aggregates over ALL pages, so the response is a 200 with
    pages_kept=0 and empty spans — not an error, and (the ADVICE r3
    hazard) never an IndexError-shaped 500. The defensive 422 branch
    (serving.AllPagesDropped) exists for a future filter change."""
    got = _post(
        server.port,
        "/process",
        {"doc_id": "gateless", "pages": ["no sentinel", "none here"]},
    )
    assert got["pages_in"] == 2
    assert got["pages_kept"] == 0
    assert got["spans"] == [] and got["char_yield"] == 0


def test_process_stream_ndjson_deltas(server):
    """/process/stream emits one NDJSON line per span (flushed
    incrementally, close-delimited) then a final ``done`` metrics line —
    the span-granularity analogue of the reference's token-delta
    streaming (run_dpsk_ocr_image.py:147-199). The reassembled stream
    must equal the batch /process response exactly."""
    doc_id, _, pages = corpus.gen_doc(SEED, 3)
    contents = [c for _, c in pages]
    batch = _post(server.port, "/process", {"doc_id": doc_id, "pages": contents})

    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/process/stream",
        data=json.dumps({"doc_id": doc_id, "pages": contents}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        assert r.headers["Content-Type"] == "application/x-ndjson"
        # consume line-by-line off the live socket: every line must be a
        # standalone JSON record (delta framing), not a fragment
        lines = [json.loads(ln) for ln in r]
    assert len(lines) >= 2, "expected span deltas + final line"
    *spans, final = lines
    assert final.pop("done") is True
    assert spans == batch["spans"]
    assert final == {k: v for k, v in batch.items() if k != "spans"}


def test_process_concurrent_requests(server):
    """S9 concurrency claim (VERDICT r3 #7): ThreadingHTTPServer fires
    each request's Spark jobs from its own thread against the shared
    SparkSession — Spark schedules concurrently-submitted jobs from
    separate threads (FIFO across jobs, tasks interleave; a FAIR pool
    is a config knob, not a code change). Four parallel /process
    requests must all succeed and each match the reference oracle."""
    import concurrent.futures

    docs = [corpus.gen_doc(SEED, i) for i in (3, 5, 8, 13)]

    def one(d):
        doc_id, _, pages = d
        contents = [c for _, c in pages]
        got = _post(
            server.port, "/process", {"doc_id": doc_id, "pages": contents}
        )
        exp = oracle.oracle_pdf_doc(contents)
        return got["doc_id"] == doc_id and got["clean_text"] == exp["clean_text"]

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(one, docs))
    assert all(results), results
