"""S9 — REST serving source (reference: mlx_port/server.py:113-174,
the FastAPI ``/process`` endpoint; mlx_port/app.py:128-181, the upload
UI). The reference accepts an uploaded image, runs the neural OCR, and
returns markdown; per the north_star the neural stage is replaced, so
this server accepts the raw model-output page text and runs the same
post-processing pipeline (extract_pdf → clean markdown + interleaved
spans + metrics) on the shared SparkSession.

Spark-first shape: the handler builds a tiny single-document DataFrame
and submits a normal Spark job — the driver is thread-safe for
concurrent job submission, so ThreadingHTTPServer's thread-per-request
model maps directly onto Spark's scheduler (FAIR-pool friendly). At
production scale the same layer fronts a long-lived session via Spark
Connect; batch traffic belongs in jobs.py, not here (the reference
makes the same split: server.py serves one image per request while
run_dpsk_ocr_eval_batch.py owns corpora).

Stdlib-only by design (http.server + json): the sandbox has no
FastAPI/Streamlit, and the serving semantics — request → DataFrame →
extraction → JSON — do not depend on the web framework.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import SparkSession

from .jobs import locate_job
from .operators.extraction import extract_pdf

_MAX_BODY = 16 * 1024 * 1024  # one document per request, not a corpus


class AllPagesDropped(ValueError):
    """Every page of the request failed the SKIP_REPEAT EOS gate."""


def process_document(
    spark: SparkSession, doc_id: str, pages: list[str]
) -> dict:
    """One document's raw model-output pages → the reference's /process
    response shape: clean markdown, interleaved spans, metrics
    (run_dpsk_ocr_pdf.py:286-329 semantics via extract_pdf)."""
    df = spark.createDataFrame(
        [(doc_id, i, content) for i, content in enumerate(pages)],
        "doc_id string, page_no int, content string",
    )
    rows = extract_pdf(df).collect()
    if not rows:
        # NOTE (ADVICE r3 follow-up): extract_pdf aggregates over ALL
        # pages, so an all-dropped request still yields one row with
        # pages_kept=0 and empty spans — the honest response, pinned by
        # tests/test_serving.py::test_process_all_pages_dropped. This
        # branch is a defensive guard so a future filter change surfaces
        # as a structured 422, never an IndexError-shaped 500.
        raise AllPagesDropped(
            "all pages dropped by the SKIP_REPEAT gate (no EOS sentinel)"
        )
    out = rows[0].asDict()
    out["spans"] = [s.asDict() for s in out["spans"]]
    return out


class _Handler(BaseHTTPRequestHandler):
    server: "ExtractServer"

    # socket timeout: a client that sends fewer body bytes than its
    # Content-Length claims would otherwise block rfile.read() forever,
    # permanently leaking one daemon thread per such request
    timeout = 120

    # quiet: tests and notebooks should not see per-request stderr lines
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _reply_stream(self, out: dict) -> None:
        """Incremental-delivery framing for /process/stream: one NDJSON
        line per span, flushed as written, then a final metrics line
        with ``done: true`` — the span-granularity analogue of the
        reference's token-delta streaming (run_dpsk_ocr_image.py:147-199
        TextStreamer; mlx_port/inference/generation_mlx.py:251-308
        yields text deltas, then a final stats record). Spans are the
        atomic unit at this abstraction, so deltas are spans, not
        tokens; corpus-scale incremental processing is
        streaming/stream_extract.py — this endpoint is the interactive
        front. No Content-Length: HTTP/1.0 close-delimited, so clients
        can consume lines as they arrive."""
        self.send_response(200)
        self.send_header("Content-Type", "application/x-ndjson")
        self.end_headers()
        for span in out["spans"]:
            self.wfile.write(json.dumps(span).encode() + b"\n")
            self.wfile.flush()
        final = {k: v for k, v in out.items() if k != "spans"}
        final["done"] = True
        self.wfile.write(json.dumps(final).encode() + b"\n")
        self.wfile.flush()

    def do_GET(self) -> None:  # noqa: N802 (http.server contract)
        url = urlparse(self.path)
        if url.path == "/healthz":
            self._reply(
                200,
                {"status": "ok", "spark": self.server.spark.version},
            )
        elif url.path == "/locate":
            if not self.server.table_path:
                self._reply(
                    409, {"error": "server started without a table_path"}
                )
                return
            q = parse_qs(url.query)
            label = q.get("label", ["title"])[0]
            try:
                limit = int(q.get("limit", ["20"])[0])
            except ValueError:
                self._reply(400, {"error": "limit must be an integer"})
                return
            limit = max(1, min(limit, 1000))
            try:
                rows = (
                    locate_job(
                        self.server.spark, self.server.table_path, label
                    )
                    .orderBy("doc_id", "offset")
                    .limit(limit)
                    .collect()
                )
            except Exception as e:  # bad table_path / Spark failure
                self._reply(500, {"error": str(e)[:500]})
                return
            self._reply(200, {"hits": [r.asDict() for r in rows]})
        else:
            self._reply(404, {"error": f"no route {url.path}"})

    def do_POST(self) -> None:  # noqa: N802
        url = urlparse(self.path)
        if url.path not in ("/process", "/process/stream"):
            self._reply(404, {"error": f"no route {url.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if length < 0:
                # rfile.read(-1) would read until EOF — i.e. block until
                # the client hangs up; never trust a negative length
                self._reply(400, {"error": "invalid Content-Length"})
                return
            if length > _MAX_BODY:
                self._reply(413, {"error": "body too large"})
                return
            req = json.loads(self.rfile.read(length) or b"{}")
            if not isinstance(req, dict):
                raise ValueError("body must be a JSON object")
            # single-page shorthand mirrors run_dpsk_ocr_image.py's one
            # image; "pages" is the PDF shape (ordered list)
            if "pages" in req:
                pages = req["pages"]
            elif "content" in req:
                pages = [req["content"]]
            else:
                raise ValueError("need 'pages' (list) or 'content' (str)")
            if (
                not isinstance(pages, list)
                or not pages  # all() on [] is vacuously true
                or not all(isinstance(p, str) for p in pages)
            ):
                raise ValueError("'pages' must be a non-empty list of strings")
            doc_id = str(req.get("doc_id", "request"))
        except (ValueError, json.JSONDecodeError) as e:
            self._reply(400, {"error": str(e)})
            return
        try:
            out = process_document(self.server.spark, doc_id, pages)
        except AllPagesDropped as e:
            self._reply(422, {"error": str(e)})
            return
        except Exception as e:  # Spark failure must not kill the reply
            self._reply(500, {"error": str(e)[:500]})
            return
        if url.path == "/process/stream":
            self._reply_stream(out)
        else:
            self._reply(200, out)


class ExtractServer(ThreadingHTTPServer):
    """Serving front for the extraction engine.

    >>> srv = ExtractServer(spark); srv.start()
    >>> # POST http://127.0.0.1:{srv.port}/process {"content": "..."}
    >>> srv.stop()

    ``table_path`` (optional) points /locate at an extracted documents
    parquet (the T6 'Locate <|ref|>…<|/ref|>' prompt analogue,
    config.py:27-36)."""

    daemon_threads = True

    def __init__(
        self,
        spark: SparkSession,
        host: str = "127.0.0.1",
        port: int = 0,
        table_path: str | None = None,
    ) -> None:
        super().__init__((host, port), _Handler)
        self.spark = spark
        self.table_path = table_path
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self.serve_forever, name="extract-server", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=10)
        self.server_close()
