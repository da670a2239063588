"""Sources/sinks + textnorm tests: binaryFile scan, PDF kernel gate,
markdown sinks round-trip, T3 UDF-vs-JVM equivalence."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark import corpus
from deepseek_ocr_spark.operators.extraction import extract_pdf
from deepseek_ocr_spark.operators.textnorm import (
    clean_formula_expr,
    clean_formula_py,
    clean_formula_udf,
)
from deepseek_ocr_spark.sources.binary import rasterize_pdfs, scan_images
from deepseek_ocr_spark.sources.sinks import (
    export_markdown_files,
    write_markdown_table,
)


def test_scan_images_binary_source(spark):
    d = tempfile.mkdtemp(prefix="imgs_")
    try:
        for i in range(5):
            with open(f"{d}/doc{i}.jpg", "wb") as f:
                f.write(bytes([i]) * (10 + i))
        out = {r["doc_id"]: r for r in scan_images(spark, d, "*.jpg").collect()}
        assert set(out) == {f"doc{i}" for i in range(5)}
        assert out["doc3"]["n_bytes"] == 13
        assert bytes(out["doc3"]["content"]) == b"\x03" * 13
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_scan_images_extensionless_fallback(spark):
    """Extension-less files get their basename as doc_id, not '' — a
    whole extension-less corpus must not collapse onto one key
    (review r4)."""
    d = tempfile.mkdtemp(prefix="imgs_")
    try:
        for name in ("scanA", "scanB", "withext.png"):
            with open(f"{d}/{name}", "wb") as f:
                f.write(b"\x01" * 8)
        out = {r["doc_id"] for r in scan_images(spark, d).collect()}
        assert out == {"scanA", "scanB", "withext"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_export_markdown_sanitized_ids_do_not_collide(spark):
    """doc_ids that sanitize to the same filename ('a/b' vs 'a_b') must
    produce distinct files, not silently overwrite (review r4)."""
    docs = spark.createDataFrame(
        [("a/b", "slash"), ("a_b", "underscore")],
        "doc_id string, clean_text string",
    )
    out = tempfile.mkdtemp(prefix="sink_")
    try:
        n = export_markdown_files(docs, out)
        files = sorted(os.listdir(out))
        assert n == 2 and len(files) == 2
        contents = set()
        for name in files:
            with open(f"{out}/{name}") as f:
                contents.add(f.read())
        assert contents == {"slash", "underscore"}
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_rasterize_kernel_gate(spark):
    pdfs = spark.createDataFrame(
        [("d1", bytearray(b"%PDF-fake"))], "doc_id string, content binary"
    )
    with pytest.raises(Exception) as ei:
        rasterize_pdfs(pdfs).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_markdown_sinks_roundtrip(spark):
    pages = corpus.spark_pages(spark, seed=42, n_docs=30)
    docs = extract_pdf(pages).cache()
    out = tempfile.mkdtemp(prefix="sink_")
    try:
        write_markdown_table(docs, out, buckets=4)
        back = spark.read.parquet(f"{out}/markdown")
        a = {r["doc_id"]: r["markdown"] for r in back.collect()}
        b = {r["doc_id"]: r["clean_text"] for r in docs.collect()}
        assert a == b
        n = export_markdown_files(docs, f"{out}/files")
        assert n == 30
        some = sorted(os.listdir(f"{out}/files"))[0]
        doc_id = some[: -len(".mmd")]
        with open(f"{out}/files/{some}") as f:
            assert f.read() == (b[doc_id] or "")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_t3_udf_matches_jvm_and_python(spark):
    cases = [
        "no formula here",
        r"pre \[ E = mc^2 \quad (4) \] post",
        r"\[  x + y \quad (12)  \] and \[a\quad (zz)b\]",
        r"\[already clean\]",
        r"unclosed \[ E = mc^2",
        # Unicode whitespace: NBSP/U+2028-padded formulas must trim the
        # same way in the (?U) JVM expr as in Python's strip()/\s,
        # including a \quad whose gap to the paren is a NBSP
        "\\[ \u00a0x + y \u00a0\\]",
        "\\[\u2028z \\quad\u00a0(note)\u2028\\] tail",
        # review r5: a \quad( whose ) falls OUTSIDE the block must not
        # let the global expr regex eat the closing \] (the annotation
        # class excludes ']', so no match can cross the delimiter)
        r"\[x \quad (note\] tail)",
        # backslashes inside a proper annotation still removed
        r"\[a \quad (\alpha) b\]",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = df.select(
        clean_formula_udf(F.col("t")).alias("u"),
        clean_formula_expr(F.col("t")).alias("j"),
        "t",
    ).collect()
    for r in got:
        assert r["u"] == clean_formula_py(r["t"])  # UDF ≡ python mirror
        assert r["j"] == r["u"], r["t"]  # JVM chain ≡ UDF on these inputs


def test_t3_bracket_annotation_divergence_pinned(spark):
    """Documented contract difference of the JVM expr (textnorm.py): an
    annotation containing ']' is dropped by the block-confined reference
    but left in place by the expr, whose class excludes ']' so that no
    match can ever cross (and eat) a closing delimiter. Conservative
    direction only — text is never corrupted."""
    t = r"\[a \quad (see [3]) b\]"
    assert clean_formula_py(t) == r"\[a  b\]"  # reference drops it
    df = spark.createDataFrame([(t,)], "t string")
    (r,) = df.select(clean_formula_expr(F.col("t")).alias("j")).collect()
    assert r["j"] == t  # expr leaves it, delimiter intact
