"""Real decode-kernel tests, skip-marked on codec availability (VERDICT
r1 #9; marker pattern per mlx_port/tests/conftest.py:22-64): they SKIP
in this sandbox (no PyMuPDF/PIL) and run the actual kernels through the
Spark plumbing wherever the libs exist. The unconditional tests pin the
gate behavior: a clean NotImplementedError, never a silent wrong result.
"""

import importlib.util

import pytest

from deepseek_ocr_spark.sources.binary import _rasterize_kernel, rasterize_pdfs
from deepseek_ocr_spark.sources.media import _decode_real, decode_features

HAVE_FITZ = importlib.util.find_spec("fitz") is not None
HAVE_PIL = importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(not HAVE_FITZ, reason="PyMuPDF not installed in sandbox")
def test_rasterize_real_pdf(spark):
    import fitz

    doc = fitz.open()
    for _ in range(2):
        page = doc.new_page(width=72, height=72)  # 1in x 1in
        page.insert_text((10, 30), "hello")
    content = doc.tobytes()
    pdfs = spark.createDataFrame(
        [("p0", content)], "doc_id string, content binary"
    )
    rows = rasterize_pdfs(pdfs, dpi=144).collect()
    assert [r["page_no"] for r in rows] == [0, 1]
    for r in rows:
        # dpi=144 on a 72pt page → 144px, RGB
        assert r["width"] == 144 and r["height"] == 144
        assert r["n_bytes"] == 144 * 144 * 3
        assert len(r["pixels"]) == r["n_bytes"]


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in sandbox")
def test_decode_real_image(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 4), color=(100, 100, 100)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [("d0", "images/0.jpg", "image/png", 8, 4, bytearray(buf.getvalue()))],
        "doc_id string, media_ref string, mime string, width int, height int, data binary",
    )
    row = decode_features(media, use_real_codec=True).collect()[0]
    assert row["decode_ok"] == "ok"
    assert abs(row["mean_byte"] - 100.0) < 1.5  # grayscale of uniform gray


@pytest.mark.skipif(HAVE_FITZ, reason="gate only observable without PyMuPDF")
def test_rasterize_gate_raises_cleanly():
    with pytest.raises(NotImplementedError):
        _rasterize_kernel(b"%PDF-1.4", 144)


@pytest.mark.skipif(HAVE_PIL, reason="gate only observable without PIL")
def test_decode_gate_raises_cleanly():
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x89PNG")


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in sandbox")
def test_render_annotation_real():
    from PIL import Image

    from deepseek_ocr_spark.operators.annotate import render_annotation_page

    img = Image.new("RGB", (100, 100), color=(255, 255, 255))
    out = render_annotation_page(
        img,
        [
            {
                "color_r": 10, "color_g": 20, "color_b": 30,
                "x1": 5, "y1": 5, "x2": 50, "y2": 50,
                "outline_width": 2, "fill_alpha": 20,
                "label": "title", "label_x": 5, "label_y": 0,
            }
        ],
    )
    assert out.size == (100, 100)
    assert out.getpixel((60, 60)) == (255, 255, 255)  # outside box untouched
    assert out.getpixel((5, 30)) != (255, 255, 255)  # outline drawn


@pytest.mark.skipif(HAVE_PIL, reason="gate only observable without PIL")
def test_render_annotation_gate_raises_cleanly():
    from deepseek_ocr_spark.operators.annotate import render_annotation_page

    with pytest.raises(NotImplementedError):
        render_annotation_page(object(), [])
