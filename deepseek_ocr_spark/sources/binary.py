"""Binary document sources (SURVEY §2.1 S1/S2/S3).

S1 image scan + S2 directory glob: `spark.read.format("binaryFile")` with
pathGlobFilter — the distributed analogue of the reference's
load_image/glob loop (run_dpsk_ocr_image.py:28-42;
run_dpsk_ocr_eval_batch.py:101-107). Yields (path, modificationTime,
length, content:binary); doc_id derives from the file name.

S3 PDF rasterization (run_dpsk_ocr_pdf.py:64-95 pdf_to_images at
dpi=144) needs PyMuPDF which this container lacks — `rasterize_pdfs`
carries the real mapInPandas plumbing with the decode kernel stubbed
(NotImplementedError), mirroring sources/media.py's codec gate.

Partitioning note for 100 TB: binaryFile caps one file per task; set
spark.sql.files.maxPartitionBytes high enough that small-image corpora
coalesce (AQE does this), and never collect content to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAGE_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("page_no", IntegerType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("pixels", BinaryType(), True),
    ]
)


def scan_images(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S1/S2: distributed binary scan of an image corpus directory.

    doc_id = filename stem (the reference names its outputs by image
    filename), falling back to the full basename for extension-less
    files — without the fallback regexp_extract returns '' and a whole
    extension-less corpus would collapse onto one key. Equal filenames
    under DIFFERENT directories still share a doc_id by design (the
    reference contract); `path` is the unique key — disambiguate on it
    before any dedup/join keyed on doc_id over a recursive glob."""
    stem = F.regexp_extract(F.col("path"), r"([^/]+)\.[A-Za-z0-9]+$", 1)
    basename = F.regexp_extract(F.col("path"), r"([^/]+)$", 1)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.coalesce(F.nullif(stem, F.lit("")), basename).alias("doc_id"),
            F.col("path"),
            F.col("length").alias("n_bytes"),
            F.col("content"),
        )
    )


def _rasterize_kernel(content: bytes, dpi: int) -> list[tuple[int, int, int, bytes]]:
    """Swappable PDF→page-images kernel (reference semantics:
    run_dpsk_ocr_pdf.py:64-95 — zoom matrix dpi/72, alpha-flattened
    RGB). Gated on PyMuPDF, which this container lacks; exercised by the
    skip-marked tests in tests/test_real_kernels.py wherever it exists."""
    try:
        import fitz
    except ImportError as e:
        raise NotImplementedError(
            "PDF rasterization requires PyMuPDF; container ships without it "
            "— plug the kernel here, the Spark plumbing is unchanged"
        ) from e
    zoom = dpi / 72.0
    mat = fitz.Matrix(zoom, zoom)
    out: list[tuple[int, int, int, bytes]] = []
    with fitz.open(stream=content, filetype="pdf") as doc:
        for page in doc:
            pix = page.get_pixmap(matrix=mat, alpha=False)
            samples = bytes(pix.samples)
            out.append((pix.width, pix.height, len(samples), samples))
    return out


def rasterize_pdfs(
    pdfs: DataFrame, dpi: int = 144, kernel=_rasterize_kernel
) -> DataFrame:
    """S3: one task per PDF shard; each PDF fans out to page rows.
    mapInPandas (Arrow) so page images never round-trip the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                for page_no, (w, h, n, px) in enumerate(kernel(content, dpi)):
                    rows.append((doc_id, page_no, w, h, n, px))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "page_no",
                    "width",
                    "height",
                    "n_bytes",
                    "pixels",
                ],
            )

    return pdfs.mapInPandas(gen, schema=PAGE_IMAGE_SCHEMA)
