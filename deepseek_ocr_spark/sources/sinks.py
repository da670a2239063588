"""Markdown sinks (SURVEY §2.1 S4/S5): the reference writes one clean
.mmd and one grounding-retaining _det.mmd per document
(run_dpsk_ocr_pdf.py:322-326). The distributed analogue is a text table
partitioned by doc bucket — one row per document, clean and raw columns
— exported as parquet (the queryable sink) plus an optional per-doc
text-file dump for small corpora (driver-side only below a row cap,
matching the reference's file-per-doc layout).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXPORT_FILE_CAP = 10_000


def write_markdown_table(
    docs: DataFrame,
    out_dir: str,
    clean_col: str = "clean_text",
    raw_col: str | None = None,
    buckets: int = 64,
) -> None:
    """S4 (+S5 if raw_col): parquet sink bucketed by doc hash — the
    at-scale layout (Iceberg table at 10^12 docs)."""
    cols = ["doc_id", F.col(clean_col).alias("markdown")]
    if raw_col is not None:
        cols.append(F.col(raw_col).alias("markdown_det"))
    (
        docs.select(*cols)
        .withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(buckets)))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{out_dir}/markdown")
    )


def export_markdown_files(
    docs: DataFrame, out_dir: str, clean_col: str = "clean_text"
) -> int:
    """File-per-document export (the reference's exact sink shape) for
    small result sets; refuses above EXPORT_FILE_CAP — at scale the
    table sink above is the product."""
    rows = docs.select("doc_id", clean_col).limit(EXPORT_FILE_CAP + 1).collect()
    if len(rows) > EXPORT_FILE_CAP:
        raise ValueError(
            f"export_markdown_files is a small-corpus sink (≤{EXPORT_FILE_CAP} docs); "
            "use write_markdown_table"
        )
    os.makedirs(out_dir, exist_ok=True)
    for r in rows:
        safe = r["doc_id"].replace("/", "_")
        if safe != r["doc_id"]:
            # sanitization can alias distinct ids ('a/b' vs 'a_b'); a
            # short content hash keeps sanitized names collision-free
            # instead of silently overwriting one doc with another
            digest = hashlib.md5(r["doc_id"].encode()).hexdigest()[:8]
            safe = f"{safe}-{digest}"
        with open(f"{out_dir}/{safe}.mmd", "w") as f:
            f.write(r[clean_col] or "")
    return len(rows)
