"""Build the spark-submit artifact (north_rule: packaged for
spark-submit --py-files).

Usage:
    python tools/package.py                  # writes dist/deepseek_ocr_spark.zip
    spark-submit --py-files dist/deepseek_ocr_spark.zip your_job.py

A driver job then does:
    from deepseek_ocr_spark.session import get_spark          # conf baked in
    from deepseek_ocr_spark.plans.lineage import run_extract_resumable
"""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "deepseek_ocr_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", f"{PKG}.zip")
    # dirname('bare.zip') is '' and makedirs('') raises — default to cwd
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    p = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(p)
