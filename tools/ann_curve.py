"""ANN recall/scan tradeoff curves (VERDICT r3 #5): sweep the tuning
knob of each approximate method at $SPARK_GRAFT_SF_DIR (default sf0.1)
and print a markdown table of (recall vs exact top-5, scanned fraction)
per point, so the 100x operator has measured guidance instead of the
single (recall, scan) point the bench JSON reports.

Knobs swept:
- s2 LSH: n_tables (OR'd plane blocks) at fixed n_planes/n_probe
- s3 IVF: n_probe at fixed n_cells
- d5 embedding-dup: n_tables (OR'd blocks) at fixed n_planes

Usage: python tools/ann_curve.py   (writes markdown to stdout)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from deepseek_ocr_spark import queries as Q
    from deepseek_ocr_spark.operators.similarity import (
        cosine_topk,
        embedding_dup_pairs,
        embedding_dup_scan_stats,
        ivf_scan_stats,
        ivf_topk_seeded,
        lsh_scan_stats,
        lsh_topk,
    )
    from deepseek_ocr_spark.queries import (
        _D5_PLANES,
        _S2_PLANES,
        _S2_PROBE,
        _S3_BASE,
        _S3_CELLS,
        _vecs_with_planted_dups,
    )
    from deepseek_ocr_spark.session import get_spark

    spark = get_spark(app_name="ann-curve")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.cache().count()
    q = emb.filter(F.col("vec_id") < 20)

    def pairs(df):
        return {(r[0], r[1]) for r in df.collect()}

    # the recall baseline is the one legitimate full-scan consumer; without
    # the flag this tool would crash at exactly the scale it exists to serve
    exact = pairs(cosine_topk(emb, q, k=5, allow_full_scan=True))

    print(f"### s2 LSH: n_tables sweep (n_planes={_S2_PLANES}, "
          f"n_probe={_S2_PROBE}, sf_dir={SF_DIR})\n")
    print("| n_tables | recall | scan_fraction |\n|---|---|---|")
    for nt in (1, 2, 4):
        ap = pairs(
            lsh_topk(emb, q, k=5, n_planes=_S2_PLANES, n_probe=_S2_PROBE,
                     n_tables=nt, dim=64)
        )
        sc = lsh_scan_stats(
            emb, q, n_planes=_S2_PLANES, n_probe=_S2_PROBE, n_tables=nt,
            dim=64,
        ).collect()[0]["scan_fraction"]
        print(f"| {nt} | {len(exact & ap) / len(exact):.4f} | {sc:.4f} |")

    print(f"\n### s3 IVF: n_probe sweep (n_cells={_S3_CELLS})\n")
    print("| n_probe | recall | scan_fraction |\n|---|---|---|")
    for np_ in (1, 2, 4):
        ap = pairs(
            ivf_topk_seeded(emb, q, k=5, n_cells=_S3_CELLS, n_probe=np_,
                            seed_base=_S3_BASE)
        )
        sc = ivf_scan_stats(
            emb, q, n_cells=_S3_CELLS, n_probe=np_, seed_base=_S3_BASE
        ).collect()[0]["scan_fraction"]
        print(f"| {np_} | {len(exact & ap) / len(exact):.4f} | {sc:.4f} |")

    vecs = _vecs_with_planted_dups(spark, SF_DIR)
    vecs.cache().count()
    vplanted = {
        (r["vec_id"], r["vec_id"] + 1_000_000)
        for r in emb.filter(F.col("vec_id") % 5 == 0).select("vec_id").collect()
    }
    print(f"\n### d5 embedding-dup: n_tables sweep (n_planes={_D5_PLANES})\n")
    print("| n_tables | planted recall | scan_fraction |\n|---|---|---|")
    for nt in (1, 2, 4):
        found = pairs(
            embedding_dup_pairs(vecs, threshold=0.99, n_planes=_D5_PLANES,
                                dim=64, n_tables=nt)
        )
        sc = embedding_dup_scan_stats(
            vecs, n_planes=_D5_PLANES, dim=64, n_tables=nt
        ).collect()[0]["scan_fraction"]
        rec = len(vplanted & found) / len(vplanted)
        print(f"| {nt} | {rec:.4f} | {sc:.4f} |")


if __name__ == "__main__":
    main()
