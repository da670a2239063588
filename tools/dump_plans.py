"""Regenerate the physical-plan extracts reviewed in PLANS.md."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deepseek_ocr_spark import queries as Q
from deepseek_ocr_spark.operators.spans_pipeline import extract_spans
from deepseek_ocr_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(parallelism=8)
    docs = Q._t(spark, SF_DIR, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    sections = {
        "PIPELINE B (extract_spans)": extract_spans(docs),
        "PIPELINE A (pages)": Q.pipeline_a_extract_pdf(spark, SF_DIR),
        "BROADCAST JOIN (part_type_revenue)": Q.q_join_part_type_revenue(
            spark, SF_DIR
        ),
        "PUSHDOWN (filter+project documents)": Q._t(spark, SF_DIR, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars"),
        "X5 (media resolution)": Q.x5_media_ref_resolution(spark, SF_DIR),
        "SALTED AGG": Q.q_salted_event_agg(spark, SF_DIR),
        "F1 NGRAM BAN (lag window)": Q.f1_ngram_ban(spark, SF_DIR),
        "D5 BUCKETED EMBEDDING DUP": Q.d5_embedding_dup(spark, SF_DIR),
        "S2 MULTIPROBE LSH": Q.s2_knn_lsh(spark, SF_DIR),
        "S3 SEEDED IVF": Q.s3_knn_ivf(spark, SF_DIR),
        "P1/P4 GRID FOLD (zero shuffle)": Q.p4_pad_token_layout(spark, SF_DIR),
        "S7 ANNOTATION DRAW PLAN": Q.s7_annotation_plan(spark, SF_DIR),
        "S8 GEOMETRY ELEMENTS": Q.s8_geometry_plot(spark, SF_DIR),
        # d6 runs its fixpoint iterations eagerly at construction; the
        # printed plan is the final window over the localCheckpoint'ed
        # label table (per-iteration shapes are documented in PLANS.md)
        "D6 DUP CLUSTERS (post-closure)": Q.d6_dup_clusters(spark, SF_DIR),
    }
    for name, df in sections.items():
        print("=" * 30, name)
        df.explain("formatted")


if __name__ == "__main__":
    main()
