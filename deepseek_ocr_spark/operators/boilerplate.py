"""HTML boilerplate stripping: jusText/Readability-style block
classification over a flattened DOM node table (north_star; SURVEY §2.5
X7 generalization — the reference's layout-span drop at
run_dpsk_ocr_pdf.py:313-314 scaled up to density heuristics).

Algorithm (simplified jusText, Pomikálek 2011):
1. context-free pass — per-node features (link density = linked chars /
   chars, tag priors, length) classify each block good / bad / short /
   near-good;
2. context-sensitive pass — short/near-good blocks inherit 'good' iff
   the nearest decisive neighbor on either side (document order) is
   good. Implemented with last_value(IGNORE NULLS) windows — no Python,
   no shuffle beyond the one doc-partitioned exchange.

100 TB shape: one hash exchange on doc_id (window + final groupBy reuse
the same partitioning), everything else whole-stage codegen. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BAD_TAGS = ("nav", "footer", "aside", "header", "form", "script")

# context-free thresholds (jusText defaults, simplified)
MAX_LINK_DENSITY = 0.3
SHORT_LEN = 20
GOOD_LEN = 80
GOOD_LINK_DENSITY = 0.1


def classify_nodes(nodes: DataFrame) -> DataFrame:
    """Add cls_raw (context-free) and cls (context-sensitive) columns to a
    DOM node table (doc_id, node_id, tag, text, n_chars, n_link_chars,
    n_tags)."""
    link_density = F.col("n_link_chars").cast("double") / F.greatest(
        F.col("n_chars").cast("double"), F.lit(1.0)
    )
    cls_raw = (
        F.when(F.col("tag").isin(*BAD_TAGS), "bad")
        .when(link_density > MAX_LINK_DENSITY, "bad")
        .when(F.col("n_chars") < SHORT_LEN, "short")
        .when(
            (F.col("n_chars") >= GOOD_LEN) & (link_density < GOOD_LINK_DENSITY),
            "good",
        )
        .otherwise("near")
    )
    df = nodes.withColumn("link_density", F.round(link_density, 6)).withColumn(
        "cls_raw", cls_raw
    )
    w = Window.partitionBy("doc_id").orderBy("node_id")
    decisive = F.when(F.col("cls_raw").isin("good", "bad"), F.col("cls_raw"))
    prev_cls = F.last(decisive, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_cls = F.first(decisive, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    cls = (
        F.when(F.col("cls_raw").isin("good", "bad"), F.col("cls_raw"))
        .when((prev_cls == "good") | (next_cls == "good"), "good")
        .otherwise("bad")
    )
    return df.withColumn("cls", cls)


def extract_main_content(nodes: DataFrame) -> DataFrame:
    """Per-document main content: good blocks concatenated in node order,
    plus extraction metrics (blocks kept/dropped, char yield)."""
    classified = classify_nodes(nodes)
    return classified.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("cls") == "good", F.struct("node_id", "text")
                        )
                    )
                ),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("content"),
        F.sum(F.when(F.col("cls") == "good", 1).otherwise(0))
        .cast("bigint")
        .alias("blocks_kept"),
        F.sum(F.when(F.col("cls") == "good", 0).otherwise(1))
        .cast("bigint")
        .alias("blocks_dropped"),
        F.sum(
            F.when(F.col("cls") == "good", F.col("n_chars")).otherwise(0)
        )
        .cast("bigint")
        .alias("char_yield"),
    )
