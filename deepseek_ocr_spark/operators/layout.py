"""PDF layout parsing: XY-cut reading-order recovery + font-run merging
(north_star). Semantics follow the reference's 2-D layout assembly —
row-major order with explicit band breaks, N4 at deepseek_ocr.py:423-438
— generalized to arbitrary block boxes.

XY-cut here is the bounded-depth variant (cut horizontally into bands,
then vertically into columns, then horizontally again inside each
column), which equals full recursive XY-cut for the page/column/row
layouts the reference produces. Each cut is an interval-merge computed
with running-max window functions — pure SQL, no recursion, no UDF:

    band boundary ⇔ a block's y1 lies above the running max y2 of all
    earlier blocks (ordered by y1) ⇒ a full-width horizontal gap.

100 TB shape: one hash exchange on (doc_id, page_no); all three cuts
and the final ordering reuse that partitioning (window functions over
the same keys), so the whole operator is a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# vertical gap (on the 0–999 grid) below which same-font blocks merge
RUN_GAP = 25


def _cut(df: DataFrame, part_cols: list[str], lo: str, hi: str, out: str) -> DataFrame:
    """One axis cut: group blocks of a partition into maximal runs of
    overlapping [lo, hi] intervals; run index (0-based) in `out`."""
    w = Window.partitionBy(*part_cols).orderBy(F.col(lo), F.col(hi), "block_id")
    prev_max = F.max(hi).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(prev_max.isNull() | (F.col(lo) > prev_max), 1).otherwise(0)
    return df.withColumn(
        out,
        (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "int"
        ),
    )


def reading_order(blocks: DataFrame) -> DataFrame:
    """blocks(doc_id, page_no, block_id, x1, y1, x2, y2, font_size, text)
    → + band, col, subband, reading_order (0-based within page)."""
    df = _cut(blocks, ["doc_id", "page_no"], "y1", "y2", "band")
    df = _cut(df, ["doc_id", "page_no", "band"], "x1", "x2", "col")
    df = _cut(df, ["doc_id", "page_no", "band", "col"], "y1", "y2", "subband")
    w = Window.partitionBy("doc_id", "page_no").orderBy(
        "band", "col", "subband", "y1", "x1", "block_id"
    )
    return df.withColumn("reading_order", (F.row_number().over(w) - 1).cast("int"))


def merge_font_runs(ordered: DataFrame) -> DataFrame:
    """Merge consecutive blocks (in reading order) with equal font_size,
    overlapping x-ranges, and downward vertical gap < RUN_GAP into font
    runs; emits one row per run with texts joined in order. The
    criterion is geometric, not band-structural — see the note below."""
    w = Window.partitionBy("doc_id", "page_no").orderBy("reading_order")
    gap = F.col("y1") - F.lag("y2").over(w)
    # NOTE on bands: runs deliberately ignore band boundaries. In a
    # single-column page every inter-paragraph gap IS a band break
    # (any full-width gap starts a band), so requiring band equality
    # would disable paragraph merging entirely; bands order blocks, the
    # merge criterion is geometric (x-compatible, downward, gap <
    # RUN_GAP) + same font. Corollary: a column's last block CAN merge
    # onto a next-band full-width block of the same font within
    # RUN_GAP — accepted, same-font-within-25/1000 is already a
    # same-paragraph signal; cross-column merges are blocked because
    # columns are x-disjoint.
    same_run = (
        (F.lag("font_size").over(w) == F.col("font_size"))
        # geometric column compatibility: x-ranges overlap
        & (F.col("x1") <= F.lag("x2").over(w))
        & (F.col("x2") >= F.lag("x1").over(w))
        # strictly downward, small gap (a paragraph split across blocks)
        & (gap >= 0)
        & (gap < RUN_GAP)
    )
    df = ordered.withColumn(
        "run_id",
        F.sum(F.when(same_run, 0).otherwise(1))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    return df.groupBy("doc_id", "page_no", "run_id").agg(
        F.min("reading_order").cast("int").alias("run_order"),
        F.first("font_size").alias("font_size"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("reading_order", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("text"),
        F.count("*").cast("bigint").alias("n_blocks"),
        F.min("x1").cast("int").alias("x1"),
        F.min("y1").cast("int").alias("y1"),
        F.max("x2").cast("int").alias("x2"),
        F.max("y2").cast("int").alias("y2"),
    )
