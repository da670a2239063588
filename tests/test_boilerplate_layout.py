"""Unit tests for boilerplate classification and XY-cut reading order
on hand-built fixtures with known expected outputs (reference test
pattern: exact expectations per operator, mlx_port/tests/unit)."""

from pyspark.sql import functions as F

from deepseek_ocr_spark.operators.boilerplate import classify_nodes, extract_main_content
from deepseek_ocr_spark.operators.layout import merge_font_runs, reading_order

NODE_COLS = "doc_id string, node_id int, tag string, text string, n_chars int, n_link_chars int, n_tags int"


def test_boilerplate_rules(spark):
    rows = [
        # nav tag → bad regardless of content
        ("d1", 0, "nav", "x" * 100, 100, 0, 1),
        # long low-link → good
        ("d1", 1, "p", "y" * 100, 100, 2, 1),
        # short between good and good → inherits good
        ("d1", 2, "p", "short", 5, 0, 1),
        ("d1", 3, "p", "z" * 100, 100, 0, 1),
        # high link density → bad
        ("d1", 4, "p", "w" * 100, 100, 50, 1),
        # short after bad, nothing good follows → bad
        ("d1", 5, "p", "tail", 4, 0, 1),
    ]
    out = {
        r["node_id"]: r["cls"]
        for r in classify_nodes(spark.createDataFrame(rows, NODE_COLS)).collect()
    }
    assert out == {0: "bad", 1: "good", 2: "good", 3: "good", 4: "bad", 5: "bad"}


def test_main_content_assembly(spark):
    rows = [
        ("d1", 0, "p", "A" * 100, 100, 0, 1),
        ("d1", 1, "nav", "menu", 4, 4, 1),
        ("d1", 2, "p", "B" * 100, 100, 0, 1),
    ]
    r = extract_main_content(spark.createDataFrame(rows, NODE_COLS)).collect()[0]
    assert r["content"] == "A" * 100 + "\n" + "B" * 100
    assert r["blocks_kept"] == 2 and r["blocks_dropped"] == 1
    assert r["char_yield"] == 200


BLOCK_COLS = (
    "doc_id string, page_no int, block_id int, x1 int, y1 int, x2 int, y2 int, "
    "font_size double, text string"
)


def test_reading_order_two_columns(spark):
    """Title band, two staggered columns (y-overlap so they share a band),
    footer. Expected: title, left col top-down, right col top-down, footer."""
    rows = [
        ("d", 0, 0, 100, 10, 900, 60, 24.0, "title"),
        # left column (x 50-480), rows at y 100/240/380
        ("d", 0, 1, 50, 100, 480, 230, 12.0, "L1"),
        ("d", 0, 2, 50, 240, 480, 370, 12.0, "L2"),
        ("d", 0, 3, 50, 380, 480, 510, 12.0, "L3"),
        # right column staggered +70 → bridges left's inter-row gaps
        ("d", 0, 4, 520, 170, 950, 300, 12.0, "R1"),
        ("d", 0, 5, 520, 310, 950, 440, 12.0, "R2"),
        ("d", 0, 6, 100, 600, 900, 650, 8.0, "footer"),
    ]
    out = reading_order(spark.createDataFrame(rows, BLOCK_COLS))
    order = [
        r["text"] for r in out.orderBy("reading_order").select("text").collect()
    ]
    assert order == ["title", "L1", "L2", "L3", "R1", "R2", "footer"]


def test_font_run_merge(spark):
    """Same column, same font, gap < 25 → one run; font change breaks."""
    rows = [
        ("d", 0, 0, 50, 100, 480, 200, 12.0, "a"),
        ("d", 0, 1, 50, 210, 480, 300, 12.0, "b"),   # gap 10 → merge
        ("d", 0, 2, 50, 310, 480, 400, 14.0, "c"),   # font break
        ("d", 0, 3, 50, 410, 480, 500, 14.0, "d"),   # gap 10 → merge
    ]
    runs = merge_font_runs(reading_order(spark.createDataFrame(rows, BLOCK_COLS)))
    got = sorted(
        (r["run_order"], r["text"], r["n_blocks"]) for r in runs.collect()
    )
    assert got == [(0, "a b", 2), (2, "c d", 2)]
