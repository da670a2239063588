"""Tile-grid planning + vision-token budgeting (SURVEY §2.2 P1/P3/P7).

The reference picks a (w_tiles, h_tiles) grid per page minimizing
|aspect_ratio − w/h| over grids with MIN_CROPS ≤ w·h ≤ MAX_CROPS
(image_process.py:11-42 find_closest_aspect_ratio; config.py:11-12), with
small images bypassing tiling entirely (image_process.py:363-375), and
derives a closed-form vision-token count from the grid
(deepseek_ocr.py:61-106). In this engine the planner survives as the
cost model for size-tiered partition coalescing (plans/coalesce.py):
token budget ≈ per-document processing cost.

Deviation from the reference, documented: ties in the aspect-ratio
objective are broken by larger grid area then smaller w (the reference's
tie-break order depends on Python set iteration order at
image_process.py:32-34, which is not a stable public semantic).

Everything is a pure column expression (explode candidates → window
rank) — no UDFs, fully codegen'd, ~13 candidate rows per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_CROPS = 2
MAX_CROPS = 6
BASE_SIZE = 1024
IMAGE_SIZE = 640
PATCH = 16
DOWNSAMPLE = 4

# all (w, h) grids with MIN_CROPS <= w*h <= MAX_CROPS (config.py:11-12)
CANDIDATE_GRIDS = sorted(
    {
        (i, j)
        for n in range(MIN_CROPS, MAX_CROPS + 1)
        for i in range(1, n + 1)
        for j in range(1, n + 1)
        if MIN_CROPS <= i * j <= MAX_CROPS
    },
    key=lambda g: (g[0] * g[1], g[0]),
)

# per-view query counts (deepseek_ocr.py:95-106): ceil((size/patch)/downsample)
Q_BASE = -(-(BASE_SIZE // PATCH) // DOWNSAMPLE)  # 16
Q_TILE = -(-(IMAGE_SIZE // PATCH) // DOWNSAMPLE)  # 10
GLOBAL_TOKENS = (Q_BASE + 1) * Q_BASE + 1  # newline per row + view sep


def plan_grid(pages: DataFrame, w_col: str = "width", h_col: str = "height") -> DataFrame:
    """Add (w_tiles, h_tiles, n_tiles, vision_tokens) to a page table.

    Small-image bypass: width and height both ≤ IMAGE_SIZE ⇒ (1, 1) grid,
    token cost of a single tile view (P3 semantics)."""
    cands = F.array(
        *[
            F.struct(F.lit(w).alias("gw"), F.lit(h).alias("gh"))
            for (w, h) in CANDIDATE_GRIDS
        ]
    )
    ar = F.col(w_col).cast("double") / F.col(h_col).cast("double")
    exploded = pages.withColumn("_c", F.explode(cands))
    diff = F.abs(ar - F.col("_c.gw").cast("double") / F.col("_c.gh").cast("double"))
    win = Window.partitionBy(*pages.columns).orderBy(
        diff.asc(),
        (F.col("_c.gw") * F.col("_c.gh")).desc(),
        F.col("_c.gw").asc(),
    )
    best = (
        exploded.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    small = (F.col(w_col) <= IMAGE_SIZE) & (F.col(h_col) <= IMAGE_SIZE)
    w_tiles = F.when(small, F.lit(1)).otherwise(F.col("_c.gw"))
    h_tiles = F.when(small, F.lit(1)).otherwise(F.col("_c.gh"))
    local = (Q_TILE * w_tiles + 1) * (Q_TILE * h_tiles)
    tokens = F.when(small, F.lit((Q_TILE + 1) * Q_TILE + 1)).otherwise(
        local + F.lit(GLOBAL_TOKENS)
    )
    return best.select(
        *pages.columns,
        w_tiles.cast("int").alias("w_tiles"),
        h_tiles.cast("int").alias("h_tiles"),
        (w_tiles * h_tiles).cast("int").alias("n_tiles"),
        tokens.cast("bigint").alias("vision_tokens"),
    )
