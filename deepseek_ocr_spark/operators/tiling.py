"""Tile-grid planning, pad geometry + vision-token budgeting
(SURVEY §2.2 P1/P3/P4/P6/P7).

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

Everything is a pure column expression — no UDFs, fully codegen'd. The
grid argmin is a sequential fold over the 13 candidate structs (round 3;
previously explode→window, which repartitioned N×13 rows by every page
column — a full-corpus shuffle for per-row arithmetic). The fold's
strict total order (diff asc, area desc, gw asc) picks the same winner
the window's row_number did, so downstream oracles are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    Small-image bypass: width and height both ≤ IMAGE_SIZE ⇒ (1, 1) grid
    (crop_ratio [1,1]), budget = the global view alone (GLOBAL_TOKENS;
    local views contribute zero — deepseek_ocr.py:79-80,95-106). P3
    semantics: no tiling work, but the global view is always consumed.

    Zero-shuffle: the 13-candidate argmin is a left-to-right fold seeded
    with the first candidate; the comparator (diff <, then area >, then
    gw <) is a strict total order over the candidate set, so the result
    is iteration-order independent and equal to the former window-rank
    formulation. Plan is Scan→Project only."""
    ar = F.col(w_col).cast("double") / F.col(h_col).cast("double")

    def scored(w_lit, h_lit):
        # gw/gh are int literals; diff is computed against the row's ar
        return F.struct(
            w_lit.alias("gw"),
            h_lit.alias("gh"),
            F.abs(ar - w_lit.cast("double") / h_lit.cast("double")).alias("diff"),
        )

    def better(n, b):
        n_area, b_area = n["gw"] * n["gh"], b["gw"] * b["gh"]
        return (
            (n["diff"] < b["diff"])
            | ((n["diff"] == b["diff"]) & (n_area > b_area))
            | ((n["diff"] == b["diff"]) & (n_area == b_area) & (n["gw"] < b["gw"]))
        )

    first_w, first_h = CANDIDATE_GRIDS[0]
    rest = F.array(
        *[
            F.struct(F.lit(w).alias("gw"), F.lit(h).alias("gh"))
            for (w, h) in CANDIDATE_GRIDS[1:]
        ]
    )
    best_expr = F.aggregate(
        rest,
        scored(F.lit(first_w), F.lit(first_h)),
        lambda acc, c: F.when(
            better(scored(c["gw"], c["gh"]), acc), scored(c["gw"], c["gh"])
        ).otherwise(acc),
    )
    best = pages.withColumn("_c", best_expr)
    small = (F.col(w_col) <= IMAGE_SIZE) & (F.col(h_col) <= IMAGE_SIZE)
    w_tiles = F.when(small, F.lit(1)).otherwise(F.col("_c.gw"))
    h_tiles = F.when(small, F.lit(1)).otherwise(F.col("_c.gh"))
    local = (Q_TILE * w_tiles + 1) * (Q_TILE * h_tiles)
    # small bypass = crop_ratio [1,1] (deepseek_ocr.py:79-80): the
    # GLOBAL view is still consumed and local views contribute ZERO —
    # budget is GLOBAL_TOKENS (273), the same small-page figure
    # token_layout emits. (A previous form charged a single 640 tile
    # view, 111 — not a reference mode: the model never swaps the
    # global view for a tile.)
    tokens = F.when(small, F.lit(GLOBAL_TOKENS)).otherwise(
        local + F.lit(GLOBAL_TOKENS)
    )
    return best.select(
        *pages.columns,
        w_tiles.cast("int").alias("w_tiles"),
        h_tiles.cast("int").alias("h_tiles"),
        (w_tiles * h_tiles).cast("int").alias("n_tiles"),
        tokens.cast("bigint").alias("vision_tokens"),
    )


# ImageOps.pad fill = mean * 255 channel-wise, mean = (0.5, 0.5, 0.5)
# (image_process.py:121,386-387)
PAD_FILL = int(0.5 * 255)  # 127, all three channels


def pad_plan(
    pages: DataFrame,
    w_col: str = "width",
    h_col: str = "height",
    base_size: int = BASE_SIZE,
    cropping: bool = True,
) -> DataFrame:
    """P4: global-view pad geometry (image_process.py:386-387,
    `ImageOps.pad(image, (base, base), color=mean*255)`) — pure
    closed-form geometry, no pixel tensors by design: the emitted
    columns reproduce PIL's contain-then-center-pad arithmetic exactly,
    so a resize kernel can rebuild the padded canvas bit-identically and
    padded-space coordinates invert to original pixels per axis
    (orig_x = (pad_x − pad_left) / scale,
    orig_y = (pad_y − pad_top) / scale_y). The two axis scales are NOT
    interchangeable: contain rint()s the scaled minor dimension, so the
    minor axis's realized scale differs from the major's by up to
    0.5/base — inverting y through the x scale lands on the wrong
    source pixel row near the content edge.

    PIL specifics mirrored: `contain` rounds the scaled minor dimension
    with Python round() = half-to-even (rint); the centered paste offset
    truncates via int() = floor for the non-negative slack. The
    non-cropping direct-resize branch (image_process.py:382-384,
    image_size ≤ 640 and not cropping) squares the source before the
    pad, collapsing the plan to a full-canvas fit."""
    if cropping:
        src_w = F.col(w_col).cast("double")
        src_h = F.col(h_col).cast("double")
    else:
        # direct resize to (IMAGE_SIZE, IMAGE_SIZE) before the pad
        src_w = F.lit(float(IMAGE_SIZE))
        src_h = F.lit(float(IMAGE_SIZE))
    base = F.lit(float(base_size))
    # contain: wider-than-square pins width, taller pins height
    wide = src_w >= src_h
    cw = F.when(wide, base).otherwise(F.rint(src_w / src_h * base))
    ch = F.when(wide, F.rint(src_h / src_w * base)).otherwise(base)
    left = F.floor((base - cw) / 2).cast("int")
    top = F.floor((base - ch) / 2).cast("int")
    return pages.select(
        *pages.columns,
        cw.cast("int").alias("content_w"),
        ch.cast("int").alias("content_h"),
        left.alias("pad_left"),
        top.alias("pad_top"),
        (F.lit(base_size) - cw.cast("int") - left).cast("int").alias("pad_right"),
        (F.lit(base_size) - ch.cast("int") - top).cast("int").alias("pad_bottom"),
        (cw / src_w).alias("scale"),
        (ch / src_h).alias("scale_y"),
        F.lit(PAD_FILL).alias("fill_r"),
        F.lit(PAD_FILL).alias("fill_g"),
        F.lit(PAD_FILL).alias("fill_b"),
    )


# BPE-ish text token estimator (GPT-2 pattern family, RE2/Java-portable
# subset) — the reference's true BPE vocab is a model artifact; shared
# with a1_token_count so both surfaces report the same estimate.
BPE_PAT = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+"

_SEG_TYPE = "array<struct<kind:string,start:bigint,len:bigint,is_image:boolean>>"


def token_layout(
    pages: DataFrame,
    w_col: str = "width",
    h_col: str = "height",
    text_col: str | None = None,
    cropping: bool = True,
    bos: bool = True,
    eos: bool = True,
) -> DataFrame:
    """P6: tokenize-with-images → interleaved token-layout table
    (image_process.py:330-470). The reference builds the literal token
    id sequence; the distributed product is its layout — per page the
    exact per-view token counts and the ordered segment map (kind,
    start offset, length, image-mask flag) the decoder consumes.

    Faithful token arithmetic: the global view always contributes
    (Q_BASE+1)·Q_BASE+1 = 273 tokens (row separators + view separator,
    image_process.py:428-429); tiling adds (Q_TILE·w+1)·(Q_TILE·h)
    only when the grid exceeds 1×1 (:430-432); small images (≤640²)
    and non-cropping mode keep crop_ratio = [1,1] (:363-375). Text
    tokens are estimated with the engine's BPE-ish segmenter (the
    reference's BPE vocab is a model artifact, not a public semantic);
    the prompt's text split follows the image per the reference PROMPT
    shape, so segments run bos → global_view → tiles → text → eos.

    Pure column expressions end to end: the segment offsets come from a
    sequential fold over the (constant-length) segment array — no UDF,
    no shuffle."""
    planned = plan_grid(pages, w_col=w_col, h_col=h_col)
    tiled = (
        (F.col("w_tiles") > 1) | (F.col("h_tiles") > 1)
        if cropping
        else F.lit(False)
    )
    w_t = F.when(F.lit(cropping), F.col("w_tiles")).otherwise(F.lit(1))
    h_t = F.when(F.lit(cropping), F.col("h_tiles")).otherwise(F.lit(1))
    tile_tokens = F.when(
        tiled, (Q_TILE * w_t + 1) * (Q_TILE * h_t)
    ).otherwise(F.lit(0)).cast("bigint")
    # NULL text = no text segment (0 tokens), not a NULL that poisons
    # seq_len and silently drops the text segment (ANSI size(NULL) is
    # NULL; a packing consumer summing seq_len would get NULL totals)
    text_tokens = (
        F.size(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_PAT), 0
            )
        ).cast("bigint")
        if text_col is not None
        else F.lit(0).cast("bigint")
    )

    # stage the scalars under reserved names, then derive the layout
    # from the staged columns in a SECOND select: the final select
    # aliases 'w_tiles'/'h_tiles', and any later expression in the same
    # select referencing those names would capture the alias, not the
    # plan_grid column (CLAUDE.md rule 10 — today the values coincide,
    # but an edit to the alias would silently flow into tile_tokens
    # instead of failing visibly)
    staged = planned.select(
        *pages.columns,
        w_t.cast("int").alias("_w_t"),
        h_t.cast("int").alias("_h_t"),
        tile_tokens.alias("_tile_tok"),
        text_tokens.alias("_text_tok"),
    )
    tile_tok = F.col("_tile_tok")
    text_tok = F.col("_text_tok")

    def seg(kind: str, length, is_image: bool):
        return F.struct(
            F.lit(kind).alias("kind"),
            length.cast("bigint").alias("len"),
            F.lit(is_image).alias("is_image"),
        )

    segs = F.filter(
        F.array(
            seg("bos", F.lit(1 if bos else 0), False),
            seg("global_view", F.lit(GLOBAL_TOKENS), True),
            seg("tiles", tile_tok, True),
            seg("text", text_tok, False),
            seg("eos", F.lit(1 if eos else 0), False),
        ),
        lambda s: s["len"] > 0,
    )
    layout = F.aggregate(
        segs,
        F.struct(
            F.lit(0).cast("bigint").alias("pos"),
            F.array().cast(_SEG_TYPE).alias("out"),
        ),
        lambda acc, s: F.struct(
            (acc["pos"] + s["len"]).alias("pos"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        s["kind"].alias("kind"),
                        acc["pos"].alias("start"),
                        s["len"].alias("len"),
                        s["is_image"].alias("is_image"),
                    )
                ),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )
    image_tokens = (F.lit(GLOBAL_TOKENS).cast("bigint") + tile_tok).alias(
        "image_tokens"
    )
    return staged.select(
        *pages.columns,
        F.col("_w_t").alias("w_tiles"),
        F.col("_h_t").alias("h_tiles"),
        image_tokens,
        text_tok.alias("text_tokens"),
        (
            F.lit((1 if bos else 0) + (1 if eos else 0)).cast("bigint")
            + F.lit(GLOBAL_TOKENS)
            + tile_tok
            + text_tok
        ).alias("seq_len"),
        layout.alias("segments"),
    )
