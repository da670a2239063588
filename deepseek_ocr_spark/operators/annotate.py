"""Data-level annotated-layout + geometry-plot sinks (SURVEY §2.1 S7/S8).

S7 — annotated-layout sink. The reference draws every grounding ref's
boxes onto the page image and saves a `_layouts.pdf`
(run_dpsk_ocr_pdf.py:151-215 draw_bounding_boxes, :328-329 sink). The
distributed product is the DRAW PLAN as a table: per kept page, per ref
(match order), per box — pixel rect (int(v/999*dim) truncation), outline
width (title 4, else 2), label anchor (x1, max(0, y1−15)), the 20/255
alpha fill, and for image refs the crop path `images/{jdx}_{img_idx}.jpg`
with the PAGE-LEVEL BOX counter the drawing loop uses (:163,186-190 —
note it differs from the media-rewrite's per-match counter at :310-311
whenever one image ref carries several boxes; X5 models the rewrite,
this models the draw). Rasterization is a gated PIL kernel.

Documented deviation: the reference colors each ref with np.random
(:171) — an unseeded, run-dependent value with no data semantics; here
color derives deterministically from md5(doc, jdx, ref_idx) into the
same component ranges (r, g < 200, b < 255).

S8 — geometry-plot sink. The reference eval()s a dict-shaped `Line` /
`Circle` payload and re-plots it with matplotlib
(run_dpsk_ocr_image.py:250-300). The distributed product is the parsed
geometry-elements table: line segments split on ' -- ' with aligned
line_type, labeled endpoints, circles with center + radius. Malformed
entries are dropped, mirroring the reference's bare-except skips
(:266-277 per line, :287-296 circles); whole-payload parse failures
yield zero elements, never an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import EOS_SENTINEL

REF_PAT = r"(?s)<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>"
_BOX_PAT = r"\[\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\]"


def annotation_plan(
    pages: DataFrame,
    image_w: int = 1280,
    image_h: int = 1810,
    content_col: str = "content",
    skip_repeat: bool = True,
) -> DataFrame:
    """S7 draw plan over a raw page table (doc_id, page_no, content).

    Page gate first (SKIP_REPEAT semantics, run_dpsk_ocr_pdf.py:289-293):
    pages without the EOS sentinel are truncated repeats — dropped when
    skip_repeat, kept otherwise; `jdx` numbers the KEPT pages per doc in
    page order, exactly the counter the reference's zip loop advances
    (:285,320). One window shuffle on doc_id (bounded groups — pages per
    doc), then everything is array-local: the per-ref explode ships only
    (ids, label, det payload), never page bodies.
    """
    kept = pages
    if skip_repeat:
        kept = kept.filter(F.col(content_col).contains(EOS_SENTINEL))
    kept = kept.withColumn(
        "_c", F.replace(F.col(content_col), F.lit(EOS_SENTINEL), F.lit(""))
    )
    jdx_w = Window.partitionBy("doc_id").orderBy("page_no")
    kept = kept.withColumn("jdx", F.row_number().over(jdx_w) - 1)

    refs = kept.select(
        "doc_id",
        "jdx",
        F.posexplode(
            F.arrays_zip(
                F.regexp_extract_all("_c", F.lit(REF_PAT), 1).alias("label"),
                F.regexp_extract_all("_c", F.lit(REF_PAT), 2).alias("det"),
            )
        ).alias("ref_idx", "_r"),
    )
    # malformed det payloads yield zero box matches -> the non-outer
    # posexplode drops the ref, mirroring the try/except skip at :166-213.
    # Documented deviation: on a MIXED list like [[1,2,3],[1,2,3,4]] the
    # reference's eval + 4-tuple unpack aborts the whole ref at the first
    # bad box; the regex keeps the well-formed ones (per-box skip is the
    # only order-free relational form of the same error swallowing)
    boxes = refs.select(
        "doc_id",
        "jdx",
        "ref_idx",
        F.col("_r.label").alias("label"),
        F.posexplode(
            F.regexp_extract_all(F.col("_r.det"), F.lit(_BOX_PAT), 0)
        ).alias("box_idx", "_box"),
    )

    def px(group: int, dim: int):
        v = F.regexp_extract("_box", _BOX_PAT, group).cast("bigint")
        return F.floor(v / 999 * dim).cast("bigint")

    is_img = F.col("label") == "image"
    img_w = (
        Window.partitionBy("doc_id", "jdx")
        .orderBy("ref_idx", "box_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    color_hex = F.md5(
        F.concat_ws(":", F.col("doc_id"), F.col("jdx"), F.col("ref_idx"))
    )
    out = boxes.select(
        "doc_id",
        "jdx",
        "ref_idx",
        "box_idx",
        "label",
        px(1, image_w).alias("x1"),
        px(2, image_h).alias("y1"),
        px(3, image_w).alias("x2"),
        px(4, image_h).alias("y2"),
        F.when(F.col("label") == "title", F.lit(4))
        .otherwise(F.lit(2))
        .alias("outline_width"),
        F.lit(20).alias("fill_alpha"),
        (F.conv(F.substr(color_hex, F.lit(1), F.lit(2)), 16, 10).cast("int") % 200).alias("color_r"),
        (F.conv(F.substr(color_hex, F.lit(3), F.lit(2)), 16, 10).cast("int") % 200).alias("color_g"),
        (F.conv(F.substr(color_hex, F.lit(5), F.lit(2)), 16, 10).cast("int") % 255).alias("color_b"),
        F.when(is_img, F.sum(is_img.cast("int")).over(img_w) - 1).alias(
            "img_idx"
        ),
    )
    # label anchor + crop path in a second select: the anchor reads the
    # just-computed pixel columns (lateral-alias discipline, CLAUDE #10)
    return out.select(
        "*",
        F.col("x1").alias("label_x"),
        F.greatest(F.lit(0), F.col("y1") - 15).alias("label_y"),
        F.when(
            F.col("img_idx").isNotNull(),
            F.concat(
                F.lit("images/"),
                F.col("jdx").cast("string"),
                F.lit("_"),
                F.col("img_idx").cast("string"),
                F.lit(".jpg"),
            ),
        ).alias("crop_path"),
    )


def render_annotation_page(image, plan_rows):
    """Gated PIL rasterizer for one page's draw plan — the literal
    draw_bounding_boxes body (run_dpsk_ocr_pdf.py:151-215) minus the
    coordinate/color/counter arithmetic, which the plan already carries.
    Raises NotImplementedError where PIL is absent (this container);
    exercised by skip-marked tests wherever the codec exists."""
    try:
        from PIL import Image, ImageDraw, ImageFont
    except ImportError as e:
        raise NotImplementedError(
            "annotation rendering requires PIL; container ships without "
            "codecs — the draw plan table is the data product"
        ) from e

    img_draw = image.copy()
    draw = ImageDraw.Draw(img_draw)
    overlay = Image.new("RGBA", img_draw.size, (0, 0, 0, 0))
    draw2 = ImageDraw.Draw(overlay)
    font = ImageFont.load_default()
    for r in plan_rows:
        color = (r["color_r"], r["color_g"], r["color_b"])
        box = [r["x1"], r["y1"], r["x2"], r["y2"]]
        draw.rectangle(box, outline=color, width=r["outline_width"])
        draw2.rectangle(
            box, fill=color + (r["fill_alpha"],), outline=(0, 0, 0, 0), width=1
        )
        tb = draw.textbbox((0, 0), r["label"], font=font)
        draw.rectangle(
            [
                r["label_x"],
                r["label_y"],
                r["label_x"] + tb[2] - tb[0],
                r["label_y"] + tb[3] - tb[1],
            ],
            fill=(255, 255, 255, 30),
        )
        draw.text((r["label_x"], r["label_y"]), r["label"], font=font, fill=color)
    img_draw.paste(overlay, (0, 0), overlay)
    return img_draw


# ---------------------------------------------------------------------------
# S8: geometry-elements table

_GEOM_SCHEMA = (
    "struct<Line:struct<line:array<string>,line_type:array<string>,"
    "line_endpoint:array<string>>,"
    "Circle:struct<circle_center:array<string>,radius:array<double>>>"
)
# anchored: the reference eval()s each part, which rejects any trailing
# garbage — '(1, 2) extra' must NOT parse (a floating regex would).
# Coordinate syntax = the Python float-literal forms eval() accepts:
# optional sign, '1' / '1.' / '.5' / '1.5', optional exponent. Still
# narrower than eval (no '1_000', 'inf', arithmetic expressions) —
# those stay parse-skipped like any malformed entry.
_NUM = r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?"
_POINT = rf"^\s*\(\s*({_NUM})\s*,\s*({_NUM})\s*\)\s*$"

_ELEM_ARR_TYPE = (
    "array<struct<kind:string,idx:int,x0:double,y0:double,x1:double,"
    "y1:double,label:string,style:string,radius:double>>"
)

_ELEM_FIELDS = (
    "kind", "idx", "x0", "y0", "x1", "y1", "label", "style", "radius",
)


def _elem(kind, idx, x0, y0, x1, y1, label, style, radius):
    return F.struct(
        kind.alias("kind"),
        idx.cast("int").alias("idx"),
        x0.cast("double").alias("x0"),
        y0.cast("double").alias("y0"),
        x1.cast("double").alias("x1"),
        y1.cast("double").alias("y1"),
        label.cast("string").alias("label"),
        style.cast("string").alias("style"),
        radius.cast("double").alias("radius"),
    )


def geometry_elements(
    df: DataFrame, col: str = "geometry", id_col: str = "doc_id"
) -> DataFrame:
    """S8: parse the reference's dict-shaped geometry payload into one
    relational elements table: kind ∈ {line, endpoint, circle}.

    Faithful to run_dpsk_ocr_image.py:250-300:
    - dispatch gate — the reference only enters the geometry branch when
      the raw output CONTAINS the substring 'line_type' (:250); payloads
      without it yield zero elements here too;
    - the reference eval()s the payload (:253-259) — code execution on
      model output; here the single-quoted dict normalizes to JSON and
      parses with from_json (null on malformed → zero elements);
    - lines split on ' -- ' taking first/last parts, BOTH endpoints must
      parse, and line_type[idx] must exist — the reference indexes
      line_type inside the per-line try (:265-278), so a short
      line_type list silently drops the tail lines (zip-strictness),
      it does not default. The STYLE column keeps the value whose
      '--'-vs-else distinction the plot then draws identically (:270-273);
    - all three Line fields (line, line_type, line_endpoint) are
      accessed unconditionally at :253-259 — a payload missing ANY of
      them crashes the reference before a single element is drawn, so
      it yields zero elements here (empty lists are fine);
    - endpoints split on ': ', the point eval'd from the SECOND part
      exactly (:280-283) — mirrored as an anchored parse of
      split[1], not a substring scan. Documented deviation: the
      reference's endpoint loop is UNGUARDED — a malformed endpoint
      crashes the whole plot; crash-on-row is not a viable distributed
      semantic, so unparseable endpoints are dropped instead;
    - circles zip center strings with the radius array (:287-296) —
      zip truncation mirrored via the radius-exists requirement.
      Documented deviation: the reference's single try around the circle
      loop aborts the REMAINING circles after the first bad one (order-
      dependent state); here each circle is judged independently.

    Everything is array-local column code: no UDF, no shuffle, one
    explode of the bounded per-row element array."""
    # normalize the Python-dict single quotes to JSON: only STRUCTURAL
    # quotes (adjacent to { [ , : ] } delimiters) are rewritten — a
    # blanket '→" would corrupt any payload whose strings contain an
    # apostrophe, nulling from_json and dropping ALL elements of an
    # otherwise valid payload (review r4). An embedded quote directly
    # against a delimiter inside a string value can still confuse the
    # rewrite; that is the residual cost of not eval()ing model output
    # the way the reference does (run_dpsk_ocr_image.py:253).
    jsonish = F.regexp_replace(
        F.regexp_replace(F.col(col), r"([\{\[,:]\s*)'", '$1"'),
        r"'(\s*[:,\]\}])",
        '"$1',
    )
    parsed = F.when(
        F.contains(F.col(col), F.lit("line_type")),
        F.from_json(jsonish, _GEOM_SCHEMA),
    )
    d = df.withColumn("_g", parsed)
    lines = F.col("_g.Line.line")
    ltypes = F.col("_g.Line.line_type")
    ends = F.col("_g.Line.line_endpoint")
    centers = F.col("_g.Circle.circle_center")
    radii = F.col("_g.Circle.radius")

    def pt(s, grp: int):
        return F.nullif(F.regexp_extract(s, _POINT, grp), F.lit(""))

    def let_parts(s, delim, body):
        # r3 let-idiom: HOF lambda bodies are interpreted (rule 19), so
        # bind split(s, delim) ONCE per element and hand the parts array
        # to the body, instead of re-running the regex split for every
        # field that reads a part (4x per line, 3x per labeled point)
        return F.transform(F.array(F.split(s, delim)), body)[0]

    line_elems = F.transform(
        F.coalesce(lines, F.array().cast("array<string>")),
        lambda s, i: let_parts(
            s,
            " -- ",
            lambda parts: _elem(
                F.lit("line"),
                i,
                pt(F.element_at(parts, 1), 1),
                pt(F.element_at(parts, 1), 2),
                pt(F.element_at(parts, -1), 1),
                pt(F.element_at(parts, -1), 2),
                F.lit(None),
                # try_element_at: ANSI mode ON — a missing line_type
                # entry must yield NULL (→ the line is dropped below,
                # mirroring the reference's in-try IndexError skip),
                # not throw
                F.try_element_at(ltypes, i + 1),
                F.lit(None),
            ),
        ),
    )

    def labeled_elem(kind, radius_of):
        # reference shape 'A: (x, y)' — the point is eval'd from
        # split(': ')[1] exactly (:281,:293), not found by substring
        return lambda s, i: let_parts(
            s,
            ": ",
            lambda parts: _elem(
                F.lit(kind),
                i,
                pt(F.try_element_at(parts, F.lit(2)), 1),
                pt(F.try_element_at(parts, F.lit(2)), 2),
                F.lit(None),
                F.lit(None),
                F.element_at(parts, 1),
                F.lit(None),
                radius_of(i),
            ),
        )

    end_elems = F.transform(
        F.coalesce(ends, F.array().cast("array<string>")),
        labeled_elem("endpoint", lambda i: F.lit(None)),
    )
    circle_elems = F.transform(
        F.coalesce(centers, F.array().cast("array<string>")),
        labeled_elem("circle", lambda i: F.try_element_at(radii, i + 1)),
    )
    filtered = F.filter(
        F.concat(line_elems, end_elems, circle_elems),
        # bare-except skip semantics: anchor coordinates must parse;
        # lines additionally need BOTH endpoints and their line_type
        # entry (reference indexes both inside the try); circles need
        # their zip partner in the radius array
        lambda e: e["x0"].isNotNull()
        & e["y0"].isNotNull()
        & ((e["kind"] != "line") | (e["x1"].isNotNull() & e["y1"].isNotNull()))
        & ((e["kind"] != "line") | e["style"].isNotNull())
        & ((e["kind"] != "circle") | e["radius"].isNotNull()),
    )
    # all-fields gate: the reference dereferences line, line_type AND
    # line_endpoint before drawing anything — a payload missing any of
    # the three crashes it with zero output, circles included
    elems = F.when(
        lines.isNotNull() & ltypes.isNotNull() & ends.isNotNull(), filtered
    ).otherwise(F.array().cast(_ELEM_ARR_TYPE))
    return d.select(
        F.col(id_col), F.explode(elems).alias("_e")
    ).select(id_col, *[F.col(f"_e.{f}").alias(f) for f in _ELEM_FIELDS])
