"""S7 annotated-layout draw plan + S8 geometry-elements table
(operators/annotate.py) and the P4/P6 preprocess plans
(operators/tiling.py pad_plan/token_layout)."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.operators.annotate import (
    annotation_plan,
    geometry_elements,
)
from deepseek_ocr_spark.operators.tiling import (
    GLOBAL_TOKENS,
    pad_plan,
    token_layout,
)
from deepseek_ocr_spark.schema import EOS_SENTINEL


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, page_no int, content string"
    )


REF = "<|ref|>{}<|/ref|><|det|>{}<|/det|>"


class TestAnnotationPlan:
    def test_eos_gate_and_jdx(self, spark):
        rows = [
            ("d", 0, REF.format("title", "[[0,0,999,999]]") + EOS_SENTINEL),
            ("d", 1, "truncated repeat page no sentinel"),
            ("d", 2, REF.format("text", "[[10,10,20,20]]") + EOS_SENTINEL),
        ]
        out = annotation_plan(_pages(spark, rows)).collect()
        # page 1 dropped; kept pages renumbered 0,1 (reference jdx
        # advances only over kept pages, run_dpsk_ocr_pdf.py:285,320)
        assert sorted({(r.jdx) for r in out}) == [0, 1]
        title = [r for r in out if r.label == "title"][0]
        assert (title.x1, title.y1) == (0, 0)
        # int(999/999*W) = W
        assert (title.x2, title.y2) == (1280, 1810)
        assert title.outline_width == 4 and title.fill_alpha == 20

    def test_page_level_image_counter_multibox(self, spark):
        # one image ref with TWO boxes then another image ref: the draw
        # loop's counter is per-BOX page-level (:163,186-190), so paths
        # run 0_0, 0_1, 0_2 even though the rewrite counter would give
        # the first ref a single number.
        content = (
            REF.format("image", "[[1,2,3,4],[5,6,7,8]]")
            + REF.format("title", "[[0,0,9,9]]")
            + REF.format("image", "[[9,9,99,99]]")
            + EOS_SENTINEL
        )
        out = annotation_plan(_pages(spark, [("d", 0, content)])).collect()
        imgs = sorted(
            [r for r in out if r.label == "image"],
            key=lambda r: (r.ref_idx, r.box_idx),
        )
        assert [r.img_idx for r in imgs] == [0, 1, 2]
        assert [r.crop_path for r in imgs] == [
            "images/0_0.jpg",
            "images/0_1.jpg",
            "images/0_2.jpg",
        ]
        # non-image rows carry no crop path
        assert all(
            r.img_idx is None and r.crop_path is None
            for r in out
            if r.label != "image"
        )

    def test_malformed_det_dropped_colors_deterministic(self, spark):
        content = (
            REF.format("text", "[[12, 34")  # eval() failure analogue
            + REF.format("table", "[[1, 2, 3, 4]]")  # whitespace ok
            + EOS_SENTINEL
        )
        out = annotation_plan(_pages(spark, [("d", 0, content)])).collect()
        assert [r.label for r in out] == ["table"]
        r = out[0]
        assert 0 <= r.color_r < 200 and 0 <= r.color_g < 200
        assert 0 <= r.color_b < 255
        # label anchor: (x1, max(0, y1-15)) with y1 = int(2/999*1810) = 3
        assert r.label_x == r.x1 and r.label_y == 0
        again = annotation_plan(_pages(spark, [("d", 0, content)])).collect()
        assert again[0].color_r == r.color_r

    def test_skip_repeat_off_keeps_all_pages(self, spark):
        rows = [("d", 0, REF.format("text", "[[1,1,2,2]]"))]
        assert annotation_plan(_pages(spark, rows)).count() == 0
        assert (
            annotation_plan(_pages(spark, rows), skip_repeat=False).count() == 1
        )


FULL_GEOM = (
    "{'Line': {'line': ['(3, 4) -- (10, 12)', '(0, 0) -- (5, 5)'], "
    "'line_type': ['--', '-'], "
    "'line_endpoint': ['A: (3, 4)', 'B: (10, 12)']}, "
    "'Circle': {'circle_center': ['O: (7, 8)'], 'radius': [2.5]}}"
)


class TestGeometryElements:
    def _run(self, spark, payload):
        df = spark.createDataFrame([("d", payload)], "doc_id string, geometry string")
        return geometry_elements(df).collect()

    def test_full_payload(self, spark):
        rows = self._run(spark, FULL_GEOM)
        by_kind = {}
        for r in rows:
            by_kind.setdefault(r.kind, []).append(r)
        lines = sorted(by_kind["line"], key=lambda r: r.idx)
        assert [(r.x0, r.y0, r.x1, r.y1) for r in lines] == [
            (3.0, 4.0, 10.0, 12.0),
            (0.0, 0.0, 5.0, 5.0),
        ]
        # line_type aligns by ordinal
        assert [r.style for r in lines] == ["--", "-"]
        ends = sorted(by_kind["endpoint"], key=lambda r: r.idx)
        assert [(r.label, r.x0, r.y0) for r in ends] == [
            ("A", 3.0, 4.0),
            ("B", 10.0, 12.0),
        ]
        (circ,) = by_kind["circle"]
        assert (circ.label, circ.x0, circ.y0, circ.radius) == ("O", 7.0, 8.0, 2.5)

    def test_multi_part_line_takes_first_and_last(self, spark):
        rows = self._run(
            spark,
            "{'Line': {'line': ['(1, 2) -- (9, 9) -- (3, 4)'], "
            "'line_type': ['-'], 'line_endpoint': []}}",
        )
        (r,) = rows
        assert (r.x0, r.y0, r.x1, r.y1) == (1.0, 2.0, 3.0, 4.0)
        assert r.style == "-"

    def test_apostrophe_in_string_does_not_null_payload(self, spark):
        """Only STRUCTURAL quotes are rewritten to JSON: an apostrophe
        inside a string value must not corrupt the parse and zero out
        the whole payload's elements (review r4). The apostrophe-bearing
        line itself has no parseable points (dropped), but the circle
        and the well-formed line survive."""
        rows = self._run(
            spark,
            "{'Line': {'line': ['it's a label -- nowhere', "
            "'(1, 2) -- (3, 4)'], 'line_type': ['-', '--'], "
            "'line_endpoint': []}, "
            "'Circle': {'circle_center': ['O: (7, 8)'], 'radius': [2.5]}}",
        )
        by_kind = {}
        for r in rows:
            by_kind.setdefault(r.kind, []).append(r)
        (line,) = by_kind["line"]
        assert (line.x0, line.y0, line.x1, line.y1) == (1.0, 2.0, 3.0, 4.0)
        (circ,) = by_kind["circle"]
        assert (circ.label, circ.radius) == ("O", 2.5)

    def test_dispatch_gate_no_line_type_substring(self, spark):
        # the reference only enters the geometry branch when the raw
        # output CONTAINS 'line_type' (run_dpsk_ocr_image.py:250)
        assert (
            self._run(spark, "{'Line': {'line': ['(1, 2) -- (3, 4)']}}") == []
        )

    def test_all_three_line_fields_required(self, spark):
        # the reference dereferences line, line_type AND line_endpoint
        # before drawing anything (:253-259) — missing any one crashes
        # it with zero output, circles included
        for payload in (
            "{'Line': {'line': ['(1, 2) -- (3, 4)'], 'line_type': ['-']}}",
            "{'Line': {'line_type': ['-'], 'line_endpoint': []}}",
            "{'Circle': {'circle_center': ['O: (1, 1)'], 'radius': [2]}, "
            "'x': 'line_type'}",
        ):
            assert self._run(spark, payload) == [], payload

    def test_zip_truncation_short_line_type(self, spark):
        # line_type[1] missing -> IndexError inside the reference's try
        # -> line 1 skipped, NOT defaulted
        rows = self._run(
            spark,
            "{'Line': {'line': ['(1, 2) -- (3, 4)', '(5, 6) -- (7, 8)'], "
            "'line_type': ['--'], 'line_endpoint': []}}",
        )
        assert [(r.kind, r.idx, r.style) for r in rows] == [("line", 0, "--")]

    def test_junk_entries_skipped_not_fatal(self, spark):
        rows = self._run(
            spark,
            "{'Line': {'line': ['garbage', '(1, 1) -- (2, 2)', "
            "'(3, 3) -- junk'], 'line_type': ['-', '-', '-'], "
            "'line_endpoint': ['broken endpoint', 'A (7, 7)']}}",
        )
        # junk line, half-parsed line, no-colon endpoint (the point must
        # come from split(': ')[1], eval-anchored — never a substring
        # scan), and unparseable endpoint all drop; the good line
        # survives with its original ordinal
        assert [(r.kind, r.idx) for r in rows] == [("line", 1)]

    def test_point_parse_is_anchored(self, spark):
        # eval('(1, 2) extra') is a SyntaxError in the reference — a
        # substring-matching regex would wrongly accept it
        rows = self._run(
            spark,
            "{'Line': {'line': ['(1, 2) extra -- (3, 4)'], "
            "'line_type': ['-'], 'line_endpoint': ['B: (5, 5) tail']}}",
        )
        assert rows == []

    def test_circle_requires_radius_partner(self, spark):
        rows = self._run(
            spark,
            "{'Line': {'line': [], 'line_type': [], 'line_endpoint': []}, "
            "'Circle': {'circle_center': ['O: (1, 1)', 'Q: (2, 2)'], "
            "'radius': [3.5]}}",
        )
        # zip truncation: the second center has no radius partner
        assert [(r.kind, r.label, r.radius) for r in rows] == [
            ("circle", "O", 3.5)
        ]

    def test_malformed_payload_zero_rows(self, spark):
        assert self._run(spark, "Sorry, no line-type payload here.") == []
        assert self._run(spark, "line_type but not a dict at all") == []

    def test_negative_and_float_coords(self, spark):
        rows = self._run(
            spark,
            "{'Line': {'line': ['(-1.5, 2.25) -- (0, -3)'], "
            "'line_type': ['-'], 'line_endpoint': []}}",
        )
        (r,) = rows
        assert (r.x0, r.y0, r.x1, r.y1) == (-1.5, 2.25, 0.0, -3.0)

    def test_python_float_literal_forms(self, spark):
        """Review r5: the reference eval()s coordinates, which accepts
        '.5', '1.', '1e3', '+2' — the anchored point regex must parse
        every float-literal form, not just -?d(.d)?; expression forms
        ('1+2', 'inf') stay parse-skipped like malformed entries."""
        rows = self._run(
            spark,
            "{'Line': {'line': ['(1e3, .5) -- (1., +2)', '(1+2, 3) -- (4, 5)'], "
            "'line_type': ['-', '-'], 'line_endpoint': ['A: (-2.5e-1, 7)']}}",
        )
        by_kind = {}
        for r in rows:
            by_kind.setdefault(r.kind, []).append(r)
        (line,) = by_kind["line"]  # the '1+2' line is parse-skipped
        assert (line.x0, line.y0, line.x1, line.y1) == (1000.0, 0.5, 1.0, 2.0)
        (ep,) = by_kind["endpoint"]
        assert (ep.x0, ep.y0, ep.label) == (-0.25, 7.0, "A")


class TestPadPlan:
    def _one(self, spark, w, h, **kw):
        df = spark.createDataFrame([(w, h)], "width long, height long")
        return pad_plan(df, **kw).collect()[0]

    def test_wide_image(self, spark):
        r = self._one(spark, 2048, 1024)
        assert (r.content_w, r.content_h) == (1024, 512)
        assert (r.pad_left, r.pad_top) == (0, 256)
        assert (r.pad_right, r.pad_bottom) == (0, 256)
        assert r.scale == 0.5
        assert (r.fill_r, r.fill_g, r.fill_b) == (127, 127, 127)

    def test_tall_image_odd_slack_floors(self, spark):
        r = self._one(spark, 500, 1000)
        assert (r.content_w, r.content_h) == (512, 1024)
        # slack 512 → 256/256; odd slack cases floor the leading edge
        r2 = self._one(spark, 999, 1000)
        # round_even(999/1000*1024) = round_even(1023.0) — not a tie
        assert r2.content_w == 1023
        assert r2.pad_left == 0 and r2.pad_right == 1
        # padded-space inversion property: (x - pad_left) / scale
        assert (r2.content_w / r2.scale) == pytest.approx(999, abs=1e-9)

    def test_axis_scales_differ_by_minor_rint(self, spark):
        # w=1000,h=700: ch = rint(716.8) = 717, so the realized y scale
        # is 717/700, NOT the x scale 1.024 — inverting y through the x
        # scale would land ~0.2px off near the content bottom. Each
        # axis must invert exactly through its own scale.
        r = self._one(spark, 1000, 700)
        assert (r.content_w, r.content_h) == (1024, 717)
        assert r.scale == pytest.approx(1.024, abs=1e-12)
        assert r.scale_y == pytest.approx(717 / 700, abs=1e-12)
        assert r.scale_y != r.scale
        assert (r.content_h / r.scale_y) == pytest.approx(700, abs=1e-9)

    def test_half_to_even_rounding(self, spark):
        # 500/1000*1024 = 512 exactly; craft a true .5: w=125, h=1000
        # → 128.0; use w=999999... instead pick h=2048, w=1023 →
        # 1023/2048*1024 = 511.5 → banker's rounds to 512 (Python round)
        r = self._one(spark, 1023, 2048)
        assert r.content_w == round(1023 / 2048 * 1024) == 512
        # and 1021/2048*1024 = 510.5 → rounds to 510, not 511
        r2 = self._one(spark, 1021, 2048)
        assert r2.content_w == round(1021 / 2048 * 1024) == 510

    def test_non_cropping_squares_source(self, spark):
        r = self._one(spark, 5000, 100, cropping=False)
        # direct resize to 640×640 first ⇒ full-canvas fit, zero pad
        assert (r.content_w, r.content_h) == (1024, 1024)
        assert (r.pad_left, r.pad_top, r.pad_right, r.pad_bottom) == (0, 0, 0, 0)


class TestTokenLayout:
    def _one(self, spark, w, h, text=None, **kw):
        if text is None:
            df = spark.createDataFrame([(w, h)], "width long, height long")
            return token_layout(df, **kw).collect()[0]
        df = spark.createDataFrame(
            [(w, h, text)], "width long, height long, text string"
        )
        return token_layout(df, text_col="text", **kw).collect()[0]

    def test_small_image_no_tiles_segment(self, spark):
        r = self._one(spark, 640, 480)
        assert r.w_tiles == 1 and r.h_tiles == 1
        assert r.image_tokens == GLOBAL_TOKENS
        kinds = [s.kind for s in r.segments]
        assert kinds == ["bos", "global_view", "eos"]
        assert r.seq_len == 1 + GLOBAL_TOKENS + 1

    def test_small_image_budget_agrees_with_plan_grid(self, spark):
        """P1 and P6 must quote the same vision budget for the same
        page: a small (≤640²) image is crop_ratio [1,1] — global view
        consumed, zero local views, 273 tokens (deepseek_ocr.py:79-80,
        95-106). plan_grid previously charged a single 640 tile view
        (111), which is not a reference mode."""
        from deepseek_ocr_spark.operators.tiling import plan_grid

        df = spark.createDataFrame([(640, 480)], "width long, height long")
        p1 = plan_grid(df).collect()[0]
        p6 = token_layout(df).collect()[0]
        assert p1.vision_tokens == p6.image_tokens == GLOBAL_TOKENS

    def test_null_text_is_zero_tokens_not_null(self, spark):
        """ANSI size(NULL) is NULL: a NULL text row must produce 0 text
        tokens and a non-NULL seq_len, not poison packing totals."""
        df = spark.createDataFrame(
            [(640, 480, None)], "width long, height long, text string"
        )
        r = token_layout(df, text_col="text").collect()[0]
        assert r.text_tokens == 0
        assert r.seq_len == 1 + GLOBAL_TOKENS + 1
        assert [s.kind for s in r.segments] == ["bos", "global_view", "eos"]

    def test_segments_contiguous_and_cover_seq(self, spark):
        r = self._one(spark, 1920, 1080, text="hello world, 42 tokens!")
        pos = 0
        for s in r.segments:
            assert s.start == pos and s.len > 0
            pos += s.len
        assert pos == r.seq_len
        kinds = [s.kind for s in r.segments]
        assert kinds == ["bos", "global_view", "tiles", "text", "eos"]
        # image-mask flags exactly the vision segments
        assert [s.is_image for s in r.segments] == [
            False,
            True,
            True,
            False,
            False,
        ]
        # 1920×1080 → (3,2) grid? whatever the planner picked, the tile
        # count formula must agree with the planner's grid
        tiles = [s for s in r.segments if s.kind == "tiles"][0]
        assert tiles.len == (10 * r.w_tiles + 1) * (10 * r.h_tiles)

    def test_bos_eos_toggle(self, spark):
        r = self._one(spark, 640, 480, bos=False, eos=False)
        assert [s.kind for s in r.segments] == ["global_view"]
        assert r.segments[0].start == 0
        assert r.seq_len == GLOBAL_TOKENS

    def test_text_tokens_match_bpe_regex(self, spark):
        import re

        from deepseek_ocr_spark.operators.tiling import BPE_PAT

        text = "the quick brown fox 123 !? end"
        r = self._one(spark, 800, 800, text=text)
        assert r.text_tokens == len(re.findall(BPE_PAT, text))


class TestPadTokenProperties:
    """Batch property check: one Spark job over a dense (w, h) grid,
    invariants asserted vectorized in Python (Python round == F.rint,
    both half-to-even — the parity the DuckDB oracle also pins)."""

    def test_pad_and_layout_invariants_grid(self, spark):
        dims = [
            (w, h)
            for w in range(17, 4000, 331)
            for h in range(23, 4000, 293)
        ]
        df = spark.createDataFrame(dims, "width long, height long")
        rows = token_layout(pad_plan(df)).collect()
        assert len(rows) == len(dims)
        for r in rows:
            w, h = r.width, r.height
            # contain: major axis pinned to 1024, minor rounded half-even
            assert max(r.content_w, r.content_h) == 1024
            if w >= h:
                assert r.content_w == 1024
                assert r.content_h == round(h / w * 1024)
            else:
                assert r.content_h == 1024
                assert r.content_w == round(w / h * 1024)
            # pads reassemble the canvas exactly, leading edge floors
            assert r.pad_left + r.content_w + r.pad_right == 1024
            assert r.pad_top + r.content_h + r.pad_bottom == 1024
            assert min(r.pad_left, r.pad_top, r.pad_right, r.pad_bottom) >= 0
            assert 0 <= r.pad_right - r.pad_left <= 1
            assert 0 <= r.pad_bottom - r.pad_top <= 1
            # scale inverts to the original width
            assert round(r.content_w / r.scale) == w
            # token layout: contiguous, covering, image mask consistent
            pos = 0
            img_toks = 0
            for s in r.segments:
                assert s.start == pos and s.len > 0
                pos += s.len
                if s.is_image:
                    img_toks += s.len
            assert pos == r.seq_len
            assert img_toks == r.image_tokens
            small = w <= 640 and h <= 640
            # biconditional: small ⇒ (1,1) bypass AND large ⇒ a real
            # grid (MIN_CROPS ≥ 2 makes (1,1) unreachable except via
            # the bypass) — the old `... == small or not small` form
            # was vacuously true for every large image
            assert (r.w_tiles == 1 and r.h_tiles == 1) == small
            if small:
                assert r.image_tokens == GLOBAL_TOKENS
            else:
                assert (
                    r.image_tokens
                    == GLOBAL_TOKENS + (10 * r.w_tiles + 1) * (10 * r.h_tiles)
                )


# ---------------------------------------------------------------------------
# S8 statement-port golden: Python mirror of run_dpsk_ocr_image.py:250-300


def oracle_geometry(payload: str):
    """Statement port of the reference re-plot loop
    (run_dpsk_ocr_image.py:250-300), comparator-pattern test oracle like
    oracle.py — kept faithful line by line, with the engine's two
    documented deviations marked inline. Element tuples mirror the
    geometry_elements schema."""
    out = []
    if "line_type" not in payload:  # :250 dispatch gate
        return out
    try:
        d = eval(payload)  # noqa: S307 — the reference eval()s (:253)
        lines = d["Line"]["line"]
        line_type = d["Line"]["line_type"]
        endpoints = d["Line"]["line_endpoint"]
    except Exception:
        return out  # deviation: the reference would crash uncaught
    for idx, line in enumerate(lines):  # :265-278
        try:
            p0 = eval(line.split(" -- ")[0])  # noqa: S307
            p1 = eval(line.split(" -- ")[-1])  # noqa: S307
            style = line_type[idx]  # IndexError inside the try -> skip
            out.append(
                ("line", idx, float(p0[0]), float(p0[1]), float(p1[0]),
                 float(p1[1]), None, str(style), None)
            )
        except Exception:
            continue
    for i, ep in enumerate(endpoints):  # :280-283
        try:  # deviation: unguarded in the reference (would crash)
            label = ep.split(": ")[0]
            (x, y) = eval(ep.split(": ")[1])  # noqa: S307
            out.append(
                ("endpoint", i, float(x), float(y), None, None, label,
                 None, None)
            )
        except Exception:
            continue
    try:  # :286-296
        if "Circle" in d.keys():
            centers = d["Circle"]["circle_center"]
            radius = d["Circle"]["radius"]
            for i, (center, r) in enumerate(zip(centers, radius)):
                try:  # deviation: the reference aborts the REST on error
                    label = center.split(": ")[0]
                    (x, y) = eval(center.split(": ")[1])  # noqa: S307
                    out.append(
                        ("circle", i, float(x), float(y), None, None,
                         label, None, float(r))
                    )
                except Exception:
                    continue
    except Exception:
        pass
    return out


def _gen_payload(rng):
    """One payload from the agreed-semantics domain (excluded gray zones
    where eval and the anchored parse legitimately differ: 3-tuples,
    trailing commas, scientific notation, non-numeric radii)."""

    def point():
        if rng.random() < 0.3:
            return f"({rng.integers(-99, 99)}.{rng.integers(0, 99)}, {rng.integers(-99, 99)})"
        return f"({rng.integers(-99, 99)}, {rng.integers(-99, 99)})"

    roll = rng.random()
    if roll < 0.08:
        return "no geometry in this output at all"
    if roll < 0.14:
        return "mentions line_type but is not a dict"
    parts = []
    n_lines = int(rng.integers(0, 4))
    lines = []
    for _ in range(n_lines):
        r = rng.random()
        if r < 0.15:
            lines.append("garbage")
        elif r < 0.3:
            lines.append(f"{point()} -- {point()} -- {point()}")
        else:
            lines.append(f"{point()} -- {point()}")
    # line_type possibly shorter OR longer than lines (zip strictness)
    n_types = int(rng.integers(0, n_lines + 2))
    types = [["--", "-", ":"][int(rng.integers(0, 3))] for _ in range(n_types)]
    n_ends = int(rng.integers(0, 3))
    ends = []
    for j in range(n_ends):
        r = rng.random()
        if r < 0.2:
            ends.append("broken endpoint")
        elif r < 0.35:
            ends.append(f"A ({rng.integers(0, 9)}, {rng.integers(0, 9)})")
        else:
            ends.append(f"{'ABCP'[j % 4]}: {point()}")
    line_block = (
        "'Line': {'line': %r, 'line_type': %r, 'line_endpoint': %r}"
        % (lines, types, ends)
    )
    if rng.random() < 0.12:  # drop a required field -> zero elements
        line_block = "'Line': {'line': %r, 'line_type': %r}" % (lines, types)
    parts.append(line_block)
    if rng.random() < 0.6:
        n_c = int(rng.integers(0, 3))
        centers = [f"O{j}: {point()}" for j in range(n_c)]
        n_r = int(rng.integers(0, n_c + 2))
        radii = [float(f"{rng.integers(1, 20)}.{rng.integers(0, 9)}") for _ in range(n_r)]
        parts.append(
            "'Circle': {'circle_center': %r, 'radius': %r}" % (centers, radii)
        )
    return "{" + ", ".join(parts) + "}"


def test_geometry_elements_matches_reference_port(spark):
    """200 seeded payloads across the domain, one Spark job, per-doc
    element multisets must equal the statement port's."""
    import numpy as np

    rng = np.random.default_rng(20260817)
    payloads = [_gen_payload(rng) for _ in range(200)]
    df = spark.createDataFrame(
        list(enumerate(payloads)), "doc_id long, geometry string"
    )
    got = {}
    for r in geometry_elements(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.kind, r.idx, r.x0, r.y0, r.x1, r.y1, r.label, r.style, r.radius)
        )
    mismatches = []
    for i, p in enumerate(payloads):
        exp = oracle_geometry(p)
        if sorted(got.get(i, [])) != sorted(exp):
            mismatches.append((p, sorted(exp), sorted(got.get(i, []))))
    assert not mismatches, mismatches[:3]
