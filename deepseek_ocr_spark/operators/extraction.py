"""Pipeline A: raw model-output pages → clean documents + interleaved spans.

Reproduces run_dpsk_ocr_pdf.py:286-320 semantics (see oracle.py for the
statement-level mirror) as a Spark plan shaped for 100 TB:

  pages(doc_id, page_no, content)
    → [pandas UDF, Arrow-batched] per-page extraction (regex scan,
      replace-all media rewrite with a JDX placeholder, layout strip +
      in-loop normalization chain, parse-failure counting)   — narrow
    → [window over doc_id] kept-page numbering (jdx)          — shuffle 1
    → [groupBy doc_id]   ordered page assembly + metrics      — reuses
      the same hash partitioning, so the plan has ONE shuffle total
    → JVM-side span decomposition via split/regexp_extract_all/zip_with
      (no Python in the final stage).

Scale notes: the UDF stage is narrow (no skew exposure); the single
shuffle keys on doc_id whose cardinality is the corpus size (no hot
keys — pages per doc are bounded by the reference's own pipeline).
Reference parity: regex run_dpsk_ocr_pdf.py:124; EOS/SKIP_REPEAT
:289-293; media rewrite :310-311; layout strip + normalize :313-314;
page join :296-298,317; jdx over kept pages only :285,320.
"""

from __future__ import annotations

import ast
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..schema import EOS_SENTINEL, PAGE_SPLIT, REF_PATTERN

_JDX = "\x00JDX\x00"  # placeholder; real page index substituted post-window

_REF_RE = re.compile(REF_PATTERN, re.DOTALL)

_PAGE_STRUCT = StructType(
    [
        StructField("kept", IntegerType()),
        StructField("clean", StringType()),
        StructField("parse_failures", IntegerType()),
        StructField("blocks_dropped", IntegerType()),
    ]
)


def _process_page(content: str) -> tuple[int, str, int, int]:
    """Per-page reference semantics with jdx deferred to a placeholder."""
    if content is None:
        return 0, None, 0, 0
    if EOS_SENTINEL in content:
        content = content.replace(EOS_SENTINEL, "")
    else:
        return 0, None, 0, 0  # SKIP_REPEAT drop
    matches = _REF_RE.findall(content)
    parse_failures = 0
    for m in matches:
        try:
            ast.literal_eval(m[2])
        except Exception:
            parse_failures += 1
    matches_image = [m[0] for m in matches if "<|ref|>image<|/ref|>" in m[0]]
    matches_other = [m[0] for m in matches if "<|ref|>image<|/ref|>" not in m[0]]
    for idx, a in enumerate(matches_image):
        content = content.replace(a, f"![](images/{_JDX}_{idx}.jpg)\n")
    for _idx, a in enumerate(matches_other):
        content = (
            content.replace(a, "")
            .replace("\\coloneqq", ":=")
            .replace("\\eqqcolon", "=:")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
        )
    return 1, content, parse_failures, len(matches_other)


@F.pandas_udf(_PAGE_STRUCT)
def _extract_page_udf(content: pd.Series) -> pd.DataFrame:
    # Cheap vectorized pre-screen: pages without grounding tokens skip the
    # regex machinery entirely (the common case in a web corpus).
    has_eos = content.str.contains(EOS_SENTINEL, regex=False, na=False)
    has_ref = content.str.contains("<|ref|>", regex=False, na=False)
    # the engine substitutes the page's media index through _JDX after
    # the kept-page window; a page that already CONTAINS the reserved
    # sentinel would have that literal rewritten to page digits (the
    # reference's direct at-match substitution preserves it). No
    # sequential-replace escape scheme is correct in general, so fail
    # loudly on the adversarial input instead of corrupting it silently.
    if content.str.contains(_JDX, regex=False, na=False).any():
        raise ValueError(
            "extract_pdf: input page contains the reserved media-index "
            f"sentinel {_JDX!r}; pre-strip or re-encode such pages"
        )
    out = pd.DataFrame(
        {
            "kept": has_eos.astype("int32"),
            "clean": content.str.replace(EOS_SENTINEL, "", regex=False),
            "parse_failures": 0,
            "blocks_dropped": 0,
        }
    )
    out.loc[~has_eos, "clean"] = None
    slow = has_eos & has_ref
    if slow.any():
        res = content[slow].map(_process_page)
        out.loc[slow, "kept"] = res.map(lambda r: r[0]).astype("int32")
        out.loc[slow, "clean"] = res.map(lambda r: r[1])
        out.loc[slow, "parse_failures"] = res.map(lambda r: r[2])
        out.loc[slow, "blocks_dropped"] = res.map(lambda r: r[3])
    for c in ("kept", "parse_failures", "blocks_dropped"):
        out[c] = out[c].astype("int32")
    return out


# span decomposition regexes (JVM side)
_MEDIA_MD = r"!\[\]\(images/[0-9_]+\.jpg\)\n"
_MEDIA_MD_CAP = r"!\[\]\((images/[0-9_]+\.jpg)\)\n"


def spans_from_text(text_col: Column) -> Column:
    """Decompose assembled clean text into the interleaved span array —
    entirely with built-in higher-order functions (whole-stage codegen).

    split() yields the n+1 text segments, regexp_extract_all the n media
    refs; zip_with interleaves them, flatten + filter drop empties, and a
    final transform assigns dense offsets.
    """
    parts = F.split(text_col, _MEDIA_MD)
    refs = F.regexp_extract_all(text_col, F.lit(_MEDIA_MD_CAP), 1)
    pairs = F.zip_with(
        parts,
        refs,
        lambda t, r: F.struct(t.alias("text"), r.alias("media_ref")),
    )
    interleaved = F.flatten(
        F.transform(
            pairs,
            lambda p: F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    p["text"].alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                ),
                F.struct(
                    F.lit("media").alias("kind"),
                    F.concat(F.lit("![]("), p["media_ref"], F.lit(")\n")).alias("text"),
                    p["media_ref"].alias("media_ref"),
                ),
            ),
        )
    )
    pruned = F.filter(
        interleaved,
        lambda s: (
            ((s["kind"] == "text") & (s["text"] != "") & s["text"].isNotNull())
            | ((s["kind"] == "media") & s["media_ref"].isNotNull())
        ),
    )
    return F.transform(
        pruned,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def extract_pdf(pages: DataFrame) -> DataFrame:
    """pages(doc_id, page_no, content) → one row per document:
    (doc_id, clean_text, spans, pages_in, pages_kept, parse_failures,
    blocks_dropped, media_spans, char_yield).
    """
    w = Window.partitionBy("doc_id").orderBy("page_no")
    ex = (
        pages.withColumn("ex", _extract_page_udf(F.col("content")))
        .select("doc_id", "page_no", "ex.*")
        # jdx = rank among KEPT pages (run_dpsk_ocr_pdf.py:285,320:
        # dropped pages do not advance the media page counter)
        .withColumn(
            "jdx",
            F.sum("kept").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
        )
        .withColumn(
            "page_text",
            F.when(
                F.col("kept") == 1,
                F.concat(
                    F.replace(
                        F.col("clean"), F.lit(_JDX), F.col("jdx").cast("string")
                    ),
                    F.lit(f"\n{PAGE_SPLIT}\n"),
                ),
            ),
        )
    )
    doc = ex.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("page_no", "page_text"))
                ),
                lambda s: s["page_text"],
            ),
            "",
        ).alias("clean_text"),
        F.count("*").cast("int").alias("pages_in"),
        F.sum("kept").cast("int").alias("pages_kept"),
        F.sum("parse_failures").cast("int").alias("parse_failures"),
        F.sum("blocks_dropped").cast("int").alias("blocks_dropped"),
    )
    return (
        doc.withColumn("spans", spans_from_text(F.col("clean_text")))
        .withColumn(
            "media_spans",
            F.size(F.filter("spans", lambda s: s["kind"] == "media")).cast("int"),
        )
        .withColumn("char_yield", F.length(F.coalesce("clean_text", F.lit(""))).cast("long"))
    )
