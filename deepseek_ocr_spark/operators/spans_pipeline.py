"""Pipeline B: input_hint interleaved span table → extracted span table.

Input:  documents(doc_id, spans:array<struct<kind,text,media_ref,offset>>)
Output: same schema, extracted — media refs resolved, boilerplate dropped,
grounding stripped, text normalized, repetition collapsed, offsets dense —
plus per-doc metrics columns. Golden oracle: oracle.oracle_spans_doc.

Plan shape (the 100 TB story): this pipeline is a ZERO-SHUFFLE,
ZERO-PYTHON map — every step is a per-row array transformation inside
whole-stage codegen. Media numbering, normally a window function (SURVEY
§2.5 X5), is computed *inside the array* with higher-order functions, and
the n-gram repetition collapse (F1) is a Java-regex backreference
replace, so a 10^12-document run is embarrassingly parallel: scan →
project → write, no exchange and no JVM↔Python Arrow hop at all.

Reference parity: grounding strip run_dpsk_ocr_pdf.py:313-314 (X7);
media resolution in match order, single-image numbering scheme
images/{idx}.jpg run_dpsk_ocr_image.py:105-112,240-241 (X5/X6); LaTeX +
newline + <center> normalization run_dpsk_ocr_pdf.py:314,
run_dpsk_ocr_eval_batch.py:156 (T1/T2/T4); repetition collapse with
<td> whitelist process/ngram_norepeat.py:7-40 (F1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex version of the grounding pattern ((?s) = DOTALL).
_REF_JRE = r"(?s)<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>"
# A det payload is well-formed iff it is a bracketed list of 4-int lists.
_DET_OK_JRE = r"^\s*\[\s*(\[\s*\d+\s*(,\s*\d+\s*){3}\]\s*,?\s*)+\]\s*$"
# F1 span-level adaptation: a 4-word phrase repeated consecutively ≥2
# extra times collapses to exactly 2 occurrences. Backreference regex —
# identical leftmost-greedy semantics in Java (here) and Python (oracle).
_COLLAPSE_JRE = r"((?:[^ ]+ ){4})(?:\1)+"

BOILER_KINDS = ("footer", "nav")


def _collapse_expr(t: Column) -> Column:
    """F1 repetition collapse, JVM-side; <td> cells whitelisted
    (process/ngram_norepeat.py:33)."""
    return F.when(
        t.contains("<td>") | t.contains("</td>"), t
    ).otherwise(F.regexp_replace(t, _COLLAPSE_JRE, "$1$1"))


def _clean_text_expr(t: Column) -> Column:
    """Grounding strip + T1/T2/T4 normalization, all JVM-side."""
    t = F.regexp_replace(t, _REF_JRE, "")
    t = F.replace(t, F.lit("\\coloneqq"), F.lit(":="))
    t = F.replace(t, F.lit("\\eqqcolon"), F.lit("=:"))
    t = F.replace(t, F.lit("<center>"), F.lit(""))
    t = F.replace(t, F.lit("</center>"), F.lit(""))
    # fixed point of the reference's 4→2/3→2 collapse loop ≡ \n{3,} → \n\n
    return F.regexp_replace(t, r"\n{3,}", "\n\n")


def extract_spans(
    documents: DataFrame,
    media_prefix: str = "images/",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """documents(doc_id, spans) → (doc_id, spans, metrics columns).
    `passthrough` columns are carried to the output unchanged (e.g.
    ingest timestamps or partition keys — keeps streaming callers from
    needing a stream-stream self-join).

    Zero-shuffle: all logic is array-local. Media idx for a media span =
    its rank among media spans in (offset, original array position)
    order — the position tiebreak makes duplicate-offset input
    deterministic and identical to the oracle's stable sort. Computed as
    a position lookup in the image-subsequence (`_ip` below): O(k) to
    build + O(m) per image span (m = images/doc), replacing the r02
    O(k²)-pairs filter with its doubled tie-break predicate — measured
    6% faster end-to-end at 400k docs, byte-identical output (A/B in
    BENCH.md §pipeline-B attribution).
    """
    # struct field order (offset, pos, ...) makes the DEFAULT array_sort
    # (lexicographic struct compare, no lambda) produce exactly the
    # (offset, original-position) order — pos is unique, so the later
    # fields never get compared; ~10% faster than a comparator lambda.
    indexed = F.transform(
        "spans",
        lambda s, i: F.struct(
            s["offset"].alias("offset"),
            i.alias("pos"),
            s["kind"].alias("kind"),
            s["text"].alias("text"),
        ),
    )
    df = documents.withColumn("_s", F.array_sort(indexed))

    # parse-failure metric: grounding blocks whose det payload is malformed
    df = df.withColumn(
        "parse_failures",
        F.aggregate(
            "_s",
            F.lit(0),
            lambda acc, s: acc
            + F.size(
                F.filter(
                    F.regexp_extract_all(
                        F.coalesce(s["text"], F.lit("")), F.lit(_REF_JRE), 2
                    ),
                    lambda det: ~det.rlike(_DET_OK_JRE),
                )
            ),
        ).cast("int"),
    )

    spans_col = F.col("_s")
    # media numbering: rank among media spans in (offset, pos) order,
    # array-local. `_ip` = the pos values of image spans in sorted order
    # (pos is unique, so array_position is an exact key lookup);
    # media_idx = 0-based position in that subsequence.
    imgpos = F.filter(
        F.transform(spans_col, lambda s: F.when(s["kind"] == "image", s["pos"])),
        lambda x: x.isNotNull(),
    )
    df = df.withColumn("_ip", imgpos)
    ip = F.col("_ip")
    numbered = F.transform(
        spans_col,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["offset"].alias("offset"),
            F.when(
                s["kind"] == "image",
                (F.array_position(ip, s["pos"]) - 1).cast("int"),
            ).alias("media_idx"),
        ),
    )
    df = df.withColumn("_n", numbered)

    # classify + rewrite/strip/normalize/collapse — all JVM-side
    rewritten = F.transform(
        "_n",
        lambda s: F.struct(
            F.when(s["kind"] == "image", F.lit("media"))
            .otherwise(s["kind"])
            .alias("kind"),
            F.when(
                s["kind"] == "image",
                F.concat(
                    F.lit(f"![]({media_prefix}"),
                    s["media_idx"].cast("string"),
                    F.lit(".jpg)\n"),
                ),
            )
            .otherwise(
                _collapse_expr(_clean_text_expr(F.coalesce(s["text"], F.lit(""))))
            )
            .alias("text"),
            F.when(
                s["kind"] == "image",
                F.concat(
                    F.lit(media_prefix), s["media_idx"].cast("string"), F.lit(".jpg")
                ),
            ).alias("media_ref"),
        ),
    )
    df = df.withColumn("_r", rewritten)
    # boilerplate / empty drop, then dense re-offset
    # whitespace-only drop must match Python str.strip() semantics
    # (all whitespace, not just spaces): keep iff any non-ws char.
    # (?U) makes Java \S unicode-aware like Python's.
    # The image test is media_ref IS NOT NULL (set iff the INPUT kind
    # was 'image'), not the rewritten kind == 'media': an input span
    # that already carries kind='media' is an ordinary text span to the
    # oracle (processed, kept iff non-ws, NOT media-counted), and an
    # input kind=NULL must not null the whole predicate (isin is not
    # null-safe) — both schema-legal inputs (oracle.py:159-204).
    kept = F.filter(
        "_r",
        lambda s: s["media_ref"].isNotNull()
        | (
            ~F.coalesce(s["kind"].isin(*BOILER_KINDS), F.lit(False))
            & s["text"].rlike(r"(?U)\S")
        ),
    )
    final = F.transform(
        kept,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return (
        df.withColumn("spans_out", final)
        .select(
            "doc_id",
            *passthrough,
            F.col("spans_out").alias("spans"),
            "parse_failures",
            # media_spans counts RESOLVED images (media_ref set), not
            # output kind=='media' — a passthrough input 'media' span is
            # not an image (oracle counts media_idx = input images only)
            F.size(F.filter("spans_out", lambda s: s["media_ref"].isNotNull()))
            .cast("int")
            .alias("media_spans"),
            F.size("spans_out").cast("int").alias("blocks_kept"),
            (F.size("_s") - F.size("spans_out")).cast("int").alias("blocks_dropped"),
            F.aggregate(
                "spans_out",
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.length(s["text"]),
            ).alias("char_yield"),
        )
    )
