"""Pipeline B: input_hint interleaved span table → extracted span table.

Input:  documents(doc_id, spans:array<struct<kind,text,media_ref,offset>>)
Output: same schema, extracted — media refs resolved, boilerplate dropped,
grounding stripped, text normalized, repetition collapsed, offsets dense —
plus per-doc metrics columns. Golden oracle: oracle.oracle_spans_doc.

Plan shape (the 100 TB story): this pipeline is a ZERO-SHUFFLE map — every
step is a per-row array transformation. Media numbering, normally a
window function (SURVEY §2.5 X5), is computed *inside the array* with
higher-order functions, so a 10^12-document run is embarrassingly
parallel: scan → project → write, no exchange at all. The only Python is
one Arrow-batched pandas UDF for n-gram repetition collapse (F1); all
regex/string work is JVM-side regexp_replace inside transform().

Reference parity: grounding strip run_dpsk_ocr_pdf.py:313-314 (X7);
media resolution in match order, single-image numbering scheme
images/{idx}.jpg run_dpsk_ocr_image.py:105-112,240-241 (X5/X6); LaTeX +
newline + <center> normalization run_dpsk_ocr_pdf.py:314,
run_dpsk_ocr_eval_batch.py:156 (T1/T2/T4); repetition collapse with
<td> whitelist process/ngram_norepeat.py:7-40 (F1).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Java-regex version of the grounding pattern ((?s) = DOTALL).
_REF_JRE = r"(?s)<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>"
# A det payload is well-formed iff it is a bracketed list of 4-int lists.
_DET_OK_JRE = r"^\s*\[\s*(\[\s*\d+\s*(,\s*\d+\s*){3}\]\s*,?\s*)+\]\s*$"

BOILER_KINDS = ("footer", "nav")


def _collapse_series(texts: pd.Series, ngram: int, max_repeats: int) -> pd.Series:
    def collapse(text: str) -> str:
        if text is None or "<td>" in text or "</td>" in text:
            return text
        words = text.split(" ")
        if len(words) < ngram * (max_repeats + 1):
            return text
        out: list[str] = []
        i = 0
        while i < len(words):
            gram = words[i : i + ngram]
            out.extend(gram)
            j = i + ngram
            reps = 0
            while words[j : j + ngram] == gram:
                reps += 1
                if reps <= max_repeats - 1:
                    out.extend(gram)
                j += ngram
            i = j
        return " ".join(out)

    # vectorized pre-screen: only texts long enough to possibly repeat
    # take the Python path
    mask = texts.str.count(" ").fillna(0) >= ngram * (max_repeats + 1) - 1
    result = texts.copy()
    if mask.any():
        result[mask] = texts[mask].map(collapse)
    return result


@F.pandas_udf(ArrayType(StringType()))
def _collapse_texts_udf(arrs: pd.Series) -> pd.Series:
    """array<string> → array<string>, collapsing runs of repeated 4-gram
    phrases (>2 consecutive occurrences) per element; <td> whitelisted."""
    flat: list[str] = []
    lengths: list[int] = []
    for arr in arrs:
        if arr is None:
            lengths.append(-1)
            continue
        lengths.append(len(arr))
        flat.extend(arr)
    collapsed = _collapse_series(pd.Series(flat, dtype="object"), 4, 2).tolist()
    out, pos = [], 0
    for n in lengths:
        if n < 0:
            out.append(None)
            continue
        out.append(collapsed[pos : pos + n])
        pos += n
    return pd.Series(out)


def _clean_text_expr(t: Column) -> Column:
    """Grounding strip + T1/T2/T4 normalization, all JVM-side."""
    t = F.regexp_replace(t, _REF_JRE, "")
    t = F.replace(t, F.lit("\\coloneqq"), F.lit(":="))
    t = F.replace(t, F.lit("\\eqqcolon"), F.lit("=:"))
    t = F.replace(t, F.lit("<center>"), F.lit(""))
    t = F.replace(t, F.lit("</center>"), F.lit(""))
    # fixed point of the reference's 4→2/3→2 collapse loop ≡ \n{3,} → \n\n
    return F.regexp_replace(t, r"\n{3,}", "\n\n")


def extract_spans(documents: DataFrame, media_prefix: str = "images/") -> DataFrame:
    """documents(doc_id, spans) → (doc_id, spans, metrics columns).

    Zero-shuffle: all logic is array-local. Media idx for a media span =
    count of media spans with smaller offset (O(k²) per doc in codegen,
    k ≤ a few hundred — far cheaper than a shuffle).
    """
    sorted_spans = F.array_sort(
        "spans", lambda l, r: l["offset"].cast("int") - r["offset"].cast("int")
    )
    df = documents.withColumn("_s", sorted_spans)

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
    # media numbering: rank among media spans in offset order, array-local
    numbered = F.transform(
        spans_col,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["offset"].alias("offset"),
            F.when(
                s["kind"] == "image",
                F.size(
                    F.filter(
                        spans_col,
                        lambda m: (m["kind"] == "image") & (m["offset"] < s["offset"]),
                    )
                ),
            ).alias("media_idx"),
        ),
    )
    df = df.withColumn("_n", numbered)

    # classify + rewrite/strip/normalize (JVM), collapse (pandas UDF)
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
            .otherwise(_clean_text_expr(F.coalesce(s["text"], F.lit(""))))
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
    df = df.withColumn(
        "_texts",
        _collapse_texts_udf(F.transform("_r", lambda s: s["text"])),
    )
    merged = F.zip_with(
        "_r",
        "_texts",
        lambda s, t: F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "media", s["text"]).otherwise(t).alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    # boilerplate / empty drop, then dense re-offset
    kept = F.filter(
        merged,
        lambda s: (s["kind"] == "media")
        | (~s["kind"].isin(*BOILER_KINDS) & (F.trim(s["text"]) != "")),
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
            F.col("spans_out").alias("spans"),
            "parse_failures",
            F.size(F.filter("spans_out", lambda s: s["kind"] == "media"))
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
