"""Gopher-style repetition quality signals (Rae et al. 2021, Table A1 —
the filter family FineWeb and Dolma reuse): documents dominated by
repeated lines or repeated n-grams are generation/boilerplate artifacts
that length/stopword gates (c1/a2) cannot see. Two signal groups:

- line level (array-local JVM, zero shuffle): fraction of duplicate
  LINES and the fraction of CHARACTERS sitting in duplicated lines;
- n-gram level (ONE relational pass): for small n, the character
  fraction covered by the single most frequent n-gram (``top_frac``);
  for larger n, the character fraction covered by n-grams occurring
  more than once (``dup_frac``). All requested n values ride one
  explode → one groupBy(doc, n, gram) shuffle — the f1 shape, rows are
  fixed-width hashes of grams, never text.

Character coverage follows the published accounting: a gram of t tokens
occurring c times covers c·len(gram) characters for top_frac, and
(its occurrences)·len for dup_frac, capped at the doc's total
non-space characters (overlapping grams can over-count; the cap keeps
the fraction in [0, 1] — FineWeb's implementation does the same).

``gopher_repetition_ok`` applies the published thresholds
(dup_line_frac 0.30, dup_line_char_frac 0.20, top n∈{2,3,4} →
0.20/0.18/0.16, dup n∈{5..10} → 0.15/0.14/0.13/0.12/0.11/0.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram_ban import ngram_array

TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
DUP_LINE_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.20


def _line_signals(text) -> list:
    """Array-local duplicate-line fractions (lines = split on \\n)."""
    lines = F.split(F.coalesce(text, F.lit("")), r"\n")
    n_lines = F.size(lines)
    n_dupl = n_lines - F.size(F.array_distinct(lines))
    # chars in lines whose value occurs more than once (counts every
    # copy, matching the published definition); O(L²) array-local over
    # the doc's own lines — no shuffle, no Python
    dup_chars = F.aggregate(
        F.filter(
            lines,
            lambda x: F.size(F.filter(lines, lambda y: y == x)) > 1,
        ),
        F.lit(0),
        lambda acc, x: acc + F.length(x),
    )
    total_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    safe = F.nullif(n_lines.cast("double"), F.lit(0.0))
    safe_c = F.nullif(total_chars.cast("double"), F.lit(0.0))
    return [
        F.coalesce(F.round(n_dupl / safe, 6), F.lit(0.0)).alias(
            "dup_line_frac"
        ),
        F.coalesce(F.round(dup_chars / safe_c, 6), F.lit(0.0)).alias(
            "dup_line_char_frac"
        ),
        total_chars.cast("bigint").alias("_n_chars"),
    ]


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-doc repetition signals + the composite
    ``gopher_repetition_ok`` gate. One row per input doc."""
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *_line_signals(F.col(text_col)),
        *[
            ngram_array(toks, n).alias(f"_ng{n}")
            for n in (*top_ns, *dup_ns)
        ],
    )
    # one union-explode over all n values; gram text is hashed before
    # the shuffle (fixed-width keys), its char length carried alongside
    grams = None
    for n in (*top_ns, *dup_ns):
        g = base.select(
            "doc_id",
            F.lit(n).alias("n"),
            F.explode(f"_ng{n}").alias("_g"),
        ).select(
            "doc_id",
            "n",
            F.xxhash64("_g").alias("gh"),
            # SEP joiner is 1 char, same as the space it stands for
            F.length("_g").alias("glen"),
        )
        grams = g if grams is None else grams.unionByName(g)
    counts = grams.groupBy("doc_id", "n", "gh").agg(
        F.count("*").alias("c"), F.first("glen").alias("glen")
    )
    per_n = counts.groupBy("doc_id", "n").agg(
        F.max(
            F.when(F.col("n").isin(list(top_ns)), F.col("c") * F.col("glen"))
        ).alias("top_chars"),
        F.sum(
            F.when(
                F.col("n").isin(list(dup_ns)) & (F.col("c") > 1),
                F.col("c") * F.col("glen"),
            )
        ).alias("dup_chars"),
    )
    sig_cols = []
    agg_exprs = []
    for n in top_ns:
        agg_exprs.append(
            F.max(F.when(F.col("n") == n, F.col("top_chars"))).alias(
                f"_top{n}"
            )
        )
        sig_cols.append((f"top_{n}gram_char_frac", f"_top{n}"))
    for n in dup_ns:
        agg_exprs.append(
            F.max(F.when(F.col("n") == n, F.col("dup_chars"))).alias(
                f"_dup{n}"
            )
        )
        sig_cols.append((f"dup_{n}gram_char_frac", f"_dup{n}"))
    pivoted = per_n.groupBy("doc_id").agg(*agg_exprs)
    out = base.select(
        "doc_id", "dup_line_frac", "dup_line_char_frac", "_n_chars"
    ).join(pivoted, on="doc_id", how="left")
    safe_c = F.nullif(F.col("_n_chars").cast("double"), F.lit(0.0))
    for name, raw in sig_cols:
        # coalesce BEFORE the cap: F.least skips NULLs (least(null, 1.0)
        # = 1.0), so a missing signal must become 0.0 first
        out = out.withColumn(
            name,
            F.least(
                F.coalesce(F.round(F.col(raw) / safe_c, 6), F.lit(0.0)),
                F.lit(1.0),
            ),
        )
    ok = (F.col("dup_line_frac") <= DUP_LINE_FRAC_MAX) & (
        F.col("dup_line_char_frac") <= DUP_LINE_CHAR_FRAC_MAX
    )
    for n, thr in TOP_NGRAM_THRESHOLDS.items():
        if n in top_ns:
            ok = ok & (F.col(f"top_{n}gram_char_frac") <= thr)
    for n, thr in DUP_NGRAM_THRESHOLDS.items():
        if n in dup_ns:
            ok = ok & (F.col(f"dup_{n}gram_char_frac") <= thr)
    return out.select(
        "doc_id",
        "dup_line_frac",
        "dup_line_char_frac",
        *[name for name, _ in sig_cols],
        ok.alias("gopher_repetition_ok"),
    )


# --- PII detection / redaction ----------------------------------------------
# The regex family Dolma ships (EMAIL/PHONE/IP, replaced with typed
# sentinels) — pre-training corpora redact these before packing. Pure
# JVM regexp ops: codegen, zero Python, zero shuffle.

PII_PATTERNS = {
    # local@domain.tld — conservative, no quoted-local-part exotica
    "email": r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
    # NANP-ish phone numbers: optional +1 / (area) / separators
    "phone": r"(\+?1[-. ]?)?(\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}",
    # IPv4 dotted quad (0-255 per octet); the lookarounds reject a quad
    # embedded in a longer dotted run ("version 1.2.3.4.5") — \b alone
    # matches its first four octets
    "ip": r"(?<!\d\.)\b((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b(?!\.\d)",
}
PII_SENTINELS = {
    "email": "|||EMAIL_ADDRESS|||",
    "phone": "|||PHONE_NUMBER|||",
    "ip": "|||IP_ADDRESS|||",
}


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs + one ``n_<kind>`` count column per PII pattern — the audit
    view (what WOULD be redacted). Counts are regexp_extract_all sizes,
    evaluated in whole-stage codegen."""
    out = docs
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")), F.lit(pat), 0
                )
            ).cast("bigint"),
        )
    return out


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs with every PII match in ``text_col`` replaced by its typed
    sentinel (Dolma's replacement convention). Order matters: emails
    first (a phone regex must not eat digits inside an already-redacted
    span; sentinels contain no digits or @, so later passes cannot match
    inside earlier replacements)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    for kind in ("email", "phone", "ip"):
        text = F.regexp_replace(text, PII_PATTERNS[kind], PII_SENTINELS[kind])
    return docs.withColumn(text_col, text)
